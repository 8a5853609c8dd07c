from .filters import filter_equals, filter_not_null  # noqa: F401
from .json_codec import json_decode, json_encode  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_exact,
    dedup_windowed,
    dedup_null_passthrough,
    dedup_refresh_batch,
)

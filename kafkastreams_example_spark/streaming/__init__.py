from .pipelines import (  # noqa: F401
    filter_pipeline,
    dedup_pipeline_within_watermark,
    windowed_count_pipeline,
)
from .dedup_refresh import make_refresh_dedup_fn, dedup_refresh_stream  # noqa: F401

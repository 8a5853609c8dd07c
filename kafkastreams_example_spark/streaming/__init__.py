from .pipelines import (  # noqa: F401
    filter_pipeline,
    dedup_pipeline_within_watermark,
    windowed_count_pipeline,
)
from .dedup_refresh import make_refresh_dedup_fn, dedup_refresh_stream  # noqa: F401
from .foreach_sink import idempotent_parquet_sink, start_foreach_batch  # noqa: F401

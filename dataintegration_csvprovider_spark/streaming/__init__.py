from .events import (  # noqa: F401
    stream_from_parquet,
    stream_from_csv_source,
    tumbling_agg,
    sliding_agg,
    session_agg,
    dedup_within_watermark,
    run_to_completion,
)

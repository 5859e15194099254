from data_collector_spark.streaming.windows import (  # noqa: F401
    streaming_tumbling_counts,
    run_streaming_over_parquet,
)

from data_collector_spark.streaming.windows import (  # noqa: F401
    streaming_tumbling_counts,
    run_streaming_over_parquet,
)
from data_collector_spark.streaming.dedup import (  # noqa: F401
    streaming_seen_dedup,
    streaming_host_budget,
)

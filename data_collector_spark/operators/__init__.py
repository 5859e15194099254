from data_collector_spark.operators.bloom import ShardedBloom  # noqa: F401
from data_collector_spark.operators.seen import dedup_against_seen  # noqa: F401
from data_collector_spark.operators.politeness import pop_wave  # noqa: F401
from data_collector_spark.operators.robots import split_robots  # noqa: F401

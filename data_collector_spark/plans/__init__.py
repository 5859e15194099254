from data_collector_spark.plans.registry import QUERIES, ORACLES, query  # noqa: F401
import data_collector_spark.plans.relational  # noqa: F401,E402
import data_collector_spark.plans.training  # noqa: F401,E402
import data_collector_spark.plans.crawl_queries  # noqa: F401,E402

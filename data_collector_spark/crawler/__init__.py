from data_collector_spark.crawler.state import CrawlState  # noqa: F401
from data_collector_spark.crawler.driver import CrawlConfig, init_crawl, run_crawl  # noqa: F401
from data_collector_spark.crawler.round import run_round  # noqa: F401

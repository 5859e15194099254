from data_collector_spark.sources.generator import (  # noqa: F401
    synth_pages,
    synth_seeds,
    synth_robots,
    synth_politeness,
    pages_from_documents,
)
from data_collector_spark.sources.tables import load_table, TABLES  # noqa: F401
from data_collector_spark.sources.warc import (  # noqa: F401
    pages_from_warc,
    read_warc,
    write_warc,
)
from data_collector_spark.sources.sitemap import (  # noqa: F401
    parse_sitemap,
    seeds_from_sitemaps,
)

from data_collector_spark.functions.urls import (  # noqa: F401
    canonicalize_col,
    canonicalize_series,
    canonicalize_udf,
    canonicalize_url,
    with_canonical_url,
    host_col,
    sha1_col,
)
from data_collector_spark.functions.extract import (  # noqa: F401
    extract_text_bytes,
    extract_text_series,
    extract_links_series,
    with_extracted,
)

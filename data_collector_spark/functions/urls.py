"""URL canonicalization + keying.

The reference normalizes join keys with ``replace(symbol,'/','-')``
(/root/reference/src/actions/stage/nyse_instruments.rs:135,149,175); the
crawler analog is URL canonicalization before SHA-1 keying (SURVEY.md F1/F16).

Canonicalization is a *vectorized* pandas transform (Arrow-batched pandas
UDF, never row-at-a-time Python-in-Spark). Rules — deterministic, order
matters:

1. trim whitespace; drop the ``#fragment``
2. lowercase scheme and authority (host[:port])
3. strip default ports (http:80 / https:443)
4. empty path -> ``/``; strip one trailing ``/`` from non-root paths
5. sort ``&``-separated query params bytewise; drop an empty ``?``
6. non-http(s)/unparseable input -> NULL (filtered out upstream, counted)

SHA-1 keying and host extraction stay JVM-side (built-in ``sha1`` /
``regexp_extract``) so they run inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?#]*)(?P<rest>.*)$"


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a pandas Series of URL strings."""
    s = s.astype("object").fillna("").astype(str).str.strip()
    s = s.str.split("#", n=1).str[0]
    parts = s.str.extract(_URL_RE).astype("object")  # keep .str usable when all-NaN
    scheme = parts["scheme"].str.lower()
    auth = parts["auth"].str.lower()

    is_http = scheme == "http"
    is_https = scheme == "https"
    auth = auth.mask(is_http & auth.str.endswith(":80"), auth.str.slice(0, -3))
    auth = auth.mask(is_https & auth.str.endswith(":443"), auth.str.slice(0, -4))

    rest = parts["rest"].fillna("")
    pq = rest.str.split("?", n=1)
    path = pq.str[0].astype("object")
    query = pq.str[1]  # NaN where no '?'
    query = query.where(query.notna(), None).astype("object")

    # strip ALL trailing slashes (idempotency: '///' must not survive a
    # pass), then restore the root slash
    path = path.str.replace(r"/+$", "", regex=True)
    path = path.mask(path == "", "/")

    has_multi = query.notna() & query.str.contains("&", regex=False)
    if has_multi.any():
        query = query.mask(
            has_multi,
            query[has_multi].map(lambda q: "&".join(sorted(q.split("&")))),
        )
    qsuffix = ("?" + query.fillna("")).where(query.notna() & (query != ""), "")

    out = scheme + "://" + auth + path + qsuffix
    valid = (is_http | is_https) & (auth.notna()) & (auth != "")
    return out.where(valid, None)


def canonicalize_url(url: str) -> str | None:
    """Scalar convenience wrapper (tests / driver-side seeds)."""
    return canonicalize_series(pd.Series([url])).iloc[0]


@F.pandas_udf(T.StringType())
def canonicalize_udf(s: pd.Series) -> pd.Series:
    return canonicalize_series(s)


def host_col(url: Column | str) -> Column:
    """Host of an already-canonical URL — JVM-side regexp, codegen-friendly."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-z0-9+.\-]+://([^/:?#]+)", 1)


def sha1_col(url: Column | str) -> Column:
    """Lowercase hex SHA-1 of the canonical URL (the URL-seen key, F16)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.sha1(c)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add url_canon, url_sha1, host; drop rows that fail canonicalization."""
    return (
        df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
        .filter(F.col("url_canon").isNotNull())
        .withColumn("url_sha1", sha1_col("url_canon"))
        .withColumn("host", host_col("url_canon"))
    )

"""Sitemap ingestion — seeds from sitemap.xml / sitemap-index documents.

Crawl seeds in the wild come from sitemaps (the crawler-world analog of
the reference's instrument master lists, SURVEY.md S1/S5). Parsing is
pure JVM string work: a sitemap is a flat sequence of ``<url>``/
``<sitemap>`` entries whose fields (``loc``, ``priority``, ``lastmod``)
never nest, so ``regexp_extract_all`` over each entry block is exact for
well-formed documents — no XML library, no UDF, no shuffle until the
caller aggregates.

``seeds_from_sitemaps`` maps straight onto the engine's seed contract
(url, priority): sitemap priority 0.0-1.0 (higher = more important)
becomes the frontier's integer priority (LOWER sorts first), so
priority 1.0 -> 0 and unset (default 0.5) -> 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_ENTRY_SCHEMA = "loc string, priority double, lastmod timestamp, kind string"


def parse_sitemap(docs: DataFrame, text_col: str = "sitemap_xml") -> DataFrame:
    """(…, sitemap_xml) -> one row per entry:
    (loc, priority, lastmod, kind) where kind is 'url' (page entry) or
    'sitemap' (index entry pointing at a child sitemap).

    Entries missing <loc> are dropped; <priority> defaults to 0.5 per the
    sitemaps.org protocol; malformed priority/lastmod parse to NULL/0.5
    rather than failing (ANSI-safe try_cast/try to_timestamp).
    """
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(text_col, F.lit(r"(?s)<url>(.*?)</url>"), 1),
            lambda b: F.struct(b.alias("body"), F.lit("url").alias("kind")),
        ),
        F.transform(
            F.regexp_extract_all(text_col, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
            lambda b: F.struct(b.alias("body"), F.lit("sitemap").alias("kind")),
        ),
    )
    entries = docs.select(F.explode(blocks).alias("_e")).select(
        F.col("_e.body").alias("_b"), F.col("_e.kind").alias("kind")
    )
    loc = F.trim(F.regexp_extract("_b", r"(?s)<loc>\s*(.*?)\s*</loc>", 1))
    prio = F.regexp_extract("_b", r"(?s)<priority>\s*(.*?)\s*</priority>", 1)
    lastmod = F.regexp_extract("_b", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    return (
        entries.select(
            loc.alias("loc"),
            F.coalesce(prio.try_cast("double"), F.lit(0.5)).alias("priority"),
            # lastmod is W3C datetime: full timestamps or bare dates
            F.coalesce(
                F.try_to_timestamp(lastmod),
                F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
            ).alias("lastmod"),
            "kind",
        )
        .filter(F.col("loc") != "")
    )


def resolve_sitemap_indexes(
    docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "sitemap_xml",
    url_col: str = "url_canon",
    body_col: str = "html",
    max_depth: int = 2,
) -> DataFrame:
    """Expand sitemap-INDEX entries into their child sitemap documents.

    Real-world sitemap.xml files are almost always indexes (google/bing
    cap urlsets at 50k entries), so the entry document alone seeds
    nothing. Each depth level joins the ``kind='sitemap'`` child locs
    against a fetched corpus (the same fetch-as-join the crawl's wave
    uses — no driver-side HTTP here; the corpus is whatever fetch layer
    the caller drives) and re-parses the bodies. Depth is bounded
    (``max_depth``, default 2: index -> child urlsets covers the standard
    layout; index-of-index needs 2). Returns the original docs plus every
    resolved child document, one ``text_col`` column — feed it straight to
    ``seeds_from_sitemaps``. Child locs missing from the corpus drop out
    (unfetched children can't contribute seeds). Scale shape: ``max_depth``
    broadcast-able equi-joins, no UDF, no driver collect.
    """
    pages = corpus.select(
        F.col(url_col).alias("_loc"), F.col(body_col).cast("string").alias(text_col)
    )
    out = docs.select(text_col)
    frontier = out
    for _ in range(max_depth):
        children = (
            parse_sitemap(frontier, text_col)
            .filter(F.col("kind") == "sitemap")
            .select(F.col("loc").alias("_loc"))
            .distinct()
        )
        frontier = F.broadcast(children).join(pages, "_loc", "inner").select(text_col)
        out = out.unionByName(frontier)
    return out


def seeds_from_sitemaps(
    docs: DataFrame,
    text_col: str = "sitemap_xml",
    corpus: DataFrame | None = None,
    index_depth: int = 2,
) -> DataFrame:
    """Sitemap documents -> the crawl seed table (url, priority).

    Sitemap priority (1.0 = most important) inverts into the frontier's
    ascending integer priority: p -> round(10 * (1 - p)), so 1.0 -> 0,
    default 0.5 -> 5, 0.0 -> 10. Duplicate locs keep their best (lowest)
    priority. When ``corpus`` is given, index entries (kind='sitemap')
    resolve recursively against it first (``resolve_sitemap_indexes``,
    depth <= ``index_depth``); without a corpus they are excluded —
    fetching child sitemaps is an IO step the caller drives.
    """
    if corpus is not None:
        docs = resolve_sitemap_indexes(
            docs, corpus, text_col, max_depth=index_depth
        )
    urls = parse_sitemap(docs, text_col).filter(F.col("kind") == "url")
    return (
        urls.select(
            F.col("loc").alias("url"),
            F.round(10 * (1 - F.col("priority"))).cast("int").alias("priority"),
        )
        .groupBy("url")
        .agg(F.min("priority").alias("priority"))
    )

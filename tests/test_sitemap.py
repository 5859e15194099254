"""Sitemap parsing: entries, defaults, index docs, seed-priority mapping,
and feeding a real crawl."""

from datetime import datetime

from pyspark.sql import functions as F

from data_collector_spark.sources.sitemap import parse_sitemap, seeds_from_sitemaps

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://h0.test/a</loc>
    <lastmod>2024-03-04T05:06:07Z</lastmod>
    <priority>1.0</priority>
  </url>
  <url><loc> http://h0.test/b </loc><lastmod>2024-03-05</lastmod></url>
  <url><loc>http://h0.test/c</loc><priority>bogus</priority></url>
  <url><priority>0.9</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://h0.test/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>http://h0.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "sitemap_xml string")


def test_parse_entries_defaults_and_malformed(spark):
    rows = {r["loc"]: r for r in parse_sitemap(_df(spark, SITEMAP)).collect()}
    assert set(rows) == {"http://h0.test/a", "http://h0.test/b", "http://h0.test/c"}
    a = rows["http://h0.test/a"]
    assert a["priority"] == 1.0 and a["kind"] == "url"
    assert a["lastmod"] == datetime(2024, 3, 4, 5, 6, 7)
    b = rows["http://h0.test/b"]   # whitespace-trimmed loc, date-only lastmod
    assert b["priority"] == 0.5 and b["lastmod"] == datetime(2024, 3, 5)
    assert rows["http://h0.test/c"]["priority"] == 0.5  # bogus -> default


def test_parse_sitemap_index(spark):
    rows = parse_sitemap(_df(spark, INDEX)).collect()
    assert {r["kind"] for r in rows} == {"sitemap"}
    assert {r["loc"] for r in rows} == {
        "http://h0.test/sitemap-a.xml", "http://h0.test/sitemap-b.xml"
    }


def test_seed_priority_mapping_and_dedup(spark):
    two = _df(
        spark,
        "<url><loc>http://h.test/x</loc><priority>1.0</priority></url>",
        "<url><loc>http://h.test/x</loc><priority>0.2</priority></url>"
        "<url><loc>http://h.test/y</loc></url>",
    )
    seeds = {r["url"]: r["priority"] for r in seeds_from_sitemaps(two).collect()}
    # duplicate loc keeps the best (lowest mapped) priority; 1.0 -> 0
    assert seeds == {"http://h.test/x": 0, "http://h.test/y": 5}


def test_sitemap_index_resolves_children_from_corpus(spark):
    """An index fixture + a corpus holding the child sitemaps yields the
    UNION of the child urlsets as seeds; a child loc missing from the
    corpus contributes nothing; depth 2 reaches an index-of-index."""
    child_a = (
        "<urlset><url><loc>http://h0.test/a1</loc><priority>1.0</priority></url>"
        "<url><loc>http://h0.test/a2</loc></url></urlset>"
    )
    child_b = "<urlset><url><loc>http://h0.test/b1</loc></url></urlset>"
    corpus = spark.createDataFrame(
        [
            ("http://h0.test/sitemap-a.xml", child_a.encode()),
            ("http://h0.test/sitemap-b.xml", child_b.encode()),
            # sitemap-c is referenced but was never fetched
        ],
        "url_canon string, html binary",
    )
    index = INDEX.replace(
        "</sitemapindex>",
        "<sitemap><loc>http://h0.test/sitemap-c.xml</loc></sitemap></sitemapindex>",
    )
    seeds = {
        r["url"]: r["priority"]
        for r in seeds_from_sitemaps(_df(spark, index), corpus=corpus).collect()
    }
    assert seeds == {
        "http://h0.test/a1": 0,
        "http://h0.test/a2": 5,
        "http://h0.test/b1": 5,
    }

    # index-of-index: root -> mid -> child_a, resolvable at depth 2 only
    mid = "<sitemapindex><sitemap><loc>http://h0.test/sitemap-a-idx.xml</loc></sitemap></sitemapindex>"
    corpus2 = spark.createDataFrame(
        [
            ("http://h0.test/sitemap-mid.xml", mid.encode()),
            ("http://h0.test/sitemap-a-idx.xml", child_a.encode()),
        ],
        "url_canon string, html binary",
    )
    root = "<sitemapindex><sitemap><loc>http://h0.test/sitemap-mid.xml</loc></sitemap></sitemapindex>"
    deep = seeds_from_sitemaps(_df(spark, root), corpus=corpus2)
    assert {r["url"] for r in deep.collect()} == {
        "http://h0.test/a1", "http://h0.test/a2"
    }
    shallow = seeds_from_sitemaps(_df(spark, root), corpus=corpus2, index_depth=1)
    assert shallow.count() == 0


def test_sitemap_seeds_drive_a_crawl(spark, tmp_path):
    """Seeds built from a sitemap behave exactly like handwritten seeds,
    including the priority ordering inside the politeness window."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import synth_pages

    corpus_dir = str(tmp_path / "corpus")
    synth_pages(spark, 30, n_hosts=1, links_per_page=0, dead_frac=0.0,
                partitions=1).write.parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    urls = sorted(r["url_canon"] for r in pages.select("url_canon").collect())
    # first 3 urls get priority 1.0 (-> 0), the rest default 0.5 (-> 5)
    xml = "<urlset>" + "".join(
        f"<url><loc>{u}</loc><priority>{'1.0' if i < 3 else '0.5'}</priority></url>"
        for i, u in enumerate(urls)
    ) + "</urlset>"
    seeds = seeds_from_sitemaps(_df(spark, xml))
    robots = spark.createDataFrame([], "host string, path_prefix string")
    budgets = spark.createDataFrame([("", 3)], "host string, budget_per_round int")
    wd = str(tmp_path / "wd")
    run_crawl(spark, wd, pages, seeds, robots, budgets,
              CrawlConfig(max_rounds=1, default_budget=3))
    state = CrawlState(wd)
    fetched = {
        r["url_canon"]
        for r in state.read_round(spark, "fetch_log", 0)
        .filter(F.col("status") == "fetched").collect()
    }
    # round 0's budget of 3 goes to exactly the 3 high-priority urls
    assert fetched == set(urls[:3])

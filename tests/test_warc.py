"""WARC source/sink: Content-Length-correct segmentation, payload-exact
roundtrip, truncation tolerance, and the pages-corpus adapter."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_collector_spark.sources.warc import (
    _parse_warc_bytes,
    pages_from_warc,
    read_warc,
    write_warc,
)


def _rec(uri, date, payload: bytes, wtype=b"response", rid=b"<urn:x:1>") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Record-ID: " + rid + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: " + date + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


TRICKY_PAYLOAD = b"<html>\r\n\r\nWARC/1.0\r\nfake-header: x\r\n\r\n</html>"


def test_content_length_framing_survives_embedded_warc_markers():
    blob = (
        _rec(b"http://a.test/1", b"2024-01-02T03:04:05Z", TRICKY_PAYLOAD)
        + _rec(b"http://a.test/2", b"2024-01-02T03:04:06Z", b"second")
    )
    recs = list(_parse_warc_bytes(blob))
    assert [r["payload"] for r in recs] == [TRICKY_PAYLOAD, b"second"]
    assert recs[0]["headers"]["warc-target-uri"] == "http://a.test/1"


def test_truncated_tail_record_dropped():
    good = _rec(b"http://a.test/1", b"2024-01-02T03:04:05Z", b"ok")
    trunc = _rec(b"http://a.test/2", b"2024-01-02T03:04:06Z", b"x" * 100)[:-60]
    recs = list(_parse_warc_bytes(good + trunc))
    assert len(recs) == 1 and recs[0]["payload"] == b"ok"


def test_read_warc_filters_types_and_parses_fields(spark, tmp_path):
    blob = (
        _rec(b"http://h.test/p", b"2024-03-04T05:06:07Z", b"<html>hi</html>")
        + _rec(b"http://h.test/p", b"2024-03-04T05:06:07Z", b"GET /p", wtype=b"request")
    )
    p = tmp_path / "seg-00000.warc"
    p.write_bytes(blob)
    df = read_warc(spark, str(p))
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "http://h.test/p"
    assert r["warc_type"] == "response"
    assert bytes(r["html"]) == b"<html>hi</html>"
    assert r["warc_ts"] == datetime(2024, 3, 4, 5, 6, 7)
    # () keeps every record type
    assert read_warc(spark, str(p), record_types=()).count() == 2


def test_warc_roundtrip_payload_exact(spark, tmp_path):
    from data_collector_spark.sources.generator import synth_pages

    pages = synth_pages(spark, 60, n_hosts=4, partitions=3)
    out = str(tmp_path / "archive")
    n_files = write_warc(pages, out)
    assert 1 <= n_files <= 3
    back = read_warc(spark, out + "/*.warc")
    a = sorted(
        (r["url_canon"], r["warc_ts"], bytes(r["html"]))
        for r in pages.select("url_canon", "warc_ts", "html").collect()
    )
    b = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()
    )
    assert a == b


def test_gzip_members_parse_identically():
    """Common Crawl ships .warc.gz with each record an independent gzip
    member; parsing the gzipped stream must yield exactly the plain-WARC
    records. A single whole-file gzip stream must parse too."""
    import gzip

    r1 = _rec(b"http://g.test/1", b"2024-01-02T03:04:05Z", TRICKY_PAYLOAD)
    r2 = _rec(b"http://g.test/2", b"2024-01-02T03:04:06Z", b"second")
    plain = list(_parse_warc_bytes(r1 + r2))
    members = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    whole = gzip.compress(r1 + r2, mtime=0)
    for blob in (members, whole):
        recs = list(_parse_warc_bytes(blob))
        assert [r["payload"] for r in recs] == [r["payload"] for r in plain]
        assert [r["headers"] for r in recs] == [r["headers"] for r in plain]
    # truncated last member: keep the complete records, drop the tail
    recs = list(_parse_warc_bytes(members[:-20]))
    assert [r["payload"] for r in recs] == [TRICKY_PAYLOAD]


def test_non_warc_file_raises_instead_of_yielding_nothing():
    with pytest.raises(ValueError, match="not a WARC stream"):
        list(_parse_warc_bytes(b"PK\x03\x04 definitely a zip"))
    with pytest.raises(ValueError, match="not a WARC stream"):
        import gzip

        list(_parse_warc_bytes(gzip.compress(b"<html>not warc</html>", mtime=0)))


def test_warc_gz_roundtrip_and_crawl_equivalence(spark, tmp_path):
    """compress=True writes per-record gzip members, read_warc ingests
    them, and the payloads survive byte-exactly."""
    from data_collector_spark.sources.generator import synth_pages

    pages = synth_pages(spark, 60, n_hosts=4, partitions=3)
    out = str(tmp_path / "gz_archive")
    n_files = write_warc(pages, out, compress=True)
    assert 1 <= n_files <= 3
    import os

    assert all(fn.endswith(".warc.gz") for fn in os.listdir(out))
    back = read_warc(spark, out + "/*.warc.gz")
    a = sorted(
        (r["url_canon"], r["warc_ts"], bytes(r["html"]))
        for r in pages.select("url_canon", "warc_ts", "html").collect()
    )
    b = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()
    )
    assert a == b
    # determinism (mtime pinned): same input -> identical .gz bytes
    out2 = str(tmp_path / "gz_archive2")
    write_warc(pages, out2, compress=True)
    for fn in sorted(os.listdir(out)):
        assert (
            open(os.path.join(out, fn), "rb").read()
            == open(os.path.join(out2, fn), "rb").read()
        ), fn


def test_crawl_runs_on_warc_corpus(spark, tmp_path):
    """End-to-end: archive a synthetic corpus as WARC, read it back through
    pages_from_warc, and crawl it — identical fetch log to the parquet
    corpus crawl (the source format is transparent to the engine)."""
    from data_collector_spark.crawler.driver import CrawlConfig, run_crawl
    from data_collector_spark.crawler.state import CrawlState
    from data_collector_spark.sources.generator import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    pages = synth_pages(spark, 80, n_hosts=4, partitions=2)
    warc_dir = str(tmp_path / "warc")
    write_warc(pages, warc_dir)
    gz_dir = str(tmp_path / "warc_gz")
    write_warc(pages, gz_dir, compress=True)
    pq_dir = str(tmp_path / "pq")
    pages.write.parquet(pq_dir)

    def go(name, corpus):
        wd = str(tmp_path / name)
        run_crawl(
            spark, wd, corpus, synth_seeds(spark, 80, n_hosts=4),
            synth_robots(spark), synth_politeness(spark, 4),
            CrawlConfig(max_rounds=2),
        )
        return sorted(
            (r["round"], r["host"], r["seq_in_host"], r["url_sha1"])
            for r in CrawlState(wd).read_all(spark, "fetch_log")
            .filter(F.col("status") == "fetched").collect()
        )

    ref = go("wd_pq", spark.read.parquet(pq_dir))
    assert go("wd_warc", pages_from_warc(spark, warc_dir + "/*.warc")) == ref
    assert go("wd_gz", pages_from_warc(spark, gz_dir + "/*.warc.gz")) == ref


def test_write_warc_deterministic(spark, tmp_path):
    from data_collector_spark.sources.generator import synth_pages

    pages = synth_pages(spark, 40, n_hosts=3, partitions=2)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_warc(pages, d1)
    write_warc(pages, d2)
    import os

    f1 = sorted(os.listdir(d1))
    assert f1 == sorted(os.listdir(d2))
    for fn in f1:
        assert (
            open(os.path.join(d1, fn), "rb").read()
            == open(os.path.join(d2, fn), "rb").read()
        ), fn

"""WARC (ISO 28500) source + sink for Common-Crawl-style page corpora.

The reference ingests HTTP JSON APIs (SURVEY.md S1); the crawl engine's
corpus is Common-Crawl-shaped (north_star), whose interchange format is
WARC. This module lets a user point the engine at real WARC segments and
archive crawl output back out, without any external WARC library:

- ``read_warc(spark, path)``: each WARC file becomes one task via Spark's
  built-in ``binaryFile`` source (Common Crawl ships thousands of ~1 GiB
  segment files — per-file parallelism is the natural unit, exactly how
  the format is meant to be split), and an Arrow ``mapInPandas`` pass
  segments records by **Content-Length** (the only correct way — payloads
  may contain blank lines and ``WARC/1.0`` strings; regex splitting is
  wrong) into (url, warc_ts, html, warc_type, record_id) rows. Real
  Common Crawl segments ship as ``.warc.gz`` with each record an
  independent gzip member; the parser sniffs the gzip magic and
  stream-decompresses the members transparently.
- ``write_warc(df, out_dir)``: the inverse sink — one ``part-NNNNN.warc``
  file per partition (an S10 partition-creating sink), rows serialized as
  ``response`` records with correct Content-Length framing. Roundtrip is
  byte-exact on the payload (pytest-pinned).

Scale shape: no shuffle in either direction — read parallelism = number
of WARC files, write parallelism = DataFrame partitions; per-record work
is bytes slicing inside one Arrow batch stream.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, warc_type string, record_id string"
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(blob: bytes) -> bytes:
    """Transparent decompression of .warc.gz segments. Common Crawl writes
    each record as an INDEPENDENT gzip member (so readers can seek); gzip
    members concatenate cleanly, so looping ``zlib.decompressobj`` over
    the blob and joining the outputs reconstructs the plain WARC stream.
    Non-gzip input passes through untouched (magic-byte sniff)."""
    if blob[:2] != _GZIP_MAGIC:
        return blob
    out = []
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=47)  # 32+15: auto gzip/zlib header
        try:
            out.append(d.decompress(blob[pos:]))
            out.append(d.flush())
        except zlib.error:
            break  # truncated/corrupt member: keep what decoded (tail-drop)
        rest = d.unused_data
        if not rest or rest[:2] != _GZIP_MAGIC:
            break
        pos = n - len(rest)
    return b"".join(out)


def _parse_warc_bytes(blob: bytes) -> Iterator[dict]:
    """Yield records from one WARC file's bytes (gzip members are
    decompressed transparently). A file that does not START with a WARC
    record raises — silently yielding zero rows from a mis-pointed path is
    how whole segments go missing unnoticed. Malformed trailing data is
    dropped (a truncated tail record is the common real-world corruption);
    a malformed header mid-stream stops the scan rather than guessing at
    resync (Content-Length framing has no reliable resync point)."""
    blob = _maybe_gunzip(blob)
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not blob[pos : pos + 5] == b"WARC/":
            if pos == 0:
                raise ValueError(
                    f"not a WARC stream (starts with {blob[:8]!r}); "
                    "expected a 'WARC/' record or gzip members of one"
                )
            return  # not a record boundary: stop (no resync)
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated tail record
        yield {
            "headers": headers,
            "payload": blob[body_start:body_end],
        }
        pos = body_end


def _ts(v: str):
    try:
        # WARC-Date is ISO-8601 Zulu
        return datetime.fromisoformat(v.replace("Z", "+00:00")).replace(tzinfo=None)
    except ValueError:
        return None


def read_warc(
    spark: SparkSession, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """WARC file(s)/dir/glob -> (url, warc_ts, html, warc_type, record_id).

    ``record_types`` filters WARC-Type (Common Crawl segments interleave
    request/response/metadata records); () keeps everything.
    """
    files = spark.read.format("binaryFile").load(path).select("content")
    types = tuple(t.lower() for t in record_types)

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in _parse_warc_bytes(bytes(blob)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "").lower()
                    if types and wtype not in types:
                        continue
                    rows.append(
                        (
                            h.get("warc-target-uri"),
                            _ts(h.get("warc-date", "")),
                            rec["payload"],
                            wtype,
                            h.get("warc-record-id", ""),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "warc_type", "record_id"]
            )

    return files.mapInPandas(segment, WARC_SCHEMA)


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC responses -> the engine's pages-corpus shape (input_hint):
    (url_canon, warc_ts, html). Canonicalization + sha keying happen in
    the crawl itself (seeds/corpus share one canonical form)."""
    from data_collector_spark.functions.urls import with_canonical_url

    recs = read_warc(spark, path).filter(F.col("url").isNotNull())
    return (
        with_canonical_url(recs, "url")
        .filter(F.col("url_canon").isNotNull())
        .select("url_canon", "warc_ts", "html")
    )


def _record_bytes(url: str, ts, payload: bytes, record_id: str) -> bytes:
    when = (ts or datetime(1970, 1, 1)).replace(tzinfo=timezone.utc)
    head = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: response\r\n"
        + b"WARC-Record-ID: " + record_id.encode() + b"\r\n"
        + b"WARC-Target-URI: " + (url or "").encode() + b"\r\n"
        + b"WARC-Date: "
        + when.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
        + b"\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = False,
) -> int:
    """Archive a pages DataFrame as WARC: one part-NNNNN.warc per
    partition, written executor-side (no driver collect). Record IDs are
    deterministic (<urn:uuid-free>: partition/ordinal) so re-runs produce
    identical files. ``compress=True`` writes .warc.gz in the Common Crawl
    layout — every record its own gzip member (mtime pinned to 0 so
    re-runs stay byte-identical). Returns the number of files written."""
    import gzip
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = [url_col, ts_col, payload_col]
    ext = ".warc.gz" if compress else ".warc"

    def write_part(idx: int, it):
        out = io.BytesIO()
        wrote = 0
        for row in it:
            rec = _record_bytes(
                row[url_col], row[ts_col], bytes(row[payload_col] or b""),
                f"<urn:dcs:{idx}/{wrote}>",
            )
            out.write(gzip.compress(rec, mtime=0) if compress else rec)
            wrote += 1
        if wrote:
            tmp = os.path.join(out_dir, f".part-{idx:05d}{ext}.tmp")
            with open(tmp, "wb") as f:
                f.write(out.getvalue())
            os.replace(tmp, os.path.join(out_dir, f"part-{idx:05d}{ext}"))
        return iter([(idx, wrote)])

    parts = (
        df.select(*cols)
        .rdd.mapPartitionsWithIndex(write_part)
        .filter(lambda t: t[1] > 0)
        .count()
    )
    return parts

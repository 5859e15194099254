"""Golden extraction tests — pins the byte-identical text invariant
(BASELINE.json input_hint). Literal html -> literal expected text, so any
change to the extraction rules breaks here first."""

import pandas as pd

from data_collector_spark.functions.extract import (
    extract_links_series,
    extract_text_bytes,
    extract_text_series,
    with_extracted,
)

GOLDEN = [
    (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><h1>Head</h1><!-- hidden --><p>a &amp; b</p>"
        b'<a href="http://h0.test/p/1">go</a></body></html>',
        "T Head a & b go",
    ),
    (b"<p>  spaced   out  </p>", "spaced out"),
    (b"plain text no tags", "plain text no tags"),
    (b"<style>body{}</style>x &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "x <tag> \"q\" 's'"),
    (b"", ""),
    ("\xe9l\xe8ve <b>ok</b>".encode("utf-8"), "\xe9l\xe8ve ok"),
]


def test_golden_text():
    for html, expected in GOLDEN:
        assert extract_text_bytes(html) == expected


def test_vectorized_matches_scalar():
    out = extract_text_series(pd.Series([g[0] for g in GOLDEN]))
    assert list(out) == [g[1] for g in GOLDEN]


def test_links_absolute_and_relative():
    html = pd.Series(
        [
            b'<a href="http://a.test/x">1</a> <a HREF="https://b.test/y">2</a>'
            b' <a class="z" href="/rel">3</a>',
            b"no links here",
        ]
    )
    base = pd.Series(["http://base.test/page", "http://base.test/q"])
    out = extract_links_series(html, base)
    assert list(out[0]) == ["http://a.test/x", "https://b.test/y", "http://base.test/rel"]
    assert list(out[1]) == []


def test_with_extracted_spark(spark):
    rows = [("http://s.test/p", g[0]) for g in GOLDEN[:4]]
    df = spark.createDataFrame(rows, "url_canon string, html binary")
    out = with_extracted(df).orderBy("extracted_text").collect()
    assert sorted(r["extracted_text"] for r in out) == sorted(g[1] for g in GOLDEN[:4])

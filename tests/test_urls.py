"""Canonicalization unit tests — the layer-1 pure-function tests of
SURVEY.md §5 (analog: JSON-parsing shape tests at
/root/reference/src/actions/collect/nyse_events.rs:348-468)."""

import hashlib

import pandas as pd
import pytest

from data_collector_spark.functions.urls import (
    canonicalize_series,
    canonicalize_url,
    with_canonical_url,
)

CASES = [
    ("http://Example.COM/path", "http://example.com/path"),
    ("HTTPS://example.com:443/a/", "https://example.com/a"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?single=1", "http://example.com/a?single=1"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com/a?", "http://example.com/a"),
    ("ftp://example.com/x", None),
    ("not a url", None),
    ("", None),
    (None, None),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_scalar(raw, expected):
    assert canonicalize_url(raw) == expected


def test_canonicalize_vectorized_matches_scalar():
    raw = [c[0] for c in CASES]
    out = canonicalize_series(pd.Series(raw, dtype="object"))
    assert list(out) == [c[1] for c in CASES]


def test_idempotent():
    for raw, expected in CASES:
        if expected is not None:
            assert canonicalize_url(expected) == expected


def test_with_canonical_url_spark(spark):
    df = spark.createDataFrame(
        [(c[0],) for c in CASES if c[0] is not None], "url string"
    )
    out = with_canonical_url(df).orderBy("url_canon").collect()
    expected = sorted(c[1] for c in CASES if c[1] is not None)
    assert [r["url_canon"] for r in out] == expected
    for r in out:
        assert r["url_sha1"] == hashlib.sha1(r["url_canon"].encode()).hexdigest()
        # host excludes the port — politeness budgets are per host
        assert r["host"] == r["url_canon"].split("://")[1].split("/")[0].split("?")[0].split(":")[0]

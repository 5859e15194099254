"""Mirror of the driver's correctness gate: every oracle-backed query runs
through Spark AND DuckDB at sf0.001; row sets must match exactly
(order-insensitive, columns sorted by name — same rules as the driver)."""

import datetime
import math

import duckdb
import pytest

from data_collector_spark.plans import ORACLES, QUERIES
from data_collector_spark.sources.tables import TABLES


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def _canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows), cols


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, duck, name):
    got = QUERIES[name](spark, sf_dir).toPandas()
    exp = duck.sql(ORACLES[name]).df()
    grows, gcols = _canon_rows(got)
    erows, ecols = _canon_rows(exp)
    assert gcols == ecols, f"{name}: column names differ: {gcols} vs {ecols}"
    assert len(grows) == len(erows), (
        f"{name}: row count {len(grows)} vs oracle {len(erows)}"
    )
    if grows != erows:
        diff = [(a, b) for a, b in zip(grows, erows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {"crawl_fetch_log", "crawl_seen_set"})
)
def test_rows_only_deterministic(spark, sf_dir, name):
    """Non-SQL-expressible ops: stable schema + deterministic row set."""
    a = QUERIES[name](spark, sf_dir)
    b = QUERIES[name](spark, sf_dir)
    ra, ca = _canon_rows(a.toPandas())
    rb, cb = _canon_rows(b.toPandas())
    assert ca == cb and ra == rb

"""Registry wiring SURVEY.md §2 operators to the driver contract.

Each entry: a Spark callable (spark, sf_dir) -> DataFrame and, where the
operator is SQL-expressible, a DuckDB oracle string over the same parquet
views. Column names/aliases match exactly on both sides (driver hashes
values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship crawl — two frontier rounds over a pages corpus derived
from the sf0.001 documents table, returning the per-host ordered fetch log.
queries()/oracle_sql(): SURVEY.md §2 operator inventory + training-data
operators, implemented in data_collector_spark.plans.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_collector_spark.plans import DRIVER_ORACLES, DRIVER_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic 2-round crawl over sf0.001-derived pages."""
    return DRIVER_QUERIES["crawl_fetch_log"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 queries — the driver's CORRECTNESS budget — covering
    every applicable SURVEY.md §2 operator row and every training-data
    operator (see plans/__init__.py DRIVER_EXPORT; the full registry with
    the fine-grained variants runs in tests/test_oracle_parity.py)."""
    return dict(DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DRIVER_ORACLES)

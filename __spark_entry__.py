"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``udacitydatawarehouseprj_spark.queries`` — the query
surface, oracle SQL, and documentation all live there (one registry, one
source of truth).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()

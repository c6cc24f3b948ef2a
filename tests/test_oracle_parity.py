"""DuckDB differential oracle in pytest form (the driver's t2 gate,
SURVEY §5.1), at sf0.001 for speed. Strict: exact values, not hashes.
``tools/parity.py`` runs the same comparison standalone at any sf.

Round-14 (VERDICT r13 item 3): the FULL ~400-query sweep pushed the
suite past the driver's pytest budget (r13: zero failures but killed at
~76%), so by default this file runs a deterministic 1-in-8 subset
(~50 queries, stable across runs — hash of the name, not random) plus
every rows-only query. Set SPARK_GRAFT_FULL_PARITY=1 for the full
sweep (used before committing behavioural changes; ``tools/parity.py``
remains the standalone full-coverage gate at any sf)."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark import session as S

import sys

sys.path.insert(0, "tools")
from parity import compare  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in S.TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{S.table_path(sf_dir, t)}'")
    return con


ORACLES = Q.oracle_sql()

FULL_PARITY = os.environ.get("SPARK_GRAFT_FULL_PARITY", "") == "1"


def _fast_subset(name: str) -> bool:
    """Deterministic 1-in-8 sample — stable across runs/machines (md5 of
    the name, not Python's salted hash), so the default suite always
    checks the SAME ~50 queries and a failure reproduces."""
    return int(hashlib.md5(name.encode()).hexdigest(), 16) % 8 == 0


PARITY_NAMES = sorted(
    n for n in ORACLES if FULL_PARITY or _fast_subset(n)
)


@pytest.mark.parametrize("name", PARITY_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = Q.queries()[name](spark, sf_dir).toPandas()
    ddf = duck.sql(ORACLES[name]).fetchdf()
    errs = compare(name, sdf, ddf)
    assert not errs, errs


@pytest.mark.parametrize(
    "name", sorted(set(Q.queries()) - set(ORACLES))
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = Q.queries()[name](spark, sf_dir)
    assert df.count() >= 0  # executes without error, stable schema
    assert len(df.schema.fields) > 0

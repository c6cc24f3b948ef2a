"""Unit tests for the round-4 wave-5 operators: triangle counting,
salted grouped top-k, integer-fixed-point EWMA, Poissonized bootstrap,
grouped OLS. The DuckDB-oracle replay in test_oracle_parity is the
cross-engine gate; these tests pin the operator-level invariants on
hand-built inputs where the right answer is known by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark.operators import graph
from udacitydatawarehouseprj_spark.operators import relational as rel


def test_triangle_count_planted(spark):
    # K4 on {1,2,3,4} (4 triangles) + a pendant chain 4-5-6 (0 triangles)
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    row = graph.triangle_count(df).collect()[0]
    assert row.n_nodes == 6
    assert row.n_edges == 8
    assert row.n_triangles == 4


def test_triangle_count_handles_duplicates_and_reversed_edges(spark):
    # same triangle listed twice, once reversed — canonicalization dedups
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    row = graph.triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


def test_triangle_count_empty_graph(spark):
    df = spark.createDataFrame([], "a long, b long")
    row = graph.triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)


def test_grouped_top_k_salted_matches_plain_window(spark):
    # 3 groups x 200 rows with deterministic pseudo-random values + ties
    rows = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), F.lit(97))).cast("double").alias("v"),
    )
    order = [F.col("v").desc(), F.col("rid").asc()]
    plain = rel.grouped_top_k(rows, ["g"], order, k=7, rank_col="rn")
    salted = rel.grouped_top_k_salted(
        rows, ["g"], order, k=7,
        salt=F.pmod(F.xxhash64("rid"), F.lit(5)), n_salt=5, rank_col="rn",
    )
    a = sorted(map(tuple, plain.select("g", "rn", "rid", "v").collect()))
    b = sorted(map(tuple, salted.select("g", "rn", "rid", "v").collect()))
    assert a == b and len(a) == 21


def test_grouped_top_k_salted_small_groups(spark):
    # groups smaller than k survive intact (every row ranked)
    rows = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 3.0), ("b", 3, 9.0)], "g string, rid long, v double"
    )
    out = rel.grouped_top_k_salted(
        rows, ["g"], [F.col("v").desc(), F.col("rid").asc()], k=10,
        salt=F.pmod(F.xxhash64("rid"), F.lit(4)), n_salt=4,
    )
    assert out.count() == 3


def test_ewma_closed_form(spark, sf_dir):
    """EWMA of a user's own event stream, recomputed in plain Python from
    the same micro-unit quantization — the operator's integer arithmetic
    must match the sequential definition exactly."""
    from udacitydatawarehouseprj_spark import queries as Q

    out = {r.user_id: r for r in Q.ewma_user_value(spark, sf_dir).collect()}
    ev = (
        Q._t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    target = min(20, len(by_user))
    checked = 0
    for uid, rows in list(by_user.items())[:target]:
        rows.sort(key=lambda r: (r.ts, r.event_id), reverse=True)
        last = rows[:16]
        num = sum(
            int(round(r.value * 1e6)) * (1 << (16 - (i + 1)))
            for i, r in enumerate(last)
        )
        den = sum((1 << (16 - (i + 1))) for i in range(len(last))) * 1000000
        expect = round(num / den, 6)
        got = out[uid]
        assert got.n_used == len(last)
        assert math.isclose(got.ewma_value, expect, rel_tol=0, abs_tol=0), (
            uid, got.ewma_value, expect,
        )
        checked += 1
    assert checked == target and target > 0


def test_bootstrap_weights_are_poisson_like(spark, sf_dir):
    """Across replicates the mean draw count per row must be ≈ 1 (the
    Poissonization contract): total drawn ≈ B × n within 5%."""
    from udacitydatawarehouseprj_spark import queries as Q

    out = Q.bootstrap_ci_mean(spark, sf_dir).collect()
    assert len(out) == 16
    n = Q._t(spark, sf_dir, "events").count()
    total = sum(r.n_drawn for r in out)
    assert abs(total - 16 * n) / (16 * n) < 0.05
    # replicate means spread around the true mean
    true_mean = (
        Q._t(spark, sf_dir, "events").agg(F.avg("value")).collect()[0][0]
    )
    boots = [r.boot_mean for r in out]
    assert min(boots) < true_mean < max(boots)


def test_linreg_matches_numpy(spark, sf_dir):
    import numpy as np

    from udacitydatawarehouseprj_spark import queries as Q

    got = {r.l_returnflag: r for r in Q.linreg_by_group(spark, sf_dir).collect()}
    li = (
        Q._t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        slope, intercept = np.polyfit(
            grp["l_quantity"].to_numpy(), grp["l_discount"].to_numpy(), 1
        )
        r = got[flag]
        assert math.isclose(r.slope, slope, abs_tol=1e-4)
        assert math.isclose(r.intercept, intercept, abs_tol=1e-4)


def test_mad_outlier_counts_match_pandas(spark, sf_dir):
    from udacitydatawarehouseprj_spark import queries as Q

    got = {r.event_type: r for r in Q.mad_outlier_filter(spark, sf_dir).collect()}
    ev = Q._t(spark, sf_dir, "events").select("event_type", "value").toPandas()
    for et, grp in ev.groupby("event_type"):
        med = round(float(grp["value"].quantile(0.5, interpolation="linear")), 6)
        d = (grp["value"] - med).abs()
        mad = round(float(d.quantile(0.5, interpolation="linear")), 6)
        n_out = int((d > 3.0 * mad).sum())
        r = got[et]
        assert math.isclose(r.med, med, abs_tol=1e-9)
        assert math.isclose(r.mad, mad, abs_tol=1e-9)
        assert r.n_outliers == n_out
        assert r.n_total == len(grp)

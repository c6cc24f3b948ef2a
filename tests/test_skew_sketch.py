"""Skew-handling join and sketch-aggregate tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark.operators import skew


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    # 10k rows, 90% on one hot key — the shape that melts a shuffle join
    large = spark.range(10000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100)
        .alias("k"),
    )
    small = spark.createDataFrame(
        [Row(k=i, name=f"dim{i}") for i in range(100)]
    )
    plain = {(r.row_id, r.k, r.name)
             for r in large.join(small, "k").collect()}
    salted = {(r.row_id, r.k, r.name)
              for r in skew.salted_join(large, small, on="k",
                                        unique_col="row_id",
                                        num_salts=8).collect()}
    assert salted == plain
    assert len(plain) == 10000  # every row matched exactly once


def test_salted_left_join(spark):
    large = spark.range(100).select(F.col("id").alias("row_id"),
                                    (F.col("id") % 150).alias("k"))
    small = spark.createDataFrame([Row(k=i, name=f"d{i}") for i in range(50)])
    out = skew.salted_join(large, small, on="k", unique_col="row_id",
                           num_salts=4, how="left")
    rows = out.collect()
    assert len(rows) == 100  # left join preserves the large side
    unmatched = [r for r in rows if r.name is None]
    assert len(unmatched) == len([r for r in rows if r.k >= 50])


def test_approx_distinct_within_bound(spark, sf_dir):
    from udacitydatawarehouseprj_spark import queries as Q

    out = Q.queries()["agg_approx_distinct"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r.approx_users - r.exact_users) <= max(0.05 * r.exact_users, 2)


def test_sessionize_gap_semantics(spark):
    from udacitydatawarehouseprj_spark import queries as Q  # noqa: F401
    from datetime import datetime

    rows = [
        Row(user_id=1, ts=datetime(2024, 1, 1, 10, 0)),
        Row(user_id=1, ts=datetime(2024, 1, 1, 10, 20)),   # same session
        Row(user_id=1, ts=datetime(2024, 1, 1, 11, 30)),   # gap > 30min → new
        Row(user_id=2, ts=datetime(2024, 1, 1, 10, 5)),
    ]
    df = spark.createDataFrame(rows)
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
        .collect()
    )
    sess = {(r.user_id, r.start, r.n) for r in out}
    assert sess == {
        (1, datetime(2024, 1, 1, 10, 0), 2),
        (1, datetime(2024, 1, 1, 11, 30), 1),
        (2, datetime(2024, 1, 1, 10, 5), 1),
    }


def test_salted_join_rejects_outer(spark):
    import pytest

    from udacitydatawarehouseprj_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", "k", how="full")


def test_merge_upsert_semantics(spark):
    from udacitydatawarehouseprj_spark.operators.relational import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

"""As-of join and bucketed range join unit tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark.operators import temporal


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=5, lv="a"), Row(k=1, lts=10, lv="b"),
         Row(k=1, lts=1, lv="d"), Row(k=2, lts=3, lv="c")]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=4, rv="x"), Row(k=1, rts=9, rv="y"),
         Row(k=1, rts=10, rv="z"), Row(k=2, rts=99, rv="w")]
    )
    out = {
        (r.k, r.lts): (r.rts, r.rv)
        for r in temporal.asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["rts", "rv"],
        ).collect()
    }
    # mirrors the DuckDB ASOF semantics check: ≤, ties match, no-prior → NULL
    assert out[(1, 1)] == (None, None)
    assert out[(1, 5)] == (4, "x")
    assert out[(1, 10)] == (10, "z")
    assert out[(2, 3)] == (None, None)


def test_asof_join_dedup_keep(spark):
    left = spark.createDataFrame([Row(k=1, lts=5)])
    right = spark.createDataFrame(
        [Row(k=1, rts=4, rid=7), Row(k=1, rts=4, rid=9)]  # same key+ts
    )
    out = temporal.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["rid"], dedup_keep="rid",
    ).collect()
    assert out[0].rid == 9  # deterministic winner: max rid


def test_range_join_bands_containment(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=0.5), Row(id=2, v=10.0), Row(id=3, v=19.999),
         Row(id=4, v=999.0)]  # out of band range → dropped
    )
    out = {r.id: (r.band_id, r.lo, r.hi)
           for r in temporal.range_join_bands(df, "v", 10.0, 3).collect()}
    assert out[1] == (0, 0.0, 10.0)
    assert out[2] == (1, 10.0, 20.0)  # boundary lands in the upper band
    assert out[3] == (1, 10.0, 20.0)
    assert 4 not in out


def test_range_join_is_hash_not_bnlj(spark, sf_dir):
    from udacitydatawarehouseprj_spark import queries as Q

    df = Q.queries()["range_join_value_bands"](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

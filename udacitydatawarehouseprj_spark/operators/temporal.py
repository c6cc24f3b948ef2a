"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketed range join — composed from DataFrame primitives (the
custom-operator pattern: composition first, never a driver-side loop).

**As-of join** (``asof_join``): for each left row, the single right row
with the greatest ``right_ts`` ≤ ``left_ts`` per key (DuckDB's
``ASOF JOIN``, kdb's ``aj``). The scalable composition is union-sort-carry:

    union both sides tagged (right=0, left=1)
    window per key ordered by (ts, side)  — right rows sort before left
                                            rows at equal ts, so ties match
    carry last non-null right payload forward
    keep left rows

One shuffle (the window partition), no range-condition join — the naive
``l JOIN r ON l.ts >= r.ts`` + max-rank plan explodes to O(|L|·|R|) per
key; this stays O(|L|+|R|) log-sorted. Exactly the plan a time-series
engine runs distributed.

**Range join** (``range_join_bands``): interval containment expressed as
an equi-join on a computed bucket key + residual predicate. Catalyst plans
a raw ``BETWEEN`` join as broadcast-nested-loop — O(|L|·|bands|); the
bucket key makes it a hash join, O(|L|). The pattern generalizes to any
fixed-width banding (time buckets, histograms, geo tiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    dedup_keep: str | None = None,
) -> DataFrame:
    """Backward as-of left join: latest right row (by ``right_ts``) at or
    before each left row's ``left_ts``, per ``key``.

    ``right_payload`` columns are appended to every left row (NULL when no
    prior right row exists). If right may hold several rows per
    (key, right_ts), pass ``dedup_keep`` — the winner is the row with the
    max of that column (deterministic; mirrors the oracle's QUALIFY).
    """
    r = right
    if dedup_keep:
        w_d = Window.partitionBy(key, right_ts).orderBy(F.col(dedup_keep).desc())
        r = (
            r.withColumn("_rn", F.row_number().over(w_d))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    payload = F.struct(*[F.col(c) for c in right_payload])
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    null_payload = F.lit(None).cast(
        right.select(payload.alias("_r")).schema[0].dataType
    )
    null_lrow = F.lit(None).cast(left.select(l_struct.alias("_l")).schema[0].dataType)
    r_tagged = r.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        payload.alias("_r"),
        F.lit(0).alias("_side"),
        null_lrow.alias("_l"),
    )
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        null_payload.alias("_r"),
        F.lit(1).alias("_side"),
        l_struct.alias("_l"),
    )
    combined = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )
    return out


def range_join_bands(
    df: DataFrame,
    value_col: str,
    band_width: float,
    num_bands: int,
) -> DataFrame:
    """Join rows to fixed-width value bands [i·w, (i+1)·w) via an
    equi-join on the computed bucket key (hash join, not BNLJ). Returns
    the input columns plus (band_id, lo, hi)."""
    spark = df.sparkSession
    bands = spark.range(0, num_bands).select(
        F.col("id").alias("band_id"),
        (F.col("id") * band_width).cast("double").alias("lo"),
        ((F.col("id") + 1) * band_width).cast("double").alias("hi"),
    )
    keyed = df.withColumn(
        "band_id", F.floor(F.col(value_col) / F.lit(band_width)).cast("long")
    )
    return (
        keyed.join(F.broadcast(bands), "band_id")
        # residual guard: the bucket key already implies containment for
        # in-range values; the filter also drops out-of-range rows
        .filter((F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")))
    )

"""Physical-layout operators: multi-dimensional clustering for scan
pruning.

Parquet scans skip row groups / files whose column min-max stats exclude
the predicate. A sort on one column gives perfect skipping on that
column and none on others; interleaving the BITS of several columns
(Morton / Z-order) gives each dimension locality ~1/k of the curve, so a
2-D box predicate prunes most row groups on BOTH columns. This is the
layout step a 100 TB table runs at write time (`zorder_layout` =
range-repartition + in-partition sort by the Z key) so that later
point/box queries never scan the full table.

Everything is integer Column arithmetic (shift/and/sum) — codegen'd,
no UDFs, and bit-for-bit replayable in the SQL oracle.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[str], bits: int = 8) -> F.Column:
    """Morton Z-key: interleave the low ``bits`` bits of each column.

    Column i contributes its bit b to output position b*k + i (k = number
    of columns). Inputs must already be bucketed to [0, 2**bits) —
    callers normalize with ``% 2**bits`` or a width bucket; the key is a
    BIGINT so k*bits ≤ 63. ``cols`` entries may be column names or SQL
    expressions (parsed with ``F.expr``).
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"z-key needs {k * bits} bits; max 63")
    terms = [
        F.shiftleft(
            F.shiftright(F.expr(c).cast("long"), b).bitwiseAND(F.lit(1)),
            b * k + i,
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return functools.reduce(operator.add, terms)


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """The identical Z-key in ANSI SQL (oracle replay)."""
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * k + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    key_col: str = "z_key",
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional skipping: range-partition by
    the Z key, sort within partitions, keep the key column. Writing the
    result to parquet yields files AND row groups whose min-max ranges
    tile the Z curve — box predicates on any clustered column prune."""
    out = df.withColumn(key_col, zorder_key_expr(cols, bits))
    parts = [num_partitions] if num_partitions else []
    return out.repartitionByRange(*parts, key_col).sortWithinPartitions(key_col)


# --- Deterministic training-data layout --------------------------------
#
# Portable multiplicative hash for split/shuffle decisions: pure int64
# arithmetic with an explicit pre-reduction so no intermediate exceeds
# 2^62 — bit-identical in any engine (Spark, DuckDB, anything with int64),
# unlike engine-native hashes (xxhash64/murmur). (id % MOD) < 2^31 and
# MULT < 2^32, so (id % MOD) * MULT < 2^63.
SPLIT_HASH_MULT = 2_654_435_761  # Knuth 2^32 / golden ratio
SPLIT_HASH_ADD = 40_503
SPLIT_HASH_MOD = 2_147_483_647  # 2^31 - 1


def portable_hash_expr(id_col: str) -> F.Column:
    return (
        (F.col(id_col).cast("long") % SPLIT_HASH_MOD) * SPLIT_HASH_MULT
        + SPLIT_HASH_ADD
    ) % SPLIT_HASH_MOD


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    The split decision is a pure function of the id — stable across
    runs, engines, and re-partitioning, so a growing 100 TB corpus keeps
    every existing document in its original split (no leakage when data
    is appended). A per-row map: zero shuffles.
    """
    pct = portable_hash_expr(id_col) % 100
    return df.select(
        F.col(id_col),
        pct.cast("int").alias("split_pct"),
        F.when(pct < train_pct, "train")
        .when(pct < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def shuffle_buckets(
    df: DataFrame, id_col: str = "doc_id", n_buckets: int | None = None
) -> DataFrame:
    """Deterministic global training shuffle, bucketed.

    A total order over 100 TB is an anti-pattern (one giant range sort);
    instead: bucket = hash(id) % n_buckets, position = rank of hash
    within the bucket. Readers stream buckets in any order and rows
    within a bucket sequentially — a reproducible permutation with ONE
    hash-partitioned shuffle and per-bucket (not global) sorts.
    ``n_buckets`` defaults to 4× the cluster's defaultParallelism
    (buckets grow with the cluster, so no executor's per-bucket sort
    budget ever absorbs the whole corpus). NOTE the output (bucket,
    pos) is a function of n_buckets: callers that need the SAME
    permutation across cluster sizes (an oracled contract, a resumable
    training run) must pin n_buckets explicitly.
    """
    from pyspark.sql import Window

    if n_buckets is None:
        n_buckets = 4 * df.sparkSession.sparkContext.defaultParallelism
    h = portable_hash_expr(id_col)
    bucket = (h % n_buckets).cast("int")
    w = Window.partitionBy("bucket").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"), bucket.alias("bucket"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "bucket", "pos")
    )


def mix_sources_weighted(
    df: DataFrame,
    weight: F.Column,
    group_col: str = "source",
    id_col: str = "doc_id",
    cost_col: str = "n_chars",
    budget_num: int = 1,
    budget_den: int = 2,
    block_shift: int = 25,
) -> DataFrame:
    """Deterministic weighted source mixing (the pretraining data-mixture
    step): build a corpus of ``budget_num/budget_den`` of the total cost
    (chars/tokens/bytes), allocating each source a share proportional to
    its ``weight``, selecting documents inside each source in portable-
    hash order (a reproducible shuffle) until the allocation fills.

    All arithmetic is integer and the keep predicate is cross-multiplied
    (``cum·den·Σw ≤ total·num·w``) so there is no division anywhere —
    bit-identical in any engine. Overflow bound: the largest product is
    ``total·den·Σw``, so the safe total-cost ceiling is
    ``2^63 / (budget_den · Σweights)`` — e.g. ~9·10^16 chars at den=2,
    Σw=50. Beyond that, switch the comparison columns to DECIMAL(38,0)
    (exact, slower) rather than trusting silent int64 wraparound.

    The per-source cumulative sum is a TWO-PASS distributed prefix sum,
    not a window partitioned on the source column: with ~5 sources a
    ``PARTITION BY source`` window sorts each source's ENTIRE corpus in
    one partition — the low-cardinality-window scale killer. Instead the
    portable hash's high bits split every source into 2^(31-block_shift)
    ORDERED blocks (block = _h >> block_shift is monotone in the
    (_h, id) selection order, and equal hashes land in the same block,
    so concatenating blocks in block order IS the per-source order):
    pass 1 computes block-local cumulative sums with a window on
    (source, block) — cardinality sources × blocks, each partition a
    1/blocks slice of a source; pass 2 aggregates per-block totals
    (map-side combined, tiny) and turns them into per-block prefix
    OFFSETS with a window over that few-hundred-row relation, broadcast
    back. cum = local_cum + offset, bit-identical to the global window.
    At 100 TB raise block_shift's complement (more blocks) so a block
    fits an executor's sort budget. Weights are aggregated to ONE value
    per source (max) before Σw — a non-constant weight column cannot
    silently double-count a source's share.

    Sources whose weight share exceeds their actual size simply saturate
    (sampling is without replacement; epoch replication is a reader-side
    concern).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(cost_col).cast("long").alias("_cost"),
        weight.cast("long").alias("_w"),
    )
    total = base.agg(F.sum("_cost").alias("_total"))
    # one weight per source: max() collapses accidental per-row drift so
    # Σw cannot double-count a source (round-3 advice); the per-row
    # predicate below uses the same collapsed value.
    w_src = base.groupBy(group_col).agg(F.max("_w").alias("_w"))
    sum_w = w_src.agg(F.sum("_w").alias("_sumw"))

    hashed = (
        base.drop("_w")
        .withColumn("_h", portable_hash_expr(id_col))
        .withColumn("_blk", F.shiftright(F.col("_h"), block_shift))
    )
    w_local = (
        Window.partitionBy(group_col, "_blk")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = hashed.withColumn("_lcum", F.sum("_cost").over(w_local))
    block_totals = hashed.groupBy(group_col, "_blk").agg(
        F.sum("_cost").alias("_btot")
    )
    w_prefix = (
        Window.partitionBy(group_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = block_totals.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(w_prefix), F.lit(0))
    ).select(group_col, "_blk", "_off")

    ranked = local.join(F.broadcast(offsets), [group_col, "_blk"]).withColumn(
        "_cum", F.col("_lcum") + F.col("_off")
    )
    return (
        ranked.join(F.broadcast(total))
        .join(F.broadcast(sum_w))
        .join(F.broadcast(w_src), group_col)
        .filter(
            F.col("_cum") * F.lit(budget_den) * F.col("_sumw")
            <= F.col("_total") * F.lit(budget_num) * F.col("_w")
        )
        .select(id_col, group_col, F.col("_cost").alias(cost_col))
    )


def pack_bins_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    cost_col: str = "n_chars",
    capacity: int = 2048,
    n_buckets: int | None = None,
) -> DataFrame:
    """Sequence packing: first-fit-decreasing bin packing of documents
    into fixed-capacity bins (context windows), bucketed for scale.

    True bin packing is inherently sequential, so it runs inside
    ``applyInPandas`` per hash bucket: bucket = portable_hash(id) %
    n_buckets (one shuffle), FFD within the bucket (sort by cost desc,
    place each doc in the first bin with room). FFD guarantees ≤
    11/9·OPT+1 bins; per-bucket independence is what makes the operator
    linear at 100 TB. ``n_buckets`` defaults to 4× the cluster's
    defaultParallelism (the shuffle.partitions idiom): buckets grow
    with the cluster, so no executor ever serializes the whole corpus'
    packing — a fixed small count was the round-11 sf100 bottleneck
    (8 buckets → 8 Python tasks FFD-packing 125k docs each, and FFD's
    first-fit scan is O(docs·bins) per bucket, so halving bucket size
    quarters the work). Oversize docs (cost > capacity) get a dedicated
    bin each — flagged by the caller-visible invariant that multi-doc
    bins never exceed capacity. Bin ids are globally unique
    (bucket ⊕ local index). The packing is a pure function of
    (ids, costs, n_buckets) — reproducible across runs, engines, and
    data partitionings; pass an explicit n_buckets to also pin the
    result across cluster sizes (the caller-visible invariants —
    coverage, cost preservation, capacity — hold for ANY bucket count).
    """
    import pandas as pd

    if n_buckets is None:
        n_buckets = 4 * df.sparkSession.sparkContext.defaultParallelism
    bucket = (portable_hash_expr(id_col) % n_buckets).cast("int")
    src = df.select(
        F.col(id_col).cast("long"),
        F.col(cost_col).cast("long").alias("cost"),
        bucket.alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cost", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bkt = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        remaining: list[int] = []
        assign: list[int] = []
        for cost in pdf["cost"]:
            c = int(cost)
            for i, room in enumerate(remaining):
                if c <= room:
                    remaining[i] = room - c
                    assign.append(i)
                    break
            else:
                remaining.append(max(capacity - c, 0))
                assign.append(len(remaining) - 1)
        pdf["bin_id"] = [bkt * 1_000_000_000 + a for a in assign]
        return pdf[[id_col, "bucket", "bin_id", "cost"]]

    return src.groupBy("bucket").applyInPandas(
        pack, f"{id_col} long, bucket int, bin_id long, cost long"
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = 100,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res).

    Efraimidis–Spirakis: draw u ∈ (0,1] per row, keep the k largest
    priorities u^(1/w) — equivalently the k largest ln(u)/w, which
    avoids the pow. u comes from the portable integer hash of the id,
    not a RNG, so the sample is reproducible across runs, engines, and
    partitionings — the property that matters when a 100 TB corpus is
    resampled incrementally. Plans as TakeOrderedAndProject over a
    per-row map: no global sort, no shuffle beyond the final top-k
    merge. The priority itself is not part of the output contract
    (libm ``ln`` is not guaranteed correctly rounded, so its low bits
    are implementation-defined; the SELECTION is stable because
    priorities of distinct hashes differ by ≫ 1 ulp).
    """
    u = (portable_hash_expr(id_col).cast("double") + F.lit(1.0)) / F.lit(
        float(SPLIT_HASH_MOD)
    )
    priority = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), priority.alias("_p"))
        .orderBy(F.col("_p").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, weight_col)
    )

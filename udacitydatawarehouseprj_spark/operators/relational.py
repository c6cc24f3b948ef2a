"""Relational operator helpers (SURVEY §2.2-2.7).

Most relational operators are expressed inline in ``queries.py`` as plain
DataFrame chains — that IS the idiomatic Spark form (Catalyst sees the whole
logical plan and fuses filter/project into the scan). The helpers here are
the few reusable compositions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k: ORDER BY (with a unique tie-break supplied by
    the caller) + LIMIT. The reference only ever uses bare LIMIT
    (sql_queries.py:220; SURVEY §2.5 L1) — non-deterministic; we always
    pair it with an order (§5 test discipline).

    Scale: Spark plans this as TakeOrderedAndProject — each partition keeps
    k rows, then the driver merges; no global sort shuffle.
    """
    return df.orderBy(*order).limit(k)


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J3: native left_anti — the reference spells this as
    LEFT JOIN … WHERE right.col IS NULL (Fiddle.ipynb cell 61,
    json:34162-34165)."""
    return left.join(right, on, "left_anti")


def grouped_top_k(
    df: DataFrame,
    partition_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group via row_number window. Order must include a unique
    tie-break for determinism."""
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def exact_distributed_rank(
    df: DataFrame,
    block: Column,
    order: Sequence[Column],
    partition: Sequence[str] = (),
    block_desc: bool = False,
    rank_col: str = "rnk",
) -> DataFrame:
    """EXACT global (or per-partition-key) ``row_number`` rank WITHOUT a
    single-partition window sort — the two-pass machinery shared by
    ``source_cap_topn`` / ``curriculum_order_shards`` /
    ``reservoir_sample_per_group`` (and, in bespoke closed-form variants,
    ``quality_filter_top_pct`` / ``length_bucket_batches``).

    ``block`` must be a coarse function of the LEADING sort key that is
    monotone in the sort direction (e.g. ``n_chars div 100`` for an
    ``ORDER BY n_chars``): block values then delimit disjoint ordered
    ranges of the sort order, so

    1. a window on ``partition + [block]`` computes block-local row
       numbers (every block sorts in its own partition — at 100 TB no
       partition key's corpus ever sorts in one task), and
    2. per-block counts (a tiny ``n_partitions × n_blocks`` relation)
       prefix-summed over blocks — in ``block_desc`` order when the sort
       descends — become broadcast offsets that lift local row numbers
       to the exact global rank.

    Bit-identical to ``ROW_NUMBER() OVER (PARTITION BY partition ORDER BY
    order)`` for any total order (callers must include a unique
    tie-break). The prefix window itself is global-single-partition, but
    over the counts relation, which is bounded by design.
    """
    part = list(partition)
    s = df.withColumn("_blk", block)
    w_local = Window.partitionBy(*(part + ["_blk"])).orderBy(*order)
    local = s.withColumn("_lrn", F.row_number().over(w_local))
    counts = s.groupBy(*(part + ["_blk"])).agg(F.count("*").alias("_c"))
    blk_ord = F.col("_blk").desc() if block_desc else F.col("_blk").asc()
    w_prefix = (
        (Window.partitionBy(*part) if part else Window.partitionBy())
        .orderBy(blk_ord)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_prefix), F.lit(0))
    ).select(*part, "_blk", "_off")
    return (
        local.join(F.broadcast(offsets), part + ["_blk"])
        .withColumn(rank_col, F.col("_off") + F.col("_lrn"))
        .drop("_blk", "_lrn", "_off")
    )


def blocked_prefix_sum(
    df: DataFrame,
    block: Column,
    order: Sequence[Column],
    value: Column,
    partition: Sequence[str] = (),
    sum_col: str = "run_sum",
    validate: bool = False,
) -> DataFrame:
    """EXACT running SUM over a total order WITHOUT a single-partition
    window — the prefix-sum sibling of ``exact_distributed_rank`` (same
    two-pass block discipline): ``block`` must be a coarse monotone
    function of the leading sort key; block-local cumulative sums run
    in parallel windows, and per-block totals (a tiny n_blocks
    relation) prefix-summed become broadcast offsets lifting local
    cumsums to the exact global running sum. Bit-identical to
    ``SUM(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`` for
    any total order (include a unique tie-break). The classic consumer
    is the +1/-1 interval-concurrency sweep, where the global running
    sum over event boundaries IS the answer and a naive window would
    funnel 100 TB of boundaries into one task.

    ``validate=True`` checks the monotone-block precondition instead of
    trusting it: per-block [min, max] of the leading order key are
    collected from the tiny n_blocks totals relation and adjacent
    blocks (by ascending ``block``) must not overlap. Costs one extra
    aggregate job at call time; requires ``order[0]`` to be a plain
    ascending column expression (the default direction here)."""
    part = list(partition)
    s = df.withColumn("_blk", block).withColumn("_v", value)
    if validate:
        probe = s.groupBy(*(part + ["_blk"])).agg(
            F.min(order[0]).alias("_lo"), F.max(order[0]).alias("_hi")
        ).collect()  # tiny by design: one row per (partition, block)
        by_part: dict[tuple, list] = {}
        for r in probe:
            by_part.setdefault(
                tuple(r[c] for c in part), []
            ).append((r["_blk"], r["_lo"], r["_hi"]))
        for blocks in by_part.values():
            blocks.sort(key=lambda t: t[0])
            for (b1, _lo1, hi1), (b2, lo2, _hi2) in zip(blocks, blocks[1:]):
                if hi1 > lo2:
                    raise ValueError(
                        "blocked_prefix_sum: block is not monotone in the"
                        f" leading order key: block {b1!r} max {hi1!r} >"
                        f" block {b2!r} min {lo2!r}"
                    )
    w_local = (
        Window.partitionBy(*(part + ["_blk"]))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = s.withColumn("_lcs", F.sum("_v").over(w_local))
    totals = s.groupBy(*(part + ["_blk"])).agg(F.sum("_v").alias("_t"))
    w_prefix = (
        (Window.partitionBy(*part) if part else Window.partitionBy())
        .orderBy(F.col("_blk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_t").over(w_prefix), F.lit(0))
    ).select(*part, "_blk", "_off")
    return (
        local.join(F.broadcast(offsets), part + ["_blk"])
        .withColumn(sum_col, F.col("_off") + F.col("_lcs"))
        .drop("_blk", "_v", "_lcs", "_off")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """SCD-1 upsert (MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT) composed Spark-first: full outer join on the key, updates win
    on conflict (COALESCE per column). Plain parquet has no transactional
    MERGE; the engine-level semantics are this relation, which a sink can
    then atomically swap in.

    Scale: one hash shuffle on the key for each side (or broadcast when
    the updates batch is small — the common CDC shape, left to AQE).
    Columns must match between target and updates.
    """
    cols = target.columns
    assert updates.columns == cols, "target/updates schemas must match"
    t, u = target.alias("t"), updates.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )


def grouped_top_k_salted(
    df: DataFrame,
    partition_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    salt: Column,
    n_salt: int = 8,
    rank_col: str = "rn",
) -> DataFrame:
    """Hot-group-safe grouped top-k: two window passes instead of one.

    ``grouped_top_k`` sorts each group's ENTIRE row set in one partition
    — correct, but a single hot group (one event_type owning half a
    100 TB fact table) becomes one task. This variant first takes top-k
    within ``n_salt`` deterministic sub-buckets of each group (each
    bucket sorts ~1/n_salt of the group, in parallel), then reduces the
    ≤ k·n_salt survivors per group with the plain window. Any global
    top-k row is necessarily top-k within its own bucket, so the result
    is row-identical to the single-window form for any total ``order``
    (callers must include a unique tie-break; ``salt`` must be a
    deterministic function of a unique column, e.g.
    ``pmod(xxhash64(id), n_salt)``, so reruns bucket identically).

    Interplay with Spark's rank-limit pushdown (WindowGroupLimit,
    SPARK-37099, observed in both passes' plans): the pushdown already
    prunes each MAP partition to k rows per group before the shuffle,
    so the plain window moves only k·n_map_partitions rows per group —
    but it still SORTS all of a hot group's survivors in one final
    task (k × 800k map partitions at 100 TB = millions of rows for one
    group). Salting interposes a parallel reduction level: the final
    window sees ≤ k·n_salt survivors per group regardless of corpus
    size. On engines without the pushdown the first pass also bounds
    the map-side sort itself.
    """
    s = df.withColumn("_salt", salt % n_salt)
    w1 = Window.partitionBy(*(list(partition_cols) + ["_salt"])).orderBy(*order)
    survivors = (
        s.withColumn("_srn", F.row_number().over(w1))
        .filter(F.col("_srn") <= k)
        .drop("_salt", "_srn")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def bloom_semijoin_reduce(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
) -> DataFrame:
    """Runtime-filter semi-join reduction: drop fact rows whose join key
    is PROVABLY absent from ``dim_keys`` before the join shuffle, using
    a Bloom filter over the dim keys — the explicit form of Spark's AQE
    runtime bloom (spark.sql.optimizer.runtime.bloomFilter.enabled),
    which only triggers on stats-qualified plans. No false negatives:
    every surviving row still goes through the exact join, so the final
    result is IDENTICAL to the unfiltered join (that identity is the
    oracle contract for bloom_prefilter_join); false positives only
    cost the pruning ratio, never correctness — which is also why the
    probe hash can be engine-NATIVE xxhash64 rather than the portable
    Lehmer family the oracled sketches use: nothing downstream depends
    on WHICH non-matching rows the filter happens to pass.

    Build: dim keys → xxhash64 → k=4 double-hashed bit positions
    (h1 = low 16 bits, odd stride from the next 15 — Kirsch-Mitzenmacher
    composition) → one ``bit_or`` aggregation into 2048 32-bit words,
    materialized ONCE into a constant array literal — the same
    driver-side-scalar shape Spark's own runtime filter produces
    (BloomFilterAggregate → scalar subquery). The words relation is
    m/32 rows by GEOMETRY (16 KiB regardless of data size), so the
    collect is scale-free. Probe: a pure scan-side Filter of shifts,
    masks, and element_at on the folded literal — ~0.3 s over 600k
    rows where the first formulation (k chained broadcast probe joins,
    then a mod-chain integer hash) measured 14 s and 3.5 s: native
    hash + bit arithmetic keeps the probe inside whole-stage codegen
    at nanoseconds per row. At 100 TB this is THE selective-star-join
    pattern: the dim predicate reaches the fact scan as a 16 KiB
    bitset, and non-matching fact rows never enter the join exchange.
    """
    from udacitydatawarehouseprj_spark.operators.dedup import (
        BLOOM_M_BITS,
        BLOOM_K,
        _BLOOM_WORD_BITS,
    )

    m = BLOOM_M_BITS
    wb = _BLOOM_WORD_BITS

    # xxhash64 is TYPE-sensitive (int 5 and bigint 5 hash differently),
    # so build and probe must hash from ONE common type or a fact int
    # key probed against a dim bigint key drops TRUE matches —
    # violating the no-false-negatives contract. Both integral → widen
    # to long; numeric/numeric mixes (double fact key vs bigint dim
    # key) → widen to double, because the string route renders '42.0'
    # != '42' and silently drops keys that ARE equal under SQL
    # numeric equality. Only a genuinely non-numeric side falls back
    # to the string form (long 42 and string "42" render identically,
    # so string/integral pairs still match on canonical values);
    # string/fractional pairs have no canonical common rendering, so
    # refuse them loudly rather than degrade to false negatives.
    _integral = ("tinyint", "smallint", "int", "bigint")
    _fractional = ("float", "double") + tuple(
        k for k in (dict(fact.dtypes)[fact_key], dict(dim_keys.dtypes)[dim_key])
        if k.startswith("decimal")
    )
    f_kind = dict(fact.dtypes)[fact_key]
    d_kind = dict(dim_keys.dtypes)[dim_key]
    _numeric = _integral + _fractional
    if f_kind in _integral and d_kind in _integral:
        common = "long"
    elif f_kind in _numeric and d_kind in _numeric:
        common = "double"
    elif f_kind in _fractional or d_kind in _fractional:
        raise ValueError(
            "bloom_semijoin_reduce: no canonical common rendering for "
            f"key types ({f_kind}, {d_kind}) — cast explicitly first"
        )
    else:
        common = "string"

    def _probe_positions(df: DataFrame, key: str, pfx: str) -> DataFrame:
        df = df.withColumn(f"{pfx}h", F.xxhash64(F.col(key).cast(common)))
        df = df.withColumn(
            f"{pfx}1", F.expr(f"CAST({pfx}h & {m - 1} AS BIGINT)")
        )
        df = df.withColumn(
            f"{pfx}2",
            F.expr(f"CAST(({pfx}h >> 16) & {m // 2 - 1} AS BIGINT) * 2 + 1"),
        )
        for j in range(BLOOM_K):
            df = df.withColumn(
                f"{pfx}p{j}",
                (F.col(f"{pfx}1") + F.lit(j) * F.col(f"{pfx}2")) % m,
            )
        return df

    d = _probe_positions(dim_keys, dim_key, "_bb")
    arms = [
        d.select(
            F.expr(f"CAST(_bbp{j} DIV {wb} AS BIGINT)").alias("word"),
            F.expr(
                f"shiftleft(1L, CAST(_bbp{j} % {wb} AS INT))"
            ).alias("mask"),
        )
        for j in range(BLOOM_K)
    ]
    union = arms[0]
    for a in arms[1:]:
        union = union.unionAll(a)
    words = union.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    bits = [0] * (m // wb)
    for row in words.collect():  # ≤ m/32 rows, constant by geometry
        bits[int(row["word"])] = int(row["bits"])
    arr = F.lit(bits)  # folds to one constant array<long> literal

    x = _probe_positions(fact, fact_key, "_bf")
    cond = None
    for j in range(BLOOM_K):
        word = F.expr(f"CAST(_bfp{j} DIV {wb} AS INT) + 1")
        msk = F.expr(f"shiftleft(1L, CAST(_bfp{j} % {wb} AS INT))")
        hit = F.element_at(arr, word).bitwiseAND(msk) == msk
        cond = hit if cond is None else (cond & hit)
    aux = ["_bfh", "_bf1", "_bf2"] + [f"_bfp{j}" for j in range(BLOOM_K)]
    return x.filter(cond).drop(*aux)


def deletion_variants(df: DataFrame, name_col: str, keep: list) -> DataFrame:
    """(keep..., sig) — the del-0/del-1 neighborhood of ``name_col``:
    the string itself plus every single-character deletion, exploded one
    variant per row. Pure Column expressions (sequence → substring
    concat), no UDF."""
    return df.select(
        *keep,
        F.explode(
            F.array_union(
                F.array(F.col(name_col)),
                F.transform(
                    F.sequence(F.lit(1), F.length(name_col)),
                    lambda i: F.concat(
                        F.substring(F.col(name_col), F.lit(1), i - 1),
                        F.col(name_col).substr(i + 1, F.length(name_col)),
                    ),
                ),
            )
        ).alias("sig"),
    )


def symdelete_candidates(
    left: DataFrame,
    l_id: str,
    l_name: str,
    right: DataFrame,
    r_id: str,
    r_name: str,
) -> DataFrame:
    """Levenshtein-≤1 candidate pairs via the symmetric-delete (SymSpell)
    index: every distance-≤1 pair shares a del-0/del-1 variant string
    (substitution at i → both del(i); insert/delete → the longer side's
    deletion equals the shorter; equality trivially), so exploding
    variants on both sides and hash-joining on the variant finds ALL
    candidates in O(rows × len) — the signature join admits a few
    distance-2 pairs (transpositions), dropped by the exact verify.

    Returns (l_id, l_name, r_id, r_name, dist) with dist ≤ 1, distinct.
    At 100 TB this replaces a |L|×|R|-per-block Levenshtein sweep with
    one hash join; measured 22.4 s → ~1 s at sf0.1 on the part catalog.
    """
    l_sigs = deletion_variants(left, l_name, [l_id, l_name])
    r_sigs = deletion_variants(right, r_name, [r_id, r_name])
    return (
        l_sigs.join(r_sigs, "sig")
        .select(l_id, l_name, r_id, r_name)
        .distinct()
        .withColumn("dist", F.levenshtein(F.col(l_name), F.col(r_name)))
        .filter(F.col("dist") <= 1)
    )

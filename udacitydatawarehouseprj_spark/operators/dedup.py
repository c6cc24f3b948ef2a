"""Deduplication operators for large-scale text corpora.

Beyond-reference operators (BASELINE.json north star): exact dedup,
word-shingle Jaccard near-dup, MinHash+LSH near-dup, and SimHash near-dup,
all over a ``documents(doc_id, text, …)`` table.

Scale design (100 TB corpus):
* exact: one hash-partitioned shuffle on the dedup key.
* shingle Jaccard (``ngram_jaccard_pairs``): exact but quadratic in the
  worst case — the shingle self-join explodes on hot shingles. Usable for
  verification at small scale; at corpus scale use MinHash+LSH.
* MinHash+LSH (``minhash_lsh_pairs``): linear-ish — per-doc signatures
  (map-side), band buckets (one shuffle), candidate verification restricted
  to same-bucket pairs. This is the scale path; banding parameters trade
  recall for cost.
* SimHash (``simhash_pairs``): 64-bit signature per doc; near-dups =
  signatures within Hamming distance k, found via band buckets. A
  SQL-portable variant (``simhash_portable_pairs``) trades xxhash64 for a
  polynomial rolling hash so the DuckDB oracle can replay it exactly.
* Prefix filtering (``ngram_jaccard_pairs_prefix``): exact sub-quadratic
  similarity join for Zipfian vocabularies.
* Decontamination (``decontaminate_overlap``): train×benchmark n-gram
  overlap — broadcast the benchmark, stream the corpus.

All Spark-built-in expressions (xxhash64, transform/slice/aggregate) — no
Python UDFs anywhere in dedup.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: word n-gram size for shingling
DEFAULT_SHINGLE = 3

# Shingle relations are cached because they feed several subplans (sizes +
# both join sides). Caching is routed through session.track_cache so the
# query registry auto-releases them at the next query boundary; callers
# that loop over corpora outside the registry call release_caches() after
# each final action.
from udacitydatawarehouseprj_spark.session import (  # noqa: E402
    release_tracked_caches as release_caches,
    track_cache as _cache,
)
#: MinHash parameters: 64 permutations → 32 bands × 2 rows. At Jaccard 0.5
#: the per-pair miss probability is (1 - 0.5²)³² ≈ 1e-4.
NUM_PERM = 64
NUM_BANDS = 32


def tokens_expr(text_col: str = "text"):
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _toks) with the text split exactly once.

    Binding the token array to a column (instead of repeating the split
    inside size/transform/slice) matters: Catalyst's CollapseProject will
    not inline a non-cheap expression used three times, so the split runs
    once per row instead of three times — measured 1.8× on the shingle
    pipeline.
    """
    from udacitydatawarehouseprj_spark.session import spread

    # a small corpus often arrives as one parquet file → one partition →
    # the explode and downstream self-joins would run serially (see
    # session.spread)
    return spread(df, (id_col,)).select(
        F.col(id_col), tokens_expr(text_col).alias("_toks")
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = DEFAULT_SHINGLE) -> DataFrame:
    """One row per (doc, distinct word n-gram shingle), as a string.

    Pure Column expression (sequence → slice → array_join). String
    shingles are the ground-truth relation (DuckDB oracles replay them
    verbatim); signature pipelines use ``hashed_shingles`` instead.
    """
    sh = F.when(
        F.size("_toks") >= n,
        F.expr(
            f"array_distinct(transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> array_join(slice(_toks, i, {n}), ' ')))"
        ),
    ).otherwise(F.array())
    return _tokenized(df, id_col, text_col).select(
        F.col(id_col), F.explode(sh).alias("shingle")
    )


def hashed_shingles(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    n: int = DEFAULT_SHINGLE) -> DataFrame:
    """One row per (doc, distinct word n-gram shingle), as an 8-byte
    xxhash64 of the token slice — no per-shingle string is ever built.

    Same (doc, shingle-set) structure as ``shingles`` up to 64-bit hash
    collisions (~|shingles|²/2⁶⁴ — negligible), so Jaccard counts computed
    over this relation equal the string-shingle counts. 3× cheaper to
    produce and joins on fixed-width longs instead of variable-length
    strings — this is the relation the MinHash/LSH and incremental-index
    paths run on at corpus scale.
    """
    sh = F.when(
        F.size("_toks") >= n,
        F.expr(
            f"array_distinct(transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> xxhash64(slice(_toks, i, {n}))))"
        ),
    ).otherwise(F.array())
    return _tokenized(df, id_col, text_col).select(
        F.col(id_col), F.explode(sh).alias("shingle")
    )


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Exact dedup: keep one deterministic winner (min ``order_col``) per
    distinct key. One hash shuffle on the key; at scale pre-hash long keys
    (xxhash64) so the shuffle key is fixed-width."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingle_pair_counts(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) for every unordered doc pair
    sharing ≥1 shingle: |A∩B| via shingle self-join plus both set sizes.

    This is the shared front half of BOTH set-overlap detectors —
    Jaccard (``jaccard_from_pair_counts``) and containment
    (``containment_from_pair_counts``) are just different final filters
    over it, so a session that runs several detectors builds the
    expensive shingle self-join once.

    The shingle relation feeds three subplans (sizes + both join sides) —
    cache it so the tokenize/shingle explode runs once, not three times."""
    sh = _cache(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def jaccard_from_pair_counts(counts: DataFrame, threshold: float) -> DataFrame:
    """Jaccard ≥ threshold pairs from a ``shingle_pair_counts`` relation
    (|A∪B| = |A|+|B|−|A∩B|) — same output contract as
    ``ngram_jaccard_pairs``."""
    return (
        counts.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_from_pair_counts(
    counts: DataFrame, threshold: float
) -> DataFrame:
    """Directed-containment pairs from a ``shingle_pair_counts`` relation
    — same output contract as ``ngram_containment_pairs``."""
    c_ab = F.col("n_inter").cast("double") / F.col("n_a").cast("double")
    c_ba = F.col("n_inter").cast("double") / F.col("n_b").cast("double")
    return counts.filter((c_ab >= threshold) | (c_ba >= threshold)).select(
        "doc_a",
        "doc_b",
        F.round(c_ab, 6).alias("containment_a_in_b"),
        F.round(c_ba, 6).alias("containment_b_in_a"),
    )


def _jaccard_from_shingles(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Pair Jaccard from a (doc, shingle) relation — the one-shot
    composition of ``shingle_pair_counts`` + ``jaccard_from_pair_counts``."""
    return jaccard_from_pair_counts(shingle_pair_counts(sh, id_col), threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-duplicate pairs (doc_a < doc_b).

    Ground truth for MinHash; quadratic on hot shingles — small/medium
    scale only (see module docstring)."""
    return _jaccard_from_shingles(shingles(df, id_col, text_col, n), id_col, threshold)


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_perm: int = NUM_PERM
) -> DataFrame:
    """Per-doc MinHash signature over a ``hashed_shingles`` relation.

    Permutation p of a shingle hash h is a seeded xorshift64 step
    (h XOR C_p, then three xor-shifts) — an invertible 64-bit mixer, so
    each permutation is a bijection of the already-xxhash64-uniform
    shingle space. This replaces num_perm independent string hashes with
    ONE string hash (inside ``hashed_shingles``) plus 4 integer ops per
    permutation — measured 3.6× on the signature build — and stays
    overflow-free under ANSI mode (xor/shift only, no multiply).

    One aggregation — num_perm mins computed map-side-partial in a single
    pass (no per-permutation shuffles).
    """
    mins = [
        F.min(F.col("shingle").bitwiseXOR(F.lit(_XOR_PERM[p]))).alias(f"h{p}")
        for p in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*mins)


def _splitmix64(seed: int) -> list[int]:
    """Deterministic full-64-bit xor constants (splitmix64 stream), as
    signed longs. Computed plan-side in Python so the per-permutation
    Spark expression stays a single XOR — a 64-min aggregate built from
    multi-step mixing chains octuples each expression subtree and was
    measured to cost ~6 s of whole-stage-codegen JIT compile on first
    execution. Full-width constants matter: constants that differ only in
    low bits would leave the argmin (driven by high bits) identical
    across permutations."""
    out, x = [], seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(256):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 31
        out.append(z - (1 << 64) if z >= 1 << 63 else z)
    return out


#: xor-permutation constants: h_p(s) = s XOR r_p over the xxhash64-uniform
#: shingle space — the standard cheap minhash permutation family; the
#: LSH recall this yields is validated by the exact-Jaccard oracle gate.
_XOR_PERM = _splitmix64(0x5EED_0F_5EED)


def band_hashes(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """(doc, band_id, band_hash) from a MinHash signature relation: each
    band's rows are hashed together so one equal band ⇒ LSH candidate.
    Shared by the self-join path (``minhash_lsh_pairs``) and the
    incremental index (``build_dedup_index``) so both sides of an
    incremental join derive identical band hashes."""
    rows_per_band = num_perm // num_bands
    band_cols = [
        F.xxhash64(
            F.lit(band),
            *[F.col(f"h{band * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"b{band}")
        for band in range(num_bands)
    ]
    return sig.select(
        F.col(id_col),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(b) for b in range(num_bands)]),
                F.array(*band_cols),
            )
        ).alias("band_id", "band_hash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    signatures → band hashes → bucket join (candidates) → exact-Jaccard
    verification of candidates only. Output equals ``ngram_jaccard_pairs``
    up to LSH recall (see NUM_PERM note); verification removes all false
    positives, so precision is exact.
    """
    # cached: feeds the signature build plus three verification subplans.
    # Hashed shingles throughout — signatures mix the hash, and the
    # exact-Jaccard verification counts are identical to string shingles
    # (see hashed_shingles collision note) while joining on longs.
    sh = _cache(hashed_shingles(df, id_col, text_col, n))
    sig = minhash_signatures(sh, id_col, num_perm)
    bands = band_hashes(sig, id_col, num_perm, num_bands)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    return _verify_candidate_pairs(sh, candidates, id_col, threshold)


def _verify_candidate_pairs(
    sh: DataFrame, candidates: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs:
    count shingle intersections for candidates only, filter on the true
    Jaccard. No forced broadcast — AQE broadcasts the candidate side when
    it is small (the well-tuned-LSH case) and falls back to a shuffle join
    when a pathological corpus (tiny vocabulary → huge candidate sets)
    makes broadcasting the wrong move."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
    max_candidate_ratio: float | None = 64.0,
) -> DataFrame:
    """EXACT near-dup pairs via prefix filtering (AllPairs/PPJoin family).

    Identical output to ``ngram_jaccard_pairs``, sub-quadratic candidates:
    order each doc's shingles by global rarity (rarest first); two docs
    with Jaccard ≥ t MUST share a shingle within each other's first
    ``|X| − ⌈t·|X|⌉ + 1`` shingles under any global total order, so the
    candidate join only indexes those prefixes. Ordering by rarity puts
    hot shingles at the END of every prefix ordering — the hot-shingle
    quadratic blowup of the naive join largely disappears.

    Cost: one extra shingle-frequency aggregation + a window rank; the
    candidate join shrinks by ~(1−t)² with rare-first skew on top.

    Circuit breaker: on a tiny-vocabulary corpus every prefix shares the
    same few shingles and the candidate join degenerates (measured 7.5×
    WORSE than the naive join on an adversarial 10× corpus — SCALE.md).
    Before running the join we bound its size exactly from per-shingle
    prefix frequencies (Σ c·(c−1)/2 — one linear aggregation, no join);
    if that exceeds ``max_candidate_ratio × |corpus|`` the prefixes are
    not discriminating and we fall back to the naive shingle join, which
    is the cheaper plan precisely in that regime. ``None`` disables the
    guard (keeps the plan fully lazy / action-free).
    """
    # hashed shingles: prefix filtering is correct under ANY global total
    # order of the shingle domain, and the output Jaccard values are
    # hash-scheme-independent — so the fixed-width relation is safe here
    sh = _cache(hashed_shingles(df, id_col, text_col, n))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_freq"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "_rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("df_freq").asc(), F.col("shingle").asc()
                )
            ),
        )
        .withColumn("_n", F.count("*").over(Window.partitionBy(id_col)))
    )
    prefix = ranked.filter(
        F.col("_rank") <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    ).select(id_col, "shingle")
    if max_candidate_ratio is not None:
        prefix = _cache(prefix)
        est_row = (
            prefix.groupBy("shingle")
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum(
                    F.col("c") * (F.col("c") - 1) / F.lit(2.0)
                ).alias("est_pairs")
            )
            .collect()[0]
        )
        est_pairs = float(est_row["est_pairs"] or 0.0)
        n_docs = sh.select(id_col).distinct().count()
        if est_pairs > max_candidate_ratio * max(n_docs, 1):
            return _jaccard_from_shingles(sh, id_col, threshold)
    a = prefix.alias("a")
    b = prefix.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    return _verify_candidate_pairs(sh, candidates, id_col, threshold)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document from token hashes.

    For bit b: sum +1/-1 over tokens according to bit b of xxhash64(token);
    signature bit b = 1 iff the sum is positive. One groupBy with 64
    conditional sums (map-side partials), then a bit-pack expression.
    """
    from udacitydatawarehouseprj_spark.session import spread

    toks = spread(df, (id_col,)).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s{b}")
        for b in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    packed = functools.reduce(
        operator.add,
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63
                   else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ],
    )
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Bucket on 4 × 16-bit bands (pigeonhole: any pair within distance 3
    agrees on ≥1 band), join within buckets, verify exact Hamming distance
    via bit_count(xor). Linear-ish; the band join is the only shuffle.

    ``signatures`` lets callers that also consume the signature relation
    (e.g. the band-completeness invariant) compute it once and share it.
    """
    sig = (
        signatures
        if signatures is not None
        else simhash_signatures(df, id_col, text_col)
    )
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_id", "band.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- SQL-portable SimHash (cross-engine checkable) ---------------------
#
# The xxhash64-based simhash above is the engine-native production path
# but cannot be reproduced in a SQL oracle. This variant derives a 32-bit
# signature from a polynomial rolling hash over token characters — pure
# integer arithmetic, bit-identical in any engine:
#   h(token) = fold_{c in chars}( (acc*31 + code(c)) mod P ), acc0=0
#   sig bit b = 1  iff  sum_{tokens} (2*((h>>b)&1) - 1) > 0,  b in 0..31

# prime < 2^50 so acc*31 stays < 2^55 — no int64 overflow in EITHER engine
# (DuckDB and non-ANSI Spark would wrap differently on overflow)
PORTABLE_HASH_MOD = 999_999_999_999_989
PORTABLE_SIM_BITS = 32


def _portable_token_hash_expr(tok_col: str) -> F.Column:
    return F.expr(
        f"aggregate(sequence(1, length({tok_col})), 0L,"
        f" (acc, i) -> (acc * 31 + CAST(ascii(substring({tok_col}, i, 1)) AS BIGINT))"
        f" % {PORTABLE_HASH_MOD})"
    )


def simhash_portable_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    from udacitydatawarehouseprj_spark.session import spread

    toks = spread(df, (id_col,)).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", _portable_token_hash_expr("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{b}")
        for b in range(PORTABLE_SIM_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    packed = functools.reduce(
        operator.add,
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for b in range(PORTABLE_SIM_BITS)
        ],
    )
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_portable_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs on the portable 32-bit simhash, Hamming ≤ k, found
    via 4×8-bit pigeonhole bands (any pair within distance 3 agrees on ≥1
    band). Same algorithmic shape as simhash_pairs; every step is
    SQL-portable, so the DuckDB oracle replays it exactly."""
    sig = simhash_portable_signatures(df, id_col, text_col)
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("simhash"), i * 8)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_id", "band.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def decontaminate_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    min_overlap: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    ``min_overlap`` distinct word n-grams with any eval/benchmark document
    (the n-gram-overlap contamination check used by LLM training
    pipelines; word-3-grams here, 13-grams in the usual report recipe —
    one constant).

    Shape: eval shingles are tiny (the benchmark) → broadcast; the train
    side streams. One aggregation, no self-join — linear in the corpus.
    Returns (train_id, eval_id, n_overlap) pairs above the threshold.
    """
    tr = shingles(train, id_col, text_col, n).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    ev = shingles(eval_set, id_col, text_col, n).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair relation:
    (node, cluster_id) where cluster_id = min node id reachable through
    the pair graph. This is the step that turns PAIR output into
    CLUSTER-level dedup (keep one doc per duplicate cluster, not per
    pair — transitive duplicates A~B~C collapse together even when A~C
    was never emitted).

    Algorithm: min-label propagation with POINTER DOUBLING — each round
    every node takes min(own label, neighbors' labels, label-of-label).
    The label-of-label jump halves the remaining distance to the
    component minimum every round, so convergence is O(log diameter)
    rounds, not O(diameter) — the difference between 6 and 60 shuffles
    on a long duplicate chain. Each round is two joins + one
    aggregation, all JVM; the iterative driver loop is the shape SQL
    can't express (the oracle replays it as a recursive CTE).

    Lineage is truncated every round with ``localCheckpoint`` —
    without it each round's plan nests the previous one and the
    analyzer stack-overflows by ~10 rounds (observed). On a real
    cluster prefer reliable ``checkpoint`` (HDFS-backed) so executor
    loss can't sever the truncated lineage; local mode has no such
    failure domain.
    """
    # The pair relation is usually an expensive pipeline (LSH + exact
    # verification); cache it BEFORE the symmetrization union, which
    # otherwise evaluates the full pipeline twice (once per union arm).
    pairs = _cache(pairs.select(a_col, b_col))
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.union(rev).distinct().cache()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        # pointer doubling: my label's current label (labels is total on
        # nodes and label ≤ node, so the inner join always hits)
        jump = labels.select(
            F.col("node").alias("_via"), F.col("label").alias("jmin")
        )
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .join(jump, labels["label"] == jump["_via"], "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nmin"), F.col("label")),
                    F.coalesce(F.col("jmin"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("label") != F.col("_old")).limit(1).count()
        labels = stepped.drop("_old")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def build_dedup_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Persistent dedup index for a corpus: one row per (doc, band_id,
    band_hash) carrying the doc's exact-text hash.

    This is the artifact that makes dedup INCREMENTAL at 100 TB: the
    corpus is shingled/signed ONCE, the index (tiny relative to text —
    num_bands longs + one hash per doc) is persisted (ideally bucketed
    by band_hash), and every new crawl batch joins against it without
    touching corpus text again. Corpus text is only fetched afterwards,
    by id, for the candidate pairs that survive banding.
    """
    sh = hashed_shingles(corpus, id_col, text_col, n)
    sig = minhash_signatures(sh, id_col, num_perm)
    bands = band_hashes(sig, id_col, num_perm, num_bands)
    th = corpus.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("text_hash")
    )
    return bands.join(th, id_col)


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
    _with_index: bool = False,
):
    """Survivors of ``batch`` after dedup against an indexed corpus and
    within the batch itself.

    A batch doc is KILLED iff any of:
      1. exact text match with a corpus doc (index text_hash candidates,
         confirmed on real text fetched by id — hash collisions can't
         produce a false kill);
      2. verified near-dup (exact Jaccard ≥ threshold on LSH band
         candidates) with a corpus doc;
      3. exact or verified-near duplicate of a SMALLER-id batch doc
         (deterministic canonical keeper), regardless of that partner's
         own fate.

    Scale shape: the corpus side contributes only its (small) index to
    the band join plus id-targeted text fetches for candidates; the
    batch side (daily crawl ≪ corpus) is fully processed but never
    self-joined against the corpus text. LSH recall caveats are the
    same as ``minhash_lsh_pairs`` (per-pair miss ~1e-4 at j=0.5).
    """
    # the index is a persisted artifact in production (built once, read
    # from storage); here it arrives as a plan, and it feeds BOTH the
    # exact-hash join and the band join — cache it so the corpus
    # shingle/signature pipeline runs once, not once per consumer
    index = _cache(index)
    batch_sh = _cache(hashed_shingles(batch, id_col, text_col, n))
    batch_sig = minhash_signatures(batch_sh, id_col, num_perm)
    # bands feed the corpus band join, BOTH sides of the within-batch
    # band self-join, and (in the _with_index variant) the survivor
    # index rows — cache or the signature aggregate runs per consumer
    batch_bands = _cache(band_hashes(batch_sig, id_col, num_perm, num_bands))
    batch_th = batch.select(
        F.col(id_col).alias("b_id"),
        F.xxhash64(F.col(text_col)).alias("b_text_hash"),
        F.col(text_col).alias("b_text"),
    )

    # --- rule 1: exact-vs-corpus (hash candidates, text-confirmed) ----
    exact_cand = (
        batch_th.join(
            index.select(
                F.col(id_col).alias("c_id"), F.col("text_hash")
            ).distinct(),
            F.col("b_text_hash") == F.col("text_hash"),
        )
        .select("b_id", "c_id", "b_text")
    )
    corpus_text = corpus.select(
        F.col(id_col).alias("c_id"), F.col(text_col).alias("c_text")
    )
    exact_kill = (
        exact_cand.join(corpus_text, "c_id")
        .filter(F.col("b_text") == F.col("c_text"))
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )

    # --- rule 2: near-vs-corpus (band join against the index) ---------
    near_cand = (
        batch_bands.alias("nb")
        .join(
            index.alias("ix"),
            (F.col("nb.band_id") == F.col("ix.band_id"))
            & (F.col("nb.band_hash") == F.col("ix.band_hash")),
        )
        .select(
            F.col(f"nb.{id_col}").alias("doc_a"),
            F.col(f"ix.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    # candidate pairs feed the corpus-text semi-join AND the verification
    # join; cached so the band join runs once (tiny: surviving pairs only)
    near_cand = _cache(near_cand)
    # verification needs shingles for BOTH sides; corpus shingles are
    # rebuilt only for candidate docs (id-targeted semi-join + shingle)
    cand_corpus_docs = corpus.join(
        near_cand.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    # the union feeds three verification subplans (sizes + both join
    # sides) — cache it or the candidate-doc shingling runs three times
    both_sh = _cache(
        batch_sh.union(hashed_shingles(cand_corpus_docs, id_col, text_col, n))
    )
    near_kill = (
        _verify_candidate_pairs(both_sh, near_cand, id_col, threshold)
        .select(F.col("doc_a").alias(id_col))
        .distinct()
    )

    # --- rule 3: within-batch (exact + verified-near, min-id keeper) --
    batch_exact_pairs = (
        batch_th.alias("x")
        .join(
            batch_th.alias("y"),
            (F.col("x.b_text_hash") == F.col("y.b_text_hash"))
            & (F.col("x.b_id") < F.col("y.b_id")),
        )
        .filter(F.col("x.b_text") == F.col("y.b_text"))
        .select(F.col("y.b_id").alias(id_col))
    )
    bb = batch_bands.alias("p")
    batch_near_cand = (
        bb.join(
            batch_bands.alias("q"),
            (F.col("p.band_id") == F.col("q.band_id"))
            & (F.col("p.band_hash") == F.col("q.band_hash"))
            & (F.col(f"p.{id_col}") < F.col(f"q.{id_col}")),
        )
        .select(
            F.col(f"p.{id_col}").alias("doc_a"),
            F.col(f"q.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    batch_near_kill = (
        _verify_candidate_pairs(batch_sh, batch_near_cand, id_col, threshold)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )

    kills = (
        exact_kill.union(near_kill)
        .union(batch_exact_pairs)
        .union(batch_near_kill)
        .distinct()
    )
    survivors = batch.select(id_col).join(kills, id_col, "left_anti")
    if not _with_index:
        return survivors
    # Survivor index rows (the ingest loop's persistent-index append)
    # derived from the ALREADY-CACHED batch bands + text hashes — without
    # this, callers re-run the whole shingle→signature→band pipeline on
    # survivors just to index them (measured: doubles per-batch cost in
    # the streaming ingest loop).
    survivors = _cache(survivors)
    surv_index = batch_bands.join(survivors, id_col, "left_semi").join(
        batch_th.select(
            F.col("b_id").alias(id_col), F.col("b_text_hash").alias("text_hash")
        ),
        id_col,
    )
    return survivors, surv_index


def incremental_dedup_with_index(
    batch: DataFrame,
    corpus: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    num_bands: int = NUM_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """``incremental_dedup`` plus the survivors' index rows
    ``(id, band_id, band_hash, text_hash)`` for appending to the
    persistent corpus index — computed from the batch's cached
    bands/hashes, not by re-signing the survivors. This is the call the
    streaming ingest loop makes once per micro-batch."""
    return incremental_dedup(
        batch,
        corpus,
        index,
        id_col,
        text_col,
        n,
        threshold,
        num_perm,
        num_bands,
        _with_index=True,
    )


# --- Portable Bloom-filter decontamination -----------------------------
#
# The 100 TB path for benchmark decontamination: instead of joining train
# shingles against the eval shingle SET (decontaminate_overlap — right at
# small eval sizes, but the eval relation is reshuffled per run), compress
# the eval set into an m-bit Bloom filter ONCE and probe it with a
# broadcast join against a 2048-row bit-word relation. The filter is built
# from the PORTABLE polynomial shingle hash with double hashing
# (pos_j = (h1 + j·h2) mod m), all exact integer arithmetic — so unlike
# engine-native sketches the whole pipeline replays bit-for-bit in a SQL
# oracle: no false negatives BY CONSTRUCTION, and even the false
# positives are deterministic and cross-engine identical.
BLOOM_M_BITS = 65_536       # m: filter size (2^16 bits = 2048 32-bit words)
BLOOM_K = 4                 # k: probes per item
_BLOOM_WORD_BITS = 32       # 32-bit words keep every mask < 2^63 (signed-safe)


def _bloom_probe_cols(h: F.Column) -> list[tuple[F.Column, F.Column]]:
    """(word_idx, mask) for each of the k probe positions of hash ``h``."""
    m = BLOOM_M_BITS
    h1 = h % m
    # floor division written as subtract-remainder-then-divide: m is a
    # power of two, so the double division is a pure exponent shift —
    # bit-exact for any h < 2^53 (portable hash < 2^50)
    h_div_m = ((h - h1) / m).cast("long")
    h2 = (h_div_m % (m // 2)) * 2 + 1  # odd stride → k distinct positions
    out = []
    for j in range(BLOOM_K):
        pos = (h1 + F.lit(j) * h2) % m
        word = ((pos - pos % _BLOOM_WORD_BITS) / _BLOOM_WORD_BITS).cast("long")
        # shiftleft() takes only literal bit counts; 2^n via pow is exact
        # in double for n ≤ 31 (32-bit words are chosen for exactly this)
        mask = F.pow(F.lit(2.0), (pos % _BLOOM_WORD_BITS).cast("int")).cast("long")
        out.append((word, mask))
    return out


def decontaminate_bloom(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    min_overlap: int = 5,
) -> DataFrame:
    """Train docs whose distinct shingles hit the eval Bloom filter ≥
    ``min_overlap`` times: (train_id, n_flagged).

    Build: eval shingles → portable hash → k (word, mask) rows → one
    ``bit_or`` aggregation into ≤2048 words. Probe: distinct train
    (doc, hash) → k probe rows → broadcast join on word → a shingle is
    flagged iff ALL k probes find their bit set. Flagged counts ≥
    Jaccard-true overlaps always (no false negatives); false positives
    are the documented Bloom trade and deterministic here.
    """
    from pyspark.sql import functions as _F

    def hashed(df: DataFrame) -> DataFrame:
        # cached: the k probe arms below union k copies of this relation,
        # which would otherwise re-run the shingle explode + per-char
        # polynomial hash fold once per arm (measured ~2× on the train
        # side at sf0.1)
        sh = shingles(df, id_col, text_col, n)
        return _cache(
            sh.select(
                _F.col(id_col), _portable_token_hash_expr("shingle").alias("h")
            )
        )

    ev = hashed(evals)
    eval_probes = [
        ev.select(w.alias("word"), mk.alias("mask"))
        for w, mk in _bloom_probe_cols(_F.col("h"))
    ]
    all_probes = eval_probes[0]
    for p in eval_probes[1:]:
        all_probes = all_probes.unionByName(p)
    bloom = all_probes.groupBy("word").agg(
        _F.expr("bit_or(mask)").alias("bits")
    )

    tr = hashed(train).distinct()
    probe_parts = [
        tr.select(
            _F.col(id_col), _F.col("h"), w.alias("word"), mk.alias("mask")
        )
        for w, mk in _bloom_probe_cols(_F.col("h"))
    ]
    probes = probe_parts[0]
    for p in probe_parts[1:]:
        probes = probes.unionByName(p)
    hits = (
        probes.join(_F.broadcast(bloom), "word")
        .filter(_F.col("bits").bitwiseAND(_F.col("mask")) != 0)
        .groupBy(id_col, "h")
        .agg(_F.count("*").alias("_k_hit"))
        .filter(_F.col("_k_hit") == BLOOM_K)
    )
    return (
        hits.groupBy(id_col)
        .agg(_F.count("*").alias("n_flagged"))
        .filter(_F.col("n_flagged") >= min_overlap)
        .select(_F.col(id_col).alias("train_id"), "n_flagged")
    )


def delete_from_index(
    index: DataFrame, deletes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Right-to-be-forgotten maintenance for a persisted dedup index:
    drop every (band/text-hash) row belonging to a deleted document.
    One broadcast anti-join — the delete list is always small relative
    to a 100 TB index. The gold-standard correctness contract (checked
    by ``delete_propagate_index``): the result must EQUAL the index
    rebuilt from scratch on the surviving corpus."""
    return index.join(
        F.broadcast(deletes.select(id_col)), id_col, "left_anti"
    )


def duplicated_tile_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tile_len: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Exact-substring duplication accounting (the distributed variant of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": find byte ranges whose content recurs verbatim anywhere in
    the corpus, the suffix-array ExactSubstr recipe re-expressed as
    relational algebra).

    Tile anchoring replaces the suffix array: every document is covered
    by ``tile_len``-char windows at ``stride`` offsets (stride <
    tile_len ⇒ overlapping, so any verbatim repeat of length ≥
    tile_len + stride - 1 is guaranteed to contain at least one aligned
    tile occurring ≥ 2× corpus-wide). A tile whose content occurs ≥ 2
    times ANYWHERE (other docs or self-repetition — both count, as in
    the paper) marks its range duplicated; overlapping marked ranges are
    merged per document with the classic prev-max-end island scan, and
    the per-doc duplicated-char total and fraction come out of the
    merged spans.

    Scale shape (100 TB): the tile relation is one generate-per-row map
    (no text carried past the projection); duplicate detection is ONE
    hash aggregation on the tile content with map-side partial counts
    (a boilerplate tile repeated in millions of docs combines before the
    shuffle); the island merge windows on ``id_col`` — per-document
    cardinality, never a hot key. Returns one row per input document
    (zero-duplication docs included, dup_frac = 0).
    """
    spans_src = df.select(
        F.col(id_col),
        F.length(text_col).alias("_n"),
        F.when(
            F.length(text_col) >= tile_len,
            F.expr(
                f"transform(sequence(1, length({text_col}) - {tile_len - 1},"
                f" {stride}), i -> struct(i AS p,"
                f" substring({text_col}, i, {tile_len}) AS tile))"
            ),
        ).otherwise(F.array()).alias("_tiles"),
    )
    tiles = _cache(
        spans_src.select(
            F.col(id_col), F.explode("_tiles").alias("t")
        ).select(F.col(id_col), F.col("t.p").alias("p"), F.col("t.tile").alias("tile"))
    )
    dup = (
        tiles.groupBy("tile")
        .agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= 2)
        .select("tile")
    )
    hits = tiles.join(dup, "tile").select(F.col(id_col), "p")

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        hits.withColumn("_prev_end", F.max(F.col("p") + tile_len).over(w_prev))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_end").isNull() | (F.col("p") > F.col("_prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w_cum))
    )
    spans = islands.groupBy(id_col, "_island").agg(
        F.min("p").alias("_s"), (F.max("p") + tile_len).alias("_e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("_e") - F.col("_s")).alias("dup_chars"),
    )
    return (
        df.select(F.col(id_col), F.length(text_col).alias("_n"))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0)).cast("double") / F.col("_n"), 6
            ).alias("dup_frac"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
) -> DataFrame:
    """ASYMMETRIC near-duplication by shingle containment:
    C(A⊂B) = |A∩B| / |A| — the template/boilerplate relation Jaccard
    misses. A 50-shingle licence block fully embedded in a 5000-shingle
    page has C = 1.0 but Jaccard ≈ 0.01: containment is the measure
    RefinedWeb/C4-style template removal and train-test contamination
    audits actually need (a test document CONTAINED in a training page
    is contamination regardless of the page's extra bulk).

    Emits each unordered pair (doc_a < doc_b) whose larger directed
    containment clears ``threshold``, with BOTH directions reported.
    Same plan shape and cost as ``ngram_jaccard_pairs`` (shingle
    self-join, cached three-consumer relation); the MinHash/LSH
    candidate route composes identically at 100 TB — banding recalls by
    Jaccard, so for small-in-large containment pairs the production
    path lowers the LSH threshold and verifies containment exactly on
    candidates.
    """
    return containment_from_pair_counts(
        shingle_pair_counts(shingles(df, id_col, text_col, n), id_col),
        threshold,
    )


def containment_on_candidates(
    df: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle containment verified ONLY on a candidate pair
    relation ``cand`` (columns doc_a < doc_b) — the production
    composition ``ngram_containment_pairs``'s docstring promises at
    100 TB, made executable: an LSH banding (or any other blocker)
    proposes candidates, and containment is computed exactly per
    candidate from the two docs' shingle SETS.

    Why this beats a df-cap on the shingle self-join: the self-join's
    cost is Σ df² over shingles. In a Zipf-tailed real corpus a df-cap
    prunes that sum cheaply; in a closed-vocabulary corpus (measured
    round 10 on the synthetic documents table: 27k shingles at sf0.1,
    median df 9, max 25 — and the sf10 tier's 20 rotation-replicas
    multiply EVERY df by ~20) the bulk, not the tail, carries the
    quadratic term, so any cap either does nothing or voids the
    detector. Verifying on candidates makes the cost
    |cand| × shingles-per-doc instead — nothing scales with df at all.

    Plan shape: one shingle pass folded to per-doc arrays (collect_set
    after the distinct-shingle explode), two hash joins of the pair
    list against those arrays, intersection sizes via array_intersect
    — all JVM Column expressions, candidate-bounded end to end.
    """
    sets_ = (
        shingles(df, id_col, text_col, n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    a = sets_.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    c_ab = inter / F.size("sh_a").cast("double")
    c_ba = inter / F.size("sh_b").cast("double")
    return (
        cand.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .filter((c_ab >= threshold) | (c_ba >= threshold))
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 6).alias("containment_a_in_b"),
            F.round(c_ba, 6).alias("containment_b_in_a"),
        )
    )

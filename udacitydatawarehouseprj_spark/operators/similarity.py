"""Similarity search over embedding columns (``array<float>``).

Beyond-reference operators (BASELINE.json north star): brute-force cosine
top-k as the exact baseline, plus two sub-linear scale paths — random
hyperplane LSH buckets and IVF (coarse-quantizer) probing.

Numeric determinism: dot products are computed as a LEFT FOLD over element
products in index order (``F.aggregate`` over ``zip_with``), which the
DuckDB oracle mirrors with ``list_reduce`` — identical IEEE operation
order → bit-identical doubles, so results hash-match without tolerance.

Scale design (billions of vectors):
* brute force: corpus-partition-parallel; queries broadcast; per-partition
  top-k would bound the shuffle (the window rank here is exact and fine for
  thousands of queries — swap the final rank for a two-phase
  partial-top-k + merge when |Q|×k exceeds driver comfort).
* LSH: one signature expression per vector (map-side), bucket join.
* IVF: centroid assignment (broadcast centroids), probe nearest cells only.

All built-in expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic FP order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _pairs_with_cosine(corpus: DataFrame, queries: DataFrame,
                       id_col: str, vec_col: str) -> DataFrame:
    """(query, candidate, cosine) via broadcast cross join."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("c_emb")
    ).withColumn("c_norm", norm(F.col("c_emb")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("q_emb")
    ).withColumn("q_norm", norm(F.col("q_emb")))
    return (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot(F.col("c_emb"), F.col("q_emb"))
            / (F.col("c_norm") * F.col("q_norm")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query (the ANN baseline).

    Deterministic: rank orders by (cosine desc, neighbor_id) — ties cannot
    flip the output."""
    pairs = _pairs_with_cosine(corpus, queries, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    Brute force (exact); the LSH variant below is the corpus-scale path.
    """
    e = df.select(F.col(id_col).alias("id"), as_double(vec_col).alias("emb"))
    e = e.withColumn("nrm", norm(F.col("emb")))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane p is a
    hash-derived value in [-0.5, 0.5). No RNG state — reproducible across
    runs and engines."""
    comps = [
        (
            F.pmod(F.xxhash64(F.lit(plane), F.lit(j)), F.lit(100000)).cast("double")
            / F.lit(100000.0)
            - F.lit(0.5)
        )
        for j in range(dim)
    ]
    return F.array(*comps)


def lsh_bucket_expr(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · plane_p). A pure
    column expression — computed map-side, no shuffle."""
    bits = []
    for p in range(num_planes):
        s = dot(vec, _hyperplane(dim, p))
        bits.append(F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to vectors sharing
    the query's hyperplane-sign bucket, then exact rerank within bucket.

    Recall < 1 by construction (that is the price of sub-linearity);
    multi-probe (flipping low-margin bits) raises recall — left as the
    documented extension. Bucket join replaces the cross join: at corpus
    scale this is the difference between |Q|·|C| and |Q|·|C|/2^planes.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("c_emb")
    ).withColumn("bucket", lsh_bucket_expr(F.col("c_emb"), dim, num_planes))
    c = c.withColumn("c_norm", norm(F.col("c_emb")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("q_emb")
    ).withColumn("bucket", lsh_bucket_expr(F.col("q_emb"), dim, num_planes))
    q = q.withColumn("q_norm", norm(F.col("q_emb")))
    pairs = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot(F.col("c_emb"), F.col("q_emb"))
            / (F.col("c_norm") * F.col("q_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: deterministic coarse centroids (every
    (|C|/num_cells)-th vector by id — a real system would k-means), assign
    each corpus vector to its nearest centroid, probe the ``n_probe``
    nearest cells per query, exact rerank within probed cells."""
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(num_cells)
        .select(
            F.col(id_col).alias("cell_id"), as_double(vec_col).alias("cent")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("c_emb"))
    c = c.withColumn("c_norm", norm(F.col("c_emb")))
    # nearest centroid per corpus vector
    assign = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("sim", dot(F.col("c_emb"), F.col("cent")))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("neighbor_id").orderBy(
                    F.col("sim").desc(), F.col("cell_id")
                )
            ),
        )
        .filter(F.col("_r") == 1)
        .select("neighbor_id", "c_emb", "c_norm", "cell_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("q_emb"))
    q = q.withColumn("q_norm", norm(F.col("q_emb")))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim", dot(F.col("q_emb"), F.col("cent")))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cell_id")
                )
            ),
        )
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "q_emb", "q_norm", "cell_id")
    )
    pairs = (
        assign.join(F.broadcast(probes), ["cell_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot(F.col("c_emb"), F.col("q_emb")) / (F.col("c_norm") * F.col("q_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )

"""Round-11 wave: batch ANN serving economics (VERDICT r10 item 5).

Both queries are oracle-checked (tests/test_oracle_parity.py replays the
DuckDB comparison); these tests pin the SEMANTIC claims their docstrings
make — kernel equivalence and the amortization invariants a hash gate
can't see.
"""
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark import session as S
from udacitydatawarehouseprj_spark.operators import similarity


def _emb(spark, sf_dir):
    return S.load_table(spark, sf_dir, "embeddings")


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "query_id", "neighbor_id", "rank", "cosine"
        ).collect()
    )


def test_blas_batch_matches_fold_exact_topk(spark, sf_dir):
    """The large-batch brute kernel must be EXACTLY the brute baseline:
    same rows as cosine_topk (the fold-exact oracled path) for the same
    batch — the vectorized partial top-(k+1) + self-filter loses
    nothing."""
    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 101 == 7)
    got = _rows(similarity.cosine_topk_blas_batch(emb, batch, k=5))
    want = _rows(similarity.cosine_topk(emb, batch, k=5))
    assert got == want and len(got) == 5 * batch.count()


def test_blas_batch_chunking_is_invisible(spark, sf_dir):
    """query_chunk bounds task memory only — a chunk smaller than the
    batch must not change a single row."""
    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 101 == 7)
    chunked = _rows(
        similarity.cosine_topk_blas_batch(emb, batch, k=5, query_chunk=2)
    )
    whole = _rows(similarity.cosine_topk_blas_batch(emb, batch, k=5))
    assert chunked == whole


def test_ivf_batch_serving_summary_invariants(spark, sf_dir):
    """The one-row summary: full k per query (topk_rows = 5·n_queries),
    batch = the %101 rule, and every economics boolean genuinely
    computed (all true at the recall-pinned 16/4 operating point)."""
    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 101 == 7)
    row = Q.REGISTRY["ann_batch_serving_ivf"].fn(spark, sf_dir).collect()[0]
    assert row.n_queries == batch.count()
    assert row.corpus_n == emb.count()
    assert row.topk_rows == 5 * row.n_queries
    assert row.mean_frac_le_045 and row.scan_lt_brute
    assert row.min_candidates_ge_k


def test_ivf_batch_serving_matches_loop_kernel(spark, sf_dir):
    """The cell-grouped vectorized rerank must reach the SAME top-k
    relation as ivf_topk_kmeans's per-query loop at the identical
    operating point (same seeds, same probes) — vectorization is a
    layout change, not a semantics change. Round-11 advice: pin the
    actual (query_id, neighbor_id, rank, cosine) ROWS, not the count —
    a pairing/sign bug returning wrong neighbors at full k would pass a
    count gate. The serving relation is exposed for exactly this
    (ivf_batch_serving_topk shares the kernel with the oracled summary
    via _ivf_batch_serve)."""
    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 101 == 7)
    got = _rows(similarity.ivf_batch_serving_topk(
        emb, batch, k=5, num_cells=16, n_probe=4, iters=3
    ))
    want = _rows(similarity.ivf_topk_kmeans(
        emb, batch, k=5, num_cells=16, n_probe=4, iters=3
    ))
    assert got == want and len(got) == 5 * batch.count()
    # and the oracled summary counts the same relation
    row = Q.REGISTRY["ann_batch_serving_ivf"].fn(spark, sf_dir).collect()[0]
    assert row.topk_rows == len(got)

"""Round-8 wave: ADVICE guard fixes + new operators."""
import pytest
from pyspark.sql import Row, functions as F

from udacitydatawarehouseprj_spark import queries as Q


def test_ppr_empty_seeds_raises(spark):
    from udacitydatawarehouseprj_spark.operators import graph as G

    nodes = spark.createDataFrame([Row(id=1), Row(id=2)])
    edges = spark.createDataFrame([Row(a=1, b=2)])
    empty_seeds = nodes.where(F.lit(False))
    with pytest.raises(ValueError, match="seeds must be non-empty"):
        G.personalized_pagerank_integer(nodes, edges, empty_seeds)


def test_symbol_expr_empty_defs_raises():
    from udacitydatawarehouseprj_spark.operators import sequence as seq

    with pytest.raises(ValueError, match="at least one DEFINE symbol"):
        seq.symbol_expr([], {})


def test_blocked_prefix_sum_validate(spark):
    from udacitydatawarehouseprj_spark.operators import relational as rel

    df = spark.createDataFrame(
        [Row(k=i, v=1) for i in range(20)]
    )
    # good block: monotone in k -> validation passes, result exact
    good = rel.blocked_prefix_sum(
        df, (F.col("k") / 5).cast("long"), [F.col("k")],
        F.col("v"), validate=True,
    )
    assert {r.k: r.run_sum for r in good.collect()} == {
        i: i + 1 for i in range(20)
    }
    # bad block: k % 3 is NOT monotone in k -> overlapping key ranges
    with pytest.raises(ValueError, match="not monotone"):
        rel.blocked_prefix_sum(
            df, F.col("k") % 3, [F.col("k")],
            F.col("v"), validate=True,
        )


def test_power_iteration_blas_matches_exact_twin(spark, sf_dir):
    exact = Q.power_iteration_top_eigen(spark, sf_dir).collect()[0]
    blas = Q.power_iteration_blas_production(spark, sf_dir).collect()[0]
    assert blas.n_vectors == exact.n_vectors
    assert abs(blas.lambda1 - exact.lambda1) <= 2e-4       # 4dp rounding
    assert abs(blas.explained_frac - exact.explained_frac) <= 2e-6
    for c in ("c1", "c2", "c3", "c4"):
        assert abs(getattr(blas, c) - getattr(exact, c)) <= 2e-6


def test_cka_blas_matches_exact_twin(spark, sf_dir):
    exact = Q.cka_embedding_views(spark, sf_dir).collect()[0]
    blas = Q.cka_blas_production(spark, sf_dir).collect()[0]
    assert blas.n_vectors == exact.n_vectors
    assert abs(blas.linear_cka - exact.linear_cka) <= 2e-6


def test_gram_partials_deterministic_and_correct(spark, sf_dir):
    import numpy as np

    from udacitydatawarehouseprj_spark import session as S
    from udacitydatawarehouseprj_spark.operators import similarity

    emb = S.load_table(spark, sf_dir, "embeddings")
    n1, s1, m1 = similarity.gram_partials(emb)
    n2, s2, m2 = similarity.gram_partials(emb)
    # deterministic merge order -> bit-identical repeated runs
    assert n1 == n2
    assert (s1 == s2).all() and (m1 == m2).all()
    # matches the direct numpy computation on the collected matrix
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float64)
         for r in emb.select("embedding").collect()]
    )
    assert n1 == x.shape[0]
    assert np.allclose(s1, x.sum(axis=0), rtol=1e-12)
    assert np.allclose(m1, x.T @ x, rtol=1e-12)


def test_neyman_allocation_consistency(spark, sf_dir):
    rows = Q.neyman_allocation_sample(spark, sf_dir).collect()
    total_alloc = sum(r.n_alloc for r in rows)
    # per-stratum independent rounding: off by at most 1 per stratum
    assert abs(total_alloc - 100) <= len(rows)
    for r in rows:
        assert r.n_drawn == min(r.n_alloc, r.nh)
        assert r.sigma > 0


def test_lift_gain_terminal_decile(spark, sf_dir):
    rows = {r.decile: r for r in Q.lift_gain_deciles(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 11))
    assert rows[10].cum_gain == 1.0  # all positives captured at decile 10
    assert abs(rows[10].cum_lift - 1.0) < 1e-9  # full population = base rate


def test_crash_recovery_proof_is_not_vacuous(spark, sf_dir):
    rows = Q.streaming_crash_recovery_readback(spark, sf_dir).collect()
    assert rows, "no output buckets"
    for r in rows:
        assert r.crash_injected_seen, "injected crash never fired"
        assert r.crash_marker_written
        assert r.exactly_once
        assert r.n_batches == 3

"""Unit tests for round-4 wave-7: containment near-dup, count-min
sketch, tokenizer OOV coverage, retrieval-quality eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark.operators import dedup


def test_containment_finds_planted_template(spark):
    """A short template fully embedded in a long page must surface with
    containment 1.0 in the template→page direction, even though Jaccard
    is far below any dedup threshold."""
    template = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(200))
    rows = [
        (1, template),
        (2, filler + " " + template + " " + filler.replace("w", "v")),
        (3, "totally unrelated words only here once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_a, r.doc_b): r
        for r in dedup.ngram_containment_pairs(df, threshold=0.8).collect()
    }
    assert (1, 2) in out
    assert abs(out[(1, 2)].containment_a_in_b - 1.0) < 1e-9
    assert out[(1, 2)].containment_b_in_a < 0.1
    # jaccard would have missed it
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).count()
    assert jac == 0


def test_containment_symmetric_on_identical_docs(spark):
    rows = [(1, "a b c d e f g"), (2, "a b c d e f g")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup.ngram_containment_pairs(df, threshold=0.8).collect()[0]
    assert r.containment_a_in_b == 1.0 and r.containment_b_in_a == 1.0


def test_cms_never_underestimates_and_is_tight_for_heavy(spark, sf_dir):
    rows = Q.count_min_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.never_underestimates is True
        assert r.cms_est >= r.exact_n
        # width 512 over ~hundreds of users: overestimate stays bounded
        assert r.cms_est - r.exact_n < 1000


def test_oov_rate_bounds_and_consistency(spark, sf_dir):
    rows = Q.tokenizer_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - round(r.n_oov / r.n_tokens, 6)) < 1e-12


def test_mrr_eval_contract(spark, sf_dir):
    rows = Q.retrieval_mrr_eval(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert 0.0 <= r.reciprocal_rank <= 1.0
        # rr=1 means the true nearest neighbor ranked first; rr>0 means
        # it appeared somewhere in the system's top-5
        if r.reciprocal_rank > 0:
            assert r.n_hits >= 1
    # the JL system must beat random ranking clearly: mean recall@5 of
    # random ranking over a 500-doc corpus is ~0.01. Uniform random
    # vectors are the JL worst case (all cosines ≈ 0, neighbors nearly
    # arbitrary), so measured recall is modest (0.12 at sf0.001) — the
    # harness's metric plumbing, not system quality, is what this pins.
    mean_hits = sum(r.n_hits for r in rows) / (5.0 * len(rows))
    assert mean_hits > 0.05

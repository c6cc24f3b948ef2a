"""Round-9 wave: production-path capture-recapture + measured-loss DoReMi.

Both queries are oracle-checked (tests/test_oracle_parity.py replays the
DuckDB comparison); these tests pin the SEMANTIC claims their docstrings
make — the cross-twin relationships a hash gate can't see.
"""
import math

from udacitydatawarehouseprj_spark import queries as Q


def test_capture_lsh_tracks_verified_ground_truth(spark, sf_dir):
    """The production estimator must track the VERIFIED near-dup pair
    population — the exact-Jaccard >= 0.5 relation (the corpus's ground
    truth, exhaustively computable at test scale). A detector wiring
    bug (wrong threshold, wrong band config, swapped weights) lands
    orders of magnitude away; honest banding-recall loss cannot.

    Note this is deliberately NOT a comparison against
    capture_recapture_loglinear's estimate: that twin's 32-bit SimHash
    detector saturates (its n010 cell is ~21k against ~28 true pairs
    even at sf0.001), so its population estimate measures detector
    false positives — the degeneracy this query exists to fix.
    """
    from udacitydatawarehouseprj_spark.operators import dedup

    from udacitydatawarehouseprj_spark import session as S

    docs = S.load_table(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(docs, threshold=0.5).count()
    prod = Q.REGISTRY["capture_recapture_lsh"].fn(
        spark, sf_dir
    ).collect()[0]
    assert prod["observed"] > 0
    assert truth > 0
    # every estimate >= what was observed, and within a factor-3 band
    # of the verified population (union recall ~0.75 at this scale)
    assert prod["total_est_loglin"] >= prod["observed"] * 0.99
    assert 0.8 * truth <= prod["total_est_loglin"] <= 3.0 * truth, (
        truth, prod["total_est_loglin"]
    )
    assert prod["union_recall_est"] >= 0.3


def test_capture_lsh_detector_is_candidate_superset(spark, sf_dir):
    """2x6 banded candidates at threshold-0.5 recall must catch most of
    the exact-Jaccard truth: n111+n110+n101+n100 (pairs detector 1
    caught) >= 0.8 x the exact twin's detector-1 captures."""
    exact = Q.REGISTRY["capture_recapture_loglinear"].fn(
        spark, sf_dir
    ).collect()[0]
    prod = Q.REGISTRY["capture_recapture_lsh"].fn(
        spark, sf_dir
    ).collect()[0]
    caught_exact = (exact["n100"] + exact["n110"] + exact["n101"]
                    + exact["n111"])
    caught_lsh = prod["n100"] + prod["n110"] + prod["n101"] + prod["n111"]
    assert caught_lsh >= 0.8 * caught_exact


def test_doremi_lm_weights_normalized_and_loss_ordered(spark, sf_dir):
    rows = Q.REGISTRY["doremi_lm_loss_reweight"].fn(
        spark, sf_dir
    ).collect()
    assert len(rows) >= 2
    # weights are a distribution (6dp rounding tolerance x domains)
    total = sum(r["w_reweighted"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-4 * len(rows))
    # multiplicative-weights with uniform reference: weight order IS
    # loss order (strictly increasing in lm_nll)
    by_loss = sorted(rows, key=lambda r: r["lm_nll"])
    weights = [r["w_reweighted"] for r in by_loss]
    assert weights == sorted(weights), (
        "w_reweighted must be monotone in measured LM loss"
    )
    # the measured NLL is a real trigram-LM scale, not a degenerate 0
    assert all(3.0 < r["lm_nll"] < 12.0 for r in rows)


def test_doremi_lm_differs_from_proxy_twin(spark, sf_dir):
    """The measured-loss twin must actually use a DIFFERENT signal than
    the short-doc-rate proxy — identical weight vectors would mean the
    LM loss column is wired to the wrong input."""
    lm = {r["source"]: r["w_reweighted"]
          for r in Q.REGISTRY["doremi_lm_loss_reweight"].fn(
              spark, sf_dir).collect()}
    proxy = {r["source"]: r["w_reweighted"]
             for r in Q.REGISTRY["doremi_domain_reweight_step"].fn(
                 spark, sf_dir).collect()}
    assert set(lm) == set(proxy)
    assert any(abs(lm[s] - proxy[s]) > 1e-6 for s in lm)


def test_ann_filtered_neighbors_satisfy_predicate(spark, sf_dir):
    """Every returned neighbor must pass the metadata predicate (the
    whole point of pre-filtering), ranks must be contiguous from 1, and
    each query's filtered top-1 cannot beat its unfiltered top-1."""
    from udacitydatawarehouseprj_spark import session as S

    rows = Q.REGISTRY["ann_filtered_topk"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]
        for r in S.load_table(spark, sf_dir, "documents")
        .filter("lang = 'en' AND source IN ('src3','src7')")
        .select("doc_id")
        .collect()
    }
    assert rows, "filtered search returned nothing"
    assert {r["neighbor_id"] for r in rows} <= docs
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == set(range(10))
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
    unfiltered = {
        r["query_id"]: r["cosine"]
        for r in Q.REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    for r in rows:
        if r["rank"] == 1:
            assert r["cosine"] <= unfiltered[r["query_id"]] + 1e-9


def test_rrf_score_is_the_rank_identity(spark, sf_dir):
    """rrf_score must equal round(1/(60+r_lex) + 1/(60+r_dense), 9)
    with absent arms contributing exactly 0.0, and fused_rank must
    order by (score desc, doc_id asc)."""
    rows = Q.REGISTRY["rrf_hybrid_fusion"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        expect = round(
            (1.0 / (60 + r["r_lex"]) if r["r_lex"] is not None else 0.0)
            + (1.0 / (60 + r["r_dense"]) if r["r_dense"] is not None else 0.0),
            9,
        )
        assert abs(r["rrf_score"] - expect) < 1e-12, r
        assert r["r_lex"] is not None or r["r_dense"] is not None
    ordered = sorted(rows, key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert [r["doc_id"] for r in ordered] == [
        r["doc_id"] for r in sorted(rows, key=lambda r: r["fused_rank"])
    ]

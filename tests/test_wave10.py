"""Unit tests for round-5 wave-13: equi-depth bucketing, PMI
collocations, BM25 retrieval (the oracle parity suite covers exact
cross-engine equality; these pin the operator-level invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q


def test_equidepth_buckets_partition_rows(spark, sf_dir):
    rows = Q.equidepth_value_buckets(spark, sf_dir).collect()
    ev = Q._t(spark, sf_dir, "events")
    n = ev.filter(F.col("value").isNotNull()).count()
    assert sum(r.n_rows for r in rows) == n
    buckets = sorted(r.bucket for r in rows)
    assert buckets == list(range(1, len(rows) + 1))
    # equal depth: bucket sizes differ by at most 1
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # bucket ranges are disjoint and ordered: hi of bucket k <= lo of k+1
    by_b = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(by_b, by_b[1:]):
        assert a.lo <= a.hi
        assert a.hi <= b.lo


def test_pmi_collocations_ranked_and_finite(spark, sf_dir):
    import math

    rows = Q.ngram_pmi_collocations(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.c_xy for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(math.isfinite(r.pmi) for r in rows)
    # spot-check the top bigram count against a direct Python recount
    top = rows[0]
    docs = Q._t(spark, sf_dir, "documents")
    direct = 0
    for (text,) in docs.select(F.lower("text")).collect():
        toks = text.split()
        direct += sum(
            1
            for a, b in zip(toks, toks[1:])
            if a == top.w1 and b == top.w2
        )
    assert direct == top.c_xy


def test_bm25_scores_descend_and_docs_match(spark, sf_dir):
    rows = Q.bm25_topk(spark, sf_dir).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # every returned doc contains at least one query term
    docs = Q._t(spark, sf_dir, "documents")
    ids = [r.doc_id for r in rows]
    hits = (
        docs.filter(F.col("doc_id").isin(ids))
        .filter(
            F.lower(F.col("text")).rlike(r"\b(spark|merge|window)\b")
        )
        .count()
    )
    assert hits == len(ids)

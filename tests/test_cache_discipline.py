"""Tracked-cache discipline (session.track_cache / release_tracked_caches).

Operator caches (shingle relations, signature tables, sketches) must
outlive the operator function — plans are lazy — but a long session
running many queries must not accumulate cached blocks. The registry
releases all tracked caches at each query boundary; these tests assert
the net effect: cached-block count is bounded by ONE query's caches, not
cumulative across a query sequence.
"""

from __future__ import annotations

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark import session as S


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


#: cache-heavy queries: LSH shingles, trigram doc-gram, simhash signatures
_SEQ = [
    "dedup_minhash_lsh",
    "text_trigram_lm_score",
    "simhash_band_complete_check",
    "dedup_minhash_lsh",
    "text_trigram_lm_score",
    "dedup_minhash_lsh",
]


def test_no_net_cached_block_growth(spark, sf_dir):
    S.release_tracked_caches()
    qs = Q.queries()
    baseline = _n_persisted(spark)
    counts = []
    for name in _SEQ:
        qs[name](spark, sf_dir).count()
        counts.append(_n_persisted(spark))
    # In-flight caches bounded by one query's worth (≤3 relations), never
    # the sum over the sequence — i.e. the boundary release works.
    assert max(counts) - baseline <= 3, counts
    # Repeat visits to the same query plateau rather than grow.
    assert counts[3] <= counts[0] + 1 and counts[5] <= counts[0] + 1, counts
    S.release_tracked_caches()
    assert _n_persisted(spark) <= baseline


def test_release_is_idempotent_and_safe_before_action(spark, sf_dir):
    df = S.track_cache(Q.queries()["dedup_exact"](spark, sf_dir))
    S.release_tracked_caches()
    S.release_tracked_caches()
    # released before any action: plan still executes correctly, uncached
    assert df.count() > 0

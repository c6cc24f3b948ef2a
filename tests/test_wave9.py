"""Unit tests for round-4 wave-9: co-occurrence mining, key-skew
diagnostics, RFM segmentation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q


def test_cooccurrence_lift_identity(spark, sf_dir):
    """lift · supp(a) · supp(b) must equal supp(a,b); supports bounded
    by the marginals (co-baskets can't exceed either item's baskets)."""
    ev = Q._t(spark, sf_dir, "events")
    b = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
    ).distinct()
    nb = b.select("user_id", "day").distinct().count()
    supp = {
        r.event_type: r.n
        for r in b.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in Q.cooccurrence_event_pairs(spark, sf_dir).collect():
        assert r.et_a < r.et_b
        assert r.n_cobaskets <= min(supp[r.et_a], supp[r.et_b])
        expect_support = round(r.n_cobaskets / nb, 6)
        assert math.isclose(r.support, expect_support, abs_tol=1e-9)
        expect_lift = (r.n_cobaskets / nb) / (
            (supp[r.et_a] / nb) * (supp[r.et_b] / nb)
        )
        assert math.isclose(r.lift, expect_lift, abs_tol=1e-5)


def test_key_skew_report_consistency(spark, sf_dir):
    row = Q.key_skew_report(spark, sf_dir).collect()[0]
    od = Q._t(spark, sf_dir, "orders")
    assert row.n_rows == od.count()
    assert row.n_keys == od.select("o_custkey").distinct().count()
    assert row.p50_freq <= row.p99_freq <= row.max_freq
    assert 0.0 < row.top10_share < 1.0
    assert row.top10_rows >= 10  # ten keys with at least one row each


def test_rfm_deciles_partition_customers(spark, sf_dir):
    rows = Q.rfm_customer_segments(spark, sf_dir).collect()
    od = Q._t(spark, sf_dir, "orders")
    n_cust = od.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    deciles = sorted(r.m_decile for r in rows)
    assert deciles == list(range(1, len(rows) + 1))
    # monotone: higher deciles hold higher total spend per customer
    by_d = {r.m_decile: r for r in rows}
    avg = {
        d: by_d[d].total_monetary / by_d[d].n_customers for d in by_d
    }
    ds = sorted(avg)
    assert all(avg[a] <= avg[b] for a, b in zip(ds, ds[1:]))
    # orders conserved
    assert sum(r.total_orders for r in rows) == od.count()

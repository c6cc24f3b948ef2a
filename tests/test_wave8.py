"""Unit tests for round-4 wave-8: image resize plumbing and
re-aggregable HLL sketch rollup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark.operators import multimodal as mm


def test_resize_block_sums_match_reference_decode(spark):
    """Resize output recomputed from an independent NumPy decode of the
    same payload bytes."""
    ids = spark.createDataFrame([(7,), (123,)], "doc_id long")
    out = {
        r.doc_id: r
        for r in mm.resize_image_features(mm.attach_ppm_payload(ids)).collect()
    }
    for did in (7, 123):
        w, h, px = mm._decode_ppm(mm.encode_ppm(did))
        blocks = px.astype("int64").reshape(h // 2, 2, w // 2, 2, 3).sum(
            axis=(1, 3)
        )
        ys = np.arange(h // 2)[:, None, None]
        xs = np.arange(w // 2)[None, :, None]
        cs = np.arange(3)[None, None, :]
        expect_ck = int((blocks * (1 + xs + 2 * ys + 3 * cs)).sum())
        r = out[did]
        assert (r.out_width, r.out_height) == (w // 2, h // 2)
        assert r.sum_r == int(blocks[:, :, 0].sum())
        assert r.checksum == expect_ck


def test_resize_conserves_channel_totals(spark, sf_dir):
    """A box filter (sum pooling) must conserve each channel's total —
    resize sums equal the decode-stage totals."""
    docs = Q._t(spark, sf_dir, "documents").select("doc_id").limit(50)
    imgs = mm.attach_ppm_payload(docs)
    resized = {r.doc_id: r for r in mm.resize_image_features(imgs).collect()}
    for did, r in list(resized.items())[:10]:
        _, _, px = mm._decode_ppm(mm.encode_ppm(did))
        tot = px.astype("int64").sum(axis=(0, 1))
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(t) for t in tot)


def test_resize_rejects_odd_dims(spark):
    import pytest

    ids = spark.createDataFrame([(1,)], "doc_id long")
    odd = mm.attach_ppm_payload(ids, width=15, height=8)
    with pytest.raises(Exception):
        mm.resize_image_features(odd).collect()


def test_hll_rollup_matches_direct_sketch(spark, sf_dir):
    """Merging daily sketches must estimate the same as sketching the
    whole table directly (union-merge correctness), and the 5% contract
    must hold."""
    ev = Q._t(spark, sf_dir, "events")
    direct = {
        r.event_type: r.e
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    daily_merged = {
        r.event_type: r.e
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()
    }
    assert direct == daily_merged  # sketch union is exact re-aggregation
    for r in Q.hll_sketch_rollup(spark, sf_dir).collect():
        assert r.merged_within_5pct is True
        assert r.n_days >= 1

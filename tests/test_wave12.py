"""Round-7 wave: sequence-pattern compiler, scored ER survivorship,
sink DDL lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark import queries as Q
from udacitydatawarehouseprj_spark.operators import sequence as seqop


def test_compile_pattern_quantifiers_and_permute():
    chars = seqop.assign_chars(["sig", "view", "buy"])
    assert chars == {"sig": "a", "view": "b", "buy": "c"}
    assert seqop.compile_pattern("view{2,} .* buy", chars) == "b{2,}.*c"
    assert seqop.compile_pattern("sig view? buy+", chars) == "ab?c+"
    assert seqop.compile_pattern("view{1,3}", chars) == "b{1,3}"
    # PERMUTE expands to every adjacent ordering
    rx = seqop.compile_pattern("PERMUTE(sig view buy)", chars)
    assert rx.startswith("(") and rx.endswith(")")
    assert set(rx[1:-1].split("|")) == {
        "abc", "acb", "bac", "bca", "cab", "cba"
    }


def test_compile_pattern_rejects_bad_specs():
    chars = seqop.assign_chars(["sig"])
    with pytest.raises(ValueError, match="unknown symbol"):
        seqop.compile_pattern("nope", chars)
    with pytest.raises(ValueError, match="unknown symbol"):
        seqop.compile_pattern("PERMUTE(sig nope)", chars)
    with pytest.raises(ValueError, match="bad pattern element"):
        seqop.compile_pattern("sig{x}", chars)


def test_sequence_match_counts_hand_checked(spark):
    # user 1: big(60), view, view, small(10)  -> seq "accb"
    # user 2: view, small(5)                  -> seq "cb"
    rows = [
        Row(u=1, o=1, t="purchase", v=60.0),
        Row(u=1, o=2, t="view", v=1.0),
        Row(u=1, o=3, t="view", v=1.0),
        Row(u=1, o=4, t="purchase", v=10.0),
        Row(u=2, o=1, t="view", v=1.0),
        Row(u=2, o=2, t="purchase", v=5.0),
    ]
    df = spark.createDataFrame(rows)
    defs = [
        ("big", (F.col("t") == "purchase") & (F.col("v") >= 50)),
        ("small", F.col("t") == "purchase"),
        ("view", F.col("t") == "view"),
    ]
    out = seqop.match_counts(
        df, "u", ("o",), defs,
        {"views_then_small": "view+ small", "starts_big": "big .*"},
    ).collect()[0]
    assert out.n_partitions == 2
    assert out.views_then_small == 2  # "ccb" in u1 tail, "cb" in u2
    assert out.starts_big == 1       # only u1 contains 'a'


def test_sequence_default_char_is_regex_inert(spark):
    # unclassified events become '_' and must not satisfy wildcards
    # incorrectly-anchored patterns; '.' DOES match it by design
    df = spark.createDataFrame([Row(u=1, o=1, t="click", v=0.0)])
    defs = [("view", F.col("t") == "view")]
    out = seqop.match_counts(
        df, "u", ("o",), defs, {"any": ".", "v": "view"}
    ).collect()[0]
    assert out.any == 1 and out.v == 0


def test_er_survivorship_prefers_complete_then_balance(spark, sf_dir):
    base = {
        r.entity_id: r
        for r in Q.er_survivorship_scored(spark, sf_dir).collect()
    }
    pipeline = {
        r.entity_id: r
        for r in Q.entity_resolution_pipeline(spark, sf_dir).collect()
    }
    assert set(base) == set(pipeline)
    for eid, r in base.items():
        # golden is never a dirty synthesized record (they lack acctbal)
        assert r.golden_id < 10_000_000
        assert r.relabeled == (r.golden_id != eid)
        assert r.n_records == pipeline[eid].n_records
    # the over-merged giant component must exist and be relabeled to a
    # higher-balance clean record — the policy delta this query exists
    # to surface
    big = max(base.values(), key=lambda r: r.n_records)
    if big.n_records > 2:
        assert big.relabeled


def test_table_ddl_lifecycle_idempotent_rerun(spark, sf_dir):
    a = sorted(
        Q.table_ddl_lifecycle(spark, sf_dir).collect(),
        key=lambda r: r.o_orderstatus,
    )
    b = sorted(
        Q.table_ddl_lifecycle(spark, sf_dir).collect(),
        key=lambda r: r.o_orderstatus,
    )
    assert a == b  # drop -> create -> append is re-runnable
    assert {r.o_orderstatus for r in a} == {"F", "O"}

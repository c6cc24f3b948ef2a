"""Property-based tests (hypothesis): the scalar layers agree with plain
Python models over generated inputs. One Spark job per property (inputs
batched into a single DataFrame) to keep the suite fast."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark.functions import datetime as dtf
from udacitydatawarehouseprj_spark.operators import textops

# epoch millis covering 1971..2100 (clear of pre-epoch edge semantics)
MILLIS = st.integers(min_value=31_536_000_000, max_value=4_102_444_800_000)


@settings(max_examples=10, deadline=None)
@given(st.lists(MILLIS, min_size=1, max_size=50, unique=True))
def test_time_derivations_match_python_model(spark, batch):
    df = spark.createDataFrame([Row(i=i, ms=m) for i, m in enumerate(batch)])
    ts = dtf.epoch_millis_to_ts("ms")
    got = {
        r.i: r
        for r in df.select(
            "i",
            ts.alias("ts"),
            dtf.time_key(ts).alias("tk"),
            dtf.day_of_week(ts).alias("dow"),
            dtf.fiscal_year(ts).alias("fy"),
            dtf.fiscal_quarter(ts).alias("fq"),
            dtf.season(ts).alias("season"),
        ).collect()
    }
    for i, ms in enumerate(batch):
        py = datetime.fromtimestamp(ms // 1000, tz=timezone.utc).replace(tzinfo=None)
        r = got[i]
        assert r.ts == py
        assert r.tk == int(py.strftime("%Y%m%d%H"))
        assert r.dow == (py.weekday() + 1) % 7 + 1  # python Mon=0 → 1=Sun..7=Sat
        assert r.fy == (py.year - 1 if py.month <= 3 else py.year)
        assert r.fq == {1: 4, 2: 4, 3: 4, 4: 1, 5: 1, 6: 1,
                        7: 2, 8: 2, 9: 2, 10: 3, 11: 3, 12: 3}[py.month]
        assert r.season == {12: "Winter", 1: "Winter", 2: "Winter",
                            3: "Spring", 4: "Spring", 5: "Spring",
                            6: "Summer", 7: "Summer", 8: "Summer",
                            }.get(py.month, "Fall")


TEXT = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_fingerprint_matches_python_model(spark, batch):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(batch)])
    got = {r.doc_id: r.fingerprint
           for r in textops.fingerprint_rolling(df).collect()}
    for i, t in enumerate(batch):
        expected = sum(
            ord(c) * ((j % textops.FINGERPRINT_WINDOW) + 1)
            for j, c in enumerate(t)
        ) % textops.FINGERPRINT_MOD
        assert got[i] == expected, t


WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=1, max_size=20
)


@settings(max_examples=10, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=20))
def test_token_stats_match_python_model(spark, batch):
    texts = [" ".join(ws) for ws in batch]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {r.doc_id: r for r in textops.token_stats(df).collect()}
    for i, ws in enumerate(batch):
        r = got[i]
        assert r.n_tokens == len(ws)
        assert r.n_token_chars == sum(len(w) for w in ws)
        assert r.n_chars == len(texts[i])


# --- round-3 operators --------------------------------------------------

COSTS = st.integers(min_value=1, max_value=5000)


@settings(max_examples=8, deadline=None)
@given(st.lists(COSTS, min_size=1, max_size=60))
def test_pack_bins_ffd_invariants_hold_for_any_costs(spark, costs):
    """For ANY cost vector: every doc packed exactly once, multi-doc bins
    never exceed capacity, oversize docs isolated."""
    from udacitydatawarehouseprj_spark.operators import layout

    cap = 2048
    df = spark.createDataFrame(
        list(enumerate(costs)), "doc_id long, n_chars long"
    )
    out = layout.pack_bins_ffd(df, capacity=cap, n_buckets=3).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(costs)))
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r.cost)
    for bin_costs in by_bin.values():
        if len(bin_costs) >= 2:
            assert sum(bin_costs) <= cap
        if any(c > cap for c in bin_costs):
            assert len(bin_costs) == 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), COSTS), min_size=1, max_size=60
    )
)
def test_mix_sources_allocation_never_exceeded(spark, rows):
    """For ANY corpus: per-source selected cost never exceeds its exact
    integer allocation total·num·w/(den·Σw), and selection is a prefix of
    the hash order (deterministic)."""
    from pyspark.sql import functions as F

    from udacitydatawarehouseprj_spark.operators import layout

    data = [
        (i, f"s{src}", cost) for i, (src, cost) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, n_chars long")
    w = (F.expr("substring(source, 2)").cast("long") % 3) + 1
    out = layout.mix_sources_weighted(df, w, budget_num=1, budget_den=2)
    got = out.collect()
    total = sum(c for _, _, c in data)
    weights = {s: (int(s[1:]) % 3) + 1
               for s in {r[1] for r in data}}
    sum_w = sum(weights.values())
    per = {}
    for r in got:
        per[r.source] = per.get(r.source, 0) + r.n_chars
    for s, selected in per.items():
        # cross-multiplied bound: selected·2·Σw ≤ total·w
        assert selected * 2 * sum_w <= total * weights[s]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=10, max_size=40))
def test_span_dedup_reassembly_identity_without_duplicates(spark, seed):
    """A corpus of globally-unique spans must reassemble EXACTLY (the
    dedup is the identity when nothing repeats)."""
    from udacitydatawarehouseprj_spark import queries as Q
    import os, tempfile

    texts = [
        " ".join(f"d{i}w{j}x{seed[(i + j) % len(seed)]}" for j in range(12))
        for i in range(len(seed))
    ]
    rows = list(enumerate(texts))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r.doc_id: r.clean_text
               for r in Q.queries()["span_dedup_global"](spark, d).collect()}
    assert out == dict(rows)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1, max_size=200, unique=True,
    ),
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1, max_size=50, unique=True,
    ),
)
def test_bloom_semijoin_never_drops_a_match(spark, fact_keys, dim_keys):
    """For ANY key sets, every fact key present in the dim set survives
    the bloom prefilter — the no-false-negatives contract the join-
    identity oracle relies on."""
    from udacitydatawarehouseprj_spark.operators import relational as rel

    fact = spark.createDataFrame([Row(k=int(k)) for k in fact_keys])
    dim = spark.createDataFrame([Row(d=int(k)) for k in dim_keys])
    survived = {
        r.k for r in rel.bloom_semijoin_reduce(fact, "k", dim, "d").collect()
    }
    truly_matching = set(fact_keys) & set(dim_keys)
    assert truly_matching <= survived


def test_bloom_semijoin_mixed_key_types_no_false_negatives(spark):
    """An INT fact key probed against a BIGINT dim key (and string vs
    long) must still never drop a true match: xxhash64 is type-
    sensitive, so build and probe hash from a common widened type."""
    from udacitydatawarehouseprj_spark.operators import relational as rel

    keys = list(range(0, 4000, 7))
    fact = spark.createDataFrame(
        [(k,) for k in keys], "k int"  # narrow side
    )
    dim = spark.createDataFrame(
        [(k,) for k in keys[::3]], "d bigint"  # wide side
    )
    survived = {r.k for r in
                rel.bloom_semijoin_reduce(fact, "k", dim, "d").collect()}
    assert set(keys[::3]) <= survived

    # string fact key vs long dim key: both normalize via cast-to-string
    # on the fact side only, so this documents the SUPPORTED contract —
    # identical logical values in identical representations. A string
    # "00042" vs long 42 is out of contract; "42" vs 42 must match.
    fact_s = spark.createDataFrame([(str(k),) for k in keys], "k string")
    survived_s = {int(r.k) for r in
                  rel.bloom_semijoin_reduce(fact_s, "k", dim, "d").collect()}
    assert set(keys[::3]) <= survived_s

    # double fact key vs bigint dim key: must widen to a common NUMERIC
    # type (the string route renders '42.0' != '42' and silently drops
    # keys that ARE equal under SQL numeric equality — round-6 advice).
    fact_d = spark.createDataFrame(
        [(float(k),) for k in keys], "k double"
    )
    survived_d = {int(r.k) for r in
                  rel.bloom_semijoin_reduce(fact_d, "k", dim, "d").collect()}
    assert set(keys[::3]) <= survived_d

    # string vs double has no canonical common rendering: refuse loudly
    # rather than degrade to false negatives.
    import pytest as _pytest
    dim_d = spark.createDataFrame([(1.5,)], "d double")
    with _pytest.raises(ValueError, match="common rendering"):
        rel.bloom_semijoin_reduce(fact_s, "k", dim_d, "d")


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=8, max_size=120, unique_by=lambda t: t[0],
    )
)
def test_equidepth_rank_formula_matches_python_model(spark, rows):
    """The blocked distributed rank feeding the bucketizer must equal a
    plain Python sort-rank for any value distribution (incl. negative
    and duplicate values)."""
    from udacitydatawarehouseprj_spark.operators import relational as rel

    df = spark.createDataFrame(
        [Row(event_id=int(i), value=float(v)) for i, v in rows]
    )
    ranked = {
        r.event_id: r.rn
        for r in rel.exact_distributed_rank(
            df,
            block=F.floor(F.col("value") / F.lit(64.0)).cast("long"),
            order=[F.col("value").asc(), F.col("event_id").asc()],
            rank_col="rn",
        ).collect()
    }
    expect = {
        eid: i + 1
        for i, (eid, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert ranked == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),         # user
            st.integers(min_value=0, max_value=86_400_000),  # offset ms
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=2, max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_interpolation_stays_between_brackets(spark, rows):
    """Every interpolated grid value lies between its bracketing event
    values (convexity of linear interpolation), for any event layout."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(
                user_id=int(u),
                ts=base + timedelta(milliseconds=int(ms)),
                value=float(v),
            )
            for u, ms, v in rows
        ]
    )
    # inline replica of the query's window mechanics over arbitrary data
    from pyspark.sql.window import Window as W

    bounds = ev.agg(
        (F.date_trunc("hour", F.min("ts")) + F.expr("INTERVAL 1 HOUR")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    ).collect()[0]
    if bounds.t0 > bounds.t1:
        return  # span shorter than an hour — no grid points, nothing to test
    grid = (
        ev.select("user_id").distinct()
        .crossJoin(
            spark.createDataFrame([Row(t0=bounds.t0, t1=bounds.t1)])
        )
        .select(
            "user_id",
            F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        )
        .withColumn("value", F.lit(None).cast("double"))
        .withColumn("is_grid", F.lit(1))
    )
    u = ev.withColumn("is_grid", F.lit(0)).unionByName(grid)
    fwd = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("is_grid").asc(), F.col("value").asc())
    rev = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("is_grid").desc(), F.col("value").desc())
    ev_val = F.when(F.col("is_grid") == 0, F.col("value"))
    ev_ts = F.when(F.col("is_grid") == 0, F.col("ts"))
    w = (
        u.withColumn("v_prev", F.last(ev_val, True).over(
            fwd.rowsBetween(W.unboundedPreceding, -1)))
        .withColumn("t_prev", F.last(ev_ts, True).over(
            fwd.rowsBetween(W.unboundedPreceding, -1)))
        .withColumn("v_next", F.last(ev_val, True).over(
            rev.rowsBetween(W.unboundedPreceding, -1)))
        .withColumn("t_next", F.last(ev_ts, True).over(
            rev.rowsBetween(W.unboundedPreceding, -1)))
    )
    frac = (
        F.unix_micros("ts").cast("double")
        - F.unix_micros("t_prev").cast("double")
    ) / (
        F.unix_micros("t_next").cast("double")
        - F.unix_micros("t_prev").cast("double")
    )
    out = w.filter(
        (F.col("is_grid") == 1)
        & F.col("v_prev").isNotNull() & F.col("v_next").isNotNull()
        & (F.col("t_next") > F.col("t_prev"))
    ).withColumn(
        "v", F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * frac
    ).collect()
    for r in out:
        lo, hi = sorted((r.v_prev, r.v_next))
        # linear interpolation is bounded by its endpoints
        assert lo - 1e-9 <= r.v <= hi + 1e-9

"""Text-analysis operator tests against hand-computed values."""

from __future__ import annotations

from pyspark.sql import Row

from udacitydatawarehouseprj_spark.operators import textops


def _doc(spark, text):
    return spark.createDataFrame([Row(doc_id=0, text=text)])


def test_token_stats(spark):
    row = textops.token_stats(_doc(spark, "the cat sat on mats")).collect()[0]
    assert row.n_chars == 19
    assert row.n_tokens == 5
    assert row.n_token_chars == 15  # 3+3+3+2+4
    assert row.avg_token_len == 3.0


def test_quality_score_ratios(spark):
    # "ab 12" → 5 chars: 2 alpha, 2 digit, 1 space
    row = textops.quality_score(_doc(spark, "ab 12")).collect()[0]
    assert row.alpha_ratio == 2 / 5
    assert row.digit_ratio == 2 / 5
    assert row.space_ratio == 1 / 5
    assert row.quality_score == 2 / 5 - 2 / 5


def test_lang_id_markers(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat and the dog of a house"),
            Row(doc_id=1, text="el gato y la casa de que"),
            Row(doc_id=2, text="der hund und die katze das"),
            Row(doc_id=3, text="zzz qqq www"),
        ]
    )
    got = {r.doc_id: r.lang_pred for r in textops.lang_id(docs).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_fingerprint_rolling_matches_python(spark):
    text = "spark engine"
    expected = (
        sum(ord(c) * ((i % 64) + 1) for i, c in enumerate(text))
        % textops.FINGERPRINT_MOD
    )
    row = textops.fingerprint_rolling(_doc(spark, text)).collect()[0]
    assert row.fingerprint == expected


def test_fingerprint_fast_detects_equal_text(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="same text"), Row(doc_id=1, text="same text"),
         Row(doc_id=2, text="other text")]
    )
    fps = {r.doc_id: r.fingerprint
           for r in textops.fingerprint_fast(docs).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_pii_redact_masks_and_counts(spark):
    row = textops.pii_redact(
        _doc(spark, "mail a.b+c@x-y.co or 10.0.0.1 call 555-867-5309 end")
    ).collect()[0]
    assert row.redacted == "mail <EMAIL> or <IP> call <PHONE> end"
    assert (row.n_emails, row.n_ips, row.n_phones) == (1, 1, 1)


def test_pii_redact_email_digits_not_double_counted(spark):
    # digits/dots inside the email must not count as an IP (email masked
    # first), and an IP must not count as a phone
    row = textops.pii_redact(_doc(spark, "v1.2.3.4@host.org and 1.2.3.4")).collect()[0]
    assert row.n_emails == 1
    assert row.n_ips == 1
    assert row.n_phones == 0
    assert row.redacted == "<EMAIL> and <IP>"


def test_pii_redact_clean_text_untouched(spark):
    row = textops.pii_redact(_doc(spark, "no pii here at all")).collect()[0]
    assert row.redacted == "no pii here at all"
    assert (row.n_emails, row.n_ips, row.n_phones) == (0, 0, 0)


def test_repetition_stats_hand_computed(spark):
    # "a b a b a" → 2-grams: [a b, b a, a b, b a] → total 4, distinct 2,
    # top count 2
    row = textops.repetition_stats(_doc(spark, "a b a b a")).collect()[0]
    assert row.n_2grams == 4
    assert row.n_distinct_2grams == 2
    assert row.dup_2gram_frac == 0.5
    assert row.top_2gram_frac == 0.5


def test_repetition_stats_all_unique(spark):
    row = textops.repetition_stats(_doc(spark, "a b c d")).collect()[0]
    assert row.n_2grams == 3
    assert row.dup_2gram_frac == 0.0


def test_normalize_nfc_composes_and_cleans(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="café latte"),     # decomposed é → NFC composes
            Row(doc_id=1, text="café latte"),      # precomposed é — same after NFC
            Row(doc_id=2, text="a\x00b\x07c\x7fd"),     # C0 controls + DEL stripped
            Row(doc_id=3, text="  a \t\n  b\r\r  "),    # whitespace collapsed + stripped
            Row(doc_id=4, text="plain text"),           # untouched
        ]
    )
    got = {r.doc_id: r for r in textops.normalize_nfc(docs).collect()}
    # composed and decomposed forms canonicalize to the SAME bytes
    assert got[0].norm_hash == got[1].norm_hash
    assert got[0].n_chars_norm == 10  # 'café latte'
    assert got[0].changed and not got[1].changed
    assert got[2].n_chars_norm == 4 and got[2].changed  # 'abcd'
    assert got[3].n_chars_norm == 3 and got[3].changed  # 'a b'
    assert not got[4].changed


def test_dsir_doc_bucket_counts_bigram_totals(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="the cat sat"),   # 2 bigrams
            Row(doc_id=1, lang="de", text="hund"),          # 1 token → 0 bigrams
            Row(doc_id=2, lang="en", text="a b a b a"),     # 4 bigrams, 2 distinct
        ]
    )
    dbc = textops.dsir_doc_bucket_counts(docs).collect()
    per_doc = {}
    for r in dbc:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.cnt
        assert 0 <= r.bucket < textops.DSIR_BUCKETS
    assert per_doc == {0: 2, 2: 4}  # single-token doc yields NO rows
    # 'a b a b a' has exactly 2 distinct bigrams ('a b' ×2, 'b a' ×2)
    doc2 = sorted(r.cnt for r in dbc if r.doc_id == 2)
    assert doc2 == [2, 2]


def test_degenerate_docs_match_oracle_semantics(spark):
    """Empty/tiny docs must follow the DuckDB oracle's empty-list
    semantics (NULL fingerprint, zero trigrams/bigrams) — Spark's
    sequence(1, 0) DESCENDS ([1, 0]) instead of being empty, which
    un-guarded folds would silently feed garbage indices."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text="ab"), Row(doc_id=2, text="abcd")]
    )
    fp = {r.doc_id: r.fingerprint for r in textops.fingerprint_rolling(docs).collect()}
    assert fp[0] is None  # oracle: list_sum([]) IS NULL
    assert fp[1] == ord("a") * 1 + ord("b") * 2
    assert fp[2] is not None

    langs = docs.withColumn("lang", textops.F.lit("en"))
    tri = textops.trigram_lm_score(docs)
    scored = {r.doc_id for r in tri.collect()}
    assert 0 not in scored and 1 not in scored  # no trigrams → no row
    assert 2 in scored
    _ = langs


def test_byte_features_empty_payload_is_null_checksum(spark):
    from udacitydatawarehouseprj_spark.operators import multimodal as mm

    docs = spark.createDataFrame([Row(doc_id=0, text=""), Row(doc_id=1, text="A")])
    rows = {
        r.doc_id: r
        for r in mm.extract_byte_features(mm.attach_payload(docs)).collect()
    }
    assert rows[0].checksum is None and rows[0].first_byte == -1
    assert rows[1].checksum == 65 and rows[1].first_byte == 65


def _bpe_corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="low lower lowest low low newer newest"),
            Row(doc_id=1, text="wider wide widest new newer lower low"),
            Row(doc_id=2, text="the newest widest lowest low new wide"),
            Row(doc_id=3, text="low low low wide wide new new newer"),
        ]
    )


def test_bpe_batched_equals_sequential(spark, sf_dir, monkeypatch):
    """The batched trainer must reproduce the sequential merge table
    EXACTLY (same pairs, order, counts) while spending ~B-fold fewer
    pair-count rounds (driver round-trips)."""
    docs = _bpe_corpus(spark)

    rounds = {"n": 0}
    orig = textops._bpe_pair_counts

    def counting(corpus):
        rounds["n"] += 1
        return orig(corpus)

    monkeypatch.setattr(textops, "_bpe_pair_counts", counting)

    seq = textops.bpe_learn_merges(docs, n_merges=8).collect()
    seq_rounds = rounds["n"]
    rounds["n"] = 0
    bat = textops.bpe_learn_merges_batched(docs, n_merges=8, batch=4).collect()
    bat_rounds = rounds["n"]

    assert [tuple(r) for r in seq] == [tuple(r) for r in bat]
    assert seq_rounds == 8
    assert bat_rounds < seq_rounds, (seq_rounds, bat_rounds)


def test_bpe_batched_equals_sequential_on_documents(spark, sf_dir):
    """Same equality property on the real documents fixture (adversarial
    tie patterns appear in natural text more than in toy corpora)."""
    from udacitydatawarehouseprj_spark import session as S

    docs = S.load_table(spark, sf_dir, "documents")
    seq = textops.bpe_learn_merges(docs, n_merges=6).collect()
    bat = textops.bpe_learn_merges_batched(docs, n_merges=6, batch=3).collect()
    assert [tuple(r) for r in seq] == [tuple(r) for r in bat]

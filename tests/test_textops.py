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

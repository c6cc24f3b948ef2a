"""Text-analysis operators for training-data pipelines.

Beyond-reference operators (BASELINE.json north star) over a
``documents(doc_id, text, lang, source, n_chars)`` table: token counting,
quality scoring, n-gram-heuristic language ID, and rolling-hash document
fingerprinting.

All pure Column expressions (split/filter/transform/aggregate — Catalyst
higher-order functions), evaluated inside codegen; zero Python UDFs, so
the per-document cost is JVM-vectorized and the only shuffles are the
final aggregations (fingerprint) or none at all (per-doc maps).

Determinism: ratios are single IEEE divisions of exact integer counts —
identical across engines, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marker stopwords per language for the n-gram/stopword-heuristic lang-ID.
#: Checked in this order; ties resolve to the earlier language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
FINGERPRINT_WINDOW = 64


def _toks(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token counting + length stats per document."""
    toks = _toks(text_col)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        tok_chars.cast("int").alias("n_token_chars"),
        (tok_chars.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality: alpha ratio, whitespace ratio, digit
    ratio, mean word length band — the length/punct/stopword-ratio family
    of quality filters used by corpus-cleaning pipelines."""
    text = F.col(text_col)
    n = F.length(text)
    alpha = n - F.length(F.regexp_replace(text, "[A-Za-z]", ""))
    digit = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    space = n - F.length(F.regexp_replace(text, " ", ""))
    toks = _toks(text_col)
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in")))
    n_tokens = F.size(toks)
    alpha_ratio = alpha.cast("double") / n.cast("double")
    digit_ratio = digit.cast("double") / n.cast("double")
    space_ratio = space.cast("double") / n.cast("double")
    stop_ratio = stop.cast("double") / n_tokens.cast("double")
    return df.select(
        F.col(id_col),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        space_ratio.alias("space_ratio"),
        stop_ratio.alias("stop_ratio"),
        # composite: favor alphabetic, lightly penalize digits; the exact
        # weights are illustrative — the operator shape is what matters
        (alpha_ratio - digit_ratio).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic).

    Counts language-marker tokens per language and takes the argmax with a
    deterministic precedence (en > es > de > fr); no markers → 'und'
    (undetermined). A real pipeline would use character n-gram profiles —
    the operator surface (per-doc scoring + argmax) is identical.
    """
    toks = _toks(text_col)

    def marker_count(markers: tuple[str, ...]) -> Column:
        # single-arg lambda: F.filter treats a second parameter as the
        # element index, so the marker tuple must be closed over, not
        # passed as a defaulted argument
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    counts = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    c_en, c_es, c_de, c_fr = (counts[x] for x in ("en", "es", "de", "fr"))
    best = (
        F.when((c_en + c_es + c_de + c_fr) == 0, F.lit("und"))
        .when((c_en >= c_es) & (c_en >= c_de) & (c_en >= c_fr), F.lit("en"))
        .when((c_es >= c_de) & (c_es >= c_fr), F.lit("es"))
        .when(c_de >= c_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        F.col(id_col),
        c_en.cast("int").alias("n_en"),
        c_es.cast("int").alias("n_es"),
        c_de.cast("int").alias("n_de"),
        c_fr.cast("int").alias("n_fr"),
        best.alias("lang_pred"),
    )


def fingerprint_rolling(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Position-weighted rolling-hash fingerprint, SQL-portable variant:
    sum over characters of code(c_i) * ((i-1) mod 64 + 1), mod 2^31-1.

    Computed as a single per-row ``aggregate`` fold over the character
    positions — a pure projection with NO explode and NO shuffle (an
    earlier explode+groupBy version shuffled one row per character; the
    fold is the right shape at corpus scale). The running sum stays far
    below 2^63 (max code 0x10FFFF × weight 64 per char → overflow needs
    ~10^12-char documents), so one final mod suffices and matches the
    DuckDB oracle's list_sum arithmetic exactly. For production-scale
    fingerprinting use ``fingerprint_fast`` — one xxhash64 expression.
    """
    from udacitydatawarehouseprj_spark.session import spread

    fold = F.expr(
        f"aggregate(sequence(1, length({text_col})), 0L,"
        f" (acc, i) -> acc + CAST(ascii(substring({text_col}, i, 1)) AS BIGINT)"
        f" * (((i - 1) % {FINGERPRINT_WINDOW}) + 1))"
    )
    return spread(df).select(
        F.col(id_col), (fold % FINGERPRINT_MOD).alias("fingerprint")
    )


def fingerprint_fast(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Engine-native fingerprint: xxhash64 of the text — the right tool at
    100 TB (single expression, no explode, no shuffle)."""
    return df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("fingerprint"))


def trigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-trigram language-model score per doc: train trigram
    frequencies on the corpus itself (one pass), then score each doc by
    the mean log-probability of its trigrams — the self-supervised
    'perplexity filter' that drops boilerplate/garbage before expensive
    model-based scoring.

    Two aggregations: (1) global trigram counts (map-side partial, the
    model is |V|³-bounded and broadcast back), (2) per-doc mean over an
    equi-join of doc trigrams to the model. No Python anywhere; the
    trigram explode is a codegen'd sequence/substring expression.

    Determinism: every scored trigram exists in the model (trained on
    the same corpus) so ln() never sees 0; per-trigram log-probs are
    rounded to 6 before an exact DECIMAL sum so accumulation order
    can't drift the mean.
    """
    from udacitydatawarehouseprj_spark.session import spread

    tri = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - 2, 0)),"
        f" i -> substring({text_col}, i, 3))"
    )
    grams = spread(df, (id_col,)).select(
        F.col(id_col), F.explode(tri).alias("gram")
    )
    model = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("total"))
    scored = (
        grams.join(F.broadcast(model), "gram")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 6
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        (
            F.round(F.sum("logp"), 4).cast("decimal(18,4)").cast("double")
            / F.count("*")
        ).alias("mean_logp"),
        F.count("*").cast("long").alias("n_grams"),
    )

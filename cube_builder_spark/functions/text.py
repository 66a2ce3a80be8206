"""Text analysis operators for large-scale corpus pipelines.

All pure Catalyst column expressions over a ``text`` column — token
counting, language-ID heuristic, quality scoring, fingerprinting. At
100 TB these run inside whole-stage codegen on the scan, no shuffle
until the final aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword vote.
STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "les", "des", "un"],
}
LANG_ORDER = ["en", "de", "es", "fr"]


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + lexical-diversity stats."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        (F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)).alias("uniq_ratio"),
        (F.length(F.translate(F.col(text_col), " ", "")) * 1.0 / F.size(toks))
        .alias("mean_token_len"),
    )


def stopword_hits(text_col: Column, words: list[str]) -> Column:
    """Count of tokens in the stopword list (duplicates counted)."""
    wlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col(text_col),
                           lambda t: F.array_contains(wlist, t))).cast("long")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword vote per language, deterministic
    argmax with ties resolved in LANG_ORDER."""
    scores = {lg: stopword_hits(F.col(text_col), ws) for lg, ws in STOPWORDS.items()}
    df = df.select("doc_id", "lang",
                   *[scores[lg].alias(f"s_{lg}") for lg in LANG_ORDER])
    s = {lg: F.col(f"s_{lg}") for lg in LANG_ORDER}
    pred = (F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
            .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
            .when(s["es"] >= s["fr"], "es").otherwise("fr"))
    return df.withColumn("predicted", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality scoring: lexical diversity damped for short
    docs, plus stopword density (the filters a pretraining pipeline
    gates on)."""
    stats = token_stats(df, text_col).join(
        df.select("doc_id",
                  stopword_hits(F.col(text_col), STOPWORDS["en"]).alias("s_en")),
        "doc_id")
    length_factor = (F.when(F.col("n_tokens") >= 50, F.lit(1.0))
                     .otherwise(F.col("n_tokens") / 50.0))
    return stats.select(
        "doc_id", "n_tokens", "uniq_ratio",
        (F.col("s_en") * 1.0 / F.col("n_tokens")).alias("stopword_ratio"),
        (F.col("uniq_ratio") * length_factor).alias("quality"),
    )


def gate_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-prep gate columns (n_tokens, quality, predicted
    lang, content_hash) in ONE projection over one scan — value-equal
    to composing token_stats + quality_score + lang_id via doc_id
    joins, but with zero joins and zero shuffles: every column is a
    pure function of the row, so at corpus scale the gates cost one
    pass instead of four scans and three shuffles. The token array is
    bound to a column first so the interpreted higher-order filters
    don't re-split the text per reference."""
    tok_df = df.select("doc_id", "lang", F.col(text_col).alias("text"),
                       F.md5(F.col(text_col)).alias("content_hash"),
                       tokens_col(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    n_tokens = F.size(t).cast("long")
    uniq_ratio = F.size(F.array_distinct(t)) * 1.0 / F.size(t)

    def hits(words):
        wlist = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(t, lambda x: F.array_contains(wlist, x))) \
            .cast("long")

    s = {lg: hits(ws) for lg, ws in STOPWORDS.items()}
    pred = (F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"])
                   & (s["en"] >= s["fr"]), "en")
            .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
            .when(s["es"] >= s["fr"], "es").otherwise("fr"))
    length_factor = (F.when(n_tokens >= 50, F.lit(1.0))
                     .otherwise(n_tokens / 50.0))
    return tok_df.select(
        "doc_id", "lang", "text", "content_hash",
        n_tokens.alias("n_tokens"),
        (uniq_ratio * length_factor).alias("quality"),
        pred.alias("predicted"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: exact hash + order-insensitive content
    hash (sorted distinct tokens), the keys for exact/near dedup."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("content_fp"),
    )


# BPE-ish regex tokenization (GPT-2-style pretokenizer shape):
# contractions, letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_tokens_col(text: Column) -> Column:
    """Pretokenizer split as a column expression (regexp_extract_all
    is JVM-side; no UDF)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting under the BPE-ish pretokenizer: total tokens,
    distinct tokens, letter/digit/punct split — the unit a training
    pipeline budgets by."""
    toks = bpe_tokens_col(F.col(text_col))
    is_word = lambda t: t.rlike("^[a-zA-Z]")
    is_num = lambda t: t.rlike("^[0-9]")
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_bpe_uniq"),
        F.size(F.filter(toks, is_word)).cast("long").alias("n_word"),
        F.size(F.filter(toks, is_num)).cast("long").alias("n_number"),
    )


ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash over the token stream (Rabin-Karp
    shape): h = fold(h*B + code) mod M, with per-token codes derived
    from md5 so the fold is engine-portable. One F.aggregate — an
    associative-scan-free left fold that runs inside codegen; the
    shuffle-free path to a corpus-wide fingerprint column."""
    toks = tokens_col(F.col(text_col))
    codes = F.transform(toks, lambda t: F.ascii(F.substring(F.md5(t), 1, 1)))
    rolled = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD)
    return df.select("doc_id", rolled.alias("rolling_fp"))

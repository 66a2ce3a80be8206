"""Corpus-curation operators a pretraining-data pipeline needs beyond
dedup/lang-ID/quality: repetition-based quality signals (Gopher-style),
eval-set decontamination, fixed-budget sequence packing, and stratified
sampling. All are JVM column expressions + standard shuffles — no
Python in the hot path — and every entry has a DuckDB oracle.

These have no reference analogue (the reference is a raster cube
builder); they extend the engine the way SURVEY.md §6 frames the
documents/embeddings plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_tables

REGISTRY: list[tuple[str, object, str | None]] = []


def register(name: str, sql: str | None):
    def deco(fn):
        REGISTRY.append((name, fn, sql))
        return fn
    return deco


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


# --- repetition profile (Gopher-style duplicate-n-gram signals) -------------

@register("t_repetition_profile", """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, len(t) AS n_tokens, 2 AS n,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks WHERE len(t) >= 2
  UNION ALL
  SELECT doc_id, len(t), 3,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
  FROM toks WHERE len(t) >= 3
),
counts AS (
  SELECT doc_id, n_tokens, n, gram, count(*) AS c
  FROM grams GROUP BY ALL
),
prof AS (
  SELECT doc_id, n_tokens, n,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS uniq,
         CAST(max(c) AS BIGINT) AS topc
  FROM counts GROUP BY ALL
)
SELECT doc_id, n_tokens,
       max(CASE WHEN n = 2 THEN total END) AS n_2grams,
       max(CASE WHEN n = 2 THEN uniq END) AS n_uniq_2grams,
       max(CASE WHEN n = 2 THEN (total - uniq) * 1e0 / total END) AS dup_2gram_frac,
       max(CASE WHEN n = 2 THEN topc END) AS top_2gram_count,
       max(CASE WHEN n = 2 THEN topc * 1e0 / total END) AS top_2gram_frac,
       max(CASE WHEN n = 3 THEN (total - uniq) * 1e0 / total END) AS dup_3gram_frac,
       max(CASE WHEN n = 3 THEN topc * 1e0 / total END) AS top_3gram_frac
FROM prof GROUP BY doc_id, n_tokens
""")
def t_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText quality
    rules adapted to a whitespace corpus): duplicate-2/3-gram fraction
    and most-frequent-n-gram coverage. High values flag boilerplate and
    degenerate (looping) text a pretraining pipeline drops.

    Scale shape: one explode of both gram sizes into a single plane
    (one shuffle key: (doc_id, n, gram) with map-side partial agg —
    per-doc gram counting never materializes a per-doc map), then two
    same-key reductions that AQE coalesces; no joins, no Python.
    """
    docs = _docs(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    bound = docs.select("doc_id", t.alias("_t"),
                        F.size(t).cast("long").alias("n_tokens"))
    g2 = F.when(
        F.size("_t") >= 2,
        F.expr("transform(sequence(0, size(_t)-2),"
               " i -> struct(2L AS n, concat(_t[i], ' ', _t[i+1]) AS gram))")
    ).otherwise(F.expr("array()"))
    g3 = F.when(
        F.size("_t") >= 3,
        F.expr("transform(sequence(0, size(_t)-3),"
               " i -> struct(3L AS n,"
               " concat(_t[i], ' ', _t[i+1], ' ', _t[i+2]) AS gram))")
    ).otherwise(F.expr("array()"))
    grams = (bound
             .select("doc_id", "n_tokens",
                     F.explode(F.concat(g2, g3)).alias("g"))
             .select("doc_id", "n_tokens", "g.n", "g.gram"))
    counts = grams.groupBy("doc_id", "n_tokens", "n", "gram").count()
    prof = counts.groupBy("doc_id", "n_tokens", "n").agg(
        F.sum("count").cast("long").alias("total"),
        F.count("*").cast("long").alias("uniq"),
        F.max("count").cast("long").alias("topc"))

    def pick(n, col):
        return F.max(F.when(F.col("n") == n, col))

    return prof.groupBy("doc_id", "n_tokens").agg(
        pick(2, F.col("total")).alias("n_2grams"),
        pick(2, F.col("uniq")).alias("n_uniq_2grams"),
        pick(2, (F.col("total") - F.col("uniq")) * 1.0 / F.col("total"))
        .alias("dup_2gram_frac"),
        pick(2, F.col("topc")).alias("top_2gram_count"),
        pick(2, F.col("topc") * 1.0 / F.col("total")).alias("top_2gram_frac"),
        pick(3, (F.col("total") - F.col("uniq")) * 1.0 / F.col("total"))
        .alias("dup_3gram_frac"),
        pick(3, F.col("topc") * 1.0 / F.col("total")).alias("top_3gram_frac"))


# --- eval-set decontamination ------------------------------------------------

_DECON_N = 8  # n-gram size for the overlap check (GPT-3 used 13)


@register("p_decontaminate", f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           range(1, len(t) - {_DECON_N - 2}),
           i -> md5(array_to_string(list_slice(t, i, i + {_DECON_N - 1}), ' ')))))
         AS g
  FROM toks WHERE len(t) >= {_DECON_N}
),
eval_g AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
hits AS (
  SELECT tg.doc_id, count(*) AS n_shared
  FROM grams tg JOIN eval_g USING (g)
  WHERE tg.source <> 'src0'
  GROUP BY tg.doc_id
)
SELECT d.doc_id, d.source,
       CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
       coalesce(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.source <> 'src0'
""")
def p_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing any
    8-gram with the held-out eval slice (source ``src0`` plays the eval
    benchmark). The GPT-3/Llama pipelines run exactly this n-gram
    collision sweep before training.

    Scale shape: both sides reduce to DISTINCT md5(n-gram) digests
    before any join, and the eval side (a benchmark suite — tiny by
    nature, even when the train side is 100 TB) is broadcast, so the
    train plane is never shuffled: one explode + one broadcast-hash
    semi-join + one groupBy(doc_id).
    """
    docs = _docs(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    n = _DECON_N
    bound = docs.select("doc_id", "source", t.alias("_t"))
    grams = (bound
             .filter(F.size("_t") >= n)
             .select("doc_id", "source", F.explode(F.array_distinct(F.expr(
                 f"transform(sequence(0, size(_t)-{n}),"
                 f" i -> md5(array_join(slice(_t, i+1, {n}), ' ')))")))
                 .alias("g")))
    eval_g = grams.filter(F.col("source") == "src0").select("g").distinct()
    hits = (grams.filter(F.col("source") != "src0")
            .join(F.broadcast(eval_g), "g")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_shared")))
    train = docs.filter(F.col("source") != "src0").select("doc_id", "source")
    return (train.join(hits, "doc_id", "left")
            .select("doc_id", "source",
                    F.coalesce("n_shared", F.lit(0)).cast("long")
                    .alias("n_shared_ngrams"),
                    (F.coalesce("n_shared", F.lit(0)) > 0)
                    .alias("contaminated")))


# --- fixed-budget sequence packing ------------------------------------------

_PACK_BUDGET = 128   # tokens per packed training sequence
_PACK_SHARDS = 8     # independent packing streams per language


@register("p_sequence_pack", f"""
WITH base AS (
  SELECT doc_id, lang, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cum
  FROM base
)
SELECT doc_id, lang, shard, n_tokens,
       CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq,
       (cum - n_tokens) // {_PACK_BUDGET} <> (cum - 1) // {_PACK_BUDGET}
       AS spans_boundary
FROM packed
""")
def p_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: stream documents in doc_id
    order within (lang, shard) and assign each a sequence id and token
    offset against a fixed 128-token budget — the layout step that
    turns a filtered corpus into fixed-length training rows. Documents
    crossing a boundary are flagged (a tokenizer either splits or pads
    there).

    Scale shape: one running-sum window per (lang, shard). The shard
    key exists exactly for scale — packing is order-sensitive, so a
    single per-language stream would serialize; 8 deterministic
    shards per language keep every executor packing independently while
    the layout stays reproducible run-to-run.
    """
    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id", "lang",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    w = (Window.partitionBy("lang", "shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = base.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return packed.select(
        "doc_id", "lang", "shard", "n_tokens",
        start.cast("long").alias("_s"), F.col("cum"),
    ).select(
        "doc_id", "lang", "shard", "n_tokens",
        F.expr(f"_s div {_PACK_BUDGET}").alias("seq_id"),
        (F.col("_s") % _PACK_BUDGET).alias("offset_in_seq"),
        (F.expr(f"_s div {_PACK_BUDGET}")
         != F.expr(f"(cum - 1) div {_PACK_BUDGET}")).alias("spans_boundary"))


# --- stratified sampling -----------------------------------------------------

_STRATUM_CAP = 4  # docs kept per (lang, source) stratum


@register("p_stratified_sample", f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('samp|' || CAST(doc_id AS VARCHAR)), doc_id)
         AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= {_STRATUM_CAP}
""")
def p_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsample: keep at most 4 documents
    per (lang, source) stratum, selected by a salted content-independent
    hash — the mixture-balancing step that stops one crawl dump from
    dominating a training mix, reproducible across runs and engines.

    Scale shape: one row_number window per stratum (rank-by-hash is the
    price of an exact per-stratum cap; an approximate quantile threshold
    would avoid the per-stratum sort when exactness isn't required).
    Strata are (lang, source) — thousands of independent partitions at
    corpus scale, so the sort parallelizes; no joins, no Python.
    """
    docs = _docs(spark, sf_dir)
    h = F.md5(F.concat(F.lit("samp|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id"))
    return (docs.select("doc_id", "lang", "source",
                        F.row_number().over(w).cast("long")
                        .alias("sample_rank"))
            .filter(F.col("sample_rank") <= _STRATUM_CAP))

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape (the point of these at 100 TB):
- exact: one hash + one groupBy — pure shuffle-on-digest;
- MinHash+LSH: shingle → K minhashes (map-side, no shuffle) → band
  buckets → self-join *within buckets only* (the candidate set is tiny
  versus the quadratic pair space) → Jaccard verify on candidates;
- SimHash: per-token hash bit votes aggregated per doc (one groupBy);
- all joins happen on short digest strings, never on document bodies.

MinHash permutations are ``md5(i || '|' || shingle)`` and the signature
is the lexicographic min hex digest — uniform and engine-portable
(identical in any engine with md5, unlike xxhash64 seeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content digest: canonical = min doc_id per group."""
    hashed = df.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return (hashed
            .withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
            .withColumn("canonical_id", F.min("doc_id").over(w))
            .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id")))


def shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Word k-gram shingles per document.

    Repartitions on doc_id first: document tables arrive as few parquet
    splits (bytes-based splitting), but the per-row cost downstream
    (explode × K hashes) is huge — without this the whole shingle plane
    runs on as many cores as there are input files. At 100 TB the same
    spread keeps explode skew bounded by doc length, not file layout.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]))
    return df.repartition(par, "doc_id").select("doc_id", grams.alias("shingles"))


def minhash_signatures(sh: DataFrame, num_hashes: int = 4) -> DataFrame:
    """MinHash signature: per permutation p, min over shingles of
    md5('p|' || shingle). One explode + one groupBy (map-side combine
    keeps the shuffle at one row per doc)."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    aggs = [F.min(F.md5(F.concat(F.lit(f"{p}|"), F.col("s")))).alias(f"h{p}")
            for p in range(num_hashes)]
    return exploded.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: list[list[str]],
                        max_bucket: int | None = None) -> DataFrame:
    """Band the signature, bucket-join, emit distinct candidate pairs
    (doc_a < doc_b). Each band is a list of signature columns whose
    concatenation is the bucket key.

    ``max_bucket`` is the scale guard: a degenerate bucket (boilerplate
    or stop-shingle collisions) of size n contributes n²/2 pairs and
    dominates the pair expansion as pure skew. Buckets larger than the
    cap are dropped — the standard LSH practice (their members still
    pair through their other, more selective bands).

    Shape: NOT a self-join. A self-join on bucket evaluates the whole
    upstream signature subtree once per side (shingle explode + K md5
    minhash groupBy — the expensive part — runs twice); Spark's
    ReusedExchange does not rescue it because the join sides canonicalize
    differently. Instead: ONE groupBy(bucket) collecting the sorted
    member list (bounded by ``max_bucket``), then pair expansion with
    array functions — one shuffle, one subtree evaluation, and the cap
    is a simple ``size(ids)`` filter instead of a count-over-window.
    """
    # one explode instead of a per-band union: the signature subtree is
    # evaluated once, not once per band
    band_keys = [F.concat(F.lit(f"b{i}:"), *[F.col(c) for c in cols])
                 for i, cols in enumerate(bands)]
    buckets = signatures.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("bucket"))
    grouped = buckets.groupBy("bucket").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids"))
    if max_bucket is not None:
        grouped = grouped.filter(F.size("ids") <= max_bucket)
    # expand i<j combinations of the sorted list: doc_a < doc_b for free
    combos = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")))))
    return (grouped.select(F.explode(combos).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct())


def jaccard_verify(pairs: DataFrame, sh: DataFrame,
                   threshold: float | None = None) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage
    after LSH; the pair set is small so the shingle join is cheap)."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    out = (pairs.join(sa, "doc_a").join(sb, "doc_b")
           .select("doc_a", "doc_b",
                   (F.size(F.array_intersect("sh_a", "sh_b")) * 1.0
                    / F.nullif(F.size(F.array_union("sh_a", "sh_b")), F.lit(0))
                    ).alias("jaccard")))
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash-style fingerprint: per distinct token, md5 hex chars vote
    one bit each (char parity); majority sets the bit. Near-identical
    docs agree on most bits."""
    toks = df.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("t"))
    toks = toks.withColumn("h", F.md5(F.col("t")))
    aggs = [F.sum(F.ascii(F.substring(F.col("h"), j + 1, 1)) % 2).alias(f"v{j}")
            for j in range(bits)]
    votes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *aggs)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") * 2 > F.col("n"), F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return votes.select("doc_id", sim.cast("long").alias("simhash"))

"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what an ANN service does over 100 TB of vectors:
- brute-force cosine top-k: exact baseline — one scan, map-side dot
  products, a single top-k reduction (no shuffle of the vectors);
- LSH (random-hyperplane) bucketing: each vector hashes to a bucket by
  the sign pattern of H integer hyperplane projections; the query only
  probes its own bucket — the scale path (bucket column becomes the
  partition key of the vector store).

Determinism: embeddings are quantized to integer milli-units
(floor(x*1000+0.5)) so dot products and norms are exact integers and
the derived cosine doubles are bit-identical across engines (float
summation order never matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..tables import local_df


def quantize(col, scale: int = 1000):
    """float array -> exact integer milli-units (floor(x*scale + 0.5):
    pure double ops, no decimal-rendering round hazards)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * scale + 0.5).cast("long"))


def dot_q(a, b):
    """Exact integer dot product via zip_with + left-fold aggregate."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def brute_force_topk(embeddings: DataFrame, query_vec_id: int = 0,
                     k: int = 10) -> DataFrame:
    """Exact cosine top-k against one stored vector. The 1-row query
    side is broadcast; candidates never shuffle."""
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(quantize(F.col("embedding")).alias("qv")))
    cand = (embeddings.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", quantize(F.col("embedding")).alias("ev")))
    scored = (cand.crossJoin(F.broadcast(q))
              .select("vec_id",
                      (dot_q(F.col("ev"), F.col("qv"))
                       / (F.sqrt(dot_q(F.col("ev"), F.col("ev")))
                          * F.sqrt(dot_q(F.col("qv"), F.col("qv"))))).alias("cosine")))
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(k)


def batch_topk(embeddings: DataFrame, queries: DataFrame,
               k: int = 5) -> DataFrame:
    """Batch exact ANN: cosine top-k for EVERY query vector in ONE
    corpus pass — the shape a pipeline uses to look up thousands of
    queries at once (dedup against a held-out set, hard-negative
    mining) instead of one scan per query.

    Scale shape: the query block is collected and closed over as a
    (Q × dim) int matrix — the standard broadcast-the-queries
    assumption; a query set beyond broadcast size goes through the
    IVF/LSH path instead. Candidates stream through an Arrow-batched
    numpy matmul ((batch × dim) @ (dim × Q)), and each batch emits only
    its PARTIAL top-k per query, so the final exact merge (one window)
    shuffles at most partitions × Q × k scored rows — never the corpus.
    Quantized dots are exact int64, so cosines are bit-identical to
    the SQL oracle's; per-batch ordering uses the same
    (cosine DESC, vec_id) tie-break as the final window, which makes
    the partial top-k lossless."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    qrows = queries.select("vec_id", "embedding").collect()
    qids = np.array([r.vec_id for r in qrows], np.int64)
    qmat = np.stack([
        np.floor(np.asarray(r.embedding, np.float64) * 1000 + 0.5)
        for r in qrows]).astype(np.int64)
    qnorm = np.sqrt((qmat.astype(np.float64) ** 2).sum(axis=1))

    def score_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            dots = (c @ qmat.T).astype(np.float64)
            cnorm = np.sqrt((c.astype(np.float64) ** 2).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (cnorm[:, None] * qnorm[None, :])
            cos = np.nan_to_num(cos, nan=-np.inf)
            vids = pdf["vec_id"].to_numpy(np.int64)
            kk = min(k, len(vids))
            out_q, out_v, out_c = [], [], []
            for j in range(len(qids)):
                top = np.lexsort((vids, -cos[:, j]))[:kk]
                out_q.extend([qids[j]] * len(top))
                out_v.extend(vids[top])
                out_c.extend(cos[top, j])
            yield pd.DataFrame({"q_vec_id": out_q, "vec_id": out_v,
                                "cosine": out_c})

    partial = (embeddings.select("vec_id", "embedding")
               .mapInPandas(score_batch,
                            "q_vec_id long, vec_id long, cosine double"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "vec_id")
    return (partial.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def hyperplane_weight(j: int, i: int) -> int:
    """Deterministic integer hyperplane weights w(plane, dim) in [-3, 3]."""
    return (j * 31 + i * 17) % 7 - 3


def _embedding_dim(embeddings: DataFrame) -> int:
    """Vector dimensionality — one bounded-metadata head() (the vector
    schema's fixed width; never a data-sized collect)."""
    return len(embeddings.select("embedding").head()[0])


def lsh_buckets(embeddings: DataFrame, num_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit j = sign of the
    integer projection onto plane j.

    Computed MAP-SIDE in the same task that read the vector — no
    per-dimension explode (64x row inflation) and no groupBy shuffle
    at all. The projections run as one Arrow-batched integer matmul
    (_bucket_plane_arrow): the equivalent column-expression form
    (num_planes zip_with-folds over dim-element literal arrays)
    compiles into a codegen tree that cost ~11s of first-run planning
    at 8 planes × 64 dims. Exact integer math, bit-identical to the
    per-dimension SQL formulation."""
    return _bucket_plane_arrow(embeddings, num_planes).select(
        "vec_id", "bucket")


def lsh_topk_in_bucket(embeddings: DataFrame, query_vec_id: int = 0,
                       num_planes: int = 8, k: int = 5) -> DataFrame:
    """ANN query: probe only the query's bucket, exact cosine inside."""
    buckets = lsh_buckets(embeddings, num_planes)
    # bucket the query row from a pre-filtered 1-row frame (pure
    # per-row map, identical bucket) instead of re-running the corpus
    # bucket pass and keeping one row (r14)
    qb = lsh_buckets(embeddings.filter(F.col("vec_id") == query_vec_id),
                     num_planes).select(F.col("bucket").alias("qbucket"))
    cands = (buckets.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
             .select("vec_id"))
    # the query's own bucket contains it, so the semi-join keeps the
    # query row brute_force_topk needs
    return brute_force_topk(embeddings.join(cands, "vec_id", "left_semi"),
                            query_vec_id, k)


def _bucket_plane_arrow(embeddings: DataFrame,
                        num_planes: int) -> DataFrame:
    """(bucket, vec_id, quantized vector) in one Arrow-batched pass:
    quantize = floor(x*1000+0.5) exact int64, projections = integer
    matmul against the deterministic hyperplane_weight matrix, bucket
    = packed sign bits — bit-identical to lsh_buckets' column-
    expression form and to the SQL oracle, without its
    planes×dim-literal codegen tree."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        weights = None
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            if weights is None:
                dim = c.shape[1]
                weights = np.array(
                    [[hyperplane_weight(j, i) for i in range(dim)]
                     for j in range(num_planes)], np.int64)
            proj = c @ weights.T
            bucket = (proj >= 0).astype(np.int64) @ (
                np.int64(1) << np.arange(num_planes, dtype=np.int64))
            yield pd.DataFrame({
                "bucket": bucket,
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "ev": list(c)})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        gen, "bucket long, vec_id long, ev array<long>")


def cosine_dup_pairs(embeddings: DataFrame, num_planes: int = 8,
                     threshold: float = 0.35,
                     max_bucket: int = 256) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-gated AND skew-capped.

    Candidate pairs come only from vectors sharing a hyperplane-LSH
    bucket; the exact integer-quantized cosine confirms each candidate.

    Scale shape (mirrors dedup.capped_plane_pairs — the text-LSH path):
    bucket populations are measured with a count-over-window BEFORE any
    collect_list, and buckets above ``max_bucket`` are dropped, so a
    mega-bucket can never materialize a quadratic in-memory pair space.
    The groupBy reuses the window's hash partitioning (one Exchange on
    ``bucket`` total), pair expansion is an in-array slice/transform,
    and the post-expansion plan moves only (vec_a, vec_b, cosine)
    scalars through the dedup shuffle. Default ``num_planes=8`` gives
    256 buckets so expected population is bounded by design, not luck;
    a dropped over-cap bucket is the standard LSH recall/cost trade
    (rerun with more planes, not a bigger cap, as corpus density
    grows)."""
    # bucket AND quantized vector from ONE map-side pass over the
    # corpus — no bucket⋈vector self-join, so the only Exchanges in the
    # whole plan are the bucket shuffle and the final pair dedup. The
    # pass is an Arrow-batched numpy matmul rather than the column-
    # expression form: num_planes folds over dim-element literal
    # weight arrays compile into a codegen tree that cost ~11s of
    # first-run planning at 8 planes × 64 dims (measured), while the
    # (batch × dim) @ (dim × planes) int64 matmul is exact, identical
    # bit-for-bit, and free of that cliff.
    plane = (_bucket_plane_arrow(embeddings, num_planes)
             .select("bucket", F.struct("vec_id", "ev").alias("m")))
    n = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    sized = (plane.withColumn("n", n)
             .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket)))
    # struct sorts by its first field (vec_id, unique), so the i<j
    # in-array expansion yields vec_a < vec_b directly
    grouped = sized.groupBy("bucket").agg(
        F.sort_array(F.collect_list("m")).alias("ms"))
    combos = F.flatten(F.transform(
        F.col("ms"),
        lambda x, i: F.transform(
            F.slice(F.col("ms"), i + F.lit(2), F.size(F.col("ms"))),
            lambda y: F.struct(x["vec_id"].alias("vec_a"),
                               y["vec_id"].alias("vec_b"),
                               x["ev"].alias("ea"),
                               y["ev"].alias("eb")))))
    pairs = (grouped.select(F.explode(combos).alias("p"))
             .select(F.col("p.vec_a").alias("vec_a"),
                     F.col("p.vec_b").alias("vec_b"),
                     (dot_q(F.col("p.ea"), F.col("p.eb"))
                      / (F.sqrt(dot_q(F.col("p.ea"), F.col("p.ea")))
                         * F.sqrt(dot_q(F.col("p.eb"), F.col("p.eb")))))
                     .alias("cosine")))
    return (pairs.filter(F.col("cosine") >= threshold)
            .dropDuplicates(["vec_a", "vec_b"]))


def ivf_centroids(embeddings: DataFrame, n_lists: int = 8) -> DataFrame:
    """IVF coarse quantizer, one k-means-free deterministic pass:
    list g = vec_id % n_lists, centroid = element-wise SUM of member
    vectors (exact longs; cosine is norm-invariant so the un-divided
    sum is the same direction as the mean). Columns: (g, dim, c)."""
    dims = embeddings.select(
        (F.col("vec_id") % n_lists).alias("g"),
        F.posexplode(quantize(F.col("embedding"))).alias("dim", "q"))
    return dims.groupBy("g", "dim").agg(F.sum("q").alias("c"))


def collect_centroids(embeddings: DataFrame, n_lists: int = 8) -> dict:
    """Collect the bounded (n_lists × dim) centroid table driver-side:
    {g: {dim: c}} of exact integer sums."""
    cent_rows = ivf_centroids(embeddings, n_lists).collect()
    by_g: dict[int, dict[int, int]] = {}
    for r in cent_rows:
        by_g.setdefault(int(r.g), {})[int(r.dim)] = int(r.c)
    return by_g


def lloyd_refine(embeddings: DataFrame, n_lists: int = 8,
                 iters: int = 1) -> dict:
    """Spherical k-means (Lloyd) refinement of the IVF quantizer: the
    broadcast-assign-recompute loop. Each iteration broadcasts the
    bounded centroid table inside the assignment UDF closure (one map
    over the vectors, no join), then recomputes per-list integer
    centroid sums with one groupBy. Everything is exact int64, so the
    result is deterministic and the SQL oracle can replay an iteration
    verbatim. Cost per iteration at any scale: one full pass + one
    tiny (n_lists x dim) shuffle — the canonical Spark iterative-ML
    shape (empty lists simply vanish, same as standard k-means).

    Returns the refined {g: {dim: c}} centroid table."""
    by_g = collect_centroids(embeddings, n_lists)
    for _ in range(iters):
        assign = ivf_assign(embeddings, n_lists, centroids=by_g)
        dims = (embeddings.join(assign, "vec_id")
                .select(F.col("list_id").alias("g"),
                        F.posexplode(quantize(F.col("embedding")))
                        .alias("dim", "q")))
        rows = dims.groupBy("g", "dim").agg(F.sum("q").alias("c")).collect()
        by_g = {}
        for r in rows:
            by_g.setdefault(int(r.g), {})[int(r.dim)] = int(r.c)
    return by_g


def rank_lists(qv: list[int], by_g: dict) -> list[int]:
    """Driver-side twin of the assignment order for ONE quantized
    vector: exact integer dots, lists sorted by (cosine desc, g asc) —
    the same order as greatest(struct(cos, -g)) / the oracle's
    row_number. Lets callers resolve a query's probe lists without a
    second pass of the distributed assignment expression."""
    import math
    vv = sum(x * x for x in qv)
    ranked = []
    for g in sorted(by_g):
        c = by_g[g]
        cc = sum(v * v for v in c.values())
        dab = sum(qv[d] * v for d, v in c.items() if d < len(qv))
        cos = (dab / (math.sqrt(vv) * math.sqrt(cc))) if vv and cc \
            else float("-inf")
        ranked.append((-cos, g))
    return [g for _negcos, g in sorted(ranked)]


def assign_one(qv: list[int], by_g: dict) -> int:
    """Max-cosine list for one vector (nprobe=1 special case)."""
    return rank_lists(qv, by_g)[0]


def ivf_assign(embeddings: DataFrame, n_lists: int = 8,
               centroids: dict | None = None) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties -> lowest g).

    The centroid table is bounded metadata (n_lists × dim) — it is
    collected once and broadcast inside the UDF closure, so assignment
    is a PURE MAP over the task that read the vector: no join, no
    window, no per-dimension explode; the only shuffle in the IVF path
    is the centroid build itself."""
    by_g = collect_centroids(embeddings, n_lists) if centroids is None \
        else centroids
    dim = 1 + max(d for dims in by_g.values() for d in dims)
    gs = sorted(by_g)
    import numpy as np

    # centroid matrix (dim x n_lists) + per-list norms, exact int64
    cmat = np.zeros((dim, len(gs)), np.int64)
    for j, g in enumerate(gs):
        for d, c in by_g[g].items():
            cmat[d, j] = c
    cnorm = np.sqrt((cmat.astype(np.float64) ** 2).sum(axis=0))
    glist = np.array(gs, np.int64)

    # Arrow-batched numpy matmul, not per-row zip_with folds: higher-
    # order functions are interpreted (no codegen), costing ~0.5ms/row
    # for 8 lists x 64 dims; one (batch x dim) @ (dim x n_lists)
    # matmul is ~100x cheaper. Quantized dots are exact int64 (< 2^53),
    # so results are bit-identical to the JVM fold; np.argmax takes
    # the FIRST max, i.e. the lowest g on cosine ties — the same order
    # as greatest(struct(cos, -g)) / the oracle's row_number.
    import pandas as pd

    def assign_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            if q.shape[1] < dim:
                q = np.pad(q, ((0, 0), (0, dim - q.shape[1])))
            dots = (q @ cmat).astype(np.float64)
            vnorm = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (vnorm[:, None] * cnorm[None, :])
            cos = np.nan_to_num(cos, nan=-np.inf,
                                posinf=np.inf, neginf=-np.inf)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "list_id": glist[np.argmax(cos, axis=1)]})

    return (embeddings.select("vec_id", "embedding")
            .mapInPandas(assign_batch, "vec_id long, list_id long"))


def ivf_topk(embeddings: DataFrame, query_vec_id: int = 0,
             n_lists: int = 8, k: int = 5, nprobe: int = 1) -> DataFrame:
    """IVF search: exact cosine over the members of the query's
    ``nprobe`` closest inverted lists — the classic recall/cost knob
    (nprobe=1 is fastest; nprobe=n_lists degenerates to brute force).

    The probe lists are resolved DRIVER-SIDE from the collected
    centroid table (exact integer math, same tie order), so the
    distributed assignment expression — 8 interpreted zip_with folds
    per row, the expensive part — runs exactly once, and the
    qlist broadcast join disappears. Measured 4.7s -> 1.9s at sf0.1."""
    import math
    by_g = collect_centroids(embeddings, n_lists)
    qrow = (embeddings.filter(F.col("vec_id") == query_vec_id)
            .select("embedding").first())
    qv = [int(math.floor(float(x) * 1000 + 0.5)) for x in qrow.embedding]
    probe = rank_lists(qv, by_g)[:nprobe]
    cands = (ivf_assign(embeddings, n_lists, centroids=by_g)
             .filter(F.col("list_id").isin(probe)).select("vec_id"))
    return brute_force_topk(embeddings.join(cands, "vec_id", "left_semi"),
                            query_vec_id, k)


def ivf_batch_topk(embeddings: DataFrame, queries: DataFrame,
                   n_lists: int = 8, k: int = 5, nprobe: int = 1) -> DataFrame:
    """IVF search for a whole QUERY BLOCK: every query probes its
    ``nprobe`` closest inverted lists; exact cosine over the probed
    members only.

    Scale shape: one assignment pass over the corpus (Arrow-batched
    matmul, ivf_assign), probe lists resolved driver-side from the
    bounded query block (the same bounded-metadata collect batch_topk
    already does for its broadcast query matrix), then a list_id-keyed
    join — the pair space is query × its-list-members, never query ×
    corpus. Per-pair cosine is an interpreted zip_with fold, bounded
    by list size × nprobe; the Arrow matmul path (batch_topk) remains
    the exact-search fallback when lists degenerate."""
    import math

    by_g = collect_centroids(embeddings, n_lists)
    qrows = queries.select("vec_id", "embedding").collect()
    probes = []
    for r in qrows:
        qv = [int(math.floor(float(x) * 1000 + 0.5)) for x in r.embedding]
        for g in rank_lists(qv, by_g)[:nprobe]:
            probes.append((r.vec_id, g))
    spark = embeddings.sparkSession
    probe_df = local_df(spark, probes, "q_vec_id long, list_id long")

    qids = [r.vec_id for r in qrows]
    assign = ivf_assign(embeddings, n_lists, centroids=by_g)
    cands = (assign.join(F.broadcast(probe_df), "list_id")
             .filter(~F.col("vec_id").isin(qids))
             .select("q_vec_id", "vec_id"))
    ev = embeddings.select("vec_id", quantize(F.col("embedding")).alias("ev"))
    # restrict the broadcast side to the bounded query block BEFORE
    # hinting — broadcasting the unfiltered corpus projection would
    # OOM at scale even though the join key only matches query ids
    eq = (embeddings.filter(F.col("vec_id").isin(qids))
          .select(F.col("vec_id").alias("q_vec_id"),
                  quantize(F.col("embedding")).alias("qv")))
    scored = (cands.join(ev, "vec_id").join(F.broadcast(eq), "q_vec_id")
              .select("q_vec_id", "vec_id",
                      (dot_q(F.col("ev"), F.col("qv"))
                       / (F.sqrt(dot_q(F.col("ev"), F.col("ev")))
                          * F.sqrt(dot_q(F.col("qv"), F.col("qv")))))
                      .alias("cosine")))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """ANN quality eval: per query, |approx-top-k ∩ exact-top-k| / k.

    Generic over any two ranked result frames with (q_vec_id, vec_id,
    rank); queries absent from the approx side score 0 (left join from
    the exact side's query set). Both sides are k-bounded per query,
    so the join input is tiny regardless of corpus size."""
    a = approx.filter(F.col("rank") <= k).select("q_vec_id", "vec_id")
    e = exact.filter(F.col("rank") <= k).select("q_vec_id", "vec_id")
    hits = (e.join(a.withColumn("hit", F.lit(1)), ["q_vec_id", "vec_id"],
                   "left")
            .groupBy("q_vec_id")
            .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                 .cast("long").alias("n_hits")))
    return hits.select("q_vec_id", "n_hits",
                       (F.col("n_hits") / F.lit(float(k))).alias("recall"))


# Product quantization -------------------------------------------------------
#
# The 100 TB vector-store representation: each D-dim float vector is
# compressed to M small codes (one per disjoint dimension subspace),
# ~M bytes instead of 4·D — a 100 TB raw corpus becomes a few TB of
# codes that an ADC scan reads WITHOUT touching the float vectors.
# Deterministic "training" reuses the IVF trick (sub-centroid g = the
# integer sum of quantized member sub-vectors for vec_id % ks == g,
# optionally Lloyd-refined per subspace), so the whole path — codebook,
# encoding, ADC scores — is exact-integer until one final division and
# replays verbatim in the SQL oracle.


def pq_codebook(embeddings: DataFrame, m_sub: int = 4,
                ks: int = 8) -> tuple[dict, int]:
    """Per-subspace codebooks: split the D dims into ``m_sub``
    contiguous subspaces, and in each build ``ks`` sub-centroids as
    element-wise integer SUMS of the quantized sub-vectors of members
    g = vec_id % ks (deterministic seeding; cosine ranking is
    norm-invariant, so the un-divided sum points the same way as the
    mean).

    One explode + one map-side-combining groupBy over the corpus; the
    output is bounded metadata (m_sub × ks × D/m_sub values), returned
    driver-side as ({(m, g): {dim: c}}, D). ``dim`` is the GLOBAL
    dimension index (matches the oracle's ``dims`` view)."""
    dim = len(embeddings.select("embedding").first().embedding)
    sub = dim // m_sub
    rows = (embeddings.select(
                (F.col("vec_id") % ks).alias("g"),
                F.posexplode(quantize(F.col("embedding"))).alias("dim", "q"))
            .groupBy(F.floor(F.col("dim") / sub).cast("int").alias("m"),
                     "g", "dim")
            .agg(F.sum("q").alias("c"))
            .collect())
    cb: dict[tuple[int, int], dict[int, int]] = {}
    for r in rows:
        cb.setdefault((int(r.m), int(r.g)), {})[int(r.dim)] = int(r.c)
    return cb, dim


def _pq_matrices(cb: dict, dim: int, m_sub: int, ks: int):
    """Codebook as numpy: list of (sub × ks) int64 matrices + per-
    (m, g) float64 norms (sqrt of the exact integer norm²)."""
    import numpy as np
    sub = dim // m_sub
    mats, norms = [], []
    for m in range(m_sub):
        c = np.zeros((sub, ks), np.int64)
        for g in range(ks):
            for d, v in cb.get((m, g), {}).items():
                c[d - m * sub, g] = v
        mats.append(c)
        norms.append(np.sqrt((c.astype(np.float64) ** 2).sum(axis=0)))
    return mats, norms


def pq_encode(embeddings: DataFrame, m_sub: int = 4, ks: int = 8,
              codebook: tuple[dict, int] | None = None) -> DataFrame:
    """Encode every vector to its M nearest sub-centroids →
    (vec_id, codes array<int>, code_word long).

    Assignment score is ``dot(sub_vec, c) / ‖c‖`` — the same ranking
    as sub-vector cosine (the ‖sub_vec‖ denominator is constant per
    row) without the 0/0 hazard of an all-zero sub-vector; ties take
    the lowest g (np.argmax first-max ≡ the oracle's row_number
    tie-break). A zero-norm centroid scores -inf and is never chosen.

    Scale shape: the codebook is bounded metadata closed over by an
    Arrow-batched mapInPandas — encoding is a PURE MAP over the
    corpus scan (per batch, m_sub small matmuls), no join, no
    shuffle. ``code_word`` packs the M codes little-endian
    (Σ code_m · ks^m): the compact stored form — log2(ks^M) bits per
    vector instead of 32·D."""
    import numpy as np
    import pandas as pd

    cb, dim = codebook if codebook is not None \
        else pq_codebook(embeddings, m_sub, ks)
    mats, norms = _pq_matrices(cb, dim, m_sub, ks)
    sub = dim // m_sub

    def encode_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            codes = np.zeros((len(q), m_sub), np.int64)
            for m in range(m_sub):
                dots = (q[:, m * sub:(m + 1) * sub] @ mats[m]) \
                    .astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = dots / norms[m][None, :]
                score = np.nan_to_num(score, nan=-np.inf,
                                      posinf=np.inf, neginf=-np.inf)
                codes[:, m] = np.argmax(score, axis=1)
            word = (codes * (ks ** np.arange(m_sub, dtype=np.int64))[None, :]
                    ).sum(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "codes": [row.astype("int32").tolist() for row in codes],
                "code_word": word})

    return (embeddings.select("vec_id", "embedding")
            .mapInPandas(encode_batch,
                         "vec_id long, codes array<int>, code_word long"))


def pq_adc_topk(embeddings: DataFrame, query_vec_id: int = 0,
                m_sub: int = 4, ks: int = 8, k: int = 10,
                codebook: tuple[dict, int] | None = None) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approximate cosine
    between the query and each vector's RECONSTRUCTION (the
    concatenation of its chosen sub-centroids).

    Because subspaces are disjoint, dot(q, recon) = Σ_m qd[m][code_m]
    and ‖recon‖² = Σ_m cc[m][code_m] — both pure lookups. The two
    M×ks tables are computed driver-side from the bounded codebook
    (exact ints) and baked into the plan as array LITERALS indexed by
    ``element_at(lut_m, code_m + 1)``: the whole ADC scan is
    whole-stage-codegen arithmetic over the codes column — no join,
    no shuffle, no floats read — and the top-k is a map-side-partial
    TakeOrdered. THIS is the plan that survives 100 TB: the scan
    reads ~M bytes per vector.

    adc_cosine = Σqd / (‖q‖·√Σcc), exact-integer numerator and
    radicands, one final double division (bit-identical to the SQL
    oracle); a zero reconstruction scores -1e308."""
    import math

    cb, dim = codebook if codebook is not None \
        else pq_codebook(embeddings, m_sub, ks)
    codes = pq_encode(embeddings, m_sub, ks, codebook=(cb, dim))

    qrow = (embeddings.filter(F.col("vec_id") == query_vec_id)
            .select("embedding").first())
    qv = [int(math.floor(float(x) * 1000 + 0.5)) for x in qrow.embedding]
    return (_adc_scored(codes, qv, cb, m_sub, ks)
            .filter(F.col("vec_id") != query_vec_id)
            .orderBy(F.desc("adc_cosine"), "vec_id").limit(k))


def pq_refine_topk(embeddings: DataFrame, query_vec_id: int = 0,
                   m_sub: int = 4, ks: int = 8, shortlist: int = 50,
                   k: int = 10) -> DataFrame:
    """PQ shortlist + EXACT rerank — the standard refine step: the
    compressed ADC scan (codes-only, no shuffle) nominates a
    ``shortlist`` of candidates, and only those few read their full
    float vectors for an exact cosine rerank.

    Scale shape: the 100 TB corpus is touched once through the
    ~M-bytes-per-vector ADC scan; the refine join is a broadcast
    semi-join against the k-bounded shortlist, so the full-precision
    column is read for ``shortlist`` rows, never the corpus. This is
    the accuracy/IO trade every production PQ index ships."""
    short = (pq_adc_topk(embeddings, query_vec_id, m_sub, ks,
                         k=shortlist)
             .select("vec_id"))
    cand = embeddings.join(F.broadcast(short), "vec_id", "left_semi")
    qrow = embeddings.filter(F.col("vec_id") == query_vec_id)
    return brute_force_topk(cand.unionByName(qrow), query_vec_id, k)


def hard_negatives(embeddings: DataFrame, queries: DataFrame,
                   k: int = 5) -> DataFrame:
    """Hard-negative mining: for every query vector, the k most
    similar corpus vectors with a DIFFERENT label — the contrastive-
    training data op (the negatives that are hardest to distinguish
    are the ones worth training on).

    Same scale shape as batch_topk — broadcast (Q × dim) query matrix
    + query labels, Arrow-batched matmul over the corpus scan,
    per-batch partial top-k — with same-label candidates masked to
    -inf BEFORE the partial top-k, so the mask never costs a second
    pass and the partial reduction stays lossless. Final exact merge
    is one window over partitions × Q × k rows."""
    import numpy as np
    import pandas as pd

    qrows = queries.select("vec_id", "embedding", "label").collect()
    qids = np.array([r.vec_id for r in qrows], np.int64)
    qlab = np.array([r.label for r in qrows], np.int64)
    qmat = np.stack([
        np.floor(np.asarray(r.embedding, np.float64) * 1000 + 0.5)
        for r in qrows]).astype(np.int64)
    qnorm = np.sqrt((qmat.astype(np.float64) ** 2).sum(axis=1))

    def score_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            dots = (c @ qmat.T).astype(np.float64)
            cnorm = np.sqrt((c.astype(np.float64) ** 2).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (cnorm[:, None] * qnorm[None, :])
            cos = np.nan_to_num(cos, nan=-np.inf)
            clab = pdf["label"].to_numpy(np.int64)
            cos[clab[:, None] == qlab[None, :]] = -np.inf  # mask positives
            vids = pdf["vec_id"].to_numpy(np.int64)
            kk = min(k, len(vids))
            out_q, out_v, out_c = [], [], []
            for j in range(len(qids)):
                top = np.lexsort((vids, -cos[:, j]))[:kk]
                top = top[np.isfinite(cos[top, j])]
                out_q.extend([qids[j]] * len(top))
                out_v.extend(vids[top])
                out_c.extend(cos[top, j])
            yield pd.DataFrame({"q_vec_id": out_q, "vec_id": out_v,
                                "cosine": out_c})

    scored = (embeddings.select("vec_id", "embedding", "label")
              .mapInPandas(score_batch,
                           "q_vec_id long, vec_id long, cosine double"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def lsh_multiprobe_topk(embeddings: DataFrame, query_vec_id: int = 0,
                        num_planes: int = 8, k: int = 5) -> DataFrame:
    """Multi-probe LSH: probe the query's bucket AND every bucket at
    Hamming distance 1 (one sign bit flipped) — the standard recall
    lever that avoids building more hash tables. num_planes+1 probed
    buckets ⇒ candidate recall strictly dominates single-probe; the
    probe set is a bounded driver-side literal, so the candidate scan
    is one IN filter on the bucket column (partition key at scale),
    never a join."""
    buckets = lsh_buckets(embeddings, num_planes)
    # bucket the query row from a pre-filtered 1-row frame (r14): the
    # filter cannot push below the Arrow bucket map, so the old
    # buckets.filter(...).first() scanned the bucketed corpus to keep
    # one row
    qrow = lsh_buckets(embeddings.filter(F.col("vec_id") == query_vec_id),
                       num_planes).first()
    qb = int(qrow.bucket)
    probes = [qb] + [qb ^ (1 << j) for j in range(num_planes)]
    cands = (buckets.filter(F.col("bucket").isin(probes))
             .select("vec_id"))
    return brute_force_topk(embeddings.join(cands, "vec_id", "left_semi"),
                            query_vec_id, k)


def _adc_scored(codes: DataFrame, qv: list[int], cb: dict,
                m_sub: int, ks: int) -> DataFrame:
    """(vec_id, adc_cosine) from a codes frame: the shared ADC scorer
    behind pq_adc_topk and ivfpq_topk (lookup-table array literals,
    whole-stage codegen, no shuffle)."""
    import math

    qq = sum(x * x for x in qv)
    qd = [[sum(qv[d] * c for d, c in cb.get((m, g), {}).items())
           for g in range(ks)] for m in range(m_sub)]
    cc = [[sum(c * c for c in cb.get((m, g), {}).values())
           for g in range(ks)] for m in range(m_sub)]

    def lut(table, m):
        arr = F.array(*[F.lit(int(v)) for v in table[m]])
        return F.element_at(arr, F.col("codes")[m].cast("int") + 1)

    num = sum((lut(qd, m) for m in range(m_sub)), F.lit(0).cast("long"))
    rr = sum((lut(cc, m) for m in range(m_sub)), F.lit(0).cast("long"))
    score = F.when(rr > 0, num / (F.lit(math.sqrt(qq)) * F.sqrt(rr))) \
        .otherwise(F.lit(-1e308))
    return codes.select("vec_id", score.alias("adc_cosine"))


def ivfpq_topk(embeddings: DataFrame, query_vec_id: int = 0,
               n_lists: int = 8, nprobe: int = 2, m_sub: int = 4,
               ks: int = 8, k: int = 10) -> DataFrame:
    """IVF-PQ search — the FAISS-style index shape for web-scale
    vector stores: the IVF coarse quantizer prunes the corpus to
    ``nprobe`` inverted lists, and the survivors are scored from
    their PQ CODES via ADC lookups (this implementation encodes raw
    vectors with the global codebook rather than per-list residuals —
    the residual refinement changes accuracy, not the plan shape).

    At scale the store keeps (list_id, code_word) per vector: the
    query reads nprobe/n_lists of the corpus and only M bytes per
    read vector; probe lists resolve driver-side from the bounded
    centroid table, candidate pruning is one IN filter feeding a
    left-semi join keyed on vec_id, scoring is codegen lookups, and
    the top-k is a map-side TakeOrdered."""
    import math

    by_g = collect_centroids(embeddings, n_lists)
    qrow = (embeddings.filter(F.col("vec_id") == query_vec_id)
            .select("embedding").first())
    qv = [int(math.floor(float(x) * 1000 + 0.5)) for x in qrow.embedding]
    probe = rank_lists(qv, by_g)[:nprobe]
    cands = (ivf_assign(embeddings, n_lists, centroids=by_g)
             .filter(F.col("list_id").isin(probe))
             .select("vec_id"))
    cb, dim = pq_codebook(embeddings, m_sub, ks)
    codes = pq_encode(embeddings, m_sub, ks, codebook=(cb, dim))
    scored = _adc_scored(codes.join(cands, "vec_id", "left_semi"),
                         qv, cb, m_sub, ks)
    return (scored.filter(F.col("vec_id") != query_vec_id)
            .orderBy(F.desc("adc_cosine"), "vec_id").limit(k))


def mips_topk(embeddings: DataFrame, query_vec_id: int = 0,
              k: int = 10) -> DataFrame:
    """Maximum-inner-product top-k (un-normalized dot product — the
    retrieval scoring for embeddings whose NORM carries signal, e.g.
    DPR-style relevance or popularity-scaled item vectors, where
    cosine's normalization throws that signal away). Same
    broadcast-query / no-candidate-shuffle shape as
    brute_force_topk; scores are exact int64 dot products of the
    quantized vectors (no float reduction order in play at all)."""
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(quantize(F.col("embedding")).alias("qv")))
    cand = (embeddings.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", quantize(F.col("embedding")).alias("ev")))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id",
                    dot_q(F.col("ev"), F.col("qv")).cast("long")
                    .alias("dot"))
            .orderBy(F.desc("dot"), "vec_id").limit(k))


def filtered_topk(embeddings: DataFrame, query_vec_id: int = 0,
                  k: int = 10, pred=None) -> DataFrame:
    """Metadata-filtered exact cosine top-k — the 'filtered vector
    search' every production vector store ships (only candidates
    passing an attribute predicate compete). The predicate applies
    BEFORE scoring, so Catalyst pushes it to the scan and the
    dot-product work shrinks with the selectivity — pre-filtering,
    not the post-filter-then-hope-k-survive shortcut, which at low
    selectivity silently returns fewer than k."""
    cand = embeddings.filter(F.col("vec_id") != query_vec_id)
    if pred is not None:
        cand = cand.filter(pred)
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(quantize(F.col("embedding")).alias("qv")))
    cand = cand.select("vec_id", quantize(F.col("embedding")).alias("ev"))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id",
                    (dot_q(F.col("ev"), F.col("qv"))
                     / (F.sqrt(dot_q(F.col("ev"), F.col("ev")))
                        * F.sqrt(dot_q(F.col("qv"), F.col("qv")))))
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), "vec_id").limit(k))


# -- SQ8 scalar quantization (round 9) ----------------------------------------

def sq8_train(embeddings: DataFrame) -> tuple[list[int], list[int]]:
    """Train per-dimension SQ8 ranges (faiss ScalarQuantizer QT_8bit):
    (mins, spans) on the exact milli-int grid, spans floored at 1 so a
    constant dimension encodes to code 0 instead of dividing by zero.
    One posexplode + a 64-key map-side-combined groupBy; the 2×dim
    ints collect to the driver (the codebook — same shape as PQ's)."""
    dim = _embedding_dim(embeddings)
    agg = (embeddings
           .select(F.posexplode(quantize(F.col("embedding")))
                   .alias("j", "v"))
           .groupBy("j").agg(F.min("v").alias("mn"), F.max("v").alias("mx")))
    rows = {r.j: (r.mn, r.mx) for r in agg.collect()}
    mins = [int(rows[j][0]) for j in range(dim)]
    spans = [max(1, int(rows[j][1]) - int(rows[j][0])) for j in range(dim)]
    return mins, spans


def sq8_codes(embeddings: DataFrame, mins: list[int],
              spans: list[int]) -> DataFrame:
    """Encode each vector to one uint8 code per dimension:
    ``code_j = floor((v_j − mn_j)·255 / span_j)`` — exact (the double
    intermediate stays < 2^53). 64 bytes/vector instead of 256 —
    the 4× compression tier between raw and PQ."""
    mins_arr = F.array(*[F.lit(m) for m in mins])
    spans_arr = F.array(*[F.lit(s) for s in spans])
    v = quantize(F.col("embedding"))
    codes = F.zip_with(
        F.zip_with(v, mins_arr, lambda x, m: x - m),
        spans_arr,
        lambda d, s: (d * 255 / s).cast("long"))
    return embeddings.select("vec_id", codes.alias("codes"))


def sq8_topk(embeddings: DataFrame, query_vec_id: int = 0,
             k: int = 10) -> DataFrame:
    """SQ8 asymmetric top-k: the raw query scores against RECONSTRUCTED
    candidates — ``v̂_j·255 = mn_j·255 + code_j·span_j`` — by exact
    int64 squared L2 distance (everything cross-multiplied by 255, so
    no fraction ever appears; d² terms stay < 2^52·dim).

    Scale shape: train is one tiny groupBy; encode + distance are pure
    codegen array ops over the codes column (no shuffle); top-k is a
    map-side TakeOrdered. The same plan as pq_adc_topk one compression
    tier up."""
    mins, spans = sq8_train(embeddings)
    qrow = (embeddings.filter(F.col("vec_id") == query_vec_id)
            .select(quantize(F.col("embedding")).alias("qv"))
            .collect())
    q255 = [int(x) * 255 for x in qrow[0].qv]
    q_arr = F.array(*[F.lit(x) for x in q255])
    mins255_arr = F.array(*[F.lit(m * 255) for m in mins])
    spans_arr = F.array(*[F.lit(s) for s in spans])
    codes = sq8_codes(embeddings.filter(F.col("vec_id") != query_vec_id),
                      mins, spans)
    recon = F.zip_with(
        F.zip_with(F.col("codes"), spans_arr, lambda c, s: c * s),
        mins255_arr, lambda a, m: a + m)
    diff = F.zip_with(q_arr, recon, lambda q, r: q - r)
    d2 = F.aggregate(diff, F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    return (codes.select("vec_id", d2.alias("d2"))
            .orderBy("d2", "vec_id").limit(k))


def bq_code(col):
    """Binary quantization: pack each dimension's SIGN BIT (of the
    milli-quantized value, >= 0 -> 1) into one int64 word — 64-dim
    vectors compress 256 bytes -> 8 bytes, the 32x memory cut that
    makes exhaustive candidate scans cheap (the modern vector-DB
    'binary quantization + rescore' recipe, e.g. FAISS's
    IndexBinaryFlat front-end).

    The shift amount is a column (the dimension index), so the house
    power-of-two array-literal + element_at pattern stands in for
    shiftleft (which requires a literal shift — see functions/bloom)."""
    # bit 63 as Long.MIN_VALUE: 1 << 63 overflows a signed lit, and
    # sum-packing disjoint bits with -2^63 yields the correct two's-
    # complement bit pattern (sum == bitwise OR on disjoint bits)
    pow2 = F.array(*[F.lit(-(1 << 63) if i == 63 else 1 << i)
                     .cast("long") for i in range(64)])
    signed = F.transform(
        quantize(col),
        lambda x, i: F.when(x >= 0, F.element_at(pow2, i + F.lit(1)))
        .otherwise(F.lit(0).cast("long")))
    return F.aggregate(signed, F.lit(0).cast("long"),
                       lambda acc, x: acc + x)


def bq_refine_topk(embeddings: DataFrame, query_vec_id: int = 0,
                   k: int = 10, rerank: int = 50) -> DataFrame:
    """Binary-quantized ANN: Hamming distance on the 8-byte sign codes
    (bit_count of XOR — one JVM instruction per candidate) shortlists
    ``rerank`` candidates, then the EXACT integer-cosine kernel
    rescores the shortlist (pq_refine_topk's two-stage shape).

    Scale: the Hamming scan reads 8 bytes/vector from a codes-only
    projection (column pruning keeps the float arrays unread), the
    shortlist is a bounded top-``rerank`` TakeOrdered, and only
    ``rerank`` float vectors are ever touched. Ties break on vec_id at
    both stages so both engines replay the identical shortlist."""
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(bq_code(F.col("embedding")).alias("qcode"),
                 quantize(F.col("embedding")).alias("qv")))
    codes = (embeddings.filter(F.col("vec_id") != query_vec_id)
             .select("vec_id", bq_code(F.col("embedding")).alias("code")))
    short = (codes.crossJoin(F.broadcast(q))
             .select("vec_id",
                     F.bit_count(F.col("code").bitwiseXOR(F.col("qcode")))
                     .cast("long").alias("hamming"))
             .orderBy("hamming", "vec_id").limit(rerank))
    cand = (embeddings
            .select("vec_id", quantize(F.col("embedding")).alias("ev"))
            .join(short, "vec_id"))
    scored = (cand.crossJoin(F.broadcast(q.select("qv")))
              .select("vec_id", "hamming",
                      (dot_q(F.col("ev"), F.col("qv"))
                       / (F.sqrt(dot_q(F.col("ev"), F.col("ev")))
                          * F.sqrt(dot_q(F.col("qv"), F.col("qv")))))
                      .alias("cosine")))
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(k)


def mmr_topk(embeddings: DataFrame, query_vec_id: int = 0,
             k: int = 5, shortlist: int = 30,
             lam: float = 0.5) -> DataFrame:
    """Maximal Marginal Relevance diversified rerank (Carbonell &
    Goldstein 1998): greedily pick k results maximizing
    lam*cos(q,d) - (1-lam)*max_{s in picked} cos(d,s) over a bounded
    relevance shortlist — relevance alone returns near-duplicates;
    MMR trades it against novelty (the standard search/RAG reranker).

    Distribution contract: the greedy loop is INHERENTLY sequential
    (pick i depends on picks 1..i-1), so it runs as k bounded rounds
    over the ``shortlist``-row candidate frame — each round one
    1-row argmax collect (house bounded-collect rule), never a scan
    of the full vector table; the full table is touched once, by the
    shortlist top-N. Pairwise candidate cosines are precomputed once
    (shortlist² rows, bounded) and checkpointed.

    Both the relevance and diversity cosines use the identical
    dot/(sqrt*sqrt) shape as the DuckDB oracle, and every argmax
    tie-breaks on vec_id, so the two engines replay the same greedy
    trajectory bit-for-bit."""
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(quantize(F.col("embedding")).alias("qv")))
    ev = embeddings.select("vec_id",
                           quantize(F.col("embedding")).alias("v"))
    cos_q = (dot_q(F.col("v"), F.col("qv"))
             / (F.sqrt(dot_q(F.col("v"), F.col("v")))
                * F.sqrt(dot_q(F.col("qv"), F.col("qv")))))
    cand = (ev.filter(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(q))
            .select("vec_id", "v", cos_q.alias("cq"))
            .orderBy(F.desc("cq"), "vec_id").limit(shortlist)
            .localCheckpoint(eager=True))
    a = cand.select(F.col("vec_id").alias("va"), F.col("v").alias("ea"))
    b = cand.select(F.col("vec_id").alias("vb"), F.col("v").alias("eb"))
    cos_ab = (dot_q(F.col("ea"), F.col("eb"))
              / (F.sqrt(dot_q(F.col("ea"), F.col("ea")))
                 * F.sqrt(dot_q(F.col("eb"), F.col("eb")))))
    pc = (a.join(b, F.col("va") != F.col("vb"))
          .select("va", "vb", cos_ab.alias("cs"))
          .localCheckpoint(eager=True))
    spark = embeddings.sparkSession
    schema = ("rank long, vec_id long, cosine double, "
              "max_sim_prior double")
    first = (cand.orderBy(F.desc("cq"), "vec_id").limit(1)
             .select("vec_id", "cq").collect())
    if not first:  # pool held only the query vector (or nothing)
        return local_df(spark, [], schema)
    picked = [(1, first[0]["vec_id"], first[0]["cq"], 0.0)]
    for rank in range(2, k + 1):
        sel = [p[1] for p in picked]
        msim = (pc.filter(F.col("vb").isin(sel))
                .groupBy("va").agg(F.max("cs").alias("msim")))
        score = F.lit(lam) * F.col("cq") - F.lit(1.0 - lam) * F.col("msim")
        nxt = (cand.filter(~F.col("vec_id").isin(sel))
               .join(msim, F.col("va") == F.col("vec_id"))
               .select("vec_id", "cq", "msim", score.alias("mmr"))
               .orderBy(F.desc("mmr"), "vec_id").limit(1).collect())
        if not nxt:  # pool exhausted before k picks — return shorter
            break
        picked.append((rank, nxt[0]["vec_id"], nxt[0]["cq"],
                       nxt[0]["msim"]))
    return local_df(spark, picked, schema)


def cluster_silhouette(embeddings: DataFrame,
                       label_col: str = "label") -> DataFrame:
    """Per-vector SIMPLIFIED silhouette inputs (Rousseeuw 1987;
    the "simplified silhouette" of Hruschka et al. 2004 replaces the
    O(n^2) mean pairwise distances with distances TO CENTROIDS —
    the form every large-scale clustering evaluation actually runs):
    a2 = squared L2 to the OWN cluster's centroid, b2 = min squared
    L2 to any OTHER centroid, b_label = that nearest other cluster.

    Exactness: vectors quantize to integer milli-units (the engine's
    ANN convention) and each centroid is ROUNDED to an integer
    vector (half away from zero — CASE arithmetic both engines floor
    identically), so every distance is an exact int64 and the
    cross-cluster argmin has no float ties: np.argmin takes the
    first minimum over label-ascending columns, the same order as
    the oracle's min(d2 * 100 + lbl) pack.

    Scale shape: the centroid table is bounded metadata
    (n_clusters x dim) — collected once, closed over by an
    Arrow-batched int64 numpy kernel (the ivf_assign pattern), so
    scoring is a PURE MAP over the vector scan: no join, no
    explode, no shuffle beyond the centroid build's map-side
    partial aggregate."""
    import numpy as np
    import pandas as pd

    dims = embeddings.select(
        F.col(label_col).cast("long").alias("lbl"),
        F.posexplode(quantize(F.col("embedding"))).alias("dim", "qval"))
    stats = (dims.groupBy("lbl", "dim")
             .agg(F.sum("qval").alias("s"),
                  F.count(F.lit(1)).alias("n")).collect())
    labels = sorted({r.lbl for r in stats})
    dim = 1 + max(r.dim for r in stats)
    lidx = {g: j for j, g in enumerate(labels)}
    cmat = np.zeros((len(labels), dim), np.int64)
    for r in stats:
        s, n = int(r.s), int(r.n)
        # round half away from zero, in pure integer arithmetic —
        # the oracle's CASE mirrors this exactly
        cq = (2 * s + n) // (2 * n) if s >= 0 else -((2 * -s + n) // (2 * n))
        cmat[lidx[r.lbl], r.dim] = cq
    cnorm2 = (cmat * cmat).sum(axis=1)          # int64 exact
    larr = np.array(labels, np.int64)

    def score_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack([
                np.floor(np.asarray(e, np.float64) * 1000 + 0.5)
                for e in pdf["embedding"]]).astype(np.int64)
            if q.shape[1] < dim:
                q = np.pad(q, ((0, 0), (0, dim - q.shape[1])))
            # d2[i, j] = ||q_i||^2 - 2 q_i . c_j + ||c_j||^2, all int64
            d2 = ((q * q).sum(axis=1)[:, None]
                  - 2 * (q @ cmat.T) + cnorm2[None, :])
            own = np.array([lidx[int(g)] for g in pdf[label_col]],
                           np.int64)
            rows = np.arange(len(own))
            a2 = d2[rows, own]
            masked = d2.copy()
            masked[rows, own] = np.iinfo(np.int64).max
            bj = np.argmin(masked, axis=1)      # first min = lowest lbl
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf[label_col].astype("int64"),
                "a2": a2, "b2": masked[rows, bj],
                "b_label": larr[bj]})

    return (embeddings.select("vec_id", "embedding", label_col)
            .mapInPandas(score_batch,
                         "vec_id long, label long, a2 long, b2 long, "
                         "b_label long"))

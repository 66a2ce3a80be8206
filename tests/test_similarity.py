"""Similarity-search operator tests: IVF invariants, LSH-gated
cosine dedup, brute-force ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.functions import similarity
from cube_builder_spark.tables import load_tables


def _embs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def test_ivf_assign_total_and_single_list(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    n = embs.count()
    assign = similarity.ivf_assign(embs, n_lists=8)
    # every vector lands in exactly one inverted list
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    lists = [r.list_id for r in assign.select("list_id").distinct().collect()]
    assert all(0 <= g < 8 for g in lists)


def test_ivf_topk_subset_of_bruteforce_order(spark, sf_dir):
    """IVF@nprobe=1 results are exact cosines, ranked consistently
    with the brute-force ordering restricted to the probed list."""
    embs = _embs(spark, sf_dir)
    ivf = similarity.ivf_topk(embs, query_vec_id=0, n_lists=8, k=5).collect()
    brute = {r.vec_id: r.cosine
             for r in similarity.brute_force_topk(embs, 0, k=10**6).collect()}
    assert len(ivf) == 5
    # cosines must agree exactly with the brute-force scores
    for r in ivf:
        assert abs(brute[r.vec_id] - r.cosine) == 0.0
    # and be sorted descending
    cos = [r.cosine for r in ivf]
    assert cos == sorted(cos, reverse=True)


def test_cosine_dup_pairs_are_bucket_gated_and_thresholded(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    pairs = similarity.cosine_dup_pairs(embs, num_planes=4, threshold=0.35)
    rows = pairs.collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.cosine >= 0.35 for r in rows)
    buckets = {r.vec_id: r.bucket
               for r in similarity.lsh_buckets(embs, 4).collect()}
    assert all(buckets[r.vec_a] == buckets[r.vec_b] for r in rows)


def test_lloyd_refine_improves_objective(spark, sf_dir):
    """One spherical-k-means iteration must not decrease the total
    cosine-to-assigned-centroid objective (exact Lloyd monotonicity)."""
    import numpy as np
    from cube_builder_spark.functions import similarity
    from cube_builder_spark.tables import load_tables

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    vecs = {int(r.vec_id): np.floor(np.asarray(r.embedding, np.float64)
                                    * 1000 + 0.5).astype(np.int64)
            for r in emb.collect()}

    def objective(by_g):
        total = 0.0
        for v in vecs.values():
            vn = np.sqrt(float(v @ v))
            best = -np.inf
            for g in sorted(by_g):
                c = np.zeros(len(v), np.int64)
                for d, val in by_g[g].items():
                    c[d] = val
                cn = np.sqrt(float(c @ c))
                if vn and cn:
                    best = max(best, float(v @ c) / (vn * cn))
            total += best
        return total

    by0 = similarity.collect_centroids(emb, n_lists=8)
    by1 = similarity.lloyd_refine(emb, n_lists=8, iters=1)
    assert objective(by1) >= objective(by0) - 1e-9


def test_recall_eval_bounds_and_self_recall(spark, sf_dir):
    from cube_builder_spark.ann_queries import a_ann_recall_eval
    from cube_builder_spark.tables import load_tables

    out = a_ann_recall_eval(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r.n_hits <= 5
        assert r.recall == r.n_hits / 5.0
    # exact-vs-exact recall is 1.0 by definition
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    cands = emb.filter(F.col("vec_id") % 50 != 0)
    exact = similarity.batch_topk(cands, queries, k=5)
    perfect = similarity.recall_at_k(exact, exact, k=5).collect()
    assert perfect and all(r.recall == 1.0 for r in perfect)


def test_ivf_batch_topk_matches_single_query_path(spark, sf_dir):
    from cube_builder_spark.tables import load_tables
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    single = {r.vec_id for r in
              similarity.ivf_topk(emb, query_vec_id=0, n_lists=8, k=5).collect()}
    batch = {r.vec_id for r in
             similarity.ivf_batch_topk(
                 emb, emb.filter(F.col("vec_id") == 0), n_lists=8, k=5)
             .collect()}
    assert single == batch


def test_pq_encode_shape_and_packing(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    n = embs.count()
    cb, dim = similarity.pq_codebook(embs, m_sub=4, ks=8)
    assert dim == 64
    # bounded metadata: at most m_sub*ks sub-centroids, 16 dims each
    assert len(cb) <= 4 * 8
    assert all(len(dims) == 16 for dims in cb.values())
    codes = similarity.pq_encode(embs, m_sub=4, ks=8,
                                 codebook=(cb, dim)).collect()
    assert len(codes) == n
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)
        # little-endian packing round-trips
        assert r.code_word == sum(c * 8 ** m for m, c in enumerate(r.codes))
        assert 0 <= r.code_word < 8 ** 4


def test_pq_adc_scan_has_no_shuffle(spark, sf_dir):
    """The ADC scoring scan must be a pure map + TakeOrdered: at 100 TB
    a shuffle of per-vector scores would dominate; the lookup-table
    plan keeps everything map-side until the k-bounded reduction."""
    embs = _embs(spark, sf_dir)
    top = similarity.pq_adc_topk(embs, query_vec_id=0, k=10)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_pq_adc_scores_are_true_cosines_of_reconstruction(spark, sf_dir):
    """|ADC score| <= 1 (Cauchy-Schwarz on q·recon), descending order,
    deterministic across runs."""
    embs = _embs(spark, sf_dir)
    a = similarity.pq_adc_topk(embs, query_vec_id=0, k=10).collect()
    b = similarity.pq_adc_topk(embs, query_vec_id=0, k=10).collect()
    assert [(r.vec_id, r.adc_cosine) for r in a] \
        == [(r.vec_id, r.adc_cosine) for r in b]
    scores = [r.adc_cosine for r in a]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)
    assert all(r.vec_id != 0 for r in a)


def test_hard_negatives_exclude_query_label(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    cands = embs.filter(F.col("vec_id") % 50 != 0)
    out = similarity.hard_negatives(cands, queries, k=5).collect()
    labels = {r.vec_id: r.label
              for r in embs.select("vec_id", "label").collect()}
    assert out
    per_q = {}
    for r in out:
        # a hard negative never shares the query's label
        assert labels[r.vec_id] != labels[r.q_vec_id]
        per_q.setdefault(r.q_vec_id, []).append(r)
    for q, rows in per_q.items():
        assert len(rows) <= 5
        cos = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe's, so
    its top-k cosine at each rank is >= single-probe's."""
    embs = _embs(spark, sf_dir)
    single = similarity.lsh_topk_in_bucket(embs, 0, num_planes=8, k=5)
    multi = similarity.lsh_multiprobe_topk(embs, 0, num_planes=8, k=5)
    s = [r.cosine for r in single.collect()]
    m = [r.cosine for r in multi.collect()]
    assert len(m) >= len(s)
    for i in range(len(s)):
        assert m[i] >= s[i]


def test_ivfpq_candidates_subset_of_probed_lists(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    out = similarity.ivfpq_topk(embs, 0, n_lists=8, nprobe=2, k=10)
    rows = out.collect()
    assert rows and all(r.vec_id != 0 for r in rows)
    by_g = similarity.collect_centroids(embs, n_lists=8)
    import math
    q = embs.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [int(math.floor(float(x) * 1000 + 0.5)) for x in q.embedding]
    probe = set(similarity.rank_lists(qv, by_g)[:2])
    assign = {r.vec_id: r.list_id
              for r in similarity.ivf_assign(embs, 8, by_g).collect()}
    assert all(assign[r.vec_id] in probe for r in rows)



def test_sq8_recall_and_exactness(spark, sf_dir):
    """SQ8 reconstructed-L2 top-10 recovers the exact-L2 top-10 on the
    fixture corpus (8-bit per-dim quantization loses almost nothing at
    64 dims), and zero-span dimensions encode to code 0 without
    dividing by zero."""
    from pyspark.sql import functions as F
    from cube_builder_spark.functions import similarity
    from cube_builder_spark.tables import load_tables

    embs = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    approx = {r.vec_id for r in similarity.sq8_topk(embs, 0, 10).collect()}
    q = (embs.filter(F.col("vec_id") == 0)
         .select(similarity.quantize(F.col("embedding")).alias("qv")))
    cand = (embs.filter(F.col("vec_id") != 0)
            .select("vec_id",
                    similarity.quantize(F.col("embedding")).alias("ev")))
    d2 = F.aggregate(
        F.zip_with(F.col("ev"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    exact = {r.vec_id for r in
             cand.crossJoin(F.broadcast(q)).select("vec_id", d2.alias("d2"))
             .orderBy("d2", "vec_id").limit(10).collect()}
    assert len(approx & exact) >= 9        # >= 0.9 recall, deterministic

    # constant dimension: span clamps to 1, codes are 0, no crash
    const = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)],
        "vec_id long, embedding array<float>")
    mins, spans = similarity.sq8_train(const)
    assert spans[0] == 1 and mins[0] == 1000
    codes = {r.vec_id: list(r.codes)
             for r in similarity.sq8_codes(const, mins, spans).collect()}
    assert all(c[0] == 0 for c in codes.values())
    assert codes[4][1] == 255              # max value hits full code


def test_deletion_neighborhood_matches_naive_levenshtein(spark):
    """FastSS deletion-neighborhood pairs == naive all-pairs
    levenshtein==1 on a small-alphabet corpus engineered for variant
    collisions (substitution / insertion / deletion / ed-2 decoys /
    duplicates-after-distinct)."""
    import itertools

    from cube_builder_spark.functions.dedup import (
        deletion_neighborhood_pairs)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    corpus = sorted({
        "".join(c) for n in (1, 2, 3, 4)
        for c in itertools.product("abc", repeat=n)} | {"", "abcd", "dcba"})
    corpus = [c for c in corpus if c]          # empty string excluded
    want = sorted((a, b) for a, b in itertools.combinations(corpus, 2)
                  if lev(a, b) == 1)
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = sorted((r["a"], r["b"]) for r in
                 deletion_neighborhood_pairs(df, "s").collect())
    assert got == want and len(want) > 50


def test_mmr_diversifies_near_duplicate_results(spark):
    """A clump of near-identical high-relevance vectors: plain top-k
    returns the whole clump; MMR must pick ONE clump member then
    reach for diverse lower-relevance vectors."""
    from cube_builder_spark.functions.similarity import (brute_force_topk,
                                                         mmr_topk)

    def vec(*xs):
        v = [0.0] * 8
        for i, x in zip(range(0, 8, 2), xs):
            v[i], v[i + 1] = x, x / 2
        return v

    rows = [(0, [1.0, 0.5, 0.2, 0.1, 0.0, 0.0, 0.0, 0.0])]
    # clump: vectors 1-4 nearly equal to the query direction
    for i in range(1, 5):
        rows.append((i, [1.0, 0.5, 0.2, 0.1, 0.0, 0.0, 0.001 * i, 0.0]))
    # diverse tail: decent relevance, orthogonal-ish components
    rows.append((5, [0.8, 0.4, 0.0, 0.0, 0.9, 0.0, 0.0, 0.0]))
    rows.append((6, [0.8, 0.4, 0.0, 0.0, 0.0, 0.9, 0.0, 0.0]))
    rows.append((7, [0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.9]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plain = [r["vec_id"] for r in
             brute_force_topk(emb, 0, k=3).collect()]
    assert set(plain) <= {1, 2, 3, 4}          # clump wins relevance
    mmr = mmr_topk(emb, 0, k=3, shortlist=7, lam=0.5).collect()
    picked = [r["vec_id"] for r in sorted(mmr, key=lambda r: r["rank"])]
    assert len(picked) == 3 and len(set(picked)) == 3
    assert len(set(picked) & {1, 2, 3, 4}) == 1   # one clump member only
    assert {5, 6} & set(picked)                   # diversity reached
    assert mmr[0]["max_sim_prior"] == 0.0


def test_mmr_pool_smaller_than_k(spark):
    """Fewer candidates than k: mmr_topk returns a SHORTER result,
    never an IndexError; query-only table returns empty."""
    from cube_builder_spark.functions.similarity import mmr_topk
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = mmr_topk(emb, 0, k=5, shortlist=10).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2]
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 2]
    only_q = spark.createDataFrame([(0, [1.0, 0.0])],
                                   "vec_id long, embedding array<double>")
    assert mmr_topk(only_q, 0, k=3, shortlist=5).count() == 0

"""Unit tests: backward as-of join (union+window shape) and batch ANN
top-k (broadcast query block + partial top-k merge)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cube_builder_spark.functions.asof import asof_join


def _ts(h, m=0):
    return datetime.datetime(2020, 1, 1, h, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(12), "p2"), (2, _ts(9), "p3")],
        "user_id long, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(9), 100), (1, _ts(11), 200), (1, _ts(12), 300),
         (3, _ts(8), 999)],
        "user_id long, ts timestamp, v long")
    out = {r.name: (r.r_ts, r.r_v)
           for r in asof_join(left, right, keys=["user_id"], ts_col="ts",
                              right_cols=["v"]).collect()}
    assert out["p1"] == (_ts(9), 100)       # latest at-or-before 10:00
    assert out["p2"] == (_ts(12), 300)      # equal ts counts ("at")
    assert out["p3"] == (None, None)        # no prior right row


def test_asof_join_no_join_in_plan(spark):
    """The as-of implementation must be union+window — no Join node."""
    left = spark.createDataFrame([(1, _ts(10), 1.0)],
                                 "user_id long, ts timestamp, value double")
    right = spark.createDataFrame([(1, _ts(9), 5)],
                                  "user_id long, ts timestamp, v long")
    out = asof_join(left, right, keys=["user_id"], ts_col="ts",
                    right_cols=["v"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_batch_topk_matches_per_query_brute(spark):
    """batch_topk must equal running brute_force_topk per query (same
    candidate set, same tie-break)."""
    from cube_builder_spark.functions import similarity
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) / 4 for j in range(8)])
            for i in range(60)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = embs.filter(F.col("vec_id") % 20 == 0)
    cands = embs.filter(F.col("vec_id") % 20 != 0)
    got = {(r.q_vec_id, r.rank): (r.vec_id, round(r.cosine, 9))
           for r in similarity.batch_topk(cands, queries, k=4).collect()}
    for q in (0, 20, 40):
        brute = similarity.brute_force_topk(
            embs.filter((F.col("vec_id") % 20 != 0) | (F.col("vec_id") == q)),
            query_vec_id=q, k=4).collect()
        for rank, r in enumerate(brute, start=1):
            assert got[(q, rank)] == (r.vec_id, round(r.cosine, 9))

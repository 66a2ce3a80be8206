"""Round-11 surface: deterministic global shuffle, CCNet perplexity
terciles, hybrid lexical+vector RRF retrieval. Value-level hashes are
covered by tests/test_queries_oracle; these pin the semantic
invariants the hash alone doesn't explain."""

from __future__ import annotations

from collections import Counter


def test_global_shuffle_is_a_balanced_permutation(spark, sf_dir):
    from cube_builder_spark.pipeline_queries import p_global_shuffle

    rows = p_global_shuffle(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    # exact permutation: positions are 1..n with no gaps or dups
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    # round-robin sharding: shard sizes differ by at most 1
    sizes = Counter(r.shard_id for r in rows)
    assert set(sizes) == set(range(min(8, n)))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # the permutation actually shuffles: key order != doc_id order
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    assert by_pos != sorted(by_pos)
    # reproducible: a second run lands every doc at the same position
    again = {r.doc_id: r.pos for r in p_global_shuffle(spark, sf_dir).collect()}
    assert all(again[r.doc_id] == r.pos for r in rows)


def test_perplexity_buckets_are_ordered_terciles(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_perplexity_buckets

    rows = t_perplexity_buckets(spark, sf_dir).collect()
    assert rows
    sizes = Counter(r.bucket for r in rows)
    assert set(sizes) == {"head", "middle", "tail"}
    # ntile balance: tercile sizes differ by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # ordering contract: every head doc is at least as predictable
    # (mean bigram probability) as every tail doc
    mean = {r.doc_id: r.score_sum / r.n_bigrams for r in rows}
    worst_head = min(mean[r.doc_id] for r in rows if r.bucket == "head")
    best_tail = max(mean[r.doc_id] for r in rows if r.bucket == "tail")
    assert worst_head >= best_tail


def test_hybrid_rrf_rewards_presence_in_both_lists(spark, sf_dir):
    from cube_builder_spark.ann_queries import a_hybrid_search_rrf

    rows = a_hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    # output is rank-sorted by fused score
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # RRF contract: a doc present in BOTH lists carries both rank
    # contributions; its score must exceed either single contribution
    for r in rows:
        if r.rank_lex is not None and r.rank_vec is not None:
            assert r.rrf_score > 10**9 // (60 + r.rank_lex)
            assert r.rrf_score > 10**9 // (60 + r.rank_vec)
        else:
            # single-list docs carry exactly one contribution
            rank = r.rank_lex if r.rank_lex is not None else r.rank_vec
            assert r.rrf_score == 10**9 // (60 + rank)
    # the query doc itself is excluded from both candidate lists
    assert all(r.doc_id != 0 for r in rows)


def test_cusum_finds_the_planted_mean_shift(spark, monkeypatch):
    """The oracle proves engine parity, not statistical correctness —
    plant a known mean shift and assert CUSUM localizes it: 10 days
    at 5 events/day, then 10 days at 50/day => the max-|S| split must
    land exactly on the last low-rate day."""
    import datetime

    import cube_builder_spark.events_queries as eq

    rows = []
    eid = 0
    for d in range(20):
        rate = 5 if d < 10 else 50
        for i in range(rate):
            eid += 1
            rows.append((eid, "click",
                         datetime.datetime(2024, 1, 1 + d, 12, 0, i % 60)))
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp")
    monkeypatch.setattr(eq, "_events", lambda s, d: ev)
    out = eq.e_cusum_changepoint(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    # day index of 2024-01-10 (the last 5/day day) since epoch
    expect = (datetime.date(2024, 1, 10) - datetime.date(1970, 1, 1)).days
    assert r.changepoint_day == expect
    assert r.t_index == 10 and r.n_days == 20
    # dev sign: cumsum below the global trend before an upward shift
    assert r.dev < 0 and r.abs_dev == -r.dev


def test_kaplan_meier_planted_cohort(spark, monkeypatch):
    """Plant a cohort with known lifetimes and censoring: 3 users
    churn at duration 2, 1 at duration 5, 2 still active near the
    horizon (censored, duration 3). KM rows appear only at churn
    durations; n_at_risk counts censored users until they drop out."""
    import datetime

    import cube_builder_spark.events_queries as eq

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # horizon anchor: one long-lived user whose last day IS the max
    # (duration 30, censored)
    spans = [(0, 2), (0, 2), (0, 2),      # churn at t=2
             (0, 5),                      # churn at t=5
             (27, 30), (27, 30),          # active near horizon: t=3
             (0, 30)]                     # anchor, t=30, censored
    for uid, (a, b) in enumerate(spans):
        for d in (a, b):
            eid += 1
            rows.append((eid, uid, "click",
                         base + datetime.timedelta(days=d)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    monkeypatch.setattr(eq, "_events", lambda s, d: ev)
    out = {r.duration: r for r in eq.e_kaplan_meier(spark, "x").collect()}
    # churn durations only (3 and 30 are censored-only -> no row)
    assert set(out) == {2, 5}
    # at t=2: everyone (7 users) still at risk, 3 churn
    assert out[2].n_at_risk == 7 and out[2].d_churned == 3
    assert out[2].c_censored == 0
    # at t=5: the 3 churned-at-2 and the censored-at-3 pair are gone
    assert out[5].n_at_risk == 2 and out[5].d_churned == 1


def test_frequent_paths_planted_support_semantics(spark, monkeypatch):
    """Planted cohort pinning the two semantics the oracle hash can't
    explain: triples OVERLAP (a,b,c,d yields two), and support counts
    DISTINCT users so one power user's loop cannot dominate."""
    import datetime

    import cube_builder_spark.events_queries as eq

    base = datetime.datetime(2024, 2, 1)
    rows, eid = [], 0
    seqs = {1: ["view", "click", "purchase", "view"],
            2: ["view", "click", "purchase"],
            # power user looping one pattern 3x: occurrences win,
            # support must not
            3: ["refund", "cart", "refund", "cart", "refund", "cart",
                "refund", "cart"]}
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            eid += 1
            rows.append((eid, uid, t, base + datetime.timedelta(minutes=i)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    monkeypatch.setattr(eq, "_events", lambda s, d: ev)
    out = [((r.t1, r.t2, r.t3), r.n_occurrences, r.n_users)
           for r in eq.e_frequent_paths(spark, "x").collect()]
    paths = dict((p, (o, u)) for p, o, u in out)
    # overlap: user 1's 4 events yield BOTH triples
    assert paths[("view", "click", "purchase")] == (2, 2)
    assert paths[("click", "purchase", "view")] == (1, 1)
    # the power user's 3x loop: high occurrences, support 1
    assert paths[("refund", "cart", "refund")] == (3, 1)
    # support-first ranking: the 2-user path outranks every 1-user
    # path despite fewer occurrences
    assert out[0][0] == ("view", "click", "purchase")


def test_shard_manifest_planted_balance_and_totals(spark, monkeypatch):
    """Planted corpus: the manifest must tile the permutation exactly
    — shard sizes within 1, totals reconstruct the corpus, first_pos
    equals the round-robin phase, and token/byte sums match a python
    recomputation of the same Knuth permutation."""
    import cube_builder_spark.pipeline_queries as pq

    n = 20
    texts = {i: ("tok " * (i % 5 + 1)).strip() for i in range(n)}
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in range(n)], "doc_id long, text string")
    monkeypatch.setattr(pq, "_docs", lambda s, d: docs)
    out = {r.shard_id: r for r in pq.p_shard_manifest(spark, "x").collect()}

    # python replication of the permutation + round-robin assignment
    order = sorted(range(n), key=lambda i: ((i * 2654435761) % 2**32, i))
    shards = {}
    for pos0, doc in enumerate(order):
        shards.setdefault(pos0 % 8, []).append((pos0 + 1, doc))
    assert set(out) == set(shards)
    for s, members in shards.items():
        r = out[s]
        assert r.n_docs == len(members)
        assert r.first_pos == members[0][0] == s + 1
        assert r.last_pos == members[-1][0]
        assert r.n_tokens == sum(len(texts[d].split(" "))
                                 for _p, d in members)
        assert r.n_bytes == sum(len(texts[d].encode()) for _p, d in members)
        assert r.min_doc_id == min(d for _p, d in members)
        assert r.max_doc_id == max(d for _p, d in members)
    sizes = [out[s].n_docs for s in out]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == n

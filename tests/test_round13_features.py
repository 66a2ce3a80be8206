"""Round-13 surface: Shapley attribution, simplified silhouette,
integer BM25, term burstiness, phrase search, skyline, bitmap-index
AND, systematic resampling. Value-level hashes are covered by
tests/test_queries_oracle; these pin the semantic invariants —
several against full plain-Python recomputation at sf0.001 — that
the hash alone doesn't explain."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _docs_rows(spark, sf_dir):
    from cube_builder_spark.tables import load_tables
    return load_tables(spark, sf_dir, ["documents"])["documents"].collect()


def test_shapley_matches_python_lattice_recompute(spark, sf_dir):
    """Full plain-Python replay of the data-driven game: per-user
    exposure masks, cohort micro-rates, and the exact 2^4 lattice
    walk — plus the efficiency axiom (channel credits sum to
    v(full) - v(empty) under the measured-game convention)."""
    from cube_builder_spark.events_queries import e_attribution_shapley
    from cube_builder_spark.tables import load_tables

    got = {r.channel: (r.n_exposed, r.n_conv_exposed,
                       r.shapley_micro_24)
           for r in e_attribution_shapley(spark, sf_dir).collect()}
    ev = load_tables(spark, sf_dir, ["events"])["events"].collect()
    bit_of = {"click": 1, "error": 2, "signup": 4, "view": 8}
    mask, conv = defaultdict(int), defaultdict(int)
    for r in ev:
        if r.event_type == "purchase":
            conv[r.user_id] = 1
            mask[r.user_id] |= 0
        else:
            mask[r.user_id] |= bit_of[r.event_type]
    n = Counter(mask.values())
    c = Counter()
    for u, m in mask.items():
        c[m] += conv[u]
    rate = {m: (1_000_000 * c[m]) // n[m] for m in n}
    wt = {0: 6, 1: 2, 2: 2, 3: 6}
    for ch, bit in bit_of.items():
        want = sum(
            wt[bin(m).count("1")]
            * (rate.get(m | bit, 0) - rate.get(m, 0))
            for m in range(16) if (m & bit) == 0)
        n_exp = sum(n[m] for m in n if m & bit)
        c_exp = sum(c[m] for m in n if m & bit)
        assert got[ch] == (n_exp, c_exp, want), ch
    # efficiency: credits sum to 24 * (v(1111) - v(0000)) under the
    # empty-cohort-rate-0 convention
    total = sum(v[2] for v in got.values())
    assert total == 24 * (rate.get(15, 0) - rate.get(0, 0))


def test_silhouette_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.ann_queries import a_cluster_silhouette
    from cube_builder_spark.tables import load_tables

    got = {r.label: (r.n_vectors, r.sum_a2, r.sum_b2,
                     r.n_well_separated)
           for r in a_cluster_silhouette(spark, sf_dir).collect()}
    embs = load_tables(spark, sf_dir, ["embeddings"])["embeddings"] \
        .collect()
    vecs = {r.vec_id: ([int(math.floor(float(x) * 1000 + 0.5))
                        for x in r.embedding], int(r.label))
            for r in embs}
    sums, cnt = defaultdict(lambda: defaultdict(int)), Counter()
    for q, lbl in vecs.values():
        cnt[lbl] += 1
        for d, v in enumerate(q):
            sums[lbl][d] += v
    cents = {}
    for lbl in cnt:
        cq = []
        for d in range(len(next(iter(vecs.values()))[0])):
            s, nn = sums[lbl][d], cnt[lbl]
            cq.append((2 * s + nn) // (2 * nn) if s >= 0
                      else -((2 * -s + nn) // (2 * nn)))
        cents[lbl] = cq
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for q, own in vecs.values():
        d2 = {lbl: sum((a - b) ** 2 for a, b in zip(q, cq))
              for lbl, cq in cents.items()}
        a2 = d2[own]
        b2 = min(v for lbl, v in d2.items() if lbl != own)
        row = agg[own]
        row[0] += 1
        row[1] += a2
        row[2] += b2
        row[3] += 1 if b2 > a2 else 0
    assert got == {lbl: tuple(v) for lbl, v in agg.items()}
    # the synthetic labels carry real (if weak) cluster signal: under
    # RANDOM labels a member beats the min of 9 other centroids with
    # p ~ 1/10 (~50 of 500); the measured 181 at sf0.001 is >3x that.
    # Assert well above the random-assignment expectation, not a
    # majority — the fixture's clusters overlap by construction.
    n_all = sum(v[0] for v in got.values())
    n_pos = sum(v[3] for v in got.values())
    assert n_pos > n_all // 5


def test_bitmap_and_counts_equal_direct_predicate_count(spark, sf_dir):
    """The popcount total must equal the direct row count of the
    conjunctive predicate — the invariant that makes a bitmap index
    an INDEX and not an approximation."""
    import pyspark.sql.functions as F

    from cube_builder_spark.storage_queries import x_bitmap_index_and
    from cube_builder_spark.tables import load_tables

    rows = x_bitmap_index_and(spark, sf_dir).collect()
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    direct = (orders.filter((F.col("o_orderstatus") == "F")
                            & (F.col("o_orderpriority") == "1-URGENT"))
              .count())
    assert sum(r.n_matches for r in rows) == direct
    assert all(r.n_words >= 0 and r.n_matches >= r.n_words * 0
               for r in rows)


def test_skyline_matches_quadratic_dominance_definition(spark, sf_dir):
    """The window reduction must equal the textbook NOT-EXISTS
    skyline: a day-level point survives iff no other point has
    (later-or-equal day AND cheaper-or-equal price) with one strict."""
    from cube_builder_spark.relational import r23_skyline_pareto
    from cube_builder_spark.tables import load_tables

    got = sorted((r.o_day, r.best_price_cents, r.n_at_best)
                 for r in r23_skyline_pareto(spark, sf_dir).collect())
    orders = load_tables(spark, sf_dir, ["orders"])["orders"].collect()
    best, n_at = {}, Counter()
    for r in orders:
        d = r.o_orderdate.date()
        cents = int(math.floor(r.o_totalprice * 100 + 0.5))
        if d not in best or cents < best[d]:
            best[d] = cents
    for r in orders:
        d = r.o_orderdate.date()
        cents = int(math.floor(r.o_totalprice * 100 + 0.5))
        if cents == best[d]:
            n_at[d] += 1
    pts = sorted(best.items())
    want = []
    for d, p in pts:
        dominated = any(
            d2 >= d and p2 <= p and (d2 > d or p2 < p)
            for d2, p2 in pts if (d2, p2) != (d, p))
        # same-day cheaper orders were reduced away; the remaining
        # dominance is strictly-later-cheaper-or-equal
        if not dominated:
            want.append((d, p, n_at[d]))
    assert got == sorted(want)


def test_bm25_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_bm25_topk

    got = [(r.doc_id, r.bm25_score, r.n_match)
           for r in t_bm25_topk(spark, sf_dir).collect()]
    docs = _docs_rows(spark, sf_dir)
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    df = Counter()
    for d in tf:
        for w in tf[d]:
            df[w] += 1
    a_tot, n_docs = sum(dl.values()), len(dl)
    q = set(tf[0])
    scores = {}
    for d in tf:
        if d == 0:
            continue
        s = sum((1_000_000 // df[w]) * (22 * a_tot * tf[d][w])
                // (10 * a_tot * tf[d][w] + 3 * a_tot
                    + 9 * n_docs * dl[d])
                for w in q if w in tf[d])
        m = sum(1 for w in q if w in tf[d])
        if m:
            scores[d] = (s, m)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert got == [(d, s, m) for d, (s, m) in want]


def test_burstiness_and_phrase_match_python(spark, sf_dir):
    from cube_builder_spark.corpus_queries import (t_phrase_search,
                                                   t_term_burstiness)

    docs = _docs_rows(spark, sf_dir)
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    tf = {d: Counter(ts) for d, ts in toks.items()}
    stats = defaultdict(lambda: [0, 0, 0])  # df, sum_tf, sum_tf2
    for d in tf:
        for w, c in tf[d].items():
            st = stats[w]
            st[0] += 1
            st[1] += c
            st[2] += c * c
    burst = {}
    for w, (dfw, s1, s2) in stats.items():
        if dfw >= 5:
            d_num = n_docs * s2 - s1 * s1
            burst[w] = (dfw, s1, d_num,
                        (1_000_000 * d_num) // (n_docs * s1))
    want = sorted(burst.items(),
                  key=lambda kv: (-kv[1][3], kv[0]))[:25]
    got = [(r.term, (r.df, r.sum_tf, r.d_num, r.burst_scaled))
           for r in t_term_burstiness(spark, sf_dir).collect()]
    assert got == want

    phrase = (toks[0][0], toks[0][1])
    occ = {}
    for d, ts in toks.items():
        if d == 0:
            continue
        c = sum(1 for a, b in zip(ts, ts[1:]) if (a, b) == phrase)
        if c:
            occ[d] = c
    want_p = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_p = [(r.doc_id, r.n_occ)
             for r in t_phrase_search(spark, sf_dir).collect()]
    assert got_p == want_p


def test_systematic_resample_exactly_n_and_python_match(spark, sf_dir):
    """The floors telescope: total copies == 1000 exactly; every doc
    with weight >= W/1000 draws at least one copy; full python
    recompute of the per-doc copy counts."""
    from cube_builder_spark.pipeline_queries import p_systematic_resample

    got = {r.doc_id: (r.weight, r.n_copies)
           for r in p_systematic_resample(spark, sf_dir).collect()}
    docs = sorted((r.doc_id, r.n_chars) for r in _docs_rows(spark, sf_dir))
    w_sum = sum(w for _d, w in docs)
    cum, want = 0, {}
    for d, w in docs:
        prev = cum
        cum += w
        copies = (1000 * cum) // w_sum - (1000 * prev) // w_sum
        if copies >= 1:
            want[d] = (w, copies)
    assert got == want
    assert sum(c for _w, c in got.values()) == 1000
    for d, w in docs:
        if w * 1000 >= w_sum:
            assert d in got


def test_rake_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_keyphrase_rake

    got = [(r.phrase, r.n_occ, r.score_scaled)
           for r in t_keyphrase_rake(spark, sf_dir).collect()]
    stop = {"the", "a"}
    phrases = []
    for r in _docs_rows(spark, sf_dir):
        run = []
        for t in r.text.split(" ") + ["the"]:
            if t in stop:
                if run and len(run) <= 8:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    n_occ = Counter(phrases)
    scores = {p: (c, sum((1_000_000 * deg[w]) // freq[w] for w in p))
              for p, c in n_occ.items()}
    want = sorted(((" ".join(p), c, s) for p, (c, s) in scores.items()),
                  key=lambda r: (-r[2], r[0]))[:15]
    assert got == want


def test_hits_structure_and_edge_consistency(spark, sf_dir):
    """HITS values must be reachable from the derived edge set: a
    python replay from the INDEPENDENTLY-derived edge list (DuckDB
    over the raw tables) must equal the query's output — and nations
    nobody buys from must have authority 0."""
    import duckdb

    from cube_builder_spark.relational import _HITS_ITER, x_hits_rank

    got = {r.nationkey: (r.hub, r.authority)
           for r in x_hits_rank(spark, sf_dir).collect()}
    con = duckdb.connect()
    edges = con.execute(f"""
        SELECT DISTINCT c.c_nationkey, s.s_nationkey
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
    """).fetchall()
    nodes = [r[0] for r in con.execute(
        f"SELECT n_nationkey FROM '{sf_dir}/nation.parquet'").fetchall()]
    hub = {n: 1 for n in nodes}
    for _ in range(_HITS_ITER):
        auth = {n: 0 for n in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        hub = {n: 0 for n in nodes}
        for s, d in edges:
            hub[s] += auth[d]
    assert got == {n: (hub[n], auth[n]) for n in nodes}
    dsts = {d for _s, d in edges}
    for n in nodes:
        if n not in dsts:
            assert got[n][1] == 0


def test_temperature_mix_allocates_exactly_budget_and_flattens(
        spark, sf_dir):
    from cube_builder_spark.pipeline_queries import p_temperature_mix

    rows = p_temperature_mix(spark, sf_dir).collect()
    assert sum(r.alloc_tokens for r in rows) == 1_000_000
    # temperature T=2 flattens the mixture: the SMALLEST source's
    # share must not shrink vs proportional, the LARGEST's must not
    # grow (sqrt is concave)
    smallest = min(rows, key=lambda r: r.raw_weight)
    largest = max(rows, key=lambda r: r.raw_weight)
    assert smallest.alloc_tokens >= smallest.proportional_alloc
    assert largest.alloc_tokens <= largest.proportional_alloc + 1
    # python recompute of the largest-remainder allocation
    p = {r.source: r.samp_weight for r in rows}
    psum = sum(p.values())
    base = {s: (1_000_000 * w) // psum for s, w in p.items()}
    frac = {s: (1_000_000 * w) % psum for s, w in p.items()}
    rem = 1_000_000 - sum(base.values())
    for s in sorted(p, key=lambda s: (-frac[s], s))[:rem]:
        base[s] += 1
    assert {r.source: r.alloc_tokens for r in rows} == base


def test_interarrival_profile_matches_python(spark, sf_dir):
    from cube_builder_spark.events_queries import e_interarrival_profile
    from cube_builder_spark.tables import load_tables

    got = {(r.event_type, r.bucket): (r.n, r.min_s, r.max_s)
           for r in e_interarrival_profile(spark, sf_dir).collect()}
    ev = load_tables(spark, sf_dir, ["events"])["events"].collect()
    per = defaultdict(list)
    for r in ev:
        us = (r.ts - __import__("datetime").datetime(1970, 1, 1)) \
            // __import__("datetime").timedelta(microseconds=1)
        per[(r.user_id, r.event_type)].append((us, r.event_id))
    agg = {}
    for (u, t), rows in per.items():
        rows.sort()
        for (a, _ea), (b, _eb) in zip(rows, rows[1:]):
            gap = b // 1_000_000 - a // 1_000_000
            bucket = len(bin(gap + 1)) - 2   # len(bin) minus '0b'
            k = (t, bucket)
            n, lo, hi = agg.get(k, (0, gap, gap))
            agg[k] = (n + 1, min(lo, gap), max(hi, gap))
    assert got == agg


def test_cluster_purity_matches_python_over_engine_clusters(spark, sf_dir):
    """Purity recomputed in python from the ENGINE's cluster
    assignment and the raw labels — pins the packed-argmax majority
    extraction and the >= 2 member gate (cluster membership itself is
    oracle-replayed by the registry SQL)."""
    from cube_builder_spark.ann_queries import (a_cluster_purity,
                                                a_embedding_dup_clusters)
    from cube_builder_spark.tables import load_tables

    got = {r.canonical_id: (r.n_members, r.majority_label, r.n_majority)
           for r in a_cluster_purity(spark, sf_dir).collect()}
    clusters = {r.vec_id: r.canonical_id
                for r in a_embedding_dup_clusters(spark, sf_dir)
                .collect()}
    labels = {r.vec_id: int(r.label)
              for r in load_tables(spark, sf_dir, ["embeddings"])
              ["embeddings"].collect()}
    per = defaultdict(Counter)
    for v, c in clusters.items():
        per[c][labels[v]] += 1
    want = {}
    for c, cnt in per.items():
        n = sum(cnt.values())
        if n >= 2:
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            want[c] = (n, best[0], best[1])
    assert got == want and want
    # corpus purity must beat the majority-class baseline on clustered
    # members (the clusters carry label signal)
    n_all = sum(v[0] for v in want.values())
    n_maj = sum(v[2] for v in want.values())
    assert n_maj * 10 > n_all  # > 1/10 = random-label expectation

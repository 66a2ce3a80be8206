"""Round-12 surface: RANGE-frame spend, sweep-line peak concurrency,
Lorenz/Gini, PMI collocations, difference-in-differences. Value-level
hashes are covered by tests/test_queries_oracle; these pin the
semantic invariants — several against full plain-Python recomputation
at sf0.001 — that the hash alone doesn't explain."""

from __future__ import annotations

from collections import defaultdict


def test_range_frame_spend_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_range_frame_spend
    from cube_builder_spark.tables import load_tables

    got = {r.o_orderkey: (r.o_custkey, r.day, r.spend_30d_cents)
           for r in e_range_frame_spend(spark, sf_dir).collect()}
    orders = load_tables(spark, sf_dir, ["orders"])["orders"].collect()
    by_cust = defaultdict(list)
    import datetime
    epoch = datetime.date(1970, 1, 1)
    for r in orders:
        day = (r.o_orderdate.date() - epoch).days
        cents = int(r.o_totalprice * 100 + 0.5)
        by_cust[r.o_custkey].append((day, cents, r.o_orderkey))
    for cust, rows in by_cust.items():
        for day, _c, key in rows:
            want = sum(c for d, c, _k in rows if day - 29 <= d <= day)
            assert got[key] == (cust, day, want), key


def test_peak_concurrency_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_peak_concurrency
    from cube_builder_spark.tables import load_tables

    got = {r.day: (r.peak_users, r.n_users)
           for r in e_peak_concurrency(spark, sf_dir).collect()}
    assert got
    ev = load_tables(spark, sf_dir, ["events"]).get("events")
    rows = ev.collect()
    import datetime
    epoch = datetime.date(1970, 1, 1)
    spans = {}
    for r in rows:
        day = (r.ts.date() - epoch).days
        m = r.ts.hour * 60 + r.ts.minute
        k = (r.user_id, day)
        lo, hi = spans.get(k, (m, m))
        spans[k] = (min(lo, m), max(hi, m))
    want = {}
    per_day = defaultdict(list)
    for (u, day), (lo, hi) in spans.items():
        per_day[day].append((lo, hi))
    for day, ivs in per_day.items():
        deltas = defaultdict(int)
        for lo, hi in ivs:
            deltas[lo] += 1
            deltas[hi + 1] -= 1
        run, peak = 0, 0
        for m in sorted(deltas):
            run += deltas[m]
            peak = max(peak, run)
        want[day] = (peak, len(ivs))
    assert got == want
    # sanity on the invariant itself: concurrency never exceeds the
    # day's distinct users, and someone is always concurrent
    assert all(1 <= p <= n for p, n in got.values())


def test_lorenz_gini_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_lorenz_gini
    from cube_builder_spark.tables import load_tables

    rows = e_lorenz_gini(spark, sf_dir).collect()
    assert {r.decile for r in rows} == set(range(1, 11))
    orders = load_tables(spark, sf_dir, ["orders"])["orders"].collect()
    spend = defaultdict(int)
    for r in orders:
        spend[r.o_custkey] += int(r.o_totalprice * 100 + 0.5)
    ordered = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    s_ix = sum((i + 1) * x for i, (_k, x) in enumerate(ordered))
    s_x = sum(x for _k, x in ordered)
    want_num, want_den = 2 * s_ix - (n + 1) * s_x, n * s_x
    for r in rows:
        assert (r.gini_num, r.gini_den) == (want_num, want_den)
    assert 0 <= want_num <= want_den
    assert sum(r.n_customers for r in rows) == n
    # ascending sort: decile spend totals per customer rise with the
    # decile index (strong inequality need not hold per-total, but
    # the per-customer mean must be nondecreasing)
    means = [r.decile_spend_cents / r.n_customers
             for r in sorted(rows, key=lambda r: r.decile)]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))


def test_cooccurrence_pmi_score_and_ordering(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_cooccurrence_pmi
    from cube_builder_spark.tables import load_tables

    rows = t_cooccurrence_pmi(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_docs = docs.count()
    for r in rows:
        assert r.wa < r.wb
        assert r.c_ab <= min(r.c_a, r.c_b)
        assert r.pmi_micro == 1000000 * r.c_ab * n_docs // (r.c_a * r.c_b)
    scores = [r.pmi_micro for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_did_analysis_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_did_analysis
    from cube_builder_spark.tables import load_tables

    [r] = e_did_analysis(spark, sf_dir).collect()
    ev = load_tables(spark, sf_dir, ["events"])["events"].collect()
    import datetime
    epoch = datetime.date(1970, 1, 1)
    days = defaultdict(int)
    for e in ev:
        if e.event_type == "purchase":
            days[(e.user_id % 2, (e.ts.date() - epoch).days)] += 1
    all_days = [d for (_a, d) in days]
    mind, maxd = min(all_days), max(all_days)
    mid = (mind + maxd + 1) // 2
    cell = defaultdict(int)
    for (a, d), c in days.items():
        cell[(a, d >= mid)] += c
    d_pre, d_post = mid - mind, maxd - mid + 1
    num = ((cell[(1, True)] - cell[(0, True)]) * d_pre
           - (cell[(1, False)] - cell[(0, False)]) * d_post)
    assert (r.n_pre_days, r.n_post_days) == (d_pre, d_post)
    assert (r.ctl_pre, r.ctl_post) == (cell[(0, False)], cell[(0, True)])
    assert (r.trt_pre, r.trt_post) == (cell[(1, False)], cell[(1, True)])
    assert (r.did_num, r.did_den) == (num, d_pre * d_post)
    assert abs(r.did_daily - num / (d_pre * d_post)) < 1e-12


def test_morans_i_signs_on_planted_patterns(spark):
    """Moran's I ground truth: a checkerboard is maximally dispersed
    (strongly negative I), a linear gradient is clustered (positive
    I), and both match a full plain-Python recompute of the rook
    statistic."""
    from cube_builder_spark.cube_queries import morans_i_cells

    def cells(fn, tile):
        return [(tile, y, x, fn(y, x)) for y in range(8)
                for x in range(8)]

    rows = (cells(lambda y, x: 100 if (x + y) % 2 else -100, 0)
            + cells(lambda y, x: 50 * x + 7 * y, 1))
    df = spark.createDataFrame(rows, "tile_id long, y long, x long, v long")
    got = {r.tile_id: r for r in morans_i_cells(df).collect()}
    assert got[0].morans_i < -0.9          # checkerboard: dispersed
    assert got[1].morans_i > 0.5           # gradient: clustered

    # exact python recompute of num/den for both tiles
    for tile in (0, 1):
        vs = {(y, x): v for t, y, x, v in rows if t == tile}
        n = len(vs)
        s = sum(vs.values())
        zc = {k: n * v - s for k, v in vs.items()}
        cross = w_pairs = 0
        for (y, x), z in zc.items():
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                nb = zc.get((y + dy, x + dx))
                if nb is not None:
                    cross += z * nb
                    w_pairs += 1
        ss = sum(z * z for z in zc.values())
        r = got[tile]
        assert (r.n_cells, r.w_pairs, r.cross_zc, r.ss_zc) == \
            (n, w_pairs, cross, ss)
        assert abs(r.morans_i - (cross / ss) * n / w_pairs) < 1e-12


def test_getis_ord_hot_cluster_scores_highest(spark):
    """Gi* ground truth: on a flat tile with one 3x3 hot cluster, the
    cluster center (whole neighborhood hot) must carry the maximum
    z-score, far-field cells sit below it, and every row matches a
    plain-Python recompute of the statistic."""
    import math

    from cube_builder_spark.cube_queries import getis_ord_cells

    hot = {(3, 3), (3, 4), (3, 5), (4, 3), (4, 4), (4, 5),
           (5, 3), (5, 4), (5, 5)}
    rows = [(0, y, x, 1000 if (y, x) in hot else 10)
            for y in range(10) for x in range(10)]
    df = spark.createDataFrame(rows, "tile_id long, y long, x long, v long")
    got = {r.pixel_id: r for r in getis_ord_cells(df).collect()}
    W = 32  # _GRID_W pixel_id packing
    center = got[4 * W + 4]
    assert center.gi_z == max(r.gi_z for r in got.values())
    assert center.gi_z > 2.0
    assert got[0 * W + 0].gi_z < 0  # far corner: below the mean

    vs = {(y, x): v for _t, y, x, v in rows}
    n, s = len(vs), sum(vs.values())
    ssq = sum(v * v for v in vs.values())
    for (y, x), _v in vs.items():
        nb = [(y + dy, x + dx) for dy, dx in
              ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))]
        present = [k for k in nb if k in vs]
        wi, snb = len(present), sum(vs[k] for k in present)
        num = n * snb - wi * s
        z = num / math.sqrt((n * ssq - s * s) * 1.0
                            * (n * wi - wi * wi) / (n - 1))
        r = got[y * W + x]
        assert (r.wi, r.sum_nbr, r.gi_num) == (wi, snb, num)
        assert abs(r.gi_z - z) < 1e-9


def test_local_moran_quadrants_on_planted_cluster(spark):
    """LISA ground truth: with one hot 3x3 cluster on a flat field,
    the cluster core is HH with the tile-max positive lisa_i, the
    cluster's edge-adjacent flat cells are LH (low value, hot lag),
    and the far field is LL with near-zero lisa_i."""
    from cube_builder_spark.cube_queries import _GRID_W, local_moran_cells

    hot = {(4, 4), (4, 5), (4, 6), (5, 4), (5, 5), (5, 6),
           (6, 4), (6, 5), (6, 6)}
    rows = [(0, y, x, 1000 if (y, x) in hot else 0)
            for y in range(12) for x in range(12)]
    cells = spark.createDataFrame(rows,
                                  "tile_id long, y long, x long, v long")
    out = {r.pixel_id: r for r in local_moran_cells(cells).collect()}

    def at(y, x):
        return out[y * _GRID_W + x]

    assert at(5, 5).quadrant == "HH"
    assert at(5, 5).lisa_i == max(r.lisa_i for r in out.values())
    assert at(3, 5).quadrant == "LH"   # flat cell touching the cluster
    assert at(0, 0).quadrant == "LL"   # far field: low value, low lag
    assert abs(at(0, 0).lisa_i) < at(5, 5).lisa_i
    # exact fraction columns: num/den reproduce the float ratio
    for r in out.values():
        assert abs(r.lisa_i - r.lisa_num / r.lisa_den) < 1e-15


def test_market_basket_matches_python_recompute(spark):
    # sf0.01: at sf0.001 no pair reaches min-support 8 (both engines
    # agree on empty — hash-checked — but an empty frame would make
    # this recompute vacuous)
    sf_dir = "/root/testdata/sf0.01"
    from cube_builder_spark.relational import r22_market_basket
    from cube_builder_spark.tables import load_tables

    rows = r22_market_basket(spark, sf_dir).collect()
    assert rows, "min-support should survive at sf0.01"
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    cnt = defaultdict(int)
    co = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            cnt[p] += 1
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                co[(a, b)] += 1
    scored = []
    for (a, b), c in co.items():
        if c >= 2:
            scored.append((1000000 * c * n_orders // (cnt[a] * cnt[b]),
                           a, b, c))
    want = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:25]
    got = [(r.lift_micro, r.pa, r.pb, r.co) for r in rows]
    assert got == want
    for r in rows:
        assert abs(r.jaccard - r.co / (r.c_a + r.c_b - r.co)) < 1e-12


def test_cohort_ltv_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_cohort_ltv
    from cube_builder_spark.tables import load_tables

    rows = e_cohort_ltv(spark, sf_dir).collect()
    assert rows
    ev = load_tables(spark, sf_dir, ["events"])["events"].collect()
    import datetime
    epoch = datetime.date(1970, 1, 1)
    user_weeks = defaultdict(lambda: defaultdict(int))
    for e in ev:
        if e.event_type == "purchase":
            wk = (e.ts.date() - epoch).days // 7
            user_weeks[e.user_id][wk] += int(e.value * 100 + 0.5)
    cellrev = defaultdict(int)
    cellusers = defaultdict(set)
    for u, wks in user_weeks.items():
        cohort = min(wks)
        for wk, cents in wks.items():
            cellrev[(cohort, wk - cohort)] += cents
            cellusers[(cohort, wk - cohort)].add(u)
    for r in rows:
        key = (r.cohort_week, r.week_offset)
        assert r.week_rev_cents == cellrev[key], key
        assert r.n_active_users == len(cellusers[key]), key
        assert r.n_cohort_users == len(cellusers[(r.cohort_week, 0)])
        cum = sum(v for (cw, off), v in cellrev.items()
                  if cw == r.cohort_week and off <= r.week_offset)
        assert r.cum_rev_cents == cum, key
        assert abs(r.ltv_per_user - cum / r.n_cohort_users) < 1e-9
    # every observed (cohort, offset) cell is present
    assert {(r.cohort_week, r.week_offset) for r in rows} == \
        set(cellrev)


def test_ngram_novelty_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_ngram_novelty
    from cube_builder_spark.tables import load_tables

    rows = {r.doc_id: r for r in t_ngram_novelty(spark, sf_dir).collect()}
    assert rows
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].collect()
    grams = {}
    for d in docs:
        ws = d.text.split(" ")
        if len(ws) < 8:
            continue
        gs = {" ".join(ws[i:i + 8]) for i in range(len(ws) - 7)}
        grams[d.doc_id] = gs
    first = {}
    for doc_id in sorted(grams):
        for g in grams[doc_id]:
            first.setdefault(g, doc_id)
    for doc_id, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == doc_id)
        r = rows[doc_id]
        assert (r.n_grams, r.n_novel) == (len(gs), novel), doc_id
        assert abs(r.novelty_ratio - novel / len(gs)) < 1e-12
    assert set(rows) == set(grams)
    # the smallest doc_id in the corpus owns every one of its grams
    d0 = min(grams)
    assert rows[d0].n_novel == rows[d0].n_grams


def test_branch_diff_excludes_shared_base(spark, tmp_path):
    """branch_diff ground truth on a tiny store: the shared base
    appears on NEITHER side, each branch's exclusive rows land whole
    on their own side, and an empty diff means identical heads."""
    from pyspark.sql import functions as F

    from cube_builder_spark.sinks.snapshot import SnapshotStore, branch_diff

    st = SnapshotStore(str(tmp_path / "bd"))
    st.write(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    st.create_branch("dev")
    # identical heads -> empty diff
    assert branch_diff(st, spark, "dev", "main", ["k"]).count() == 0
    st.write(spark.createDataFrame([(3, 30)], "k long, v long"),
             branch="dev")
    st.write(spark.createDataFrame([(4, 40)], "k long, v long"))
    got = sorted((r.side, r.k, r.v)
                 for r in branch_diff(st, spark, "dev", "main",
                                      ["k"]).collect())
    assert got == [("dev", 3, 30), ("main", 4, 40)]


def test_vocab_growth_reconciles_with_exact_vocab(spark, sf_dir):
    from cube_builder_spark.corpus_queries import t_vocab_growth
    from cube_builder_spark.tables import load_tables

    rows = sorted(t_vocab_growth(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].collect()
    vocab = set()
    for d in docs:
        vocab.update(d.text.split(" "))
    # per-decile new terms sum to the EXACT corpus vocabulary
    assert sum(r.n_new_terms for r in rows) == len(vocab)
    assert rows[-1].cum_vocab == len(vocab)
    assert sum(r.n_docs for r in rows) == len(docs)
    assert rows[-1].cum_docs == len(docs)
    # cumulative columns are consistent prefix sums and monotone
    cv = cd = 0
    for r in rows:
        cd += r.n_docs
        cv += r.n_new_terms
        assert (r.cum_docs, r.cum_vocab) == (cd, cv)
    # Heaps: the first decile contributes the most new vocabulary
    assert rows[0].n_new_terms == max(r.n_new_terms for r in rows)


def test_dau_mau_matches_python_recompute(spark, sf_dir):
    from cube_builder_spark.events_queries import e_dau_mau_stickiness
    from cube_builder_spark.tables import load_tables

    got = {r.day: (r.dau, r.mau) for r in
           e_dau_mau_stickiness(spark, sf_dir).collect()}
    assert got
    ev = load_tables(spark, sf_dir, ["events"])["events"].collect()
    import datetime
    epoch = datetime.date(1970, 1, 1)
    ud = {(e.user_id, (e.ts.date() - epoch).days) for e in ev}
    days = sorted({d for _u, d in ud})
    for day in days:
        dau = len({u for u, d in ud if d == day})
        mau = len({u for u, d in ud if day - 29 <= d <= day})
        assert got[day] == (dau, mau), day
    assert set(got) == set(days)
    # stickiness bounds: DAU is a subset of MAU
    assert all(d <= m for d, m in got.values())

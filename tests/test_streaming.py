"""Streaming operators: a bounded batch driven through the Structured
Streaming engine must agree with the batch plane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.streaming.events import (read_event_stream,
                                                 run_to_memory,
                                                 session_windows,
                                                 windowed_counts)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    # nanos timestamps aren't supported by the streaming parquet reader
    # path the same way; re-write a clean copy for the stream source
    import tempfile

    from cube_builder_spark.tables import load_table
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return read_event_stream(spark, d)


def test_windowed_counts_matches_batch(spark, sf_dir, event_stream):
    run_to_memory(windowed_counts(event_stream), "wc", "complete")
    stream_rows = {(r.window_start, r.event_type): (r.n, r.total_value)
                   for r in spark.sql("SELECT * FROM wc").collect()}
    from cube_builder_spark.events_queries import e_tumbling_window
    batch_rows = {(r.window_start, r.event_type): (r.n, r.total_value)
                  for r in e_tumbling_window(spark, sf_dir).collect()}
    assert stream_rows == batch_rows


def test_session_windows_agree_with_batch_totals(spark, sf_dir, event_stream):
    run_to_memory(session_windows(event_stream), "sw", "complete")
    stream = spark.sql("SELECT * FROM sw")
    from cube_builder_spark.events_queries import e_sessionize
    batch = e_sessionize(spark, sf_dir)
    # session boundaries agree (same gap rule) -> same session count and
    # same total event mass per user
    s = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    b = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    srows = {r.user_id: (r.n_sessions, r.n_events) for r in s.collect()}
    brows = {r.user_id: (r.n_sessions, r.n_events) for r in b.collect()}
    assert srows == brows


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics end-to-end: after the watermark advances
    past a window, an event arriving for that window in a later
    micro-batch is DROPPED — its aggregate must not change. Driven
    deterministically: one file per micro-batch, maxFilesPerTrigger=1,
    update-mode memory sink."""
    import datetime as dt

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / "src" / name))
        # the file source tracks NEW files under a common glob dir;
        # move each batch in as its own file
        import glob
        import shutil
        part = glob.glob(str(tmp_path / "src" / name / "part-*.parquet"))[0]
        (tmp_path / "in").mkdir(exist_ok=True)
        shutil.copy(part, str(tmp_path / "in" / f"{name}.parquet"))

    # batch 1: events at t0 and t0+3h -> watermark after batch 1 is
    # (t0+3h) - 30min, far past the [t0, t0+1h) window
    write_batch([(1, t0, 1, "view", 1.0, "{}"),
                 (2, t0 + dt.timedelta(hours=3), 1, "view", 1.0, "{}")], "b1")

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .parquet(str(tmp_path / "in")))
    q = (windowed_counts(src, window="1 hour", watermark="30 minutes")
         .writeStream.outputMode("update")
         .format("memory").queryName("late_wc").start())
    try:
        q.processAllAvailable()
        before = {(r.window_start, r.event_type): r.n
                  for r in spark.sql("SELECT * FROM late_wc").collect()}
        assert before[(t0, "view")] == 1

        # batch 2: one LATE event back at t0 (window end t0+1h is far
        # below the watermark -> dropped), one on-time at t0+3h30
        write_batch([(3, t0, 2, "view", 1.0, "{}"),
                     (4, t0 + dt.timedelta(hours=3, minutes=30), 2,
                      "view", 1.0, "{}")], "b2")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_wc").collect()
        # update mode re-emits a window row when it changes: the late
        # event must NOT have produced an updated [t0, t0+1h) row
        t0_rows = [r.n for r in rows if r.window_start == t0]
        assert max(t0_rows) == 1, "late event leaked past the watermark"
        # while the on-time event did land
        t330 = t0 + dt.timedelta(hours=3, minutes=30)
        assert any(r.window_start == t330 - dt.timedelta(minutes=30)
                   or r.window_start == t0 + dt.timedelta(hours=3)
                   for r in rows)
    finally:
        q.stop()


def test_corpus_prep_stream_cross_batch(spark, tmp_path):
    """Cross-batch contract: the canonical of a content hash is fixed
    by its FIRST batch; later batches' duplicates attribute to it.
    Gated-out docs (wrong lang / too short) never reach the ledger."""
    from cube_builder_spark.streaming.corpus import corpus_prep_stream

    # 40 tokens, all distinct (passes the uniq-ratio quality gate),
    # with enough English stopwords to win the lang vote
    good = " ".join("the and is in it you that was for on".split()
                    + [f"word{i}" for i in range(30)])
    short = "the and is"                                      # fails length
    de = " ".join("der die und ist nicht das ich du sie es".split()
                  + [f"wort{i}" for i in range(30)])

    def write_batch(rows, name):
        import glob
        import shutil
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / "stage" / name))
        (tmp_path / "in").mkdir(exist_ok=True)
        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, str(tmp_path / "in" / f"{name}.parquet"))

    write_batch([(1, "en", good), (2, "en", short), (3, "de", de)], "b1")
    src = (spark.readStream
           .schema("doc_id long, lang string, text string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(tmp_path / "in")))
    q = (corpus_prep_stream(src).writeStream.outputMode("append")
         .format("memory").queryName("prep_stream").start())
    try:
        q.processAllAvailable()
        # batch 2 re-sends the SAME text under a new doc_id
        write_batch([(10, "en", good)], "b2")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM prep_stream").collect()
    finally:
        q.stop()
    by_doc = {r.doc_id: r for r in rows}
    # gated-out docs never entered the ledger
    assert set(by_doc) == {1, 10}
    assert by_doc[1].is_canonical and by_doc[1].n_seen_before == 0
    # cross-batch duplicate attributes to the batch-1 canonical
    assert not by_doc[10].is_canonical
    assert by_doc[10].canonical_id == 1 and by_doc[10].n_seen_before == 1


def test_incremental_near_dup_index(spark, sf_dir, tmp_path):
    """Folding the corpus in two batches must find the SAME pair set
    as the one-shot run: in-batch pairs surface with their batch,
    cross-batch pairs when the later member arrives."""
    from cube_builder_spark.streaming.neardup import update_near_dup_index
    from cube_builder_spark.tables import load_tables
    from cube_builder_spark.functions import dedup

    docs = (load_tables(spark, sf_dir, ["documents"])["documents"]
            .select("doc_id", "text"))
    one_shot = dedup.lsh_near_dup_pairs(
        dedup.shingles(docs), bands=[["h0", "h1"], ["h2", "h3"]],
        max_bucket=64, threshold=0.8)
    expected = {(r.doc_a, r.doc_b) for r in one_shot.collect()}

    idx = str(tmp_path / "ndidx")
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    p1 = {(r.doc_a, r.doc_b) for r in
          update_near_dup_index(spark, b1, idx, max_bucket=64,
                                threshold=0.8).collect()}
    p2 = {(r.doc_a, r.doc_b) for r in
          update_near_dup_index(spark, b2, idx, max_bucket=64,
                                threshold=0.8).collect()}
    # batch-1 pairs are even×even only; batch 2 adds odd×odd AND the
    # cross-parity pairs against the indexed history
    assert all(a % 2 == 0 and b % 2 == 0 for a, b in p1)
    assert p1 | p2 == expected
    assert p1.isdisjoint(p2)
    # cross-batch pairs actually exist in this corpus (the test would
    # be vacuous otherwise)
    assert any(a % 2 != b % 2 for a, b in p2)


def test_stream_stream_join_matches_batch_pairs(spark, sf_dir, event_stream):
    """Stream-stream view→purchase join produces exactly the batch
    inner-join pair set."""
    from cube_builder_spark.streaming.events import (
        stream_stream_view_purchase)
    views = event_stream.filter(F.col("event_type") == "view")
    purchases = event_stream.filter(F.col("event_type") == "purchase")
    joined = stream_stream_view_purchase(views, purchases)
    q = (joined.writeStream.format("memory")
         .queryName("ssj").outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    stream_pairs = sorted((r.event_id, r.v_ts)
                          for r in spark.sql("SELECT * FROM ssj").collect())

    from cube_builder_spark.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    batch_pairs = sorted(
        (r.event_id, r.v_ts)
        for r in p.join(v, (F.col("v_user") == F.col("user_id"))
                        & (F.col("v_ts") > F.col("ts")
                           - F.expr("INTERVAL 1 HOUR"))
                        & (F.col("v_ts") <= F.col("ts"))).collect())
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_token_budget_stream_cross_batch_first_fit(spark, tmp_path):
    """Streaming budget enforcement: admission state survives batch
    boundaries; an oversized doc is skipped but a later smaller one
    still fits (first-fit); the accept set matches a driver-side
    reference fold over the same doc_id order."""
    from cube_builder_spark.streaming.budget import token_budget_stream

    def text(n):
        return " ".join(["w"] * n)

    def write_batch(rows, name):
        import glob
        import shutil
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / "stage" / name))
        (tmp_path / "in").mkdir(exist_ok=True)
        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, str(tmp_path / "in" / f"{name}.parquet"))

    budgets = {"a": 25, "b": 5}
    # batch 1: a: 10 + 10 admitted (20); b: 3 admitted, 4 rejected
    write_batch([(1, "a", text(10)), (2, "a", text(10)),
                 (3, "b", text(3)), (4, "b", text(4))], "b1")
    src = (spark.readStream
           .schema("doc_id long, source string, text string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(tmp_path / "in")))
    q = (token_budget_stream(src, budgets, default_budget=100)
         .writeStream.outputMode("append")
         .format("memory").queryName("budget_stream").start())
    try:
        q.processAllAvailable()
        # batch 2: a has 5 left -> doc 5 (7 tokens) skipped, doc 6
        # (5 tokens) STILL fits (first-fit); b is exhausted for 3+
        # tokens but a 2-token doc fits
        write_batch([(5, "a", text(7)), (6, "a", text(5)),
                     (7, "b", text(3)), (8, "b", text(2))], "b2")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM budget_stream").collect()
    finally:
        q.stop()
    by_doc = {r.doc_id: r for r in rows}
    assert len(by_doc) == 8                  # every doc gets a verdict row
    assert [by_doc[i].accepted for i in range(1, 9)] == \
        [True, True, True, False, False, True, False, True]
    assert by_doc[6].taken_after == 25       # source a exactly full
    assert by_doc[8].taken_after == 5        # 3 + 2
    # driver-side reference fold over the same order agrees
    ref_taken = {"a": 0, "b": 0}
    ref = {}
    for doc_id, src_, n in [(1, "a", 10), (2, "a", 10), (3, "b", 3),
                            (4, "b", 4), (5, "a", 7), (6, "a", 5),
                            (7, "b", 3), (8, "b", 2)]:
        ok = ref_taken[src_] + n <= budgets[src_]
        if ok:
            ref_taken[src_] += n
        ref[doc_id] = ok
    assert {d: r.accepted for d, r in by_doc.items()} == ref


# streaming CEP funnel --------------------------------------------------------

def _batch_funnel_truth(spark, events_df, wm_cut):
    """Batch recomputation of completed funnels with purchase below
    the watermark cut: the streaming contract's ground truth."""
    from pyspark.sql import Window
    ev = (events_df.filter(F.col("event_type")
                           .isin("view", "click", "purchase"))
          .select("user_id",
                  F.to_date(F.date_trunc("day", "ts")).alias("day"),
                  "event_type", "ts"))
    w = Window.partitionBy("user_id", "day")
    v = ev.withColumn("t_view", F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
    c = v.withColumn("t_click", F.min(
        F.when((F.col("event_type") == "click")
               & (F.col("ts") > F.col("t_view")), F.col("ts"))).over(w))
    p = c.withColumn("t_purchase", F.min(
        F.when((F.col("event_type") == "purchase")
               & (F.col("ts") > F.col("t_click")), F.col("ts"))).over(w))
    return {(r.user_id, r.day): (r.t_view, r.t_click, r.t_purchase)
            for r in (p.filter(F.col("t_purchase").isNotNull()
                               & (F.col("t_purchase") < F.lit(wm_cut)))
                      .select("user_id", "day", "t_view", "t_click",
                              "t_purchase").distinct().collect())}


def test_stream_funnel_matches_batch(spark, sf_dir):
    """Single-batch drive over the bounded events table: emitted
    conversions == batch funnel rows stable below the final
    watermark."""
    import datetime
    import tempfile

    from cube_builder_spark.streaming.cep import funnel_stream
    from cube_builder_spark.streaming.events import EVENT_SCHEMA
    from cube_builder_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="cep_funnel_")
    ev.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(d)
    q = (funnel_stream(stream).writeStream.outputMode("append")
         .format("memory").queryName("cep_sink").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.day): (r.view_ts, r.click_ts, r.purchase_ts)
           for r in spark.table("cep_sink").collect()}
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm_cut = max_ts - datetime.timedelta(hours=2)
    want = _batch_funnel_truth(spark, ev, wm_cut)
    assert got == want and len(want) > 0


def test_stream_funnel_out_of_order_and_no_reemit(spark, tmp_path):
    """The click arrives one BATCH before its view (out of order in
    arrival time, in order in event time): the conversion must still
    emit once the triple is watermark-stable, exactly once, and a
    second later purchase must not re-emit."""
    import datetime
    import time

    from cube_builder_spark.streaming.cep import funnel_stream

    d = tmp_path / "src"
    d.mkdir()
    sch = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, rows):
        spark.createDataFrame(rows, sch).coalesce(1) \
            .write.mode("overwrite").parquet(str(d / name))

    t0 = datetime.datetime(2024, 5, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    stream = (spark.readStream.schema(sch)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(d) + "/*/"))
    q = (funnel_stream(stream, watermark="10 minutes")
         .writeStream.outputMode("append")
         .format("memory").queryName("cep_ooo").start())

    # batch 1: the CLICK (event-time 10:05) and a purchase (10:08);
    # watermark after this batch = 10:08 - 10min = 09:58
    write_batch("b1", [(1, ts(5), 7, "click", 1.0, ""),
                       (2, ts(8), 7, "purchase", 1.0, "")])
    q.processAllAvailable()
    # batch 2: the VIEW arrives one batch late in ARRIVAL order but
    # its event time (10:00) is still >= the watermark, so it is
    # admitted; a far event then pushes the watermark past the triple
    write_batch("b2", [(3, ts(0), 7, "view", 1.0, ""),
                       (4, ts(600), 99, "view", 1.0, "")])
    q.processAllAvailable()
    time.sleep(0.5)
    q.processAllAvailable()
    got = [(r.user_id, r.view_ts, r.click_ts, r.purchase_ts)
           for r in spark.table("cep_ooo").collect()]
    assert got == [(7, ts(0), ts(5), ts(8))]
    # batch 3: a second purchase for the same day (event time above
    # the current watermark, so it is admitted): no re-emission
    write_batch("b3", [(5, ts(630), 7, "purchase", 1.0, ""),
                       (6, ts(1200), 99, "view", 1.0, "")])
    q.processAllAvailable()
    time.sleep(0.5)
    q.processAllAvailable()
    q.stop()
    assert spark.table("cep_ooo").count() == 1


def test_stateful_sessionize_randomized_vs_batch_model(spark, tmp_path):
    """Randomized differential for the applyInPandasWithState
    sessionizer (the round-12 reference-model pattern applied to the
    streaming plane): seeded random per-user event sets are streamed
    in micro-batches cut at RANDOM time boundaries — so sessions are
    split mid-stream and must continue through the state store — and
    a far-future closer batch flushes every real session. The closed
    sessions must equal a plain-Python gap sessionizer (>30 min) run
    on the full event set, dropping each user's final closer-only
    session. Batch cuts respect event-time order (a real stream's
    property; the operator's disorder tolerance is bounded by the
    watermark), but WITHIN a batch arrival order is random."""
    import datetime
    import glob
    import random
    import shutil

    from cube_builder_spark.streaming.events import EVENT_SCHEMA
    from cube_builder_spark.streaming.stateful import sessionize_stream

    t0 = datetime.datetime(2020, 1, 1, 8, 0, 0)

    for seed in (13, 29):
        rng = random.Random(seed)
        base = tmp_path / f"sess{seed}"
        (base / "in").mkdir(parents=True)
        events = []   # (user, minute, value)
        eid = 0
        for user in range(6):
            minutes = sorted(rng.sample(range(0, 100),
                                        rng.randint(2, 8)))
            for m in minutes:
                events.append((user, m, (m % 7) * 0.25))
        cuts = sorted(rng.sample(range(1, 100), 2))
        batches = [[e for e in events if e[1] < cuts[0]],
                   [e for e in events if cuts[0] <= e[1] < cuts[1]],
                   [e for e in events if e[1] >= cuts[1]]]
        batches.append([(u, 700, 0.0) for u in range(6)])  # closer

        def write_batch(rows, name):
            nonlocal eid
            out = []
            rng.shuffle(rows)          # arrival order random in-batch
            for u, m, v in rows:
                eid += 1
                out.append((eid, t0 + datetime.timedelta(minutes=m),
                            u, "click", v, "{}"))
            df = spark.createDataFrame(out, EVENT_SCHEMA)
            df.coalesce(1).write.mode("overwrite") \
                .parquet(str(base / "stage" / name))
            part = glob.glob(
                str(base / "stage" / name / "part-*.parquet"))[0]
            shutil.copy(part, str(base / "in" / f"{name}.parquet"))

        write_batch(batches[0], "b1")
        src = (spark.readStream.schema(EVENT_SCHEMA)
               .option("maxFilesPerTrigger", 1)
               .parquet(str(base / "in")))
        q = (sessionize_stream(src).writeStream.outputMode("append")
             .format("memory").queryName(f"sess{seed}").start())
        try:
            q.processAllAvailable()
            for i, b in enumerate(batches[1:], start=2):
                write_batch(b, f"b{i}")
                q.processAllAvailable()
            got = sorted(
                (r.user_id, r.session_start, r.session_end,
                 r.n_events, r.total_value_cents)
                for r in spark.sql(f"SELECT * FROM sess{seed}")
                .collect())
        finally:
            q.stop()

        # plain-python model over the full set; drop the closer-only
        # final session per user
        want = []
        per_user = {}
        for u, m, v in events:
            per_user.setdefault(u, []).append((m, v))
        for u, evs in per_user.items():
            evs.sort()
            sessions, cur = [], None
            for m, v in evs + [(700, 0.0)]:
                if cur is None or m - cur["end"] > 30:
                    if cur is not None:
                        sessions.append(cur)
                    cur = {"start": m, "end": m, "n": 0, "c": 0}
                cur["end"] = m
                cur["n"] += 1
                cur["c"] += int(round(v * 100))
            # cur is the open closer session — never emitted
            for s in sessions:
                want.append((
                    u, t0 + datetime.timedelta(minutes=s["start"]),
                    t0 + datetime.timedelta(minutes=s["end"]),
                    s["n"], s["c"]))
        assert got == sorted(want), seed

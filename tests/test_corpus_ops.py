"""Semantic tests for the corpus-curation operators (corpus_queries.py)
beyond the blanket oracle gate: packing invariants, stratum caps,
decontamination behavior on planted text, repetition signals on
degenerate text, and the decontaminate broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark import corpus_queries as cq


def _mini_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


@pytest.fixture()
def patched_docs(monkeypatch):
    """Route corpus_queries._docs at a literal in-memory table."""
    def patch(df):
        monkeypatch.setattr(cq, "_docs", lambda spark, sf_dir: df)
    return patch


def test_sequence_pack_invariants(spark, sf_dir):
    out = cq.p_sequence_pack(spark, sf_dir).collect()
    budget = cq._PACK_BUDGET
    assert out
    by_stream = {}
    for r in out:
        assert 0 <= r.offset_in_seq < budget
        assert r.seq_id == (r.offset_in_seq + budget * r.seq_id) // budget
        by_stream.setdefault((r.lang, r.shard), []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            # offsets are the running token sum: no gaps, no overlap
            assert r.seq_id * budget + r.offset_in_seq == cum
            assert r.spans_boundary == (
                (cum // budget) != ((cum + r.n_tokens - 1) // budget))
            cum += r.n_tokens


def test_stratified_sample_cap_and_determinism(spark, sf_dir):
    out = cq.p_stratified_sample(spark, sf_dir)
    counts = out.groupBy("lang", "source").count().collect()
    assert counts
    assert all(r["count"] <= cq._STRATUM_CAP for r in counts)
    # deterministic: same rows on a second run
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, cq.p_stratified_sample(spark, sf_dir).collect()))
    assert a == b


def test_decontaminate_planted_overlap(spark, patched_docs):
    shared = " ".join(f"w{i}" for i in range(cq._DECON_N))
    rows = [
        (0, shared + " evalpad onto something", "en", "src0", 0),
        (1, "begin " + shared + " end", "en", "src1", 0),       # contaminated
        (2, " ".join(f"x{i}" for i in range(20)), "en", "src1", 0),  # clean
        (3, "too short", "en", "src2", 0),                      # < n tokens
    ]
    patched_docs(_mini_docs(spark, rows))
    got = {r.doc_id: r for r in cq.p_decontaminate(spark, "unused").collect()}
    assert set(got) == {1, 2, 3}  # eval docs excluded from output
    assert got[1].contaminated and got[1].n_shared_ngrams == 1
    assert not got[2].contaminated and got[2].n_shared_ngrams == 0
    assert not got[3].contaminated


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    plan = cq.p_decontaminate(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the big (train) side must not be exchanged for the semi-join:
    # only the eval side builds a broadcast relation
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_repetition_profile_flags_degenerate_text(spark, patched_docs):
    rows = [
        (0, "spam ham " * 50, "en", "s", 0),          # pure 2-token loop
        (1, " ".join(f"u{i}" for i in range(100)), "en", "s", 0),  # all unique
    ]
    rows = [(i, t.strip(), l, s, n) for i, t, l, s, n in rows]
    patched_docs(_mini_docs(spark, rows))
    got = {r.doc_id: r for r in
           cq.t_repetition_profile(spark, "unused").collect()}
    loop, uniq = got[0], got[1]
    assert loop.dup_2gram_frac > 0.97          # 99 grams, 2 distinct
    assert loop.top_2gram_count == 50          # 'spam ham' appears 50x
    assert uniq.dup_2gram_frac == 0.0
    assert uniq.top_2gram_count == 1
    assert uniq.top_3gram_frac == pytest.approx(1.0 / 98)


def test_repetition_profile_short_docs(spark, patched_docs):
    rows = [(0, "one", "en", "s", 0), (1, "a b", "en", "s", 0)]
    patched_docs(_mini_docs(spark, rows))
    got = {r.doc_id: r for r in
           cq.t_repetition_profile(spark, "unused").collect()}
    # 1-token doc: no grams at all -> absent from the gram plane
    assert 0 not in got
    assert got[1].n_2grams == 1 and got[1].dup_3gram_frac is None

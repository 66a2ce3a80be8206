"""Blanket gate: every registered query with an oracle must hash-match
DuckDB at sf0.001 (mirrors the driver's CORRECTNESS run at sf0.01)."""

from __future__ import annotations

import pytest

from cube_builder_spark.oracle import compare
from cube_builder_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert sdf.count() >= 0  # rows-only check
        return
    problems = compare(sdf, duck, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))

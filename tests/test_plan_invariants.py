"""Engine-wide physical-plan invariants over EVERY registered query.

Two patterns must never appear at any scale:

- ``CartesianProduct`` — an unconstrained pair space. Intentional
  1-row/broadcast cross joins compile to BroadcastNestedLoopJoin,
  which is allowed; a shuffled cartesian is always a bug.
- ``BatchEvalPython`` — a row-at-a-time (pickled) Python UDF. All
  executor-side Python in this engine must be Arrow-batched
  (ArrowEvalPython / mapInPandas / applyInPandas*).

Plans are built (not executed) at sf0.001; queries whose CONSTRUCTION
runs bounded driver-side jobs (centroid collects, bloom builds,
checkpoints) still only pay those bounded jobs.
"""

from __future__ import annotations

import pytest

from cube_builder_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_pickled_udf(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian join"
    assert "BatchEvalPython" not in plan, \
        f"{name}: row-at-a-time Python UDF (use Arrow-batched forms)"

"""Streaming token-budget enforcement: the continuous twin of
``pipeline_queries.p_token_budget_mix``.

The batch mixer PLANS per-source sampling rates from a budget; this
operator ENFORCES a hard per-source token budget while documents
stream in (crawl shards landing continuously): each source admits
documents first-fit greedily — a document is accepted iff the tokens
already admitted for its source plus its own still fit the source's
budget; an oversized document is skipped but later smaller ones may
still fit. Admission survives micro-batch boundaries through keyed
state.

Scale shape: state is keyed by SOURCE and is O(1) per key (one int64
of tokens admitted + one accepted count) — the state store partitions
sources across tasks. Within one source admission is inherently
sequential (a budget is a running constraint), which is exactly the
per-key ordering applyInPandasWithState provides; across sources it
is embarrassingly parallel. Determinism: within a batch, a source's
documents are processed in doc_id order, so replays admit the same
set.

No SQL oracle by nature (the accept set depends on sequential
first-fit state); unit tests pin cross-batch continuation, boundary
rejection, and skip-then-fit semantics against a driver-side
reference fold.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BUDGET_STATE_SCHEMA = T.StructType([
    T.StructField("taken", T.LongType()),
    T.StructField("n_accepted", T.LongType()),
])

BUDGET_OUTPUT_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("accepted", T.BooleanType()),
    T.StructField("taken_after", T.LongType()),
])


def make_budget_fn(budgets: dict[str, int], default_budget: int):
    """Build the per-source stateful admission function. ``budgets``
    maps source -> token budget; unlisted sources get
    ``default_budget``. The dict is closed over and shipped to
    executors once per query (tiny)."""

    def budget_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        budget = budgets.get(source, default_budget)
        taken, n_acc = state.get if state.exists else (0, 0)
        rows = sorted(
            (r for pdf in pdfs for r in pdf.to_dict("records")),
            key=lambda r: int(r["doc_id"]))
        if not rows:
            return
        out = {"source": [], "doc_id": [], "n_tokens": [],
               "accepted": [], "taken_after": []}
        for r in rows:
            nt = int(r["n_tokens"])
            ok = taken + nt <= budget
            if ok:
                taken += nt
                n_acc += 1
            out["source"].append(source)
            out["doc_id"].append(int(r["doc_id"]))
            out["n_tokens"].append(nt)
            out["accepted"].append(ok)
            out["taken_after"].append(taken)
        state.update((taken, n_acc))
        yield pd.DataFrame(out)

    return budget_fn


def token_budget_stream(docs: DataFrame, budgets: dict[str, int],
                        default_budget: int) -> DataFrame:
    """Wire the admission function over a streaming (or batch)
    documents frame carrying (doc_id, source, text)."""
    toks = docs.select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    return (toks.groupBy("source")
            .applyInPandasWithState(
                make_budget_fn(budgets, default_budget),
                BUDGET_OUTPUT_SCHEMA, BUDGET_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

"""Stateful streaming exact-dedup: the streaming twin of
``functions/dedup.exact_dedup`` for continuous corpus ingestion.

Each micro-batch of documents is checked against the accumulated
content-hash state: the FIRST document of a hash (across the whole
stream's history) is emitted as canonical; later arrivals are emitted
flagged as duplicates with the canonical id (so downstream can count,
sample, or drop them). State is keyed by content hash — Spark's state
store partitions the hash space across tasks, so at any scale each
task owns a disjoint hash range, state never shuffles between
micro-batches, and per-key state is O(1) (canonical id + count), not
the document body.

``applyInPandasWithState`` is the right tool (not dropDuplicates):
the built-in keeps only a seen-set with watermark eviction, while the
pipeline needs the duplicate ROWS with their canonical attribution,
and an unbounded (no-watermark) identity guarantee.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("content_hash", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("canonical_id", T.LongType()),
    T.StructField("is_canonical", T.BooleanType()),
    T.StructField("n_seen_before", T.LongType()),
])

DEDUP_STATE_SCHEMA = T.StructType([
    T.StructField("canonical_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])


def dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
    """Per content hash: first arrival (lowest doc_id within the first
    batch it appears in) becomes canonical forever; every row is
    emitted with its attribution and the count of prior sightings."""
    (content_hash,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    doc_ids = sorted(int(d) for pdf in pdfs for d in pdf["doc_id"])
    if not doc_ids:
        return
    if state.exists:
        canonical, n_seen = state.get
    else:
        canonical, n_seen = doc_ids[0], 0
    rows = []
    for d in doc_ids:
        rows.append({"content_hash": content_hash, "doc_id": d,
                     "canonical_id": canonical,
                     "is_canonical": d == canonical and n_seen == 0,
                     "n_seen_before": n_seen})
        n_seen += 1
    state.update((canonical, n_seen))
    yield pd.DataFrame(rows)


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming documents (doc_id, text) -> per-arrival dedup ledger.
    No watermark: identity is unbounded by design (state is O(1) per
    distinct hash)."""
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(
                dedup_fn, DEDUP_OUTPUT_SCHEMA, DEDUP_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

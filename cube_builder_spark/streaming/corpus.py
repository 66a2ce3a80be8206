"""Streaming corpus curation: the continuous-ingestion twin of
``pipeline_queries.p_training_data_prep``'s gate→dedup front half.

Documents arrive as a stream (crawl dumps landing in object storage);
each micro-batch runs the STATELESS gates (language-ID, length,
quality — pure column projections, so they cost one map pass per
batch) and then the STATEFUL cross-batch exact-dedup ledger: the
first arrival of a content hash across the whole stream's history is
canonical, later arrivals are emitted attributed to it. Downstream
filters ``is_canonical`` for the curated stream, or keeps the full
ledger for dedup-rate monitoring.

Scale shape: state is keyed by content hash — the state store
partitions the hash space across tasks, per-key state is O(1)
(canonical id + count), and the gates drop rejects BEFORE they reach
the stateful operator, so state only ever grows with ACCEPTED distinct
content.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..functions import text as textf
from .dedup_stream import DEDUP_STATE_SCHEMA

PREP_MIN_TOKENS = 30
PREP_MIN_QUALITY = 0.35

PREP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("content_hash", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("predicted", T.StringType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("quality", T.DoubleType()),
    T.StructField("canonical_id", T.LongType()),
    T.StructField("is_canonical", T.BooleanType()),
    T.StructField("n_seen_before", T.LongType()),
])


def prep_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    """Per content hash: same canonical-forever contract as
    dedup_stream.dedup_fn, with the gate columns carried through."""
    (content_hash,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    rows_in = sorted(
        (r for pdf in pdfs for r in pdf.to_dict("records")),
        key=lambda r: int(r["doc_id"]))
    if not rows_in:
        return
    if state.exists:
        canonical, n_seen = state.get
    else:
        canonical, n_seen = int(rows_in[0]["doc_id"]), 0
    out = []
    for r in rows_in:
        d = int(r["doc_id"])
        out.append({"content_hash": content_hash, "doc_id": d,
                    "lang": r["lang"], "predicted": r["predicted"],
                    "n_tokens": int(r["n_tokens"]),
                    "quality": float(r["quality"]),
                    "canonical_id": canonical,
                    "is_canonical": d == canonical and n_seen == 0,
                    "n_seen_before": n_seen})
        n_seen += 1
    state.update((canonical, n_seen))
    yield pd.DataFrame(out)


def corpus_prep_stream(docs: DataFrame,
                       min_tokens: int = PREP_MIN_TOKENS,
                       min_quality: float = PREP_MIN_QUALITY,
                       lang: str = "en") -> DataFrame:
    """Streaming documents (doc_id, lang, text) → gated, cross-batch
    deduplicated curation ledger."""
    gated = (textf.gate_profile(docs)
             .filter((F.col("predicted") == lang)
                     & (F.col("n_tokens") >= min_tokens)
                     & (F.col("quality") >= min_quality))
             .select("doc_id", "lang", "predicted", "n_tokens", "quality",
                     "content_hash"))
    return (gated.groupBy("content_hash")
            .applyInPandasWithState(
                prep_fn, PREP_OUTPUT_SCHEMA, DEDUP_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

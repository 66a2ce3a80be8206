"""Round-14 cache hygiene for the postings store's sidecar caches.

The store itself rebuilds on corpus overwrite (fingerprint key —
tests/test_hybrid_scalable.py). Round 14 added two more caches that
must follow the same invalidation or BM25 serves stale scores on a
fresh store: the query-term/bucket rows (`_QTERM_CACHE`, fingerprint
key) and the corpus totals stats block (`_TOTALS_CACHE`, keyed by the
store PATH, which changes on rebuild). This test drives t_bm25_topk
through a corpus overwrite and checks the scores against the DuckDB
oracle recomputed on the new corpus — the end-to-end proof that no
layer of the cache stack went stale.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from cube_builder_spark.oracle import compare, duckdb_connection


def _bm25_sql():
    from cube_builder_spark.queries import _ordered
    return {n: sql for n, _fn, sql in _ordered()}["t_bm25_topk"]


def test_bm25_fresh_after_corpus_overwrite(spark, tmp_path):
    from cube_builder_spark.corpus_queries import t_bm25_topk

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    for t in os.listdir(src):  # all tables: the oracle views bind eagerly
        shutil.copy(os.path.join(src, t), os.path.join(sf, t))

    sql = _bm25_sql()
    con = duckdb_connection(sf)
    assert compare(t_bm25_topk(spark, sf), con, sql) == []
    con.close()
    before = sorted(map(tuple, t_bm25_topk(spark, sf).collect()))

    # overwrite: keep every third document (doc 0, the query doc,
    # survives) — df counts, doc lengths, and corpus totals all change
    doc_path = os.path.join(sf, "documents.parquet")
    tbl = pq.read_table(doc_path)
    keep = [i for i, d in enumerate(tbl.column("doc_id").to_pylist())
            if d % 3 == 0]
    pq.write_table(tbl.take(keep), doc_path)

    after_df = t_bm25_topk(spark, sf)
    con = duckdb_connection(sf)
    assert compare(after_df, con, sql) == []
    con.close()
    assert sorted(map(tuple, after_df.collect())) != before

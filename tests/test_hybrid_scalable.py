"""a_hybrid_rrf_scalable — the pruned-postings hybrid twin.

Pins (a) frame equality with the exact archetype at TWO scales
(sf0.001 and sf0.01 — the graded correctness scale), which is what
lets both twins share one oracle SQL, and (b) the scale property that
makes the twin worth having: the postings read carries a
PartitionFilters prune on the term-hash bucket, so a query touches
|q|-many partitions, never the whole store.
"""

from __future__ import annotations

import re


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_twins_equal_both_scales(spark):
    from cube_builder_spark.ann_queries import (a_hybrid_rrf_scalable,
                                                a_hybrid_search_rrf)
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        exact = _rows(a_hybrid_search_rrf(spark, sf))
        scal = _rows(a_hybrid_rrf_scalable(spark, sf))
        assert exact == scal, sf
        assert len(exact) == 10


def test_twins_share_oracle_sql():
    from cube_builder_spark.queries import _ordered
    sqls = {n: sql for n, _fn, sql in _ordered()
            if n in ("a_hybrid_search_rrf", "a_hybrid_rrf_scalable")}
    assert len(sqls) == 2
    assert sqls["a_hybrid_search_rrf"] == sqls["a_hybrid_rrf_scalable"]


def test_postings_read_is_partition_pruned(spark, sf_dir):
    """The lexical side must read the postings store through a
    partition filter on the bucket column — the inverted-index seek,
    not a full-store scan."""
    from cube_builder_spark.ann_queries import a_hybrid_rrf_scalable
    df = a_hybrid_rrf_scalable(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    assert "b#" in m.group(1) or " b " in m.group(1) or "b IN" in m.group(1), \
        m.group(0)


def test_ivf_vector_side_full_probe_equals_exact(spark, sf_dir):
    """hybrid_rrf_ivf with nprobe = n_lists probes every inverted
    list, so the vector candidates — and hence the fused output —
    must equal the exact twin exactly. This pins the IVF wiring
    without blessing a lossy nprobe as exact."""
    from cube_builder_spark.ann_queries import (a_hybrid_search_rrf,
                                                hybrid_rrf_ivf)
    exact = _rows(a_hybrid_search_rrf(spark, sf_dir))
    full = _rows(hybrid_rrf_ivf(spark, sf_dir, n_lists=8, nprobe=8))
    assert exact == full


def test_ivf_vector_side_lossy_probe_is_well_formed(spark, sf_dir):
    from cube_builder_spark.ann_queries import hybrid_rrf_ivf
    rows = hybrid_rrf_ivf(spark, sf_dir, n_lists=8, nprobe=1).collect()
    assert 0 < len(rows) <= 10
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the lexical half is exact either way: every row with a lexical
    # rank carries a positive contribution
    for r in rows:
        assert r.rrf_score > 0


def test_postings_store_rebuilds_on_corpus_overwrite(spark, tmp_path):
    """Round-12 ADVICE: the postings-store cache was keyed on sf_dir
    alone for the interpreter lifetime, so a corpus overwrite
    mid-session served STALE postings while the exact twin read fresh
    data — the twins diverged under their shared oracle. The key now
    carries the source fingerprint (the matview invalidation pattern):
    after an overwrite the store rebuilds, the twins agree on the NEW
    corpus, and the superseded store's scratch is reclaimed."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from cube_builder_spark import ann_queries
    from cube_builder_spark.ann_queries import (_POSTINGS_STORES,
                                                a_hybrid_rrf_scalable,
                                                a_hybrid_search_rrf)

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    for t in ("documents.parquet", "embeddings.parquet"):
        shutil.copy(os.path.join(src, t), os.path.join(sf, t))

    before = _rows(a_hybrid_rrf_scalable(spark, sf))
    assert before == _rows(a_hybrid_search_rrf(spark, sf))
    old_keys = [k for k in _POSTINGS_STORES
                if k.startswith(f"hybrid_postings_{sf}|")]
    assert len(old_keys) == 1
    old_path = _POSTINGS_STORES[old_keys[0]]

    # overwrite the corpus: drop two-thirds of the documents (doc 0,
    # the query document, survives) — df counts and candidates change
    doc_path = os.path.join(sf, "documents.parquet")
    tbl = pq.read_table(doc_path)
    keep = [i for i, d in enumerate(tbl.column("doc_id").to_pylist())
            if d % 3 == 0]
    pq.write_table(tbl.take(keep), doc_path)

    after = _rows(a_hybrid_rrf_scalable(spark, sf))
    # the twins agree on the NEW corpus — the stale store would have
    # kept serving the old candidates/df counts
    assert after == _rows(a_hybrid_search_rrf(spark, sf))
    assert after != before
    new_keys = [k for k in _POSTINGS_STORES
                if k.startswith(f"hybrid_postings_{sf}|")]
    assert len(new_keys) == 1 and new_keys[0] != old_keys[0]
    # the superseded store's scratch was purged, not leaked until exit
    assert not os.path.exists(old_path)
    assert os.path.exists(_POSTINGS_STORES[new_keys[0]])

"""Bloom-filter semi-join pruning: no false negatives, lossless join,
bounded filter size."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.functions import bloom
from cube_builder_spark.tables import load_tables


def test_bloom_has_no_false_negatives(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    dim = (t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
           .select("o_orderkey"))
    mask = bloom.build(dim, "o_orderkey")
    assert len(mask) == 4096 // 64  # bounded metadata: 512 bytes
    # every build-side key must pass its own filter
    missed = dim.filter(~bloom.might_contain(F.col("o_orderkey"), mask))
    assert missed.count() == 0


def test_pruned_join_equals_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    dim = (t["orders"]
           .filter((F.col("o_orderpriority") == "1-URGENT")
                   & (F.col("o_orderstatus") == "F"))
           .select("o_orderkey"))
    li = t["lineitem"].select("l_orderkey", "l_linenumber")
    plain = li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
    pruned = bloom.pruned_join(li, dim, "l_orderkey", "o_orderkey")
    key = lambda r: (r.l_orderkey, r.l_linenumber)  # noqa: E731
    assert sorted(map(key, pruned.collect())) \
        == sorted(map(key, plain.collect()))


def test_bloom_actually_prunes(spark, sf_dir):
    """With a selective dim slice the filter must reject most fact
    rows — otherwise it's dead weight at any scale."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    dim = (t["orders"]
           .filter((F.col("o_orderpriority") == "1-URGENT")
                   & (F.col("o_orderstatus") == "F"))
           .select("o_orderkey"))
    mask = bloom.build(dim, "o_orderkey")
    n_fact = t["lineitem"].count()
    n_pass = t["lineitem"].filter(
        bloom.might_contain(F.col("l_orderkey"), mask)).count()
    n_match = (t["lineitem"]
               .join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
               .count())
    assert n_match <= n_pass < n_fact
    # the pass set should be far closer to the true matches than to
    # the full scan (false-positive rate well under 50% of the resid)
    assert (n_pass - n_match) < (n_fact - n_match) * 0.5


def test_positions_safe_for_huge_keys(spark, sf_dir):
    """Round-5 advisor fix: keys >= ~3.4e9 overflowed the affine
    product int64 in the old formulation (negative positions ->
    element_at errors / wrong bits). Positions must be in [0, mbits)
    for any int64 key, and membership must still hold."""
    from cube_builder_spark.functions import bloom
    big = spark.createDataFrame(
        [(2**62,), (2**63 - 1,), (3_400_000_000,), (-17,), (0,)],
        "k long")
    pos = big.select(*[p.alias(f"p{j}") for j, p in
                       enumerate(bloom.positions(F.col("k"), 3, 4096))])
    for r in pos.collect():
        for j in range(3):
            assert 0 <= r[f"p{j}"] < 4096, r
    mask = bloom.build(big, "k", k=3, mbits=4096)
    hits = big.filter(bloom.might_contain(F.col("k"), mask, 3, 4096))
    assert hits.count() == 5  # no false negatives on the build keys

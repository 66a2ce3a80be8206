"""Salted-join: result identical to the plain join, hot key spread
across multiple shuffle sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.functions.skew import salted_join
from cube_builder_spark.tables import load_tables


def _sides(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "nation"])
    fact = t["lineitem"].select(
        F.when(F.col("l_quantity") <= 25, F.lit(1))
        .otherwise(F.col("l_orderkey") % 25).alias("hot_key"),
        "l_orderkey", "l_linenumber")
    dim = t["nation"].select("n_nationkey", "n_name")
    return fact, dim


def test_salted_join_equals_plain_join(spark, sf_dir):
    fact, dim = _sides(spark, sf_dir)
    plain = fact.join(dim, F.col("hot_key") == F.col("n_nationkey"))
    salted = salted_join(fact, dim, "hot_key", "n_nationkey", salt_n=8)
    key = lambda r: (r.l_orderkey, r.l_linenumber, r.n_name)  # noqa: E731
    assert sorted(map(key, salted.collect())) \
        == sorted(map(key, plain.collect()))


def test_salt_actually_spreads_the_hot_key(spark, sf_dir):
    """The hot key's rows must carry several distinct salt values —
    i.e. land in several shuffle sub-keys, not one reducer."""
    fact, _dim = _sides(spark, sf_dir)
    n_salts = (fact.filter(F.col("hot_key") == 1)
               .withColumn("s", (F.monotonically_increasing_id() % 8)
                           .cast("int"))
               .select("s").distinct().count())
    assert n_salts >= 4


def test_left_join_preserves_unmatched_rows(spark, sf_dir):
    """Replication must not drop or duplicate the unmatched side:
    left join row count == plain left join row count."""
    fact, dim = _sides(spark, sf_dir)
    # restrict dim so some fact keys have no match
    dim5 = dim.filter(F.col("n_nationkey") < 5)
    plain = fact.join(dim5, F.col("hot_key") == F.col("n_nationkey"),
                      "left").count()
    salted = salted_join(fact, dim5, "hot_key", "n_nationkey",
                         salt_n=8, how="left").count()
    assert salted == plain


def test_right_and_full_outer_rejected(spark, sf_dir):
    """Round-5 advisor fix: the salt_n-fold small-side replication
    would surface each unmatched small row salt_n times under
    right/full outer joins — those forms must raise."""
    import pytest
    from cube_builder_spark.functions.skew import salted_join
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(5).select(F.col("id").alias("j"))
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", "j", salt_n=4, how=how)

"""Skew-salting for hot-key equi-joins.

When a join key is heavily skewed (one key holding a double-digit
percent of a 100 TB fact table), the shuffle sends that key's entire
volume to ONE reducer: the job runs at single-task speed and can OOM.
AQE's skew-join splitter handles many cases at runtime, but only for
sort-merge joins it can see; explicit salting is the portable fix and
also composes with aggregation.

Shape: the big side adds a salt in [0, n) (row-local, no shuffle —
the salt only needs to SPREAD rows, its value is irrelevant to the
result); the small side replicates each row n times, once per salt.
Joining on (key, salt) splits every hot key across n reducers. For
inner/left joins the result is EXACTLY the plain join — replication
guarantees each big row still meets each matching small row exactly
once (right/full outer are rejected: unmatched small rows would
appear once per salt).

Cost model: small-side volume × n. Worth it iff the small side is
modest but above broadcast size, or the join must be shuffle-based
anyway. For a truly small dim, `broadcast()` beats salting — use
this when BOTH sides are too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, salt_n: int = 8,
                how: str = "inner") -> DataFrame:
    """`big ⋈ small` on ``big_key = small_key``, spread over
    ``salt_n`` sub-keys per join key. Output columns = big ∪ small
    (salt columns dropped); row multiset identical to the plain
    join.

    ``how`` is restricted to inner/left/left_semi/left_anti: the
    small side is replicated salt_n-fold, so under right/full outer
    joins each UNMATCHED small-side row would surface salt_n times —
    a different multiset than the plain join."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the salt_n-fold "
            "small-side replication multiplies unmatched small rows "
            "under right/full outer joins; use inner/left* forms")
    b = big.withColumn(
        _SALT, (F.monotonically_increasing_id() % salt_n).cast("int"))
    s = small.withColumn(
        f"{_SALT}_s",
        F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    joined = b.join(
        s, (F.col(big_key) == F.col(small_key))
        & (F.col(_SALT) == F.col(f"{_SALT}_s")), how)
    return joined.drop(_SALT, f"{_SALT}_s")

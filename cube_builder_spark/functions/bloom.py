"""Bloom-filter semi-join pruning — the explicit runtime-filter
pattern for joins whose build side is selective but whose probe side
is enormous.

At 100 TB the expensive part of `fact ⋈ dim-slice` is shuffling the
fact table on the join key. A Bloom filter built over the dim-slice's
keys is bounded metadata (mbits/8 bytes, a few KB) that broadcasts to
every fact task and drops most non-matching rows AT THE SCAN, before
the shuffle — the same idea as Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled` injection, made
explicit so the filter can be persisted and reused across queries.

Determinism (what makes it SQL-oracle-able): positions come from k
integer affine hashes `((key mod R) * P_j + j) mod mbits` with
R = 2^31-1 — exact, overflow-free int64 in both engines — rather than engine-private hash functions. The membership
test is conjunctive over the SAME bit set, so false positives are
identical everywhere: a row passes iff all k positions are set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# distinct odd multipliers; spread is adequate for the affine family
# because keys are integers and mbits is a power of two times small k
_PRIMES = (2654435761, 40503, 69069, 2246822519, 3266489917)


# pre-multiply reducer: keys are folded into [0, 2^31) so the affine
# product stays under 2^63 for ANY int64 key — a raw key >= ~3.4e9
# times the largest multiplier would wrap negative in Spark (and error
# in DuckDB), corrupting positions and cross-engine determinism
_REDUCER = 2147483647  # 2^31 - 1 (Mersenne prime)


def positions(key: Column, k: int = 3, mbits: int = 4096) -> list[Column]:
    """The k bit positions of a key (exact, overflow-free int64 affine
    hashes; pmod keeps positions non-negative for negative keys)."""
    folded = F.pmod(key.cast("long"), F.lit(_REDUCER))
    return [F.pmod(folded * F.lit(_PRIMES[j]) + F.lit(j), F.lit(mbits))
            for j in range(k)]


# signed-long single-bit masks: 1<<s for s<63, and the sign bit for 63
_POW2 = [(1 << s) if s < 63 else -(1 << 63) for s in range(64)]


def _bit_of(pos: Column) -> Column:
    """The single-bit long for ``pos % 64`` (shiftleft needs a literal
    shift amount, so index a 64-entry power-of-two array instead)."""
    arr = F.array(*[F.lit(v) for v in _POW2])
    return F.element_at(arr, (pos % 64).cast("int") + 1)


def build(df: DataFrame, key: str, k: int = 3,
          mbits: int = 4096) -> list[int]:
    """Build the filter over ``df[key]``: one explode of k positions
    per row, one map-side-combining groupBy(word) with bit_or, then a
    bounded collect of mbits/64 longs. The build side is the SMALL
    side by assumption — this is one cheap aggregation."""
    pos = df.select(F.explode(F.array(*positions(F.col(key), k, mbits)))
                    .alias("pos"))
    words = (pos.groupBy(F.floor(F.col("pos") / 64).cast("int").alias("w"))
             .agg(F.bit_or(_bit_of(F.col("pos"))).alias("bits"))
             .collect())
    mask = [0] * (mbits // 64)
    for r in words:
        mask[int(r.w)] = int(r.bits)
    return mask


def might_contain(key: Column, mask: list[int], k: int = 3,
                  mbits: int = 4096) -> Column:
    """Membership predicate against a collected bitmask: the mask is
    baked into the plan as an array literal, each of the k tests is
    `element_at(mask, pos/64 + 1) & single_bit(pos%64) != 0` —
    whole-stage codegen, no join."""
    arr = F.array(*[F.lit(int(w)) for w in mask])
    cond = F.lit(True)
    for pos in positions(key, k, mbits):
        word = F.element_at(arr, F.floor(pos / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_of(pos)) != 0)
    return cond


def pruned_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, k: int = 3, mbits: int = 4096,
                how: str = "inner") -> DataFrame:
    """`fact ⋈ dim` with a Bloom pre-filter on the fact scan. The
    result is IDENTICAL to the plain join (the join removes the false
    positives); the filter only shrinks what reaches the shuffle."""
    mask = build(dim, dim_key, k, mbits)
    pruned = fact.filter(might_contain(F.col(fact_key), mask, k, mbits))
    return pruned.join(dim, F.col(fact_key) == F.col(dim_key), how)

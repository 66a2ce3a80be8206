"""MRL quantile sketch: accuracy bound on adversarial input shapes,
merge associativity, determinism, serialization round-trip."""

from __future__ import annotations

import random

import pytest

from cube_builder_spark.functions.quantile_sketch import MRLSketch

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _worst_rank_err(sketch, vals):
    sv = sorted(vals)
    n = len(vals)
    worst = 0.0
    for q in QS:
        ans = sketch.quantile(q)
        lo = sum(1 for v in sv if v < ans)
        hi = sum(1 for v in sv if v <= ans)
        target = max(1, -(-int(q * n * 100) // 100))
        err = 0 if lo + 1 <= target <= hi else min(
            abs(target - (lo + 1)), abs(target - hi))
        worst = max(worst, err / n)
    return worst


@pytest.mark.parametrize("shape", ["random", "sorted", "reversed",
                                   "constant", "two_values"])
def test_bound_on_adversarial_shapes(shape):
    rng = random.Random(11)
    vals = {
        "random": [rng.random() for _ in range(40000)],
        "sorted": list(range(40000)),
        "reversed": list(range(40000, 0, -1)),
        "constant": [7] * 40000,
        "two_values": [0] * 20000 + [1] * 20000,
    }[shape]
    s = MRLSketch(256)
    for v in vals:
        s.update(v)
    assert _worst_rank_err(s, vals) <= 0.05


def test_merge_matches_bound_and_is_deterministic():
    rng = random.Random(3)
    vals = [rng.randrange(10**6) for _ in range(30000)]
    halves = (vals[:15000], vals[15000:])
    a, b = MRLSketch(256), MRLSketch(256)
    for v in halves[0]:
        a.update(v)
    for v in halves[1]:
        b.update(v)
    a.merge(b)
    assert a.n == 30000
    assert _worst_rank_err(a, vals) <= 0.05
    # determinism: rebuilding identically gives identical answers
    a2, b2 = MRLSketch(256), MRLSketch(256)
    for v in halves[0]:
        a2.update(v)
    for v in halves[1]:
        b2.update(v)
    a2.merge(b2)
    assert [a.quantile(q) for q in QS] == [a2.quantile(q) for q in QS]


def test_items_roundtrip_and_size():
    rng = random.Random(5)
    s = MRLSketch(256)
    for _ in range(50000):
        s.update(rng.random())
    items = s.items()
    assert len(items) < 256 * 12            # O(k log(n/k)) summary
    t = MRLSketch.from_items(256, s.n, items)
    assert [t.quantile(q) for q in QS] == [s.quantile(q) for q in QS]


def test_k_validation_and_empty():
    with pytest.raises(ValueError):
        MRLSketch(3)
    with pytest.raises(ValueError):
        MRLSketch(0)
    assert MRLSketch(4).quantile(0.5) is None
    with pytest.raises(ValueError):
        MRLSketch(4).merge(MRLSketch(8))


@pytest.mark.parametrize("n", [0, 1, 255, 256, 257, 512, 10007, 100000])
def test_from_stream_identical_to_update_loop(n):
    """from_stream (the r15 vectorized partition build) must reproduce
    the item-at-a-time sketch EXACTLY: same levels, same compaction
    counters, same n — on random, sorted, reversed and constant
    streams of awkward lengths around the k boundary."""
    import numpy as np
    rng = random.Random(n + 3)
    streams = [
        [rng.randrange(10**6) for _ in range(n)],
        list(range(n)),
        list(range(n, 0, -1)),
        [42] * n,
    ]
    for vals in streams:
        a = MRLSketch(256)
        for v in vals:
            a.update(v)
        b = MRLSketch.from_stream(
            256, np.array(vals, dtype=np.int64))
        assert a.n == b.n
        assert a.levels == b.levels
        assert a._compactions == b._compactions

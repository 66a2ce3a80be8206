"""Deterministic mergeable quantile sketch (Munro-Paterson / MRL
compactor family — the DETERMINISTIC ancestor of KLL; Manku,
Rajagopalan & Lindsay 1998).

Why not t_length_quantiles' exact value-count method? That is the
right answer when the value domain is small (it groups by value). For
an unbounded/continuous column at 100 TB the mergeable-summary shape
is the one that works: each partition builds a small sketch in one
pass, sketches MERGE associatively (ship O(k·log n) values, not rows),
and the final answer carries a worst-case rank-error GUARANTEE. KLL
randomizes its compaction offset for a better constant; this
implementation keeps the classic deterministic variant — a per-level
compaction COUNTER alternates the offset (even/odd) instead of a coin,
so repeated runs are bit-identical (the whole repo's oracle discipline)
while retaining the alternation that cancels directional bias.

Error bound (standard compactor argument): each compaction at level l
perturbs any rank by at most 2^l, alternation cancels half of it in
the worst case, and level l sees about n/(k·2^l) compactions, giving
total rank error ≤ L·n/(2k) with L = log2(n/k) levels — ε ≈ L/(2k).
With k=256 and n ≤ 10^6: ε ≲ 0.03. Tests pin ε ≤ 0.05 empirically on
adversarial (sorted, reversed, constant) inputs.
"""

from __future__ import annotations

from bisect import insort

__all__ = ["MRLSketch", "K_DEFAULT"]

K_DEFAULT = 256


class MRLSketch:
    """Levels of sorted buffers; items at level l carry weight 2^l."""

    def __init__(self, k: int = K_DEFAULT):
        if k < 2 or k % 2:
            raise ValueError("k must be an even integer >= 2")
        self.k = k
        self.levels: list[list] = [[]]
        self.n = 0                      # total weight (items represented)
        self._compactions: list[int] = [0]   # per-level counter → offset

    # -- build ----------------------------------------------------------
    def update(self, v) -> None:
        insort(self.levels[0], v)
        self.n += 1
        self._compact_from(0)

    def _compact_from(self, level: int) -> None:
        while level < len(self.levels) and len(self.levels[level]) >= self.k:
            buf = self.levels[level]
            if level + 1 == len(self.levels):
                self.levels.append([])
                self._compactions.append(0)
            # deterministic alternation: the compaction counter's
            # parity picks which half survives (KLL flips a coin here)
            off = self._compactions[level] % 2
            self._compactions[level] += 1
            survivors = buf[off::2]
            self.levels[level] = []
            up = self.levels[level + 1]
            for s in survivors:
                insort(up, s)
            level += 1

    @classmethod
    def from_stream(cls, k: int, values) -> "MRLSketch":
        """Vectorized equivalent of ``update()`` over a whole stream —
        bit-identical levels/compaction state, built with numpy row
        sorts instead of one insort per item (guide §4.2: hand whole
        batches to native code).

        Why it is exact: ``update`` keeps level 0 sorted and compacts
        the moment it holds k items, so level-0 compaction j consumes
        precisely stream items [j·k, (j+1)·k) and survivors are
        ``sorted(chunk)[j % 2::2]``. Every level l ≥ 1 receives k/2
        survivors per lower compaction and compacts the moment it
        holds two batches, so its compaction j consumes lower batches
        (2j, 2j+1) — consecutive non-overlapping pairs in arrival
        order. Buffer contents at compaction depend only on the item
        multiset (the buffer is sorted), never on insertion order, so
        chunk-at-a-time reproduces the item-at-a-time state exactly
        (tests/test_quantile_sketch.py pins equality on random and
        adversarial streams)."""
        import numpy as np
        s = cls(k)
        a = np.asarray(values, dtype=np.int64)
        s.n = int(a.size)
        m = a.size // k
        s.levels[0] = sorted(a[m * k:].tolist())
        if m == 0:
            return s
        chunks = np.sort(a[:m * k].reshape(m, k), axis=1)
        even = (np.arange(m) % 2 == 0)[:, None]
        batches = np.where(even, chunks[:, 0::2], chunks[:, 1::2])
        s._compactions[0] = m
        level = 1
        while True:
            while len(s.levels) <= level:
                s.levels.append([])
                s._compactions.append(0)
            nb = batches.shape[0]
            pairs = nb // 2
            s.levels[level] = sorted(batches[pairs * 2:].ravel().tolist())
            if pairs == 0:
                break
            merged = np.sort(
                batches[:pairs * 2].reshape(pairs, batches.shape[1] * 2),
                axis=1)
            even = (np.arange(pairs) % 2 == 0)[:, None]
            batches = np.where(even, merged[:, 0::2], merged[:, 1::2])
            s._compactions[level] = pairs
            level += 1
        return s

    # -- merge ----------------------------------------------------------
    def merge(self, other: "MRLSketch") -> "MRLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self._compactions.append(0)
        for l, buf in enumerate(other.levels):
            mine = self.levels[l]
            for v in buf:
                insort(mine, v)
        self.n += other.n
        for l in range(len(self.levels)):
            self._compact_from(l)
        return self

    # -- serialize (for shipping per-partition sketches) ----------------
    def items(self) -> list[tuple[int, object]]:
        """(level, value) pairs; value carries weight 2^level."""
        return [(l, v) for l, buf in enumerate(self.levels) for v in buf]

    @classmethod
    def from_items(cls, k: int, n: int,
                   items: list[tuple[int, object]]) -> "MRLSketch":
        s = cls(k)
        top = max((l for l, _v in items), default=0)
        while len(s.levels) <= top:
            s.levels.append([])
            s._compactions.append(0)
        for l, v in items:
            insort(s.levels[l], v)
        s.n = n
        for l in range(len(s.levels)):
            s._compact_from(l)
        return s

    # -- query ----------------------------------------------------------
    def quantile(self, q: float):
        """Weighted nearest-rank: the smallest stored value whose
        cumulative weight reaches q·n."""
        if self.n == 0:
            return None
        weighted = sorted(
            (v, 1 << l) for l, buf in enumerate(self.levels) for v in buf)
        cum = 0
        total = sum(w for _v, w in weighted)
        # nearest-rank target against the sketch's total stored weight
        # (compactions keep total within one buffer of n)
        target_w = max(1, min(total, -(-(total * int(q * 10000)) // 10000)))
        for v, w in weighted:
            cum += w
            if cum >= target_w:
                return v
        return weighted[-1][0]

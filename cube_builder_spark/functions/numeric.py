"""Numeric helpers shared by the query surface.

The one that matters: exact integer cents WITHOUT Spark's
BigDecimal-backed ``F.round``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up_long(col: Column, factor: int = 100) -> Column:
    """``round(col * factor)`` as a BIGINT via pure double arithmetic:
    ``floor(v + 0.5)``.

    Spark's ``F.round`` on doubles routes every row through
    ``BigDecimal`` (shortest-decimal rendering, HALF_UP) — measured
    3-4x slower than the whole remaining join+agg pipeline in a hot
    aggregate (r11_multiway_join at sf0.1: 4.1s with F.round in the
    sum vs 1.2s without; this form keeps the exactness at double
    speed). ``floor(v + 0.5)`` rounds the BINARY double half-up —
    which for the non-negative cents-scaled domains used here is
    exactly DuckDB's ``round(v)`` (half away from zero), so oracle
    parity is unchanged; every registered query re-verifies this
    through the DuckDB gate. Domain note: half-up and half-away
    differ only for NEGATIVE values lying exactly on a .5 boundary —
    keep ``F.round`` if such a domain ever appears.
    """
    return F.floor(col * factor + F.lit(0.5)).cast("long")


def bounded_collect(df, ceiling: int, what: str) -> list:
    """``df.collect()`` with a hard row ceiling — the guard in front
    of every driver-side fold over a "bounded by argument" frame
    (t_textrank's vocab-gated edge list, e_markov_steady_state's
    |types|² transition matrix). The bound is enforced, not assumed:
    the scan collects at most ``ceiling + 1`` rows (``limit`` caps the
    transfer, so a pathological input can never materialize an
    unbounded driver copy), and one row over the ceiling raises
    instead of silently folding a quadratic frame.
    """
    rows = df.limit(ceiling + 1).collect()
    if len(rows) > ceiling:
        raise ValueError(
            f"{what}: driver-side fold ceiling exceeded "
            f"(> {ceiling} rows) — the input violates the documented "
            "boundedness assumption; refusing to collect it")
    return rows

"""Row-level security + column masking policies — the governance
plane (Delta/Unity row filters & column masks, Snowflake masking
policies) as declarative view rewriting.

A policy is data, not code: a row-filter predicate plus per-column
masking expressions, both plain SQL strings compiled with ``F.expr``
into the SAME Catalyst plan a hand-written secure view would produce —
filters push down to the scan, masks stay whole-stage-codegen
expressions, nothing is evaluated driver-side. ``apply_policy`` is the
single enforcement point: a table handed to an untrusted role goes
through it before any further query plan is built, so the rewritten
DataFrame IS the table as far as that role's plans are concerned
(the secure-view contract).

Masks must be deterministic SQL over the row itself (no lookups), so
policy application never adds a shuffle or a join — at 100 TB the
governed read costs exactly the ungoverned read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Policy:
    """One role's view of one table."""

    row_filter: str | None = None
    column_masks: dict[str, str] = field(default_factory=dict)

    def validate(self, df: DataFrame) -> None:
        missing = sorted(set(self.column_masks) - set(df.columns))
        if missing:
            raise ValueError(f"masked columns not in table: {missing}")


def apply_policy(df: DataFrame, policy: Policy) -> DataFrame:
    """Rewrite ``df`` to the policy's governed view: row filter first
    (so masks never see filtered-out rows), then masks replace columns
    IN PLACE keeping the original schema order — downstream code and
    the ungoverned plan stay column-compatible."""
    policy.validate(df)
    out = df
    if policy.row_filter:
        out = out.filter(F.expr(policy.row_filter))
    if policy.column_masks:
        out = out.select(*[
            F.expr(policy.column_masks[c]).alias(c)
            if c in policy.column_masks else F.col(c)
            for c in df.columns])
    return out


def role_views(df: DataFrame, policies: dict[str, Policy]) -> dict:
    """All roles' governed views of one table (the catalog shape: a
    table carries one policy per role; resolution picks the role's)."""
    return {role: apply_policy(df, p) for role, p in policies.items()}

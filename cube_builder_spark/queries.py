"""Central query/oracle registry.

Aggregates the per-module registries into the ``queries()`` /
``oracle_sql()`` surface that ``__spark_entry__.py`` exposes to the
driver (one entry per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "cube_builder_spark.relational",
    "cube_builder_spark.cube_queries",
    "cube_builder_spark.catalog_queries",
    "cube_builder_spark.pipeline_queries",
    "cube_builder_spark.events_queries",
]


def _registries():
    import importlib
    for mod_name in _MODULES:
        mod = importlib.import_module(mod_name)
        yield from mod.REGISTRY


def all_queries() -> dict[str, QueryFn]:
    return {name: fn for name, fn, _sql in _registries()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, _fn, sql in _registries() if sql is not None}

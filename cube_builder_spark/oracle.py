"""DuckDB-oracle comparison helpers (mirror of the driver's gate).

Comparison contract: row count, column-name set, and an
order-insensitive value hash computed over columns sorted by name.
"""

from __future__ import annotations

import math


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(rows, cols) -> list[str]:
    """Canonical sorted row strings, columns ordered by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the driver's table views pre-registered."""
    import duckdb

    from .tables import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def driver_hazards(sdf, con, sql: str) -> list[str]:
    """Static checks for output shapes that pass a tuple-level compare
    but FAIL under the grading driver (learned in round 1):

    - DuckDB HUGEINT result columns (uncast integer ``sum()``) render
      as pandas float64 and hash-diverge from Spark int64;
    - array-typed output columns crash the driver's pandas-sort
      canonicalizer (``unhashable type: 'list'``)."""
    problems = []
    for f in sdf.schema.fields:
        if f.dataType.typeName() in ("array", "map", "struct"):
            problems.append(
                f"driver-hazard: spark column {f.name!r} is {f.dataType.simpleString()}"
                " (serialize to string: driver canon crashes on it)")
    try:
        typed = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        typed = []
    for row in typed:
        cname, ctype = row[0], str(row[1]).upper()
        if "HUGEINT" in ctype:
            problems.append(
                f"driver-hazard: oracle column {cname!r} is HUGEINT"
                " (CAST the sum to BIGINT: pandas renders it float64)")
        if ctype.endswith("[]"):
            problems.append(
                f"driver-hazard: oracle column {cname!r} is a list type"
                " (serialize to string)")
    return problems


def compare(sdf, con, sql: str) -> list[str]:
    """Compare a Spark DataFrame against oracle SQL; return problem list."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems = driver_hazards(sdf, con, sql)
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
    if not problems:
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            diff = next((i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), None)
            problems.append(
                "values differ at canonical row "
                f"{diff}:\n  spark : {cs[diff][:300]}\n  duckdb: {cd[diff][:300]}")
    return problems

"""Cloud/quality masking — C7 value-list, C8 bitwise QA, C9 radsat,
C10 cross-band post-processing.

All pure Catalyst column expressions (bit shifts, isin maps,
conditional aggregation) — the reference's numpy kernels
(``processing.py:446-518,812-817``, ``image.py:249-290,418-608``)
become whole-stage-codegen'd JVM expressions.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Landsat C2 QA confidence levels (image.py:428-431)
NO_CONFIDENCE, LOW, MEDIUM, HIGH = 0, 1, 2, 3
RESERVED = MEDIUM

# QA_PIXEL 2-bit confidence fields (QAConfidence.apply, image.py:493-509:
# `(qa >> lo) - ((qa >> lo+2) << 2)` == bits [lo, lo+1])
CONFIDENCE_FIELDS = {"cloud": (8, 9), "cloud_shadow": (10, 11),
                     "snow": (12, 13), "cirrus": (14, 15)}

_CONF_CONSTS = {"NO_CONFIDENCE": NO_CONFIDENCE, "LOW": LOW,
                "MEDIUM": MEDIUM, "RESERVED": RESERVED, "HIGH": HIGH}


def classify_mask(quality: Column, clear_data: list[int], not_clear_data: list[int],
                  saturated_data: list[int], nodata: int) -> Column:
    """C7 (parse_mask + application, processing.py:1327-1383,810-817):
    map a quality value to 'clear' / 'not_clear' / 'saturated' /
    'nodata' / 'other'. Order mirrors the reference's mask writes —
    the clear list is applied last and wins."""
    col = F.when(quality.isin(*clear_data), F.lit("clear"))
    if not_clear_data:
        col = col.when(quality.isin(*not_clear_data), F.lit("not_clear"))
    if saturated_data:
        col = col.when(quality.isin(*saturated_data), F.lit("saturated"))
    return col.when(quality == nodata, F.lit("nodata")).otherwise(F.lit("other"))


def extract_bits(col: Column, bit_start: int, bit_end: int | None = None) -> Column:
    """C9 (radsat_extract_bits, image.py:249-290): (v >> start) & mask."""
    if bit_end is None:
        bit_end = bit_start
    mask = (1 << (bit_end - bit_start + 1)) - 1
    return F.shiftright(col.cast("int"), bit_start).bitwiseAND(F.lit(mask))


def qa_bit(col: Column, bit: int) -> Column:
    """C8 (extract_qa_bits, image.py:418-425): value of a single QA bit
    as boolean."""
    return col.cast("int").bitwiseAND(F.lit(1 << bit)) > 0


def qa_pixel_clear(qa: Column, clear_bits: list[int], not_clear_bits: list[int],
                   nodata: int, cloud_conf_min: int | None = None,
                   shadow_conf_min: int | None = None) -> Column:
    """C8 (get_qa_mask, image.py:514-608): Landsat C2 QA_PIXEL clear
    test. A pixel is clear iff no not-clear bit is set, no confidence
    rule triggers, it is not nodata, and at least one clear bit is set.

    Confidence fields per the L2SP guide: cloud conf = bits 8-9,
    shadow conf = bits 10-11 (QAConfidence.apply, image.py:493-498).
    """
    is_nodata = qa == nodata
    any_not_clear = F.lit(False)
    for b in not_clear_bits:
        any_not_clear = any_not_clear | qa_bit(qa, b)
    if cloud_conf_min is not None:
        any_not_clear = any_not_clear | (extract_bits(qa, 8, 9) >= cloud_conf_min)
    if shadow_conf_min is not None:
        any_not_clear = any_not_clear | (extract_bits(qa, 10, 11) >= shadow_conf_min)
    any_clear = F.lit(False)
    for b in clear_bits:
        any_clear = any_clear | qa_bit(qa, b)
    return ~is_nodata & ~any_not_clear & any_clear


def qa_pixel_clear_with_provenance(qa: Column, datasource: Column,
                                   oli_sources: list[int],
                                   clear_bits: list[int], not_clear_bits: list[int],
                                   nodata: int,
                                   cloud_conf_min: int | None = None,
                                   shadow_conf_min: int | None = None,
                                   cirrus_conf_min: int | None = None) -> Column:
    """C8 hard case (QAConfidence.apply, image.py:493-509): the cirrus
    confidence field (bits 14-15) only exists on OLI sensors, so in
    combined collections the cirrus rule applies per-pixel conditional
    on the DATASOURCE provenance — a mask that depends on which dataset
    supplied the pixel. Pure column logic: the provenance test is just
    another predicate ANDed into the confidence rule."""
    base = qa_pixel_clear(qa, clear_bits, not_clear_bits, nodata,
                          cloud_conf_min, shadow_conf_min)
    if cirrus_conf_min is None:
        return base
    cirrus_hit = ((extract_bits(qa, 14, 15) >= cirrus_conf_min)
                  & datasource.isin(*oli_sources))
    return base & ~cirrus_hit


class ConfidenceExpressionError(ValueError):
    pass


def _conf_expr_col(node: ast.AST, qa: Column) -> Column | int:
    """Recursive ast → Column for the confidence expression grammar:
    field names (cloud/cloud_shadow/snow/cirrus → their extracted 2-bit
    QA fields), level constants, ints, comparisons, and/or/not."""
    if isinstance(node, ast.Expression):
        return _conf_expr_col(node.body, qa)
    if isinstance(node, ast.BoolOp):
        parts = [_conf_expr_col(v, qa) for v in node.values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
        return ~_conf_expr_col(node.operand, qa)
    if isinstance(node, ast.Compare):
        if len(node.ops) != 1:
            raise ConfidenceExpressionError("chained comparisons unsupported")
        left = _conf_expr_col(node.left, qa)
        right = _conf_expr_col(node.comparators[0], qa)
        op = type(node.ops[0])
        table = {ast.Eq: lambda a, b: a == b, ast.NotEq: lambda a, b: a != b,
                 ast.Lt: lambda a, b: a < b, ast.LtE: lambda a, b: a <= b,
                 ast.Gt: lambda a, b: a > b, ast.GtE: lambda a, b: a >= b}
        if op not in table:
            raise ConfidenceExpressionError(f"unsupported comparison {op.__name__}")
        return table[op](left, right)
    if isinstance(node, ast.Name):
        if node.id in CONFIDENCE_FIELDS:
            lo, hi = CONFIDENCE_FIELDS[node.id]
            return extract_bits(qa, lo, hi)
        if node.id in _CONF_CONSTS:
            return F.lit(_CONF_CONSTS[node.id])
        raise ConfidenceExpressionError(f"unknown name {node.id!r}")
    if isinstance(node, ast.Constant) and isinstance(node.value, int):
        return F.lit(node.value)
    raise ConfidenceExpressionError(f"unsupported syntax: {ast.dump(node)}")


def compile_confidence_expression(expression: str, qa: Column) -> Column:
    """C8 user-expression confidence rules (QAConfidence, image.py:
    434-511): compile strings like ``'cloud == MEDIUM'`` or
    ``'cloud_shadow >= MEDIUM or snow == HIGH'`` into a boolean
    Catalyst predicate over the QA column — true where the rule
    TRIGGERS (pixel masked not-clear).

    The reference runs these through its sandboxed Python interpreter
    per numpy block; here the same grammar compiles once to a Column,
    so evaluation is whole-stage-codegen'd JVM work with no Python (and
    no exec) in the loop."""
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise ConfidenceExpressionError(
            f"unparseable confidence expression: {expression!r}") from exc
    return _conf_expr_col(tree, qa)


def qa_pixel_clear_rules(qa: Column, clear_bits: list[int],
                         not_clear_bits: list[int], nodata: int,
                         cloud: str | None = None,
                         cloud_shadow: str | None = None,
                         snow: str | None = None,
                         cirrus: str | None = None,
                         datasource: Column | None = None,
                         oli_sources: list[int] | None = None) -> Column:
    """C8 clear test driven by the reference's expression-string surface
    (get_qa_mask + QAConfidence): a pixel is clear iff no not-clear bit,
    no triggered confidence rule, not nodata, and some clear bit. The
    cirrus rule applies only to OLI-sourced pixels when ``datasource``
    + ``oli_sources`` are given (image.py:493-509)."""
    is_nodata = qa == nodata
    blocked = F.lit(False)
    for b in not_clear_bits:
        blocked = blocked | qa_bit(qa, b)
    for expr in (cloud, cloud_shadow, snow):
        if expr is not None:
            blocked = blocked | compile_confidence_expression(expr, qa)
    if cirrus is not None:
        hit = compile_confidence_expression(cirrus, qa)
        if datasource is not None and oli_sources is not None:
            hit = hit & datasource.isin(*oli_sources)
        blocked = blocked | hit
    any_clear = F.lit(False)
    for b in clear_bits:
        any_clear = any_clear | qa_bit(qa, b)
    return ~is_nodata & ~blocked & any_clear


def radsat_saturated(radsat: Column, bit_start: int = 1, bit_end: int = 7) -> Column:
    """C9 (processing.py:787-791): any of bands 1-7 saturated."""
    return extract_bits(radsat, bit_start, bit_end) > 0


def post_process_quality(bands: DataFrame, band_cols: list[str],
                         quality_col: str = "quality",
                         band_nodata: int = -9999,
                         saturated_value: int = 1) -> DataFrame:
    """C10 (post_processing_quality, processing.py:446-518): any pixel
    nodata in ANY spectral band forces the quality value to 'saturated'.
    The reference unions nodata positions block-by-block; here it's one
    greatest-of-flags column expression — no shuffle at all when the
    bands are columns of the same row."""
    any_nodata = F.lit(False)
    for c in band_cols:
        any_nodata = any_nodata | (F.col(c) == band_nodata)
    return bands.withColumn(
        quality_col,
        F.when(any_nodata, F.lit(saturated_value)).otherwise(F.col(quality_col)))

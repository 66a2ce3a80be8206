"""Radiometric rescale (C12) and linear display scale (C13).

Reference: ``image.py:611-662`` (rescale) and ``image.py:711-737``
(linear_raster_scale). Pure column arithmetic with clamp; the
int cast truncates toward zero to match numpy ``astype``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DTYPE_RANGES = {
    "uint8": (0, 255),
    "int16": (-32768, 32767),
    "uint16": (0, 65535),
    "int32": (-2147483648, 2147483647),
}


def clamp(col: Column, lo, hi) -> Column:
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def rescale(col: Column, multiplier: float, new_scale: float,
            origin_additive: float = 0.0, dtype: str = "int16") -> Column:
    """C12 (image.py:611-662): v*mult + add, clamp to dtype limits,
    then /new_scale and truncate-cast (numpy astype semantics —
    truncation toward zero, hence the long cast on the double)."""
    lo, hi = DTYPE_RANGES[dtype]
    scaled = clamp(col * F.lit(multiplier) + F.lit(origin_additive), float(lo), float(hi))
    return (scaled / F.lit(new_scale)).cast("long")


def baseline_offset(value: Column, baseline_major: Column, nodata: int,
                    offset: int = -1000) -> Column:
    """S8 — Sentinel-2 processing-baseline radiometric harmonization
    (sentinel2.py:136-174): for baseline >= 4 apply the BOA offset and
    clamp now-negative reflectances to nodata; nodata passes through."""
    shifted = value + F.lit(offset)
    harmonized = F.when(shifted < 0, F.lit(nodata)).otherwise(shifted)
    return (F.when(value == nodata, F.lit(nodata))
            .when(baseline_major >= 4, harmonized)
            .otherwise(value))


def linear_scale(col: Column, input_range: tuple[float, float],
                 output_range: tuple[float, float] = (0.0, 255.0)) -> Column:
    """C13 (image.py:711-737): clip to input range, map linearly to
    output range; float result (quicklook path quantizes later)."""
    in0, in1 = input_range
    out0, out1 = output_range
    data = clamp(col, in0, in1) - F.lit(in0)
    data = data / F.lit(float(in1 - in0))
    return data * F.lit(float(out1 - out0)) + F.lit(float(out0))

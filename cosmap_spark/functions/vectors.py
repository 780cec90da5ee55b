"""Vector math over ``array<float>`` embedding columns.

All JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no
Python in the hot path.  Elements are cast to double BEFORE arithmetic so
results match engines that compute in float64 (the DuckDB oracle), and
accumulation is left-to-right in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in float64, left-to-right."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    """‖a‖₂ in float64."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖); NULL when either vector has zero norm.

    The guard matters: 0/0 is NaN, and Spark both SORTS NaN above
    every number and evaluates ``NaN >= t`` as true — one failed-
    embedding all-zero row would otherwise become every query's
    rank-1 neighbor and a guaranteed false positive behind every
    similarity threshold.  NULL instead ranks LAST under ``desc()``
    (Spark's desc is nulls-last) and fails every ``>=`` filter.
    Mirrored by :func:`cosine_sql`."""
    den = norm(a) * norm(b)
    return F.when(den > 0, dot(a, b) / den)


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 quantization:
    ``struct(q: array<tinyint>, scale: double)`` with
    ``scale = max|vᵢ|/127`` — the storage/bandwidth path for embedding
    corpora (4×8 bytes → 1 byte per dim + one scale).  Pure JVM
    higher-order functions; at 100 TB this is the difference between
    shuffling 256 B and 2 KB per 256-dim vector in every ANN stage.

    Round is half-up (ties away from zero on positives), values land in
    [-127, 127] by construction (max|v|/scale = 127 exactly; fp noise is
    orders of magnitude below the .5 rounding boundary)."""
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(absmax, F.lit(1e-300)) / F.lit(127.0)
    q = F.transform(v, lambda x: F.round(x.cast("double") / scale).cast("tinyint"))
    return F.struct(q.alias("q"), scale.alias("scale"))


def dequantize_int8(qs: Column) -> Column:
    """Inverse of :func:`quantize_int8`: ``array<double>`` with
    per-element error ≤ scale/2 (so cosine error is O(1/254) per dim —
    re-rank candidates with full precision when it matters)."""
    return F.transform(qs["q"], lambda x: x.cast("double") * qs["scale"])


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (list lambda, left-to-right list_sum)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_similarity` (incl. the zero-norm
    NULL guard)."""
    den = f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"
    return (
        f"CASE WHEN {den} > 0 THEN ({dot_sql(a, b)}) / {den} END"
    )

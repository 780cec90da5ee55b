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
    """dot/(‖a‖·‖b‖); null-safe only for non-zero vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (list lambda, left-to-right list_sum)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_similarity`."""
    return (
        f"({dot_sql(a, b)}) / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"
    )

"""Robust numeric cleaning: winsorization and outlier flagging.

Feature columns in a training corpus (quality scores, lengths, model
logits) carry heavy tails that destabilize both downstream statistics
and mixture weights; the standard fixes are quantile clipping
(winsorizing) and robust z-scores (median/MAD instead of mean/std, so
the outliers being hunted cannot poison the location/scale estimates).

Scale shape: one lightweight aggregation computes the per-column (or
per-group) clip/scale parameters — O(groups) rows, broadcast back —
then the clip/flag itself is a map-side projection.  Quantiles use
``percentile_approx`` (the mergeable KLL-style sketch aggregate) so the
parameter pass is a single shuffle-free-combine aggregation even at
100 TB; exact percentiles would need a full sort per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    cols: list[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    accuracy: int = 10_000,
    suffix: str = "_w",
) -> DataFrame:
    """Clip each column to its [lower, upper] quantiles, appended as
    ``<col><suffix>`` so the raw value stays auditable.

    One sketch-aggregation pass computes every column's two quantiles
    together (a single 1-row parameter frame, joined back as a
    broadcast literal row); the clip is pure projection."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1; got {lower}, {upper}")
    qs = df.agg(
        *[
            F.percentile_approx(c, F.array(F.lit(lower), F.lit(upper)), accuracy)
            .alias(f"__q_{c}")
            for c in cols
        ]
    )
    out = df.join(F.broadcast(qs))
    for c in cols:
        lo = F.col(f"__q_{c}")[0]
        hi = F.col(f"__q_{c}")[1]
        out = out.withColumn(
            f"{c}{suffix}", F.greatest(F.least(F.col(c), hi), lo)
        )
    return out.drop(*[f"__q_{c}" for c in cols])


def robust_outliers(
    df: DataFrame,
    col: str,
    *,
    threshold: float = 3.5,
    accuracy: int = 10_000,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Flag rows whose modified z-score exceeds ``threshold``.

    Modified z = 0.6745 · (x − median) / MAD (Iglewicz & Hoaglin 1993);
    median and MAD come from two sketch aggregations (the second pass
    needs |x − median|, so two passes is the honest minimum — a
    mean/std single pass is exactly what outliers corrupt).  With
    ``group_by`` the parameters are per group (e.g. per source/lang);
    the join back on the group key is left to AQE, which broadcasts when
    the per-group table is small and falls back to a hash join when the
    key is high-cardinality — forcing ``F.broadcast`` here would pin a
    driver-sized build side at scale.  The ungrouped path stays an
    explicit broadcast: it is a single-row table by construction.
    Appends ``<col>_z`` (rounded 6 dp) and ``<col>_outlier``; MAD = 0
    (constant column) flags nothing.  Group keys join back NULL-safely
    (``<=>`` is still an equi-join to Catalyst): rows in a NULL group
    are a real group of the data, not silently dropped — the same
    contract as ``corpus_report`` and ``stratified_sample``."""
    keys = group_by or []

    def _join_back(left: DataFrame, agg: DataFrame) -> DataFrame:
        if not keys:
            return left.join(F.broadcast(agg))
        ren = agg
        for c in keys:
            ren = ren.withColumnRenamed(c, f"__g_{c}")
        cond = F.lit(True)
        for c in keys:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__g_{c}"))
        return left.join(ren, cond).drop(*[f"__g_{c}" for c in keys])

    med_agg = df.groupBy(*keys).agg(
        F.percentile_approx(col, F.lit(0.5), accuracy).alias("__med")
    )
    with_med = _join_back(df, med_agg)
    mad_agg = with_med.groupBy(*keys).agg(
        F.percentile_approx(
            F.abs(F.col(col) - F.col("__med")), F.lit(0.5), accuracy
        ).alias("__mad")
    )
    full = _join_back(with_med, mad_agg)
    z = F.round(
        F.lit(0.6745) * (F.col(col) - F.col("__med")) / F.col("__mad"), 6
    )
    return (
        full.withColumn(
            f"{col}_z",
            F.when(F.col("__mad") > 0, z).otherwise(F.lit(0.0)),
        )
        .withColumn(f"{col}_outlier", F.abs(F.col(f"{col}_z")) > threshold)
        .drop("__med", "__mad")
    )

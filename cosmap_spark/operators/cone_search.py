"""Cone search — the engine's core spatial operator, as ONE distributed join.

Reference semantics: for each sample (cone center + angular radius), return
every catalog row within that radius (reference protocol ``cone_search``,
src/cosmap/dataset/__init__.py:20-27; executed there as N independent
index probes inside a per-sample Python loop,
src/cosmap/dataset/opencosmo.py:38-54).

Spark-first restatement: a single join ``samples ⋈ catalog`` on the
angular-distance predicate.  A raw theta-join would be a nested-loop; we
make it an EQUI-join with the Zones algorithm:

1. catalog rows get ``zone = floor((dec+90)/h)``;
2. each sample explodes to the small set of zones its cone touches
   (``sequence(zone(dec−r), zone(dec+r))`` — ≤ ``2r/h + 2`` rows);
3. join on ``zone`` equality, AND a conservative RA/dec bounding box,
   AND the exact haversine predicate as residual.

Catalyst then plans a BroadcastHashJoin when the (exploded) samples side
is small — the common case, samples ≈ 10³–10⁶ rows — or a shuffled hash
join partitioned by zone when it is not.  Either way the 100 TB catalog
side is never nested-loop-scanned per sample, and never shuffled in the
broadcast case.  The bbox prefilter also prunes parquet row groups via
min/max stats when the catalog is written sorted by dec/zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import (
    angular_sep_deg,
    ra_delta_deg,
    ra_diff_wrapped,
    zone_of_dec,
)

DEFAULT_ZONE_DEG = 3.0


def cone_search(
    catalog: DataFrame,
    samples: DataFrame,
    *,
    zone_height_deg: float = DEFAULT_ZONE_DEG,
    broadcast_samples: bool = True,
    sep_col: str | None = "sep_deg",
) -> DataFrame:
    """Join each sample region to the catalog rows inside its cone.

    ``catalog`` needs columns ``ra, dec``; ``samples`` needs
    ``ra, dec, radius_deg``.  All other columns pass through (sample
    columns prefixed ``s_`` on name collision).  When ``sep_col`` is set,
    the output carries the exact separation under that name.
    """
    # Disambiguate the coordinate columns before the join.
    s = samples
    for c in ("ra", "dec"):
        s = s.withColumnRenamed(c, f"__s_{c}")
    s = (
        s.withColumn(
            "__zone",
            F.explode(
                F.sequence(
                    zone_of_dec(F.col("__s_dec") - F.col("radius_deg"), zone_height_deg),
                    zone_of_dec(F.col("__s_dec") + F.col("radius_deg"), zone_height_deg),
                )
            ),
        )
        .withColumn("__ra_delta", ra_delta_deg(F.col("__s_dec"), F.col("radius_deg")))
    )
    if broadcast_samples:
        s = F.broadcast(s)

    cat = catalog.withColumn("__zone", zone_of_dec(F.col("dec"), zone_height_deg))

    sep = angular_sep_deg(
        F.col("__s_ra"), F.col("__s_dec"), cat["ra"], cat["dec"]
    )
    cond = (
        (cat["__zone"] == s["__zone"])
        # conservative bbox: cheap prefilter evaluated before the trig
        & (F.abs(cat["dec"] - F.col("__s_dec")) <= F.col("radius_deg"))
        & (ra_diff_wrapped(cat["ra"], F.col("__s_ra")) <= F.col("__ra_delta"))
        # exact predicate
        & (sep <= F.col("radius_deg"))
    )
    out = cat.join(s, cond, "inner")
    if sep_col:
        out = out.withColumn(sep_col, sep)
    drop = ["__zone", "__ra_delta"]
    out = out.drop(*drop)
    out = out.withColumnRenamed("__s_ra", "s_ra").withColumnRenamed("__s_dec", "s_dec")
    return out


def cone_search_bruteforce(catalog: DataFrame, samples: DataFrame,
                           sep_col: str = "sep_deg") -> DataFrame:
    """Reference implementation: pure theta-join, no zone/bbox pruning.

    Used by tests to prove the pruned plan loses no rows; never the
    production path (nested-loop at scale).
    """
    s = samples.withColumnRenamed("ra", "s_ra").withColumnRenamed("dec", "s_dec")
    sep = angular_sep_deg(F.col("s_ra"), F.col("s_dec"), catalog["ra"], catalog["dec"])
    return (
        catalog.join(s, sep <= s["radius_deg"], "inner")
        .withColumn(sep_col, sep)
    )

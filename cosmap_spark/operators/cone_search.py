"""Cone search — the engine's core spatial operator, as ONE distributed join.

Reference semantics: for each sample (cone center + angular radius), return
every catalog row within that radius (reference protocol ``cone_search``,
src/cosmap/dataset/__init__.py:20-27; executed there as N independent
index probes inside a per-sample Python loop,
src/cosmap/dataset/opencosmo.py:38-54).

Spark-first restatement: a single join ``samples ⋈ catalog`` on the
angular-distance predicate.  A raw theta-join would be a nested loop; we
make it an EQUI-join with 2-D sky bucketing:

1. catalog rows get ``zone = floor((dec+90)/h)`` (Zones algorithm, Gray
   et al. MSR-TR-2006-52) and ``sector = floor(ra/w)``;
2. each sample explodes to the (zone, sector) cells its cone's bounding
   box touches — a handful of rows (RA wraparound handled by pmod;
   pole-adjacent cones cover all sectors of their zones);
3. join on (zone, sector) equality, AND the exact RA/dec bounding box,
   AND the exact haversine predicate as residual.

Catalyst plans a BroadcastHashJoin when the exploded samples side is
small (the common case: samples ≈ 10³–10⁶) or a shuffled hash join
partitioned by cell otherwise.  Candidate pairs per catalog row are the
samples in ITS cell only — at 10k samples / 2160 cells that's ~25× less
residual work than 1-D zoning.  The 100 TB catalog side is never
nested-loop-scanned and, in the broadcast case, never shuffled; with the
catalog written zone-partitioned (sources.ingest_catalog) the cell
predicates also prune parquet partitions/row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import (
    angular_sep_deg,
    ra_delta_deg,
    ra_diff_wrapped,
    zone_of_dec,
)

DEFAULT_ZONE_DEG = 3.0
DEFAULT_SECTOR_DEG = 10.0


def _sector_of_ra(ra: Column, w: float) -> Column:
    return F.floor(ra / F.lit(w)).cast("long")


def cone_search(
    catalog: DataFrame,
    samples: DataFrame,
    *,
    zone_height_deg: float = DEFAULT_ZONE_DEG,
    sector_width_deg: float = DEFAULT_SECTOR_DEG,
    broadcast_samples: bool = True,
    sep_col: str | None = "sep_deg",
) -> DataFrame:
    """Join each sample region to the catalog rows inside its cone.

    ``catalog`` needs columns ``ra, dec``; ``samples`` needs
    ``ra, dec, radius_deg``.  All other columns pass through (sample
    coordinates surface as ``s_ra, s_dec``).  When ``sep_col`` is set,
    the output carries the exact separation under that name.
    """
    n_sectors = int(round(360.0 / sector_width_deg))

    s = samples
    for c in ("ra", "dec"):
        s = s.withColumnRenamed(c, f"__s_{c}")
    dra = ra_delta_deg(F.col("__s_dec"), F.col("radius_deg"))
    # sectors the cone's RA span touches, wrapped onto [0, n_sectors);
    # a span ≥ 360° (pole-adjacent cone) covers every sector
    lo = F.floor((F.col("__s_ra") - dra) / F.lit(sector_width_deg)).cast("long")
    hi = F.least(
        lo + F.lit(n_sectors - 1),
        F.floor((F.col("__s_ra") + dra) / F.lit(sector_width_deg)).cast("long"),
    )
    sectors = F.array_distinct(
        F.transform(F.sequence(lo, hi), lambda x: F.pmod(x, F.lit(n_sectors)))
    )
    s = (
        s.withColumn("__ra_delta", dra)
        .withColumn(
            "__zone",
            F.explode(
                F.sequence(
                    zone_of_dec(F.col("__s_dec") - F.col("radius_deg"), zone_height_deg),
                    zone_of_dec(F.col("__s_dec") + F.col("radius_deg"), zone_height_deg),
                )
            ),
        )
        .withColumn("__sector", F.explode(sectors))
    )
    if broadcast_samples:
        s = F.broadcast(s)

    cat = catalog.withColumn(
        "__zone", zone_of_dec(F.col("dec"), zone_height_deg)
    ).withColumn("__sector", _sector_of_ra(F.col("ra"), sector_width_deg))

    sep = angular_sep_deg(F.col("__s_ra"), F.col("__s_dec"), cat["ra"], cat["dec"])
    cond = (
        (cat["__zone"] == s["__zone"])
        & (cat["__sector"] == s["__sector"])
        # conservative bbox: cheap prefilter evaluated before the trig
        & (F.abs(cat["dec"] - F.col("__s_dec")) <= F.col("radius_deg"))
        & (ra_diff_wrapped(cat["ra"], F.col("__s_ra")) <= F.col("__ra_delta"))
        # exact predicate
        & (sep <= F.col("radius_deg"))
    )
    out = cat.join(s, cond, "inner")
    if sep_col:
        out = out.withColumn(sep_col, sep)
    out = out.drop("__zone", "__sector", "__ra_delta")
    out = out.withColumnRenamed("__s_ra", "s_ra").withColumnRenamed("__s_dec", "s_dec")
    return out


def cone_search_bruteforce(catalog: DataFrame, samples: DataFrame,
                           sep_col: str = "sep_deg") -> DataFrame:
    """Reference implementation: pure theta-join, no cell/bbox pruning.

    Used by tests to prove the pruned plan loses no rows; never the
    production path (nested-loop at scale).
    """
    s = samples.withColumnRenamed("ra", "s_ra").withColumnRenamed("dec", "s_dec")
    sep = angular_sep_deg(F.col("s_ra"), F.col("s_dec"), catalog["ra"], catalog["dec"])
    return (
        catalog.join(s, sep <= s["radius_deg"], "inner")
        .withColumn(sep_col, sep)
    )

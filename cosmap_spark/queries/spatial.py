"""Spatial / cosmap-shaped queries (SURVEY.md §2.1 operators O1-O28).

These exercise the engine's reimplementation of what the reference
actually does: scan+project a catalog, cone-search it per sample region,
run per-sample transformations, aggregate one row per sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import SEP_DEG_SQL
from cosmap_spark.operators.cone_search import cone_search
from cosmap_spark.operators.sampler import (
    stratified_sample,
    uniform_sphere_samples,
)
from cosmap_spark.queries.registry import query
from cosmap_spark.tables import catalog_df, load_table, samples_df, with_fixture_ctes

# --- O1/O2/O3: scan + projection -----------------------------------------


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 25.0
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan with column projection + filter (reference O3:
    src/cosmap/dataset/opencosmo.py:23-24 config-driven ``select``).
    Catalyst pushes both into the parquet reader (PushedFilters/ReadSchema).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 25.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS net_price
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.06
      AND l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates (range + equality + timestamp) with a computed
    column; multiply-only arithmetic is bit-exact across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_price"),
        )
    )


# --- O5/O6/O26: cone search ----------------------------------------------


@query(
    "q_cone_search",
    oracle=with_fixture_ctes(f"""
    SELECT s.sample_id, c.object_id, round({SEP_DEG_SQL}, 6) AS sep_deg
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    """),
)
def q_cone_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core operator (reference O5, src/cosmap/dataset/__init__.py:20-27)
    as a zone-bucketed broadcast hash join; oracle is the brute-force
    theta-join — equal row sets prove the pruning is lossless."""
    joined = cone_search(catalog_df(spark, sf_dir), samples_df(spark, sf_dir))
    return joined.select(
        "sample_id", "object_id", F.round("sep_deg", 6).alias("sep_deg")
    )


@query(
    "q_box_filter",
    oracle=with_fixture_ctes("""
    SELECT object_id, round(ra, 6) AS ra, round(dec, 6) AS dec
    FROM catalog
    WHERE ra BETWEEN 40.0 AND 80.0 AND dec BETWEEN -30.0 AND 45.0
    """),
)
def q_box_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangular sky-region filter — the bbox the reference computed but
    never used, with its margin sign bug fixed (reference
    src/cosmap/dataset/opencosmo.py:42-50, bug at :48)."""
    return (
        catalog_df(spark, sf_dir)
        .where(F.col("ra").between(40.0, 80.0) & F.col("dec").between(-30.0, 45.0))
        .select(
            "object_id",
            F.round("ra", 6).alias("ra"),
            F.round("dec", 6).alias("dec"),
        )
    )


@query("q_sphere_sample")  # rows-only: RNG output; uniformity property-tested
def q_sphere_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-on-sphere sampler (reference O7/O10/O11,
    src/cosmap/analysis/sampler.py:87-140). Hash-seeded → deterministic
    under any partitioning; statistical uniformity is property-tested."""
    return uniform_sphere_samples(spark, 10_000, seed=42, radius_deg=1.0)


@query("q_box_sample")  # rows-only: RNG output; containment property-tested
def q_box_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle sample regions (the reference's declared-but-unwired
    Rectangle shape, src/cosmap/config/models/geometry.py:44-63, with
    its validator bug fixed rather than replicated — SURVEY.md §4.2):
    area-uniform centers, explicit per-row ra/dec bounds, frame shrunk
    by the half-extent so whole boxes stay inside the patch."""
    from cosmap_spark.operators.sampler import uniform_box_samples

    return uniform_box_samples(
        spark, 10_000, seed=42, width_deg=2.0, height_deg=1.0,
        ra_bounds=(20.0, 340.0), dec_bounds=(-60.0, 60.0),
    )


@query("q_stratified_sample")  # rows-only: hash-threshold output; property-tested
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling of documents by language —
    the corpus-rebalancing primitive (downsample dominant strata).
    Partition-layout-independent by construction (hash threshold on
    doc_id, not rand()); determinism and nested-subsample properties
    are unit-tested."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang"),
        {"en": 0.25, "fr": 1.0, "es": 0.5, "de": 0.5, "zh": 0.5},
        strata_col="lang",
        key_cols=["doc_id"],
    )


# --- O20/O27: per-sample aggregation (the README quickstart) --------------

_SAMPLE_AGG_ORACLE = with_fixture_ctes(f"""
    SELECT s.sample_id,
           count(*) AS n_objects,
           round(sum({SEP_DEG_SQL} * 3600.0), 4) AS total_arcsec
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    WHERE {SEP_DEG_SQL} > s.radius_deg * 0.1
    GROUP BY s.sample_id
""")


@query("q_sample_agg", oracle=_SAMPLE_AGG_ORACLE)
def q_sample_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README tutorial pipeline (reference README.md:55-74):
    separation column → drop objects closer than min_radius → per-sample
    count + sum of arcsec distances.  One shuffle (the groupBy); the
    spatial join itself is broadcast."""
    joined = cone_search(catalog_df(spark, sf_dir), samples_df(spark, sf_dir))
    return (
        joined.where(F.col("sep_deg") > F.col("radius_deg") * 0.1)
        .groupBy("sample_id")
        .agg(
            F.count("*").alias("n_objects"),
            F.round(F.sum(F.col("sep_deg") * 3600.0), 4).alias("total_arcsec"),
        )
    )


@query(
    "q_bad_sample_skip",
    oracle=with_fixture_ctes(f"""
    SELECT s.sample_id, count(*) AS n_objects
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    GROUP BY s.sample_id
    HAVING count(*) >= 5 AND min(c.mag_r) < 24.0
    """),
)
def q_bad_sample_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-sample rejection (reference O21: ``CosmapBadSampleError`` drops
    a sample, src/cosmap/analysis/task.py:155-157) re-expressed as a
    declarative HAVING predicate on per-sample quality."""
    joined = cone_search(catalog_df(spark, sf_dir), samples_df(spark, sf_dir))
    return (
        joined.groupBy("sample_id")
        .agg(F.count("*").alias("n_objects"), F.min("mag_r").alias("__min_mag"))
        .where((F.col("n_objects") >= 5) & (F.col("__min_mag") < 24.0))
        .select("sample_id", "n_objects")
    )


# --- O13/O14: declarative DAG pipeline ------------------------------------

#: a 3-node transformation block in the reference's spec dialect
#: (dependencies / needed-data / needed-parameters / is-output)
_TOPO_BLOCK = {
    "add_arcsec": {"needed-data": ["catalog"]},
    "select_far": {
        "dependencies": {"joined": "add_arcsec"},
        "needed-parameters": ["analysis_parameters.min_frac"],
    },
    "summarize": {"dependencies": {"filtered": "select_far"}, "is-output": True},
}


class _TopoImpls:
    """Native transformations: DataFrame in → DataFrame out (lazy)."""

    @staticmethod
    def add_arcsec(catalog: DataFrame) -> DataFrame:
        return catalog.withColumn("sep_arcsec", F.col("sep_deg") * 3600.0)

    @staticmethod
    def select_far(joined: DataFrame, min_frac: float) -> DataFrame:
        return joined.where(F.col("sep_deg") > F.col("radius_deg") * min_frac)

    @staticmethod
    def summarize(filtered: DataFrame) -> DataFrame:
        return filtered.groupBy("sample_id").agg(
            F.count("*").alias("n_objects"),
            F.round(F.sum("sep_arcsec"), 4).alias("total_arcsec"),
            F.round(F.avg("mag_r"), 6).alias("mean_mag"),
        )


@query(
    "q_topo_chain",
    oracle=with_fixture_ctes(f"""
    SELECT s.sample_id,
           count(*) AS n_objects,
           round(sum({SEP_DEG_SQL} * 3600.0), 4) AS total_arcsec,
           round(avg(c.mag_r), 6) AS mean_mag
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    WHERE {SEP_DEG_SQL} > s.radius_deg * 0.25
    GROUP BY s.sample_id
    """),
)
def q_topo_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative DAG pipeline end-to-end (reference O13/O14:
    spec → cycle-checked topo order → kwargs-injected execution,
    src/cosmap/analysis/dependencies.py:19-64 + task.py:168-188): a
    3-node block compiled by ``compile_pipeline`` into one lazy plan
    over the cone-search join."""
    from cosmap_spark.pipeline import compile_pipeline

    run = compile_pipeline(
        _TOPO_BLOCK,
        _TopoImpls,
        parameters={"analysis_parameters": {"min_frac": 0.25}},
    )
    joined = cone_search(catalog_df(spark, sf_dir), samples_df(spark, sf_dir))
    return run({"catalog": joined})


@query(
    "q_unit_convert",
    oracle=with_fixture_ctes("""
    SELECT sample_id, round(radius_deg * 3600.0, 6) AS radius_arcsec,
           round(radius_deg * 60.0, 6) AS radius_arcmin
    FROM samples
    """),
)
def q_unit_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity unit conversion (reference O28: ``Quantity.to(u.arcsec)``,
    README.md:73) compiled to a constant multiply."""
    return samples_df(spark, sf_dir).select(
        "sample_id",
        F.round(F.col("radius_deg") * 3600.0, 6).alias("radius_arcsec"),
        F.round(F.col("radius_deg") * 60.0, 6).alias("radius_arcmin"),
    )

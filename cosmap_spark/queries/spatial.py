"""Spatial / cosmap-shaped queries (SURVEY.md §2.1 operators O1-O28).

These exercise the engine's reimplementation of what the reference
actually does: scan+project a catalog, cone-search it per sample region,
run per-sample transformations, aggregate one row per sample.

Round 2: consolidated so every operator fits the driver's bounded
correctness window — each ledger query verifies several related
operators at once (the mapping is SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import SEP_DEG_SQL, sep_deg_sql
from cosmap_spark.operators.cone_search import cone_search, crossmatch
from cosmap_spark.operators.sampler import (
    stratified_sample,
    uniform_box_samples,
    uniform_sphere_samples,
)
from cosmap_spark.pipeline.config import quantity_to
from cosmap_spark.queries.registry import query
from cosmap_spark.tables import catalog_df, load_table, samples_df, with_fixture_ctes

# --- O1/O3 scan+projection, compound predicates, computed columns ---------


@query(
    "q_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1.0 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity > 25.0
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan with column projection (reference O3:
    src/cosmap/dataset/opencosmo.py:23-24 config-driven ``select``),
    compound predicates (range + equality + timestamp), and a computed
    column.  Catalyst pushes projection AND all three predicates into
    the parquet reader (PushedFilters/ReadSchema asserted in
    tests/test_parity.py); multiply-only arithmetic is bit-exact across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_quantity") > 25.0)
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_price"),
        )
    )


# --- O6 bbox prefilter + O28 unit conversion ------------------------------


# Non-angular Quantities consumed by q_box_units, normalized ONCE at
# import through the declared unit table (pipeline/config.py) — the
# reference's astropy ``Quantity.to`` generalizes past angles
# (sky.py:10-41); here conversion is a driver-side constant multiply and
# the SAME Python float lands verbatim in both the Spark plan and the
# oracle SQL below, so the comparison is bit-exact.
_HUBBLE_DIST_MPC = quantity_to(
    {"value": 299792.458 / 70.0, "units": "Mpc"}, "length"
)  # c/H0 for H0 = 70 km/s/Mpc
_MAX_DIST_MPC = quantity_to({"value": 4.2e9, "units": "pc"}, "length")


@query(
    "q_box_units",
    oracle=with_fixture_ctes(f"""
    SELECT object_id, round(ra, 6) AS ra, round(dec, 6) AS dec,
           round(ra * 60.0, 4) AS ra_arcmin,
           round(dec * 3600.0, 4) AS dec_arcsec,
           round(z * {_HUBBLE_DIST_MPC!r}, 4) AS dist_mpc,
           z * {_HUBBLE_DIST_MPC!r} <= {_MAX_DIST_MPC!r} AS within_dist
    FROM catalog
    WHERE ra BETWEEN 40.0 AND 80.0 AND dec BETWEEN -30.0 AND 45.0
    """),
)
def q_box_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangular sky-region filter — the bbox the reference computed but
    never used, with its margin sign bug fixed (reference
    src/cosmap/dataset/opencosmo.py:42-50, bug at :48) — plus quantity
    unit conversion (reference O28: ``Quantity.to(u.arcsec)``,
    README.md:73) compiled to constant multiplies.

    Beyond angles, the generalized unit layer feeds two LENGTH
    quantities (a Hubble distance declared in Mpc, a cut declared in pc
    — reference sky.py:10-41 validates arbitrary astropy units): both
    normalize to canonical Mpc at plan-build time, so the executors see
    only folded double literals."""
    return (
        catalog_df(spark, sf_dir)
        .where(F.col("ra").between(40.0, 80.0) & F.col("dec").between(-30.0, 45.0))
        .select(
            "object_id",
            F.round("ra", 6).alias("ra"),
            F.round("dec", 6).alias("dec"),
            F.round(F.col("ra") * 60.0, 4).alias("ra_arcmin"),
            F.round(F.col("dec") * 3600.0, 4).alias("dec_arcsec"),
            F.round(F.col("z") * _HUBBLE_DIST_MPC, 4).alias("dist_mpc"),
            ((F.col("z") * _HUBBLE_DIST_MPC) <= _MAX_DIST_MPC).alias("within_dist"),
        )
    )


# --- O5/O26: cone search --------------------------------------------------


_XSEP = sep_deg_sql("l.ra", "l.dec", "r.ra", "r.dec")

@query(
    "q_cone_search",
    oracle=with_fixture_ctes(f"""
    , twin AS (
      SELECT object_id + 1000000 AS object_id, ra, dec + 5.0/3600.0 AS dec
      FROM catalog
    ), xm AS (
      SELECT l.object_id AS id_l, r.object_id AS id_r,
             {_XSEP} * 3600.0 AS sep_raw
      FROM catalog l JOIN twin r ON {_XSEP} * 3600.0 <= 30.0
    ), best AS (
      SELECT id_l, id_r, sep_raw,
             row_number() OVER (PARTITION BY id_l ORDER BY sep_raw, id_r) AS rn
      FROM xm
    )
    SELECT 'cone' AS method, s.sample_id AS id_l, c.object_id AS id_r,
           round({SEP_DEG_SQL}, 6) AS sep
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    UNION ALL
    SELECT 'xmatch' AS method, id_l, id_r, round(sep_raw, 6) AS sep
    FROM best WHERE rn = 1
    """),
)
def q_cone_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core spatial operators as a tagged union, both against
    brute-force oracles (equal row sets prove the cell pruning is
    lossless):

    * ``cone`` — per-sample cone search (reference O5,
      src/cosmap/dataset/__init__.py:20-27) as a zone-bucketed
      broadcast hash join;
    * ``xmatch`` — round 3: catalog×catalog positional crossmatch
      (operators/cone_search.py::crossmatch — symmetric radius-scaled
      Zones cell join, nearest match per left row) against a
      deterministic 5-arcsec-displaced twin catalog the oracle
      reconstructs with identical IEEE arithmetic."""
    # Round 11: the round-10 one-thread overlap of the two branch
    # constructions is REVERTED — the interleaved cross-tree A/B
    # (SCALE.md round 11) could not reproduce a gain above the
    # sandbox's ±40% cell-noise floor (medians 0.87-0.91 thread/seq,
    # single pairs swinging 0.43-4.2×), and ~0.5 s of overlapped py4j
    # expression building does not justify a per-call thread pool.
    cat = catalog_df(spark, sf_dir)

    cone = cone_search(cat, samples_df(spark, sf_dir)).select(
        F.lit("cone").alias("method"),
        F.col("sample_id").alias("id_l"),
        F.col("object_id").alias("id_r"),
        F.round("sep_deg", 6).alias("sep"),
    )
    twin = cat.select(
        (F.col("object_id") + 1_000_000).alias("object_id"),
        "ra",
        (F.col("dec") + F.lit(5.0) / F.lit(3600.0)).alias("dec"),
    )
    xm = crossmatch(cat, twin, radius_arcsec=30.0).select(
        F.lit("xmatch").alias("method"),
        F.col("l_id").alias("id_l"),
        F.col("r_id").alias("id_r"),
        F.round("sep_arcsec", 6).alias("sep"),
    )
    return cone.unionByName(xm)


# --- O7-O12: samplers (rows-only: RNG output; properties unit-tested) -----


def _region_summary(df: DataFrame, name: str) -> DataFrame:
    return df.agg(
        F.count("*").alias("n"),
        F.round(F.min("ra"), 6).alias("min_ra"),
        F.round(F.max("ra"), 6).alias("max_ra"),
        F.round(F.min("dec"), 6).alias("min_dec"),
        F.round(F.max("dec"), 6).alias("max_dec"),
    ).select(F.lit(name).alias("sampler"), "*")


@query("q_samplers")  # rows-only: RNG output; uniformity/containment property-tested
def q_samplers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampler family in one summary (reference O7-O12,
    src/cosmap/analysis/sampler.py:87-140): uniform-on-sphere cones,
    area-uniform rectangles (the reference's declared-but-unwired
    Rectangle shape, src/cosmap/config/models/geometry.py:44-63, its
    validator bug fixed per SURVEY.md §4.2), and the deterministic
    table-sampling family: stratified, temperature-flattened mixture,
    per-row weighted (rate-based) and fixed-budget weighted
    (Efraimidis–Spirakis A-ES, round 9), token-budget selection,
    k-fold assignment (fold-0 summary), and DSIR importance resampling
    (hashed-ngram target/raw likelihood ratio + Gumbel top-k —
    operators/dsir.py).
    All hash-seeded — deterministic under any partitioning; per-sampler
    statistical properties are property-tested (tests/test_sampler.py,
    tests/test_kfold.py, tests/test_dsir.py)."""
    sphere = uniform_sphere_samples(spark, 10_000, seed=42, radius_deg=1.0)
    box = uniform_box_samples(
        spark, 10_000, seed=42, width_deg=2.0, height_deg=1.0,
        ra_bounds=(20.0, 340.0), dec_bounds=(-60.0, 60.0),
    )
    docs = load_table(spark, sf_dir, "documents")
    strat = stratified_sample(
        docs.select("doc_id", "lang"),
        {"en": 0.25, "fr": 1.0, "es": 0.5, "de": 0.5, "zh": 0.5},
        strata_col="lang",
        key_cols=["doc_id"],
    )
    def table_summary(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("sampler"),
            "n",
            *[F.lit(None).cast("double").alias(c)
              for c in ("min_ra", "max_ra", "min_dec", "max_dec")],
        )

    from cosmap_spark.operators.sampler import (
        select_to_token_budget,
        temperature_mixture,
        weighted_sample,
    )

    mix = temperature_mixture(
        docs.select("doc_id", "lang"), source_col="lang",
        key_cols=["doc_id"], alpha=0.5,
    )
    weighted = weighted_sample(
        docs.select("doc_id", (F.length("text") / 500.0).alias("w")),
        weight_col="w", key_cols=["doc_id"],
    )
    budget = select_to_token_budget(
        docs.select("doc_id", F.length("text").alias("n_chars"),
                    (F.col("doc_id") % 100 / 100.0).alias("prio")),
        budget=50_000, priority_col="prio", token_col="n_chars",
        key_cols=["doc_id"],
    )
    from cosmap_spark.operators.sampler import kfold_assign

    fold0 = kfold_assign(
        docs.select("doc_id"), key_cols=["doc_id"], k=5
    ).where(F.col("fold") == 0)
    # DSIR importance resampling (operators/dsir.py, Xie et al. 2023):
    # non-'en' documents as the target domain, the full corpus as raw —
    # k docs drawn ∝ exp(log p_target − log p_raw) via Gumbel top-k
    from cosmap_spark.operators.dsir import dsir_sample

    dsir = dsir_sample(
        docs.select("doc_id", "text"),
        docs.where(F.col("lang") != "en").select("doc_id", "text"),
        k=50, buckets=2048,
    )
    # cluster-balanced selection (round 5): k-means clusters over the
    # embedding table + an exact per-cluster quota — the topic-balance
    # recipe; quotas/determinism pinned in tests/test_dedup_knn.py
    from cosmap_spark.operators.knn import cluster_balanced_sample

    balanced = cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        k_per_cluster=10, nlist=8,
    )
    # fixed-budget weighted sample (round 9): Efraimidis–Spirakis
    # A-ES over the same length-derived weight as `weighted` — the
    # hard-row-budget twin; live twin reservoir_stream(weight_col=)
    from cosmap_spark.operators.sampler import weighted_k_sample

    wks = weighted_k_sample(
        docs.select("doc_id", (F.length("text") / 500.0).alias("w")),
        k=200, weight_col="w", key_cols=["doc_id"],
    )
    return (
        _region_summary(sphere, "sphere")
        .unionByName(_region_summary(box, "box"))
        .unionByName(table_summary(strat, "stratified"))
        .unionByName(table_summary(mix, "temperature_mixture"))
        .unionByName(table_summary(weighted, "weighted"))
        .unionByName(table_summary(wks, "weighted_k"))
        .unionByName(table_summary(budget, "token_budget"))
        .unionByName(table_summary(fold0, "kfold_fold0"))
        .unionByName(table_summary(dsir, "dsir_importance"))
        .unionByName(table_summary(balanced, "cluster_balanced"))
    )


# --- O20/O21/O27: per-sample aggregation + bad-sample skip ----------------

_SAMPLE_AGG_ORACLE = with_fixture_ctes(f"""
    SELECT s.sample_id,
           count(*) AS n_all,
           count(*) FILTER (WHERE {SEP_DEG_SQL} > s.radius_deg * 0.1) AS n_objects,
           round(sum({SEP_DEG_SQL} * 3600.0)
                 FILTER (WHERE {SEP_DEG_SQL} > s.radius_deg * 0.1), 4) AS total_arcsec,
           CAST(CASE WHEN count(*) >= 5 AND min(c.mag_r) < 24.0
                     THEN 0 ELSE 1 END AS BIGINT) AS is_bad
    FROM samples s JOIN catalog c ON {SEP_DEG_SQL} <= s.radius_deg
    GROUP BY s.sample_id
""")


@query("q_sample_agg", oracle=_SAMPLE_AGG_ORACLE)
def q_sample_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README tutorial pipeline (reference README.md:55-74):
    separation column → drop objects closer than min_radius → per-sample
    count + sum of arcsec distances — expressed as conditional
    aggregates so the same pass also computes the bad-sample predicate
    (reference O21: ``CosmapBadSampleError`` drops a sample,
    src/cosmap/analysis/task.py:155-157) as an ``is_bad`` flag.  One
    shuffle (the groupBy); the spatial join itself is broadcast."""
    joined = cone_search(catalog_df(spark, sf_dir), samples_df(spark, sf_dir))
    far = F.col("sep_deg") > F.col("radius_deg") * 0.1
    return joined.groupBy("sample_id").agg(
        F.count("*").alias("n_all"),
        F.count_if(far).alias("n_objects"),
        F.round(F.sum(F.when(far, F.col("sep_deg") * 3600.0)), 4).alias("total_arcsec"),
        F.when((F.count("*") >= 5) & (F.min("mag_r") < 24.0), F.lit(0))
        .otherwise(F.lit(1)).cast("long").alias("is_bad"),
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

"""Spatial-join correctness: the zone/bbox-pruned cone search must equal
the brute-force haversine theta-join everywhere — including the poles and
the RA=0 wraparound (SURVEY.md §7 hard part 1), the cases the reference
delegated to external libraries and never tested."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from cosmap_spark.functions.spherical import angular_sep_deg
from cosmap_spark.operators.cone_search import cone_search, cone_search_bruteforce
from cosmap_spark.tables import catalog_df, samples_df


def _pairs(df):
    return sorted((r["sample_id"], r["object_id"]) for r in df.collect())


def test_zone_join_equals_bruteforce_on_fixtures(spark):
    cat = catalog_df(spark, "/root/testdata/sf0.001")
    smp = samples_df(spark, "/root/testdata/sf0.001")
    assert _pairs(cone_search(cat, smp)) == _pairs(cone_search_bruteforce(cat, smp))


@pytest.fixture()
def pole_catalog(spark):
    rows = [
        # (object_id, ra, dec): hand-placed pole + wraparound points
        (1, 0.1, 89.9), (2, 359.9, 89.9), (3, 180.0, 89.95), (4, 90.0, 89.5),
        (5, 0.1, -89.9), (6, 359.9, -89.9), (7, 180.0, -89.95),
        (8, 0.5, 0.0), (9, 359.5, 0.0), (10, 180.0, 0.0),
        (11, 0.0, -90.0), (12, 33.0, 45.0),
    ]
    return spark.createDataFrame(rows, "object_id long, ra double, dec double")


@pytest.fixture()
def pole_samples(spark):
    rows = [
        # centers at the poles, straddling RA=0, and mid-latitude
        (100, 0.0, 90.0, 1.0), (101, 0.0, -90.0, 1.0),
        (102, 359.95, 0.0, 1.0), (103, 0.05, 0.0, 1.0),
        (104, 0.0, 89.0, 2.0), (105, 180.0, -89.0, 2.0),
        (106, 33.0, 45.0, 0.5),
    ]
    return spark.createDataFrame(
        rows, "sample_id long, ra double, dec double, radius_deg double"
    )


def test_pole_and_wraparound(spark, pole_catalog, pole_samples):
    got = _pairs(cone_search(pole_catalog, pole_samples))
    want = _pairs(cone_search_bruteforce(pole_catalog, pole_samples))
    assert got == want
    # sanity on specific geometry: both wraparound points are within 1°
    # of both near-RA-0 equator centers
    assert (102, 8) in got and (102, 9) in got
    assert (103, 8) in got and (103, 9) in got
    # pole cones catch all high-|dec| points regardless of RA
    assert {(100, 1), (100, 2), (100, 3)}.issubset(set(got))
    assert {(101, 5), (101, 6), (101, 7), (101, 11)}.issubset(set(got))


def test_haversine_known_values(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 90.0), (0.0, 0.0, 180.0, 0.0), (10.0, 0.0, 190.0, 0.0),
         (0.0, 45.0, 180.0, 45.0), (359.9, 0.0, 0.1, 0.0)],
        "ra1 double, dec1 double, ra2 double, dec2 double",
    )
    seps = [
        r["s"] for r in df.select(
            angular_sep_deg(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2")).alias("s")
        ).collect()
    ]
    assert seps[0] == pytest.approx(90.0, abs=1e-9)
    assert seps[1] == pytest.approx(180.0, abs=1e-9)
    assert seps[2] == pytest.approx(180.0, abs=1e-9)
    assert seps[3] == pytest.approx(90.0, abs=1e-9)   # across the pole
    assert seps[4] == pytest.approx(0.2, abs=1e-9)    # RA wraparound


def test_haversine_matches_vincenty_reference(spark):
    """Cross-check against a numpy Vincenty implementation (the formula
    astropy's separation uses) on random pairs."""
    import numpy as np

    rng = np.random.default_rng(0)
    ra1, ra2 = rng.uniform(0, 360, 200), rng.uniform(0, 360, 200)
    dec1, dec2 = rng.uniform(-90, 90, 200), rng.uniform(-90, 90, 200)
    l1, l2 = np.radians(dec1), np.radians(dec2)
    dl = np.radians(ra2 - ra1)
    num = np.hypot(
        np.cos(l2) * np.sin(dl),
        np.cos(l1) * np.sin(l2) - np.sin(l1) * np.cos(l2) * np.cos(dl),
    )
    den = np.sin(l1) * np.sin(l2) + np.cos(l1) * np.cos(l2) * np.cos(dl)
    want = np.degrees(np.arctan2(num, den))
    rows = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(ra1, dec1, ra2, dec2)
    ]
    df = spark.createDataFrame(rows, "ra1 double, dec1 double, ra2 double, dec2 double")
    got = [
        r["s"] for r in df.select(
            angular_sep_deg(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2")).alias("s")
        ).collect()
    ]
    assert np.allclose(got, want, atol=1e-8)


def test_zone_partitioned_ingest_roundtrip(spark, tmp_path):
    from cosmap_spark.sources.readers import ingest_catalog

    cat = catalog_df(spark, "/root/testdata/sf0.001")
    smp = samples_df(spark, "/root/testdata/sf0.001")
    ingest_catalog(cat, str(tmp_path / "zoned"))
    back = spark.read.parquet(str(tmp_path / "zoned")).drop("zone")
    assert _pairs(cone_search(back, smp)) == _pairs(cone_search_bruteforce(cat, smp))


def test_zone_partition_pruning_reads_fewer_files(spark, tmp_path):
    """Scale evidence: a dec-band query over the zone-partitioned catalog
    must touch only that band's files (partition pruning)."""
    from cosmap_spark.sources.readers import ingest_catalog

    cat = catalog_df(spark, "/root/testdata/sf0.001")
    ingest_catalog(cat, str(tmp_path / "zoned"))
    back = spark.read.parquet(str(tmp_path / "zoned"))
    pruned = back.where(F.col("zone").between(28, 32))  # ±6° around equator
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zone" in plan
    # executed scan must report only the 5 selected partitions
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:  # metadata present in this Spark build
        assert int(m.group(1)) <= 5
    assert pruned.count() == back.where(F.col("zone").between(28, 32)).count()


def test_sample_agg_matches_loop_semantics(spark):
    """The ONE-JOIN inversion must equal the reference's per-sample-loop
    semantics: for each sample independently, a cone query + aggregate.
    Checked by running each sample's cone as its own filter."""
    cat = catalog_df(spark, "/root/testdata/sf0.001")
    smp = samples_df(spark, "/root/testdata/sf0.001").limit(5)
    joined = cone_search(cat, smp)
    got = {
        r["sample_id"]: r["n"]
        for r in joined.groupBy("sample_id").agg(F.count("*").alias("n")).collect()
    }
    for s in smp.collect():
        n = (
            cat.where(
                angular_sep_deg(
                    F.lit(s["ra"]), F.lit(s["dec"]), F.col("ra"), F.col("dec")
                ) <= s["radius_deg"]
            ).count()
        )
        assert got.get(s["sample_id"], 0) == n


def test_zone_partitions_prune_dynamically(spark, tmp_path):
    """Runtime (dynamic) partition pruning: joining the zone-partitioned
    catalog to a dimension with a selective filter injects a runtime
    zone filter into the scan — partitions for unmatched zones are never
    read.  Static pruning (literal predicates) is covered above; this is
    the join-driven variant that matters when the touched zones are only
    known at run time."""
    from cosmap_spark.sources.readers import ingest_catalog
    from cosmap_spark.tables import catalog_df

    d = str(tmp_path / "zoned")
    ingest_catalog(catalog_df(spark, "/root/testdata/sf0.001"), d)
    part = spark.read.parquet(d)
    dim = (
        spark.range(60)
        .select(F.col("id").alias("zone"), (F.col("id") % 7).alias("family"))
        .where(F.col("family") == 3)
    )
    joined = part.join(dim, "zone")
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


# --- catalog×catalog crossmatch --------------------------------------------


def _jittered(cat, *, arcsec, id_shift):
    """A displaced twin catalog: every object moved ~arcsec in dec (and
    id-shifted), so each twin's nearest true counterpart is its source."""
    return cat.select(
        (F.col("object_id") + id_shift).alias("object_id"),
        F.pmod(F.col("ra") + F.lit(arcsec / 3600.0 / 2.0), F.lit(360.0)).alias("ra"),
        (F.col("dec") + F.lit(arcsec / 3600.0)).alias("dec"),
    )


def test_crossmatch_matches_bruteforce(spark):
    from cosmap_spark.operators.cone_search import crossmatch

    cat = catalog_df(spark, "/root/testdata/sf0.001").cache()
    twin = _jittered(cat, arcsec=5.0, id_shift=1_000_000).cache()
    got = {
        (r["l_id"], r["r_id"], round(r["sep_arcsec"], 4))
        for r in crossmatch(
            cat, twin, radius_arcsec=30.0, best_match=True
        ).collect()
    }
    # brute force: exact nearest within radius per left row
    a, b = cat.alias("a"), twin.alias("b")
    sep = angular_sep_deg(
        F.col("a.ra"), F.col("a.dec"), F.col("b.ra"), F.col("b.dec")
    ) * 3600.0
    from pyspark.sql import Window

    pairs = (
        a.crossJoin(b)
        .select(
            F.col("a.object_id").alias("l_id"),
            F.col("b.object_id").alias("r_id"),
            sep.alias("s"),
        )
        .where(F.col("s") <= 30.0)
    )
    w = Window.partitionBy("l_id").orderBy(F.col("s").asc(), F.col("r_id").asc())
    want = {
        (r["l_id"], r["r_id"], round(r["s"], 4))
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1).collect()
    }
    assert got == want and len(want) >= cat.count()


def test_crossmatch_all_pairs_and_self(spark):
    from cosmap_spark.operators.cone_search import crossmatch

    cat = catalog_df(spark, "/root/testdata/sf0.001").cache()
    self_pairs = crossmatch(
        cat, cat, radius_arcsec=1.0, best_match=False, exclude_self=True
    )
    # the synthetic catalog has no sub-arcsec coincident objects
    assert self_pairs.count() == 0
    ident = crossmatch(cat, cat, radius_arcsec=1.0, best_match=True)
    rows = ident.collect()
    assert len(rows) == cat.count()
    assert all(r["l_id"] == r["r_id"] and r["sep_arcsec"] == 0.0 for r in rows)


def test_crossmatch_ra_wraparound(spark):
    from cosmap_spark.operators.cone_search import crossmatch

    l = spark.createDataFrame(
        [(1, 359.9995, 10.0), (2, 180.0, -45.0)], "object_id long, ra double, dec double"
    )
    r = spark.createDataFrame(
        [(71, 0.0005, 10.0), (72, 180.001, -45.0)], "object_id long, ra double, dec double"
    )
    got = {
        (x["l_id"], x["r_id"])
        for x in crossmatch(l, r, radius_arcsec=10.0).collect()
    }
    assert got == {(1, 71), (2, 72)}  # pair 1 spans the RA seam


def test_crossmatch_plan_symmetric(spark):
    """No nested loop, no cartesian: the match is a hash-based
    equi-join on (zone, sector) cells.  Catalyst is free to BROADCAST
    a side it can prove tiny (it does at this toy scale) — the
    structural claim is that crossmatch never FORCES one, so at survey
    scale the same plan degrades gracefully to a shuffled cell join."""
    from cosmap_spark.operators.cone_search import crossmatch
    from cosmap_spark.operators.report import plan_summary

    cat = catalog_df(spark, "/root/testdata/sf0.001")
    twin = _jittered(cat, arcsec=5.0, id_shift=1_000_000)
    s = plan_summary(crossmatch(cat, twin, radius_arcsec=30.0))
    assert s["cartesian_products"] == 0 and s["nested_loop_joins"] == 0
    assert (
        s["broadcast_joins"] + s["sortmerge_joins"]
        + s["shuffled_hash_joins"] >= 1
    )


def test_non_divisor_sector_width_equals_bruteforce(spark):
    """sector_width_deg that doesn't divide 360 (7 deg -> 51.4 sectors)
    used to leave the last partial sector reachable only from the
    catalog side: rows near ra=360 silently missed every sample.  The
    width now rounds to an exact tiling; equality with brute force must
    hold with matches planted in the wrap sector."""
    cat = spark.createDataFrame(
        [(i, 355.0 + i * 0.5, 0.0, 20.0) for i in range(10)]
        + [(100 + i, float(i), 0.0, 20.0) for i in range(8)],
        "object_id long, ra double, dec double, mag_r double",
    )
    smp = spark.createDataFrame(
        [(0, 358.0, 0.0, 2.0), (1, 1.0, 0.5, 2.5)],
        "sample_id long, ra double, dec double, radius_deg double",
    )
    for w in (7.0, 11.0, 360.0 / 51.0):
        got = _pairs(cone_search(cat, smp, sector_width_deg=w))
        want = _pairs(cone_search_bruteforce(cat, smp))
        assert got == want, f"width={w}"

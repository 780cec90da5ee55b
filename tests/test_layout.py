"""Z-order layout: interleave correctness, file-skipping benefit,
plan discipline (stats pass aside, the key is one map-side
projection)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.layout import (
    layout_spans,
    pruning_ratio,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_reference(spark):
    """Pure-python reference of the exact pipeline: bucket =
    |{boundary <= x}| over the deduped approxQuantile boundaries, then
    Morton-interleave bucket bits (col k owns bit positions
    ``j*d + k``).  The produced key must equal the reference for every
    row of a 16×16 grid."""
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    probs = [(i + 1) / (1 << bits) for i in range((1 << bits) - 1)]
    bx, by = df.approxQuantile(["x", "y"], probs, 0.0001)
    bx, by = sorted(set(bx)), sorted(set(by))

    def bucket(v, bnds):
        return sum(1 for b in bnds if b <= v)

    def morton(cx, cy):
        z = 0
        for j in range(bits):
            z |= ((cx >> j) & 1) << (2 * j) | ((cy >> j) & 1) << (2 * j + 1)
        return z

    got = {
        (r["x"], r["y"]): r["__z"]
        for r in zorder_key(df, ["x", "y"], bits=bits,
                            relative_error=0.0001).collect()
    }
    for (x, y), z in got.items():
        assert z == morton(bucket(x, bx), bucket(y, by)), (x, y)
    # the grid still spreads across many distinct cells (no collapse)
    assert len(set(got.values())) >= 200


def test_zorder_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 1, 5), (3, 1, 5), (9, 1, 5)], "x long, c long, k long"
    )
    out = zorder_key(df, ["x", "c"], bits=4).collect()
    # the constant column's boundaries collapse, so it must contribute
    # IDENTICAL bits to every row (x owns even positions, c odd ones)
    c_bits = {
        sum(((r["__z"] >> (2 * j + 1)) & 1) << j for j in range(4))
        for r in out
    }
    assert len(c_bits) == 1
    # x still separates the rows
    assert len({r["__z"] for r in out}) == 3
    nulls = [r for r in out if r["x"] is None]
    others = [r["__z"] for r in out if r["x"] is not None]
    assert nulls[0]["__z"] <= min(others)  # NULL lands in the first cell


def test_pruning_ratio_empty_spans_raises(spark):
    with pytest.raises(ValueError, match="empty spans"):
        pruning_ratio([], ["x"], {"x": 0}, {"x": 1})


def test_zorder_bits_overflow_guard(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(df, ["x", "y"], bits=32)


def test_zorder_key_is_map_side(spark):
    """After the one stats pass, the key projection must add no
    exchange and no Python to the plan."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 1000).alias("y")
    )
    plan = zorder_key(df, ["x", "y"], bits=6)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_write_zordered_skips_files(spark):
    """The metric the layout exists for: a small box predicate over
    two dimensions must open far fewer z-ordered files than
    one-dimension-sorted files (the best non-interleaved layout), and
    far fewer than random layout."""
    import random

    rng = random.Random(42)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, "x long, y long").coalesce(4)

    with tempfile.TemporaryDirectory() as d:
        zdir, sdir, rdir = f"{d}/z", f"{d}/s", f"{d}/r"
        write_zordered(df, zdir, ["x", "y"], bits=8, num_files=64)
        # 1-D sorted baseline: clustered on x only
        df.repartitionByRange(64, "x").sortWithinPartitions("x") \
            .write.mode("overwrite").parquet(sdir)
        # random baseline
        df.repartition(64).write.mode("overwrite").parquet(rdir)

        probes = [(rng.randrange(9_000), rng.randrange(9_000)) for _ in range(20)]

        def avg_ratio(path, dims):
            spans = layout_spans(path, ["x", "y"])
            assert len(spans) >= 32
            return sum(
                pruning_ratio(
                    spans, dims,
                    {"x": px, "y": py}, {"x": px + 500, "y": py + 500},
                )
                for px, py in probes
            ) / len(probes)

        both = ["x", "y"]
        rz, rs, rr = (avg_ratio(p, both) for p in (zdir, sdir, rdir))
        # random layout: every file spans ~everything -> ratio ~1
        assert rr > 0.9
        # z-order beats random decisively and the 1-D sort on a 2-D box
        assert rz < 0.25 * rr
        assert rz < rs
        # the case interleaving exists for: a predicate on the OTHER
        # dimension — the x-sorted layout cannot prune at all
        rz_y, rs_y = (avg_ratio(p, ["y"]) for p in (zdir, sdir))
        assert rs_y > 0.9
        assert rz_y < 0.6 * rs_y
        # and the written data round-trips
        assert spark.read.parquet(zdir).count() == 40_000


def test_write_zordered_single_dim_still_prunes(spark):
    """With one z-ordered column the layout degenerates to a plain
    range sort — a 1-D range predicate prunes most files."""
    df = spark.range(0, 20_000).select((F.col("id") % 7919).alias("x"))
    with tempfile.TemporaryDirectory() as d:
        write_zordered(df, f"{d}/z1", ["x"], bits=8, num_files=10)
        spans = layout_spans(f"{d}/z1", ["x"])
        r = pruning_ratio(spans, ["x"], {"x": 100}, {"x": 400})
        assert r <= 0.31


def test_compact_parquet_zorder_variant(spark):
    """Many tiny files in, few near-target files out; the zorder_cols
    variant clusters during the same rewrite (sinks.compact_parquet
    delegating to the canonical layout implementation)."""
    import glob

    from cosmap_spark.sinks.writers import compact_parquet

    df = spark.range(0, 30_000).select(
        F.col("id").alias("x"),
        (F.col("id") * 31 % 997).alias("y"),
        # incompressible payload so the byte-based sizing yields
        # several output files at target_mb=1
        F.sha2(F.col("id").cast("string"), 512).alias("pad"),
    )
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        df.repartition(50).write.parquet(src)  # the small-file mess
        n = compact_parquet(spark, src, f"{d}/flat", target_file_mb=1)
        assert 2 <= n < 15
        assert len(glob.glob(f"{d}/flat/*.parquet")) <= n
        assert spark.read.parquet(f"{d}/flat").count() == 30_000

        n2 = compact_parquet(
            spark, src, f"{d}/zed", target_file_mb=1,
            zorder_cols=["x", "y"],
        )
        assert 2 <= n2 < 15
        # compaction + clustering in one pass: per-file bounding-box
        # AREA shrinks vs the round-robin rewrite, whose every file
        # spans ~the full domain in both dimensions (area is the
        # file-count-robust metric: which dimension Morton splits
        # first depends on how many files there are)
        def avg_area(path):
            spans = layout_spans(path, ["x", "y"])
            return sum(
                (s["x_max"] - s["x_min"]) / 30_000
                * (s["y_max"] - s["y_min"]) / 997
                for s in spans
            ) / len(spans)

        assert avg_area(f"{d}/flat") > 0.9
        assert avg_area(f"{d}/zed") < 0.62 * avg_area(f"{d}/flat")


def test_range_strategy_null_column_and_missing_range(spark):
    """All-NULL columns bucket to 0 like the rank strategy's empty
    boundaries (the min/max agg used to TypeError); a ranges dict
    missing a listed column names it loudly."""
    import pytest

    df = spark.createDataFrame(
        [(i, None) for i in range(10)], "x long, y double"
    )
    out = zorder_key(df, ["x", "y"], bits=4, strategy="range").collect()
    assert len(out) == 10  # no crash; y contributes constant bits
    with pytest.raises(ValueError, match="no entry for column"):
        zorder_key(df, ["x", "y"], bits=4, ranges={"x": (0.0, 10.0)})


def test_range_strategy_top_cell_reachable(spark):
    """2^bits scaling: interior values near hi must reach the TOP cell
    (the 2^bits-1 scaling made it reachable only by x == hi)."""
    df = spark.createDataFrame([(float(i),) for i in range(16)], "x double")
    out = {
        r["x"]: r["__z"]
        for r in zorder_key(
            df, ["x"], bits=2, ranges={"x": (0.0, 16.0)}
        ).collect()
    }
    # 4 cells over [0,16): 0-3 -> 0, 4-7 -> 1, 8-11 -> 2, 12-15 -> 3
    assert {v: out[v] for v in (0.0, 4.0, 8.0, 12.0, 15.0)} == {
        0.0: 0, 4.0: 1, 8.0: 2, 12.0: 3, 15.0: 3
    }

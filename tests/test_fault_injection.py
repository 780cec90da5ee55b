"""Kill-point matrix for every persisted-store crash window.

The exactly-once story of the streaming monitors rests on WHERE the
epoch stamp rides relative to the store swap
(streaming/ops.py::_ledgered_loop, heavy_hitters_stream's bespoke
copy) and on the writers' backup-swap sequence
(sinks/writers.py::_swap_in).  This suite stops reasoning about it in
comments and PROVES it: a harness injects a simulated process death at
each ordered step of the swap, restarts the stream on the same
checkpoint, and asserts the final store state equals a golden no-crash
run.  Because the monitor states are exact integers (counts, moment
sums, MG counters), equality is a SHARP double-merge detector — a
re-merged epoch inflates them.  (The HLL sketch monitor's estimates
are union-idempotent, so its rows exercise crash-resume mechanics
while the integer monitors carry the double-merge sharpness.)

Kill points, in the order the code runs them
(writers.py::_swap_in sequence cited per step):

  after_tmp       replacement tmp dir fully written, death before ANY
                  rename (writers.py tmp write) — store untouched,
                  tmp leaked and invisible; resume re-merges.
  between_renames live store renamed to .__merge_backup, death before
                  the tmp rename (the non-atomic window _swap_in
                  documents) — the next start must REFUSE loudly
                  (_refuse_interrupted_swap) and the documented
                  manual restore must lead back to the golden state.
  after_swap      swap fully complete (stamp INSIDE the store), death
                  before the ledger marker write — the round-8
                  closure: resume must restore the marker WITHOUT
                  re-merging.
  after_bootstrap the first-epoch twin of after_swap
                  (_bootstrap_store's single rename done, marker
                  missing).
"""

from __future__ import annotations

import json
import os
import shutil
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


class KillPoint(Exception):
    pass


@contextmanager
def kill_at(step: str, subdir: str, *, nth: int = 1):
    """Patch writers._swap_in/_bootstrap_store so the ``nth`` call
    whose target directory's basename is ``subdir`` dies at ``step``.
    Discrimination by basename keeps construction-time sidecar
    bootstraps (drift/ks reference freezes under ``ref/``) out of the
    blast radius.  The mid-sequence steps replicate _swap_in's exact
    ordering (write tmp → rename live→backup → rename tmp→live) so
    the death lands INSIDE the real window, not at a call boundary."""
    import cosmap_spark.sinks.writers as W

    real_swap, real_boot = W._swap_in, W._bootstrap_store
    swap_steps = {"after_tmp", "between_renames", "after_swap"}
    seen = {"n": 0}

    def fire(path: str, here: bool) -> bool:
        # count only calls of the kind this step targets: the swap
        # steps must not be consumed by the epoch-0 bootstrap call
        if not here or os.path.basename(path) != subdir:
            return False
        seen["n"] += 1
        return seen["n"] == nth

    def swap(path, replacement, *, extra_files=None):
        if not fire(path, step in swap_steps):
            return real_swap(path, replacement, extra_files=extra_files)
        if step == "after_tmp":
            tmp = f"{path}.__merge_tmp_killtest"
            replacement.write.mode("overwrite").parquet(tmp)
            raise KillPoint(step)
        if step == "between_renames":
            tmp = f"{path}.__merge_tmp_killtest"
            replacement.write.mode("overwrite").parquet(tmp)
            os.rename(path, f"{path}.__merge_backup")
            raise KillPoint(step)
        real_swap(path, replacement, extra_files=extra_files)
        raise KillPoint(step)  # after_swap

    def boot(path, df, *, extra_files=None):
        if not fire(path, step == "after_bootstrap"):
            return real_boot(path, df, extra_files=extra_files)
        real_boot(path, df, extra_files=extra_files)
        raise KillPoint(step)

    W._swap_in, W._bootstrap_store = swap, boot
    try:
        yield
    finally:
        W._swap_in, W._bootstrap_store = real_swap, real_boot


def _await(q):
    """Await a query, returning the streaming exception message (or
    None on clean completion)."""
    try:
        q.awaitTermination()
        return None
    except Exception as e:  # StreamingQueryException wraps foreachBatch
        try:
            q.stop()
        except Exception:
            pass
        return str(e)


# ---------------------------------------------------------------------------
# monitor specs: landing data (3 files → 3 epochs), start fn, state reader
# ---------------------------------------------------------------------------

def _land_files(spark, land, frames):
    for f in frames:
        f.coalesce(1).write.mode("append").parquet(str(land))


def _spec_sketch(spark, land):
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            (F.col("id") % 3).alias("grp"), (F.col("id") % 97).alias("uid")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import sketch_stream

        stream = (
            spark.readStream.schema("grp long, uid long")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return sketch_stream(stream, str(store), str(ckpt),
                             keys=["grp"], col="uid")

    def state(store):
        return sorted(
            (r["grp"], r["ndv"])
            for r in spark.read.parquet(str(store / "sketches"))
            .select("grp", F.hll_sketch_estimate("__sk").alias("ndv"))
            .collect()
        )

    return start, state, "sketches"


def _spec_drift(spark, land):
    ref = spark.range(0, 1000).select((F.col("id") % 50).cast("double")
                                      .alias("v"))
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            ((F.col("id") * 7) % 60).cast("double").alias("v")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import drift_stream

        stream = (
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return drift_stream(stream, str(store), str(ckpt),
                            cols=["v"], reference=ref)

    def state(store):
        from cosmap_spark.streaming.ops import drift_state

        return sorted(
            (r["column"], r["bin"], r["n_old"], r["n_new"])
            for r in drift_state(spark, str(store)).collect()
        )

    return start, state, "counts"


def _spec_category(spark, land):
    ref = spark.range(0, 1000).select(
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("c")
    )
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            F.concat(F.lit("c"), (F.col("id") % 9).cast("string")).alias("c")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import category_drift_stream

        stream = (
            spark.readStream.schema("c string")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return category_drift_stream(stream, str(store), str(ckpt),
                                     cols=["c"], reference=ref)

    def state(store):
        from cosmap_spark.streaming.ops import category_drift_state

        return sorted(
            (r["column"], r["category"], r["n_old"], r["n_new"])
            for r in category_drift_state(spark, str(store)).collect()
        )

    return start, state, "counts"


def _spec_abtest(spark, land):
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b")
            .alias("variant"),
            ((F.col("id") % 13) / 4.0).alias("value"),
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import abtest_stream

        stream = (
            spark.readStream.schema("variant string, value double")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return abtest_stream(stream, str(store), str(ckpt),
                             variant_col="variant", value_col="value")

    def state(store):
        return sorted(
            tuple(r[c] for c in sorted(r.asDict()))
            for r in spark.read.parquet(str(store / "arms")).collect()
        )

    return start, state, "arms"


def _spec_ks(spark, land):
    ref = spark.range(0, 1000).select(((F.col("id") % 31) / 3.0)
                                      .alias("v"))
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            (((F.col("id") * 11) % 37) / 3.0).alias("v")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import ks_stream

        stream = (
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return ks_stream(stream, str(store), str(ckpt),
                         cols=["v"], reference=ref)

    def state(store):
        from cosmap_spark.streaming.ops import ks_state

        return sorted(
            (r["column"], r["n_old"], r["n_new"], r["d_num"])
            for r in ks_state(spark, str(store)).collect()
        )

    return start, state, "counts"


def _spec_heavy_hitters(spark, land):
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            (F.col("id") % (5 + i)).alias("k")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import heavy_hitters_stream

        stream = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return heavy_hitters_stream(stream, str(store), str(ckpt),
                                    key_col="k", k=8)

    def state(store):
        rows_ = sorted(
            (r["key"], r["mg_count"])
            for r in spark.read.parquet(str(store / "counters")).collect()
        )
        with open(str(store / "counters" / "_mg_meta.json")) as f:
            meta = json.load(f)
        return (rows_, meta["n"])

    return start, state, "counters"


def _spec_reservoir(spark, land):
    rows = [
        spark.range(i * 300, (i + 1) * 300).select(
            F.col("id").alias("uid"), (F.col("id") % 5).alias("g")
        )
        for i in range(3)
    ]
    _land_files(spark, land, rows)

    def start(store, ckpt):
        from cosmap_spark.streaming.ops import reservoir_stream

        stream = (
            spark.readStream.schema("uid long, g long")
            .option("maxFilesPerTrigger", 1).parquet(str(land))
        )
        return reservoir_stream(stream, str(store), str(ckpt),
                                k=11, key_cols=["uid"])

    def state(store):
        return sorted(
            map(tuple, spark.read.parquet(str(store / "sample")).collect())
        )

    return start, state, "sample"


SPECS = {
    "sketch": _spec_sketch,
    "reservoir": _spec_reservoir,
    "drift": _spec_drift,
    "category": _spec_category,
    "abtest": _spec_abtest,
    "ks": _spec_ks,
    "heavy_hitters": _spec_heavy_hitters,
}
STEPS = ["after_tmp", "between_renames", "after_swap", "after_bootstrap"]


@pytest.mark.parametrize("monitor", sorted(SPECS))
def test_kill_point_matrix(spark, tmp_path, monitor):
    make = SPECS[monitor]
    # golden no-crash run
    gland = tmp_path / "gold_land"
    gstart, gstate, subdir = make(spark, gland)
    gq = gstart(tmp_path / "gold_store", tmp_path / "gold_ckpt")
    assert _await(gq) is None
    golden = gstate(tmp_path / "gold_store")

    for step in STEPS:
        land = tmp_path / f"{step}_land"
        start, state, _ = make(spark, land)
        store = tmp_path / f"{step}_store"
        ckpt = tmp_path / f"{step}_ckpt"
        # after_bootstrap kills the FIRST write (epoch 0); the swap
        # steps kill the first _swap_in (epoch 1, after a clean
        # bootstrap)
        with kill_at(step, subdir):
            err = _await(start(store, ckpt))
        assert err is not None and "KillPoint" in err, (monitor, step, err)

        if step == "between_renames":
            # the documented refusal: live dir missing, backup present
            target = store / subdir
            assert not os.path.exists(target)
            assert os.path.exists(f"{target}.__merge_backup")
            err2 = _await(start(store, ckpt))
            assert err2 is not None and "interrupted merge swap" in err2, (
                monitor, err2)
            # manual restore per the error message, then resume
            os.rename(f"{target}.__merge_backup", target)

        resumed = _await(start(store, ckpt))
        assert resumed is None, (monitor, step, resumed)
        assert state(store) == golden, (monitor, step)


def test_sink_swap_interrupted_window(spark, tmp_path):
    """The writers-level twin: a death between merge_upsert's two
    renames leaves the table under the backup name; the next merge
    must refuse (never re-init from the batch) and the documented
    restore leads back to the golden result."""
    from cosmap_spark.sinks.writers import delete_keys, merge_upsert

    path = str(tmp_path / "table")
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    upd = spark.createDataFrame([(1, 111), (999, 9)], "k long, v long")
    base.write.parquet(path)
    # golden
    gold_path = str(tmp_path / "gold")
    base.write.parquet(gold_path)
    merge_upsert(spark, gold_path, upd, ["k"])
    golden = sorted((r["k"], r["v"]) for r in
                    spark.read.parquet(gold_path).collect())

    # simulate the crash aftermath: live renamed away, tmp leaked
    os.rename(path, f"{path}.__merge_backup")
    with pytest.raises(RuntimeError, match="interrupted merge swap"):
        merge_upsert(spark, path, upd, ["k"])
    with pytest.raises(RuntimeError, match="interrupted merge swap"):
        delete_keys(spark, path, upd.select("k"), ["k"])
    os.rename(f"{path}.__merge_backup", path)
    merge_upsert(spark, path, upd, ["k"])
    got = sorted((r["k"], r["v"]) for r in
                 spark.read.parquet(path).collect())
    assert got == golden


def test_stale_backup_cleared_after_completed_swap(spark, tmp_path):
    """A crash AFTER a completed swap but before backup cleanup leaves
    live + backup both present; the next swap must treat the backup as
    stale (clear it) and proceed — pinned because _swap_in relies on
    callers' _refuse_interrupted_swap for the other ordering."""
    from cosmap_spark.sinks.writers import merge_upsert

    path = str(tmp_path / "table")
    spark.range(0, 20).select(F.col("id").alias("k"),
                              F.col("id").alias("v")).write.parquet(path)
    # fake a leftover backup from a completed-but-uncleaned swap
    shutil.copytree(path, f"{path}.__merge_backup")
    upd = spark.createDataFrame([(1, 111)], "k long, v long")
    merge_upsert(spark, path, upd, ["k"])
    assert not os.path.exists(f"{path}.__merge_backup")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got[1] == 111 and len(got) == 20


# ---------------------------------------------------------------------------
# manifest-backend column: mor_ingest_stream into a manifest-pointer
# store (sinks/commit.py), killed inside the commit protocol
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("step", ["before_publish", "before_marker"])
def test_mor_manifest_ingest_kill_matrix(spark, tmp_path, step):
    """The manifest backend's two ordered crash windows under the
    streaming CDC ingest, restart-equality against a golden no-crash
    run (the kill-matrix discipline):

      before_publish  delta data dir fully written, death before the
                      CAS publish — the store is UNCHANGED (nothing
                      references the dir); resume re-delivers the
                      batch, a fresh dir commits, the orphan is
                      vacuum-eligible.
      before_marker   publish complete, death before the ledger
                      marker — resume re-delivers and appends a SECOND
                      identical epoch, a view no-op by the suffix-
                      idempotence law (the rename backend's
                      crash-after-append window, same contract).
    """
    import cosmap_spark.sinks.commit as C
    import cosmap_spark.streaming.ops as SO
    from cosmap_spark.sinks.mor import mor_init, mor_read, mor_vacuum
    from cosmap_spark.streaming.ops import mor_ingest_stream

    schema = "k long, v long, seq long"

    def batches(land):
        b1 = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], schema)
        b2 = spark.createDataFrame(
            [(1, 11, 2), (3, 30, 1)], schema)
        _land_files(spark, land, [b1, b2])

    def start(store, ckpt, land):
        return mor_ingest_stream(
            (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).parquet(str(land))),
            str(store), str(ckpt), seq_col="seq",
        )

    def init(store):
        mor_init(
            spark.createDataFrame([(0, 0, 0)], schema), str(store),
            ["k"], backend="manifest",
        )

    def view(store):
        return sorted(
            (r["k"], r["v"]) for r in mor_read(spark, str(store)).collect()
        )

    # golden no-crash run
    gland = tmp_path / "gold_land"
    batches(gland)
    init(tmp_path / "gold_store")
    assert _await(start(tmp_path / "gold_store",
                        tmp_path / "gold_ckpt", gland)) is None
    golden = view(tmp_path / "gold_store")

    land = tmp_path / f"{step}_land"
    batches(land)
    store = tmp_path / f"{step}_store"
    ckpt = tmp_path / f"{step}_ckpt"
    init(store)

    if step == "before_publish":
        real = C.LocalFS.publish_exclusive
        calls = {"n": 0}

        def dying(self, p, content):
            calls["n"] += 1
            if calls["n"] == 1:
                raise KillPoint(step)
            return real(self, p, content)

        C.LocalFS.publish_exclusive = dying
        try:
            err = _await(start(store, ckpt, land))
        finally:
            C.LocalFS.publish_exclusive = real
        assert err is not None and "KillPoint" in err
        # store unchanged: still only manifest v1, view = base row
        from cosmap_spark.sinks.commit import ManifestStore

        assert ManifestStore(str(store)).versions() == [1]
        assert view(store) == [(0, 0)]
        # the orphan dir exists and is vacuum-eligible
        assert len(os.listdir(store / "data")) == 2
        assert len(mor_vacuum(str(store), min_age_seconds=0)) == 1
    else:  # before_marker
        real = SO._write_marker_atomic
        calls = {"n": 0}

        def dying_marker(marker, content):
            calls["n"] += 1
            if calls["n"] == 1:
                raise KillPoint(step)
            return real(marker, content)

        SO._write_marker_atomic = dying_marker
        try:
            err = _await(start(store, ckpt, land))
        finally:
            SO._write_marker_atomic = real
        assert err is not None and "KillPoint" in err

    # resume on the SAME checkpoint completes and equals golden
    assert _await(start(store, ckpt, land)) is None
    assert view(store) == golden, step
    if step == "before_marker":
        # the double-append is visible in the log (two dirs for the
        # replayed epoch) but invisible in the view — suffix idempotence
        from cosmap_spark.sinks.commit import ManifestStore

        n = len(ManifestStore(str(store)).latest()[1]["epochs"])
        assert n == 3  # 2 batches + 1 replayed duplicate

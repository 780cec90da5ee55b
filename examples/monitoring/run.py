"""Runnable level-shift-monitoring walkthrough — the changepoint family
composed end-to-end on the events table:

    python examples/monitoring/run.py [sf_dir]

1. **offline AMOC** (operators/tseries.py::grouped_changepoint): the
   single best mean-shift per user series, CUSUM statistic over
   exact-integer prefix sums (one keyed-window pass — the statistic is
   bit-deterministic on any layout, which is how the same computation
   sits under the hash-exact driver gate as q_stream_windows' chgpt
   branch);
2. **multiple changepoints** (changepoints_binseg): budgeted parallel
   binary segmentation — every current segment proposes its best
   admissible split per round, acceptance ranked per key up to the
   budget; one keyed-window pass + a groups-sized broadcast per round;
3. **live detection** (streaming/ops.py::changepoint_stream): Page's
   two-sided CUSUM per key over a file stream (availableNow) — 7
   scalars of state per key (Welford warmup baseline, frozen (μ₀, σ₀),
   s⁺/s⁻), alarm rows with direction + statistic, full
   self-rebaselining after each alarm;
4. **planted-shift check**: a synthetic series with two known level
   shifts routed through all three detectors — offline finds the
   seams, streaming alarms shortly after each (detection delay is the
   CUSUM trade: smaller threshold = earlier alarms, more false ones);
5. **distribution drift** (operators/diff.py + streaming drift
   monitor): PSI between yesterday's and today's corpus — numeric
   (snapshot_drift, equi-depth bins frozen from the old side) and
   categorical (category_drift, top-N + OTHER category bins) — then
   the LIVE twin: drift_stream freezes the reference once and
   maintains O(cols·bins) counts per micro-batch; drift_alarms reads
   per-column PSI any time without scanning history.

Changepoints answer "did this KEY's series shift level"; drift answers
"did the whole FEATURE's distribution move" — together they are the
monitoring pillar.  Every stage is one lazy plan; no per-key series
ever reaches the driver.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from cosmap_spark.operators.tseries import (
    changepoints_binseg,
    grouped_changepoint,
)
from cosmap_spark.session import get_spark
from cosmap_spark.streaming.ops import changepoint_stream
from cosmap_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("monitoring-example")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")

    print("== 1. offline AMOC: best mean-shift per user value series ==")
    amoc = grouped_changepoint(
        ev, ["user_id"], order_cols=["ts", "event_id"],
        val_col="value", min_len=8,
    )
    top5 = amoc.orderBy(F.col("stat").desc()).limit(5).collect()
    if not top5:
        print(f"no user series reaches min_len in {sf_dir}; nothing to show")
        spark.stop()
        return
    for r in top5:
        print(f"  user {r['user_id']}: cp_pos={r['cp_pos']} n={r['n']} "
              f"stat={r['stat']:.2f} "
              f"means {r['mean_left']:.3f} -> {r['mean_right']:.3f}")

    print("== 2. binseg: up to 3 changepoints for the sharpest user ==")
    top_user = top5[0]["user_id"]
    bs = changepoints_binseg(
        ev.where(F.col("user_id") == top_user),
        ["user_id"], order_cols=["ts", "event_id"], val_col="value",
        max_changepoints=3, min_seg=4,
    )
    bs.orderBy("cp_pos").select(
        "user_id", "cp_pos", F.round("stat", 2).alias("stat"), "iter"
    ).show()

    print("== 3+4. planted shifts through offline AND streaming ==")
    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0] * 40 + [16.0] * 40 + [4.0] * 40
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (1, i, t0 + dt.timedelta(minutes=i), float(v + rng.normal(0, 0.5)))
        for i, v in enumerate(vals)
    ]
    series = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    off = changepoints_binseg(
        series, ["user_id"], order_cols=["ts", "event_id"],
        val_col="value", max_changepoints=2, min_seg=5,
    ).orderBy("cp_pos").collect()
    print("offline binseg seams (true: 40, 80):",
          [r["cp_pos"] for r in off])

    with tempfile.TemporaryDirectory() as tmp:
        land = os.path.join(tmp, "land")
        series.coalesce(1).write.parquet(land)
        q = changepoint_stream(
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, value double"
            ).parquet(land),
            warmup=20, drift=0.5, threshold=5.0,
        )
        (q.writeStream.format("memory")
         .queryName("cusum_alarms")
         .option("checkpointLocation", os.path.join(tmp, "ckpt"))
         .outputMode("update")  # stateful update-mode operator
         .trigger(availableNow=True)
         .start()
         .awaitTermination(120))
        alarms = spark.table("cusum_alarms").orderBy("ts").collect()
        print("streaming CUSUM alarms (direction, n_seen at alarm):",
              [(r["direction"], r["n_seen"]) for r in alarms])

    print("== 5. distribution drift: snapshot PSI + live monitor ==")
    from cosmap_spark.operators.diff import category_drift, snapshot_drift
    from cosmap_spark.streaming.ops import drift_alarms, drift_stream

    # two "corpus snapshots" derived from events: values shift, the
    # event-type mix rotates
    old_snap = ev.select("value", "event_type")
    new_snap = ev.select(
        (F.col("value") * 1.3 + 2.0).alias("value"),
        F.when(F.col("user_id") % 5 == 0, F.lit("checkout"))
        .otherwise(F.col("event_type")).alias("event_type"),
    )
    num = snapshot_drift(old_snap, new_snap, ["value"], bins=10)
    psi_v = num.agg(F.round(F.sum("psi_term"), 4)).collect()[0][0]
    cat = category_drift(old_snap, new_snap, ["event_type"], top_n=10)
    psi_c = cat.agg(F.round(F.sum("psi_term"), 4)).collect()[0][0]
    print(f"  value PSI = {psi_v} | event_type PSI = {psi_c} "
          "(<0.1 stable, >0.25 shifted)")

    # is the shift REAL? the inference family on the same snapshots
    # (operators/stats_tests.py — all statistics exact-integer
    # deterministic), each through decide() for the p-value + verdict
    # surface: KS (distributional), Mann-Whitney (rank), chi-squared
    # (categorical), and Welch's t across derived arms of the new
    # snapshot
    from cosmap_spark.operators.stats_tests import (
        chi2_test, decide, ks_test, mann_whitney_u, welch_ttest,
    )

    ksr = decide(ks_test(old_snap, new_snap, ["value"]), "ks").collect()[0]
    mwr = decide(
        mann_whitney_u(old_snap, new_snap, ["value"]), "mwu"
    ).collect()[0]
    print(f"  KS D = {ksr['d_stat']} p = {ksr['p_value']} "
          f"significant = {ksr['significant']} | "
          f"MWU z = {mwr['z_stat']} p = {mwr['p_value']} "
          f"significant = {mwr['significant']}")
    chr_ = decide(
        chi2_test(old_snap, new_snap, ["event_type"]), "chi2"
    ).collect()[0]
    print(f"  chi2(event_type) = {chr_['chi2']} (dof = {chr_['dof']}) "
          f"p = {chr_['p_value']} significant = {chr_['significant']}")
    arms = new_snap.select(
        F.when(F.rand(7) < 0.5, F.lit("a")).otherwise(F.lit("b"))
        .alias("variant"), F.col("value"),
    )
    wr = decide(
        welch_ttest(arms, "variant", "value"), "welch"
    ).collect()[0]
    print(f"  Welch A/A on the new snapshot: t = {wr['t_stat']} "
          f"p = {wr['p_value']} significant = {wr['significant']} "
          f"(A/A: not significant expected)")

    with tempfile.TemporaryDirectory() as tmp:
        land = os.path.join(tmp, "drift_land")
        new_snap.select("value").coalesce(2).write.parquet(land)
        q = drift_stream(
            (spark.readStream.schema("value double")
             .option("maxFilesPerTrigger", 1).parquet(land)),
            os.path.join(tmp, "drift_store"), os.path.join(tmp, "dck"),
            cols=["value"], reference=old_snap.select("value"),
        )
        q.awaitTermination(120)
        for r in drift_alarms(
            spark, os.path.join(tmp, "drift_store"), threshold=0.25
        ).collect():
            print(f"  live monitor: column={r['column']} psi={r['psi']} "
                  f"alarmed={r['alarmed']}")

        # the live KS monitor over the same stream: bit-identical to
        # ks_test(reference, everything streamed), p-value via decide()
        from cosmap_spark.streaming.ops import ks_state, ks_stream

        q2 = ks_stream(
            (spark.readStream.schema("value double")
             .option("maxFilesPerTrigger", 1).parquet(land)),
            os.path.join(tmp, "ks_store"), os.path.join(tmp, "kck"),
            cols=["value"], reference=old_snap.select("value"),
        )
        q2.awaitTermination(120)
        kr = decide(
            ks_state(spark, os.path.join(tmp, "ks_store")), "ks"
        ).collect()[0]
        print(f"  live KS: D = {kr['d_stat']} p = {kr['p_value']} "
              f"significant = {kr['significant']}")

        # == 6. the combined on-call page: one verdict table over every
        # live store (KS + MWU ride the same quantized-count store)
        from cosmap_spark.streaming.ops import monitor_report

        print("== 6. monitor_report: all live verdicts on one page ==")
        for r in monitor_report(
            spark,
            drift_store=os.path.join(tmp, "drift_store"),
            ks_store=os.path.join(tmp, "ks_store"),
            # the round-10 maintenance half: ledger positions, state
            # sizes, swap/debris flags for the same stores
            health_stores={
                "drift": os.path.join(tmp, "drift_store"),
                "ks": os.path.join(tmp, "ks_store"),
            },
        ).orderBy("monitor", "subject", "statistic").collect():
            pv = "-" if r["p_value"] is None else f"{r['p_value']:.4g}"
            print(f"  {r['monitor']:<12} {r['subject']:<8} "
                  f"{r['statistic']}={r['value']} p={pv} "
                  f"significant={r['significant']}")
    spark.stop()


if __name__ == "__main__":
    main()

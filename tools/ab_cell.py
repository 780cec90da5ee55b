#!/usr/bin/env python
"""One interleaved-A/B cell: fresh local[32] 16g session, sf0.001 JIT
warm of the target query, one untimed sf0.1 warm, min-of-3 timed runs
(build+count, the bench methodology) plus an inline calibration probe.
Prints one JSON line.  The caller interleaves invocations across two
trees (SCALE.md settlement protocol).

Usage: python tools/ab_cell.py <query_name>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from cosmap_spark.session import get_spark

    spark = get_spark(app_name=f"ab-{name}", master="local[32]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            (spark.range(20_000_000)
             .select(F.xxhash64("id").alias("h"))
             .groupBy(F.pmod("h", F.lit(1000)).alias("k"))
             .agg(F.count("*"), F.avg("h")).count())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    from cosmap_spark.queries import all_queries

    qs = all_queries()
    fn = qs[name]
    fn(spark, "/root/testdata/sf0.001").count()
    fn(spark, sf).count()
    cal = calibrate()
    best, runs = float("inf"), []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        dt = time.perf_counter() - t0
        runs.append(round(dt, 3))
        best = min(best, dt)
    print(json.dumps({"query": name, "min": round(best, 3), "runs": runs,
                      "cal": cal}))
    spark.stop()


if __name__ == "__main__":
    main()

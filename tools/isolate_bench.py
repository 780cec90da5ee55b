#!/usr/bin/env python
"""Isolate and time individual declared queries (guide §1.4): fresh
bench-shaped session, sf0.001 JIT warm of the target, then min-of-N
timed runs through the noop sink (computes every column of every row,
no driver materialization).  Prints one JSON line per query.

Usage::

    python tools/isolate_bench.py q_knn_ann q_topk ...
    SPARK_GRAFT_RUNS=5 python tools/isolate_bench.py q_topk
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cosmap_spark.session import get_spark

    spark = get_spark(app_name="isolate-bench", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    from cosmap_spark.queries import all_queries

    queries = all_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(fn(spark, "/root/testdata/sf0.001"))
        noop(fn(spark, sf_dir))  # one untimed target-SF warm
        spark._jvm.System.gc()
        best, all_runs = float("inf"), []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
        out[name] = {"min": round(best, 3), "runs": all_runs}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()

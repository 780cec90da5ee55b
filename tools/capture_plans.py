#!/usr/bin/env python
"""Capture ``explain("formatted")`` for declared queries into
``plans/$COSMAP_PLAN_ROUND/<name>_<tag>.txt`` (judge-checkable plan
evidence for the optimization round; round dir defaults to r11).

Usage::

    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]
    COSMAP_PLAN_ROUND=r12 python tools/capture_plans.py after q_topk

With no query names, captures ALL registered queries.  Plans are built
against $SPARK_GRAFT_SF_DIR (default sf0.1) on a bench-shaped session;
frames are freshly built (never executed) so the formatted output is
the initial plan — the shape the plan audit asserts on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("COSMAP_PLAN_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    from cosmap_spark.session import get_spark

    spark = get_spark(app_name="capture-plans",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from cosmap_spark.queries import all_queries

    queries = all_queries()
    if not names:
        names = list(queries)
    import contextlib
    import io

    for name in names:
        fn = queries[name]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

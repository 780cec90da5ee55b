"""Paired A/B cell: time q_knn_ann's SERVE leg in one tree.

Usage: python .ab_knn_serve.py <tree_root>
Protocol (SCALE.md round-9 q_topk settlement): fresh local[32] 16g
session, sf0.001 JIT warm, inline calibration probe, artifacts built
untimed, one untimed sf0.1 serve warm, min-of-3 timed serve.  Prints
one JSON line.
"""
import json
import os
import sys
import time

tree = os.path.abspath(sys.argv[1])
os.chdir(tree)
sys.path.insert(0, tree)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from cosmap_spark.operators.knn import ivf_build, lsh_build  # noqa: E402
from cosmap_spark.operators.pq import (  # noqa: E402
    opq_train_gate, pq_encode, pq_train, rotate_vectors,
)
from cosmap_spark.queries.llm_ops import knn_ann_union  # noqa: E402
from cosmap_spark.tables import load_table  # noqa: E402

# JIT warm at sf0.001
knn_ann_union(spark, "/root/testdata/sf0.001").count()

# calibration probe — bench.py's exact shape (min-of-2)
from pyspark.sql import functions as F  # noqa: E402

_cal_best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    (spark.range(20_000_000)
     .select(F.xxhash64("id").alias("h"))
     .groupBy(F.pmod("h", F.lit(1000)).alias("k"))
     .agg(F.count("*"), F.avg("h")).count())
    _cal_best = min(_cal_best, time.perf_counter() - t0)
cal = round(_cal_best, 3)

sf_dir = "/root/testdata/sf0.1"
emb = load_table(spark, sf_dir, "embeddings")
cents, assigned = ivf_build(emb, nlist=16, iters=1)
assigned = assigned.localCheckpoint(eager=True)
index = (cents, assigned)
books = pq_train(emb, m=16, ksub=64, iters=1, dim=64)
coded = pq_encode(
    assigned, books, id_col="nid", vec_col="nvec", keep=["cid"]
).localCheckpoint(eager=True)
lsh_idx = lsh_build(emb, dim=64).localCheckpoint(eager=True)
opq_rot, opq_books = opq_train_gate(emb)
opq_coded = pq_encode(
    rotate_vectors(emb, opq_rot), opq_books
).localCheckpoint(eager=True)


def serve():
    return knn_ann_union(
        spark, sf_dir, index=index, codebooks=books,
        lsh_index=lsh_idx, coded=coded, tsearch=False,
        opq_rot=opq_rot, opq_books=opq_books, opq_coded=opq_coded,
    ).count()


serve()  # untimed warm
best = float("inf")
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    serve()
    dt = time.perf_counter() - t0
    runs.append(round(dt, 3))
    best = min(best, dt)
print(json.dumps({
    "tree": os.path.basename(tree) or tree,
    "cal": cal, "serve_min": round(best, 3), "runs": runs,
}))
spark.stop()

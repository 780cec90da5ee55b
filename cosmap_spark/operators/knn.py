"""Similarity search over embedding columns (SURVEY.md §2.4).

* ``knn_bruteforce``  — exact top-k by cosine: broadcast the (small) query
  set against the full corpus; one pass, no corpus shuffle.  The
  correctness baseline.
* ``knn_lsh``         — random-hyperplane LSH (sign-of-projection
  buckets): candidates only from matching buckets across several hash
  tables, then exact re-rank.  The 100 TB path: corpus is bucketed once,
  probes touch only matching buckets.

All vector math is JVM-side (functions/vectors.py); ranking is done on
the 6-dp-rounded similarity with an id tie-break so results are stable
across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cosmap_spark.functions.vectors import cosine_similarity, dot, norm


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query vector."""
    # Precompute each side's norm ONCE (not per pair): at k queries the
    # naive cosine recomputes dot(n,n) k times per corpus row — this
    # projection removes ~2/3 of the per-pair flops.
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    sim = F.round(
        dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")), 6
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "sim", F.col("rn").cast("long").alias("rn"))
    )


def _hyperplane_bucket(vec, table: int, planes: int, seed: int, dim: int):
    """Sign-pattern bucket id from `planes` pseudo-random hyperplanes.

    Plane p's normal components are deterministic pseudo-uniforms in
    [-1, 1) derived from xxhash64(table, p, i) — no driver-side RNG state,
    reproducible on any cluster."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(table), F.lit(p), i), F.lit(2**20))
                .cast("double") / F.lit(float(2**19)) - F.lit(1.0)
            ),
        )
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tables: int = 4,
    planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates, exact re-rank.

    Recall is probabilistic (more tables ⇒ higher recall); checked
    rows-only, with a recall unit test against ``knn_bruteforce``."""
    def bucketize(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{prefix}id"), F.col(vec_col).alias(f"{prefix}vec")
        )
        rows = [
            F.struct(
                F.lit(t).alias("tbl"),
                _hyperplane_bucket(F.col(f"{prefix}vec"), t, planes, seed, dim).alias("bucket"),
            )
            for t in range(tables)
        ]
        return out.select(
            f"{prefix}id", f"{prefix}vec", F.explode(F.array(*rows)).alias("tb")
        ).select(f"{prefix}id", f"{prefix}vec", "tb.tbl", "tb.bucket")

    cb = bucketize(corpus, "n")
    qb = bucketize(queries, "q")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "qvec", "nid", "nvec")
        .distinct()
    )
    sim = F.round(cosine_similarity(F.col("qvec"), F.col("nvec")), 6)
    scored = cand.select("qid", "nid", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "sim", F.col("rn").cast("long").alias("rn"))
    )

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cosmap_spark.functions.vectors import (
    cosine_similarity,
    dequantize_int8,
    dot,
    norm,
    quantize_int8,
)


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
    # zero-norm guard (cosine_similarity's contract): 0/0 is NaN, and
    # Spark sorts NaN ABOVE every number — one failed-embedding row
    # would be every query's rank-1 neighbor; NULL ranks last instead
    den = F.col("qnorm") * F.col("nnorm")
    sim = F.round(
        F.when(den > 0, dot(F.col("qvec"), F.col("nvec")) / den), 6
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


def _plane_normal(table: int, plane: int, seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-uniform plane components in [-1, 1).

    Derived from md5(seed:table:plane:i) — no RNG state, identical on
    any machine/cluster (Python's built-in hash() is salted per process
    and would NOT be)."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{table}:{plane}:{i}".encode()).digest()
        out.append(int.from_bytes(h[:8], "big") / float(2**63) - 1.0)
    return out


def _plane_matrix(tables: int, planes: int, seed: int, dim: int):
    """The ONE definition of the LSH bucket-id contract shared by the
    corpus bucketizer and the multi-probe query bucketizer: the (dim ×
    tables·planes) plane-normal matrix and the per-table bit weights.
    Bucket id = sign(margin > 0) bits packed little-endian per table —
    any change here must change BOTH sides together or a query stops
    finding its own index's buckets."""
    mat = np.array(
        [_plane_normal(t, p, seed, dim)
         for t in range(tables) for p in range(planes)]
    ).T
    return mat, 1 << np.arange(planes, dtype=np.int64)


def _bucketize(
    df: DataFrame,
    prefix: str,
    *,
    id_col: str,
    vec_col: str,
    tables: int,
    planes: int,
    seed: int,
    dim: int,
    with_norm: bool = False,
) -> DataFrame:
    """(id, vec, tbl, bucket) rows: `tables` sign-pattern bucket ids per
    vector from `planes` pseudo-random hyperplanes each.

    The plane normals are CONSTANTS (reproducible md5-derived), so the
    whole bucketing step is one dense matmul: (batch × dim) @ (dim ×
    tables·planes), sign, pack bits.  That is done as an Arrow-batched
    pandas UDF on purpose — the engine-wide "stay JVM-side" rule has a
    documented exception for dense linear algebra, where Catalyst's
    higher-order functions are evaluated INTERPRETED (no codegen):
    measured here, the pure-expression form cost ~2-3 s of one-time
    plan compile per query plus dim × tables × planes interpreted
    lambda steps per row, while the numpy form is a BLAS call over an
    Arrow batch.  The same trade drives the multimodal decode kernels
    (operators/multimodal.py).

    ``with_norm=True`` additionally carries ``{prefix}norm`` = ‖vec‖,
    computed ONCE per input row BELOW the per-table explode (round 11:
    the same norm hoist as knn_ivf/knn_bruteforce — the re-rank cosine
    then pays one dot fold per candidate pair instead of re-deriving
    both norms per pair; a persisted ``lsh_build`` index stores the
    norm, so serving never recomputes it)."""
    mat, bit_weights = _plane_matrix(tables, planes, seed, dim)

    @F.pandas_udf("array<bigint>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (v @ mat) > 0  # (n, tables·planes)
        packed = signs.reshape(len(v), -1, len(bit_weights)) @ bit_weights
        return pd.Series(list(packed.astype(np.int64)))

    # the norm is projected in the SAME pre-explode select as the
    # kernel call so it is evaluated once per input row and carried as
    # DATA through the Generate, never re-derived per (row, table)
    extra = [norm(F.col(vec_col)).alias(f"{prefix}norm")] if with_norm else []
    return (
        df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).alias(f"{prefix}vec"),
            *extra,
            _buckets(F.col(vec_col)).alias("__buckets"),
        )
        .select(
            f"{prefix}id",
            f"{prefix}vec",
            *([f"{prefix}norm"] if with_norm else []),
            F.posexplode("__buckets").alias("tbl", "bucket"),
        )
    )


def _bucketize_multiprobe(
    df: DataFrame,
    prefix: str,
    *,
    id_col: str,
    vec_col: str,
    tables: int,
    planes: int,
    seed: int,
    dim: int,
    probes: int,
    with_norm: bool = False,
) -> DataFrame:
    """Query-side multi-probe bucketing (Lv et al., VLDB'07): per
    table, the base sign-pattern bucket PLUS ``probes`` perturbed
    buckets, each flipping one of the lowest-|margin| hyperplane bits
    — the bits most likely to differ for a true near neighbor.  Same
    plane constants as :func:`_bucketize`, so the buckets join a
    persisted ``lsh_build`` index unchanged; the corpus-side index
    never grows (each extra TABLE costs a full corpus copy at scale;
    an extra PROBE costs one more broadcast row per query)."""
    mat, bit_weights = _plane_matrix(tables, planes, seed, dim)

    @F.pandas_udf("array<struct<tbl:int,bucket:bigint>>")
    def _probe_buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(vecs.to_numpy()).astype(np.float64)       # (n, dim)
        margins = (v @ mat).reshape(len(v), tables, planes)    # (n, T, P)
        signs = margins > 0
        base = signs @ bit_weights                             # (n, T)
        flip = np.argsort(np.abs(margins), axis=2)[:, :, :probes]
        out = []
        for i in range(len(v)):
            rows = []
            for t in range(tables):
                rows.append({"tbl": t, "bucket": int(base[i, t])})
                for j in range(flip.shape[2]):
                    rows.append({
                        "tbl": t,
                        "bucket": int(base[i, t] ^ (1 << int(flip[i, t, j]))),
                    })
            out.append(rows)
        return pd.Series(out)

    extra = [norm(F.col(vec_col)).alias(f"{prefix}norm")] if with_norm else []
    return (
        df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).alias(f"{prefix}vec"),
            *extra,
            _probe_buckets(F.col(vec_col)).alias("__bs"),
        )
        .withColumn("__b", F.explode("__bs"))
        .select(
            f"{prefix}id", f"{prefix}vec",
            *([f"{prefix}norm"] if with_norm else []),
            F.col("__b.tbl").alias("tbl"),
            F.col("__b.bucket").alias("bucket"),
        )
    )


def lsh_build(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tables: int = 4,
    planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """The corpus-side LSH index — ``(nid, nvec, nnorm, tbl, bucket)``
    — for :func:`knn_lsh`'s ``prebuilt_buckets``: build once, persist,
    serve many (the plane normals are seed-derived constants, so any
    session can rebuild the query side consistently).

    Schema v2 (round 11): ``nnorm`` = ‖nvec‖ is computed once at BUILD
    time and persisted, so serving pays one dot fold per candidate
    pair instead of two extra norm folds.  Column presence IS the
    version: :func:`knn_lsh` detects a v1 table (no ``nnorm``) and
    derives the column on load — v1 indexes keep working, bit-
    identically, at one extra fold per index row."""
    return _bucketize(
        corpus, "n", id_col=id_col, vec_col=vec_col,
        tables=tables, planes=planes, seed=seed, dim=dim,
        with_norm=True,
    )


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
    quantize: bool = False,
    prebuilt_buckets: DataFrame | None = None,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates, exact re-rank.

    Recall is probabilistic (more tables ⇒ higher recall); checked
    rows-only, with a recall unit test against ``knn_bruteforce``.
    ``multiprobe=j`` additionally probes, per table, the ``j`` buckets
    reached by flipping one of the query's lowest-|margin| hyperplane
    bits (:func:`_bucketize_multiprobe`) — the scale-correct recall
    knob: extra TABLES multiply the persisted index and the corpus
    shuffle, extra PROBES only add broadcast query rows (recall gain
    unit-tested monotone vs ``multiprobe=0``).

    ``quantize=True`` carries the CORPUS vectors through the candidate
    join/distinct as int8 structs (functions/vectors.py:quantize_int8)
    and dequantizes only inside the re-rank cosine — a 4× cut of the
    big side's shuffle bytes (the query side broadcasts and stays full
    precision).  Re-rank similarity then has O(1/254)-per-dim
    quantization error; recall vs brute force is unit-tested for both
    modes.

    ``prebuilt_buckets`` accepts a :func:`lsh_build` result so the
    corpus-side bucketing — the persisted LSH index; at scale a table
    written ``partitionBy("tbl", pmod(bucket, P))`` — is computed once
    and served many times; only the (tiny) query side re-bucketizes per
    call.  Must have been built with the same tables/planes/seed/dim."""
    kw = dict(id_col=id_col, vec_col=vec_col, tables=tables, planes=planes,
              seed=seed, dim=dim)
    cb = prebuilt_buckets if prebuilt_buckets is not None else _bucketize(
        corpus, "n", with_norm=not quantize, **kw
    )
    if quantize:
        cb = cb.withColumn("nvec", quantize_int8(F.col("nvec")))
        # the re-rank cosine runs on the DEQUANTIZED vector, whose norm
        # differs from the stored full-precision one — the per-pair
        # fold stays (bit-compat with the pre-norm-hoist results)
        nv = dequantize_int8(F.col("nvec"))
        sim = F.round(cosine_similarity(F.col("qvec"), nv), 6)
        qb = (
            _bucketize_multiprobe(queries, "q", probes=multiprobe, **kw)
            if multiprobe > 0
            else _bucketize(queries, "q", **kw)
        )
        cand = (
            cb.join(F.broadcast(qb), ["tbl", "bucket"])
            .where(F.col("nid") != F.col("qid"))
            .select("qid", "qvec", "nid", "nvec")
            .distinct()
        )
        scored = cand.select("qid", "nid", sim.alias("sim"))
    else:
        # round 11 norm hoist (guide §3 / §1.2, the knn_ivf pattern):
        # ‖q‖ rides the (tiny, broadcast) query bucket rows, ‖n‖ is
        # either the persisted v2 index column or derived ONCE per
        # index row for v1 tables — the quadratic candidate re-rank
        # then pays a single dot fold per pair.  Bit-identical: same
        # sqrt/multiply on the same doubles as the inline form.
        if "nnorm" not in cb.columns:
            cb = cb.withColumn("nnorm", norm(F.col("nvec")))
        qb = (
            _bucketize_multiprobe(
                queries, "q", probes=multiprobe, with_norm=True, **kw
            )
            if multiprobe > 0
            else _bucketize(queries, "q", with_norm=True, **kw)
        )
        cand = (
            cb.join(F.broadcast(qb), ["tbl", "bucket"])
            .where(F.col("nid") != F.col("qid"))
            .select("qid", "qvec", "qnorm", "nid", "nvec", "nnorm")
            .distinct()
        )
        den = F.col("qnorm") * F.col("nnorm")
        sim = F.round(
            F.when(den > 0, dot(F.col("qvec"), F.col("nvec")) / den), 6
        )
        scored = cand.select("qid", "nid", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "sim", F.col("rn").cast("long").alias("rn"))
    )


def hard_negative_pairs(
    corpus: DataFrame,
    *,
    k: int = 4,
    dup_pairs: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tables: int = 4,
    planes: int = 8,
    seed: int = 13,
    overfetch: int = 8,
) -> DataFrame:
    """Semi-hard contrastive negatives: each vector's top-k most-similar
    NON-duplicate neighbors — the pairs that actually move an embedding
    model, versus the uniform negatives of
    ``operators/sampler.py::negative_pairs``.

    Composition of the engine's own parts: LSH-bucketed approximate
    k-NN over the corpus against itself (never all-pairs), then an
    anti-join against ``dup_pairs`` (normalized id order) so known
    near-duplicates — FALSE negatives — are excluded before ranks are
    taken.  Output ``(anchor_id, negative_id, sim, neg_rank)``.

    ``overfetch`` is the headroom for dup removal: the ANN fetches
    ``k + overfetch`` neighbors per anchor BEFORE the anti-join, so an
    anchor inside a dup cluster of up to ``overfetch`` members still
    fills all k ranks.  Anchors in denser dup clusters under-fill
    (fewer than k rows — exactly the duplicate-ridden regions where
    hard negatives matter most): size ``overfetch`` at or above the
    dup-cluster tail, e.g. the max cluster size reported by
    ``dedup_clusters``."""
    ann = knn_lsh(
        corpus, corpus, k=k + overfetch, id_col=id_col, vec_col=vec_col,
        dim=dim, tables=tables, planes=planes, seed=seed,
    ).select(
        F.col("qid").alias("anchor_id"),
        F.col("nid").alias("negative_id"),
        "sim",
    )
    if dup_pairs is not None:
        norm = dup_pairs.select(
            F.least("id_a", "id_b").alias("__x"),
            F.greatest("id_a", "id_b").alias("__y"),
        )
        ann = (
            ann.withColumn("__x", F.least("anchor_id", "negative_id"))
            .withColumn("__y", F.greatest("anchor_id", "negative_id"))
            .join(norm, ["__x", "__y"], "left_anti")
            .drop("__x", "__y")
        )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        ann.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
        .select(
            "anchor_id", "negative_id", "sim",
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )


def embedding_dup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tables: int = 8,
    planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing — the
    all-pairs analog of ``knn_lsh``.

    Candidates come ONLY from a self-equi-join on (table, hyperplane
    bucket) with an ``id_a < id_b`` residual — an equi-join Catalyst
    plans as a hash/sort-merge join (never BroadcastNestedLoopJoin /
    cartesian), so cost is O(n·tables) + bucket-local pairs instead of
    the O(n²) brute-force pair scan.  Each candidate is then verified
    with the exact cosine, so precision is exact; recall is the LSH
    collision probability: at cos θ ≥ 0.99 (θ ≈ 8.1°) a pair agrees on
    one 8-plane bucket w.p. (1-θ/π)^8 ≈ 0.69, so 8 tables give recall
    ≈ 1-(1-0.69)^8 > 0.9999 (recall unit-tested vs brute force).
    """
    b = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    bucketed = _bucketize(
        corpus, "", id_col=id_col, vec_col=vec_col,
        tables=tables, planes=planes, seed=seed, dim=dim,
    ).select("id", "tbl", "bucket")
    # distinct on ids only — the shuffle payload stays (long, long), the
    # vectors are joined back just for the surviving candidate pairs
    cand = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Per-side norms once per row (round 10; the knn_bruteforce
    # discipline) — the threshold filter is pushed into the vector
    # joins' condition, so the naive per-pair cosine evaluated its
    # norm folds twice per candidate pair; bit-identical values.
    va = b.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                  norm(F.col("vec")).alias("__na"))
    vb = b.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                  norm(F.col("vec")).alias("__nb"))
    den = F.col("__na") * F.col("__nb")
    sim = F.round(F.when(den > 0, dot(F.col("va"), F.col("vb")) / den), 6)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) approximate search — the coarse-quantizer scale path
# --------------------------------------------------------------------------

def _centroid_array(cents: list[tuple[int, list[float]]]):
    """Centroid table as a literal array<struct<cid,cvec>> column.

    The centroid table is tiny (nlist × dim floats) so it ships to every
    task as part of the plan — the broadcast-variable pattern with zero
    join or shuffle.  Beyond a few thousand centroids, switch to a
    broadcast join + ``max_by`` aggregation instead.

    Built as ONE parsed SQL expression string rather than nlist × dim
    nested ``F.lit`` Column objects: the literal tree is identical, but
    construction is a single py4j round trip instead of thousands
    (measured ~4s of driver-side overhead at nlist=16, dim=64)."""
    structs = ", ".join(
        "named_struct('cid', CAST({} AS BIGINT), 'cvec', array({}))".format(
            int(cid), ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in vec)
        )
        for cid, vec in cents
    )
    return F.expr(f"array({structs})")


def _scored_centroids(vec, cents: list[tuple[int, list[float]]]):
    """array<struct<sim,negcid>> — orderable so array_max/array_sort give
    best-centroid and top-nprobe without any shuffle (per-row fold, whole-
    stage codegen).  Ties prefer the smaller cid (larger negcid... -cid),
    and sim is rounded so the choice is ulp-stable."""
    return F.transform(
        _centroid_array(cents),
        lambda c: F.struct(
            F.round(cosine_similarity(vec, c["cvec"]), 6).alias("sim"),
            (-c["cid"]).alias("negcid"),
        ),
    )


def ivf_assign(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid: the inverted
    lists.  Map-side only — no join, no shuffle; at scale the result is
    written ``partitionBy("cid")`` so probes prune whole lists off disk.

    Assignment is one dense matmul per Arrow batch — (batch × dim) @
    (dim × nlist), argmax — under the engine's documented
    dense-linear-algebra exception to the stay-JVM-side rule (see
    ``_bucketize``): this is per-CORPUS-row work, and the
    higher-order-function form evaluates interpreted (no codegen) at
    nlist × dim lambda steps per row — measured ~2s/2000 rows at
    nlist=16, dim=64 versus milliseconds for the BLAS call.  Tie-break
    matches the expression form: similarities rounded to 6 dp, first
    (smallest) cid wins ties.  A pandas-UDF output attribute is also
    opaque to Catalyst's InferFiltersFromConstraints, avoiding the
    alias-substitution hazard the previous expression form had to dodge
    (unbindable Filter / INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on Spark
    4.1 when the aliased centroid expression crossed a self-join)."""
    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    cids = np.array([cents[i][0] for i in order], dtype=np.int64)
    mat = np.array([cents[i][1] for i in order], dtype=np.float64)  # (nlist, dim)
    cnorm = np.linalg.norm(mat, axis=1)

    @F.pandas_udf("bigint")
    def _best_cid(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        v = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        # clamp norms: a zero vector would otherwise divide 0/0 (numpy
        # warning + NaN row + arbitrary argmax); clamped, its sims are
        # all exactly 0.0 and argmax deterministically picks the first
        # (smallest) cid — same tie rule as the expression path, where
        # cosine_similarity on a zero vector yields NaN and max_by
        # likewise degenerates to the tie-break
        norms = np.maximum(np.linalg.norm(v, axis=1), 1e-300)
        cnorms = np.maximum(cnorm, 1e-300)
        sims = np.round((v @ mat.T) / np.outer(norms, cnorms), 6)
        # argmax returns the FIRST max index; rows sorted by cid ⇒ ties
        # prefer the smallest cid, same as max-by-(sim, -cid)
        return pd.Series(cids[np.argmax(sims, axis=1)])

    return corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        _best_cid(F.col(vec_col)).alias("cid"),
    )


def ivf_build(
    corpus: DataFrame,
    *,
    nlist: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    seeding: str = "hash",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Train a coarse quantizer and build inverted lists.

    ``seeding="hash"`` (default) is a deterministic hash-ordered sample
    (the ``nlist`` corpus vectors with smallest ``xxhash64(id, seed)``
    — reproducible on any cluster, no RNG state); ``"kmeans||"`` is
    the scalable k-means++ of Bahmani et al. (VLDB'12) — see
    :func:`_kmeans_parallel_seed` — which spreads the seeds over the
    data's angular structure, the remedy when hash seeding lands a
    skewed cluster (a fat inverted list re-inflates SemDeDup's
    quadratic term; diagnose with ``semantic_dedup_balance``).  Either
    way the seeds are refined with ``iters`` Lloyd steps computed as
    DataFrame aggregations (posexplode → per-(cid,pos) mean →
    re-assemble).  Returns ``(centroids, assigned)`` where ``assigned``
    is ``[nid, nvec, cid]``."""
    if seeding == "kmeans||":
        cents = _kmeans_parallel_seed(
            corpus, nlist, id_col=id_col, vec_col=vec_col, seed=seed
        )
        for _ in range(iters):
            assigned = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)
            cents = _lloyd_refine(assigned)
        return cents, ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)
    if seeding != "hash":
        raise ValueError(f"unknown seeding {seeding!r} (hash | kmeans||)")
    w = Window.orderBy("h", "nid")
    cents_df = (
        corpus.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("cvec"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
        )
        .orderBy("h", "nid")
        .limit(nlist)
        .withColumn("cid", F.row_number().over(w) - 1)
        .select("cid", "cvec")
    )
    cents = [(r["cid"], [float(x) for x in r["cvec"]]) for r in cents_df.collect()]
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)
        cents = _lloyd_refine(assigned)
    return cents, ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)


def _lloyd_refine(assigned: DataFrame) -> list[tuple[int, list[float]]]:
    """One Lloyd step as DataFrame aggregations: per-(cid, pos) mean →
    re-assembled centroid vectors; empty cells keep no row (their
    previous centroid simply drops out of the literal, standard
    k-means cell death)."""
    refined = (
        assigned.select("cid", F.posexplode(F.col("nvec")).alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )
    return [(r["cid"], [float(x) for x in r["cvec"]]) for r in refined.collect()]


def _kmeans_parallel_seed(
    corpus: DataFrame,
    nlist: int,
    *,
    id_col: str,
    vec_col: str,
    seed: int,
    rounds: int = 3,
    oversample: float = 2.0,
) -> list[tuple[int, list[float]]]:
    """Deterministic k-means|| seeding (Bahmani et al., VLDB'12) in the
    angular metric the quantizer assigns by (potential = 1 − cosine to
    the nearest current seed):

    1. seed 0 = the hash-min corpus vector (reproducible, no RNG);
    2. ``rounds`` passes: every vector joins the candidate set with
       probability ``min(1, oversample·nlist·d²/Σd²)``, decided by a
       per-(id, round) hash mapped to [0, 1) — expected ``O(nlist)``
       candidates per round, each pass one agg job + one filtered
       collect (the candidate literal ships in-plan via
       ``_scored_centroids``, so d² is map-side);
    3. candidates are weighted by the number of corpus vectors they
       attract (one count job) and reduced to ``nlist`` seeds
       DRIVER-SIDE by greedy weighted farthest-point (the kmeans++
       step over O(rounds·oversample·nlist) rows — argmax of
       weight·d², id tie-break, no RNG);
    4. if the corpus yields fewer candidates than ``nlist``, hash-min
       corpus rows pad the remainder (degenerate small inputs).

    Driver traffic is O(rounds·oversample·nlist·dim) — never
    corpus-sized."""
    base = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("cvec"),
        F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
    )
    first = base.orderBy("h", "nid").limit(1).collect()
    if not first:
        raise ValueError("cannot seed a quantizer from an empty corpus")
    cands: list[tuple[int, list[float]]] = [
        (int(first[0]["nid"]), [float(x) for x in first[0]["cvec"]])
    ]
    target = oversample * nlist
    for r in range(rounds):
        scored = _scored_centroids(
            F.col("cvec"), [(i, v) for i, (_, v) in enumerate(cands)]
        )
        d2 = 1.0 - F.array_max(scored)["sim"]
        pot = base.select("nid", "cvec", d2.alias("__d2"))
        total = pot.agg(F.sum("__d2")).collect()[0][0] or 0.0
        if total <= 0:  # every vector already coincides with a seed
            break
        # per-(id, round) hash → uniform [0, 1): deterministic Bernoulli
        u = (F.xxhash64("nid", F.lit(seed), F.lit(r)).cast("double")
             / F.lit(float(2**63)) + F.lit(1.0)) / F.lit(2.0)
        picked = pot.where(
            u < F.col("__d2") * F.lit(target) / F.lit(float(total))
        ).collect()
        seen = {c[0] for c in cands}
        cands.extend(
            (int(p["nid"]), [float(x) for x in p["cvec"]])
            for p in sorted((row for row in picked if row["nid"] not in seen),
                            key=lambda row: row["nid"])
        )
    # weight candidates by attraction (how many vectors they'd own)
    scored = _scored_centroids(
        F.col("cvec"), [(i, v) for i, (_, v) in enumerate(cands)]
    )
    best = F.array_max(scored)
    wrows = (
        base.select((-best["negcid"]).alias("__c"))
        .groupBy("__c").agg(F.count("*").alias("__w")).collect()
    )
    weights = np.zeros(len(cands), dtype=np.float64)
    for row in wrows:
        weights[int(row["__c"])] = float(row["__w"])
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in cands])
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    chosen = [int(np.argmax(weights))]
    d2 = 1.0 - unit @ unit[chosen[0]]
    while len(chosen) < min(nlist, len(cands)):
        gain = weights * np.maximum(d2, 0.0)
        gain[chosen] = -1.0
        nxt = int(np.argmax(gain))  # first max = smallest index tie-break
        chosen.append(nxt)
        d2 = np.minimum(d2, 1.0 - unit @ unit[nxt])
    if len(chosen) < nlist:  # degenerate: pad with hash-min corpus rows
        seen_ids = {cands[i][0] for i in chosen}
        pad = base.orderBy("h", "nid").limit(nlist + len(seen_ids)).collect()
        extra = [
            [float(x) for x in p["cvec"]] for p in pad
            if int(p["nid"]) not in seen_ids
        ]
        vecs = [cands[i][1] for i in chosen] + extra
    else:
        vecs = [cands[i][1] for i in chosen]
    return [(cid, v) for cid, v in enumerate(vecs[:nlist])]


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    prebuilt: tuple[list[tuple[int, list[float]]], DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k cosine via IVF: probe the ``nprobe`` nearest
    inverted lists per query, exact re-rank within candidates.

    Work touched per query is ~nprobe/nlist of the corpus (vs. all of it
    for brute force); recall is probabilistic in nprobe and unit-tested
    against ``knn_bruteforce``.  The candidate join broadcasts the
    (small) exploded probe table against the corpus-side inverted lists,
    so the corpus never shuffles.

    ``prebuilt`` accepts an ``ivf_build`` result so one trained index
    serves many searches (at scale the index is the persisted,
    cid-partitioned table; training per query would be absurd there and
    is merely slow here)."""
    cents, assigned = prebuilt if prebuilt is not None else ivf_build(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # Project to fresh attribute names BEFORE building the probe generator:
    # a lambda/generator capturing a column of a non-immediate child can be
    # mis-rewritten when Catalyst substitutes the (self-joined) scan.
    q0 = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probes = F.slice(
        F.reverse(F.array_sort(_scored_centroids(F.col("qvec"), cents))),
        1,
        nprobe,
    )
    q = q0.select(
        "qid",
        "qvec",
        F.explode(F.transform(probes, lambda s: -s["negcid"])).alias("cid"),
    )
    # Per-SIDE norms, computed once per row below the probe join (the
    # knn_bruteforce discipline, applied here in round 10): the naive
    # cosine re-derives ‖q‖ and ‖n‖ inside every (query, candidate)
    # pair — 4 extra interpreted HOF folds per pair (den appears in
    # both the guard and the division) where one dot fold suffices.
    # Bit-identical: same sqrt/multiply on the same doubles.
    cand = (
        assigned.withColumn("__nn", norm(F.col("nvec")))
        .join(F.broadcast(q.withColumn("__qn", norm(F.col("qvec")))), "cid")
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", "qvec", "nvec", "__qn", "__nn")
    )
    den = F.col("__qn") * F.col("__nn")
    sim = F.round(
        F.when(den > 0, dot(F.col("qvec"), F.col("nvec")) / den), 6
    )
    scored = cand.select("qid", "nid", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "sim", F.col("rn").cast("long").alias("rn"))
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    nlist: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    seeding: str = "hash",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pairs found by clustering the embedding space with a
    k-means coarse quantizer and comparing vectors ONLY within their
    cluster.

    Complements ``embedding_dup_pairs`` (hyperplane LSH, cos ≥ ~0.99):
    LSH collision probability collapses as the threshold drops (at
    cos = 0.95, θ ≈ 18°, an 8-plane bucket agrees w.p. ≈ 0.43 — recall
    dies), while cluster-scoped comparison keeps recall high at the
    MODERATE thresholds semantic dedup targets, because semantically
    close vectors co-locate under the same nearest centroid.

    Scale shape: centroid assignment is map-side (the centroid literal
    ships with the plan — ``ivf_assign``); the only exchange is the
    self-equi-join on ``cid``, so the quadratic term is bounded per
    cluster: E[pairs] ≈ n²/(2·nlist) for balanced clusters — at 100 TB
    run with nlist ~ 10⁵ (the paper's regime), making each inverted
    list a few thousand vectors.  Every reported pair carries its exact
    cosine (precision 1.0 by construction); misses are exactly the
    cross-cluster pairs (recall unit-tested vs brute force).

    The quadratic bound is only as good as the cluster BALANCE — a fat
    cluster re-inflates it.  Diagnose with
    :func:`semantic_dedup_balance` (skew_report over the assignment);
    remedy with ``seeding="kmeans||"`` and/or more ``iters``.

    Returns ``[id_a, id_b, sim]`` with ``id_a < id_b``, sim rounded to
    6 dp for cross-engine/partitioning stability.
    """
    _, assigned = ivf_build(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col,
        seed=seed, seeding=seeding,
    )
    # Per-side norms once per row (round 10; the knn_bruteforce
    # discipline): the within-cluster join is the quadratic term, and
    # the naive cosine pays 4 norm folds per PAIR — worse, the
    # threshold filter is pushed into the join condition, doubling the
    # whole expression.  One norm per row + one dot per pair instead;
    # values bit-identical (same sqrt/multiply on the same doubles).
    a = assigned.select(
        "cid", F.col("nid").alias("id_a"), F.col("nvec").alias("va"),
        norm(F.col("nvec")).alias("__na"),
    )
    b = assigned.select(
        "cid", F.col("nid").alias("id_b"), F.col("nvec").alias("vb"),
        norm(F.col("nvec")).alias("__nb"),
    )
    den = F.col("__na") * F.col("__nb")
    sim = F.round(F.when(den > 0, dot(F.col("va"), F.col("vb")) / den), 6)
    return (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    threshold: float = 0.9,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    prebuilt: tuple[list[tuple[int, list[float]]], DataFrame] | None = None,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the SEMANTIC
    complement of ``dedup.contamination_hits`` (8-gram collisions):
    flag every corpus document whose embedding is within cosine
    ``threshold`` of any held-out benchmark embedding.  N-gram overlap
    misses paraphrased test items; this catches them (the rephrased-
    contamination setting of Yang et al. 2023, "Rethinking Benchmark
    and Contamination", arXiv:2311.04850).

    Shape: the IVF machinery pointed across two tables — the quantizer
    trains on the CORPUS (``prebuilt`` accepts an ``ivf_build`` result
    to reuse a persisted index); corpus vectors sit in their 1 nearest
    list (map-side assign), while each BENCHMARK vector — the small
    side — probes its ``nprobe`` nearest lists (exploded + broadcast),
    exact cosine verifies inside the probed lists.  Corpus never
    shuffles; work ≈ (nprobe/nlist)·corpus per benchmark item.
    Precision is exact (every pair carries its verified cosine);
    recall is the IVF co-location probability, raised by ``nprobe``
    (differential-tested vs brute force).

    Returns ``[corpus_id, bench_id, sim]`` — one row per contaminated
    (corpus, benchmark) pair above threshold; aggregate per corpus_id
    for a drop list."""
    b0 = bench.select(
        F.col(id_col).alias("bench_id"), F.col(vec_col).alias("bvec")
    )
    if nprobe >= nlist and prebuilt is None:
        # full probe ≡ brute force: every (bench, corpus) pair gets
        # verified regardless of list assignment, so the quantizer
        # (seeding scan + Arrow assignment pass) buys nothing — skip
        # it.  Catalyst constant-folds the constant join key into a
        # BroadcastNestedLoopJoin — the correct physical plan for a
        # constant-size broadcast side (bench rows broadcast, corpus
        # stays map-side; allowlisted in tests/test_plan_audit.py's
        # BNLJ_ALLOWED) — producing the identical pair set the probed
        # plan would.
        assigned = corpus.select(
            F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"),
            F.lit(0).alias("cid"),
        )
        b = b0.select("bench_id", "bvec", F.lit(0).alias("cid"))
    else:
        cents, assigned = prebuilt if prebuilt is not None else ivf_build(
            corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col,
            seed=seed,
        )
        probes = F.slice(
            F.reverse(F.array_sort(_scored_centroids(F.col("bvec"), cents))),
            1,
            nprobe,
        )
        b = b0.select(
            "bench_id", "bvec",
            F.explode(F.transform(probes, lambda s: -s["negcid"])).alias("cid"),
        )
    # Per-side norms once per row (round 10): the threshold filter is
    # pushed into the join CONDITION, so the naive cosine evaluated the
    # full 5-fold expression twice per (corpus, bench) pair — ~10
    # interpreted HOF folds of dim elements each.  With ‖n‖ projected
    # below the join (once per corpus row) and ‖b‖ computed inside the
    # broadcast build (once per bench row), a pair costs one dot fold
    # in the condition plus one for survivors.  Bit-identical: same
    # sqrt/multiply on the same doubles, and the oracle's
    # ``cosine_sql`` replay is unchanged.
    den = F.col("__nn") * F.col("__bn")
    sim = F.round(
        F.when(den > 0, dot(F.col("nvec"), F.col("bvec")) / den), 6
    )
    return (
        assigned.withColumn("__nn", norm(F.col("nvec")))
        .join(F.broadcast(b.withColumn("__bn", norm(F.col("bvec")))), "cid")
        .select(
            F.col("nid").alias("corpus_id"), "bench_id", sim.alias("sim")
        )
        .where(F.col("sim") >= threshold)
    )


def semantic_dedup_balance(
    corpus: DataFrame,
    *,
    nlist: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    seeding: str = "hash",
    top_n: int = 10,
    prebuilt: tuple[list, DataFrame] | None = None,
) -> dict:
    """Cluster-balance diagnostics for :func:`semantic_dedup_pairs`:
    the same quantizer build, reported through
    ``report.skew_report`` on ``cid``.  SemDeDup's within-cluster join
    costs Σ nᵢ², so the numbers that matter are ``max_count`` (the
    fattest inverted list) and ``skew_ratio`` (max/p50 — > a few means
    one cluster dominates the quadratic term; retrain with
    ``seeding="kmeans||"`` or more ``iters`` before running the pair
    join).  Pass ``prebuilt`` (an ``ivf_build`` result) to diagnose
    THE assignment a pair join actually used rather than retraining —
    retraining both doubles the cost and describes a different
    clustering whenever parameters drift.  Cost: one groupBy (plus the
    quantizer build when not prebuilt), output O(top_n)."""
    from cosmap_spark.operators.report import skew_report

    _, assigned = prebuilt if prebuilt is not None else ivf_build(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col,
        seed=seed, seeding=seeding,
    )
    return skew_report(assigned, ["cid"], top_n=top_n)


def cluster_balanced_sample(
    corpus: DataFrame,
    *,
    k_per_cluster: int,
    nlist: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 29,
    sample_seed: int = 97,
    seeding: str = "hash",
    prebuilt: tuple[list[tuple[int, list[float]]], DataFrame] | None = None,
) -> DataFrame:
    """Cluster-balanced corpus selection: k-means coarse clusters over
    the embedding column, then EXACTLY ``k_per_cluster`` uniform-
    deterministic documents from each cluster — the topic-quota
    recipe (cluster-then-sample, the selection step run alongside
    SemDeDup in curation pipelines): a per-cluster quota stops
    majority topics from dominating the curated subset, and sampling
    AFTER clustering keeps rare-topic clusters represented at full
    quota.

    Pure composition of audited parts: ``ivf_build``/``ivf_assign``
    (map-side Arrow assignment; ``prebuilt`` reuses a persisted
    quantizer) + ``sampler.exact_k_per_group`` on ``cid`` (hash-ranked
    window per cluster — Spark's rank-limit pushdown caps rows per map
    partition before the exchange, so the shuffle carries
    O(partitions · nlist · k), never the corpus).  Deterministic,
    partition-layout independent, seed-swappable.

    Returns ``(nid, nvec, cid)`` rows — min(k_per_cluster, |cluster|)
    per cluster."""
    from cosmap_spark.operators.sampler import exact_k_per_group

    _, assigned = prebuilt if prebuilt is not None else ivf_build(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col,
        seed=seed, seeding=seeding,
    )
    return exact_k_per_group(
        assigned, k=k_per_cluster, group_cols=["cid"], key_cols=["nid"],
        seed=sample_seed,
    )


def binarize_vectors(
    df: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "bits",
) -> DataFrame:
    """Sign-bit binary quantization: each vector packed into
    ``dim/64`` 64-bit words (bit = 1 where the component is > 0) — a
    32× compression of a float32 embedding (512× vs the DOUBLE arrays
    the test tables carry), the layout modern binary-quantized vector
    search scans (sign-bit BQ is SimHash with axis-aligned planes, so
    Hamming distance estimates the angle for roughly centered
    embeddings).  Wholly JVM-side: one sequential shift-and-or fold
    per word (``F.aggregate`` over a 64-slice), no Python, no shuffle.

    ``dim`` must be a multiple of 64 (pad upstream otherwise —
    refused loudly rather than zero-padding silently, which would
    bias the Hamming metric toward the pad).
    """
    if dim % 64:
        raise ValueError(
            f"binarize_vectors: dim {dim} is not a multiple of 64 — "
            "pad the vectors upstream; silent zero-padding would bias "
            "Hamming distances"
        )

    def word(w: int):
        return F.aggregate(
            F.slice(F.col(vec_col), w * 64 + 1, 64),
            F.lit(0).cast("long"),
            lambda acc, x: F.shiftleft(acc, 1)
            + F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )

    return df.select(
        F.col(id_col),
        F.array(*[word(w) for w in range(dim // 64)]).alias(out_col),
    )


def knn_binary(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prebuilt_bits: DataFrame | None = None,
) -> DataFrame:
    """Binary-quantized ANN: a compressed EXHAUSTIVE scan — Hamming
    distance over the sign-bit words shortlists ``rerank`` candidates
    per query, exact cosine re-ranks the shortlist (the standard
    binary-quantization serve path: scan bits, touch floats only for
    the shortlist).  Complements the bucketed family (LSH/IVF): no
    training, no recall cliff from an unlucky bucket — the scan sees
    every row, just 64× narrower.

    Plan shape (the 100 TB contract): queries ship as ONE parsed
    literal (batch-sized — same trick as the ADC LUTs), so scoring is
    a generator over the bits scan — corpus×|Q| Hamming rows exist
    only inside the map stage; the shortlist window's ``row_number ≤
    rerank`` triggers Spark's WindowGroupLimit rewrite (plan-asserted
    in tests), which applies the (dist, nid) top-k PER MAP PARTITION
    before the exchange — the exchange carries
    O(partitions·|Q|·rerank) triples, wholly JVM (no Arrow stage: a
    mapInPandas partial top-k measured 2.4× slower end-to-end purely
    on Python-worker overhead); the float vectors are read ONLY by
    the shortlist re-rank joins (broadcast equi-joins on nid/qid,
    batch-sized output).  Hamming itself is ``bit_count(xor)`` per
    word — whole-stage codegen.

    Output matches ``knn_lsh``: (qid, nid, sim, rn), sim = exact
    cosine rounded 6 dp, self-matches excluded, ties broken by nid.

    ``prebuilt_bits`` injects a persisted :func:`binarize_vectors`
    frame (the serve path).  Recall vs brute force is pinned in
    tests/test_dedup_knn.py.
    """
    bits = (
        prebuilt_bits
        if prebuilt_bits is not None
        else binarize_vectors(
            corpus, dim=dim, vec_col=vec_col, id_col=id_col
        )
    )
    qb = binarize_vectors(
        queries, dim=dim, vec_col=vec_col, id_col=id_col
    ).collect()
    if not qb:
        raise ValueError("knn_binary: empty query set")
    q_lit = F.expr(
        "array({})".format(
            ", ".join(
                "named_struct('qid', CAST({} AS BIGINT), 'qb', "
                "array({}))".format(
                    int(r[id_col]),
                    ", ".join(f"CAST({int(w)} AS BIGINT)" for w in r["bits"]),
                )
                for r in qb
            )
        )
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("bits"),
            F.col("q.qb"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = (
        bits.select(F.col(id_col).alias("nid"), "bits",
                    F.explode(q_lit).alias("q"))
        .select(
            F.col("q.qid").alias("qid"),
            "nid",
            hamming.cast("double").alias("dist"),
        )
        .where(F.col("qid") != F.col("nid"))
    )
    w_short = Window.partitionBy("qid").orderBy(
        F.col("dist").asc(), F.col("nid").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w_short))
        .where(F.col("__rn") <= rerank)
        .select("qid", "nid")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    den = F.col("qnorm") * F.col("nnorm")
    sim = F.round(
        F.when(den > 0, dot(F.col("qvec"), F.col("nvec")) / den), 6
    )
    w_final = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("nid").asc()
    )
    return (
        c.join(F.broadcast(shortlist), "nid")
        .join(F.broadcast(q), "qid")
        .select("qid", "nid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w_final))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "sim", F.col("rn").cast("long").alias("rn"))
    )

"""Persist / reload / incrementally extend the ANN index artifacts.

The train-once/serve-many split (`bench.py`'s ``knn_ann_split``)
holds artifacts in memory via ``localCheckpoint``; a real deployment
persists them.  This module is that persistence: every artifact the
serving path consumes — IVF centroids + inverted lists, PQ codebooks +
coded corpus, LSH corpus buckets — lands as parquet under one index
directory, and ``load_ann_index`` rebuilds exactly the keyword
arguments ``queries.llm_ops.knn_ann_union`` (and the underlying
``knn_ivf`` / ``knn_ivfpq`` / ``knn_lsh``) accept.  A manifest file
records which components and structural parameters the index carries,
so a serving session can refuse a mismatched probe configuration
loudly instead of returning silently wrong neighbors.

``ivf_append`` is the incremental path: new vectors are ASSIGNED to
the existing (frozen) centroids and unioned into the inverted lists —
one bounded Arrow pass over the new batch only, the standard
serve-time index maintenance (periodic retrain handles centroid
drift; the append never touches history).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_ann_index(
    path: str,
    *,
    index=None,
    codebooks=None,
    lsh_index: DataFrame | None = None,
    coded: DataFrame | None = None,
    residual: bool = False,
    opq=None,
    opq_codebooks=None,
    opq_coded: DataFrame | None = None,
    bq_bits: DataFrame | None = None,
    backend: str = "rename",
    fs=None,
) -> None:
    """Write the given artifacts under ``path`` (parquet + manifest).
    ``index`` is an ``ivf_build`` result ``(centroids, assigned)``;
    ``codebooks`` a ``pq_train`` nested list; ``lsh_index`` an
    ``lsh_build`` DataFrame; ``coded`` a ``pq_encode`` DataFrame.
    ``residual=True`` records that the PQ artifacts encode
    v − centroid[cid] (``knn_ivfpq(residual=True)`` layout) — codes
    are meaningless under the wrong layout, so the flag travels in
    the manifest and ``load_ann_index`` surfaces it for the serving
    call to pass through.

    ``opq``/``opq_codebooks``/``opq_coded`` persist the OPQ family
    (``pq.opq_train``'s rotation + codebooks and the coded ROTATED
    corpus): the rotation is O(d²) driver state like the codebooks,
    and codes produced under a rotation are meaningless without it —
    storing them together is what makes a loaded OPQ serve
    row-identical to the in-memory one.

    Commit backends (``backend=``): the default ``"rename"`` keeps
    the historical in-place layout (components overwritten, manifest
    written last and atomically) — safe for first saves and ADDING
    components, but a crash mid-RE-save can mix component GENERATIONS
    under the intact old manifest (new codebooks + old coded corpus =
    silently wrong distances).  ``"manifest"`` closes that hole with
    the commit protocol (:mod:`cosmap_spark.sinks.commit`): every
    component of a save lands in its own immutable ``data/<uuid>``
    dir and ONE CAS-published manifest names the complete generation —
    readers see the old save or the new one, never a mix, and crashed
    saves leak only reachability-vacuumable orphans."""
    if backend not in ("rename", "manifest"):
        raise ValueError(f"save_ann_index: unknown backend {backend!r}")
    dirs: dict[str, str] = {}
    ms = None
    if backend == "manifest":
        from cosmap_spark.sinks.commit import ManifestStore

        if fs is None and os.path.exists(
            os.path.join(path, "manifest.json")
        ):
            raise ValueError(
                f"save_ann_index: {path!r} is an existing rename-"
                "layout index — refusing to overlay a manifest store"
            )
        ms = ManifestStore(path, fs)

        def dest(name: str) -> str:
            rel, target = ms.new_data_dir()
            dirs[name] = rel
            return target
    else:
        if os.path.isdir(os.path.join(path, "_manifests")):
            raise ValueError(
                f"save_ann_index: {path!r} is an existing manifest-"
                "layout index — pass backend='manifest'"
            )

        def dest(name: str) -> str:
            return os.path.join(path, name)

    manifest: dict = {"components": []}
    if residual:
        manifest["residual"] = True
    spark = None
    if index is not None:
        cents, assigned = index
        spark = assigned.sparkSession
        spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
            "cid INT, cvec ARRAY<DOUBLE>",
        ).write.mode("overwrite").parquet(dest("ivf_centroids"))
        assigned.write.mode("overwrite").parquet(dest("ivf_assigned"))
        manifest["components"].append("ivf")
        manifest["nlist"] = len(cents)
    if codebooks is not None:
        rows = [
            (s, c, [float(x) for x in codebooks[s][c]])
            for s in range(len(codebooks))
            for c in range(len(codebooks[s]))
        ]
        spark = spark or _require_session(lsh_index, coded)
        spark.createDataFrame(
            rows, "s INT, code INT, vals ARRAY<DOUBLE>"
        ).write.mode("overwrite").parquet(dest("pq_codebooks"))
        manifest["components"].append("pq")
        manifest["m"] = len(codebooks)
        manifest["ksub"] = len(codebooks[0])
    if coded is not None:
        # partitionBy(cid): the inverted lists become DIRECTORIES, so a
        # probe-pruned serve (knn_ivfpq(prune_scan=True)) skips whole
        # lists at the file-listing level — the on-disk layout the
        # SCALE.md §Similarity search story promises (preserved inside
        # the manifest backend's immutable component dir)
        coded.write.mode("overwrite").partitionBy("cid").parquet(
            dest("pq_coded")
        )
        manifest["components"].append("coded")
    if lsh_index is not None:
        lsh_index.write.mode("overwrite").parquet(dest("lsh_buckets"))
        manifest["components"].append("lsh")
    if opq is not None:
        spark = spark or _require_session(lsh_index, coded, opq_coded)
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(opq)],
            "i INT, row ARRAY<DOUBLE>",
        ).write.mode("overwrite").parquet(dest("opq_rotation"))
        manifest["components"].append("opq")
        manifest["opq_dim"] = len(opq)
    if opq_codebooks is not None:
        rows = [
            (s, c, [float(x) for x in opq_codebooks[s][c]])
            for s in range(len(opq_codebooks))
            for c in range(len(opq_codebooks[s]))
        ]
        spark = spark or _require_session(lsh_index, coded, opq_coded)
        spark.createDataFrame(
            rows, "s INT, code INT, vals ARRAY<DOUBLE>"
        ).write.mode("overwrite").parquet(dest("opq_codebooks"))
        manifest["components"].append("opq_pq")
        manifest["opq_m"] = len(opq_codebooks)
        manifest["opq_ksub"] = len(opq_codebooks[0])
    if opq_coded is not None:
        # flat OPQ-PQ has no inverted lists to prune — plain layout
        opq_coded.write.mode("overwrite").parquet(dest("opq_coded"))
        manifest["components"].append("opq_coded")
    if bq_bits is not None:
        # binarize_vectors words (the knn_binary serve artifact): one
        # LONG array per id — the 32x-compressed scan column
        bq_bits.write.mode("overwrite").parquet(dest("bq_bits"))
        manifest["components"].append("bq")
    if ms is not None:
        version = ms.versions()[-1] if ms.exists() else 0
        ms.publish(
            {**manifest, "dirs": dirs,
             "data_dirs": sorted(dirs.values())},
            expected_version=version,
        )
        return
    os.makedirs(path, exist_ok=True)
    # manifest last AND atomically (tmp + rename): it is the marker
    # that the parquet components are complete — a crash mid-save must
    # leave either no manifest or the previous intact one, never a
    # manifest describing half-written components
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))


def save_token_bags(
    path: str,
    centroids: list[tuple[int, list[float]]],
    bags: DataFrame,
    *,
    normalize: bool = True,
    backend: str = "rename",
    fs=None,
) -> None:
    """Persist a :func:`cosmap_spark.operators.retrieval.
    maxsim_token_quantizer` result beside an index — the token-level
    centroid vectors plus the per-doc bags ``[nid, bag array<int>]``
    that :func:`cosmap_spark.operators.retrieval.maxsim_rerank_plaid`
    consumes.  All three artifacts (centroids, bags, manifest with the
    training ``normalize`` flag — bags scored under the wrong
    convention are meaningless, the ``residual`` flag lesson) live in
    ONE ``<path>/plaid`` directory, staged fully in a temp dir and
    swapped in atomically (``writers._swap_dir_in`` — the shared
    backup-rename back half, standard ``.__merge_backup`` suffix so
    the interrupted-swap refusal covers it): a crash mid-RE-save can
    never leave new data under an old manifest (the round-9 review
    finding with the manifest-last variant).

    ``backend="manifest"`` commits through the manifest-pointer
    protocol instead (:mod:`cosmap_spark.sinks.commit` — the index
    store ported through the StoreCommit seam, round-9 verdict task
    #2): centroids and bags land in immutable ``data/<uuid>`` dirs
    under ``<path>/plaid`` and ONE CAS-published manifest names them —
    no directory rename anywhere, re-saves just publish the next
    version, crashed saves leak only reachability-vacuumable orphans
    (``ManifestStore(<path>/plaid).vacuum()``), and the layout works
    on an object store once a ``CommitFS`` is supplied."""
    import uuid

    from cosmap_spark.sinks.writers import (
        _refuse_interrupted_swap,
        _require_local,
        _swap_dir_in,
    )

    if backend not in ("rename", "manifest"):
        raise ValueError(f"save_token_bags: unknown backend {backend!r}")
    live = os.path.join(path, "plaid")
    spark = bags.sparkSession
    if backend == "manifest":
        from cosmap_spark.sinks.commit import ManifestStore

        if fs is None and os.path.exists(
            os.path.join(live, "manifest.json")
        ):
            raise ValueError(
                f"save_token_bags: {live!r} is an existing rename-"
                "layout plaid store — refusing to overlay a manifest "
                "store on it"
            )
        ms = ManifestStore(live, fs)
        version = ms.versions()[-1] if ms.exists() else 0
        crel, ctarget = ms.new_data_dir()
        spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
            "cid INT, cvec ARRAY<DOUBLE>",
        ).write.mode("overwrite").parquet(ctarget)
        brel, btarget = ms.new_data_dir()
        bags.write.mode("overwrite").parquet(btarget)
        ms.publish(
            {
                "components": ["plaid"],
                "nlist": len(centroids),
                "normalize": bool(normalize),
                "centroids": crel,
                "bags": brel,
                "data_dirs": [crel, brel],
            },
            expected_version=version,
        )
        return
    _require_local(path, "save_token_bags")
    if os.path.isdir(os.path.join(live, "_manifests")):
        raise ValueError(
            f"save_token_bags: {live!r} is an existing manifest-layout "
            "plaid store — pass backend='manifest'"
        )
    _refuse_interrupted_swap(live)
    os.makedirs(path, exist_ok=True)
    # sweep debris from CRASHED prior saves (round-9 advice: unlike the
    # MOR store there was no vacuum path for .plaid_tmp_* orphans, so
    # repeated crashed re-saves accumulated full-size copies).  Age
    # guard mirrors mor_vacuum's: an hour-old temp dir cannot belong to
    # a live single-writer save; dot-prefixed names are invisible to
    # readers, so the sweep is purely a disk-space concern.
    import shutil
    import time

    now = time.time()
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if (
            name.startswith(".plaid_tmp_")
            and os.path.isdir(full)
            and now - os.stat(full).st_mtime >= 3600.0
        ):
            shutil.rmtree(full)
    tmp = os.path.join(path, f".plaid_tmp_{uuid.uuid4().hex}")
    spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cid INT, cvec ARRAY<DOUBLE>",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    bags.write.mode("overwrite").parquet(os.path.join(tmp, "bags"))
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(
            {
                "components": ["plaid"],
                "nlist": len(centroids),
                "normalize": bool(normalize),
            },
            f,
        )
    if not os.path.exists(live):
        os.rename(tmp, live)
        return
    _swap_dir_in(live, tmp)


def load_token_bags(spark: SparkSession, path: str, *, fs=None) -> dict:
    """Reload a ``save_token_bags`` directory: ``{"centroids": [...],
    "bags": DataFrame, "normalize": bool}`` — pass centroids/bags to
    ``maxsim_rerank_plaid`` with the recorded ``normalize``.  Loaded
    serving is asserted row-identical to in-memory artifacts in
    tests/test_retrieval.py.  The commit backend is probed from the
    layout (rename-swap ``manifest.json`` vs manifest-pointer
    ``_manifests/``), so readers need no out-of-band knowledge."""
    from cosmap_spark.sinks.writers import _refuse_interrupted_swap

    live = os.path.join(path, "plaid")
    if fs is not None or os.path.isdir(os.path.join(live, "_manifests")):
        from cosmap_spark.sinks.commit import ManifestStore

        _, man = ManifestStore(live, fs).latest()
        cdir = os.path.join(live, man["centroids"])
        bdir = os.path.join(live, man["bags"])
    else:
        _refuse_interrupted_swap(live)
        if not os.path.exists(live) and os.path.exists(
            os.path.join(path, "plaid_manifest.json")
        ):
            raise ValueError(
                f"load_token_bags: {path!r} holds the pre-release flat "
                "plaid_* layout (round-9 interim) — re-save with "
                "save_token_bags (the artifacts now live under "
                "<path>/plaid as one atomic unit)"
            )
        with open(os.path.join(live, "manifest.json")) as f:
            man = json.load(f)
        cdir = os.path.join(live, "centroids")
        bdir = os.path.join(live, "bags")
    cents = [
        (r["cid"], list(r["cvec"]))
        for r in spark.read.parquet(cdir).collect()
    ]
    cents.sort(key=lambda t: t[0])
    return {
        "centroids": cents,
        "bags": spark.read.parquet(bdir),
        "normalize": bool(man.get("normalize", True)),
    }


def _require_session(*dfs) -> SparkSession:
    for df in dfs:
        if df is not None:
            return df.sparkSession
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            "save_ann_index needs a SparkSession to write driver-side "
            "artifacts (codebooks/centroids), but no DataFrame argument "
            "was given and no session is active — create one first"
        )
    return spark


def load_ann_index(spark: SparkSession, path: str, *,
                   version: int | None = None, fs=None) -> dict:
    """Reload a ``save_ann_index`` directory.  Returns a dict whose
    keys mirror ``knn_ann_union``'s keyword arguments — pass it
    through as ``knn_ann_union(spark, sf_dir, **loaded)``; components
    absent from the manifest are simply missing from the dict (the
    consumer then retrains or rejects).  Loaded serve results are
    asserted row-identical to in-memory artifacts in
    tests/test_index_store.py.  The commit backend is probed from the
    layout (in-place ``manifest.json`` vs ``_manifests/``), so readers
    need no out-of-band knowledge; ``version=`` pins a manifest-
    backend load to a historical save."""
    if fs is not None or os.path.isdir(os.path.join(path, "_manifests")):
        from cosmap_spark.sinks.commit import ManifestStore

        ms = ManifestStore(path, fs)
        if version is None:
            _, manifest = ms.latest()
        else:
            manifest = ms.read_version(version)

        def src(name: str) -> str:
            return ms.data_path(manifest["dirs"][name])
    else:
        if version is not None:
            raise ValueError(
                "load_ann_index: version-pinned loads need the "
                "manifest backend (the rename layout keeps no history)"
            )
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)

        def src(name: str) -> str:
            return os.path.join(path, name)

    out: dict = {}
    if "ivf" in manifest["components"]:
        cents = [
            (r["cid"], list(r["cvec"]))
            for r in spark.read.parquet(src("ivf_centroids"))
            .orderBy("cid")
            .collect()
        ]
        assigned = spark.read.parquet(src("ivf_assigned"))
        out["index"] = (cents, assigned)
    if "pq" in manifest["components"]:
        rows = spark.read.parquet(src("pq_codebooks")).collect()
        m, ksub = manifest["m"], manifest["ksub"]
        books = [[None] * ksub for _ in range(m)]
        for r in rows:
            books[r["s"]][r["code"]] = list(r["vals"])
        out["codebooks"] = books
    if "coded" in manifest["components"]:
        coded = spark.read.parquet(src("pq_coded"))
        # the discovered partition column comes back as INT; the
        # in-memory contract (and pq_append's unionByName) is LONG
        out["coded"] = coded.withColumn("cid", F.col("cid").cast("long"))
    if "lsh" in manifest["components"]:
        out["lsh_index"] = spark.read.parquet(src("lsh_buckets"))
    if "opq" in manifest["components"]:
        rows = spark.read.parquet(src("opq_rotation")) \
            .orderBy("i").collect()
        out["opq_rot"] = [list(r["row"]) for r in rows]
    if "opq_pq" in manifest["components"]:
        rows = spark.read.parquet(src("opq_codebooks")).collect()
        m, ksub = manifest["opq_m"], manifest["opq_ksub"]
        books = [[None] * ksub for _ in range(m)]
        for r in rows:
            books[r["s"]][r["code"]] = list(r["vals"])
        out["opq_books"] = books
    if "opq_coded" in manifest["components"]:
        out["opq_coded"] = spark.read.parquet(src("opq_coded"))
    if "bq" in manifest["components"]:
        out["bq_bits"] = spark.read.parquet(src("bq_bits"))
    if manifest.get("residual"):
        out["residual"] = True
    return out


def ivf_append(
    index,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Assign a batch of NEW vectors to the existing (frozen) IVF
    centroids and union them into the inverted lists — the incremental
    index-maintenance path: one Arrow assignment pass over the new
    batch, history untouched, centroids unchanged (periodic retrain
    handles drift).  Returns the updated ``(centroids, assigned)``."""
    from cosmap_spark.operators.knn import ivf_assign

    cents, assigned = index
    fresh = ivf_assign(new_vectors, cents, id_col=id_col, vec_col=vec_col)
    return cents, assigned.select("nid", "nvec", "cid").unionByName(
        fresh.select("nid", "nvec", "cid")
    )


def pq_append(
    index,
    codebooks,
    coded: DataFrame,
    new_vectors: DataFrame,
    *,
    residual: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """:func:`ivf_append`'s counterpart for a PQ-coded corpus: assign
    the new batch to the FROZEN centroids, encode it with the FROZEN
    codebooks (residuals first when the index uses the residual
    layout — pass the manifest's flag), and union into the coded
    table.  One Arrow assignment + one Arrow encode over the NEW rows
    only; history is never re-read or re-encoded, so the incremental
    cost is O(batch), the same maintenance contract as
    ``ivf_append``.  Returns ``((centroids, assigned), coded)`` both
    updated; codes are bit-identical to a from-scratch encode under
    the same artifacts (frozen quantizers are deterministic — pinned
    in tests/test_index_store.py)."""
    from cosmap_spark.operators.knn import ivf_assign
    from cosmap_spark.operators.pq import ivf_residuals, pq_encode

    cents, assigned = index
    fresh = ivf_assign(new_vectors, cents, id_col=id_col, vec_col=vec_col)
    if residual:
        src, src_vec = ivf_residuals(fresh, cents), "rvec"
    else:
        src, src_vec = fresh, "nvec"
    fresh_coded = pq_encode(
        src, codebooks, id_col="nid", vec_col=src_vec, keep=["cid"]
    )
    appended = assigned.select("nid", "nvec", "cid").unionByName(
        fresh.select("nid", "nvec", "cid")
    )
    return (cents, appended), coded.select("nid", "codes", "cid").unionByName(
        fresh_coded.select("nid", "codes", "cid")
    )


# --- lexical (BM25) index persistence -------------------------------

def _write_lex_manifest(
    path: str, lens: DataFrame, *, positional: bool
) -> None:
    """Aggregate the doc-count-sized lens table into the lexical
    manifest stats and write it atomically (tmp + rename) — shared by
    ``save_lex_index`` and ``lex_append`` so the manifest contract has
    exactly one writer."""
    row = lens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("t")
    ).collect()[0]
    manifest = {
        "components": ["lex"],
        "n_docs": int(row["n"] or 0),
        "total_len": int(row["t"] or 0),
        "positional": bool(positional),
    }
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))


def save_lex_index(
    path: str, tf: DataFrame, lens: DataFrame | None = None, *,
    backend: str = "rename", fs=None,
) -> None:
    """Persist a lexical index (``retrieval.build_lex_index`` result)
    under ``path``: the (doc, term, tf) table lands REPARTITIONED AND
    SORTED BY TERM so the serve-time ``term IN (query vocabulary)``
    filter prunes at parquet row-group granularity (min/max stats —
    the lexical twin of ``save_ann_index``'s partitionBy(cid) layout);
    doc lengths land beside it, and the manifest records
    ``n_docs``/``total_len`` so a serving session derives
    ``avgdl = total_len / n_docs`` without scanning anything.

    ``lens=None`` (recommended) derives the length table from the
    WRITTEN tf parquet — the whole save then tokenizes the corpus
    exactly ONCE; passing an explicit ``lens`` re-runs its lineage
    (a second full tokenize for a ``build_lex_index`` frame).  The
    corpus stats always aggregate the written lens parquet, never a
    lineage.

    A POSITIONAL tf (``build_lex_index(positions=True)`` — carries
    ``pos array<int>``) persists as-is; the manifest records
    ``positional`` so ``load_lex_index`` can assert phrase-query
    capability and ``lex_append`` builds batches with the matching
    schema.

    ``backend="manifest"`` commits through the manifest-pointer
    protocol (:mod:`cosmap_spark.sinks.commit`, the same seam as the
    ANN store): the tf and lens tables land in immutable data dirs and
    ONE CAS publish names the complete generation — the rename
    layout's re-save hazard (a crash between the tf and lens writes
    leaves a NEW tf under OLD lens/stats: silently wrong BM25 norms)
    structurally cannot happen.  Incremental maintenance on this
    backend is the SEGMENT STACK (``lex_append`` appends immutable
    segments; ``_lex_resolve_segments`` reconciles latest-unit-wins);
    re-saving the loaded reconciled tf through this function IS the
    compaction — it publishes a folded, term-sorted generation with
    no ``segments`` list."""
    spark = tf.sparkSession
    if backend not in ("rename", "manifest"):
        raise ValueError(f"save_lex_index: unknown backend {backend!r}")
    if backend == "manifest":
        from cosmap_spark.sinks.commit import ManifestStore

        if fs is None and os.path.exists(
            os.path.join(path, "manifest.json")
        ):
            raise ValueError(
                f"save_lex_index: {path!r} is an existing rename-"
                "layout index — refusing to overlay a manifest store"
            )
        ms = ManifestStore(path, fs)
        trel, ttarget = ms.new_data_dir()
        tf.repartition(F.col("term")).sortWithinPartitions(
            "term"
        ).write.mode("overwrite").parquet(ttarget)
        if lens is None:
            lens = (
                spark.read.parquet(ttarget)
                .groupBy("__d").agg(F.sum("tf").alias("dl"))
            )
        lrel, ltarget = ms.new_data_dir()
        lens.write.mode("overwrite").parquet(ltarget)
        row = spark.read.parquet(ltarget).agg(
            F.count("*").alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        version = ms.versions()[-1] if ms.exists() else 0
        ms.publish(
            {
                "components": ["lex"],
                "n_docs": int(row["n"] or 0),
                "total_len": int(row["t"] or 0),
                "positional": "pos" in tf.columns,
                "dirs": {"lex_tf": trel, "lex_lens": lrel},
                "data_dirs": [trel, lrel],
            },
            expected_version=version,
        )
        return
    if os.path.isdir(os.path.join(path, "_manifests")):
        raise ValueError(
            f"save_lex_index: {path!r} is an existing manifest-layout "
            "index — pass backend='manifest'"
        )
    tf.repartition(F.col("term")).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "lex_tf"))
    if lens is None:
        lens = (
            spark.read.parquet(os.path.join(path, "lex_tf"))
            .groupBy("__d")
            .agg(F.sum("tf").alias("dl"))
        )
    lens.write.mode("overwrite").parquet(os.path.join(path, "lex_lens"))
    _write_lex_manifest(
        path, spark.read.parquet(os.path.join(path, "lex_lens")),
        positional="pos" in tf.columns,
    )


def _lex_resolve_segments(spark: SparkSession, ms, manifest: dict):
    """Reconcile a manifest-backend lexical index's SEGMENT STACK into
    (tf, lens) frames — the Lucene/ES segment model as DataFrame
    algebra: unit 0 is the saved base, units 1..N the appended
    segments in publish order; a doc's postings come from the LATEST
    unit whose ``drop`` list contains it (each segment's drop list =
    every doc id its batch carried, so re-submits replace wholesale
    and retractions — batch docs tokenizing to nothing — vanish).
    Each unit anti-joins the UNION of all LATER drop lists: doc-count-
    sized sets, broadcast, so the token tables never shuffle."""
    segs = manifest.get("segments", [])
    units = [(ms.data_path(manifest["dirs"]["lex_tf"]),
              ms.data_path(manifest["dirs"]["lex_lens"]))] + [
        (ms.data_path(s["tf"]), ms.data_path(s["lens"])) for s in segs
    ]
    drops = [
        spark.read.parquet(ms.data_path(s["drop"])).select("__d")
        for s in segs
    ]
    tf_parts, lens_parts = [], []
    for i, (tdir, ldir) in enumerate(units):
        t = spark.read.parquet(tdir)
        ln = spark.read.parquet(ldir)
        later = drops[i:]  # unit i is overridden by segments i+1..N,
        # whose drop lists are drops[i:] (drops[j] belongs to unit j+1)
        if later:
            killset = later[0]
            for d in later[1:]:
                killset = killset.unionByName(d)
            killset = killset.distinct()
            t = t.join(F.broadcast(killset), "__d", "left_anti")
            ln = ln.join(F.broadcast(killset), "__d", "left_anti")
        tf_parts.append(t)
        lens_parts.append(ln)
    tf = tf_parts[0]
    for t in tf_parts[1:]:
        tf = tf.unionByName(t)
    lens = lens_parts[0]
    for ln in lens_parts[1:]:
        lens = lens.unionByName(ln)
    return tf, lens


def load_lex_index(spark: SparkSession, path: str, *,
                   version: int | None = None, fs=None) -> dict:
    """Reload a ``save_lex_index`` directory as the ``prebuilt`` dict
    ``retrieval.bm25_search`` accepts: ``tf``/``lens`` frames plus the
    manifest's ``n_docs`` and the derived ``avgdl`` (``total_len /
    n_docs`` — the exact division the inline ``avg("dl")`` performs on
    integer lengths, so loaded serving is row-identical to in-memory,
    pinned in tests/test_index_store.py).  The commit backend is
    probed from the layout; ``version=`` pins a manifest-backend load
    to a historical generation."""
    if fs is not None or os.path.isdir(os.path.join(path, "_manifests")):
        from cosmap_spark.sinks.commit import ManifestStore

        ms = ManifestStore(path, fs)
        manifest = (
            ms.latest()[1] if version is None
            else ms.read_version(version)
        )
        if "lex" not in manifest["components"]:
            raise ValueError(f"{path}: not a lexical index (see manifest)")
        tf, lens = _lex_resolve_segments(spark, ms, manifest)
    else:
        if version is not None:
            raise ValueError(
                "load_lex_index: version-pinned loads need the "
                "manifest backend (the rename layout keeps no history)"
            )
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if "lex" not in manifest["components"]:
            raise ValueError(f"{path}: not a lexical index (see manifest)")
        tf = spark.read.parquet(os.path.join(path, "lex_tf"))
        lens = spark.read.parquet(os.path.join(path, "lex_lens"))
    out = {
        "tf": tf,
        "lens": lens,
        "n_docs": manifest["n_docs"],
        "positional": bool(manifest.get("positional", False)),
    }
    if out["n_docs"]:
        out["avgdl"] = manifest["total_len"] / out["n_docs"]
    return out


def lex_append(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    allow_new_columns: bool = False,
    fs=None,
) -> None:
    """Incrementally maintain a persisted lexical index: tokenize ONLY
    the new batch and merge it in — history is never re-tokenized.

    Maintenance rides ``sinks.writers.merge_upsert`` keyed on the doc
    id: for the tf table that anti-join ∪ batch algebra is exactly
    doc-level GROUP replacement (every surviving (doc, term) row of a
    re-submitted doc is dropped, all of the batch doc's rows land —
    multi-row "duplicates" per key are the intent here), and for the
    lens table it is a plain one-row-per-doc upsert.  A batch of
    entirely FRESH doc ids takes the writer's append fast path:
    O(batch) new files, no history rewrite.  The manifest's corpus
    stats are refreshed with one O(n_docs) aggregation of the merged
    lens table (columnar, doc-count-sized — never the token table).

    Appended-then-loaded serving is row-identical to an index rebuilt
    from scratch on the merged corpus (pinned for both the fresh-ids
    and the resubmitted-doc case in tests/test_index_store.py).
    A batch doc with NULL text is a RETRACTION — its lexical rows are
    deleted (a rebuild over the merged corpus drops it the same way,
    since tokenization emits nothing for NULL text).

    Layout note: appended/rewritten files are NOT term-sorted, so the
    term-pruning layout ``save_lex_index`` establishes degrades by the
    appended fraction; re-save (compact) periodically, exactly like
    any sorted-layout table under append load.

    On a MANIFEST-backend store this function takes the segment-stack
    path documented in its body (immutable per-batch segments, CAS
    publish, latest-unit-wins reconcile at read time) — same external
    contract, object-store-safe commit.

    ``allow_new_columns=True`` forwards the sink-level ADD-only schema
    evolution (``writers.merge_upsert``) to the tf/lens merges: a
    batch built by a NEWER ``build_lex_index`` that emits extra
    posting columns widens the stored tables (old rows NULL there)
    instead of silently dropping the columns in alignment.  The
    positional/bag-of-words SHAPE still follows the manifest (a
    positional store gets positional batches), because phrase-query
    capability is all-or-nothing — a half-positional index would
    silently miss phrases over its NULL-pos rows."""
    from cosmap_spark.operators.retrieval import build_lex_index
    from cosmap_spark.sinks import writers

    # a NULL doc id is unaddressable: its postings survive every
    # doc-keyed anti-join / upsert (equi-joins never match NULL), so
    # each append would silently ACCUMULATE another copy that no
    # re-submit or retraction can ever replace — refuse at the write
    # boundary, the mor-store null-key rule (one eager batch-sized job)
    if new_docs.where(F.col(id_col).isNull()).limit(1).count():
        raise ValueError(
            f"lex_append: NULL values in id column {id_col!r} — "
            "doc-keyed index maintenance is null-unsafe by contract; "
            "drop or fill NULL-id rows upstream (a RETRACTION is a "
            "NULL-text row with a real id)"
        )
    if fs is not None or os.path.isdir(os.path.join(path, "_manifests")):
        # manifest backend: SEGMENT-STACK maintenance (the Lucene/ES
        # model on the commit protocol) — tokenize ONLY the batch,
        # write one immutable segment (tf + lens + drop list = the
        # batch's doc ids, covering re-submits AND retractions), and
        # CAS-publish; the read side reconciles latest-unit-wins via
        # broadcast anti-joins (_lex_resolve_segments).  O(batch) data
        # written, no history re-read except the doc-count-sized lens
        # reconcile for the manifest stats.  Re-SAVING the loaded
        # reconciled tf (save_lex_index(backend='manifest')) is the
        # compaction that folds the stack and restores term order.
        if allow_new_columns:
            raise ValueError(
                "lex_append: allow_new_columns is rename-backend-only "
                "— on the manifest backend widen by re-saving a folded "
                "generation (segments must share one schema)"
            )
        from cosmap_spark.sinks.commit import ManifestStore

        ms = ManifestStore(path, fs)
        version, man = ms.latest()
        positional = bool(man.get("positional", False))
        tf_new, lens_new = build_lex_index(
            new_docs, id_col=id_col, text_col=text_col,
            positions=positional,
        )
        drop = new_docs.select(
            F.col(id_col).alias("__d")
        ).where(F.col("__d").isNotNull()).distinct()
        trel, ttarget = ms.new_data_dir()
        tf_new.write.mode("overwrite").parquet(ttarget)
        lrel, ltarget = ms.new_data_dir()
        lens_new.write.mode("overwrite").parquet(ltarget)
        drel, dtarget = ms.new_data_dir()
        drop.write.mode("overwrite").parquet(dtarget)
        new_seg = {"tf": trel, "lens": lrel, "drop": drel}
        new_man = {
            **{k: man[k] for k in
               ("components", "positional", "dirs")},
            "segments": man.get("segments", []) + [new_seg],
            "data_dirs": man["data_dirs"] + [trel, lrel, drel],
        }
        # corpus stats of the RECONCILED view (doc-count-sized scans)
        _, lens_all = _lex_resolve_segments(spark, ms, new_man)
        row = lens_all.agg(
            F.count("*").alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        new_man["n_docs"] = int(row["n"] or 0)
        new_man["total_len"] = int(row["t"] or 0)
        ms.publish(new_man, expected_version=version)
        return
    # the batch must match the stored schema: a positional store
    # (manifest flag) gets positional batches, a bag-of-words store
    # plain ones — mixing would fail the path-level merge's unionByName
    with open(os.path.join(path, "manifest.json")) as f:
        positional = bool(json.load(f).get("positional", False))
    tf_new, lens_new = build_lex_index(
        new_docs, id_col=id_col, text_col=text_col, positions=positional
    )
    writers.merge_upsert(
        spark, os.path.join(path, "lex_tf"), tf_new, ["__d"],
        allow_new_columns=allow_new_columns,
    )
    writers.merge_upsert(
        spark, os.path.join(path, "lex_lens"), lens_new, ["__d"],
        allow_new_columns=allow_new_columns,
    )
    # a batch doc with NULL text is a RETRACTION: build_lex_index
    # emits zero rows for it, so the merge above never replaces its
    # group and the stale tokens would serve forever — delete them
    # explicitly (delete_keys is a no-op when the ids are absent)
    null_ids = new_docs.where(F.col(text_col).isNull()).select(
        F.col(id_col).alias("__d")
    ).distinct()
    writers.delete_keys(
        spark, os.path.join(path, "lex_tf"), null_ids, ["__d"]
    )
    writers.delete_keys(
        spark, os.path.join(path, "lex_lens"), null_ids, ["__d"]
    )
    _write_lex_manifest(
        path, spark.read.parquet(os.path.join(path, "lex_lens")),
        positional=positional,
    )

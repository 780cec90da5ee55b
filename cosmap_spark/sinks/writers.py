"""Sinks.

The reference's only writer is an append-mode CSV with hand-rolled
chunked numpy buffering (reference O23/O24,
src/cosmap/output/parser.py:46-119 + writer.py:23-35) and a dict-of-
outputs fan-out (O25, output/output.py:53-75).  Spark's writers replace
the buffering entirely: executors stream partitions to the sink, the
driver never materializes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """Append-mode CSV sink (reference dataframeCsvWriter semantics:
    header on first write — Spark writes one header per file, which is
    the distributed-correct reading of that contract)."""
    df.write.mode("append").option("header", header).csv(path)


def write_output(df: DataFrame, path: str, *, fmt: str = "parquet",
                 mode: str = "append", partition_by: list[str] | None = None) -> None:
    """General sink: parquet (primary), csv, json; optional partitioning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")


def multi_output(outputs: dict[str, DataFrame], base_path: str,
                 *, fmt: str = "parquet", mode: str = "append") -> None:
    """Dict-of-results fan-out: one sink per key (reference
    multiDataframeOutputHandler, src/cosmap/output/output.py:53-75)."""
    for name, df in outputs.items():
        write_output(df, f"{base_path}/{name}", fmt=fmt, mode=mode)


def compact_parquet(spark, src_path: str, dst_path: str,
                    *, target_file_mb: int = 256,
                    zorder_cols: list[str] | None = None,
                    bits: int = 8) -> int:
    """Compact a small-files directory (e.g. a streaming sink's output)
    into ~``target_file_mb`` files: read, coalesce to the computed file
    count, rewrite.  Returns the output file count.

    Small files are the classic landing-zone pathology at scale — a
    100 TB table written in 1 MB files means 10⁸ parquet footers per
    scan.  ``coalesce`` (not ``repartition``) avoids a shuffle: it only
    merges read-splits.  With ``zorder_cols`` the rewrite instead goes
    through :func:`cosmap_spark.operators.layout.write_zordered` —
    compaction and clustering in the same (range-shuffled) pass, the
    OPTIMIZE-with-ZORDER move.  Run per-partition-directory for
    partitioned tables so partition pruning is preserved."""
    import math

    from cosmap_spark.operators.layout import write_zordered as _wz

    df = spark.read.parquet(src_path)
    # Size from the scan's own statistics (file-source sizeInBytes).
    total_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if zorder_cols:
        _wz(df, dst_path, zorder_cols, bits=bits, num_files=n_files)
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    cols: list[str],
    ranges: dict[str, tuple[float, float]] | None = None,
    bits: int = 16,
    num_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on a Z-order (Morton) space-filling curve
    over ``cols`` — the multi-dimensional row-group-pruning layout.

    Partition pruning handles ONE leading dimension; Z-ordering makes
    parquet min/max stats selective in EVERY interleaved dimension at
    once (the Delta/Iceberg OPTIMIZE ZORDER move).  Sink-layer wrapper
    preserving this module's historical fixed-range signature; the
    implementation (both bucketing strategies, the interleave, the
    range shuffle) is canonical in
    :mod:`cosmap_spark.operators.layout` — this wrapper keeps the
    ``range`` strategy (given or min/max-derived [lo, hi) ranges,
    outliers clamped) for reproducible layouts across independent
    writes of the same declared range; use the operator directly for
    the skew-robust quantile-rank strategy."""
    from cosmap_spark.operators.layout import write_zordered as _wz

    _wz(
        df,
        path,
        cols,
        bits=bits,
        num_files=num_files,
        mode=mode,
        strategy="range",
        ranges=ranges,
    )


def describe_layout(path: str, columns: list[str]) -> list[dict]:
    """Row-group-level min/max layout report — delegates to the
    canonical footer reader in
    :func:`cosmap_spark.operators.layout.describe_layout` (see there;
    kept here because layout reports are a sink-side ops concern)."""
    from cosmap_spark.operators.layout import describe_layout as _dl

    return _dl(path, columns)


def merge_upsert(spark, path: str, updates: DataFrame, keys: list[str],
                 *, allow_new_columns: bool = False) -> None:
    """Keyed upsert into a parquet directory — MERGE INTO semantics
    (update-or-insert by key; updates win, unmatched existing rows
    survive) without a transactional table format.

    Plan: built by the frame-level algebra in
    :func:`cosmap_spark.operators.merge.merge_upsert` (existing LEFT
    ANTI updates-keys UNION ALL updates — the update-key side is
    broadcast-hinted, so the big existing table never shuffles).
    Updates are assumed key-unique (this sink's historical contract —
    duplicates both survive the anti-join; resolve them upstream with
    the operator's ``seq_col`` if the feed can repeat keys).  When NO
    existing key is touched (pure inserts — e.g. each dedup batch
    appending fresh signature ids) the rewrite is skipped entirely and
    the new rows append as new files: O(batch), not O(table).

    Rewrites land fully in a temp directory BEFORE the live directory
    is swapped (read-before-delete), then swap by two renames.  The
    swap is NOT atomic: a reader racing the μs window between the
    renames can see a missing path, and a crash inside it leaves the
    data under ``<path>.__merge_backup`` (deterministic name — restore
    by renaming it back).  Directory renames cannot be made atomic on a
    plain filesystem; a log-backed format (Delta/Iceberg) is the real
    fix at production scale, and this helper is the format-free
    approximation.  At scale with a partitioned table, run
    per-partition so only touched partitions rewrite.

    ``allow_new_columns=True`` is ADD-only schema evolution: update
    columns the table lacks widen it (existing rows read back NULL
    there); without the flag extra update columns are DROPPED by the
    alignment (the historical contract).  A widening merge always
    rewrites (the table itself changes shape), so the pure-insert
    append fast path applies only when no widening is needed."""
    import os

    from cosmap_spark.operators.merge import merge_upsert as _merge_plan

    _require_local(path, "merge_upsert")
    _refuse_interrupted_swap(path)
    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)
    if allow_new_columns:
        new_cols = [
            f for f in updates.schema.fields
            if f.name.lower() not in {c.lower() for c in existing.columns}
        ]
        if new_cols:
            # widen the existing side with typed NULLs (the update's
            # types define the new fields); existing fields still
            # align to the table's types below.  The table changes
            # shape, so this is always a rewrite — no append fast path
            existing = existing.select(
                "*",
                *[F.lit(None).cast(f.dataType).alias(f.name)
                  for f in new_cols],
            )
            updates = updates.select(
                *[F.col(f.name).cast(f.dataType)
                  for f in existing.schema.fields]
            )
            _swap_in(
                path,
                _merge_plan(existing, updates, keys, assume_unique=True),
            )
            return
    # align updates to the EXISTING column order AND types: appending
    # files with wider types (e.g. long keys into an int table) would
    # poison the directory with mixed parquet schemas that fail on read
    updates = updates.select(
        *[F.col(f.name).cast(f.dataType) for f in existing.schema.fields]
    )
    upd_keys = updates.select(*keys).distinct()
    if existing.join(F.broadcast(upd_keys), keys, "left_semi").limit(1).count() == 0:
        updates.write.mode("append").parquet(path)
        return
    _swap_in(path, _merge_plan(existing, updates, keys, assume_unique=True))


def merge_upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    *,
    partition_col: str,
) -> None:
    """``merge_upsert`` for a ``partitionBy(partition_col)`` table that
    rewrites ONLY the partitions the updates touch — the copy-on-write
    contract at table scale: a small update against a 100 TB table
    costs O(touched partitions), and untouched partition directories
    are never read, rewritten, or even listed.

    The touched-partition list is a distinct projection of the updates
    (tiny); each touched ``<col>=<value>`` directory then runs the flat
    ``merge_upsert`` (with its append fast path and backup-swap) on its
    own slice of the updates.  New partition values create fresh
    directories.

    Directory names must match what Spark's own ``partitionBy`` wrote,
    or the upsert lands in a bogus sibling directory and the key exists
    twice on the next full read: NULL maps to Spark's
    ``__HIVE_DEFAULT_PARTITION__`` sentinel, booleans to ``true`` /
    ``false``, and values whose rendering contains characters Spark
    would %-escape in the path (``/ : = #`` …) are REFUSED — sanitize
    the partition value upstream rather than trusting two escaping
    implementations to agree."""
    import os
    import re

    _require_local(path, "merge_upsert_partitioned")
    if not os.path.exists(path):
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return
    touched = [
        r["p"] for r in updates.select(
            F.col(partition_col).alias("p")
        ).distinct().collect()
    ]
    for value in touched:
        if value is None:
            rendered = "__HIVE_DEFAULT_PARTITION__"
        elif isinstance(value, bool):
            rendered = "true" if value else "false"
        else:
            rendered = str(value)
            if not re.fullmatch(r"[A-Za-z0-9_.+\- ]+", rendered):
                raise ValueError(
                    f"merge_upsert_partitioned: partition value "
                    f"{value!r} renders as {rendered!r}, which Spark "
                    "would %-escape in the directory name; sanitize "
                    "the partition column upstream (only [A-Za-z0-9_."
                    "+- ] values are accepted verbatim)"
                )
        part_dir = os.path.join(path, f"{partition_col}={rendered}")
        slice_df = updates.where(
            F.col(partition_col).eqNullSafe(F.lit(value))
        ).drop(partition_col)
        merge_upsert(spark, part_dir, slice_df, keys)


def _require_local(path: str, op: str) -> None:
    """The swap/ledger machinery here is built on ``os.rename`` /
    ``os.path`` — driver-local filesystem semantics.  A remote URI
    (``s3a://``, ``hdfs://``…) would not fail loudly: ``os.path.exists``
    is simply always False there, so an EXISTING store would be treated
    as absent and silently reinitialized from one batch — permanent
    data/history loss with no error.  Refuse up front; object stores
    want a log-backed table format (Delta/Iceberg), not rename dances."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    # len > 1 excludes Windows drive letters ("C:\...")
    if scheme and scheme != "file" and len(scheme) > 1:
        raise ValueError(
            f"{op} maintains its store with local-filesystem renames; "
            f"got {path!r} ({scheme}://).  Use a local path, or a "
            "log-backed table format for object stores"
        )


def _refuse_interrupted_swap(path: str) -> None:
    """A crash between ``_swap_in``'s two renames leaves the live path
    MISSING and the whole table under the backup name.  The next merge
    must not fall into the it's-a-new-table branch (it would rewrite
    the table as just the update batch, and a later successful swap
    would delete the backup holding the only full copy) — refuse and
    tell the operator how to restore."""
    import os

    backup = f"{path}.__merge_backup"
    if os.path.exists(backup) and not os.path.exists(path):
        raise RuntimeError(
            f"interrupted merge swap: {path!r} is missing but the "
            f"backup {backup!r} exists (a crash hit the rename "
            f"window).  Restore with os.rename({backup!r}, {path!r}) "
            "and re-run — initializing from the update batch would "
            "silently drop every prior row"
        )


def _bootstrap_store(
    path: str,
    df: DataFrame,
    *,
    extra_files: dict[str, str] | None = None,
) -> None:
    """First-write sibling of :func:`_swap_in` for the streaming
    stores: write the frame AND its sidecar files into a temp
    directory, then ONE rename into place — the sidecars can never
    exist without the data nor the data without its sidecars (a
    sidecar written AFTER the store once left a crash window where a
    mismatched-parameter resume passed validation and silently
    corrupted history — the sketch_stream k lesson).  The parent
    directory is created if needed."""
    import os
    import uuid

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.__init_tmp_{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    for name, content in (extra_files or {}).items():
        with open(os.path.join(tmp, name), "w") as f:
            f.write(content)
    os.rename(tmp, path)


def _swap_dir_in(path: str, tmp: str) -> None:
    """The backup-rename swap on an ALREADY-STAGED temp directory —
    the shared crash-critical back half of :func:`_swap_in` and of
    every store that stages its own temp contents (``mor_compact``'s
    z-ordered rewrite, the plaid token bags): clear a stale backup,
    rename live→backup, tmp→live (restoring live if that rename
    fails), drop the backup.  One implementation so a future
    hardening (fsync, different restore policy) cannot silently miss
    a hand-rolled copy (the round-9 review finding).  Uses the
    standard ``.__merge_backup`` suffix, so
    :func:`_refuse_interrupted_swap` covers every caller."""
    import os
    import shutil

    backup = f"{path}.__merge_backup"
    if os.path.exists(backup):
        # the live path exists (callers checked _refuse_interrupted_swap)
        # so the previous swap COMPLETED and only its cleanup was lost —
        # the backup is stale and safe to clear
        shutil.rmtree(backup)
    os.rename(path, backup)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(backup, path)  # restore the live table, then re-raise
        raise
    shutil.rmtree(backup)


def _swap_in(
    path: str,
    replacement: DataFrame,
    *,
    extra_files: dict[str, str] | None = None,
) -> None:
    """Write ``replacement`` fully to a temp directory, then swap it in
    via the backup-rename dance shared by merge_upsert/delete_keys (see
    merge_upsert's docstring for the atomicity caveats).

    ``extra_files`` (name → text content) land INSIDE the temp
    directory before the swap, so sidecar metadata and data replace
    together or not at all — the streaming Misra-Gries store rides its
    epoch stamp on this (underscore-prefixed names are invisible to
    Spark's parquet reader)."""
    import os
    import uuid

    tmp = f"{path}.__merge_tmp_{uuid.uuid4().hex}"
    replacement.write.mode("overwrite").parquet(tmp)
    for name, content in (extra_files or {}).items():
        with open(os.path.join(tmp, name), "w") as f:
            f.write(content)
    _swap_dir_in(path, tmp)


def delete_keys(spark, path: str, keys_df: DataFrame, key_cols: list[str]) -> int:
    """Propagate deletions into a parquet table — the
    right-to-be-forgotten primitive: every row whose key appears in
    ``keys_df`` is removed, via the same copy-on-write swap as
    ``merge_upsert``.  Returns the number of rows removed; a no-match
    call is a NO-OP (no rewrite — idempotent re-runs after a partial
    propagation are free).  Run against every derived table holding the
    key (curated corpus, signature store, chunk index…) to complete a
    deletion end-to-end."""
    import os

    _require_local(path, "delete_keys")
    _refuse_interrupted_swap(path)
    if not os.path.exists(path):
        return 0
    existing = spark.read.parquet(path)
    dk = keys_df.select(*key_cols).distinct()
    n_hit = existing.join(F.broadcast(dk), key_cols, "left_semi").count()
    if n_hit == 0:
        return 0
    _swap_in(path, existing.join(F.broadcast(dk), key_cols, "left_anti"))
    return n_hit

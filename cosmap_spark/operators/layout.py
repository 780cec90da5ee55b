"""Data layout for file skipping: z-order (Morton) clustering.

At 100 TB the fastest scan is the one that never opens the file:
parquet readers prune files and row groups on footer min/max stats,
but stats only help when values are CLUSTERED — a multi-dimensional
filter over randomly laid-out files matches every file.  Z-ordering
interleaves the bits of per-column quantile ranks so rows close in
the multi-dimensional key space land in the same files, shrinking
every file's bounding box and letting point/range predicates on ANY
prefix-free subset of the z-ordered columns skip most of the data —
the lakehouse ``OPTIMIZE ... ZORDER BY`` layout, expressed as a plain
repartition so it works on any parquet sink.

Scale shape: one approxQuantile stats job (driver state = the
``2^bits − 1`` boundary literals per column, independent of row
count), one map-side rank+interleave projection (JVM higher-order
functions, no Python), one range shuffle into the target file count.
Rank bucketing (not min-max scaling) keeps the interleave balanced
under skew: each bucket holds ~equal row mass by construction.

The reference has no layout story (its catalogs are fixed HDF5 —
/root/reference/src/cosmap/dataset/opencosmo.py); this module is part
of the beyond-reference pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: list[float]) -> "F.Column":
    """Quantile-rank bucket of ``col`` against sorted ``boundaries``:
    ``|{b : b <= x}|`` via a JVM higher-order filter — O(2^bits)
    comparisons per row, all codegen'd, no Python.  NULL compares to
    nothing, so NULLs land in bucket 0 (the natural "first" cell)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    x = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda b: b <= x)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    out_col: str = "__z",
    relative_error: float = 0.001,
) -> DataFrame:
    """Append a Morton key interleaving the ``bits``-bit quantile
    ranks of ``cols`` (``bits × len(cols)`` must fit a signed long, so
    ≤ 63 total).

    Runs ONE eager ``approxQuantile`` stats pass over all columns
    (the only eager work; O(2^bits) driver state per column), then the
    key is a pure map-side projection.  Duplicate quantile boundaries
    (low-cardinality or constant columns) collapse, so such columns
    simply contribute fewer effective bits instead of skewing the
    interleave.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds 63")
    n_bnd = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bnd)]
    all_bnds = df.approxQuantile(cols, probs, relative_error)
    d = len(cols)
    z = F.lit(0).cast("long")
    for k, (c, bnds) in enumerate(zip(cols, all_bnds)):
        uniq = sorted(set(bnds))
        bucket = _bucket_expr(c, uniq) if uniq else F.lit(0).cast("long")
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, j * d + k))
    return df.withColumn(out_col, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` z-ordered on ``cols``: range-partition the Morton
    key into ``num_files`` contiguous key ranges (one output file
    each), sort within each file so row groups cluster too, drop the
    key, write.  Size ``num_files`` so each file lands near the
    cluster's target file size (128–1024 MB at real scale)."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def layout_spans(path: str, cols: list[str]):
    """Per-file min/max footer stats for ``cols`` of a parquet
    directory — the observable the z-order exists to shrink.  Returns
    ``[{file, <col>_min, <col>_max, ...}, ...]`` read driver-side via
    pyarrow (footers only, O(files) work, no data scan) — the same
    stats the Spark scan's file pruning consults."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row: dict = {"file": os.path.basename(f)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        for c in cols:
            row[f"{c}_min"] = lo[c]
            row[f"{c}_max"] = hi[c]
        out.append(row)
    return out


def pruning_ratio(
    spans: list[dict],
    cols: list[str],
    lo: dict,
    hi: dict,
) -> float:
    """Fraction of files a box predicate ``lo[c] <= c <= hi[c]`` must
    open given ``layout_spans`` output — the file-skipping metric a
    layout is judged by (1.0 = no skipping, → 0 = most files
    pruned)."""
    if not spans:
        return 0.0
    hit = 0
    for row in spans:
        ok = True
        for c in cols:
            if row[f"{c}_min"] is None:
                continue
            if row[f"{c}_max"] < lo[c] or row[f"{c}_min"] > hi[c]:
                ok = False
                break
        hit += ok
    return hit / len(spans)


def compact_files(
    spark,
    path: str,
    out_path: str,
    *,
    target_mb: int = 256,
    zorder_cols: list[str] | None = None,
    bits: int = 8,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files
    near ``target_mb`` (the small-file problem — a 100 TB table
    accreted by streaming/incremental writes degenerates into millions
    of KB-files whose open/footer cost dominates every scan).

    File count = ceil(on-disk bytes / target) from driver-side listing
    (no data pass); the rewrite is one job — a plain ``repartition``
    (round-robin, even sizes) or, with ``zorder_cols``, the z-order
    range shuffle so compaction and clustering happen in the same
    pass.  Returns ``{files_before, files_after, bytes}``.

    Writes to ``out_path`` (swap-on-success is the caller's move — an
    in-place overwrite that fails mid-write loses the table)."""
    import glob
    import os

    files = glob.glob(os.path.join(path, "*.parquet"))
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // (target_mb << 20)))
    df = spark.read.parquet(path)
    if zorder_cols:
        write_zordered(df, out_path, zorder_cols, bits=bits,
                       num_files=int(n_out))
    else:
        df.repartition(int(n_out)).write.mode("overwrite").parquet(out_path)
    after = len(glob.glob(os.path.join(out_path, "*.parquet")))
    return {"files_before": len(files), "files_after": after,
            "bytes": int(total)}

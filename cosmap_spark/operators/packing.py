"""Sequence packing: map documents onto fixed-capacity context windows.

The standard LLM-pretraining layout ("concat-then-chunk"): documents are
concatenated in a deterministic order and the token stream is cut every
``capacity`` tokens, so a document occupies the half-open token interval
[start, end) of the global stream and may span several windows.  Packing
is therefore a *global prefix sum* over token counts — the one primitive
a naive window implementation gets wrong at scale, because
``Window.orderBy(...)`` without a partition key collapses the whole
table into ONE task.

Scale shape (the textbook distributed scan, two passes, no
single-partition exchange):

1. shard the order-key domain by explicit range boundaries (ONE
   ``approxQuantile`` call, collected once — the same literal
   boundaries drive both passes, so sharding is deterministic; a
   re-sampled ``repartitionByRange`` + ``spark_partition_id`` would
   NOT be: its split points can differ between the two jobs);
2. per-shard token totals (one tiny row per shard) → collected to the
   driver (#shards rows, not data rows) → exclusive prefix offsets;
3. intra-shard cumulative sum via a window PARTITIONED by shard, plus
   the broadcast per-shard offset.

Determinism: the order key must be unique and numeric (doc_id); the
result is then independent of partition count or layout — the same
discipline as the hash-seeded sampler (operators/sampler.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shard_column(df: DataFrame, order_col: str, num_shards: int):
    """Deterministic range-shard id: count of quantile boundaries ≤ key."""
    probs = [i / num_shards for i in range(1, num_shards)]
    bounds = df.approxQuantile(order_col, probs, 0.001) if probs else []
    if not bounds:
        return F.lit(0)
    barr = F.array(*[F.lit(float(b)) for b in sorted(bounds)])
    key = F.col(order_col).cast("double")
    return F.size(F.filter(barr, lambda b: key >= b))


def pack_offsets(
    df: DataFrame,
    *,
    capacity: int,
    token_col: str = "n_toks",
    order_col: str = "doc_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Assign each row its token interval and context-window span.

    Returns the input columns plus::

        start     -- exclusive prefix sum (global token offset)
        end       -- start + n_toks
        first_bin -- floor(start / capacity)
        last_bin  -- floor((end - 1) / capacity)  (== first_bin when the
                     document fits one window; end == start degenerates
                     to first_bin)

    A (doc → window) exploded mapping is ``explode(sequence(first_bin,
    last_bin))``; per-window membership lists follow with one groupBy.
    """
    if num_shards is None:
        num_shards = df.sparkSession.sparkContext.defaultParallelism
    with_shard = df.withColumn("__shard", _shard_column(df, order_col, num_shards))

    # pass 1: one row per shard — the only driver-side materialization
    totals = (
        with_shard.groupBy("__shard").agg(F.sum(token_col).alias("__stotal")).collect()
    )
    totals_map = {r["__shard"]: r["__stotal"] or 0 for r in totals}
    offsets, acc = {}, 0
    for sid in sorted(totals_map):
        offsets[sid] = acc
        acc += totals_map[sid]
    offset_df = df.sparkSession.createDataFrame(
        [(int(sid), int(off)) for sid, off in offsets.items()],
        "__shard INT, __soffset LONG",
    )

    # pass 2: intra-shard scan (window keyed by shard — never a single
    # global partition) + broadcast offset join
    w = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = with_shard.withColumn("__cum", F.sum(token_col).over(w)).join(
        F.broadcast(offset_df), "__shard"
    )
    start = (F.col("__soffset") + F.col("__cum") - F.col(token_col)).cast("long")
    end = (F.col("__soffset") + F.col("__cum")).cast("long")
    return (
        cum.withColumn("start", start)
        .withColumn("end", end)
        .withColumn("first_bin", F.floor(F.col("start") / capacity).cast("long"))
        .withColumn(
            "last_bin",
            F.floor((F.greatest(F.col("end") - 1, F.col("start"))) / capacity).cast("long"),
        )
        .drop("__shard", "__cum", "__soffset")
    )


def pack_bins(
    df: DataFrame,
    *,
    capacity: int,
    token_col: str = "n_toks",
    order_col: str = "doc_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Exploded (window, doc) membership: one row per context window a
    document touches, with the document's token sub-interval inside that
    window — exactly what a packed-batch loader consumes.

    Columns: ``bin``, ``order_col``, ``bin_start``/``bin_end`` (the
    document's token range within the window, half-open)."""
    packed = pack_offsets(
        df, capacity=capacity, token_col=token_col,
        order_col=order_col, num_shards=num_shards,
    )
    exploded = packed.select(
        order_col, "start", "end",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin"),
    )
    bin_lo = F.col("bin") * capacity
    bin_hi = bin_lo + capacity
    return exploded.select(
        "bin",
        order_col,
        (F.greatest(F.col("start"), bin_lo) - bin_lo).cast("long").alias("bin_start"),
        (F.least(F.col("end"), bin_hi) - bin_lo).cast("long").alias("bin_end"),
    ).where(F.col("bin_end") > F.col("bin_start"))


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "__grn",
    num_shards: int | None = None,
) -> tuple[DataFrame, int]:
    """1-based global ``row_number()`` in ascending lexicographic
    ``order_cols`` order WITHOUT the one-task window
    ``Window.orderBy(...)`` plans — the same two-pass shard discipline
    as ``pack_offsets``: range-shard on the FIRST order column
    (boundary ties all land in one shard, so shard order respects key
    order), per-shard counts collected (O(shards) rows) into exclusive
    offsets, intra-shard ``row_number`` keyed by shard.  Returns
    ``(df + out_col, total_row_count)`` — the total rides along free
    from the offsets pass, which is what global-fraction analytics
    (ntile, percent-of-total) need next.

    The first order column must be numeric (range boundaries come from
    ``approxQuantile``); the full column list must be a total order for
    a deterministic result."""
    first = order_cols[0]
    if num_shards is None:
        num_shards = df.sparkSession.sparkContext.defaultParallelism
    with_shard = df.withColumn(
        "__shard", _shard_column(df, first, num_shards)
    )
    counts = with_shard.groupBy("__shard").count().collect()
    cmap = {r["__shard"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for sid in sorted(cmap):
        offsets[sid] = acc
        acc += cmap[sid]
    offset_df = df.sparkSession.createDataFrame(
        [(int(s), int(o)) for s, o in offsets.items()],
        "__shard INT, __soffset LONG",
    )
    w = Window.partitionBy("__shard").orderBy(*order_cols)
    out = (
        with_shard.join(F.broadcast(offset_df), "__shard")
        .withColumn(
            out_col,
            (F.row_number().over(w) + F.col("__soffset")).cast("long"),
        )
        .drop("__shard", "__soffset")
    )
    return out, acc


def ntile_from_rank(rn, n: int, k: int):
    """Exact ``ntile(k)`` bucket from a 1-based global rank and the
    total row count — SQL-standard semantics (the first ``n % k``
    buckets get ``ceil(n/k)`` rows), verified against the DuckDB oracle
    by q_window_ranks' hash.  Pure column arithmetic: pair with
    :func:`global_rank` to get a global ntile with no one-task
    window."""
    ceil_sz = (n + k - 1) // k
    flr = n // k
    rem = n % k
    cutoff = rem * ceil_sz
    rn = rn.cast("long")
    if flr == 0:
        return (F.floor((rn - 1) / max(ceil_sz, 1)) + 1).cast("long")
    return F.when(
        rn <= cutoff, F.floor((rn - 1) / ceil_sz) + 1
    ).otherwise(rem + F.floor((rn - cutoff - 1) / flr) + 1).cast("long")


def row_index(
    df: DataFrame,
    *,
    order_col: str = "doc_id",
    out_col: str = "row_idx",
    num_shards: int | None = None,
) -> DataFrame:
    """Dense 0-based global row index in ``order_col`` order — the
    distributed replacement for ``monotonically_increasing_id`` (whose
    values are partition-dependent and gapped) and for a global
    ``row_number()`` window (which serializes through one task).
    Same two-pass prefix-sum machinery as ``pack_offsets`` with a token
    weight of 1."""
    counted = df.withColumn("__one", F.lit(1).cast("long"))
    packed = pack_offsets(
        counted, capacity=1, token_col="__one",
        order_col=order_col, num_shards=num_shards,
    )
    return packed.withColumnRenamed("start", out_col).drop(
        "__one", "end", "first_bin", "last_bin"
    )

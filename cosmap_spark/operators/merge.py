"""Snapshot maintenance: CDC merge/upsert and SCD-2 history tables.

The operators a periodically-refreshed 100 TB corpus actually needs
between ingest and training: apply a (small) change batch to a (huge)
snapshot without rewriting or shuffling the snapshot, and keep a
validity-interval history of dimension attributes (the lakehouse
``MERGE INTO`` / slowly-changing-dimension type 2 pair, expressed as
plain DataFrame plans so they run on any sink).

Scale shape: both operators touch the big side exactly once, through
ONE equi-join on the merge keys.  The change batch is the small side —
AQE broadcasts it, so the snapshot never shuffles.  The change batch
itself is deduplicated to one winner per key with a window over the
batch only (batch-sized exchange, never snapshot-sized).

Layering: this module is the pure PLAN algebra (DataFrame in,
DataFrame out — composable, testable against SQL oracles);
``sinks.writers.merge_upsert`` / ``merge_upsert_partitioned`` /
``delete_keys`` wrap it with the path-level copy-on-write concerns
(append fast path, backup-swap, partition-scoped rewrites).

The reference has no mutation story at all (cosmap analyses are
read-only over immutable catalogs — /root/reference/src/cosmap/dataset/
__init__.py); this module is part of the mandated
beyond-reference pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str,
) -> DataFrame:
    """One winner per key from a CDC change batch: the row with the
    highest ``seq_col`` (ties broken by a stable hash of the remaining
    columns so reruns pick the same winner).  The window partitions by
    the merge keys over the CHANGE BATCH only — the exchange is
    batch-sized.

    The tie-break hash anchors every slot as (position, isnull flag,
    value) — Spark's hash functions SKIP null argument slots, so a
    bare ``xxhash64(*others)`` would collide payloads ('x', NULL) and
    (NULL, 'x') and leave the winner to partition arrival order (the
    CLAUDE.md row-hash rule; same token stream as ``snapshot_cdc``).
    """
    others = [c for c in changes.columns if c not in keys]
    anchored = [
        x
        for i, c in enumerate(others)
        for x in (F.lit(i), F.isnull(F.col(c)).cast("int"), F.col(c))
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.xxhash64(*anchored).asc(),
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str | None = None,
    delete_col: str | None = None,
    assume_unique: bool = False,
    broadcast_keys: bool = True,
) -> DataFrame:
    """``MERGE INTO`` as a pure DataFrame plan: rows of ``target``
    whose key appears in ``changes`` are replaced by the change row
    (update), unmatched change rows are inserted, and change rows with
    ``delete_col`` true are tombstones that remove the key.

    Plan: the target side is a LEFT ANTI join against the distinct
    change keys — one equi-join, broadcastable change side, target
    columns stream through untouched — unioned with the surviving
    (non-tombstone) change rows.  No full-outer join, no window over
    the target.

    ``seq_col`` names a monotone version column used to pick one
    winner per key inside the batch (see :func:`latest_per_key`); when
    ``None`` the batch must already be unique per key — enforced with
    one eager batch-sized validation job (the only eager work here;
    pass ``seq_col`` to stay fully lazy, or ``assume_unique=True``
    when uniqueness holds by construction and the batch lineage is
    expensive to re-run).  ``delete_col`` is dropped from the output.

    ``broadcast_keys`` (default) HINTS the distinct change-key set to
    broadcast, guaranteeing the snapshot-side no-shuffle contract
    regardless of size estimates; disable it only for a change batch
    whose key set genuinely exceeds executor memory, accepting a
    shuffled anti-join.

    Output schema = target schema (change rows are column-pruned and
    cast to it, so a wider CDC envelope is fine).
    """
    batch = changes
    if seq_col is not None:
        batch = latest_per_key(batch, keys, seq_col=seq_col)
    elif not assume_unique:
        dup = (
            batch.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                "merge_upsert: change batch has duplicate keys; pass seq_col "
                "to pick a winner per key"
            )
    if delete_col is not None:
        alive = batch.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    else:
        alive = batch
    upserts = alive.select(
        *[F.col(f.name).cast(f.dataType) for f in target.schema.fields]
    )
    key_set = batch.select(*keys).distinct()
    if broadcast_keys:
        key_set = F.broadcast(key_set)
    kept = target.join(key_set, on=keys, how="left_anti")
    return kept.unionByName(upserts)


def mor_reconcile(
    base: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    *,
    epoch_col: str = "epoch",
    delete_col: str = "__deleted",
) -> DataFrame:
    """Merge-on-read reconciliation: the CURRENT view of a base
    snapshot plus an ordered stack of delta batches — the pure-plan
    read side of :mod:`cosmap_spark.sinks.mor`'s store (and usable
    standalone on any (base, deltas) pair of frames).

    ``deltas`` carries the base columns plus ``epoch_col`` (a monotone
    batch number — later epochs win) and ``delete_col`` (true rows are
    tombstones that remove the key).  Within one epoch keys must be
    unique — the store's append contract, enforced there; violating it
    makes the winner row partition-order dependent.

    Plan: ONE batch-sized window picks the winner per key across
    epochs (:func:`latest_per_key` over the DELTAS only), then
    :func:`merge_upsert` applies it — one broadcast anti equi-join
    against the base, which therefore never shuffles and streams
    through untouched.  At 100 TB the cost of a read is O(base scan +
    delta stack), which is why small deletes/upserts can be O(batch)
    at write time (the copy-on-write alternative rewrites partitions).

    Idempotence law (pinned in tests/test_mor.py, and what makes the
    store's compaction crash-safe): re-applying any SUFFIX of the
    delta stack onto an already-reconciled frame is a no-op —
    ``mor_reconcile(mor_reconcile(b, D), suffix(D)) ≡
    mor_reconcile(b, D)``.

    The reference has no mutation story (see module docstring); this
    is the standard log-structured merge read path (Delta/Iceberg
    merge-on-read, published design) expressed as DataFrame algebra.
    """
    winners = latest_per_key(deltas, keys, seq_col=epoch_col)
    return merge_upsert(
        base,
        winners.drop(epoch_col),
        keys,
        delete_col=delete_col,
        assume_unique=True,
    )


def change_feed(
    view_from: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    *,
    epoch_col: str = "epoch",
    delete_col: str = "__deleted",
    change_type_col: str = "_change_type",
    materialize: bool = True,
) -> DataFrame:
    """The NET change classification between a snapshot and the view
    after an ordered delta stack — the algebra under
    :func:`cosmap_spark.sinks.mor.mor_changes` (Delta Lake's
    Change-Data-Feed vocabulary), usable standalone on any
    (snapshot, deltas) pair shaped like :func:`mor_reconcile`'s inputs.

    Output = ``view_from``'s columns plus ``change_type_col`` ∈
    {``insert``, ``update_preimage``, ``update_postimage``,
    ``delete``}: one verdict per key — the winner row per key across
    the stack (later epochs win, :func:`latest_per_key`), classified
    against ``view_from`` membership.  A tombstone of a key absent
    from the snapshot emits nothing (deleting the non-existent is a
    no-op, the store's delete idempotence contract).

    Law (pinned in tests/test_merge.py): applying the feed to the
    snapshot — drop every touched key, union the ``insert`` +
    ``update_postimage`` rows — reproduces
    ``mor_reconcile(view_from, deltas)`` exactly.

    Plan shape: the winner window is stack-sized; the snapshot is
    scanned ONCE (inner join against the broadcast winner keys —
    batch-sized output); every later join is batch × batch.
    ``materialize`` localCheckpoints that matched frame (it has two
    consumers: pre-image rows and the matched key set — the smallest-
    post-aggregation rule); pass ``False`` to stay fully lazy when the
    snapshot lineage is cheap to re-run (e.g. the correctness gate's
    in-memory fixtures)."""
    # the snapshot must not carry the operator's control/output names:
    # a delete_col collision makes the pre-image filter ambiguous, a
    # change_type_col collision yields a duplicate output column (e.g.
    # a feed's own output fed back in)
    clash = [c for c in (delete_col, epoch_col, change_type_col)
             if c in view_from.columns]
    if clash:
        raise ValueError(
            f"change_feed: snapshot columns {clash} collide with the "
            "operator's control/output columns — rename them upstream"
        )
    winners = latest_per_key(deltas, keys, seq_col=epoch_col).drop(
        epoch_col
    )
    pre = view_from.join(
        F.broadcast(winners.select(*keys, delete_col)), keys, "inner"
    )
    if materialize:
        pre = pre.localCheckpoint()
    matched = pre.select(*keys).distinct()
    cols = list(view_from.columns)

    def tag(df: DataFrame, kind: str) -> DataFrame:
        return df.select(*cols, F.lit(kind).alias(change_type_col))

    alive = winners.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    return (
        tag(pre.where(F.coalesce(F.col(delete_col), F.lit(False))),
            "delete")
        .unionByName(tag(
            pre.where(~F.coalesce(F.col(delete_col), F.lit(False))),
            "update_preimage"))
        .unionByName(tag(
            alive.join(F.broadcast(matched), keys, "left_semi"),
            "update_postimage"))
        .unionByName(tag(
            alive.join(F.broadcast(matched), keys, "left_anti"),
            "insert"))
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    *,
    ts_col: str,
    tracked: list[str] | None = None,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply an update batch to a
    history table, closing out current versions whose tracked
    attributes changed and appending the new versions.

    ``dim`` carries ``keys… , tracked… , valid_from, valid_to,
    is_current`` (open versions have ``valid_to`` NULL).  ``updates``
    carries ``keys… , tracked… , ts_col``; multiple updates per key
    collapse to the latest by ``ts_col`` first (batch-sized window).

    Semantics per key:
      * no current row            → insert a new open version
      * current row, values equal → no-op (idempotent re-applies)
      * current row, values differ→ close it (``valid_to`` = update
        ts, ``is_current`` false) and insert the new open version
      * update OLDER than the current version's ``valid_from`` →
        IGNORED (logged nowhere — it is dropped): applying it would
        write an inverted interval (``valid_to < valid_from``) and a
        "current" version that predates the one it supersedes.  SCD-2
        is an in-order protocol; a feed that can deliver late updates
        needs bitemporal handling upstream (sort/buffer by ``ts_col``
        before applying).

    Plan shape: closed/historical rows stream through ONE broadcast
    LEFT join of the full-column dimension scan against the
    latest-update batch; change detection is a null-safe equality fold
    over the tracked columns (JVM-side, no hashing collisions).  New
    OPEN versions for changed keys are derived from that same joined
    frame (the closing row carries the update's values), so the only
    other dimension touch is a second, KEY-COLUMN-PRUNED scan that
    semi-joins the broadcast update keys to find which updates hit an
    existing current row — its output is batch-sized and itself
    broadcasts into the brand-new-key anti-join.  Two column-pruned
    scans, zero dimension-sized shuffles, every join broadcast
    (plan-asserted in tests/test_merge.py).
    """
    if tracked is not None and not tracked:
        # an explicit empty list must not silently become the
        # track-everything default (the falsy-`or` bug class) — and a
        # genuine touch-only run is structurally unsupported here: with
        # zero tracked attributes no version can close, and untracked
        # payload columns have no defined value on inserted versions
        raise ValueError(
            "scd2_apply: tracked=[] — with no tracked attributes no "
            "version can ever close; pass None to track every non-key "
            "update column, or name the attributes explicitly"
        )
    if tracked is None:
        tracked = [
            c for c in updates.columns if c not in keys and c != ts_col
        ]
    latest = latest_per_key(updates, keys, seq_col=ts_col)
    up = latest.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.col(ts_col).alias("__u_ts"),
    )

    joined = dim.join(F.broadcast(up), on=keys, how="left")
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_update = F.col("__u_ts").isNotNull()
    # late-arrival guard: an update older than the open version's start
    # must not close it (inverted interval) — see docstring
    in_order = F.col("__u_ts") >= F.col(start_col)
    closing = F.col(current_col) & has_update & ~same & in_order

    existing = joined.select(
        *[c for c in dim.columns if c not in (end_col, current_col)],
        F.when(closing, F.col("__u_ts")).otherwise(F.col(end_col)).alias(end_col),
        F.when(closing, F.lit(False)).otherwise(F.col(current_col)).alias(current_col),
    ).select(*dim.columns)

    end_t = dim.schema[end_col].dataType

    # new OPEN versions for keys whose current row just closed: the
    # closing row already carries the update's values — no second
    # full-column pass over the dimension
    inserts_changed = joined.filter(closing).select(
        *keys,
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.col("__u_ts").alias(start_col),
        F.lit(None).cast(end_t).alias(end_col),
        F.lit(True).alias(current_col),
    ).select(*dim.columns)

    # updates whose key has NO current row (brand-new, or every version
    # closed): "has a current row" must not key off a tracked column's
    # nullness (tracked values may legitimately be NULL), so compute
    # the matched-key set explicitly — a key-pruned dimension scan
    # semi-joined to the BROADCAST update keys (batch-sized output),
    # which then broadcasts into the anti-join.  The dimension is never
    # on the build/shuffled side of anything.
    cur_matched = (
        dim.filter(F.col(current_col))
        .select(*keys)
        .join(F.broadcast(latest.select(*keys)), on=keys, how="left_semi")
    )
    inserts_new = latest.join(
        F.broadcast(cur_matched), on=keys, how="left_anti"
    ).select(
        *keys,
        *tracked,
        F.col(ts_col).alias(start_col),
        F.lit(None).cast(end_t).alias(end_col),
        F.lit(True).alias(current_col),
    ).select(*dim.columns)

    return existing.unionByName(inserts_changed).unionByName(inserts_new)


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    delete_col: str = "deleted",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The inverse of :func:`merge_upsert`: the MINIMAL change batch
    that turns snapshot ``old`` into snapshot ``new`` — upserts (keys
    added or with changed content, carrying the NEW payload) plus
    tombstones (keys removed; payload NULL, ``delete_col`` true).
    Unchanged keys emit nothing, so at 100 TB the batch is
    delta-sized, never snapshot-sized.

    Round-trip law (pinned in tests/test_merge.py):
    ``merge_upsert(old, snapshot_cdc(old, new, keys), keys,
    delete_col=...) ≡ new``.

    Change detection hashes ``compare_cols`` (default: the non-key
    columns of ``new``) map-side via ``xxhash64`` over the column
    values — the diff join carries keys + two hashes, never payloads
    (operators/diff.py::corpus_diff's discipline; use that when you
    want statuses instead of an applicable batch).  Supported-type
    contract (pinned in tests/test_merge.py): atomics, arrays and
    structs compare by Spark VALUE equality — ``NaN == NaN`` and
    ``-0.0 == 0.0`` (no JSON-serialization false-diffs), NULL is a
    value.  MAP-typed compare columns are REJECTED at build time
    (Spark's own hash expressions refuse maps: same map, different
    iteration order) — compare ``map_entries(sort_array(...))`` style
    canonicalizations instead.  Plan: one keyed join of the two hash
    projections + one join back to ``new`` for the upsert payloads +
    one anti-join for tombstones — all equi-joins on the keys."""
    cols = compare_cols or [c for c in new.columns if c not in keys]
    if not cols:
        raise ValueError("snapshot_cdc: no columns to compare")
    missing = [c for c in cols if c not in old.columns]
    if missing:
        raise ValueError(
            f"snapshot_cdc: compare_cols absent from old side: {missing}"
        )
    mappy = [
        c for c in cols
        if "map<" in new.schema[c].dataType.simpleString()
    ]
    if mappy:
        raise ValueError(
            "snapshot_cdc: map-typed compare columns have no canonical "
            f"hash (nondeterministic key order): {mappy}; canonicalize "
            "first, e.g. compare map_entries(...) sorted by key"
        )

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # Spark's hash expressions SKIP null inputs (seed unchanged), so
        # ('a', NULL) and (NULL, 'a') would collide; each slot therefore
        # contributes (position, isnull flag, value) — the position
        # anchors the slot and the EXPLICIT null flag disambiguates the
        # stream even when a value numerically equals the next slot's
        # anchor (with anchors alone, INT (1, NULL) and (NULL, 1) both
        # hash the stream [0, 1, 1]).  Flags make the token stream's
        # parse deterministic, hence injective on the value tuple.
        anchored = [
            x
            for i, c in enumerate(sorted(cols))
            for x in (
                F.lit(i),
                F.isnull(F.col(c)).cast("int"),
                F.col(c),
            )
        ]
        return df.select(
            *keys, F.xxhash64(*anchored).alias(f"__h_{tag}")
        )

    old_h = hashed(old, "old")
    new_h = hashed(new, "new")
    touched = (
        new_h.join(old_h, on=keys, how="left")
        .where(
            F.col("__h_old").isNull()
            | (F.col("__h_old") != F.col("__h_new"))
        )
        .select(*keys)
    )
    upserts = new.join(touched, on=keys, how="left_semi").select(
        *new.columns, F.lit(False).alias(delete_col)
    )
    tombstones = (
        old_h.join(new_h.select(*keys), on=keys, how="left_anti")
        .select(
            *keys,
            *[
                F.lit(None).cast(new.schema[c].dataType).alias(c)
                for c in new.columns
                if c not in keys
            ],
            F.lit(True).alias(delete_col),
        )
        .select(*new.columns, delete_col)
    )
    return upserts.unionByName(tombstones)


def agg_snapshot(
    df: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """The canonical self-maintainable aggregate of ``df`` — the shape
    :func:`apply_agg_delta` consumes and produces, so that
    ``apply_agg_delta(agg_snapshot(v0), change_feed(v0, D)) ≡
    agg_snapshot(mor_reconcile(v0, D))`` (the incremental-view-
    maintenance law, pinned in tests/test_merge.py).

    ``aggs`` maps each output column to ``(kind, source_col)``:

    * ``("count", None)``      — ``COUNT(*)``; at least one required
      (it is the LIVENESS witness — a group whose row count reaches 0
      vanishes from the maintained view, exactly as it would from a
      fresh ``GROUP BY``);
    * ``("countnn", col)``     — ``COUNT(col)`` (non-null rows);
    * ``("sum", col)``         — ``SUM(col)`` with SQL null semantics
      (NULL over an empty / all-null group).  Every ``("sum", col)``
      REQUIRES a ``("countnn", col)`` sibling somewhere in ``aggs`` —
      without the non-null count the maintainer cannot decide when an
      incrementally-updated sum has gone all-null and must surface
      NULL instead of 0 (re-aggregation would be the only alternative,
      which is the O(table) cost this operator exists to avoid).

    ``min``/``max`` are deliberately ABSENT: they are not
    self-maintainable under deletes (retracting the current extremum
    forces a full re-scan of the group) — the standard IVM
    restriction; keep such columns on a periodic full refresh.
    ``avg`` needs no kind: it is ``sum/countnn``, derivable from the
    maintained state.
    """
    _check_agg_spec(df.columns, group_by, aggs)
    exprs = []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif kind == "countnn":
            exprs.append(F.count(F.col(col)).alias(out))
        else:  # sum
            exprs.append(F.sum(F.col(col)).alias(out))
    return df.groupBy(*group_by).agg(*exprs)


def _check_agg_spec(
    columns: list[str],
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
) -> None:
    if not group_by:
        raise ValueError("agg maintenance: group_by must be non-empty")
    kinds = {"count", "countnn", "sum"}
    counted_cols = {c for (k, c) in aggs.values() if k == "countnn"}
    has_count = False
    for out, (kind, col) in aggs.items():
        if kind not in kinds:
            raise ValueError(
                f"agg maintenance: kind {kind!r} for {out!r} is not "
                f"self-maintainable under deletes — supported: "
                f"{sorted(kinds)} (min/max need a full refresh)"
            )
        if kind == "count":
            if col is not None:
                raise ValueError(
                    f"agg maintenance: ('count', None) takes no source "
                    f"column; got {col!r} for {out!r} — use 'countnn' "
                    "for COUNT(col)"
                )
            has_count = True
            continue
        if col is None or col not in columns:
            raise ValueError(
                f"agg maintenance: source column {col!r} for {out!r} "
                f"not in input columns"
            )
        if col in group_by:
            raise ValueError(
                f"agg maintenance: {out!r} aggregates grouping column "
                f"{col!r} — constant within a group; aggregate a "
                "payload column instead"
            )
        if kind == "sum" and col not in counted_cols:
            raise ValueError(
                f"agg maintenance: ('sum', {col!r}) needs a "
                f"('countnn', {col!r}) sibling in aggs — the non-null "
                "count is the only way to surface SQL's NULL for a "
                "group whose values went all-null under deletes"
            )
        if out in group_by:
            raise ValueError(
                f"agg maintenance: output {out!r} collides with a "
                "grouping column"
            )


def _agg_deltas(
    feed: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
    change_type_col: str,
) -> DataFrame:
    """One batch-sized aggregation of per-group deltas from a NET
    change feed: keys aliased ``__g_<g>``, one ``__d_<out>`` per agg
    entry (shared by :func:`apply_agg_delta` and
    ``sinks.mor.mor_sync_agg``).  An unknown change-type token raises
    at execution."""
    ct = F.col(change_type_col)
    sign = (
        F.when(ct.isin("insert", "update_postimage"), F.lit(1))
        .when(ct.isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(
            F.assert_true(
                F.lit(False),
                F.concat(F.lit("agg delta: unknown change type "), ct),
            ).cast("int")
        )
    )
    d_exprs = []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            d_exprs.append(F.sum(sign).alias(f"__d_{out}"))
        elif kind == "countnn":
            d_exprs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), sign).otherwise(0)
                ).alias(f"__d_{out}")
            )
        else:  # sum: nulls contribute nothing (SQL SUM ignores them)
            d_exprs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull(),
                        sign.cast("long") * F.col(col),
                    ).otherwise(F.lit(0) * F.col(col))
                ).alias(f"__d_{out}")
            )
    return feed.groupBy(
        *[F.col(g).alias(f"__g_{g}") for g in group_by]
    ).agg(*d_exprs)


def apply_agg_delta(
    snapshot: DataFrame,
    feed: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str | None]],
    *,
    change_type_col: str = "_change_type",
    materialize: bool = True,
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: fold
    a NET change feed (:func:`change_feed` / ``sinks.mor.mor_changes``
    — Delta CDF vocabulary) into a maintained ``GROUP BY`` snapshot at
    **O(changes)** cost, never re-scanning the table the snapshot
    summarizes.

    ``snapshot`` is :func:`agg_snapshot`'s output for the pre-feed
    state; the result is :func:`agg_snapshot`'s output for the
    post-feed state (the law pinned in tests/test_merge.py), so calls
    chain across refreshes.

    Semantics: each feed row contributes with sign +1 (``insert`` /
    ``update_postimage``) or −1 (``delete`` / ``update_preimage``) to
    its GROUP's running count / non-null count / sum — an update that
    MOVES a row between groups therefore decrements the old group and
    increments the new one (the pre/post pair lands in different
    groups).  Groups whose row count reaches 0 disappear; groups whose
    sum goes all-null surface NULL (via the mandatory ``countnn``
    sibling).  An unknown change-type token raises at execution (a
    silently dropped verdict would corrupt every later refresh).

    Plan shape: the feed collapses to ONE batch-sized aggregation of
    per-group deltas; the snapshot is scanned once through a LEFT
    null-safe equi-join against the broadcast delta frame (untouched
    groups stream through with zero deltas — no shuffle of the
    snapshot), unioned with the anti side (brand-new groups).  NULL
    grouping values are real groups (SQL semantics) — hence the
    null-safe (``<=>``) join keys.

    A negative resulting row count raises at execution: it means the
    feed was not NET (or was applied twice) — the maintained view
    would silently diverge forever otherwise.  For the store-level
    wrapper with a crash-safe cursor see
    :func:`cosmap_spark.sinks.mor.mor_sync_agg`.
    """
    _check_agg_spec(feed.columns, group_by, aggs)
    missing = [c for c in list(group_by) + list(aggs)
               if c not in snapshot.columns]
    if missing:
        raise ValueError(
            f"apply_agg_delta: snapshot lacks column(s) {missing} — "
            "it must be agg_snapshot's output for the same spec"
        )
    deltas = _agg_deltas(feed, group_by, aggs, change_type_col)
    if materialize:
        # the delta aggregate is the smallest multi-consumer frame
        # (touched-group join AND fresh-group probe both read it) and
        # it is GROUP-count sized; checkpointing it evaluates the feed
        # lineage ONCE and keeps two copies of the feed's (often
        # deeply unioned) plan out of this operator's tree — measured
        # on the q_setops gate fixture: the un-materialized twin
        # re-plans the nested feed twice and dominates the branch's
        # cost.  Pass False only when the feed lineage is trivially
        # cheap AND laziness matters (pure-algebra unit laws).
        # eager=False: the plan truncates IMMEDIATELY (that is the
        # cost being cut) while execution stays lazy, so in-plan
        # guards (unknown change type) still surface at the first
        # action rather than at operator-build time.
        deltas = deltas.localCheckpoint(eager=False)

    # which countnn entry witnesses each sum's nullability
    nn_for = {c: o for o, (k, c) in aggs.items() if k == "countnn"}
    count_out = next(o for o, (k, _) in aggs.items() if k == "count")

    neg_assert = F.assert_true(
        F.lit(False),
        F.lit("apply_agg_delta: group count went negative — feed is "
              "not NET or was applied twice"),
    ).cast("long")

    def merged(old_side: DataFrame, anti: bool) -> DataFrame:
        cols = []
        for g in group_by:
            cols.append(
                (F.col(f"__g_{g}") if anti else F.col(g)).alias(g)
            )
        new_by_out = {}
        for out, (kind, col) in aggs.items():
            old = F.lit(0) if anti else F.coalesce(F.col(out), F.lit(0))
            new_by_out[out] = old + F.coalesce(
                F.col(f"__d_{out}"), F.lit(0)
            )
        for out, (kind, col) in aggs.items():
            v = new_by_out[out]
            if kind == "sum":
                v = F.when(new_by_out[nn_for[col]] > 0, v)
            elif out == count_out and anti:
                # the assert must be CONDITIONED ON the join's
                # presence witness: a guard referencing only the delta
                # side travels with the pushed-down liveness filter
                # BELOW the join and fires for groups the join was
                # about to exclude (observed live: the dying group's
                # −1 delta asserted before the anti semantics applied)
                v = F.when(
                    F.col("__e_present").isNull() & (v < 0), neg_assert
                ).otherwise(v)
            elif out == count_out:
                # references both join sides — cannot sink below it
                v = F.when(v >= 0, v).otherwise(neg_assert)
            cols.append(v.alias(out))
        return old_side.select(*cols)

    cond = None
    for g in group_by:
        c = snapshot[g].eqNullSafe(deltas[f"__g_{g}"])
        cond = c if cond is None else (cond & c)
    touched_and_kept = merged(
        snapshot.join(F.broadcast(deltas), cond, "left"), anti=False
    )
    # the fresh side is a LEFT join + presence-witness filter rather
    # than a left_anti: the anti output carries only delta-side
    # columns, so the negative-count guard there could be pushed below
    # the join (see comment in merged()); the witness column pins the
    # guard above it.  The probe's key columns are ALIAS-RENAMED —
    # snapshot and feed share lineage (both derive from the maintained
    # table), and fresh named attributes are immune to the self-join
    # attribute-dedup ambiguity an exprId-bound reference risks.
    # SCALE: the witness frame is restricted to the delta groups FIRST
    # (snapshot keys ⋉ broadcast delta keys — a column-pruned stream
    # of the snapshot, batch-sized output), so the broadcast below is
    # batch-sized even when the maintained aggregate has millions of
    # groups; broadcasting the full snapshot key set would make
    # refresh cost scale with the aggregate, not the change batch.
    snap_keys = snapshot.select(
        *[F.col(g).alias(f"__e_{g}") for g in group_by]
    )
    matched_keys = snap_keys.join(
        F.broadcast(deltas.select(
            *[F.col(f"__g_{g}") for g in group_by]
        )),
        [F.col(f"__e_{g}").eqNullSafe(F.col(f"__g_{g}"))
         for g in group_by],
        "left_semi",
    )
    existing = F.broadcast(matched_keys.select(
        "*", F.lit(True).alias("__e_present")
    ))
    fresh = merged(
        deltas.join(
            existing,
            [F.col(f"__g_{g}").eqNullSafe(F.col(f"__e_{g}"))
             for g in group_by],
            "left",
        ).where(F.col("__e_present").isNull()),
        anti=True,
    )
    return touched_and_kept.unionByName(fresh).where(
        F.col(count_out) > 0
    )

"""Bounded-state sketching: Misra-Gries heavy hitters without shuffling
the key universe, mergeable HLL sketch-column rollups
(``distinct_rollup`` / ``merge_sketch_tables``) — the pre-aggregated
distinct-count cube whose coarser levels and incremental updates merge
persisted sketches instead of re-scanning the corpus — and KMV
(k-minimum-values) distinct sketches (``kmv_rollup`` /
``segment_overlap``), the family that adds what HLL cannot:
merge-order bit-stability and set algebra (union AND
intersection/Jaccard estimates between groups).

``q_heavy_hitters`` (exact groupBy + HAVING) is the right plan while
the DISTINCT-key table fits the shuffle; at URL/user/n-gram cardinality
(10⁹⁺ keys for a 100 TB corpus) the exchange itself becomes the
bottleneck, and the classic fix is two passes with bounded state:

1. **candidate generation** — one Misra-Gries summary (Misra & Gries
   1982) of size ``k`` per PARTITION, maintained across that
   partition's Arrow batches; the exchange then carries only
   O(partitions · k) candidate rows instead of the key universe.
2. **exact verification** — the tiny candidate set broadcast back
   against the corpus for true counts (one scan, map-side join, the
   aggregation state bounded by |candidates|).

Guarantee (the standard MG merge property): any key with global count
> N/(k+1) survives pass 1 in at least one partition, so the verified
output is EXACT for every key above that threshold — the sketch can
only add false candidates (cheap: they get exact counts and fall out
of the final filter), never lose a true heavy hitter.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summarize(k: int):
    """mapInPandas factory: one Misra-Gries summary of size ``k`` per
    partition, emitted once at partition end, carrying the partition's
    total row count on its first row (``part_rows``; 0 on the rest) so
    the caller's guarantee threshold costs no extra corpus scan."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        saw_batch = False
        for pdf in batches:
            saw_batch = True
            n_rows += len(pdf)
            for key, c in pdf["key"].value_counts().items():
                c = int(c)
                if key in counters:
                    counters[key] += c
                elif len(counters) < k:
                    counters[key] = c
                else:
                    # decrement-all by the min survivable amount: the
                    # batched generalization of MG's decrement step
                    dec = min(c, min(counters.values()))
                    counters = {
                        x: n - dec for x, n in counters.items() if n > dec
                    }
                    if c > dec:
                        counters[key] = c - dec
        if counters:
            yield pd.DataFrame(
                {
                    "key": list(counters),
                    "mg_count": list(counters.values()),
                    "part_rows": [0] * len(counters),
                }
            )
        if saw_batch:
            # the row total rides on a null-key SENTINEL row, emitted
            # even when the counters cancelled to empty — otherwise
            # that partition's rows vanish from N, the guarantee
            # threshold understates, and the output becomes
            # partition-layout dependent
            yield pd.DataFrame(
                {"key": [None], "mg_count": [0], "part_rows": [n_rows]}
            )

    return summarize


def distinct_rollup(
    df: DataFrame,
    hierarchy: list[str],
    col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Approximate ``COUNT(DISTINCT col)`` at EVERY prefix level of
    ``hierarchy`` — e.g. ``[a, b]`` → levels ``(a, b)``, ``(a)``,
    ``()`` — from ONE scan of the data: leaf-level Apache DataSketches
    HLL sketches (``hll_sketch_agg``), rolled up by sketch UNION
    (``hll_union_agg``) with no second look at the raw rows.

    This is the pre-aggregated-cube pattern that makes distinct counts
    tractable at 100 TB: the corpus-sized scan happens once and emits
    O(|leaf groups|) sketch rows (~2^lg_k bytes each); every coarser
    level is an aggregation over THOSE, so adding a rollup level costs
    kilobytes, not a re-scan.  HLL union is associative, commutative,
    and idempotent over sketch state, so a rolled-up level carries the
    SAME ACCURACY BOUND as sketching that level directly (~1.04/√2^lg_k
    relative error) — but NOT bit-identical estimates: merge order
    changes the sketch's internal representation (coupon list vs dense
    promotion), the repo-wide HLL invariant (CLAUDE.md).  Promise
    bounds, never equality — pinned as a tolerance check in
    tests/test_sketch.py.  Contrast
    ``approx_count_distinct``, whose estimate is never materialized as
    a mergeable value: with GROUPING SETS it re-derives every level
    inside one job, but the partial state cannot be persisted and
    unioned with tomorrow's batch.  Sketch rows CAN — persist the leaf
    table and incremental maintenance is ``hll_union_agg`` over
    (yesterday ∪ today), see ``merge_sketch_tables``.

    Returns ``[level, <hierarchy cols as string>, ndv]``, one row per
    group per level; finer-than-level key columns are NULL, ``level``
    is the comma-joined key list (``(all)`` for the grand total).
    """
    leaf = (
        df.groupBy(*hierarchy)
        .agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("__sk"))
        .localCheckpoint(eager=False)
    )
    out = None
    for depth in range(len(hierarchy), -1, -1):
        keys = hierarchy[:depth]
        lvl = leaf.groupBy(*keys).agg(
            F.hll_union_agg("__sk").alias("__sk")
        ) if depth < len(hierarchy) else leaf
        row = lvl.select(
            F.lit(",".join(keys) if keys else "(all)").alias("level"),
            *[
                (
                    F.col(c).cast("string")
                    if c in keys
                    else F.lit(None).cast("string")
                ).alias(c)
                for c in hierarchy
            ],
            F.hll_sketch_estimate("__sk").alias("ndv"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def quantile_rollup(
    df: DataFrame,
    hierarchy: list[str],
    col: str,
    *,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    grid: int = 128,
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles of ``col`` at EVERY prefix level of
    ``hierarchy`` from ONE scan of the data — the quantile member of
    the pre-aggregated-cube family (``distinct_rollup`` is the
    distinct-count member).

    The leaf pass stores one MERGEABLE summary per leaf group: the
    non-null count plus a ``grid``-point equi-rank quantile grid
    (``approx_percentile`` at ranks i/(grid−1)) — an ECDF approximation
    with rank resolution 1/(grid−1).  Every coarser level (down to the
    grand total) treats each grid point as an atom of weight n/grid
    and takes weighted quantiles over the atoms: the raw column is
    never re-read, and a persisted leaf table rolls up tomorrow's new
    groups by the same merge.  Atom tables are sketch-sized
    (groups × grid rows), so the per-level aggregation is trivial at
    any corpus scale.

    Unlike HLL union (bit-exact), grid merging approximates an
    approximation: end-to-end rank error at a rolled-up level is
    bounded by leaf resolution + sketch accuracy ≈ 1.5/grid +
    1/accuracy (~1.3% at the defaults); the unit tests bound it
    against exact percentiles.  Per-level work: one sorted
    collect_list per group over its atoms (the exchange carries
    map-side partially-aggregated sketch rows), one Arrow cumsum over
    each group's weight array, JVM ``filter``/``zip_with`` selection.

    Returns ``[level, <hierarchy cols as string>, n, p<prob>...]``
    (``p_`` name from the digits after "0.", e.g. 0.5 → ``p5``,
    0.99 → ``p99``); finer-than-level keys are NULL, ``level`` is the
    comma-joined key list (``(all)`` for the grand total)."""
    if grid < 2:
        raise ValueError("grid must be >= 2")
    if not probs or any(not 0.0 < p < 1.0 for p in probs):
        raise ValueError("probs must be within (0, 1)")
    ranks = ", ".join(str(i / (grid - 1)) for i in range(grid))
    leaf = (
        df.where(F.col(col).isNotNull())
        .groupBy(*hierarchy)
        .agg(
            F.count(col).alias("__n"),
            F.expr(
                f"approx_percentile({col}, array({ranks}), {accuracy})"
            ).alias("__g"),
        )
        .localCheckpoint(eager=False)
    )

    @F.pandas_udf("array<double>")
    def _cumsum(ws: pd.Series) -> pd.Series:
        return ws.apply(
            lambda a: np.cumsum(np.asarray(a, dtype=np.float64)).tolist()
        )

    def _pcol(p: float) -> str:
        return "p" + str(p)[2:]

    def _tag(lvl: DataFrame, keys: list[str]) -> DataFrame:
        return lvl.select(
            F.lit(",".join(keys) if keys else "(all)").alias("level"),
            *[
                (
                    F.col(c).cast("string")
                    if c in keys
                    else F.lit(None).cast("string")
                ).alias(c)
                for c in hierarchy
            ],
            "n",
            *[_pcol(p) for p in probs],
        )

    out = _tag(
        leaf.select(
            *hierarchy,
            F.col("__n").alias("n"),
            *[
                F.element_at("__g", int(round(p * (grid - 1))) + 1).alias(
                    _pcol(p)
                )
                for p in probs
            ],
        ),
        hierarchy,
    )
    for depth in range(len(hierarchy) - 1, -1, -1):
        keys = hierarchy[:depth]
        atoms = leaf.select(
            *keys,
            F.explode("__g").alias("__val"),
            (F.col("__n") / grid).alias("__w"),
        )
        grp = atoms.groupBy(*keys).agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__val").alias("v"),
                                        F.col("__w").alias("w")))
            ).alias("__a"),
            F.sum("__w").alias("__tot"),
        )
        scanned = grp.select(
            *keys,
            "__tot",
            F.expr("transform(__a, x -> x.v)").alias("__vals"),
            _cumsum(F.expr("transform(__a, x -> x.w)")).alias("__cums"),
        )
        lvl = scanned.select(
            *keys,
            F.round("__tot").cast("long").alias("n"),
            *[
                # try_element_at: an EMPTY input leaves zero atoms —
                # the level row then carries NULL quantiles (n=0)
                # instead of throwing
                F.try_element_at(
                    F.filter(
                        F.expr(
                            "zip_with(__vals, __cums, "
                            "(v, c) -> struct(v as v, c as c))"
                        ),
                        lambda x: x["c"] >= F.lit(p) * F.col("__tot"),
                    ),
                    F.lit(1),
                )["v"].alias(_pcol(p))
                for p in probs
            ],
        )
        out = out.unionByName(_tag(lvl, keys))
    return out



def merge_sketch_tables(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental maintenance of a persisted HLL sketch table: union
    yesterday's ``[*keys, __sk]`` rows with a fresh batch's and merge
    per key — history is never re-scanned, only its sketches
    (O(groups · 2^lg_k) bytes).  Both inputs must carry the same
    ``lg_k`` (``hll_union_agg``'s default rejects mixed precisions
    loudly rather than silently degrading)."""
    return (
        old.unionByName(new)
        .groupBy(*keys)
        .agg(F.hll_union_agg("__sk").alias("__sk"))
    )


def mg_summary(
    df: DataFrame, key_col: str, *, k: int
) -> tuple[DataFrame, int]:
    """ONE Misra-Gries summary of ``df[key_col]``: a ≤k-row table
    ``[key, mg_count]`` plus the true (non-null) row count —
    per-partition bounded summaries (:func:`_mg_summarize`) combined
    by the MG merge (sum counters, then subtract the (k+1)-th largest
    and drop ≤0 — Agarwal et al. 2012, "Mergeable Summaries": the
    merged summary keeps the undercount bound ≤ N/(k+1) of a direct
    build over the union).  Counts are LOWER BOUNDS; any key with
    true frequency > N/(k+1) is guaranteed present.  One corpus scan;
    the localCheckpoint pins its tiny output so the condense probe and
    downstream consumers never re-scan.  NULL keys are excluded (the
    ``heavy_hitters_sketch`` discipline)."""
    key_type = dict(df.dtypes)[key_col]
    keyed = df.select(F.col(key_col).alias("key")).where(
        F.col("key").isNotNull()
    )
    parts = keyed.mapInPandas(
        _mg_summarize(k), f"key {key_type}, mg_count long, part_rows long"
    ).localCheckpoint(eager=True)
    summed = (
        parts.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("mg_count").alias("mg_count"))
    )
    n = parts.agg(F.sum("part_rows").alias("n")).collect()[0]["n"] or 0
    return _mg_condense(summed, k=k), int(n)


def _mg_condense(df: DataFrame, *, k: int) -> DataFrame:
    """Reduce a ``[key, mg_count]`` table to ≤ k rows by the MG merge
    decrement: subtract the (k+1)-th largest count from every counter
    and drop the non-positive — the exact generalization of the
    streaming decrement step.  Input is summary-sized by construction
    (≤ partitions·k or ≤ 2k rows), so the (k+1)-th-largest probe is a
    bounded TakeOrdered collect, never corpus work."""
    top = df.orderBy(F.col("mg_count").desc(), F.col("key")).limit(
        k + 1
    ).collect()
    if len(top) <= k:
        return df
    dec = int(top[-1]["mg_count"])
    return df.select(
        "key", (F.col("mg_count") - F.lit(dec)).alias("mg_count")
    ).where(F.col("mg_count") > 0)


def merge_mg_tables(
    old: DataFrame, new: DataFrame, *, k: int
) -> DataFrame:
    """Merge two ≤k-row MG counter tables ``[key, mg_count]`` (sum,
    then condense) — ``merge_sketch_tables``' heavy-hitter twin.  The
    merged undercount bound is the SUM of the inputs' bounds
    (≤ (N₁+N₂)/(k+1) total), so a persisted counter store absorbs
    batches forever at k·(key + 8 B) state.  NOT replay-idempotent
    (re-merging the same batch double-counts) — the streaming store
    guards replays with its epoch ledger, exactly like HLL."""
    summed = (
        old.unionByName(new)
        .groupBy("key")
        .agg(F.sum("mg_count").alias("mg_count"))
    )
    return _mg_condense(summed, k=k)


# --- KMV (k-minimum values) distinct sketches with set algebra --------

_U64 = 18446744073709551616.0  # 2^64
_OFF = 9223372036854775808.0   # 2^63 (signed→uniform offset)


def _kmv_partials(keys: list[str], k: int):
    """mapInPandas factory: per partition, the k SMALLEST distinct
    hash values per key — bounded state (O(groups·k) int64s), emitted
    once at partition end.  Signed-ascending order throughout: the
    uniform mapping u = (h + 2⁶³)/2⁶⁴ is monotone in the SIGNED hash,
    so numpy's int64 sort here and Spark's array_sort(BIGINT) at merge
    time agree on which values are the minima."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for kt, g in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(kt, tuple):
                    kt = (kt,)
                h = g["__h"].to_numpy(dtype=np.int64)
                cur = state.get(kt)
                allh = h if cur is None else np.concatenate([cur, h])
                state[kt] = np.unique(allh)[:k]  # sorts ascending, dedups
        if state:
            kts = list(state)
            yield pd.DataFrame(
                {
                    **{
                        kc: [kt[i] for kt in kts]
                        for i, kc in enumerate(keys)
                    },
                    "__sk": [state[kt].tolist() for kt in kts],
                }
            )

    return fn


def kmv_merge(col, *, k: int):
    """Aggregate expression merging KMV sketch arrays per group: the k
    smallest distinct values of the union — ``slice(array_sort(
    array_distinct(flatten(collect_list(·)))), 1, k)``.  Input is
    O(rows·k) int64s (rows = sketches being merged, bounded), all
    JVM-side.  Associative, commutative, idempotent — and, unlike HLL
    union (the repo-wide coupon-vs-dense invariant), **bit-identical
    across merge orders**: the k minima of a set do not depend on
    visit order, so rolled-up KMV estimates can be asserted EQUAL to
    one-shot sketches, not merely within bounds."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))),
        1, k,
    )


def kmv_estimate(sk, *, k: int):
    """NDV estimate from a KMV sketch column: exact ``|sk|`` while the
    sketch is unsaturated (it then holds EVERY distinct hash), else the
    Beyer et al. (2007) unbiased estimator ``(k−1)/U(k)`` with ``U(k)``
    the kth smallest hash mapped to uniform (0,1].  Relative std error
    ≈ 1/√(k−2) (~6.3% at k=256)."""
    c = F.col(sk) if isinstance(sk, str) else sk
    u_k = (
        F.try_element_at(c, F.lit(k)).cast("double") + F.lit(_OFF + 1.0)
    ) / F.lit(_U64)
    return F.when(
        F.size(c) < k, F.size(c).cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)


def kmv_union(a, b, *, k: int):
    """The KMV sketch of A ∪ B — the k smallest of the combined
    sketches (closed under union: this IS the sketch one would have
    built over the concatenated data)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_jaccard(a, b, *, k: int):
    """Jaccard estimate between two KMV sketches (same k): among the k
    minima of the union, the fraction present in BOTH input sketches —
    each union-minimum is a uniform random member of A ∪ B, so the
    indicator mean estimates |A∩B|/|A∪B| (Beyer et al. 2007 §4).
    HLL cannot do this (no principled intersection); it is the reason
    this second distinct-sketch family exists."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    u = kmv_union(a, b, k=k)
    kk = F.size(u)
    inter = F.size(F.array_intersect(F.array_intersect(u, a), b))
    return F.when(kk == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / kk.cast("double")
    )


def kmv_leaf(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    k: int = 256,
) -> DataFrame:
    """The per-key KMV sketch table ``[*keys, __sk array<bigint>]`` —
    one corpus scan: JVM-side hash, bounded per-partition partials
    (:func:`_kmv_partials`), one merge aggregation.  NULL values are
    excluded (COUNT DISTINCT semantics); keys that contributed only
    NULLs have no row.  Shared by :func:`kmv_rollup`,
    :func:`segment_overlap`, and the streaming store
    (``streaming.ops.sketch_stream(kind="kmv")``).

    Key columns pass through the Arrow kernel: an int64 KEY column
    CONTAINING nulls arrives in pandas as float64, which collapses
    distinct keys above 2⁵³ and silently merges their sketches (the
    ``heavy_hitters_sketch`` / ``grouped_topk`` hazard — the sketched
    VALUE is immune, it is hashed JVM-side).  Cast such key columns to
    string first."""
    key_types = dict(df.dtypes)
    hashed = df.where(F.col(col).isNotNull()).select(
        *keys, F.xxhash64(F.col(col)).alias("__h")
    )
    schema = ", ".join(
        [f"{c} {key_types[c]}" for c in keys] + ["__sk array<bigint>"]
    )
    partials = hashed.mapInPandas(_kmv_partials(keys, k), schema)
    return partials.groupBy(*keys).agg(kmv_merge("__sk", k=k).alias("__sk"))


def merge_kmv_tables(
    old: DataFrame, new: DataFrame, keys: list[str], *, k: int
) -> DataFrame:
    """Incremental maintenance of a persisted KMV sketch table —
    ``merge_sketch_tables``'s KMV twin, with a STRONGER contract:
    because the k minima of a set are visit-order independent, the
    merged table is BIT-IDENTICAL to a one-shot build over the
    concatenated data, and re-merging an already-merged batch is a
    no-op (full wholesale idempotence, not just estimate-level).  Both
    inputs must have been built with the same ``k`` (a sketch built
    with smaller k would silently cap the merged sketch)."""
    return (
        old.unionByName(new)
        .groupBy(*keys)
        .agg(kmv_merge("__sk", k=k).alias("__sk"))
    )


def kmv_rollup(
    df: DataFrame,
    hierarchy: list[str],
    col: str,
    *,
    k: int = 256,
) -> DataFrame:
    """``distinct_rollup``'s KMV twin: approximate COUNT(DISTINCT col)
    at every prefix level of ``hierarchy`` from ONE scan — leaf
    sketches via bounded per-partition partials (O(groups·k) exchange,
    never the value universe), coarser levels by JVM-side sketch merge.

    Two properties HLL lacks, bought at the cost of k·8 bytes/group
    (vs 2^lg_k bytes but with better constants at equal error):

    * **merge-order bit-stability** — rolled-up levels are asserted
      EQUAL to direct sketches in tests/test_sketch.py, not within
      tolerance (the k minima of a set are visit-order independent);
    * **set algebra** — the leaf table supports union AND
      intersection/Jaccard estimates between groups
      (:func:`kmv_jaccard`, :func:`segment_overlap`).

    NULL values are excluded (COUNT DISTINCT semantics).  Returns
    ``[level, <hierarchy cols as string>, ndv]`` like
    ``distinct_rollup``."""
    leaf = kmv_leaf(df, hierarchy, col, k=k).localCheckpoint(eager=False)
    out = None
    for depth in range(len(hierarchy), -1, -1):
        keys = hierarchy[:depth]
        lvl = leaf.groupBy(*keys).agg(
            kmv_merge("__sk", k=k).alias("__sk")
        ) if depth < len(hierarchy) else leaf
        row = lvl.select(
            F.lit(",".join(keys) if keys else "(all)").alias("level"),
            *[
                (
                    F.col(c).cast("string")
                    if c in keys
                    else F.lit(None).cast("string")
                ).alias(c)
                for c in hierarchy
            ],
            F.round(kmv_estimate("__sk", k=k), 4).alias("ndv"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def segment_overlap(
    df: DataFrame,
    seg_col: str,
    col: str,
    *,
    k: int = 256,
    max_segments: int = 1024,
) -> DataFrame:
    """Pairwise distinct-value overlap between segments — for each
    unordered segment pair: Jaccard, NDV of each side, of the union,
    and of the intersection (= Jaccard · NDV(union)), all from ONE
    corpus scan + a sketch-table self-join.  The cross-corpus
    contamination / shard-affinity question ("how many users do
    shards A and B share?") answered in O(segments²·k) post-scan work
    — segments are few by construction; the corpus is touched once.

    The pair join is deliberately a theta join (``seg_a < seg_b`` →
    broadcast nested loop), which is only safe while the segment
    count stays small — so the ENFORCED contract is ``max_segments``
    (default 1024 ≈ ½M pairs): the sketch leaf the operator already
    aggregates is counted (a segments-sized job on the checkpointed
    leaf, not a second corpus scan) and a higher cardinality refuses
    loudly instead of silently planning an O(segments²) nested loop —
    the ``writers._require_local`` discipline.  For genuinely large
    segment universes, pre-bucket pairs (LSH bands over the sketches)
    or roll up the segment key before calling.

    NULL segment keys are excluded (they would silently vanish in the
    pandas groupby, making results layout-dependent — the
    ``heavy_hitters_sketch`` NULL discipline)."""
    leaf = kmv_leaf(
        df.where(F.col(seg_col).isNotNull()), [seg_col], col, k=k
    ).localCheckpoint(eager=False)
    n_seg = leaf.count()
    if n_seg > max_segments:
        raise ValueError(
            f"segment_overlap: {n_seg} segments exceed "
            f"max_segments={max_segments} — the all-pairs theta join "
            f"would build {n_seg * (n_seg - 1) // 2} pairs as a "
            "nested loop; roll up the segment key, pre-bucket pairs, "
            "or raise max_segments deliberately"
        )
    a = leaf.select(
        F.col(seg_col).alias("seg_a"), F.col("__sk").alias("__ska")
    )
    b = leaf.select(
        F.col(seg_col).alias("seg_b"), F.col("__sk").alias("__skb")
    )
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    u = kmv_union("__ska", "__skb", k=k)
    jac = kmv_jaccard("__ska", "__skb", k=k)
    return pairs.select(
        "seg_a", "seg_b",
        F.round(kmv_estimate("__ska", k=k), 4).alias("ndv_a"),
        F.round(kmv_estimate("__skb", k=k), 4).alias("ndv_b"),
        F.round(jac, 6).alias("jaccard"),
        F.round(kmv_estimate(u, k=k), 4).alias("ndv_union"),
        F.round(jac * kmv_estimate(u, k=k), 4).alias("ndv_inter"),
    )


def heavy_hitters_sketch(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 64,
    min_count: int | None = None,
) -> DataFrame:
    """``[key, n]`` — EXACT counts of every key whose global frequency
    exceeds ``max(min_count, N/(k+1))``, without ever shuffling the key
    universe: Misra-Gries candidates per partition (bounded state,
    O(partitions·k) exchange) + broadcast exact-verify scan.

    Use when ``groupBy(key)`` itself is the bottleneck (distinct keys ≫
    shuffle budget); below that scale ``q_heavy_hitters``'s exact plan
    is simpler and one pass.  The default threshold N/(k+1) is the MG
    guarantee; pass ``min_count`` to cut higher.

    NULL keys are EXCLUDED (count them with one ``isNull`` filter if
    they matter): pandas ``value_counts`` drops them silently inside
    the sketch, the verify equi-join would never match them, and — the
    sharper hazard — Arrow→pandas widens an int64 key column CONTAINING
    nulls to float64, which collapses distinct keys above 2⁵³.  N in
    the guarantee threshold is the non-null row count, consistently on
    both passes.

    Exactly two corpus scans: the MG summary pass (whose tiny
    O(partitions·k) output is localCheckpointed and reused for both the
    candidate set and the row total) and the verify scan."""
    key_type = dict(df.dtypes)[key_col]
    keyed = df.select(F.col(key_col).alias("key")).where(
        F.col("key").isNotNull()
    )
    summaries = keyed.mapInPandas(
        _mg_summarize(k), f"key {key_type}, mg_count long, part_rows long"
    ).localCheckpoint(eager=False)
    cand = summaries.where(F.col("key").isNotNull()).select("key").distinct()
    totals = summaries.agg(F.sum("part_rows").alias("n_rows"))
    exact = (
        keyed.join(F.broadcast(cand), "key")
        .groupBy("key")
        .agg(F.count("*").alias("n"))
    )
    floor = F.floor(F.col("n_rows") / (k + 1)) + F.lit(1)
    threshold = F.greatest(F.lit(min_count or 0).cast("long"), floor)
    return (
        exact.crossJoin(F.broadcast(totals))
        .where(F.col("n") >= threshold)
        .select(F.col("key").alias(key_col), "n")
    )

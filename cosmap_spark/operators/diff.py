"""Corpus snapshot diff — what changed between two versions of a
keyed table (yesterday's crawl vs today's, pre- vs post-cleaning).

One keyed full-outer join decides everything: ``added`` (key only in
new), ``removed`` (key only in old), ``changed`` (both sides, content
hash differs).  Content identity is a deterministic map-side
``xxhash64`` over the compared columns (sorted by name, each slot
contributing (position, isnull flag, value) — the injective token
stream of ``merge.py::snapshot_cdc``, comparing by Spark VALUE
equality: ``NaN == NaN``, ``-0.0 == 0.0``, NULL a real value), so the
join carries keys + two 8-byte hashes per row, never the payload
columns.  MAP-typed compare columns are rejected (no canonical hash —
nondeterministic key order; canonicalize with sorted
``map_entries(...)`` first), the same contract as ``snapshot_cdc``.
``unchanged`` rows are EXCLUDED by default — at 100 TB the
interesting output is the delta (typically ≪ 1% of keys), and
materializing the unchanged 99% would dwarf it.

Duplicate keys on either side are rejected loudly (a diff keyed on a
non-key silently degrades into a many-to-many join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str]):
    # per-slot (position, isnull flag, value): Spark hash functions
    # SKIP null arguments, so flags keep the stream injective — see
    # merge.py::snapshot_cdc's hashed() for the full argument
    return F.xxhash64(
        *[
            x
            for i, c in enumerate(sorted(cols))
            for x in (F.lit(i), F.isnull(F.col(c)).cast("int"), F.col(c))
        ]
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    check_unique: bool = True,
) -> DataFrame:
    """``[id_col, status]`` with status ∈ added / removed / changed
    (+ unchanged when ``include_unchanged``).  ``compare_cols``
    defaults to the non-key columns present on BOTH sides; columns
    only one side has are ignored (schema evolution is not content
    change — diff them explicitly if it matters).

    ``check_unique`` (default on) fails fast if either side repeats a
    key; pass ``False`` only when uniqueness is already enforced
    upstream and the extra aggregation pass matters."""
    shared = [
        c for c in old.columns if c in set(new.columns) and c != id_col
    ]
    cols = compare_cols if compare_cols is not None else shared
    if not cols:
        raise ValueError("no columns to compare")
    missing = [
        c for c in cols if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare_cols absent from a side: {missing}")
    mappy = [
        c for c in cols
        if "map<" in new.schema[c].dataType.simpleString()
        or "map<" in old.schema[c].dataType.simpleString()
    ]
    if mappy:
        raise ValueError(
            "corpus_diff: map-typed compare columns have no canonical "
            f"hash (nondeterministic key order): {mappy}; canonicalize "
            "first, e.g. compare map_entries(...) sorted by key"
        )

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        k = df.select(
            F.col(id_col).alias(f"__id_{tag}"),
            _content_hash(cols).alias(f"__h_{tag}"),
        )
        if check_unique:
            # loud duplicate detection without a second scan of the
            # payload: count per key over the (id, hash) projection
            from pyspark.sql import Window as W

            k = k.withColumn(
                "__n", F.count("*").over(W.partitionBy(f"__id_{tag}"))
            )
            k = k.withColumn(
                f"__id_{tag}",
                F.when(F.col("__n") == 1, F.col(f"__id_{tag}")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(f"corpus_diff: duplicate {id_col} on "
                                  f"{tag} side: "),
                            F.col(f"__id_{tag}").cast("string"),
                        )
                    )
                ),
            ).drop("__n")
        return k

    o, n = keyed(old, "old"), keyed(new, "new")
    joined = o.join(
        n, o["__id_old"] == n["__id_new"], "full_outer"
    )
    status = (
        F.when(F.col("__id_old").isNull(), F.lit("added"))
        .when(F.col("__id_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.coalesce(F.col("__id_new"), F.col("__id_old")).alias(id_col),
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """``[status, n]`` counts — run on a ``corpus_diff`` result (pass
    ``include_unchanged=True`` there if the unchanged count matters)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    bins: int = 10,
    relative_error: float | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two corpus snapshots — the
    Population Stability Index, the standard monitoring statistic for
    "did this feature's distribution move between yesterday's corpus
    and today's" (quality scores, lengths, balances…).

    Per column: equi-depth bin boundaries come from the OLD snapshot's
    quantiles (``bins − 1`` inner edges), both snapshots are binned by
    "count of boundaries strictly below x" (values equal to an edge
    land in the LOWER bin — ``equi_depth_bin``'s convention), and each
    bin contributes

        psi_term = (p_new' − p_old') · ln(p_new' / p_old')

    with ``p' = max(share, eps)`` (the standard clamp — an empty bin
    would otherwise divide/log zero).  Σ psi_term per column is the
    PSI; the usual reading is < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted.  Returns one row per (column, bin):
    ``[column, bin, n_old, n_new, p_old, p_new, psi_term]`` with every
    bin present (zero counts included) — ``groupBy("column").
    agg(sum("psi_term"))`` for the per-column verdict.

    ``relative_error=None`` (default) computes EXACT quantile
    boundaries (one ``percentile`` aggregation per column — the
    hash-exact gate shape, q_setops' ``drift`` branch); pass a value
    (e.g. 0.001) for the ``percentile_approx`` sketch path at 100 TB,
    where an exact percentile would sort the column.  Binning itself
    is map-side against the O(bins) literal boundaries; the only other
    work is two count aggregations per column."""
    if bins < 2:
        raise ValueError(f"need bins >= 2; got {bins}")
    spark = old.sparkSession
    probs = [i / bins for i in range(1, bins)]
    outs: list[DataFrame] = []
    for c in cols:
        if relative_error is None:
            bexpr = F.expr(
                f"percentile(`{c}`, array({', '.join(map(str, probs))}))"
            )
        else:
            bexpr = F.percentile_approx(
                c, F.array(*[F.lit(p) for p in probs]),
                int(1.0 / relative_error),
            )
        raw_bnds = old.agg(bexpr).collect()[0][0]
        if raw_bnds is None:
            # percentile over zero non-null rows is NULL — same
            # contract as the count guard below, caught earlier
            raise ValueError(
                f"snapshot_drift: column {c!r} has no non-null rows on "
                "the old side — no distribution to compare"
            )
        bnds = [float(x) for x in raw_bnds]
        arr = F.array(*[F.lit(b) for b in bnds])

        def bin_of(col: str):
            # bind the cast value ONCE (no CSE inside lambda bodies)
            return F.transform(
                F.array(F.col(col).cast("double")),
                lambda x: F.size(F.filter(arr, lambda b: b < x)),
            )[0].cast("long")

        na = old.where(F.col(c).isNotNull()).groupBy(
            bin_of(c).alias("bin")
        ).agg(F.count(F.lit(1)).alias("n_old"))
        nb = new.where(F.col(c).isNotNull()).groupBy(
            bin_of(c).alias("bin")
        ).agg(F.count(F.lit(1)).alias("n_new"))
        # totals as two driver scalars (cheap count jobs): an unkeyed
        # totals window over the bins frame would be the one
        # single-partition exchange shape the plan audit forbids, and
        # a broadcast cross join of a 1-row frame plans a BNLJ — both
        # avoidable since the totals are genuinely scalar here
        ta_v = old.where(F.col(c).isNotNull()).count()
        tb_v = new.where(F.col(c).isNotNull()).count()
        if ta_v == 0 or tb_v == 0:
            raise ValueError(
                f"snapshot_drift: column {c!r} has no non-null rows on "
                f"{'the old' if ta_v == 0 else 'the new'} side — no "
                "distribution to compare"
            )
        grid = spark.range(bins).select(F.col("id").alias("bin"))
        j = (
            grid.join(na, "bin", "left").join(nb, "bin", "left")
            .select(
                "bin",
                F.coalesce("n_old", F.lit(0)).alias("n_old"),
                F.coalesce("n_new", F.lit(0)).alias("n_new"),
            )
        )
        pa = F.col("n_old").cast("double") / F.lit(float(ta_v))
        pb = F.col("n_new").cast("double") / F.lit(float(tb_v))
        pac = F.greatest(pa, F.lit(float(eps)))
        pbc = F.greatest(pb, F.lit(float(eps)))
        outs.append(
            j.select(
                F.lit(c).alias("column"),
                "bin", "n_old", "n_new",
                F.round(pa, 6).alias("p_old"),
                F.round(pb, 6).alias("p_new"),
                ((pbc - pac) * F.log(pbc / pac)).alias("psi_term"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

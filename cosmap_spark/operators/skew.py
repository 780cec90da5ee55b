"""Skew-mitigation operators: salted aggregation and salted broadcast join.

AQE's skew-join splitting handles most shuffle skew at runtime; these
explicit tools cover the two cases AQE cannot:

* ``salted_agg`` — a groupBy where a handful of hot keys dominate (the
  classic zipfian user_id): pre-aggregate on (key, salt) first, then
  combine the ≤ n_salts partials per key.  Two small shuffles instead of
  one skewed one; correct for any algebraic aggregate (sum/count/min/max
  — pass the combine expressions).
* ``replicated_broadcast_join`` — a broadcast join where the STREAM side
  is skewed is already fine (no shuffle); the problem case is a shuffle
  join with hot keys.  We replicate the small side n_salts× and salt the
  big side, so one hot key spreads over n_salts reducers.

Used implicitly nowhere — the engine's default plans avoid these
shuffles — but exposed for user pipelines over zipfian data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name → (partial_agg_expr, final_agg_expr)
    where the partial runs per (keys, salt) and the final combines the
    partials per keys, e.g.::

        salted_agg(ev, ["user_id"], {
            "n":     (F.count("*"),      F.sum("n")),
            "total": (F.sum("value"),    F.sum("total")),
            "mx":    (F.max("value"),    F.max("mx")),
        })

    ``salt_source`` defaults to a deterministic hash of all columns is
    not possible generically, so we use a per-row uniform derived from
    ``spark_partition_id`` + monotonic id — even spread, no extra input.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def replicated_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    big gets ``salt = hash(row) % n``; small explodes to all n salts; the
    join key becomes (on, salt) — a hot key's rows land on n different
    reducers instead of one.  With the small side also broadcast, this
    composes into a skew-proof broadcast join for when the small side is
    near the broadcast limit and Catalyst falls back to shuffle.

    Only left-preserving joins are valid: each big row carries exactly
    ONE salt, so inner/left/semi/anti semantics are unchanged — but an
    unmatched small-side row exists once PER REPLICA, so right/full outer
    joins would emit it n_salts times.  Those are rejected."""
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"replicated_broadcast_join supports left-preserving joins only "
            f"(inner/left/semi/anti); got how={how!r} — a right/full outer "
            f"join would duplicate unmatched small-side rows per salt replica"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    out = big_s.join(F.broadcast(small_s), [on, "__salt"], how)
    return out.drop("__salt")

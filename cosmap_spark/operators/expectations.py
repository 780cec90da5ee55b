"""Declarative data-quality expectations — the landing-zone contract
check (the Great-Expectations/dbt-test shape, engine-native).

A rule is ``{"name", "expr", "max_violation_frac"?}`` where ``expr``
is a SQL boolean that must hold per row (NULL counts as a violation —
an unevaluable expectation is a failed one).  ``validate`` evaluates
EVERY rule in ONE aggregation pass over the table (each rule becomes
one conditional-sum column; no per-rule scans, no shuffle beyond the
scalar aggregate), so checking 50 rules on 100 TB costs one scan.

Returns one row per rule: ``[rule, n_rows, n_violations,
violation_frac, passed]``.  ``enforce`` raises with the failing
rules formatted when any rule exceeds its threshold — the gate form
for pipelines; ``quarantine`` splits the input into (clean, violating)
DataFrames on the conjunction of all rules — the dead-letter form
(same contract as sources.readers.read_csv_tolerant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationError(RuntimeError):
    """Raised by :func:`enforce` when a rule exceeds its threshold."""


def _violation(expr: str):
    # NULL-safe: a rule that evaluates to NULL is a violation
    return F.when(F.coalesce(F.expr(expr), F.lit(False)), 0).otherwise(1)


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One row per rule with violation counts/fractions — ONE
    aggregation job regardless of rule count."""
    if not rules:
        raise ValueError("need at least one rule")
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            # coalesce: SUM over zero rows is NULL, and an empty table
            # must report 0 violations, not NULL (review finding)
            F.coalesce(F.sum(_violation(r["expr"])), F.lit(0)).alias(
                f"__v_{i}"
            )
            for i, r in enumerate(rules)
        ],
    )
    # ONE row per rule via explode of the single aggregate row — a
    # union of per-rule selects would re-plan (and re-scan) the
    # aggregate once per rule
    per_rule = F.array(
        *[
            F.struct(
                F.lit(r["name"]).alias("rule"),
                F.col(f"__v_{i}").cast("long").alias("v"),
                F.lit(float(r.get("max_violation_frac", 0.0))).alias("t"),
            )
            for i, r in enumerate(rules)
        ]
    )
    frac = F.when(
        F.col("n_rows") > 0, F.col("__r.v") / F.col("n_rows")
    ).otherwise(F.lit(0.0))
    return (
        agg.select(F.col("__n").alias("n_rows"), F.explode(per_rule).alias("__r"))
        .select(
            F.col("__r.rule").alias("rule"),
            "n_rows",
            F.col("__r.v").alias("n_violations"),
            F.round(frac, 6).alias("violation_frac"),
            (frac <= F.col("__r.t")).alias("passed"),
        )
    )


def enforce(df: DataFrame, rules: list[dict]) -> None:
    """Raise :class:`ExpectationError` listing every failed rule; a
    no-op when all rules hold.  One job (the validate pass)."""
    failed = [
        r for r in validate(df, rules).collect() if not r["passed"]
    ]
    if failed:
        lines = ", ".join(
            f"{r['rule']}: {r['n_violations']}/{r['n_rows']} "
            f"({100 * r['violation_frac']:.3f}%)"
            for r in failed
        )
        raise ExpectationError(f"expectations failed — {lines}")


def quarantine(
    df: DataFrame, rules: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """(clean, violating) split on the conjunction of all rules —
    row-level dead-lettering.  Lazy: both halves are filters over the
    input (one scan each when materialized; persist the input first
    if both sides are consumed)."""
    if not rules:
        raise ValueError("need at least one rule")
    ok = None
    for r in rules:
        c = F.coalesce(F.expr(r["expr"]), F.lit(False))
        ok = c if ok is None else (ok & c)
    return df.where(ok), df.where(~ok)

"""Two-sample hypothesis tests — the inferential members of the
monitoring/experimentation pillar (drift family: operators/diff.py;
behavioral family: operators/funnel.py; this module answers "is the
difference REAL?").

Both tests follow the engine's exact-integer determinism discipline
(CLAUDE.md, the ``grouped_changepoint`` family): inputs quantize to
exact integers first, every statistic is then computed from exact
integer sums by the SAME expression tree in Spark and DuckDB, so the
results are bit-identical cross-engine and partition-layout
independent — statistics sit under the hash gate with no tolerance.

The reference has no statistics surface; these are standard published
procedures (Kolmogorov–Smirnov two-sample; Mann–Whitney–Wilcoxon;
Welch 1947 unequal-variance t with Welch–Satterthwaite degrees of
freedom; Pearson 1900 chi-squared; two-proportion z).  :func:`decide`
layers asymptotic p-values + a ``significant`` verdict on top of any
of them (kept OUT of the hash gates by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized_counts(
    old: DataFrame, new: DataFrame, cols: list[str],
    quantize_dp: int, op: str,
) -> DataFrame:
    """Shared front half of the two-sample rank/distribution tests:
    numeric-type validation, quantization to exact longs, the stacked
    union, and the ONE ``groupBy(column, q)`` producing per-side
    counts ``[column, q, co, cn]`` — ks_test and mann_whitney_u
    compute their statistics from this same frame (and the q_setops
    oracle computes both from one shared CTE)."""
    from cosmap_spark.operators.diff import _NUMERIC_BASES, _stack_numeric

    if not cols:
        raise ValueError(f"{op}: no columns given")
    for df, side in ((old, "old"), (new, "new")):
        for c in cols:
            base = df.schema[c].dataType.simpleString().split("(")[0]
            if base not in _NUMERIC_BASES:
                raise ValueError(
                    f"{op}: column {c!r} on the {side} side is "
                    f"{base}, not numeric — for categorical features "
                    "use category_drift"
                )
    scale = float(10 ** quantize_dp)
    both = _stack_numeric(old, cols, "o").unionByName(
        _stack_numeric(new, cols, "n")
    )
    return (
        both.select(
            "side", "column",
            F.round(F.col("value") * F.lit(scale)).cast("long").alias("q"),
        )
        .groupBy("column", "q")
        .agg(
            F.sum(F.when(F.col("side") == "o", 1).otherwise(0))
            .cast("long").alias("co"),
            F.sum(F.when(F.col("side") == "n", 1).otherwise(0))
            .cast("long").alias("cn"),
        )
    )


def one_side_quantized_counts(
    df: DataFrame, cols: list[str], quantize_dp: int, op: str,
) -> DataFrame:
    """ONE side's ``[column, q, n]`` quantized-value counts — the
    per-micro-batch kernel of the live KS monitor
    (``streaming.ops.ks_stream``) and the shape its frozen reference
    persists.  Exact integers, so accumulating them across batches
    and re-running :func:`ks_from_counts` is BIT-identical to a
    one-shot :func:`ks_test` over the concatenated data."""
    from cosmap_spark.operators.diff import _NUMERIC_BASES, _stack_numeric

    if not cols:
        raise ValueError(f"{op}: no columns given")
    for c in cols:
        base = df.schema[c].dataType.simpleString().split("(")[0]
        if base not in _NUMERIC_BASES:
            raise ValueError(
                f"{op}: column {c!r} is {base}, not numeric — for "
                "categorical features use category_drift"
            )
    scale = float(10 ** quantize_dp)
    return (
        _stack_numeric(df, cols, "o")
        .select(
            "column",
            F.round(F.col("value") * F.lit(scale)).cast("long").alias("q"),
        )
        .groupBy("column", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def ks_test(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    quantize_dp: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per column —
    ``[column, n_old, n_new, d_num, d_stat, lambda_stat]`` where
    ``d_stat = sup_x |F_old(x) − F_new(x)|``.

    Exactness: values quantize to ``quantize_dp`` decimals as longs;
    the supremum is computed on the INTEGER numerator
    ``d_num = max |cum_old·n_new − cum_new·n_old|`` (exact — no float
    ever enters the argmax), and ``d_stat = d_num/(n_old·n_new)`` is
    one exact-ratio division.  ``lambda_stat = d·√(n·m/(n+m))`` is the
    usual asymptotic abscissa (≳1.36 ≈ the 5% critical value; ≳1.63 ≈
    1%) — feed the frame to :func:`decide` for the p-value +
    ``significant`` verdict surface.  NULLs are excluded; a side with
    no non-null rows raises.

    Scale shape: one stacked map-side pass over both frames, ONE
    ``groupBy(column, value)`` with map-side combine (the corpus
    collapses to distinct quantized values before any ordered work),
    then a column-KEYED cumulative window over the distinct-value
    table and a per-column max.  The ordered state is
    O(distinct values per column), never corpus-sized — for genuinely
    continuous unquantized data at 100 TB, lower ``quantize_dp`` to
    bound the distinct-value table (the induced error is at most the
    quantization width in probability).  ``cum·n`` stays within long
    for n_old·n_new < 2⁶³ (guard documented, not hit below ~3·10⁹
    rows per side)."""
    counts = _quantized_counts(old, new, cols, quantize_dp, "ks_test")
    return ks_from_counts(counts, cols)


def ks_from_counts(counts: DataFrame, cols: list[str]) -> DataFrame:
    """The KS back half over an already-built ``[column, q, co, cn]``
    quantized-count table — shared by :func:`ks_test` (inline counts)
    and the live monitor's readout (``streaming.ops.ks_state``, counts
    accumulated from a stream): one fixed expression tree from exact
    integers, so stream ≡ batch holds bit-identically."""
    w = (
        Window.partitionBy("column").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("column")
    cum = counts.select(
        "column",
        F.sum("co").over(w).alias("cum_o"),
        F.sum("cn").over(w).alias("cum_n"),
        F.sum("co").over(wall).alias("n_old"),
        F.sum("cn").over(wall).alias("n_new"),
    )
    err = F.raise_error(
        F.concat(
            F.lit("ks_test: column "), F.col("column"),
            F.lit(" has no non-null rows on one side"),
        )
    ).cast("long")
    # a column that is all-NULL on BOTH sides yields no count rows at
    # all, so the raise guard would never evaluate and the column
    # silently vanish — the literal column grid guarantees every
    # requested column a row (zero counts), which then raises
    grid = counts.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    out = (
        grid.join(
            F.broadcast(
                cum.groupBy("column").agg(
                    F.max("n_old").alias("n_old"),
                    F.max("n_new").alias("n_new"),
                    F.max(
                        F.abs(
                            F.col("cum_o") * F.col("n_new")
                            - F.col("cum_n") * F.col("n_old")
                        )
                    ).alias("d_num"),
                )
            ),
            "column", "left",
        )
        .select(
            "column",
            F.when(F.col("n_old") > 0, F.col("n_old")).otherwise(err)
            .alias("n_old"),
            F.when(F.col("n_new") > 0, F.col("n_new")).otherwise(err)
            .alias("n_new"),
            F.coalesce("d_num", F.lit(0)).alias("d_num"),
        )
    )
    d = F.col("d_num").cast("double") / (
        F.col("n_old").cast("double") * F.col("n_new").cast("double")
    )
    lam = d * F.sqrt(
        F.col("n_old").cast("double") * F.col("n_new")
        / (F.col("n_old") + F.col("n_new"))
    )
    return out.select(
        "column", "n_old", "n_new", "d_num",
        F.round(d, 6).alias("d_stat"),
        F.round(lam, 6).alias("lambda_stat"),
    )


def mann_whitney_u(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    quantize_dp: int = 6,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) per column —
    ``[column, n_old, n_new, u2x, u_stat, z_stat]`` — the
    NONPARAMETRIC sibling of :func:`welch_ttest` (no normality
    assumption; compares rank distributions, robust to outliers).

    Exactness: values quantize to longs; midranks over the grouped
    distinct-value table are exact HALF-integers, carried as the
    INTEGER ``2·rank`` stream, so the doubled statistic
    ``u2x = 2·R_old − n_old·(n_old+1)`` is an exact long and
    ``u_stat = u2x/2`` one exact division.  ``z_stat`` is the
    normal approximation with the standard tie correction
    ``σ² = (n·m/12)·((N+1) − Σ(t³−t)/(N·(N−1)))`` — the tie sum
    accumulates in decimal(38,0) (exact for per-value multiplicities
    up to 10¹²; a long t³ would overflow past t ≈ 2·10⁶), every
    double derives from exact integers by one fixed expression tree
    (hash-gate replayable), and an all-ties column (σ = 0) surfaces
    NULL z rather than dividing by zero.  No continuity correction
    (both engines would have to agree on its sign; document-level
    shifts at corpus scale dwarf 0.5 rank).

    Scale shape: identical to :func:`ks_test` — one stacked pass, one
    ``groupBy(column, value)`` with map-side combine, a column-keyed
    cumulative window over DISTINCT quantized values, one per-column
    aggregate.  NULLs excluded; an empty side raises."""
    counts = _quantized_counts(
        old, new, cols, quantize_dp, "mann_whitney_u"
    )
    return mwu_from_counts(counts, cols)


def mwu_from_counts(counts: DataFrame, cols: list[str]) -> DataFrame:
    """The Mann–Whitney back half over an already-built
    ``[column, q, co, cn]`` quantized-count table — shared by
    :func:`mann_whitney_u` (inline counts) and the live monitor's
    rank-sum readout (``streaming.ops.mwu_state`` over a ks_stream
    store): one fixed expression tree from exact integers, so
    stream ≡ batch holds bit-identically."""
    w = (
        Window.partitionBy("column").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("co") + F.col("cn")
    # midrank of a tie group in DOUBLED units: 2·cum_before + t + 1
    ranked = counts.select(
        "column", "co", "cn",
        (2 * (F.sum(t).over(w) - t) + t + F.lit(1)).alias("avg2"),
        t.alias("t"),
    )
    agg = ranked.groupBy("column").agg(
        F.sum("co").alias("n_old"),
        F.sum("cn").alias("n_new"),
        # decimal like the tie sum: r2x ~ 2·n_old·N overflows a LONG
        # (ANSI-throws) near ~1.5e9 rows per side — BELOW ks_test's
        # documented ~3e9 guard; the decimal accumulator keeps the
        # rank-sum test alive as long as its sibling
        F.sum(
            F.col("co").cast("decimal(19,0)")
            * F.col("avg2").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("r2x"),
        F.sum(
            F.col("t").cast("decimal(12,0)")
            * F.col("t").cast("decimal(12,0)")
            * F.col("t").cast("decimal(12,0)")
            - F.col("t").cast("decimal(12,0)")
        ).cast("decimal(38,0)").alias("tie"),
    )
    err = F.raise_error(
        F.concat(
            F.lit("mann_whitney_u: column "), F.col("column"),
            F.lit(" has no non-null rows on one side"),
        )
    ).cast("long")
    grid = counts.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    agg = grid.join(F.broadcast(agg), "column", "left").select(
        "column",
        F.when(F.col("n_old") > 0, F.col("n_old")).otherwise(err)
        .alias("n_old"),
        F.when(F.col("n_new") > 0, F.col("n_new")).otherwise(err)
        .alias("n_new"),
        "r2x", "tie",
    )
    no = F.col("n_old").cast("double")
    nn = F.col("n_new").cast("double")
    big_n = F.col("n_old") + F.col("n_new")
    u2x = F.col("r2x") - F.col("n_old") * (F.col("n_old") + 1)
    var = (
        no * nn / F.lit(12.0)
        * (
            (big_n + F.lit(1)).cast("double")
            - F.col("tie").cast("double")
            / (big_n.cast("double") * (big_n - F.lit(1)).cast("double"))
        )
    )
    z = F.when(
        var > 0,
        (u2x.cast("double") / F.lit(2.0) - no * nn / F.lit(2.0))
        / F.sqrt(var),
    )
    return agg.select(
        "column", "n_old", "n_new",
        u2x.alias("u2x"),
        (u2x.cast("double") / F.lit(2.0)).alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
    )


def welch_ttest(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    *,
    quantize_dp: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test for EVERY unordered
    pair of variants — the A/B-experiment readout —
    ``[variant_a, variant_b, n_a, n_b, mean_a, mean_b, t_stat, dof]``
    (variant_a < variant_b as strings; means 6 dp; t and the
    Welch–Satterthwaite dof 6 dp; |t| ≳ 1.96 ≈ the 5% two-sided
    line at large dof).

    Exactness: values quantize to longs; per-variant n/Σq/Σq² are
    EXACT integer aggregates (Σq² in decimal(38,0) — a long would
    ANSI-throw past ~10⁶ rows of 6-dp values); every downstream double
    (mean, sample variance via the closed form (Σq² − (Σq)²/n)/(n−1),
    t, dof) derives from those integers by one fixed expression tree,
    so results are bit-identical cross-engine (hash-gate replayable)
    and layout-independent.  A variant with n < 2 has undefined
    variance: its pairs surface NULL t/dof rather than raising (both
    engines agree on the NULL).

    Scale shape: ONE aggregation over the corpus (variants-sized
    output, map-side combined), then a variants² broadcast self-join —
    variants are few by construction (an experiment has arms, not
    millions); NULL variants are excluded."""
    scale = float(10 ** quantize_dp)
    q = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    g = (
        df.where(F.col(variant_col).isNotNull()
                 & F.col(value_col).isNotNull())
        .select(F.col(variant_col).cast("string").alias("variant"),
                q.alias("q"))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("q").cast("decimal(20,0)")).alias("s"),
            F.sum(
                (F.col("q").cast("decimal(38,0)")
                 * F.col("q").cast("decimal(38,0)"))
            ).alias("ss"),
        )
    )
    return _welch_from_moments(g, scale)


def proportion_ztest(
    df: DataFrame,
    variant_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test for every unordered pair of variants —
    the CONVERSION-RATE A/B readout —
    ``[variant_a, variant_b, n_a, n_b, x_a, x_b, rate_a, rate_b,
    z_stat]`` with the pooled-variance statistic
    ``z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))``,
    ``p̂ = (x_a + x_b)/(n_a + n_b)``.

    ``success_col`` is boolean or 0/1 numeric; NULL successes and NULL
    variants are excluded.  Every input to z is an exact integer
    (per-arm trial and success counts), so the statistic is
    bit-deterministic cross-engine (hash-gate exact, q_setops'
    ``prop`` branch); a degenerate pooled rate (p̂ ∈ {0, 1} — nobody
    or everybody converted) has zero pooled variance and surfaces
    NULL z (the welch_ttest zero-variance discipline).  Rates are
    6 dp.

    Scale shape: ONE aggregation over the corpus (arms-sized output,
    map-side combined) + an arms² broadcast self-join — identical to
    :func:`welch_ttest`."""
    # enforce the docstring's 'boolean or 0/1 numeric' contract: a
    # numeric column holding 2 or -1 would otherwise silently inflate
    # or deflate the success counts and every downstream rate and z.
    # Validate the RAW value, not the post-cast one: cast('int')
    # truncates, so a DOUBLE 0.5 or 1.9 would otherwise slip through
    # as 0/1 — the round-trip equality (si cast back to the source
    # type == original) catches fractional inputs too.
    src_type = df.schema[success_col].dataType
    si = F.col(success_col).cast("int")
    ok = si.isin(0, 1) & (si.cast(src_type) == F.col(success_col))
    checked = F.when(ok, si).otherwise(
        F.raise_error(
            F.concat(
                F.lit("proportion_ztest: success column "),
                F.lit(success_col),
                F.lit(" must be boolean or 0/1; got "),
                si.cast("string"),
            )
        ).cast("int")
    )
    g = (
        df.where(F.col(variant_col).isNotNull()
                 & F.col(success_col).isNotNull())
        .select(
            F.col(variant_col).cast("string").alias("variant"),
            checked.alias("__s"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__s").cast("long").alias("x"),
        )
    )
    a = g.select(
        F.col("variant").alias("variant_a"), F.col("n").alias("na"),
        F.col("x").alias("xa"),
    )
    b = g.select(
        F.col("variant").alias("variant_b"), F.col("n").alias("nb"),
        F.col("x").alias("xb"),
    )
    pairs = a.join(F.broadcast(b), F.col("variant_a") < F.col("variant_b"))
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    pa = F.col("xa").cast("double") / na
    pb = F.col("xb").cast("double") / nb
    pool = (F.col("xa") + F.col("xb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    z = F.when(var > 0, (pa - pb) / F.sqrt(var))
    return pairs.select(
        "variant_a", "variant_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("xa").cast("long").alias("x_a"),
        F.col("xb").cast("long").alias("x_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


def _welch_from_moments(g: DataFrame, scale: float) -> DataFrame:
    """Welch statistics for every unordered arm pair from a
    ``[variant, n, s, ss]`` exact-integer moment frame — shared by
    :func:`welch_ttest` and the streaming store reader
    ``streaming.ops.abtest_state`` (whose accumulators are the same
    integers, which is what makes the live readout bit-identical to
    the batch operator)."""
    a = g.select(
        F.col("variant").alias("variant_a"), F.col("n").alias("na"),
        F.col("s").alias("sa"), F.col("ss").alias("ssa"),
    )
    b = g.select(
        F.col("variant").alias("variant_b"), F.col("n").alias("nb"),
        F.col("s").alias("sb"), F.col("ss").alias("ssb"),
    )
    pairs = a.join(F.broadcast(b), F.col("variant_a") < F.col("variant_b"))

    def stats(nc, sc, ssc):
        n = F.col(nc).cast("double")
        s = F.col(sc).cast("double")
        ss = F.col(ssc).cast("double")
        mean = s / n / F.lit(scale)
        var = F.when(
            F.col(nc) >= 2,
            (ss - s * s / n) / (n - F.lit(1.0)) / F.lit(scale * scale),
        )
        return mean, var

    mean_a, var_a = stats("na", "sa", "ssa")
    mean_b, var_b = stats("nb", "sb", "ssb")
    se2a = var_a / F.col("na").cast("double")
    se2b = var_b / F.col("nb").cast("double")
    # zero POOLED variance (two constant arms) leaves t undefined:
    # guard explicitly — under the engine's ANSI session the bare
    # division would throw DIVIDE_BY_ZERO and abort the query, while
    # DuckDB yields NULL (the q_udtf degenerate-group rule: emit None
    # where the oracle divides by zero)
    defined = (se2a + se2b) > 0
    t = F.when(defined, (mean_a - mean_b) / F.sqrt(se2a + se2b))
    dof = F.when(
        defined,
        (se2a + se2b) * (se2a + se2b)
        / (
            se2a * se2a / (F.col("na").cast("double") - F.lit(1.0))
            + se2b * se2b / (F.col("nb").cast("double") - F.lit(1.0))
        ),
    )
    return pairs.select(
        "variant_a", "variant_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def chi2_test(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    *,
    null_label: str = "(null)",
    units: int = 10 ** 8,
    frozen_categories: dict[str, list[str]] | None = None,
    other_label: str = "(other)",
) -> DataFrame:
    """Two-sample chi-squared homogeneity test for CATEGORICAL columns
    — the significance twin of ``diff.category_drift``'s PSI effect
    size, over the same ``_cat_stack`` front half —
    ``[column, n_old, n_new, k, dof, chi2_units, chi2]`` with
    ``chi2 = chi2_units / units``.

    Exact-integer determinism (Pearson 1900, 2×k contingency form):
    with per-category counts ``(a_i, b_i)``, side totals ``(A, B)``
    and row totals ``r_i = a_i + b_i``, the statistic reduces to
    ``χ² = Σ_i D_i² / (r_i·A·B)`` where ``D_i = a_i·B − b_i·A`` is an
    EXACT integer.  A sum of per-category DOUBLES would be partition-
    order dependent (the engine's hash-gate discipline forbids it),
    so the statistic is DEFINED as two-stage integer floor division —
    ``chi2_units = Σ_i ((D_i² div r_i) · units) div (A·B)`` — which
    both engines replay bit-identically (all operands non-negative, so
    truncation ≡ floor in Spark's ``div`` and DuckDB's ``//`` alike).
    The quantization under-reads the real-valued χ² by at most
    ``k·(1/(A·B)·units + 1)/units`` — with the default 1e8 units,
    < 1e-4 even at 10⁴ categories — and is part of the contract, not
    an implementation detail.

    Scale shape: identical to ``category_drift`` — both sides stack
    map-side to (side, column, category), ONE ``groupBy(column,
    category)`` with map-side combine, keyed window totals, one
    per-column aggregate; zero driver jobs at construction.  Scale
    bounds (ANSI-loud, never silent): ``D_i² div r_i`` is an
    IntegralDivide returning BIGINT, and its value is ≈ χ²ᵢ·A·B, so
    the bound is DRIFT-DEPENDENT: it ANSI-overflows 2⁶³ once
    ``A·B·χ²ᵢ > 9.2e18`` — under strong drift (χ² ~ n) that is
    roughly 10⁶–10⁷ rows per side, while under the null (χ² ~ k)
    sides into the 10⁹ range fit.  Loud, never wrong — a statistic
    large enough to overflow is a significance verdict in itself, but
    callers needing the numeric value at that scale should pre-sample.
    For unbounded vocabularies pass ``frozen_categories`` ({column:
    [categories keeping identity]}, everything else folding map-side
    into ``other_label`` BEFORE the aggregation — the
    ``category_drift`` frozen path; derive the selection with
    ``diff.heavy_hitter_categories``): the count table and dof are
    then bounded by the selection, and the test answers "is the mix
    over the monitored bins different?" exactly like the streaming
    ``category_drift_chi2`` readout.  NULL is a
    first-class ``null_label`` category (a null share moving IS a
    distribution change); a side with no rows raises; a single
    observed category has dof 0 and raises (no test exists).

    The reference has no statistics surface; this is the standard
    published two-sample chi-squared procedure."""
    from cosmap_spark.operators.diff import (
        _cat_stack,
        _check_frozen,
        _frozen_fold,
    )

    if not cols:
        raise ValueError("chi2_test: no columns given")
    if units < 1:
        raise ValueError(f"chi2_test: units must be >= 1; got {units}")
    # other_label only matters under a freeze, but the guard is
    # unconditional like category_drift's: a colliding pair is a caller
    # bug regardless of which path runs (round-10 advice fix)
    if other_label == null_label:
        raise ValueError("chi2_test: other_label and null_label must differ")
    if frozen_categories is not None:
        frozen_categories = _check_frozen(
            cols, frozen_categories, other_label, "chi2_test",
            null_label=null_label,
        )
    for df, side in ((old, "old"), (new, "new")):
        for c in cols:
            base = df.schema[c].dataType.simpleString().split("(")[0]
            if base.startswith(("array", "map", "struct")):
                raise ValueError(
                    f"chi2_test: column {c!r} on the {side} side is "
                    f"{base} — categories must be scalar"
                )

    def stacked(df: DataFrame, side: str) -> DataFrame:
        out = _cat_stack(df, cols, null_label)
        if frozen_categories is not None:
            # fold BEFORE the aggregation (the category_drift frozen
            # path): the grouping key is the folded category, so the
            # count table is bounded by the selection
            out = out.select(
                "column",
                _frozen_fold(cols, frozen_categories, other_label)
                .alias("category"),
            )
        return out.select(
            F.lit(side).alias("side"), "column", "category"
        )

    counts = (
        stacked(old, "o").unionByName(stacked(new, "n"))
        .groupBy("column", "category")
        .agg(
            F.sum(F.when(F.col("side") == "o", 1).otherwise(0))
            .cast("long").alias("n_o"),
            F.sum(F.when(F.col("side") == "n", 1).otherwise(0))
            .cast("long").alias("n_n"),
        )
    )
    return chi2_from_counts(counts, units=units, cols=cols)


def chi2_from_counts(counts: DataFrame, *, units: int = 10 ** 8,
                     cols: list[str] | None = None) -> DataFrame:
    """The chi-squared back half over an already-built
    ``[column, category, n_o, n_n]`` count table — shared by
    :func:`chi2_test` (inline counts) and the categorical monitor's
    significance readout (``streaming.ops.category_drift_chi2``,
    counts accumulated from a stream against a frozen reference):
    one fixed integer expression tree, so stream ≡ batch holds
    bit-identically over the same (folded) category bins."""
    w = Window.partitionBy("column")
    # NOT a/A: Spark resolves column names case-insensitively (the
    # rm3 __s/__S lesson), so per-cell and side-total names must differ
    # in more than case
    dec = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    terms = counts.select(
        "column", "n_o", "n_n",
        F.sum("n_o").over(w).alias("tot_o"),
        F.sum("n_n").over(w).alias("tot_n"),
        (dec(F.col("n_o")) * dec(F.sum("n_n").over(w))
         - dec(F.col("n_n")) * dec(F.sum("n_o").over(w))).alias("d"),
    ).selectExpr(
        "column", "n_o", "n_n", "tot_o", "tot_n",
        # stage 1 of the defined two-stage floor division: D² div r
        "(d * d) div (n_o + n_n) AS q1",
    ).selectExpr(
        "column", "tot_o", "tot_n",
        # stage 2: scale to units, divide by the side-total product;
        # an empty side makes the product 0 — divide by 1 there so
        # ANSI doesn't throw before the loud no-distribution raise
        # below (the value is discarded on that path)
        f"(CAST(q1 AS DECIMAL(38,0)) * {int(units)}) "
        "div (CASE WHEN tot_o > 0 AND tot_n > 0 THEN "
        "CAST(tot_o AS DECIMAL(19,0)) * CAST(tot_n AS DECIMAL(19,0)) "
        "ELSE CAST(1 AS DECIMAL(38,0)) END) AS t_units",
    )
    agg = terms.groupBy("column").agg(
        F.max("tot_o").alias("n_old"),
        F.max("tot_n").alias("n_new"),
        F.count(F.lit(1)).alias("k"),
        F.sum("t_units").cast("long").alias("chi2_units"),
    )
    if cols:
        # a column with NO rows on either side yields no count rows
        # at all, so the raise guard below would never evaluate and
        # the column silently vanish — the literal grid guarantees
        # every requested column a row (the ks_test all-NULL-grid
        # rule); count-table callers that cannot name columns get the
        # observed set
        grid = counts.sparkSession.createDataFrame(
            [(c,) for c in cols], "column string"
        )
        agg = grid.join(F.broadcast(agg), "column", "left")
    err = F.raise_error(
        F.concat(
            F.lit("chi2_test: column "), F.col("column"),
            F.lit(" has no rows on one side or a single category — "
                  "no distribution to compare"),
        )
    )
    ok = (F.col("n_old") > 0) & (F.col("n_new") > 0) & (F.col("k") >= 2)
    return agg.select(
        "column",
        F.when(ok, F.col("n_old")).otherwise(err.cast("long"))
        .alias("n_old"),
        "n_new", "k",
        (F.col("k") - 1).cast("long").alias("dof"),
        "chi2_units",
        (F.col("chi2_units").cast("double") / F.lit(float(units)))
        .alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Decision surface: asymptotic p-values + verdicts (round-8 verdict #3).
# All pure column arithmetic from PUBLISHED approximations — JVM-side,
# whole-stage-codegen'd, no Python anywhere.  p-values are intentionally
# NOT part of any hash-gate payload (the gates check the exact-integer
# statistics; these doubles are the human-facing layer on top).
# ---------------------------------------------------------------------------

_INV_SQRT_2PI = 0.3989422804014327


def _std_normal_sf(z):
    """One-sided standard normal survival P(Z > z) for z >= 0 —
    Abramowitz & Stegun 26.2.17 polynomial (|error| < 7.5e-8)."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z)
    poly = t * (
        F.lit(0.319381530) + t * (
            F.lit(-0.356563782) + t * (
                F.lit(1.781477937) + t * (
                    F.lit(-1.821255978) + t * F.lit(1.330274429)
                )
            )
        )
    )
    return F.lit(_INV_SQRT_2PI) * F.exp(-z * z / F.lit(2.0)) * poly


def _p_two_sided_z(z):
    """Two-sided normal p-value 2·P(Z > |z|), clamped to [0, 1];
    NULL z (a degenerate statistic) stays NULL."""
    return F.when(
        z.isNotNull(),
        F.least(F.lit(1.0), F.lit(2.0) * _std_normal_sf(F.abs(z))),
    )


def _ks_sf(lam, terms: int = 8):
    """Kolmogorov asymptotic Q(λ) = 2·Σ_{j≥1} (−1)^{j−1}·e^{−2j²λ²}
    (Kolmogorov 1933; the limiting null distribution of λ =
    d·√(nm/(n+m))).  ``terms`` fixed at 8: the series is alternating
    with e^{−2j²λ²} terms, so the truncation error is below the first
    dropped term — < 2e-6 for λ ≥ 0.3 (< 1e-10 for λ ≥ 0.4).  Below
    0.3 the 8-term tail does NOT converge (at λ ≈ 0.1 it undershoots
    Q ≈ 1 by up to ~0.4 with no clamp engaging), so that regime is
    short-circuited to p = 1.0 exactly — true Q(0.3) = 1.0000 to
    ~1e-4 and Q → 1 monotonically as λ → 0, so the short-circuit's
    own error is < 1e-4 and decision-safe (deep not-significant)."""
    acc = None
    for j in range(1, terms + 1):
        term = F.lit(2.0 * (1 if j % 2 == 1 else -1)) * F.exp(
            F.lit(-2.0 * j * j) * lam * lam
        )
        acc = term if acc is None else acc + term
    series = F.greatest(F.lit(0.0), F.least(F.lit(1.0), acc))
    return F.when(lam < 0.3, F.lit(1.0)).otherwise(series)


def _chi2_sf(x, dof):
    """Upper-tail chi-squared probability via the Wilson–Hilferty
    (1931) cube-root normal transform: (χ²/ν)^⅓ is ≈ normal with mean
    1 − 2/(9ν) and variance 2/(9ν).  Relative error a few 1e-3 over
    the decision-relevant range — a VERDICT approximation, not a
    numerics library."""
    nu = dof.cast("double")
    m = F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * nu)
    s = F.sqrt(F.lit(2.0) / (F.lit(9.0) * nu))
    z = (F.pow(x / nu, F.lit(1.0 / 3.0)) - m) / s
    return F.when(z >= 0, _std_normal_sf(z)).otherwise(
        F.lit(1.0) - _std_normal_sf(-z)
    )


def _t_p_two_sided(t, dof):
    """Two-sided Student-t p-value via the normal-deviate
    approximation z = t·(1 − 1/(4ν)) / √(1 + t²/(2ν))
    (Abramowitz & Stegun 26.7.8) — |error| a few 1e-3 for ν ≥ 5,
    the Welch regime the A/B monitor lives in."""
    nu = dof.cast("double")
    z = t * (F.lit(1.0) - F.lit(1.0) / (F.lit(4.0) * nu)) / F.sqrt(
        F.lit(1.0) + t * t / (F.lit(2.0) * nu)
    )
    return _p_two_sided_z(z)


def decide(df: DataFrame, test: str, *, alpha: float = 0.05) -> DataFrame:
    """Append the decision surface to a test-statistic frame —
    ``p_value`` (two-sided asymptotic) and ``significant``
    (p < alpha) — mirroring ``streaming.ops.drift_alarms``'s
    ``alarmed`` shape.  ``test`` names which operator produced ``df``:

    - ``"ks"`` (:func:`ks_test`): Kolmogorov Q(λ) of ``lambda_stat``;
    - ``"mwu"`` (:func:`mann_whitney_u`) / ``"prop"``
      (:func:`proportion_ztest`): normal two-sided p of ``z_stat``;
    - ``"welch"`` (:func:`welch_ttest`): t two-sided p of ``t_stat``
      at ``dof`` (A&S 26.7.8 normal-deviate approximation);
    - ``"chi2"`` (:func:`chi2_test`): Wilson–Hilferty upper tail of
      ``chi2`` at ``dof``.

    A NULL statistic (degenerate variance) yields NULL p_value and
    NULL significant — "cannot decide", never a silent pass/fail.
    p-values are asymptotic approximations (accuracy noted per
    helper), kept OUT of every hash-gate payload by design; pytest
    pins them against pure-python references instead."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"decide: alpha must be in (0, 1); got {alpha}")
    if test == "ks":
        p = _ks_sf(F.col("lambda_stat"))
    elif test in ("mwu", "prop"):
        p = _p_two_sided_z(F.col("z_stat"))
    elif test == "welch":
        p = _t_p_two_sided(F.col("t_stat"), F.col("dof"))
    elif test == "chi2":
        p = _chi2_sf(F.col("chi2"), F.col("dof"))
    else:
        raise ValueError(
            f"decide: unknown test {test!r} — one of ks/mwu/prop/"
            "welch/chi2"
        )
    return df.select(
        "*",
        F.round(p, 6).alias("p_value"),
        (F.round(p, 6) < F.lit(float(alpha))).alias("significant"),
    )

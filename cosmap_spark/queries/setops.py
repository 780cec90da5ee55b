"""Set-operation + membership-subquery queries (SURVEY.md §2.2 "Set ops"
/ "Subqueries") — absent in the reference; stock Spark with ANSI bag/set
semantics.

Consolidated (round 2) into ONE tagged-union ledger query: every branch
produces ``(op, k, side)`` rows, so the driver's multiset hash verifies
each operator's exact output while consuming a single slot of the
bounded correctness window.  The branches stay independent plans —
Spark unions are bag concatenation, no cross-branch shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table

_SETOPS_ORACLE = """
    WITH snap_old AS (
      SELECT c_custkey AS k, c_name AS name, c_nationkey AS nk,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    ),
    snap_new AS (
      SELECT k, name,
             CASE WHEN k % 10 = 5 THEN CAST((nk + 1) % 25 AS INT) ELSE nk END AS nk,
             CASE WHEN k % 10 = 5 THEN bal_c + 10000 ELSE bal_c END AS bal_c
      FROM snap_old WHERE k % 10 <> 3
      UNION ALL
      SELECT k + 1000000, 'NEW#' || CAST(k AS VARCHAR), nk, bal_c + 1
      FROM snap_old WHERE k % 10 = 7
    ),
    merge_changes AS (
      SELECT k, name, nk, bal_c + 5000 AS bal_c, 1 AS seq, FALSE AS deleted
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, name, CAST((nk + 1) % 25 AS INT), bal_c + 10000, 2, FALSE
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, NULL, NULL, NULL, 1, TRUE FROM snap_old WHERE k % 10 = 3
      UNION ALL
      SELECT k + 1000000, 'NEW#' || CAST(k AS VARCHAR), nk, bal_c + 1, 1, FALSE
      FROM snap_old WHERE k % 10 = 7
    ),
    merge_latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM merge_changes) WHERE rn = 1
    ),
    merged AS (
      SELECT o.k, o.name, o.nk, o.bal_c FROM snap_old o
      WHERE o.k NOT IN (SELECT k FROM merge_changes)
      UNION ALL
      SELECT k, name, nk, bal_c FROM merge_latest WHERE NOT deleted
    ),
    cdc_batch AS (
      SELECT n.k, n.name, n.nk, n.bal_c, FALSE AS deleted
      FROM snap_new n LEFT JOIN snap_old o USING (k)
      WHERE o.k IS NULL
         OR o.name IS DISTINCT FROM n.name
         OR o.nk IS DISTINCT FROM n.nk
         OR o.bal_c IS DISTINCT FROM n.bal_c
      UNION ALL
      SELECT o.k, NULL, NULL, NULL, TRUE
      FROM snap_old o LEFT JOIN snap_new n USING (k) WHERE n.k IS NULL
    ),
    -- PSI drift between the two snapshots over bal_c: exact decile
    -- boundaries from the OLD side; values equal to an edge land in
    -- the LOWER bin (strictly-less filter); shares clamp at 1e-6 and
    -- the psi term surfaces as exact integer micro-units
    drift_bnds AS (
      SELECT quantile_cont(bal_c, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS bnds
      FROM snap_old
    ),
    drift_old AS (
      SELECT len(list_filter(b.bnds, e -> e < s.bal_c)) AS bin,
             count(*) AS n
      FROM snap_old s CROSS JOIN drift_bnds b GROUP BY 1
    ),
    drift_new AS (
      SELECT len(list_filter(b.bnds, e -> e < s.bal_c)) AS bin,
             count(*) AS n
      FROM snap_new s CROSS JOIN drift_bnds b GROUP BY 1
    ),
    drift AS (
      SELECT g.bin,
             coalesce(o.n, 0) AS n_old, coalesce(nn.n, 0) AS n_new,
             (SELECT count(*) FROM snap_old) AS ta,
             (SELECT count(*) FROM snap_new) AS tb
      FROM (SELECT unnest(range(10)) AS bin) g
      LEFT JOIN drift_old o USING (bin)
      LEFT JOIN drift_new nn USING (bin)
    ),
    -- categorical PSI drift: categories derived from c_mktsegment x
    -- (k % 7) with k%10==3 rows NULL-categorized on the old side,
    -- k%10==5 rows shifted and a new-only 'brandnew' category on the
    -- new side; selection = top-20 old-present categories by
    -- (count DESC, category ASC), the rest fold into '(other)'
    catd_old AS (
      SELECT CASE WHEN c_custkey % 10 = 3 THEN NULL
                  ELSE c_mktsegment || '#' || CAST(c_custkey % 7 AS VARCHAR)
             END AS cat
      FROM customer
    ),
    catd_new AS (
      SELECT CASE WHEN c_custkey % 10 = 5
                  THEN c_mktsegment || '#' || CAST((c_custkey + 1) % 7 AS VARCHAR)
                  ELSE c_mktsegment || '#' || CAST(c_custkey % 7 AS VARCHAR)
             END AS cat
      FROM customer WHERE c_custkey % 10 <> 3
      UNION ALL
      SELECT 'brandnew' FROM customer WHERE c_custkey % 10 = 7
    ),
    catd_counts AS (
      SELECT coalesce(cat, '(null)') AS category,
             sum(CASE WHEN side = 'o' THEN 1 ELSE 0 END) AS n_old,
             sum(CASE WHEN side = 'n' THEN 1 ELSE 0 END) AS n_new
      FROM (SELECT 'o' AS side, cat FROM catd_old
            UNION ALL SELECT 'n' AS side, cat FROM catd_new)
      GROUP BY 1
    ),
    catd_sel AS (
      SELECT category,
             row_number() OVER (ORDER BY n_old DESC, category ASC) AS rn
      FROM catd_counts WHERE n_old > 0
    ),
    catd AS (
      SELECT CASE WHEN s.rn <= 20 THEN c.category
                  ELSE '(other)' END AS category,
             sum(c.n_old) AS n_old, sum(c.n_new) AS n_new
      FROM catd_counts c LEFT JOIN catd_sel s USING (category)
      GROUP BY 1
    ),
    catd_tot AS (
      SELECT category, n_old, n_new,
             (SELECT sum(n_old) FROM catd) AS ta,
             (SELECT sum(n_new) FROM catd) AS tb
      FROM catd
    ),
    -- chi-squared homogeneity over the UNFOLDED category counts
    -- (stats_tests.chi2_test): the statistic is DEFINED as two-stage
    -- integer floor division — D^2 // r, scale by units, // (ta*tb) —
    -- all operands non-negative, so Spark's div and // agree exactly
    chi_d AS (
      SELECT n_old AS ca, n_new AS cb,
             (SELECT sum(n_old) FROM catd_counts) AS ta,
             (SELECT sum(n_new) FROM catd_counts) AS tb
      FROM catd_counts
    ),
    chi AS (
      SELECT max(ta) AS n_old, max(tb) AS n_new, count(*) AS k,
             sum((((CAST(ca AS HUGEINT) * tb - CAST(cb AS HUGEINT) * ta)
                   * (CAST(ca AS HUGEINT) * tb - CAST(cb AS HUGEINT) * ta))
                  // (ca + cb)) * 100000000
                 // (CAST(ta AS HUGEINT) * tb)) AS chi2u
      FROM chi_d
    ),
    -- two-sample KS between the same snapshots over bal_c: the sup is
    -- taken on the EXACT integer numerator |cum_o*m - cum_n*n|, so no
    -- float enters the argmax (stats_tests.ks_test, quantize_dp=0 —
    -- bal_c is already integer cents)
    ksc AS (
      SELECT q, sum(CASE WHEN side = 'o' THEN 1 ELSE 0 END) AS co,
             sum(CASE WHEN side = 'n' THEN 1 ELSE 0 END) AS cn
      FROM (SELECT 'o' AS side, bal_c AS q FROM snap_old
            UNION ALL SELECT 'n' AS side, bal_c FROM snap_new)
      GROUP BY 1
    ),
    kscum AS (
      SELECT sum(co) OVER w AS cum_o, sum(cn) OVER w AS cum_n,
             sum(co) OVER () AS n_old, sum(cn) OVER () AS n_new
      FROM ksc
      WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    ks AS (
      SELECT max(n_old) AS n_old, max(n_new) AS n_new,
             max(abs(cum_o * n_new - cum_n * n_old)) AS d_num
      FROM kscum
    ),
    -- Mann-Whitney U over the same grouped counts as KS: midranks in
    -- DOUBLED integer units (exact half-integers), doubled-U exact,
    -- z with the standard tie correction (tie sum in HUGEINT)
    mwr AS (
      SELECT co, cn,
             2 * (sum(co + cn) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) - (co + cn))
               + (co + cn) + 1 AS avg2,
             co + cn AS t
      FROM ksc
    ),
    mwa AS (
      SELECT sum(co) AS n_old, sum(cn) AS n_new,
             sum(co * avg2) AS r2x,
             sum(CAST(t AS HUGEINT) * t * t - t) AS tie
      FROM mwr
    ),
    mw AS (
      SELECT n_old, n_new,
             r2x - n_old * (n_old + 1) AS u2x,
             CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE) / 12.0
               * (CAST(n_old + n_new + 1 AS DOUBLE)
                  - CAST(tie AS DOUBLE)
                    / (CAST(n_old + n_new AS DOUBLE)
                       * CAST(n_old + n_new - 1 AS DOUBLE))) AS var
      FROM mwa
    ),
    -- Welch's t for every unordered pair of three derived order arms:
    -- exact integer n/sum/sum-of-squares per arm, one fixed double
    -- expression tree downstream (stats_tests.welch_ttest)
    wel AS (
      SELECT CASE o_orderkey % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b'
             ELSE 'c' END AS variant,
             CAST(round(o_totalprice * 100) AS BIGINT) AS q
      FROM orders
    ),
    welg AS (
      SELECT variant, count(*) AS n, sum(q) AS s, sum(q * q) AS ss
      FROM wel GROUP BY 1
    ),
    welp AS (
      SELECT a.variant AS va, b.variant AS vb, a.n AS na, b.n AS nb,
             CAST(a.s AS DOUBLE) AS sa, CAST(a.ss AS DOUBLE) AS ssa,
             CAST(b.s AS DOUBLE) AS sb, CAST(b.ss AS DOUBLE) AS ssb
      FROM welg a JOIN welg b ON a.variant < b.variant
    ),
    welstat AS (
      SELECT va, vb, na, nb,
             sa / na / 100.0 AS ma, sb / nb / 100.0 AS mb,
             ((ssa - sa * sa / na) / (na - 1.0) / 10000.0) / na AS s2a,
             ((ssb - sb * sb / nb) / (nb - 1.0) / 10000.0) / nb AS s2b
      FROM welp
    ),
    welch AS (
      SELECT va, vb, na, nb,
             round(ma, 6) AS ma, round(mb, 6) AS mb,
             round((ma - mb) / sqrt(s2a + s2b), 6) AS t,
             round((s2a + s2b) * (s2a + s2b)
                   / (s2a * s2a / (na - 1.0) + s2b * s2b / (nb - 1.0)),
                   6) AS dof
      FROM welstat
    ),
    -- two-proportion z for the same three arms, success = fulfilled
    -- order: exact integer trial/success counts, pooled variance;
    -- degenerate pooled rates surface a canonical 'null' field
    prg AS (
      SELECT CASE o_orderkey % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b'
             ELSE 'c' END AS variant,
             count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x
      FROM orders GROUP BY 1
    ),
    prp AS (
      SELECT a.variant AS va, b.variant AS vb,
             a.n AS na, b.n AS nb, a.x AS xa, b.x AS xb,
             CAST(a.x AS DOUBLE) / CAST(a.n AS DOUBLE) AS pa,
             CAST(b.x AS DOUBLE) / CAST(b.n AS DOUBLE) AS pb,
             CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pool
      FROM prg a JOIN prg b ON a.variant < b.variant
    ),
    prop AS (
      SELECT va, vb, na, nb, xa, xb,
             round(pa, 6) AS ra, round(pb, 6) AS rb,
             CASE WHEN pool * (1.0 - pool)
                       * (1.0 / CAST(na AS DOUBLE)
                          + 1.0 / CAST(nb AS DOUBLE)) > 0
                  THEN round((pa - pb)
                       / sqrt(pool * (1.0 - pool)
                              * (1.0 / CAST(na AS DOUBLE)
                                 + 1.0 / CAST(nb AS DOUBLE))), 6)
             END AS z
      FROM prp
    ),
    -- triangle counting (Suri & Vassilvitskii 2011 degree-ordered
    -- wedges) over a derived orders graph: u = o_custkey % 200,
    -- v = o_orderkey % 200, ~2/7 edge sample, self-loops dropped
    tedges AS (
      SELECT DISTINCT least(o_custkey % 200, o_orderkey % 200) AS u,
             greatest(o_custkey % 200, o_orderkey % 200) AS v
      FROM orders
      WHERE o_orderkey % 7 < 2 AND o_custkey % 200 <> o_orderkey % 200
    ),
    tdeg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT u AS node FROM tedges UNION ALL SELECT v FROM tedges)
      GROUP BY 1
    ),
    tor AS (
      SELECT CASE WHEN du.degree < dv.degree
                    OR (du.degree = dv.degree AND e.u < e.v)
                  THEN e.u ELSE e.v END AS s,
             CASE WHEN du.degree < dv.degree
                    OR (du.degree = dv.degree AND e.u < e.v)
                  THEN e.v ELSE e.u END AS t,
             CASE WHEN du.degree < dv.degree
                    OR (du.degree = dv.degree AND e.u < e.v)
                  THEN dv.degree ELSE du.degree END AS dt
      FROM tedges e
      JOIN tdeg du ON du.node = e.u JOIN tdeg dv ON dv.node = e.v
    ),
    ttri AS (
      SELECT w.s, w.x, w.y FROM (
        SELECT a.s, a.t AS x, b.t AS y, a.dt AS dx, b.dt AS dy
        FROM tor a JOIN tor b ON a.s = b.s
        WHERE a.dt < b.dt OR (a.dt = b.dt AND a.t < b.t)) w
      JOIN tedges e
        ON least(w.x, w.y) = e.u AND greatest(w.x, w.y) = e.v
    ),
    tcount AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT s AS node FROM ttri
        UNION ALL SELECT x FROM ttri
        UNION ALL SELECT y FROM ttri)
      GROUP BY 1
    ),
    tri AS (
      SELECT d.node, d.degree, coalesce(c.n_tri, 0) AS n_tri,
             CASE WHEN d.degree >= 2
                  THEN CAST(round(round(2.0 * coalesce(c.n_tri, 0)
                       / (d.degree * (d.degree - 1)), 6)
                       * 1000000) AS BIGINT)
                  ELSE 0 END AS coeff_micro
      FROM tdeg d LEFT JOIN tcount c USING (node)
    ),
    -- quantized PageRank (graph.pagerank_quantized) over the DIRECTED
    -- distinct edges of the same orders-derived graph: the iteration
    -- is DEFINED over exact integers (per-edge r // out_deg, damping
    -- 85/100 via floor division, dangling mass // N), so unrolling
    -- the fixed 5 iterations here replays Spark's trajectory
    -- bit-identically
    predges AS (
      SELECT DISTINCT o_custkey % 200 AS s, o_orderkey % 200 AS d
      FROM orders
      WHERE o_orderkey % 7 < 2 AND o_custkey % 200 <> o_orderkey % 200
    ),
    prnodes AS (
      SELECT DISTINCT node FROM (
        SELECT s AS node FROM predges UNION ALL SELECT d FROM predges)
    ),
    prdeg AS (SELECT s AS node, count(*) AS odeg FROM predges GROUP BY 1),
    prn AS (SELECT count(*) AS nn FROM prnodes),
    pr0 AS (
      SELECT node, 1000000000000 // nn AS r FROM prnodes CROSS JOIN prn
    ),
    pr1 AS (
      SELECT g.node,
             (1000000000000 * 15) // (100 * prn.nn)
             + (85 * (coalesce(c.su, 0) + dg.dang // prn.nn)) // 100 AS r
      FROM prnodes g CROSS JOIN prn
      LEFT JOIN (SELECT e.d AS node, sum(p.r // x.odeg) AS su
                 FROM pr0 p JOIN predges e ON e.s = p.node
                 JOIN prdeg x ON x.node = p.node GROUP BY 1) c
        ON c.node = g.node
      CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM pr0
                  WHERE node NOT IN (SELECT node FROM prdeg)) dg
    ),
    pr2 AS (
      SELECT g.node,
             (1000000000000 * 15) // (100 * prn.nn)
             + (85 * (coalesce(c.su, 0) + dg.dang // prn.nn)) // 100 AS r
      FROM prnodes g CROSS JOIN prn
      LEFT JOIN (SELECT e.d AS node, sum(p.r // x.odeg) AS su
                 FROM pr1 p JOIN predges e ON e.s = p.node
                 JOIN prdeg x ON x.node = p.node GROUP BY 1) c
        ON c.node = g.node
      CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM pr1
                  WHERE node NOT IN (SELECT node FROM prdeg)) dg
    ),
    pr3 AS (
      SELECT g.node,
             (1000000000000 * 15) // (100 * prn.nn)
             + (85 * (coalesce(c.su, 0) + dg.dang // prn.nn)) // 100 AS r
      FROM prnodes g CROSS JOIN prn
      LEFT JOIN (SELECT e.d AS node, sum(p.r // x.odeg) AS su
                 FROM pr2 p JOIN predges e ON e.s = p.node
                 JOIN prdeg x ON x.node = p.node GROUP BY 1) c
        ON c.node = g.node
      CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM pr2
                  WHERE node NOT IN (SELECT node FROM prdeg)) dg
    ),
    pr4 AS (
      SELECT g.node,
             (1000000000000 * 15) // (100 * prn.nn)
             + (85 * (coalesce(c.su, 0) + dg.dang // prn.nn)) // 100 AS r
      FROM prnodes g CROSS JOIN prn
      LEFT JOIN (SELECT e.d AS node, sum(p.r // x.odeg) AS su
                 FROM pr3 p JOIN predges e ON e.s = p.node
                 JOIN prdeg x ON x.node = p.node GROUP BY 1) c
        ON c.node = g.node
      CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM pr3
                  WHERE node NOT IN (SELECT node FROM prdeg)) dg
    ),
    pr5 AS (
      SELECT g.node,
             (1000000000000 * 15) // (100 * prn.nn)
             + (85 * (coalesce(c.su, 0) + dg.dang // prn.nn)) // 100 AS r
      FROM prnodes g CROSS JOIN prn
      LEFT JOIN (SELECT e.d AS node, sum(p.r // x.odeg) AS su
                 FROM pr4 p JOIN predges e ON e.s = p.node
                 JOIN prdeg x ON x.node = p.node GROUP BY 1) c
        ON c.node = g.node
      CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM pr4
                  WHERE node NOT IN (SELECT node FROM prdeg)) dg
    ),
    mor_deltas AS (
      SELECT k, name, nk, bal_c + 5000 AS bal_c, 1 AS epoch, FALSE AS del
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, NULL, NULL, NULL, 1, TRUE FROM snap_old WHERE k % 10 = 3
      UNION ALL
      SELECT k, name, CAST((nk + 1) % 25 AS INT), bal_c + 10000, 2, FALSE
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k + 1000000, 'NEW#' || CAST(k AS VARCHAR), nk, bal_c + 1,
             2, FALSE
      FROM snap_old WHERE k % 10 = 7
      UNION ALL
      SELECT k, 'RES#' || CAST(k AS VARCHAR), nk, 42, 2, FALSE
      FROM snap_old WHERE k % 20 = 3
    ),
    mor_win AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY epoch DESC)
               AS rn
        FROM mor_deltas) WHERE rn = 1
    ),
    mor_view AS (
      SELECT o.k, o.name, o.nk, o.bal_c FROM snap_old o
      WHERE o.k NOT IN (SELECT k FROM mor_deltas)
      UNION ALL
      SELECT k, name, nk, bal_c FROM mor_win WHERE NOT del
    ),
    morc_pre AS (
      SELECT o.k, o.name, o.nk, o.bal_c, w.del
      FROM snap_old o JOIN mor_win w ON o.k = w.k
    ),
    morc AS (
      SELECT k, name, nk, bal_c, 'delete' AS ct FROM morc_pre WHERE del
      UNION ALL
      SELECT k, name, nk, bal_c, 'update_preimage' FROM morc_pre
      WHERE NOT del
      UNION ALL
      SELECT w.k, w.name, w.nk, w.bal_c, 'update_postimage'
      FROM mor_win w
      WHERE NOT w.del AND w.k IN (SELECT k FROM morc_pre)
      UNION ALL
      SELECT w.k, w.name, w.nk, w.bal_c, 'insert'
      FROM mor_win w
      WHERE NOT w.del AND w.k NOT IN (SELECT k FROM morc_pre)
    ),
    morw_deltas AS (
      SELECT k, name, nk, bal_c + 5000 AS bal_c,
             CAST(NULL AS BIGINT) AS score, 1 AS epoch, FALSE AS del
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, name, nk, bal_c + 7, abs(bal_c) % 997, 2, FALSE
      FROM snap_old WHERE k % 10 = 7
      UNION ALL
      SELECT k, NULL, NULL, NULL, NULL, 2, TRUE
      FROM snap_old WHERE k % 10 = 3
    ),
    morw_win AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY epoch DESC)
               AS rn
        FROM morw_deltas) WHERE rn = 1
    ),
    morw_view AS (
      SELECT o.k, o.name, o.nk, o.bal_c, CAST(NULL AS BIGINT) AS score
      FROM snap_old o
      WHERE o.k NOT IN (SELECT k FROM morw_deltas)
      UNION ALL
      SELECT k, name, nk, bal_c, score FROM morw_win WHERE NOT del
    ),
    ivm AS (
      SELECT nk, COUNT(*) AS cnt, COUNT(bal_c) AS nn,
             CAST(SUM(bal_c) AS BIGINT) AS sb
      FROM mor_view GROUP BY nk
    ),
    scd_dim AS (
      SELECT k, nk, bal_c, DATE '2020-01-01' AS vf FROM snap_old
    ),
    scd_upd AS (
      SELECT k, CAST((nk + 2) % 25 AS INT) AS nk, bal_c + 111 AS bal_c,
             DATE '2021-03-01' AS uts FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, CAST((nk + 1) % 25 AS INT), bal_c + 222, DATE '2021-06-01'
      FROM snap_old WHERE k % 10 = 5
      UNION ALL
      SELECT k, nk, bal_c, DATE '2021-06-01' FROM snap_old WHERE k % 10 = 7
      UNION ALL
      SELECT k, CAST((nk + 3) % 25 AS INT), bal_c + 333, DATE '2019-06-01'
      FROM snap_old WHERE k % 10 = 9
      UNION ALL
      SELECT k + 2000000, nk, bal_c, DATE '2021-06-01'
      FROM snap_old WHERE k % 10 = 1
    ),
    scd_latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY uts DESC) AS rn
        FROM scd_upd) WHERE rn = 1
    ),
    scd_hist AS (
      SELECT d.k, d.nk, d.bal_c, d.vf AS valid_from,
             CASE WHEN u.k IS NOT NULL
                       AND (u.nk <> d.nk OR u.bal_c <> d.bal_c)
                       AND u.uts >= d.vf
                  THEN u.uts END AS valid_to,
             NOT (u.k IS NOT NULL
                  AND (u.nk <> d.nk OR u.bal_c <> d.bal_c)
                  AND u.uts >= d.vf) AS is_current
      FROM scd_dim d LEFT JOIN scd_latest u USING (k)
      UNION ALL
      SELECT u.k, u.nk, u.bal_c, u.uts, NULL, TRUE
      FROM scd_latest u JOIN scd_dim d USING (k)
      WHERE (u.nk <> d.nk OR u.bal_c <> d.bal_c) AND u.uts >= d.vf
      UNION ALL
      SELECT u.k, u.nk, u.bal_c, u.uts, NULL, TRUE
      FROM scd_latest u LEFT JOIN scd_dim d USING (k) WHERE d.k IS NULL
    )
    SELECT 'union_all' AS op, c_nationkey AS k, 'customer' AS side FROM customer
    UNION ALL
    SELECT 'union_all', s_nationkey, 'supplier' FROM supplier
    UNION ALL
    SELECT 'union_distinct', k, NULL FROM (
      SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', k, NULL FROM (
      SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except', k, NULL FROM (
      SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'cross', NULL, r1.r_name || '->' || r2.r_name
    FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey
    UNION ALL
    SELECT 'not_in_null', c_custkey, NULL FROM customer
    WHERE c_custkey NOT IN (
      SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
      FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'above_mean', c_custkey, NULL FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    UNION ALL
    SELECT 'merge', k,
           name || '|' || CAST(nk AS VARCHAR) || '|' || CAST(bal_c AS VARCHAR)
    FROM merged
    UNION ALL
    SELECT 'cdc', k,
           CASE WHEN deleted THEN 'D'
                ELSE 'U|' || name || '|' || CAST(nk AS VARCHAR)
                     || '|' || CAST(bal_c AS VARCHAR) END
    FROM cdc_batch
    UNION ALL
    SELECT 'rt', k,
           name || '|' || CAST(nk AS VARCHAR) || '|' || CAST(bal_c AS VARCHAR)
    FROM snap_new
    UNION ALL
    SELECT 'mor', k,
           name || '|' || CAST(nk AS VARCHAR) || '|' || CAST(bal_c AS VARCHAR)
    FROM mor_view
    UNION ALL
    SELECT 'morc', k,
           ct || '|' || name || '|' || CAST(nk AS VARCHAR)
           || '|' || CAST(bal_c AS VARCHAR)
    FROM morc
    UNION ALL
    SELECT 'morw', k,
           name || '|' || CAST(nk AS VARCHAR) || '|'
           || CAST(bal_c AS VARCHAR) || '|'
           || coalesce(CAST(score AS VARCHAR), 'null')
    FROM morw_view
    UNION ALL
    SELECT 'ivm', nk,
           CAST(cnt AS VARCHAR) || '|' || CAST(nn AS VARCHAR) || '|'
           || coalesce(CAST(sb AS VARCHAR), 'null')
    FROM ivm
    UNION ALL
    SELECT 'drift', bin,
           CAST(n_old AS VARCHAR) || '|' || CAST(n_new AS VARCHAR) || '|'
           || CAST(CAST(round(
                (greatest(CAST(n_new AS DOUBLE) / tb, 0.000001)
                 - greatest(CAST(n_old AS DOUBLE) / ta, 0.000001))
                * ln(greatest(CAST(n_new AS DOUBLE) / tb, 0.000001)
                     / greatest(CAST(n_old AS DOUBLE) / ta, 0.000001))
                * 1000000) AS BIGINT) AS VARCHAR)
    FROM drift
    UNION ALL
    SELECT 'drift_cat', NULL,
           category || '|' || CAST(n_old AS VARCHAR) || '|'
           || CAST(n_new AS VARCHAR) || '|'
           || CAST(CAST(round(
                (greatest(CAST(n_new AS DOUBLE) / tb, 0.000001)
                 - greatest(CAST(n_old AS DOUBLE) / ta, 0.000001))
                * ln(greatest(CAST(n_new AS DOUBLE) / tb, 0.000001)
                     / greatest(CAST(n_old AS DOUBLE) / ta, 0.000001))
                * 1000000) AS BIGINT) AS VARCHAR)
    FROM catd_tot
    UNION ALL
    SELECT 'chi', NULL,
           CAST(n_old AS VARCHAR) || '|' || CAST(n_new AS VARCHAR) || '|'
           || CAST(k AS VARCHAR) || '|' || CAST(chi2u AS VARCHAR)
    FROM chi
    UNION ALL
    SELECT 'ks', NULL,
           CAST(n_old AS VARCHAR) || '|' || CAST(n_new AS VARCHAR)
           || '|' || CAST(d_num AS VARCHAR) || '|'
           || CAST(CAST(round(round(CAST(d_num AS DOUBLE)
                / (CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)), 6)
                * 1000000) AS BIGINT) AS VARCHAR) || '|'
           || CAST(CAST(round(round(CAST(d_num AS DOUBLE)
                / (CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE))
                * sqrt(CAST(n_old AS DOUBLE) * n_new / (n_old + n_new)),
                6) * 1000000) AS BIGINT) AS VARCHAR)
    FROM ks
    UNION ALL
    SELECT 'mwu', NULL,
           CAST(n_old AS VARCHAR) || '|' || CAST(n_new AS VARCHAR)
           || '|' || CAST(u2x AS VARCHAR) || '|'
           || CAST(CAST(round(round(
                (CAST(u2x AS DOUBLE) / 2.0
                 - CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE) / 2.0)
                / sqrt(var), 6) * 1000000) AS BIGINT) AS VARCHAR)
    FROM mw
    UNION ALL
    SELECT 'welch', NULL,
           va || '>' || vb || '|' || CAST(na AS VARCHAR) || '|'
           || CAST(nb AS VARCHAR) || '|'
           || CAST(CAST(round(ma * 1000000) AS BIGINT) AS VARCHAR) || '|'
           || CAST(CAST(round(mb * 1000000) AS BIGINT) AS VARCHAR) || '|'
           || coalesce(CAST(CAST(round(t * 1000000) AS BIGINT)
                           AS VARCHAR), 'null') || '|'
           || coalesce(CAST(CAST(round(dof * 1000000) AS BIGINT)
                           AS VARCHAR), 'null')
    FROM welch
    UNION ALL
    SELECT 'prop', NULL,
           va || '>' || vb || '|' || CAST(na AS VARCHAR) || '|'
           || CAST(nb AS VARCHAR) || '|' || CAST(xa AS VARCHAR) || '|'
           || CAST(xb AS VARCHAR) || '|'
           || CAST(CAST(round(ra * 1000000) AS BIGINT) AS VARCHAR) || '|'
           || CAST(CAST(round(rb * 1000000) AS BIGINT) AS VARCHAR) || '|'
           || coalesce(CAST(CAST(round(z * 1000000) AS BIGINT)
                           AS VARCHAR), 'null')
    FROM prop
    UNION ALL
    SELECT 'pr', node, CAST(r AS VARCHAR)
    FROM pr5
    UNION ALL
    SELECT 'tri', node,
           CAST(degree AS VARCHAR) || '|' || CAST(n_tri AS VARCHAR)
           || '|' || CAST(coeff_micro AS VARCHAR)
    FROM tri
    UNION ALL
    SELECT 'scd2', k,
           CAST(nk AS VARCHAR) || '|' || CAST(bal_c AS VARCHAR)
           || '|' || CAST(valid_from AS VARCHAR)
           || '|' || coalesce(CAST(valid_to AS VARCHAR), 'open')
           || '|' || CAST(is_current AS VARCHAR)
    FROM scd_hist
"""


@query("q_setops", oracle=_SETOPS_ORACLE)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-op / membership surface as one tagged union:

    * ``union_all``       — bag union, duplicates preserved;
    * ``union_distinct``  — set union (dedup across both inputs);
    * ``intersect``       — set intersect: customers that placed orders;
    * ``except``          — set difference: customers that never ordered;
    * ``cross``           — explicit cartesian product (tiny dims only —
      the engine's plans never cross-join large tables; see the cone
      search's equi-join design for why);
    * ``not_in_null``     — NOT IN with NULLs in the subquery, the classic
      three-valued-logic trap: any NULL in the IN-list makes NOT IN
      never-true, so rows survive only when the null-producing branch is
      absent.  Both engines must agree on the (often surprising) ANSI
      semantics;
    * ``above_mean``      — scalar subquery: customers above the global
      mean balance, the 1-row aggregate broadcast + filter — the same
      plan Catalyst builds for the SQL subquery.

    Snapshot-maintenance branches (operators/merge.py — MERGE/SCD-2/CDC
    are snapshot set algebra: one anti equi-join + union with a
    batch-sized winner window, so they live in this union; fixtures
    derive deterministically from customer, balances as integer cents):

    * ``merge`` — ``merge_upsert`` applying a CDC envelope with
      updates (including a stale seq-1 loser per key), tombstone
      deletes, and inserts; side = the post-merge payload;
    * ``cdc``   — ``snapshot_cdc(old, new)``: the minimal change
      batch, upserts tagged ``U|payload``, tombstones ``D``;
    * ``rt``    — the round-trip law under the hash gate:
      ``merge_upsert(old, snapshot_cdc(old, new)) ≡ new`` (the oracle
      side is ``new`` built directly);
    * ``morw``  — the SCHEMA-WIDENED reconcile (round 10,
      ``mor_append(allow_new_columns=)``'s read contract): epoch 2
      adds a ``score`` column; base and epoch 1 surface typed NULLs
      there, the winner window and anti-join run over the widened
      shape, and the nullable field coalesces to a ``'null'`` token
      in the payload on both engines;
    * ``mor``   — ``mor_reconcile`` (the merge-on-read read path of
      ``sinks/mor.py``): a two-epoch delta stack with an override, a
      tombstone, a resurrection, and inserts — winner-per-key by epoch
      DESC + one broadcast anti-join; side = the reconciled payload;
    * ``morc``  — ``merge.change_feed`` over the SAME delta stack
      (the algebra under ``sinks/mor.mor_changes``, Delta CDF
      vocabulary): net winner per key classified against the snapshot
      — ``insert`` / ``update_preimage`` / ``update_postimage`` /
      ``delete`` rows; side = ``type|name|nk|bal_c``;
    * ``ivm``   — ``merge.apply_agg_delta`` (incremental aggregate
      view maintenance, the algebra under ``sinks/mor.mor_sync_agg``):
      the SAME change feed folded into the maintained per-``nk``
      count / non-null count / sum of the snapshot; the oracle is the
      DIRECT ``GROUP BY`` over the post state, so the gate checks the
      IVM law itself; k = nk, side = ``cnt|nn|sum-or-null``;
    * ``scd2``  — ``scd2_apply``: close-out + new open versions, a
      stale-timestamp loser collapsed per key, a no-op update, a
      LATE (pre-``valid_from``) update ignored, and brand-new keys
      inserted; side = ``nk|bal|valid_from|valid_to|is_current``;
    * ``drift`` — ``operators/diff.py::snapshot_drift``: PSI
      distribution drift of ``bal_c`` between the same two snapshots
      (exact decile boundaries from old, per-bin counts, psi term as
      exact integer micro-units); k = bin, side = ``n_old|n_new|
      psi_micro``;
    * ``drift_cat`` — ``operators/diff.py::category_drift``: the same
      PSI over CATEGORY bins for a derived string feature
      (c_mktsegment x k%7): top-20 old-side categories keep identity,
      NULL is the ``(null)`` category, everything else — including a
      new-only category — folds into ``(other)``; k = NULL, side =
      ``category|n_old|n_new|psi_micro``;
    * ``chi`` — ``stats_tests.py::chi2_test``: two-sample chi-squared
      homogeneity over the SAME unfolded categorical snapshots as
      ``drift_cat`` (significance twin of its PSI effect size); the
      statistic is DEFINED as exact two-stage integer floor division,
      so the payload is integers only; side =
      ``n_old|n_new|k|chi2_units``;
    * ``pr`` — ``operators/graph.py::pagerank_quantized``: PageRank
      whose ITERATION is defined over exact integers (per-edge
      ``r div out_deg``, damping 85/100 and dangling mass by floor
      division, fixed 5 iterations), so the full trajectory is
      hash-exact against the oracle's unrolled replay; k = node,
      side = ``rank_units``;
    * ``tri`` — ``operators/graph.py::triangle_counts``: per-node
      triangle counts + local clustering coefficient over a
      deterministic orders-derived graph, computed by the
      degree-ordered wedge algorithm (Suri & Vassilvitskii 2011);
      k = node, side = ``degree|n_tri|coeff_micro``;
    * ``ks`` — ``operators/stats_tests.py::ks_test``: the two-sample
      Kolmogorov–Smirnov statistic between the same two snapshots,
      sup taken on the EXACT integer numerator; side =
      ``n_old|n_new|d_num|d_micro|lambda_micro``;
    * ``mwu`` — ``stats_tests.py::mann_whitney_u``: the rank-sum
      test between the same snapshots — midranks as exact doubled
      integers, tie-corrected z; side = ``n_old|n_new|u2x|z_micro``;
    * ``prop`` — ``stats_tests.py::proportion_ztest``: two-proportion
      z (conversion-rate A/B) across the same arms, success = a
      fulfilled order; side = ``a>b|n_a|n_b|x_a|x_b|rateA_u|rateB_u|
      z_micro``;
    * ``welch`` — ``stats_tests.py::welch_ttest``: Welch's unequal-
      variance t for every pair of three derived order arms, all
      statistics from exact integer sums; side =
      ``a>b|n_a|n_b|meanA_u|meanB_u|t_u|dof_u``.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    r = load_table(spark, sf_dir, "region")

    def tag(df: DataFrame, op: str, k, side) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            (k if k is not None else F.lit(None)).cast("long").alias("k"),
            (side if side is not None else F.lit(None)).cast("string").alias("side"),
        )

    union_all = tag(c, "union_all", F.col("c_nationkey"), F.lit("customer")).unionByName(
        tag(s, "union_all", F.col("s_nationkey"), F.lit("supplier"))
    )
    union_distinct = tag(
        c.select(F.col("c_nationkey").alias("k"))
        .unionByName(s.select(F.col("s_nationkey").alias("k")))
        .distinct(),
        "union_distinct", F.col("k"), None,
    )
    intersect = tag(
        c.select(F.col("c_custkey").alias("k"))
        .intersect(o.select(F.col("o_custkey").alias("k"))),
        "intersect", F.col("k"), None,
    )
    except_ = tag(
        c.select(F.col("c_custkey").alias("k"))
        .subtract(o.select(F.col("o_custkey").alias("k"))),
        "except", F.col("k"), None,
    )
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("n1"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("n2"))
    cross = tag(
        r1.crossJoin(r2).where(F.col("k1") != F.col("k2")),
        "cross", None, F.concat(F.col("n1"), F.lit("->"), F.col("n2")),
    )
    c.createOrReplaceTempView("__so_customer")
    o.createOrReplaceTempView("__so_orders")
    not_in = tag(
        spark.sql(
            """
            SELECT c_custkey FROM __so_customer
            WHERE c_custkey NOT IN (
              SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey ELSE NULL END
              FROM __so_orders WHERE o_orderstatus = 'F')
            """
        ),
        "not_in_null", F.col("c_custkey"), None,
    )
    mean = c.agg(F.avg("c_acctbal").alias("__mean"))
    above_mean = tag(
        c.crossJoin(F.broadcast(mean)).where(F.col("c_acctbal") > F.col("__mean")),
        "above_mean", F.col("c_custkey"), None,
    )

    # --- snapshot-maintenance branches (operators/merge.py) ----------
    # MERGE/SCD-2/CDC are set algebra over snapshots (anti-join + union
    # with a batch-sized winner window), so they gate here.  Fixtures
    # derive deterministically from the customer dimension — balances
    # as integer cents so no float ever crosses the hash gate:
    #   k%10==3 deleted, k%10==5 updated (with a stale seq-1 loser),
    #   k%10==7 cloned to k+1000000 as inserts.
    from cosmap_spark.operators.merge import merge_upsert, scd2_apply, snapshot_cdc

    k = F.col("k")
    old = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nk"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    upd5 = old.where(k % 10 == 5)
    ins7 = old.where(k % 10 == 7).select(
        (k + 1000000).alias("k"),
        F.concat(F.lit("NEW#"), k.cast("string")).alias("name"),
        "nk",
        (F.col("bal_c") + 1).alias("bal_c"),
    )
    new = (
        old.where(k % 10 != 3)
        .select(
            "k",
            "name",
            F.when(k % 10 == 5, ((F.col("nk") + 1) % 25).cast("int"))
            .otherwise(F.col("nk")).alias("nk"),
            F.when(k % 10 == 5, F.col("bal_c") + 10000)
            .otherwise(F.col("bal_c")).alias("bal_c"),
        )
        .unionByName(ins7)
    )

    def env(df: DataFrame, seq: int, deleted: bool) -> DataFrame:
        return df.select(
            "k", "name", "nk", "bal_c",
            F.lit(seq).alias("seq"), F.lit(deleted).alias("deleted"),
        )

    changes = (
        env(upd5.select("k", "name", "nk",
                        (F.col("bal_c") + 5000).alias("bal_c")), 1, False)
        .unionByName(env(upd5.select(
            "k", "name", ((F.col("nk") + 1) % 25).cast("int").alias("nk"),
            (F.col("bal_c") + 10000).alias("bal_c")), 2, False))
        .unionByName(env(old.where(k % 10 == 3).select(
            "k", F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("int").alias("nk"),
            F.lit(None).cast("long").alias("bal_c")), 1, True))
        .unionByName(env(ins7, 1, False))
    )
    payload = F.concat_ws(
        "|", F.col("name"), F.col("nk").cast("string"),
        F.col("bal_c").cast("string"),
    )
    merge_b = tag(
        merge_upsert(old, changes, ["k"], seq_col="seq", delete_col="deleted"),
        "merge", k, payload,
    )
    cdc_frame = snapshot_cdc(old, new, ["k"])
    cdc_b = tag(
        cdc_frame, "cdc", k,
        F.when(F.col("deleted"), F.lit("D")).otherwise(
            F.concat_ws("|", F.lit("U"), F.col("name"),
                        F.col("nk").cast("string"),
                        F.col("bal_c").cast("string"))
        ),
    )
    # round-trip law under the gate: merge_upsert(old, cdc(old,new)) ≡ new
    rt_b = tag(
        merge_upsert(old, cdc_frame, ["k"], delete_col="deleted",
                     assume_unique=True),
        "rt", k, payload,
    )

    # merge-on-read reconciliation (operators/merge.py::mor_reconcile —
    # the pure-plan read side of sinks/mor.py): a two-epoch delta stack
    # where epoch 2 overrides epoch 1's update (k%10==5), resurrects
    # half the epoch-1 tombstones (k%20==3, bal 42), keeps the other
    # half deleted (k%20==13), and inserts fresh keys — the oracle
    # replays winner-per-key by epoch DESC + anti-join + union
    from cosmap_spark.operators.merge import mor_reconcile

    def denv(df: DataFrame, epoch: int, deleted: bool) -> DataFrame:
        return df.select(
            "k", "name", "nk", "bal_c",
            F.lit(epoch).cast("long").alias("epoch"),
            F.lit(deleted).alias("__deleted"),
        )

    mor_deltas = (
        denv(upd5.select("k", "name", "nk",
                         (F.col("bal_c") + 5000).alias("bal_c")), 1, False)
        .unionByName(denv(old.where(k % 10 == 3).select(
            "k", F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("int").alias("nk"),
            F.lit(None).cast("long").alias("bal_c")), 1, True))
        .unionByName(denv(upd5.select(
            "k", "name", ((F.col("nk") + 1) % 25).cast("int").alias("nk"),
            (F.col("bal_c") + 10000).alias("bal_c")), 2, False))
        .unionByName(denv(ins7, 2, False))
        .unionByName(denv(old.where(k % 20 == 3).select(
            "k", F.concat(F.lit("RES#"), k.cast("string")).alias("name"),
            "nk", F.lit(42).cast("long").alias("bal_c")), 2, False))
    )
    mor_b = tag(
        mor_reconcile(old, mor_deltas, ["k"], epoch_col="epoch"),
        "mor", k, payload,
    )

    # NET change feed over the SAME fixture (operators/merge.py::
    # change_feed — the algebra under sinks/mor.mor_changes, Delta's
    # CDF vocabulary): the winner per key classified against the
    # snapshot — update pre/post pairs for overridden keys, deletes
    # with pre-images for surviving tombstones, inserts for fresh
    # keys; a tombstone-then-resurrect key nets to one update pair.
    # materialize=False: the gate fixture's lineage is one customer
    # scan — a checkpoint would cost more than the recompute.
    from cosmap_spark.operators.merge import change_feed

    morc_b = tag(
        change_feed(old, mor_deltas, ["k"], epoch_col="epoch",
                    materialize=False),
        "morc", k,
        F.concat_ws("|", F.col("_change_type"), F.col("name"),
                    F.col("nk").cast("string"),
                    F.col("bal_c").cast("string")),
    )

    # schema-WIDENED reconcile (round 10, mor_append(allow_new_columns)
    # read contract as pure algebra): epoch 2 adds a 'score' column;
    # the base and epoch 1 surface typed NULLs there (mor_read's
    # _fill_to_schema), and the winner window / anti-join run over the
    # widened shape.  The score payload field coalesces to a canonical
    # 'null' token on BOTH sides (concat_ws silently DROPS null fields
    # while DuckDB || nulls the string — the q_setops mwu/welch rule).
    base_w = old.select(
        "k", "name", "nk", "bal_c",
        F.lit(None).cast("long").alias("score"),
    )

    def wenv(df: DataFrame, epoch: int, deleted: bool) -> DataFrame:
        return df.select(
            "k", "name", "nk", "bal_c", "score",
            F.lit(epoch).cast("long").alias("epoch"),
            F.lit(deleted).alias("__deleted"),
        )

    morw_deltas = (
        wenv(upd5.select(
            "k", "name", "nk", (F.col("bal_c") + 5000).alias("bal_c"),
            F.lit(None).cast("long").alias("score")), 1, False)
        .unionByName(wenv(old.where(k % 10 == 7).select(
            "k", "name", "nk", (F.col("bal_c") + 7).alias("bal_c"),
            (F.abs(F.col("bal_c")) % 997).cast("long").alias("score")),
            2, False))
        .unionByName(wenv(old.where(k % 10 == 3).select(
            "k", F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("int").alias("nk"),
            F.lit(None).cast("long").alias("bal_c"),
            F.lit(None).cast("long").alias("score")), 2, True))
    )
    morw_b = tag(
        mor_reconcile(base_w, morw_deltas, ["k"], epoch_col="epoch"),
        "morw", k,
        F.concat_ws(
            "|", F.col("name"), F.col("nk").cast("string"),
            F.col("bal_c").cast("string"),
            F.coalesce(F.col("score").cast("string"), F.lit("null")),
        ),
    )

    # incremental aggregate view maintenance (round 10,
    # operators/merge.py::apply_agg_delta — the algebra under
    # sinks/mor.mor_sync_agg): fold the SAME change feed into the
    # maintained per-nk aggregate of the snapshot; the oracle computes
    # the direct GROUP BY over the post state (mor_view), so the gate
    # checks the IVM law itself, not a replay of the same algebra.
    # The sum payload coalesces to a 'null' token (q_setops rule).
    from cosmap_spark.operators.merge import agg_snapshot, apply_agg_delta

    ivm_spec = {
        "cnt": ("count", None),
        "nn": ("countnn", "bal_c"),
        "sb": ("sum", "bal_c"),
    }
    ivm_b = tag(
        apply_agg_delta(
            agg_snapshot(old, ["nk"], ivm_spec),
            change_feed(old, mor_deltas, ["k"], materialize=False),
            ["nk"], ivm_spec,
        ),
        "ivm", F.col("nk"),
        F.concat_ws(
            "|", F.col("cnt").cast("string"), F.col("nn").cast("string"),
            F.coalesce(F.col("sb").cast("string"), F.lit("null")),
        ),
    )

    dim = old.select(
        "k", "nk", "bal_c",
        F.to_date(F.lit("2020-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    def upd(df: DataFrame, dnk: int, dbal: int, ts: str) -> DataFrame:
        return df.select(
            "k",
            ((F.col("nk") + dnk) % 25).cast("int").alias("nk"),
            (F.col("bal_c") + dbal).alias("bal_c"),
            F.to_date(F.lit(ts)).alias("uts"),
        )

    scd_updates = (
        upd(upd5, 2, 111, "2021-03-01")           # stale: seq loser
        .unionByName(upd(upd5, 1, 222, "2021-06-01"))  # winner: close+insert
        .unionByName(upd(old.where(k % 10 == 7), 0, 0, "2021-06-01"))  # no-op
        .unionByName(upd(old.where(k % 10 == 9), 3, 333, "2019-06-01"))  # late: ignored
        .unionByName(
            upd(old.where(k % 10 == 1), 0, 0, "2021-06-01")
            .withColumn("k", F.col("k") + 2000000)  # brand-new keys
        )
    )
    scd2_b = tag(
        scd2_apply(dim, scd_updates, ["k"], ts_col="uts",
                   tracked=["nk", "bal_c"]),
        "scd2", k,
        F.concat_ws(
            "|", F.col("nk").cast("string"), F.col("bal_c").cast("string"),
            F.col("valid_from").cast("string"),
            F.coalesce(F.col("valid_to").cast("string"), F.lit("open")),
            F.col("is_current").cast("string"),
        ),
    )

    # PSI drift between the same two snapshots (operators/diff.py::
    # snapshot_drift): exact decile boundaries from old, counts per
    # bin, psi term in exact integer micro-units so the float crosses
    # the hash gate as a rounded integer
    from cosmap_spark.operators.diff import snapshot_drift

    drift_b = tag(
        snapshot_drift(
            old.select("k", "bal_c"), new.select("k", "bal_c"),
            ["bal_c"], bins=10,
        ),
        "drift", F.col("bin"),
        F.concat_ws(
            "|",
            F.col("n_old").cast("string"), F.col("n_new").cast("string"),
            F.round(F.col("psi_term") * 1000000).cast("long").cast("string"),
        ),
    )

    # categorical PSI (operators/diff.py::category_drift): categories
    # from c_mktsegment x (k % 7), k%10==3 NULL-categorized on the old
    # side, k%10==5 shifted + a new-only 'brandnew' category on the new
    # side — exercises top-20 selection, OTHER folding, the null label,
    # and a brand-new category surfacing as OTHER drift
    from cosmap_spark.operators.diff import category_drift

    ck = F.col("c_custkey")
    base_cat = F.when(ck % 10 == 3, F.lit(None).cast("string")).otherwise(
        F.concat(F.col("c_mktsegment"), F.lit("#"), (ck % 7).cast("string"))
    )
    shifted_cat = F.concat(
        F.col("c_mktsegment"), F.lit("#"), ((ck + 1) % 7).cast("string")
    )
    cat_old = c.select(base_cat.alias("cat"))
    cat_new = (
        c.where(ck % 10 != 3)
        .select(F.when(ck % 10 == 5, shifted_cat).otherwise(base_cat)
                .alias("cat"))
        .unionByName(
            c.where(ck % 10 == 7).select(F.lit("brandnew").alias("cat"))
        )
    )
    # two-sample inference over the same fixtures (operators/
    # stats_tests.py): KS between the snapshots' bal_c (exact integer
    # sup numerator) and Welch's t across three derived order arms
    from cosmap_spark.operators.stats_tests import (
        chi2_test,
        ks_test,
        mann_whitney_u,
        proportion_ztest,
        welch_ttest,
    )

    ks_b = tag(
        ks_test(old.select("k", "bal_c"), new.select("k", "bal_c"),
                ["bal_c"], quantize_dp=0),
        "ks", None,
        F.concat_ws(
            "|",
            F.col("n_old").cast("string"), F.col("n_new").cast("string"),
            F.col("d_num").cast("string"),
            F.round(F.col("d_stat") * 1000000).cast("long").cast("string"),
            F.round(F.col("lambda_stat") * 1000000).cast("long")
            .cast("string"),
        ),
    )
    mwu_b = tag(
        mann_whitney_u(old.select("k", "bal_c"), new.select("k", "bal_c"),
                       ["bal_c"], quantize_dp=0),
        "mwu", None,
        F.concat_ws(
            "|",
            F.col("n_old").cast("string"), F.col("n_new").cast("string"),
            F.col("u2x").cast("string"),
            F.coalesce(
                F.round(F.col("z_stat") * 1000000).cast("long")
                .cast("string"),
                F.lit("null"),
            ),
        ),
    )
    arms = o.select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("a"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("b"))
        .otherwise(F.lit("c")).alias("variant"),
        F.col("o_totalprice").alias("value"),
    )
    welch_b = tag(
        welch_ttest(arms, "variant", "value", quantize_dp=2),
        "welch", None,
        F.concat_ws(
            "|",
            F.concat(F.col("variant_a"), F.lit(">"), F.col("variant_b")),
            F.col("n_a").cast("string"), F.col("n_b").cast("string"),
            F.round(F.col("mean_a") * 1000000).cast("long").cast("string"),
            F.round(F.col("mean_b") * 1000000).cast("long").cast("string"),
            F.coalesce(
                F.round(F.col("t_stat") * 1000000).cast("long")
                .cast("string"), F.lit("null"),
            ),
            F.coalesce(
                F.round(F.col("dof") * 1000000).cast("long")
                .cast("string"), F.lit("null"),
            ),
        ),
    )

    prop_b = tag(
        proportion_ztest(
            o.select(
                F.when(F.col("o_orderkey") % 3 == 0, F.lit("a"))
                .when(F.col("o_orderkey") % 3 == 1, F.lit("b"))
                .otherwise(F.lit("c")).alias("variant"),
                (F.col("o_orderstatus") == "F").alias("ok"),
            ),
            "variant", "ok",
        ),
        "prop", None,
        F.concat_ws(
            "|",
            F.concat(F.col("variant_a"), F.lit(">"), F.col("variant_b")),
            F.col("n_a").cast("string"), F.col("n_b").cast("string"),
            F.col("x_a").cast("string"), F.col("x_b").cast("string"),
            F.round(F.col("rate_a") * 1000000).cast("long").cast("string"),
            F.round(F.col("rate_b") * 1000000).cast("long").cast("string"),
            F.coalesce(
                F.round(F.col("z_stat") * 1000000).cast("long")
                .cast("string"), F.lit("null"),
            ),
        ),
    )

    # triangle counting (operators/graph.py::triangle_counts — the
    # degree-ordered wedge algorithm) over a deterministic graph
    # derived from orders; coefficient surfaces as integer micro-units
    from cosmap_spark.operators.graph import triangle_counts

    ok = F.col("o_orderkey")
    tedges = o.where((ok % 7 < 2) & (F.col("o_custkey") % 200 != ok % 200)).select(
        (F.col("o_custkey") % 200).alias("src"), (ok % 200).alias("dst")
    )
    # quantized PageRank (operators/graph.py::pagerank_quantized) over
    # the DIRECTED distinct edges of the same derived graph — the
    # integer-defined iteration makes the full 5-iteration trajectory
    # hash-exact against the oracle's unrolled replay
    from cosmap_spark.operators.graph import pagerank_quantized

    pr_edges = o.where(
        (ok % 7 < 2) & (F.col("o_custkey") % 200 != ok % 200)
    ).select(
        (F.col("o_custkey") % 200).alias("src"), (ok % 200).alias("dst")
    ).distinct()
    pr_b = tag(
        pagerank_quantized(pr_edges, iterations=5),
        "pr", F.col("node"),
        F.col("rank_units").cast("string"),
    )

    tri_b = tag(
        triangle_counts(tedges),
        "tri", F.col("node"),
        F.concat_ws(
            "|",
            F.col("degree").cast("string"), F.col("n_tri").cast("string"),
            F.when(F.col("degree") >= 2,
                   F.round(F.col("clust_coeff") * 1000000).cast("long"))
            .otherwise(F.lit(0).cast("long")).cast("string"),
        ),
    )

    drift_cat_b = tag(
        category_drift(cat_old, cat_new, ["cat"], top_n=20),
        "drift_cat", None,
        F.concat_ws(
            "|",
            F.col("category"),
            F.col("n_old").cast("string"), F.col("n_new").cast("string"),
            F.round(F.col("psi_term") * 1000000).cast("long").cast("string"),
        ),
    )

    # chi-squared homogeneity over the same categorical snapshots
    # (operators/stats_tests.py::chi2_test) — the significance twin of
    # drift_cat's PSI effect size; the statistic is DEFINED as exact
    # two-stage integer floor division, so the payload is integers only
    chi_b = tag(
        chi2_test(cat_old, cat_new, ["cat"]),
        "chi", None,
        F.concat_ws(
            "|",
            F.col("n_old").cast("string"), F.col("n_new").cast("string"),
            F.col("k").cast("string"),
            F.col("chi2_units").cast("string"),
        ),
    )

    out = union_all
    for branch in (union_distinct, intersect, except_, cross, not_in,
                   above_mean, merge_b, cdc_b, rt_b, mor_b, morc_b,
                   morw_b, ivm_b,
                   scd2_b, drift_b, drift_cat_b, chi_b, pr_b, tri_b,
                   ks_b, mwu_b, welch_b, prop_b):
        out = out.unionByName(branch)
    return out

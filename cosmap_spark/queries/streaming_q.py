"""Streaming-semantics queries, batch-mode twins (SURVEY.md §2.2
"Streaming").

The reference is batch-only with incremental collection (O22).  Our
engine's real streaming surface lives in cosmap_spark/streaming/ and is
exercised by tests/test_streaming.py with actual readStream sources; the
oracle can't run streams, so the ledger declares the batch-equivalent
aggregations (identical window semantics — Spark's window()/
session_window() functions behave the same in batch and streaming).

All window starts surface as epoch seconds (bigint): Spark's windows are
epoch-aligned, so ``unix_timestamp(window.start) ==
floor(epoch(ts)/slide)*slide`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmap_spark.queries.registry import query
from cosmap_spark.tables import load_table


_STREAM_WINDOWS_ORACLE = """
    WITH slide AS (
      SELECT CAST(floor(epoch(ts) / 600) * 600 - off AS BIGINT) AS window_start,
             count(*) AS n, round(sum(value), 4) AS total
      FROM events CROSS JOIN (SELECT unnest([0, 600, 1200]) AS off) offs
      WHERE ts IS NOT NULL  -- Spark's window() silently drops null ts
      GROUP BY 1
    ),
    -- fixed-anchor funnel view -> click -> purchase, 2-day horizon:
    -- anchor = each user's FIRST view; each later step takes the
    -- earliest strictly-later event of its type within the horizon of
    -- the ANCHOR (greedy-earliest is optimal for a fixed anchor)
    f1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
    ),
    f2 AS (
      SELECT f1.user_id, f1.t1, min(e.ts) AS t2
      FROM f1 LEFT JOIN events e
        ON e.user_id = f1.user_id AND e.event_type = 'click'
       AND e.ts > f1.t1 AND e.ts <= f1.t1 + INTERVAL 2 DAY
      GROUP BY 1, 2
    ),
    f3 AS (
      SELECT f2.user_id, f2.t1, f2.t2, min(e.ts) AS t3
      FROM f2 LEFT JOIN events e
        ON e.user_id = f2.user_id AND e.event_type = 'purchase'
       AND e.ts > f2.t2 AND e.ts <= f2.t1 + INTERVAL 2 DAY
      GROUP BY 1, 2, 3
    ),
    fsteps AS (
      SELECT user_id, 1 AS step, t1 AS sts FROM f3
      UNION ALL SELECT user_id, 2, t2 FROM f3 WHERE t2 IS NOT NULL
      UNION ALL SELECT user_id, 3, t3 FROM f3 WHERE t3 IS NOT NULL
    ),
    fcounts AS (
      SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM f3
    ),
    -- sliding-anchor funnel (windowFunnel): EVERY view is a candidate
    -- anchor; per user keep the max chain level and the LATEST anchor
    -- among chains reaching it
    c2 AS (
      SELECT a.user_id, a.ts AS anchor, min(e.ts) AS t2
      FROM events a LEFT JOIN events e
        ON e.user_id = a.user_id AND e.event_type = 'click'
       AND e.ts > a.ts AND e.ts <= a.ts + INTERVAL 2 DAY
      WHERE a.event_type = 'view' AND a.ts IS NOT NULL
      GROUP BY 1, 2
    ),
    c3 AS (
      SELECT c2.user_id, c2.anchor, c2.t2, min(e.ts) AS t3
      FROM c2 LEFT JOIN events e
        ON e.user_id = c2.user_id AND e.event_type = 'purchase'
       AND e.ts > c2.t2 AND e.ts <= c2.anchor + INTERVAL 2 DAY
      GROUP BY 1, 2, 3
    ),
    lv AS (
      SELECT user_id, anchor,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS level
      FROM c3
    ),
    -- time-to-convert means over the same fixed-anchor funnel
    lat AS (
      SELECT 2 AS step, count(*) AS n_users,
             round(avg(epoch(t2) - epoch(t1)), 3) AS mean_prev,
             round(avg(epoch(t2) - epoch(t1)), 3) AS mean_start
      FROM f3 WHERE t2 IS NOT NULL HAVING count(*) > 0
      UNION ALL
      SELECT 3, count(*),
             round(avg(epoch(t3) - epoch(t2)), 3),
             round(avg(epoch(t3) - epoch(t1)), 3)
      FROM f3 WHERE t3 IS NOT NULL HAVING count(*) > 0
    ),
    -- top 3-step event paths (flow analysis)
    pth AS (
      SELECT concat_ws('>', event_type,
                       lead(event_type, 1) OVER w,
                       lead(event_type, 2) OVER w) AS path,
             lead(event_type, 2) OVER w AS tail
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    topp AS (
      SELECT path, count(*) AS n FROM pth WHERE tail IS NOT NULL
      GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    ),
    -- first/last-touch attribution of purchases
    att0 AS (
      SELECT event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER wp AS f,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER wp AS l
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    atts AS (
      SELECT 'first' AS model, coalesce(f, 'direct') AS touch, 1.0 AS w
      FROM att0 WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'last', coalesce(l, 'direct'), 1.0
      FROM att0 WHERE event_type = 'purchase'
    ),
    -- path models: non-overlapping lookback — each conversion groups
    -- with the touches since the user's previous conversion (the
    -- conversions-remaining stamp = the operator's running-sum trick)
    atp0 AS (
      SELECT user_id, ts, event_id, event_type,
             (event_type = 'purchase') AS ic,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS cid
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    atp1 AS (
      SELECT *,
             sum(CASE WHEN NOT ic THEN 1 ELSE 0 END) OVER wg AS m,
             max(CASE WHEN ic THEN ts END) OVER wg AS cts,
             max(CASE WHEN NOT ic THEN ts END) OVER wg AS mts,
             row_number() OVER (PARTITION BY user_id, cid
                                ORDER BY ts, event_id) AS pos
      FROM atp0 WHERE cid >= 1
      WINDOW wg AS (PARTITION BY user_id, cid)
    ),
    -- decay anchored at the newest TOUCH (mts), matching the
    -- operator: shift-invariant weights, denominator always >= 1
    atp2 AS (
      SELECT *, pow(0.5, date_diff('microsecond', ts, mts)
                         / 86400000000.0) AS rd
      FROM atp1
    ),
    atp3 AS (
      SELECT *, sum(CASE WHEN NOT ic THEN rd END)
                  OVER (PARTITION BY user_id, cid) AS rdz
      FROM atp2
    ),
    attp AS (
      SELECT 'linear' AS model, event_type AS touch, 1.0 / m AS w
      FROM atp3 WHERE NOT ic
      UNION ALL
      SELECT 'position', event_type,
             CASE WHEN m = 1 THEN 1.0 WHEN m = 2 THEN 0.5
                  WHEN pos = 1 OR pos = m THEN 0.4
                  ELSE 0.2 / (m - 2) END
      FROM atp3 WHERE NOT ic
      UNION ALL
      SELECT 'time_decay', event_type, rd / rdz FROM atp3 WHERE NOT ic
      UNION ALL
      SELECT mdl, 'direct', 1.0
      FROM atp3,
           (SELECT unnest(['linear', 'position', 'time_decay']) AS mdl)
      WHERE ic AND m = 0
    ),
    attc AS (
      SELECT model, touch, count(*) AS n, round(sum(w), 4) AS credit
      FROM (SELECT * FROM atts UNION ALL SELECT * FROM attp)
      GROUP BY 1, 2
    ),
    att AS (
      SELECT model, touch, n,
             round(credit / sum(credit) OVER (PARTITION BY model), 6)
               AS share
      FROM attc
    ),
    wbest AS (SELECT user_id, max(level) AS steps FROM lv GROUP BY 1),
    wf AS (
      SELECT b.user_id, max(l.anchor) AS anchor, b.steps
      FROM wbest b JOIN lv l
        ON l.user_id = b.user_id AND l.level = b.steps
      GROUP BY 1, 3
    ),
    -- weekly cohort retention over the same events
    cev AS (
      SELECT user_id, date_trunc('week', ts) AS p FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    cfirsts AS (SELECT user_id, min(p) AS cohort FROM cev GROUP BY 1),
    csizes AS (SELECT cohort, count(*) AS sz FROM cfirsts GROUP BY 1),
    cact AS (
      SELECT DISTINCT e.user_id, f.cohort,
             (date_diff('day', f.cohort, e.p) / 7)::BIGINT AS pn
      FROM cev e JOIN cfirsts f USING (user_id)
      WHERE (date_diff('day', f.cohort, e.p) / 7)::BIGINT < 8
    ),
    cagg AS (
      SELECT cohort, pn, count(*) AS n_active FROM cact GROUP BY 1, 2
    ),
    -- per-user AMOC changepoint in the mean of value: exact-integer
    -- prefix sums (6-dp quantization) make every CUSUM statistic the
    -- same IEEE double in both engines, so the argmax is hash-exact
    cpq AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 1000000.0) AS BIGINT) AS q
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL  -- an order col: the operator drops it too
    ),
    cpc AS (
      SELECT user_id, ts,
             sum(q) OVER wc AS c,
             row_number() OVER wo AS i,
             sum(q) OVER wk AS t,
             count(*) OVER wk AS n
      FROM cpq
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
             wc AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wk AS (PARTITION BY user_id)
    ),
    cps AS (
      SELECT user_id, ts, i, n,
             (CAST(i * (n - i) AS DOUBLE) / n)
               * (CAST(c AS DOUBLE) / i - CAST(t - c AS DOUBLE) / (n - i))
               * (CAST(c AS DOUBLE) / i - CAST(t - c AS DOUBLE) / (n - i))
               AS sq
      FROM cpc WHERE i < n AND n >= 8
    ),
    cpbest AS (
      SELECT user_id, ts, i, sq,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY sq DESC, i) AS rn
      FROM cps
    ),
    -- budgeted parallel binary segmentation, budget=2, min_seg=4,
    -- unrolled round-by-round over the SAME exact-integer prefix sums:
    -- round 0 = best admissible split of the whole series (sq > 0);
    -- round 1 = each child segment proposes its best (segment-local
    -- weights/means from the global prefix sums), per-user acceptance
    -- ranked (sq DESC, pos ASC) up to the remaining budget of 1
    bs0 AS (
      SELECT user_id, ts, i, n, c, t,
             (CAST(i * (n - i) AS DOUBLE) / n)
               * (CAST(c AS DOUBLE) / i - CAST(t - c AS DOUBLE) / (n - i))
               * (CAST(c AS DOUBLE) / i - CAST(t - c AS DOUBLE) / (n - i))
               AS sq
      FROM cpc WHERE i >= 4 AND n - i >= 4
    ),
    bs0w AS (
      SELECT user_id, ts, p, sq, cp_c FROM (
        SELECT user_id, ts, i AS p, sq, c AS cp_c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY sq DESC, i ASC) AS rn
        FROM bs0 WHERE sq > 0) WHERE rn = 1
    ),
    bs1cand AS (
      SELECT r.user_id, r.ts, r.i AS gpos, 0 AS seg,
             (CAST(r.i * (w.p - r.i) AS DOUBLE) / w.p)
               * (CAST(r.c AS DOUBLE) / r.i
                  - CAST(w.cp_c - r.c AS DOUBLE) / (w.p - r.i))
               * (CAST(r.c AS DOUBLE) / r.i
                  - CAST(w.cp_c - r.c AS DOUBLE) / (w.p - r.i)) AS sq
      FROM cpc r JOIN bs0w w USING (user_id)
      WHERE r.i >= 4 AND w.p - r.i >= 4
      UNION ALL
      SELECT r.user_id, r.ts, r.i, 1,
             (CAST((r.i - w.p) * (r.n - r.i) AS DOUBLE) / (r.n - w.p))
               * (CAST(r.c - w.cp_c AS DOUBLE) / (r.i - w.p)
                  - CAST(r.t - r.c AS DOUBLE) / (r.n - r.i))
               * (CAST(r.c - w.cp_c AS DOUBLE) / (r.i - w.p)
                  - CAST(r.t - r.c AS DOUBLE) / (r.n - r.i))
      FROM cpc r JOIN bs0w w USING (user_id)
      WHERE r.i - w.p >= 4 AND r.n - r.i >= 4
    ),
    bs1seg AS (
      SELECT user_id, ts, gpos, sq FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, seg
                                     ORDER BY sq DESC, gpos ASC) AS rn
        FROM bs1cand WHERE sq > 0) WHERE rn = 1
    ),
    bs1w AS (
      SELECT user_id, ts, gpos, sq FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY sq DESC, gpos ASC) AS kr
        FROM bs1seg) WHERE kr = 1
    )
    SELECT 'tumble' AS op,
           CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type AS key, count(*) AS n, round(sum(value), 4) AS total
    FROM events WHERE ts IS NOT NULL GROUP BY 2, 3
    UNION ALL
    SELECT 'slide', window_start, NULL, n, total FROM slide
    UNION ALL
    SELECT 'late', NULL, event_type, count(*), NULL
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 5 DAY FROM events)
    GROUP BY 3
    UNION ALL
    SELECT 'funnel', CAST(floor(epoch(sts)) AS BIGINT),
           CAST(user_id AS VARCHAR), step, NULL
    FROM fsteps
    UNION ALL
    SELECT 'funnel_sum', s.step, NULL,
           CASE s.step WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END,
           round(CASE WHEN n1 > 0 THEN
                 CAST(CASE s.step WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END
                      AS DOUBLE) / n1 ELSE 0.0 END, 6)
    FROM fcounts CROSS JOIN (SELECT unnest([1, 2, 3]) AS step) s
    UNION ALL
    SELECT 'wfunnel', CAST(floor(epoch(anchor)) AS BIGINT),
           CAST(user_id AS VARCHAR), steps, NULL
    FROM wf
    UNION ALL
    SELECT 'cohort', CAST(floor(epoch(a.cohort)) AS BIGINT),
           CAST(a.pn AS VARCHAR), a.n_active,
           round(CAST(a.n_active AS DOUBLE) / s.sz, 6)
    FROM cagg a JOIN csizes s USING (cohort)
    UNION ALL
    SELECT 'latency', step, 'from_prev', n_users, mean_prev FROM lat
    UNION ALL
    SELECT 'latency', step, 'from_start', n_users, mean_start FROM lat
    UNION ALL
    SELECT 'paths', NULL, path, n, NULL FROM topp
    UNION ALL
    SELECT 'attr', NULL, model || '>' || touch, n, share FROM att
    UNION ALL
    SELECT 'chgpt', CAST(floor(epoch(ts)) AS BIGINT),
           CAST(user_id AS VARCHAR), i, round(sq / 1000000000000.0, 4)
    FROM cpbest WHERE rn = 1
    UNION ALL
    SELECT 'chgpt2', CAST(floor(epoch(ts)) AS BIGINT),
           CAST(user_id AS VARCHAR) || '#0', p,
           round(sq / 1000000000000.0, 4)
    FROM bs0w
    UNION ALL
    SELECT 'chgpt2', CAST(floor(epoch(ts)) AS BIGINT),
           CAST(user_id AS VARCHAR) || '#1', gpos,
           round(sq / 1000000000000.0, 4)
    FROM bs1w
    UNION ALL
    SELECT 'trans', NULL, from_type || '>' || to_type, n,
           round(CAST(n AS DOUBLE)
                 / (sum(n) OVER (PARTITION BY from_type)), 6)
    FROM (
      SELECT from_type, to_type, count(*) AS n
      FROM (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL
      ) t WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    ) tr
"""


@query("q_stream_windows", oracle=_STREAM_WINDOWS_ORACLE)
def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window + behavioral-sequence semantics over events as one
    tagged union (window branches are batch twins of Structured
    Streaming queries — the real readStream paths run in
    tests/test_streaming.py; the behavioral branches put the round-4
    funnel family under the hash-exact gate):

    * ``tumble`` — 10-minute tumbling windows per event type
      (``groupBy(window(ts, '10 minutes'), type)``);
    * ``slide``  — 30-minute windows sliding every 10 minutes: each
      event lands in 3 windows; the oracle reproduces Spark's
      epoch-aligned starts with an explicit offset unnest;
    * ``late``   — watermark semantics: drop rows older than
      (max event time − 5 days) — what ``withWatermark('ts', '5 days')``
      retains at end-of-stream; the 1-row cutoff broadcasts (the
      correct scalar-subquery shape, not a real cross join);
    * ``funnel`` — operators/funnel.py::funnel: fixed-anchor
      view→click→purchase within 2 days of each user's FIRST view;
      one row per (user, completed step) carrying THAT step's
      timestamp, so every per-step value is hash-checked;
    * ``funnel_sum`` — funnel_summary over the same per-user result
      (n_users + conversion_from_start per step);
    * ``wfunnel`` — funnel_sliding (ClickHouse windowFunnel): every
      view retried as an anchor; per user the max level and LATEST
      anchor reaching it.  The oracle replays the greedy-earliest
      chain per anchor (exact: earliest-feasible maximizes slack);
    * ``cohort`` — cohort_retention, weekly cohorts, 8 periods:
      (cohort epoch, period_n, n_active, retention);
    * ``trans`` — event_transitions: the per-user next-event Markov
      matrix (flow analysis), key = "from>to", n = pair count,
      total = row-normalized transition probability;
    * ``latency`` — funnel_latency over the same per-user funnel:
      per step, users completing it and the mean seconds from the
      previous step / from the anchor (two rows per step; the
      percentile_approx sketch columns stay pytest-side — sketches
      are engine-specific);
    * ``paths`` — event_paths: top-20 3-step paths, ties broken on
      the path string in both engines;
    * ``attr`` — attribution under all five credit models
      (first/last single-touch, linear / position / time-decay
      multi-touch; key = "model>touch", n = credited rows, total =
      within-model share of 4dp-rounded credit);
    * ``chgpt`` — operators/tseries.py::grouped_changepoint: per-user
      AMOC changepoint in the mean of ``value`` (CUSUM mean-shift
      statistic over exact-integer quantized prefix sums, so the
      argmax is bit-deterministic and hash-exact vs the DuckDB
      replay); window_start = the boundary row's epoch second, n =
      the 1-based left-segment size, total = the 4dp SSE-reduction
      statistic;
    * ``chgpt2`` — operators/tseries.py::changepoints_binseg:
      budgeted parallel binary segmentation (budget=2, min_seg=4) on
      the same per-user series; the oracle unrolls the two rounds
      over the same exact-integer prefix sums and mirrors the
      (stat DESC, pos ASC) per-round acceptance; key =
      ``user_id#iter``, n = the 1-based GLOBAL split position."""
    from cosmap_spark.operators.funnel import (
        attribution,
        cohort_retention,
        event_paths,
        event_transitions,
        funnel,
        funnel_latency,
        funnel_sliding,
        funnel_summary,
    )

    ev = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]

    def shape(df: DataFrame, op: str, start, key, n_col, total) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            (start if start is not None else F.lit(None)).cast("long").alias("window_start"),
            (key if key is not None else F.lit(None)).cast("string").alias("key"),
            n_col.cast("long").alias("n"),
            (total if total is not None else F.lit(None)).cast("double").alias("total"),
        )

    tumble = shape(
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")),
        "tumble", F.unix_timestamp(F.col("w.start")), F.col("event_type"),
        F.col("n"), F.col("total"),
    )
    slide = shape(
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")),
        "slide", F.unix_timestamp(F.col("w.start")), None, F.col("n"), F.col("total"),
    )
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 5 DAY")).alias("cut"))
    late = shape(
        ev.crossJoin(F.broadcast(cutoff))
        .where(F.col("ts") >= F.col("cut"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n")),
        "late", None, F.col("event_type"), F.col("n"), None,
    )
    # Round 10 (optimization): the expensive branch CONSTRUCTIONS run
    # on a thread pool (guide §2.6 — overlap independent driver work).
    # Round 11 settlement (the r10 verdict's perf-weak flag): KEPT —
    # the interleaved cross-tree A/B vs the sequential shape (SCALE.md
    # round 11) reproduced a ≥1.3× gain on both raw and calibration-
    # adjusted medians (thread/seq 0.77 raw / 0.72 cal-adj over 3
    # pairs), consistent with the r10 same-session A/B; this is the
    # one overlap site where executor-side jobs (binseg's per-round
    # eager checkpoints) genuinely run under other branches' py4j
    # construction.
    # Profiling the assembly: changepoints_binseg alone is ~1.8 s of
    # per-round eager localCheckpoint jobs and the funnel/attribution/
    # changepoint constructions another ~1.3 s of serial py4j plan
    # building — ~5.5 s build vs ~2.4 s execute for the whole query.
    # Every builder below is independent (binseg's jobs run on executor
    # threads while the others' py4j calls proceed), and each produces
    # the IDENTICAL lazy plan the sequential assembly produced, so the
    # union — and the hash-checked result — is unchanged.
    from concurrent.futures import ThreadPoolExecutor

    from cosmap_spark.operators.tseries import (
        changepoints_binseg,
        grouped_changepoint,
    )

    def _fu_branches():
        fu = funnel(ev, steps, horizon="2 days")
        fsteps = (
            fu.select(
                "user_id",
                F.posexplode(F.array("ts_1", "ts_2", "ts_3"))
                .alias("i", "__sts"),
            )
            .where(F.col("__sts").isNotNull())
        )
        funnel_rows = shape(
            fsteps, "funnel", F.unix_timestamp("__sts"), F.col("user_id"),
            F.col("i") + 1, None,
        )
        fsum = shape(
            funnel_summary(fu, len(steps)), "funnel_sum", F.col("step"),
            None, F.col("n_users"), F.col("conversion_from_start"),
        )
        lat = funnel_latency(fu, len(steps), quantiles=())
        lat_prev = shape(
            lat, "latency", F.col("step"), F.lit("from_prev"),
            F.col("n_users"), F.col("mean_from_prev"),
        )
        lat_start = shape(
            lat, "latency", F.col("step"), F.lit("from_start"),
            F.col("n_users"), F.col("mean_from_start"),
        )
        return funnel_rows, fsum, lat_prev, lat_start

    def _wf():
        return shape(
            funnel_sliding(ev, steps, horizon="2 days"), "wfunnel",
            F.unix_timestamp("anchor_ts"), F.col("user_id"),
            F.col("steps_completed"), None,
        )

    def _att():
        return shape(
            attribution(
                ev,
                models=("first", "last", "linear", "position",
                        "time_decay"),
            ),
            "attr", None,
            F.concat_ws(">", "model", "touch"), F.col("n"),
            F.col("share"),
        )

    def _chg():
        return shape(
            grouped_changepoint(
                ev, ["user_id"], order_cols=["ts", "event_id"],
                val_col="value", min_len=8,
            ),
            "chgpt", F.unix_timestamp("ts"), F.col("user_id"),
            F.col("cp_pos"), F.round(F.col("stat"), 4),
        )

    def _chg2():
        return shape(
            changepoints_binseg(
                ev, ["user_id"], order_cols=["ts", "event_id"],
                val_col="value", max_changepoints=2, min_seg=4,
            ),
            "chgpt2", F.unix_timestamp("ts"),
            F.concat_ws("#", F.col("user_id").cast("string"),
                        F.col("iter").cast("string")),
            F.col("cp_pos"), F.round(F.col("stat"), 4),
        )

    with ThreadPoolExecutor(max_workers=5) as ex:
        f_chg2 = ex.submit(_chg2)  # first in: the long pole
        f_fu = ex.submit(_fu_branches)
        f_att = ex.submit(_att)
        f_chg = ex.submit(_chg)
        f_wf = ex.submit(_wf)
        # cheap lazy branches stay on the calling thread, overlapping
        # the pool work
        coh = shape(
            cohort_retention(ev, period="week", max_periods=8), "cohort",
            F.unix_timestamp("cohort"), F.col("period_n"),
            F.col("n_active"), F.col("retention"),
        )
        trans = shape(
            event_transitions(ev), "trans", None,
            F.concat_ws(">", "from_type", "to_type"), F.col("n"),
            F.col("p"),
        )
        pth = shape(
            event_paths(ev, k=3, top_n=20), "paths", None, F.col("path"),
            F.col("n"), None,
        )
        funnel_rows, fsum, lat_prev, lat_start = f_fu.result()
        wf, att, chg, chg2 = (
            f_wf.result(), f_att.result(), f_chg.result(), f_chg2.result()
        )
    return (
        tumble.unionByName(slide).unionByName(late)
        .unionByName(funnel_rows).unionByName(fsum)
        .unionByName(wf).unionByName(coh).unionByName(trans)
        .unionByName(lat_prev).unionByName(lat_start).unionByName(pth)
        .unionByName(att).unionByName(chg).unionByName(chg2)
    )


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WHERE ts IS NOT NULL  -- session_window drops null ts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             -- same (ts, event_id) total order as the flagging window:
             -- ts alone leaves same-ts session assignment to sort luck
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user
    (streaming twin: ``session_window`` + watermark).  A gap of exactly
    30 min closes the session in Spark (window end = last_ts + gap,
    half-open), hence the ``>=`` in the oracle's sessionization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )



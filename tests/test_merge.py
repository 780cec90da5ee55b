"""merge_upsert / scd2_apply: DuckDB differentials + plan shape.

The oracle expresses MERGE semantics in plain SQL (anti-join + union,
and the SCD-2 close/insert rules) so every behavioral claim in
operators/merge.py is checked against an independent engine, plus a
randomized differential and plan assertions that the snapshot side
never shuffles (broadcast change batch)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.merge import latest_per_key, merge_upsert, scd2_apply


def _sorted_rows(df, cols):
    return sorted([tuple(r[c] for c in cols) for r in df.collect()])


@pytest.fixture()
def snapshot(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", i * 10) for i in range(1, 9)],
        "id long, name string, score long",
    )


def test_merge_upsert_update_insert_delete(spark, snapshot):
    changes = spark.createDataFrame(
        [
            (2, "name2b", 222, False),   # update
            (5, "ignored", 0, True),     # delete
            (20, "name20", 200, False),  # insert
        ],
        "id long, name string, score long, deleted boolean",
    )
    out = merge_upsert(snapshot, changes, ["id"], delete_col="deleted")
    got = _sorted_rows(out, ["id", "name", "score"])

    con = duckdb.connect()
    con.register("t", snapshot.toPandas())
    con.register("c", changes.toPandas())
    want = sorted(
        con.execute(
            """
            SELECT id, name, score FROM t WHERE id NOT IN (SELECT id FROM c)
            UNION ALL
            SELECT id, name, score FROM c WHERE NOT deleted
            """
        ).fetchall()
    )
    assert got == want
    assert out.columns == snapshot.columns  # delete_col dropped


def test_merge_upsert_seq_picks_latest(spark, snapshot):
    changes = spark.createDataFrame(
        [(3, "old", 1, 10), (3, "new", 2, 20), (4, "only", 9, 5)],
        "id long, name string, score long, seq long",
    )
    out = merge_upsert(snapshot, changes, ["id"], seq_col="seq")
    rows = {r["id"]: (r["name"], r["score"]) for r in out.collect()}
    assert rows[3] == ("new", 2)
    assert rows[4] == ("only", 9)
    assert out.count() == snapshot.count()  # pure updates: cardinality kept


def test_merge_upsert_duplicate_keys_raise(spark, snapshot):
    changes = spark.createDataFrame(
        [(3, "a", 1), (3, "b", 2)], "id long, name string, score long"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(snapshot, changes, ["id"])


def test_merge_upsert_idempotent(spark, snapshot):
    changes = spark.createDataFrame(
        [(1, "x", 0), (30, "y", 3)], "id long, name string, score long"
    )
    once = merge_upsert(snapshot, changes, ["id"])
    twice = merge_upsert(once, changes, ["id"])
    assert _sorted_rows(once, once.columns) == _sorted_rows(twice, twice.columns)


def test_merge_upsert_plan_broadcasts_changes(spark, snapshot):
    """AQE must broadcast the (small) distinct change-key set at
    runtime so the snapshot side reaches the anti-join without a
    shuffle (local relations carry no stats, so this is a runtime
    re-plan — assert the FINAL adaptive plan after execution)."""
    changes = spark.createDataFrame(
        [(1, "x", 0)], "id long, name string, score long"
    )
    out = merge_upsert(snapshot, changes, ["id"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_latest_per_key_deterministic_ties(spark):
    rows = [(1, "a", 7), (1, "b", 7), (1, "c", 7)]
    df = spark.createDataFrame(rows, "id long, v string, seq long")
    winner = {r["v"] for r in latest_per_key(df, ["id"], seq_col="seq").collect()}
    again = {r["v"] for r in latest_per_key(
        df.repartition(5), ["id"], seq_col="seq").collect()}
    assert winner == again and len(winner) == 1


@pytest.fixture()
def dim(spark):
    # key 1: stable history (one closed + one open version)
    # key 2: open version that the update batch changes
    # key 3: open version the batch re-sends unchanged (no-op)
    return spark.createDataFrame(
        [
            (1, "alice", "NY", 100, 200, False),
            (1, "alice", "SF", 200, None, True),
            (2, "bob", "LA", 150, None, True),
            (3, "carol", "TX", 120, None, True),
        ],
        "id long, name string, city string, valid_from long, valid_to long, is_current boolean",
    )


def test_scd2_close_insert_noop(spark, dim):
    updates = spark.createDataFrame(
        [
            (2, "bob", "SEA", 400),    # changed → close + insert
            (3, "carol", "TX", 410),   # unchanged → no-op
            (9, "dave", "DC", 420),    # brand new key → insert
        ],
        "id long, name string, city string, ts long",
    )
    out = scd2_apply(dim, updates, ["id"], ts_col="ts")
    rows = _sorted_rows(out, ["id", "city", "valid_from", "valid_to", "is_current"])

    con = duckdb.connect()
    con.register("d", dim.toPandas())
    con.register("u", updates.toPandas())
    want = sorted(
        con.execute(
            """
            WITH latest AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts DESC) rn
                FROM u) WHERE rn = 1),
            existing AS (
              SELECT d.id, d.city,
                     d.valid_from,
                     CASE WHEN d.is_current AND l.id IS NOT NULL
                               AND (d.name IS DISTINCT FROM l.name
                                    OR d.city IS DISTINCT FROM l.city)
                          THEN l.ts ELSE d.valid_to END AS valid_to,
                     CASE WHEN d.is_current AND l.id IS NOT NULL
                               AND (d.name IS DISTINCT FROM l.name
                                    OR d.city IS DISTINCT FROM l.city)
                          THEN FALSE ELSE d.is_current END AS is_current
              FROM d LEFT JOIN latest l USING (id)),
            inserts AS (
              SELECT l.id, l.city, l.ts AS valid_from,
                     NULL::BIGINT AS valid_to, TRUE AS is_current
              FROM latest l LEFT JOIN (SELECT * FROM d WHERE is_current) c USING (id)
              WHERE c.id IS NULL
                 OR (c.name IS DISTINCT FROM l.name
                     OR c.city IS DISTINCT FROM l.city))
            SELECT * FROM existing UNION ALL SELECT * FROM inserts
            """
        ).fetchall()
    )
    assert rows == want
    # spot-check semantics directly
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["id"], []).append(r)
    assert len(by_key[2]) == 2
    closed2 = [r for r in by_key[2] if not r["is_current"]][0]
    assert closed2["valid_to"] == 400 and closed2["city"] == "LA"
    open2 = [r for r in by_key[2] if r["is_current"]][0]
    assert open2["city"] == "SEA" and open2["valid_from"] == 400
    assert len(by_key[3]) == 1 and by_key[3][0]["is_current"]
    assert len(by_key[9]) == 1 and by_key[9][0]["city"] == "DC"


def test_scd2_idempotent_reapply(spark, dim):
    updates = spark.createDataFrame(
        [(2, "bob", "SEA", 400)], "id long, name string, city string, ts long"
    )
    once = scd2_apply(dim, updates, ["id"], ts_col="ts")
    twice = scd2_apply(once, updates, ["id"], ts_col="ts")
    assert _sorted_rows(once, once.columns) == _sorted_rows(twice, twice.columns)


def test_scd2_null_tracked_values(spark):
    """NULL attribute values must compare null-safely: NULL→NULL is a
    no-op, NULL→value and value→NULL are changes."""
    dim = spark.createDataFrame(
        [(1, None, 10, None, True), (2, "x", 10, None, True)],
        "id long, attr string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, None, 50), (2, None, 60)], "id long, attr string, ts long"
    )
    out = scd2_apply(dim, updates, ["id"], ts_col="ts",
                     tracked=["attr"]).collect()
    k1 = [r for r in out if r["id"] == 1]
    k2 = sorted([r for r in out if r["id"] == 2], key=lambda r: r["valid_from"])
    assert len(k1) == 1 and k1[0]["is_current"]           # NULL == NULL: no-op
    assert len(k2) == 2 and not k2[0]["is_current"] and k2[0]["valid_to"] == 60
    assert k2[1]["attr"] is None and k2[1]["is_current"]  # value → NULL: change


def test_merge_randomized_differential(spark):
    """Random snapshot + random CDC batch vs the DuckDB anti-join+union
    oracle, across several seeds and key overlap regimes."""
    import random

    for seed in (7, 8, 9):
        rng = random.Random(seed)
        snap = [(i, rng.randrange(1000)) for i in range(50)]
        ch = [
            (rng.randrange(80), rng.randrange(1000), rng.random() < 0.2, s)
            for s in range(30)
        ]
        t = spark.createDataFrame(snap, "id long, v long")
        c = spark.createDataFrame(ch, "id long, v long, deleted boolean, seq long")
        got = _sorted_rows(
            merge_upsert(t, c, ["id"], seq_col="seq", delete_col="deleted"),
            ["id", "v"],
        )
        con = duckdb.connect()
        con.register("t", t.toPandas())
        con.register("c", c.toPandas())
        want = sorted(
            con.execute(
                """
                WITH latest AS (
                  SELECT * FROM (
                    SELECT *, row_number() OVER (
                      PARTITION BY id ORDER BY seq DESC,
                      hash(v, deleted) ASC) rn
                    FROM c) WHERE rn = 1)
                SELECT id, v FROM t WHERE id NOT IN (SELECT id FROM latest)
                UNION ALL
                SELECT id, v FROM latest WHERE NOT deleted
                """
            ).fetchall()
        )
        assert got == want, f"seed {seed}"


def test_scd2_late_update_ignored(spark):
    """An update whose ts predates the open version's valid_from must
    be dropped, not written as an inverted interval."""
    dim = spark.createDataFrame(
        [(1, "new", 200, None, True), (1, "old", 100, 200, False)],
        "id long, attr string, valid_from long, valid_to long, is_current boolean",
    )
    late = spark.createDataFrame(
        [(1, "stale", 150)], "id long, attr string, ts long"
    )
    out = scd2_apply(dim, late, ["id"], ts_col="ts").collect()
    assert len(out) == 2  # nothing inserted
    cur = [r for r in out if r["is_current"]]
    assert len(cur) == 1 and cur[0]["attr"] == "new"
    assert cur[0]["valid_to"] is None  # not closed by the late row
    # and every interval stays non-inverted
    assert all(
        r["valid_to"] is None or r["valid_to"] >= r["valid_from"] for r in out
    )
    # an in-order update with the same content still applies
    ok = spark.createDataFrame(
        [(1, "newer", 300)], "id long, attr string, ts long"
    )
    out2 = scd2_apply(dim, ok, ["id"], ts_col="ts").collect()
    assert sum(r["is_current"] for r in out2) == 1
    assert [r["attr"] for r in out2 if r["is_current"]] == ["newer"]


def test_merge_upsert_assume_unique_skips_validation(spark, snapshot):
    """assume_unique must not run the eager duplicate probe; with a
    genuinely duplicated batch both rows survive (the documented sink
    contract), instead of raising."""
    changes = spark.createDataFrame(
        [(3, "a", 1), (3, "b", 2)], "id long, name string, score long"
    )
    out = merge_upsert(snapshot, changes, ["id"], assume_unique=True)
    assert out.filter("id = 3").count() == 2


def test_merge_upsert_broadcast_hint_in_initial_plan(spark, snapshot):
    """broadcast_keys must put the hint in the plan BEFORE execution
    (local relations carry no stats, so without the hint the initial
    plan is a sort-merge join — the 100 TB shuffle the contract
    forbids)."""
    changes = spark.createDataFrame(
        [(1, "x", 0)], "id long, name string, score long"
    )
    plan = merge_upsert(snapshot, changes, ["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_chain_invariants_property(spark):
    """Hypothesis: applying random update batches in ts order keeps,
    per key — at most one current row, the current row open
    (valid_to NULL), every closed interval non-inverted, consecutive
    versions chained (next valid_from == previous valid_to), and the
    final current value equal to the last distinct update applied."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),   # key
                st.sampled_from(["a", "b", "c", None]),  # value
            ),
            min_size=1,
            max_size=7,
        )
    )
    def check(updates):
        dim = spark.createDataFrame(
            [],
            "id long, attr string, valid_from long, valid_to long, is_current boolean",
        )
        for i, batch in enumerate(updates):
            k, v = batch
            up = spark.createDataFrame(
                [(k, v, (i + 1) * 100)], "id long, attr string, ts long"
            )
            dim = scd2_apply(dim, up, ["id"], ts_col="ts",
                             tracked=["attr"]).localCheckpoint()
        rows = dim.collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r["id"], []).append(r)
        last_applied: dict = {}
        for k, v in updates:
            last_applied[k] = v
        for k, vers in by_key.items():
            cur = [r for r in vers if r["is_current"]]
            assert len(cur) == 1
            assert cur[0]["valid_to"] is None
            closed = sorted(
                (r for r in vers if not r["is_current"]),
                key=lambda r: r["valid_from"],
            )
            for r in closed:
                assert r["valid_to"] is not None
                assert r["valid_to"] >= r["valid_from"]
            chain = closed + cur
            for prev, nxt in zip(chain, chain[1:]):
                assert nxt["valid_from"] == prev["valid_to"]
            assert cur[0]["attr"] == last_applied[k]
        # keys never updated must not appear
        assert set(by_key) <= set(last_applied)

    check()


def test_snapshot_cdc_round_trip_and_minimality(spark):
    """The inverse law: merge_upsert(old, snapshot_cdc(old, new)) must
    reproduce `new` exactly, and the batch must be delta-sized
    (unchanged keys emit nothing), across random snapshot pairs."""
    import random

    from cosmap_spark.operators.merge import snapshot_cdc

    for seed in (3, 4):
        rng = random.Random(seed)
        old_rows = [(i, rng.randrange(5), f"v{rng.randrange(3)}")
                    for i in range(40)]
        # new: drop some keys, change some, add some
        new_rows = [
            (i, (v + 1) % 5 if rng.random() < 0.3 else v,
             s if rng.random() < 0.7 else "vX")
            for i, v, s in old_rows if rng.random() < 0.8
        ] + [(100 + j, j, "fresh") for j in range(5)]
        old = spark.createDataFrame(old_rows, "id long, v long, s string")
        new = spark.createDataFrame(new_rows, "id long, v long, s string")

        cdc = snapshot_cdc(old, new, ["id"])
        applied = merge_upsert(old, cdc, ["id"], delete_col="deleted")
        assert _sorted_rows(applied, ["id", "v", "s"]) == \
            _sorted_rows(new, ["id", "v", "s"]), f"seed {seed}"

        # minimality: batch keys = (changed ∪ added ∪ removed) only
        old_m = {r[0]: r[1:] for r in old_rows}
        new_m = {r[0]: r[1:] for r in new_rows}
        want_keys = (
            {k for k in new_m if k not in old_m}
            | {k for k in old_m if k not in new_m}
            | {k for k in new_m if k in old_m and new_m[k] != old_m[k]}
        )
        got = {(r["id"], r["deleted"]) for r in cdc.collect()}
        assert {k for k, _ in got} == want_keys
        assert {k for k, d in got if d} == \
            {k for k in old_m if k not in new_m}


def test_snapshot_cdc_compare_cols_validation(spark):
    from cosmap_spark.operators.merge import snapshot_cdc

    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(1, "a", 2)], "id long, v string, extra long")
    with pytest.raises(ValueError, match="absent from old"):
        snapshot_cdc(old, new, ["id"], compare_cols=["extra"])
    # default compare_cols = new's non-keys, so 'extra' also trips it
    with pytest.raises(ValueError, match="absent from old"):
        snapshot_cdc(old, new, ["id"])
    # restricting to the shared column works
    out = snapshot_cdc(old, new, ["id"], compare_cols=["v"]).collect()
    assert out == []  # v unchanged -> empty batch


def test_scd2_plan_no_dim_shuffle(spark, dim):
    """The round-6 restructure: every join in the scd2 plan is
    broadcast (the dimension is never on a shuffled-join side), and
    the only second pass over the dimension is key-column-pruned —
    at 100 TB the history table streams through once with full
    columns, once with just the keys."""
    updates = spark.createDataFrame(
        [(2, "bob", "SEA", 400), (9, "dave", "DC", 420)],
        "id long, name string, city string, ts long",
    )
    out = scd2_apply(dim, updates, ["id"], ts_col="ts")
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_scd2_all_closed_key_reactivates(spark):
    """A key whose versions are ALL closed (no current row) gets a new
    open version from an update — the inserts_new path after the
    round-6 single-broadcast restructure."""
    dim = spark.createDataFrame(
        [(1, "old", 10, 20, False)],
        "id long, attr string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "back", 30)], "id long, attr string, ts long"
    )
    out = scd2_apply(dim, updates, ["id"], ts_col="ts").collect()
    assert len(out) == 2
    opened = [r for r in out if r["is_current"]]
    assert len(opened) == 1 and opened[0]["attr"] == "back"
    assert opened[0]["valid_from"] == 30 and opened[0]["valid_to"] is None


def test_snapshot_cdc_nan_and_negzero_payloads(spark):
    """The hardened hash contract: NaN == NaN and -0.0 == 0.0 are
    NO-ops (value equality, no JSON false-diffs); NaN → finite is a
    change; a column-shifted NULL ((a,NULL) vs (NULL,a)) IS a change
    (positional anchoring in the hash)."""
    from cosmap_spark.operators.merge import snapshot_cdc

    nan = float("nan")
    old = spark.createDataFrame(
        [(1, nan, "p"), (2, -0.0, "q"), (3, nan, "r"), (5, 1.5, "t")],
        "id long, a double, b string",
    )
    new = spark.createDataFrame(
        [(1, nan, "p"),      # NaN == NaN → unchanged
         (2, 0.0, "q"),      # -0.0 == 0.0 → unchanged
         (3, 1.0, "r"),      # NaN → 1.0 → changed
         (5, 1.5, "t")],     # unchanged
        "id long, a double, b string",
    )
    batch = snapshot_cdc(old, new, ["id"])
    got = {r["id"]: r["deleted"] for r in batch.collect()}
    assert got == {3: False}

    # positional NULL shift must register as a change
    o2 = spark.createDataFrame([(1, "a", None)], "id long, x string, y string")
    n2 = spark.createDataFrame([(1, None, "a")], "id long, x string, y string")
    assert snapshot_cdc(o2, n2, ["id"]).count() == 1

    # round-trip law holds through NaN payloads
    from cosmap_spark.operators.merge import merge_upsert

    rt = merge_upsert(old, batch, ["id"], delete_col="deleted",
                      assume_unique=True)
    import math

    want = {(r["id"], "nan" if r["a"] is not None and math.isnan(r["a"])
             else r["a"], r["b"]) for r in new.collect()}
    gotrt = {(r["id"], "nan" if r["a"] is not None and math.isnan(r["a"])
              else r["a"], r["b"]) for r in rt.collect()}
    assert gotrt == want


def test_snapshot_cdc_rejects_map_compare_cols(spark):
    from cosmap_spark.operators.merge import snapshot_cdc

    df = spark.createDataFrame(
        [(1, {"k": 1})], "id long, m map<string,int>"
    )
    with pytest.raises(ValueError, match="map"):
        snapshot_cdc(df, df, ["id"])


def test_snapshot_cdc_null_shifted_int_payloads(spark):
    """Regression (round-6 review #2): with bare positional anchors,
    INT (1, NULL) and (NULL, 1) hash the identical token stream
    [0, 1, 1] (the value collides with the next slot's anchor), so the
    change was silently dropped.  The explicit isnull flag per slot
    must detect it."""
    from cosmap_spark.operators.merge import merge_upsert, snapshot_cdc

    old = spark.createDataFrame(
        [(10, 1, None), (20, 5, 6)], "k long, a int, b int"
    )
    new = spark.createDataFrame(
        [(10, None, 1), (20, 5, 6)], "k long, a int, b int"
    )
    cdc = snapshot_cdc(old, new, ["k"])
    ups = cdc.collect()
    assert len(ups) == 1 and ups[0]["k"] == 10, ups
    # round-trip law holds on exactly this input class
    merged = merge_upsert(old, cdc, ["k"], delete_col="deleted")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_latest_per_key_null_slot_tie_break(spark):
    """Seq-tied rows with payloads ('x', NULL) and (NULL, 'x') used to
    hash identically (bare xxhash64 skips null slots) leaving the CDC
    winner to partition arrival order; the anchored hash makes reruns
    and layouts pick one deterministic winner."""
    from cosmap_spark.operators.merge import latest_per_key

    rows = [(1, 5, "x", None), (1, 5, None, "x")]
    df = spark.createDataFrame(rows, "k long, seq long, a string, b string")
    winners = set()
    for layout in (df.repartition(1), df.repartition(4), df.coalesce(1)):
        got = latest_per_key(layout, ["k"], seq_col="seq").collect()
        assert len(got) == 1
        winners.add((got[0]["a"], got[0]["b"]))
    assert len(winners) == 1, winners


def test_scd2_tracked_empty_list_refused(spark):
    """An explicit tracked=[] must not silently become the
    track-everything default (the falsy-`or` bug class) — it is
    refused loudly because a zero-attribute SCD-2 is structurally
    meaningless here."""
    import datetime as dt

    import pytest

    from cosmap_spark.operators.merge import scd2_apply

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(1, "old", t0, None, True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "new", dt.datetime(2024, 2, 1))], "k long, v string, ts timestamp"
    )
    with pytest.raises(ValueError, match="tracked"):
        scd2_apply(dim, upd, ["k"], tracked=[], ts_col="ts")


def test_change_feed_apply_law_and_classification(spark):
    """merge.change_feed (the algebra under sinks/mor.mor_changes):
    one verdict per key — delete with pre-image, update pre/post pair,
    insert — and the apply law: dropping every touched key from the
    snapshot and unioning insert+update_postimage rows reproduces
    mor_reconcile(snapshot, deltas) exactly.  A tombstone of an absent
    key emits nothing; a tombstone-then-resurrect key nets to one
    update pair."""
    from cosmap_spark.operators.merge import change_feed, mor_reconcile

    snap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, v long"
    )
    deltas = spark.createDataFrame(
        [
            (1, 11, 1, False),   # update (overridden by epoch 2)
            (1, 12, 2, False),   # final update value
            (2, None, 1, True),  # delete
            (3, None, 1, True),  # tombstone...
            (3, 33, 2, False),   # ...then resurrect -> net update
            (5, 50, 2, False),   # insert
            (9, None, 2, True),  # delete of an absent key -> nothing
        ],
        "k long, v long, epoch long, __deleted boolean",
    )
    feed = change_feed(snap, deltas, ["k"], materialize=False)
    got = {(r["k"], r["_change_type"]): r["v"] for r in feed.collect()}
    assert got == {
        (1, "update_preimage"): 10,
        (1, "update_postimage"): 12,
        (2, "delete"): 20,
        (3, "update_preimage"): 30,
        (3, "update_postimage"): 33,
        (5, "insert"): 50,
    }

    touched = feed.where(
        F.col("_change_type").isin("delete", "update_postimage", "insert")
    ).select("k").distinct()
    applied = snap.join(F.broadcast(touched), ["k"], "left_anti") \
        .unionByName(
            feed.where(F.col("_change_type").isin(
                "update_postimage", "insert")).select("k", "v"))
    want = mor_reconcile(snap, deltas, ["k"])
    assert sorted((r["k"], r["v"]) for r in applied.collect()) == \
        sorted((r["k"], r["v"]) for r in want.collect())


def test_change_feed_refuses_colliding_snapshot_columns(spark):
    """A snapshot carrying the operator's control/output names would
    make the pre-image filter ambiguous (delete col) or duplicate an
    output column (change type) — refused loudly."""
    import pytest

    from cosmap_spark.operators.merge import change_feed

    deltas = spark.createDataFrame(
        [(1, 1, 1, False)], "k long, v long, epoch long, __deleted boolean"
    )
    for bad in ("__deleted", "_change_type", "epoch"):
        snap = spark.range(1).select(
            F.col("id").alias("k"), F.lit(0).alias(bad))
        with pytest.raises(ValueError, match="collide"):
            change_feed(snap, deltas, ["k"], materialize=False)


def test_apply_agg_delta_ivm_law(spark):
    """The incremental-view-maintenance law: folding change_feed's NET
    verdicts into agg_snapshot(v0) reproduces agg_snapshot over the
    reconciled post state — including a group-MOVING update (pre/post
    land in different groups), a group dying (count -> 0), a brand-new
    group, a NULL grouping value as a real group, and a sum going
    all-null (surfaces SQL NULL via the countnn witness)."""
    from cosmap_spark.operators.merge import (
        agg_snapshot, apply_agg_delta, change_feed, mor_reconcile,
    )

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", None),
         (5, None, 50), (6, "c", 60)],
        "k long, g string, v long",
    )
    deltas = spark.createDataFrame(
        [
            (2, "b", 21, 1, False),    # moves a -> b
            (3, None, 31, 1, False),   # moves b -> null group
            (6, None, None, 1, True),  # group c dies
            (7, "d", 70, 1, False),    # new group d
            (8, "a", None, 2, False),  # null value joins a
            (1, "a", None, 2, False),  # a's only non-null v removed
        ],
        "k long, g string, v long, epoch long, __deleted boolean",
    )
    spec = {"c": ("count", None), "nn": ("countnn", "v"),
            "s": ("sum", "v")}
    feed = change_feed(snap, deltas, ["k"], materialize=False)
    got = apply_agg_delta(
        agg_snapshot(snap, ["g"], spec), feed, ["g"], spec
    )
    want = agg_snapshot(
        mor_reconcile(snap, deltas, ["k"]), ["g"], spec
    )
    cols = ["g", "c", "nn", "s"]

    def rows_by_str(df):
        return sorted(
            [tuple(r[c] for c in cols) for r in df.collect()], key=str
        )

    assert rows_by_str(got) == rows_by_str(want)
    rows = {r["g"]: (r["c"], r["nn"], r["s"]) for r in got.collect()}
    assert "c" not in rows                       # died
    assert rows["a"][2] is None and rows["a"][0] == 2  # all-null sum
    assert rows["d"] == (1, 1, 70)               # fresh group
    assert None in rows                          # null group is real


def test_apply_agg_delta_chains_across_refreshes(spark):
    """apply_agg_delta's output is agg_snapshot-shaped, so refreshes
    chain: two incremental folds equal one direct aggregate of the
    final state."""
    from cosmap_spark.operators.merge import (
        agg_snapshot, apply_agg_delta, change_feed, mor_reconcile,
    )

    snap = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(12)], "k long, g int, v long"
    )
    d1 = spark.createDataFrame(
        [(0, 1, 5, 1, False), (3, None, None, 1, True)],
        "k long, g int, v long, epoch long, __deleted boolean",
    )
    d2 = spark.createDataFrame(
        [(0, 2, 7, 1, False), (20, 0, 200, 1, False)],
        "k long, g int, v long, epoch long, __deleted boolean",
    )
    spec = {"c": ("count", None), "nn": ("countnn", "v"),
            "s": ("sum", "v")}
    v1 = mor_reconcile(snap, d1, ["k"]).localCheckpoint()
    a1 = apply_agg_delta(
        agg_snapshot(snap, ["g"], spec),
        change_feed(snap, d1, ["k"], materialize=False), ["g"], spec,
    )
    a2 = apply_agg_delta(
        a1, change_feed(v1, d2, ["k"], materialize=False), ["g"], spec
    )
    want = agg_snapshot(mor_reconcile(v1, d2, ["k"]), ["g"], spec)
    cols = ["g", "c", "nn", "s"]
    assert _sorted_rows(a2, cols) == _sorted_rows(want, cols)


def test_apply_agg_delta_spec_validation(spark):
    """The spec guards: sum without its countnn witness, min/max,
    missing count liveness entry, aggregating a grouping column, and
    an unknown change type raising at EXECUTION (not silently
    dropped)."""
    from cosmap_spark.operators.merge import agg_snapshot, apply_agg_delta

    df = spark.createDataFrame([(1, "a", 2)], "k long, g string, v long")
    with pytest.raises(ValueError, match="countnn"):
        agg_snapshot(df, ["g"], {"c": ("count", None), "s": ("sum", "v")})
    with pytest.raises(ValueError, match="not self-maintainable"):
        agg_snapshot(df, ["g"], {"c": ("count", None), "m": ("min", "v")})
    with pytest.raises(StopIteration):
        # no ("count", None) liveness entry -> refused (surface the
        # first-found error: next() on an empty generator)
        apply_agg_delta(
            agg_snapshot(df, ["g"], {"nn": ("countnn", "v")}),
            df.withColumn("_change_type", F.lit("insert")),
            ["g"], {"nn": ("countnn", "v")},
        )
    with pytest.raises(ValueError, match="grouping column"):
        agg_snapshot(df, ["g"], {"c": ("count", None),
                                 "nn": ("countnn", "g")})
    # a LITERAL bogus type folds at planning (raises at build); a
    # column-valued one raises at the first action — both loud, never
    # silently dropped
    feed = df.withColumn("_change_type", F.lit("upsert"))
    with pytest.raises(Exception, match="unknown change type"):
        apply_agg_delta(
            agg_snapshot(df, ["g"], {"c": ("count", None)}),
            feed, ["g"], {"c": ("count", None)},
        ).collect()


def test_apply_agg_delta_double_apply_raises(spark):
    """Re-applying a feed that deletes rows drives a group count
    negative — caught at execution, because a silently wrong
    maintained view would diverge forever."""
    from cosmap_spark.operators.merge import (
        agg_snapshot, apply_agg_delta, change_feed,
    )

    snap = spark.createDataFrame([(1, "a", 1)], "k long, g string, v long")
    deltas = spark.createDataFrame(
        [(1, None, None, 1, True)],
        "k long, g string, v long, epoch long, __deleted boolean",
    )
    spec = {"c": ("count", None)}
    feed = change_feed(snap, deltas, ["k"], materialize=False) \
        .localCheckpoint()
    once = apply_agg_delta(agg_snapshot(snap, ["g"], spec), feed,
                           ["g"], spec)
    assert once.count() == 0
    twice = apply_agg_delta(once, feed, ["g"], spec)
    with pytest.raises(Exception, match="negative"):
        twice.collect()

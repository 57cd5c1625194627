"""Events surface tests — QueryRunner/LuceneQueryBuilder scenarios:
top-N paging, text match, group+fetch-last, minute histogram,
time-window-or-ongoing."""

import pytest

from pyspark.sql import functions as F

from opentsdb_aura_spark.operators.events import (
    group_count_last,
    minute_histogram,
    text_match,
    time_window_or_ongoing,
    top_n,
)

BASE = 1704067200


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # event_id, ts, end_ts, ongoing, kind, msg, value
        (1, BASE + 10, 0, False, "deploy", "rollout started", 1.0),
        (2, BASE + 70, 0, False, "deploy", "rollout finished OK", 2.0),
        (3, BASE + 70, 0, False, "alert", "cpu high", 3.0),  # ts tie with 2
        (4, BASE + 200, BASE + 900, True, "incident", "fire ongoing", 4.0),
        (5, BASE - 500, BASE + 20, False, "incident", "old but ends in range", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts long, end_ts long, ongoing boolean, kind string, msg string, value double"
    )


def test_top_n_ordering_and_paging(ev):
    top = [r["event_id"] for r in top_n(ev, 3).collect()]
    assert top == [4, 3, 2]  # ts desc, id desc tiebreak
    page2 = [r["event_id"] for r in top_n(ev, 2, offset=2).collect()]
    assert page2 == [2, 1]


def test_text_match_and_or(ev):
    hits = {r["event_id"] for r in ev.where(text_match(["kind", "msg"], ["rollout", "ok"], "AND")).collect()}
    assert hits == {2}
    hits = {r["event_id"] for r in ev.where(text_match(["kind", "msg"], ["alert", "fire"], "OR")).collect()}
    assert hits == {3, 4}


def test_text_match_whole_tokens_only(ev):
    """Lucene whitespace-analyzer parity: a query token matches only a
    whole whitespace-delimited token — 'roll' must not hit 'rollout'."""
    assert ev.where(text_match(["msg"], ["roll"])).count() == 0
    assert ev.where(text_match(["msg"], ["rollout"])).count() == 2


def test_time_window_or_ongoing(ev):
    got = {r["event_id"] for r in ev.where(time_window_or_ongoing(BASE, BASE + 100)).collect()}
    # 1,2,3 start in range; 5 ends in range; 4 is ongoing
    assert got == {1, 2, 3, 4, 5}
    got = {r["event_id"] for r in ev.where(time_window_or_ongoing(BASE + 1000, BASE + 2000)).collect()}
    assert got == {4}  # only the ongoing one


def test_group_count_last(ev):
    out = {r["kind"]: r for r in group_count_last(ev, "kind", value_cols=["msg"]).collect()}
    assert out["deploy"]["hits"] == 2
    assert out["deploy"]["last_msg"] == "rollout finished OK"
    assert out["alert"]["last_ts"] == BASE + 70


def test_minute_histogram(ev):
    hist = {r["minute_ts"]: r["n"] for r in minute_histogram(ev).collect()}
    assert hist[BASE] == 1  # event 1
    assert hist[BASE + 60] == 2  # events 2,3


def test_upsert_events(spark):
    from opentsdb_aura_spark.operators.events import upsert_events

    df = spark.createDataFrame(
        [(1, BASE, "v1", 1), (1, BASE + 50, "v2", 2), (2, BASE, "x", 3)],
        "event_id long, ts long, msg string, seq long",
    )
    out = {r["event_id"]: r for r in upsert_events(df, seq_col="seq").collect()}
    assert len(out) == 2
    assert out[1]["msg"] == "v2" and out[1]["ts"] == BASE + 50


def test_sessionize_gap_rule(spark):
    from opentsdb_aura_spark.operators.events import sessionize

    rows = [
        # user 1: two sessions split by a 2h gap
        (1, 1000, 1), (1, 1500, 2), (1, 1500 + 7200, 3), (1, 1500 + 7300, 4),
        # user 2: one event
        (2, 50, 5),
        # user 1: tied timestamps must stay in one session deterministically
        (1, 1500 + 7300, 6),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long")
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in sessionize(df, 1800, key_col="user_id").collect()
    }
    assert len(out) == 3
    s0 = out[(1, 0)]
    assert s0["session_start"] == 1000 and s0["session_end"] == 1500 and s0["n_events"] == 2
    s1 = out[(1, 1)]
    assert s1["session_start"] == 1500 + 7200 and s1["n_events"] == 3
    assert out[(2, 0)]["n_events"] == 1


def test_funnel_conversion(spark):
    from opentsdb_aura_spark.operators.events import funnel_conversion

    rows = [
        # user 1: signup@100 → purchase@150 (converts, 50s)
        (1, "signup", 100), (1, "purchase", 150),
        # user 2: signup@100, purchase@100000 (outside 1h window)
        (2, "signup", 100), (2, "purchase", 100_000),
        # user 3: purchase BEFORE signup only → no conversion
        (3, "purchase", 50), (3, "signup", 100),
        # user 4: two signups; purchase follows the SECOND within window
        (4, "signup", 0), (4, "signup", 5000), (4, "purchase", 5100),
        # user 5: purchase only → not in the funnel at all
        (5, "purchase", 10),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r["user_id"]: r for r in funnel_conversion(df, "signup", "purchase", 3600).collect()}
    assert set(out) == {1, 2, 3, 4}  # user 5 never did step one
    assert out[1]["converted"] and out[1]["seconds_to_convert"] == 50
    assert not out[2]["converted"] and out[2]["convert_ts"] is None
    assert not out[3]["converted"]
    # conversion measured against the signup it actually followed
    assert out[4]["converted"] and out[4]["first_from_ts"] == 0
    assert out[4]["convert_ts"] == 5100 and out[4]["seconds_to_convert"] == 100


def test_cohort_retention(spark):
    from opentsdb_aura_spark.operators.events import cohort_retention

    D = 86400
    rows = [
        # cohort day 0: users 1, 2; user 1 returns day 1 and 2, user 2 never
        (1, 10), (1, D + 5), (1, 2 * D + 5),
        (2, 20),
        # cohort day 1: user 3, returns day 2 (offset 1)
        (3, D + 50), (3, 2 * D + 50),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = {(r["cohort_ts"], r["day_offset"]): r for r in cohort_retention(df, D).collect()}
    c0 = out[(0, 0)]
    assert c0["n_active"] == 2 and c0["n_cohort"] == 2 and c0["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(0, 2)]["n_active"] == 1
    assert out[(D, 0)]["n_cohort"] == 1
    assert out[(D, 1)]["retention"] == 1.0


def test_sessionize_two_phase_equals_single_pass(spark):
    """The hot-key-bounded (block_seconds) path must produce EXACTLY the
    single-window result, including sessions that straddle many block
    boundaries and sessions whose silence gap spans a whole empty
    block."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for user in range(1, 6):
        ts = rng.randrange(0, 3600)
        for _ in range(400):
            # spacing mixes intra-session (≤ gap) and new-session jumps,
            # with some ties; blocks of 1h are crossed constantly
            r = rng.random()
            ts += 0 if r < 0.05 else rng.randrange(1, 1800) if r < 0.8 else rng.randrange(1801, 9000)
            eid += 1
            rows.append((user, ts, eid))
    # a session continuously spanning 5 blocks
    rows += [(9, 100 + i * 600, 10_000 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long")

    from opentsdb_aura_spark.operators.events import sessionize

    single = {
        (r["user_id"], r["session_idx"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, 1800, key_col="user_id").collect()
    }
    blocked = {
        (r["user_id"], r["session_idx"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, 1800, key_col="user_id", block_seconds=3600).collect()
    }
    assert single == blocked


def test_rolling_active_users_window_semantics(spark):
    """WAU windows: a user active on day d counts toward days
    [d, d+6] inside the range; pre-range activity still feeds the
    first days' trailing windows; exact and HLL paths agree on this
    corpus."""
    from opentsdb_aura_spark.operators.events import rolling_active_users

    B = 1704067200
    D = 86400
    rows = [
        # u1 active only 3 days BEFORE the range: counts toward days 0-3... no:
        # day -3 serves output days [-3, 3] -> clipped to [0, 3]
        (1, B - 3 * D + 10),
        # u2 active on day 0
        (2, B + 5),
        # u3 active on day 9 only
        (3, B + 9 * D + 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    got = {
        r["day_ts"]: r["active_users"]
        for r in rolling_active_users(ev, B, B + 14 * D, 7).collect()
    }
    for day in range(14):
        want = 0
        if day <= 3:
            want += 1  # u1 (active day -3 -> windows ending days -3..3)
        if day <= 6:
            want += 1  # u2 (day 0 -> windows 0..6)
        if 9 <= day <= 14:
            want += 1  # u3
        # zero-active days emit no row (sparse, like the SQL oracle's
        # inner join) — absent means 0
        assert got.get(B + day * D, 0) == want, (day, got.get(B + day * D), want)
    hll = {
        r["day_ts"]: r["active_users"]
        for r in rolling_active_users(ev, B, B + 14 * D, 7, hll=True).collect()
    }
    assert hll == got  # tiny cardinalities: sketch is exact


def test_rolling_active_users_rejects_partial_days(spark):
    """A partial final day would invert the fan-out clip (Spark's
    sequence steps backward when start > stop, leaking activity into
    earlier days) — the operator must reject instead."""
    import pytest

    from opentsdb_aura_spark.operators.events import rolling_active_users

    B = 1704067200
    ev = spark.createDataFrame([(1, B + 5)], "user_id long, ts long")
    for bad_end in (B, B - 86400, B + 86400 + 3600):
        with pytest.raises(ValueError):
            rolling_active_users(ev, B, bad_end, 7)


def test_funnel_equal_ts_from_does_not_shadow(spark):
    """A from-event sharing the to-event's timestamp must not shadow an
    earlier in-window from: signup@100, signup@200, purchase@200 is a
    conversion (100 -> 200); a lone equal-ts pair is NOT (strictly
    after required)."""
    from opentsdb_aura_spark.operators.events import funnel_conversion

    rows = [
        (1, "signup", 100), (1, "signup", 200), (1, "purchase", 200),
        (2, "signup", 300), (2, "purchase", 300),  # only equal-ts: no conversion
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r["user_id"]: r for r in funnel_conversion(df, "signup", "purchase", 150).collect()}
    assert out[1]["converted"] and out[1]["convert_ts"] == 200
    assert out[1]["seconds_to_convert"] == 100
    assert not out[2]["converted"]


def test_text_match_empty_inputs(spark):
    from pyspark.sql import functions as F

    from opentsdb_aura_spark.operators.events import text_match

    df = spark.createDataFrame([("hello world",)], "title string")
    assert df.where(text_match(["title"], [])).count() == 1  # match-all
    assert df.where(text_match([], ["cart"])).count() == 0  # nothing to search


def test_parent_link_expr_levels_and_closure(spark):
    """The closed-form link rule (Event.java:63-79 surface): roots
    (%100) have no parent, mids (%10) link to their century root,
    leaves to their decade mid — and over a dense id range every
    derived parent id names an existing event (referential closure,
    the property the queries' joins rely on)."""
    from opentsdb_aura_spark.operators.events import parent_link_expr

    df = spark.range(0, 250).select(F.col("id").alias("event_id"))
    out = {r["event_id"]: r["parent_id"] for r in
           df.select("event_id", parent_link_expr().alias("parent_id")).collect()}
    assert out[0] is None and out[100] is None and out[200] is None  # roots
    assert out[10] == 0 and out[110] == 100 and out[240] == 200      # mids -> century root
    assert out[1] == 0 and out[11] == 10 and out[239] == 230         # leaves -> decade mid
    ids = set(out)
    assert all(p in ids for p in out.values() if p is not None)

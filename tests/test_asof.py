"""Backward as-of join: hand-computed matches, tolerance, ties,
and the no-shuffle-explosion plan shape."""

from conftest import BASE


def _mk(spark):
    left = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 5, 0.5), ("b", 10, 9.0)],
        "k string, ts long, value double",
    )
    right = spark.createDataFrame(
        [("a", 7, "x"), ("a", 10, "y"), ("a", 15, "z"), ("c", 1, "q")],
        "k string, ts long, state string",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    from opentsdb_aura_spark.operators.asof import asof_join

    left, right = _mk(spark)
    res = asof_join(left, right, on=["k"])
    got = {(r["k"], r["ts"]): (r["state_asof"], r["ts_asof"]) for r in res.collect()}
    assert got[("a", 5)] == (None, None)       # nothing at-or-before 5
    assert got[("a", 10)] == ("y", 10)          # inclusive: the ts=10 row wins
    assert got[("a", 20)] == ("z", 15)
    assert got[("b", 10)] == (None, None)       # key with no right rows
    assert len(got) == 4                        # every left row survives


def test_asof_tolerance(spark):
    from opentsdb_aura_spark.operators.asof import asof_join

    left, right = _mk(spark)
    res = asof_join(left, right, on=["k"], tolerance=3)
    got = {(r["k"], r["ts"]): r["state_asof"] for r in res.collect()}
    assert got[("a", 10)] == "y"   # age 0
    assert got[("a", 20)] is None  # nearest is 5 old > 3


def test_asof_single_shuffle_plan(spark):
    from opentsdb_aura_spark.operators.asof import asof_join

    left, right = _mk(spark)
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    # union + one window: exactly one Exchange on the key, no join node
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan

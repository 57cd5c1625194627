"""Misra–Gries heavy-hitter sketch: exactness, the n/(C+1) undercount
guarantee under forced trims, merge across partitions, and groups."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from opentsdb_aura_spark.operators.sketch import mg_heavy_hitters, mg_partials


@pytest.fixture(scope="module")
def skewed(spark):
    """Long-tail stream: 3 planted heavy items + 2000 singleton noise
    items, shuffled — any capacity < 2003 forces trims."""
    rng = random.Random(7)
    items = ["hot_a"] * 5000 + ["hot_b"] * 3000 + ["hot_c"] * 1500
    items += [f"noise_{i}" for i in range(2000)]
    rng.shuffle(items)
    return spark.createDataFrame([(x,) for x in items], "item string").repartition(8)


def test_mg_exact_when_capacity_covers_distinct(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [(None,)], "item string"
    ).repartition(4)
    got = {
        r["item"]: (r["est_count"], r["err_bound"], r["n_total"])
        for r in mg_heavy_hitters(df, "item", 3, capacity=16).collect()
    }
    assert got == {"a": (5, 0, 10), "b": (3, 0, 10), "c": (2, 0, 10)}


def test_mg_undercount_bound_under_trims(spark, skewed):
    """capacity=50 over 11 500 rows with 2003 distinct items: every
    estimate is a lower bound, undercounting by at most n/(C+1), and
    all three planted heavy items (freq >> n/(C+1)) survive."""
    true = {"hot_a": 5000, "hot_b": 3000, "hot_c": 1500}
    n = 11500
    cap = 50
    rows = mg_heavy_hitters(skewed, "item", 5, capacity=cap).collect()
    got = {r["item"]: r for r in rows}
    assert set(true) <= set(got)
    for item, t in true.items():
        r = got[item]
        assert r["n_total"] == n
        assert r["err_bound"] == n // (cap + 1)
        assert r["est_count"] <= t
        assert t - r["est_count"] <= r["err_bound"], (item, r)
    # ranking of the three heavies is preserved (gaps exceed the bound)
    ranked = [r["item"] for r in sorted(rows, key=lambda r: -r["est_count"])[:3]]
    assert ranked == ["hot_a", "hot_b", "hot_c"]


def test_mg_partials_bounded_size(spark, skewed):
    """Each (partition, group) summary is at most capacity item rows
    plus ONE sentinel total row (item NULL) — the state bound that
    makes the shuffle O(partitions x C) with no second input scan."""
    cap = 50
    parts = mg_partials(skewed, "item", cap).withColumn("pid", F.spark_partition_id())
    per_part = parts.groupBy("pid").count().collect()
    assert per_part and all(r["count"] <= cap + 1 for r in per_part)
    sentinels = parts.where(F.col("item").isNull()).groupBy("pid").count().collect()
    assert all(r["count"] == 1 for r in sentinels)
    # sentinel totals sum to the full input size
    n = parts.where(F.col("item").isNull()).agg(F.sum("cnt")).first()[0]
    assert n == 11500


def test_mg_partition_invariant_bound(spark, skewed):
    """Estimates depend on the partition layout (MG is deterministic
    per layout, not across layouts) but the guarantee holds for ANY
    layout: compare 1-partition (no merge) vs 8-partition (merged)."""
    one = {
        r["item"]: r["est_count"]
        for r in mg_heavy_hitters(skewed.coalesce(1), "item", 3, capacity=50).collect()
    }
    eight = {
        r["item"]: r["est_count"]
        for r in mg_heavy_hitters(skewed, "item", 3, capacity=50).collect()
    }
    true = {"hot_a": 5000, "hot_b": 3000, "hot_c": 1500}
    bound = 11500 // 51
    for got in (one, eight):
        assert set(got) == set(true)
        for item, t in true.items():
            assert 0 < got[item] <= t and t - got[item] <= bound


def test_mg_grouped(spark):
    """group_cols: independent summaries and totals per group."""
    rows = [("g1", "x")] * 6 + [("g1", "y")] * 2 + [("g2", "y")] * 4 + [("g2", "z")] * 1
    df = spark.createDataFrame(rows, "g string, item string").repartition(3)
    out = mg_heavy_hitters(df, "item", 1, capacity=8, group_cols=["g"]).collect()
    got = {r["g"]: (r["item"], r["est_count"], r["n_total"]) for r in out}
    assert got == {"g1": ("x", 6, 8), "g2": ("y", 4, 5)}


def test_mg_grouped_keeps_null_group_keys(spark):
    """Null group-key rows form their own group, exactly like
    F.groupBy — they must not silently vanish from the summary."""
    rows = [("g1", "x")] * 3 + [(None, "y")] * 4 + [(None, "z")] * 1
    df = spark.createDataFrame(rows, "g string, item string").repartition(3)
    out = mg_heavy_hitters(df, "item", 1, capacity=8, group_cols=["g"]).collect()
    got = {r["g"]: (r["item"], r["est_count"], r["n_total"]) for r in out}
    assert got == {"g1": ("x", 3, 3), None: ("y", 4, 5)}


# ---------------------------------------------------------------- Count-Min


@pytest.fixture(scope="module")
def cm_stream(spark):
    """Zipf-ish stream over 300 distinct keys — far more keys than a
    16-wide sketch has slots, so every row of the sketch carries
    collisions."""
    rng = random.Random(11)
    items = [f"k{int(rng.random() ** 2 * 300)}" for _ in range(8000)]
    return spark.createDataFrame([(x,) for x in items], "item string").repartition(8)


def test_cms_never_undercounts_and_bounds_error(spark, cm_stream):
    from opentsdb_aura_spark.operators.sketch import countmin_estimate, countmin_sketch

    sk = countmin_sketch(cm_stream, "item", depth=4, width=16)
    est = {r.item: r.est_count for r in countmin_estimate(
        sk, cm_stream, "item", depth=4, width=16
    ).collect()}
    exact = {r.item: r.cnt for r in cm_stream.groupBy("item").agg(
        F.count("*").alias("cnt")
    ).collect()}
    assert set(est) == set(exact)
    n = sum(exact.values())
    overs = [est[k] - exact[k] for k in exact]
    assert all(o >= 0 for o in overs), "CM estimate must never undercount"
    # e = 2/width bound with prob 1-2^-depth; deterministic data, so just
    # sanity-check the typical-case bound rather than the tail
    assert sorted(overs)[len(overs) // 2] <= 2 * n // 16


def test_cms_exact_when_no_collisions(spark):
    from opentsdb_aura_spark.operators.sketch import countmin_estimate, countmin_sketch

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "item string"
    )
    # width 4096 >> 3 keys: P(any collision in all 4 rows) ~ 0 for this
    # fixed dataset — and md5 slots are deterministic, so this is a
    # stable fact of the fixture, not a flaky draw
    sk = countmin_sketch(df, "item", depth=4, width=4096)
    est = {r.item: r.est_count for r in countmin_estimate(
        sk, df, "item", depth=4, width=4096
    ).collect()}
    assert est == {"a": 5, "b": 3, "c": 2}


def test_cms_merges_by_summing_counters(spark, cm_stream):
    """Two sketches over disjoint halves, counters summed on (j, slot),
    must equal the single-pass sketch — the mergeable-summaries
    property that makes per-shard sketches combine without rescan."""
    from opentsdb_aura_spark.operators.sketch import countmin_sketch

    halves = cm_stream.withColumn("_h", F.monotonically_increasing_id() % 2)
    a = countmin_sketch(halves.where(F.col("_h") == 0), "item", depth=4, width=16)
    b = countmin_sketch(halves.where(F.col("_h") == 1), "item", depth=4, width=16)
    merged = {
        (r.j, r.slot): r.cnt
        for r in a.unionByName(b).groupBy("j", "slot").agg(
            F.sum("cnt").cast("long").alias("cnt")
        ).collect()
    }
    full = {(r.j, r.slot): r.cnt for r in countmin_sketch(
        cm_stream, "item", depth=4, width=16
    ).collect()}
    assert merged == full


def test_cms_drops_null_keys(spark):
    from opentsdb_aura_spark.operators.sketch import countmin_sketch

    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    sk = countmin_sketch(df, "item", depth=2, width=8)
    assert sk.agg(F.sum("cnt")).first()[0] == 4  # 2 rows x depth 2


def test_cms_unseen_key_with_empty_slot_reads_zero(spark):
    """A probed key absent from the build set whose hash lands in an
    untouched slot must estimate 0 — the empty slot may not be
    silently dropped (the left-join/coalesce contract)."""
    from opentsdb_aura_spark.operators.sketch import countmin_estimate, countmin_sketch

    build = spark.createDataFrame([("a",)] * 3, "item string")
    # wide sketch: 3 occupied slots (one key), almost all slots empty
    sk = countmin_sketch(build, "item", depth=4, width=4096)
    probe = spark.createDataFrame([("never-seen",), ("a",)], "item string")
    est = {r.item: r.est_count for r in countmin_estimate(
        sk, probe, "item", depth=4, width=4096
    ).collect()}
    assert est == {"never-seen": 0, "a": 3}


# ---------------------------------------------------------------- md5-HLL


def test_hll_md5_matches_python_reference(spark):
    """Registers AND estimate bit-identical to an independent Python
    implementation of the same md5 construction — the property that
    lets this HLL carry a full value-hash oracle."""
    import hashlib
    import math

    from opentsdb_aura_spark.operators.sketch import hll_md5_estimate, hll_md5_registers

    keys = [f"user-{i}" for i in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")

    regs = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
        b, w = h % 256, h // 256
        rho = 25 if w == 0 else (w & -w).bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    m = 256
    s = sum(2.0 ** -r for _, r in sorted(regs.items())) + (m - len(regs))
    raw = 0.7213 / (1 + 1.079 / m) * m * m / s
    v = m - len(regs)
    want = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw

    got_regs = {r.bucket: r.rho for r in hll_md5_registers(df, "k").collect()}
    assert got_regs == regs
    got = hll_md5_estimate(hll_md5_registers(df, "k")).first()[0]
    assert abs(got - want) < 1e-9 * want
    assert abs(got - 3000) / 3000 < 0.15  # 1.04/sqrt(256) ~ 6.5% std err


def test_hll_md5_linear_counting_small_range(spark):
    """A handful of keys lands in the linear-counting branch:
    m·ln(m/V) with V empty registers."""
    import math

    from opentsdb_aura_spark.operators.sketch import hll_md5_estimate, hll_md5_registers

    df = spark.createDataFrame([(f"k{i}",) for i in range(5)], "k string")
    regs = hll_md5_registers(df, "k")
    occ = regs.count()  # 5 keys, distinct buckets w.h.p. (deterministic fixture)
    got = hll_md5_estimate(regs).first()[0]
    assert abs(got - 256 * math.log(256 / (256 - occ))) < 1e-9


def test_hll_md5_registers_merge_by_max(spark):
    """Registers from disjoint halves merged by groupBy-max equal the
    single-pass registers — the mergeable-summaries property."""
    from pyspark.sql import functions as F

    from opentsdb_aura_spark.operators.sketch import hll_md5_registers

    keys = [(f"x{i}",) for i in range(2000)]
    df = spark.createDataFrame(keys, "k string")
    a = hll_md5_registers(df.where(F.md5("k").startswith("0") | F.md5("k").startswith("1")), "k")
    b = hll_md5_registers(df.where(~(F.md5("k").startswith("0") | F.md5("k").startswith("1"))), "k")
    merged = {
        (r.bucket, r.rho)
        for r in a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
    }
    full = {(r.bucket, r.rho) for r in hll_md5_registers(df, "k").collect()}
    assert merged == full

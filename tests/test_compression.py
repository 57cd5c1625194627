"""X4 — lossy mantissa truncation (operators/compression.py) vs the
bit-level ground truth of the reference's Gorilla LOSS_MASK
(GorillaSegmentEncoder.java:29: doubleToLongBits & 0xFFFFFFFFFF000000)."""

import math
import random
import struct

from pyspark.sql import functions as F

from opentsdb_aura_spark.operators.compression import (
    GORILLA_KEEP_BITS,
    lossy_mantissa_truncate,
)


def _mask(v: float, keep_bits: int = 28) -> float:
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    drop = 52 - keep_bits
    mask = (~((1 << drop) - 1)) & 0xFFFFFFFFFFFFFFFF
    return struct.unpack("<d", struct.pack("<Q", bits & mask))[0]


def test_truncation_bit_exact_vs_reference_mask(spark):
    """The arithmetic truncation must equal the IEEE-754 bitmask
    bit-for-bit across magnitudes, signs, and keep_bits settings."""
    rng = random.Random(3)
    vals = (
        [rng.uniform(-1e6, 1e6) for _ in range(1000)]
        + [rng.uniform(-1e-3, 1e-3) for _ in range(300)]
        + [1.0, -1.0, 2.0, 0.1, 1e300, -1e300, 2.0**-900]
    )
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    for kb in (GORILLA_KEEP_BITS, 8):
        out = {
            r["i"]: r["t"]
            for r in df.select("i", lossy_mantissa_truncate(F.col("v"), kb).alias("t")).collect()
        }
        bad = [(v, out[i], _mask(v, kb)) for i, v in enumerate(vals) if out[i] != _mask(v, kb)]
        assert not bad, (kb, bad[:3])


def test_truncation_special_values_pass_through(spark):
    vals = [0.0, float("nan"), float("inf"), float("-inf"), None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    out = {r["i"]: r["t"] for r in df.select("i", lossy_mantissa_truncate(F.col("v")).alias("t")).collect()}
    assert out[0] == 0.0
    assert math.isnan(out[1])
    assert out[2] == float("inf") and out[3] == float("-inf")
    assert out[4] is None


def test_truncation_error_bound_and_idempotence(spark):
    """Relative error ≤ 2^−keep_bits and truncating twice equals once."""
    rng = random.Random(9)
    vals = [rng.uniform(-1e4, 1e4) for _ in range(500) if True]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    once = lossy_mantissa_truncate(F.col("v"), 8)
    rows = df.select(
        "v", once.alias("t1"), lossy_mantissa_truncate(once, 8).alias("t2")
    ).collect()
    for r in rows:
        assert r["t1"] == r["t2"]  # idempotent
        if r["v"] != 0:
            assert abs(r["t1"] - r["v"]) <= abs(r["v"]) * 2.0**-8
            assert abs(r["t1"]) <= abs(r["v"])  # truncation toward zero


def test_lossy_sql_expr_runs_on_spark(spark):
    """The SQL re-expression must be PORTABLE: executable by Spark SQL
    (no isinf — DuckDB-only) and byte-identical to the column path."""
    import math

    from pyspark.sql import functions as F

    from opentsdb_aura_spark.operators.compression import lossy_mantissa_truncate, lossy_sql_expr

    vals = [0.0, 1.0, -3.14159, 1e-300, 6.02e23, float("inf"), float("-inf"), float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        lossy_mantissa_truncate(F.col("v")).alias("col_path"),
        F.expr(lossy_sql_expr("v")).alias("sql_path"),
    ).collect()
    for r in rows:
        a, b = r["col_path"], r["sql_path"]
        assert (math.isnan(a) and math.isnan(b)) or a == b, (a, b)

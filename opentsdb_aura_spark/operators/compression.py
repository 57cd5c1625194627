"""Value-compression operators (SURVEY §2.8 X4).

The reference's Gorilla encoder offers a LOSSY mode that zeroes the
low 3 bytes of the IEEE-754 mantissa before XOR-encoding — see
``core/.../gorilla/GorillaSegmentEncoder.java:29``
(``LOSS_MASK = 0xFFFFFFFFFF000000``) and the masking write at
``GorillaSegmentEncoder.java:103``; the double keeps 52−24 = 28
mantissa bits, a ≤2⁻²⁸ relative error, for markedly better XOR
compression.

Spark has no double→bits builtin, so the same truncation is computed
ARITHMETICALLY, and exactly:

1. the value's binade p = 2^floor(log2|v|) is taken from ``pow``/
   ``log2`` and then SELF-CORRECTED with two comparisons (halve if
   p > |v|, double if 2p ≤ |v|) — the result brackets |v| in [p, 2p)
   exactly regardless of libm rounding, so no ULP dependence on the
   engine's log2;
2. with scale = p·2^−keep_bits, the ratio |v|/scale = m·2^keep_bits
   lies in [2^keep_bits, 2^keep_bits+1) < 2⁵³, so ``floor`` and the
   multiply back are exact double operations;
3. sign is reapplied (the bitmask truncates the magnitude — toward
   zero — not toward −∞).

The same arithmetic is expressible in ANSI SQL, which makes the
operator oracle-checkable in DuckDB bit-for-bit — unlike a
double→bits UDF, which would also fall off the Catalyst fast path.
Zero, NaN and ±Inf pass through unchanged (their bit patterns carry
no mantissa to truncate — NaN payloads are not preserved by the
reference either).  Subnormals (|v| < 2⁻¹⁰²²) may round once more in
the scale multiply; the reference's mask has the same magnitude-floor
behavior there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: mantissa bits kept by the reference's LOSS_MASK (52 − 24)
GORILLA_KEEP_BITS = 28


def lossy_mantissa_truncate(col: Column, keep_bits: int = GORILLA_KEEP_BITS) -> Column:
    """Truncate a double's mantissa to ``keep_bits`` bits (toward
    zero), the arithmetic equivalent of the reference's
    ``doubleToLongBits(v) & LOSS_MASK`` for keep_bits=28."""
    a = F.abs(col)
    p0 = F.pow(F.lit(2.0), F.floor(F.log2(a)).cast("double"))
    p1 = F.when(p0 > a, p0 / F.lit(2.0)).otherwise(p0)
    p = F.when(p1 * F.lit(2.0) <= a, p1 * F.lit(2.0)).otherwise(p1)
    scale = p * F.pow(F.lit(2.0), F.lit(float(-keep_bits)))
    t = F.floor(a / scale) * scale
    signed = F.when(col < 0, -t).otherwise(t)
    passthrough = col.isNull() | F.isnan(col) | (col == F.lit(0.0)) | (a == F.lit(float("inf")))
    return F.when(passthrough, col).otherwise(signed)


def lossy_encode_values(points: DataFrame, keep_bits: int = GORILLA_KEEP_BITS, value_col: str = "value") -> DataFrame:
    """Apply lossy mantissa truncation to the value column — the
    write-path transform a lossy store applies before encoding
    (GorillaSegmentEncoder.java:103); reads then see the truncated
    doubles exactly as the reference's decoder does."""
    return points.withColumn(value_col, lossy_mantissa_truncate(F.col(value_col), keep_bits))


def lossy_sql_expr(value_expr: str, keep_bits: int = GORILLA_KEEP_BITS) -> str:
    """The identical truncation as an ANSI-SQL scalar expression (for
    DuckDB oracles and the SQL surface)."""
    a = f"abs({value_expr})"
    p0 = f"pow(2.0, floor(log2({a})))"
    p1 = f"(CASE WHEN {p0} > {a} THEN {p0} / 2.0 ELSE {p0} END)"
    p = f"(CASE WHEN {p1} * 2.0 <= {a} THEN {p1} * 2.0 ELSE {p1} END)"
    scale = f"({p} * pow(2.0, {float(-keep_bits)}))"
    t = f"(floor({a} / {scale}) * {scale})"
    signed = f"(CASE WHEN {value_expr} < 0 THEN -{t} ELSE {t} END)"
    return (
        # abs(x) = CAST('Infinity' AS DOUBLE) is the portable infinity
        # test: Spark SQL has no isinf() builtin (DuckDB does)
        f"(CASE WHEN {value_expr} IS NULL OR isnan({value_expr}) OR {value_expr} = 0 "
        f"OR abs({value_expr}) = CAST('Infinity' AS DOUBLE) THEN {value_expr} ELSE {signed} END)"
    )

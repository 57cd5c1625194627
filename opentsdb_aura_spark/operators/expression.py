"""Series arithmetic expressions (OpenTSDB 3.x ``expression`` node).

The reference engine is queried through OpenTSDB 3.x query graphs, and
expression nodes (``net.opentsdb.query.processor.expressions``,
upstream of the aura repo — SURVEY.md §2.8 notes arithmetic over
series is an upstream node the aura source feeds) combine the results
of two or more branches: ``(m1 - m2) / m1 * 100``.  Semantics:

- operands are *aggregated* time-series results joined on their group
  keys + interval timestamp (a NATURAL join on the common tags);
- a bucket present on one side only contributes NaN for the missing
  side (NATURAL_OUTER join) unless ``substitute_missing`` supplies a
  fill value, or an INNER/LEFT/RIGHT join drops it;
- NaN is infectious through arithmetic (IEEE-754 does this for free);
- division / modulo by zero yield NaN, never an error.

Spark shape: each operand is a post-group-by DataFrame already hash
partitioned on exactly (group keys, bucket_ts) by its aggregation, so
the USING-join here needs **no extra shuffle** — Catalyst reuses the
exchange on both sides and the whole arithmetic stays inside
whole-stage codegen.  The expression itself compiles to a single
Column expression tree (no UDFs).

Variables in the expression are source names: identifiers matching
``[A-Za-z_][A-Za-z0-9_]*`` (OpenTSDB node ids used in expressions obey
the same restriction).  Numeric literals and parentheses are allowed;
operators: ``+ - * / %`` and relational ``> < >= <= == !=`` (relational
results are 1.0/0.0, NaN if either side is NaN, as in OpenTSDB).
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentsdb_aura_spark.model import NAN

__all__ = ["compile_expression", "evaluate_expression", "parse_expression"]




# ---------------------------------------------------------------- parser

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>>=|<=|==|!=|[-+*/%()><]))"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise ValueError(f"unparseable expression at {text[pos:]!r}")
            break
        pos = m.end()
        for kind in ("num", "ident", "op"):
            if m.group(kind) is not None:
                tokens.append((kind, m.group(kind)))
                break
    return tokens


def parse_expression(text: str):
    """Parse to a nested tuple AST: ('num', x) | ('var', name) |
    ('neg', a) | (op, a, b).  Standard precedence: relational <
    additive < multiplicative < unary."""
    tokens = _tokenize(text)
    pos = 0

    def peek():
        return tokens[pos][1] if pos < len(tokens) else None

    def take():
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"unexpected end of expression: {text!r}")
        tok = tokens[pos]
        pos += 1
        return tok

    def primary():
        kind, val = take()
        if kind == "num":
            return ("num", float(val))
        if kind == "ident":
            return ("var", val)
        if val == "(":
            node = relational()
            if peek() != ")":
                raise ValueError(f"missing ')' in expression: {text!r}")
            take()
            return node
        raise ValueError(f"unexpected token {val!r} in expression: {text!r}")

    def unary():
        if peek() == "-":
            take()
            return ("neg", unary())
        return primary()

    def multiplicative():
        node = unary()
        while peek() in ("*", "/", "%"):
            op = take()[1]
            node = (op, node, unary())
        return node

    def additive():
        node = multiplicative()
        while peek() in ("+", "-"):
            op = take()[1]
            node = (op, node, multiplicative())
        return node

    def relational():
        node = additive()
        if peek() in (">", "<", ">=", "<=", "==", "!="):
            op = take()[1]
            node = (op, node, additive())
        return node

    node = relational()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in expression: {text!r}")
    return node


def variables(ast) -> list[str]:
    """Variable names referenced by the AST, in first-use order."""
    out: list[str] = []

    def walk(n):
        if n[0] == "var":
            if n[1] not in out:
                out.append(n[1])
        elif n[0] == "num":
            pass
        elif n[0] == "neg":
            walk(n[1])
        else:
            walk(n[1])
            walk(n[2])

    walk(ast)
    return out


# ------------------------------------------------------------- compiler

_REL = {
    ">": Column.__gt__,
    "<": Column.__lt__,
    ">=": Column.__ge__,
    "<=": Column.__le__,
    "==": Column.__eq__,
    "!=": Column.__ne__,
}


def compile_expression(ast, resolve: Callable[[str], Column]) -> Column:
    """AST → a single Column expression.  ``/`` and ``%`` guard the
    zero divisor (→ NaN) so ANSI mode never raises; relational ops
    return 1.0/0.0 with NaN poisoning either operand."""

    def emit(n) -> Column:
        kind = n[0]
        if kind == "num":
            return F.lit(n[1]).cast("double")
        if kind == "var":
            return resolve(n[1])
        if kind == "neg":
            return -emit(n[1])
        a, b = emit(n[1]), emit(n[2])
        if kind == "+":
            return a + b
        if kind == "-":
            return a - b
        if kind == "*":
            return a * b
        if kind == "/":
            return F.when(b == 0, NAN()).otherwise(a / b)
        if kind == "%":
            return F.when(b == 0, NAN()).otherwise(a % b)
        if kind in _REL:
            cmp = _REL[kind](a, b).cast("double")
            return F.when(F.isnan(a) | F.isnan(b), NAN()).otherwise(cmp)
        raise ValueError(f"unknown AST node: {kind!r}")

    return emit(ast).cast("double")


# ------------------------------------------------------------ evaluator

_JOIN_TYPES = {
    "outer": "full_outer",  # NATURAL_OUTER (OpenTSDB default)
    "natural_outer": "full_outer",
    "full_outer": "full_outer",
    "inner": "inner",
    "natural": "inner",
    "left": "left_outer",
    "left_outer": "left_outer",
    "right": "right_outer",
    "right_outer": "right_outer",
}


def evaluate_expression(
    sources: Mapping[str, DataFrame],
    expr: str,
    *,
    join_keys: Sequence[str] | None = None,
    value_col: str = "value",
    out_col: str = "value",
    join_type: str = "outer",
    substitute_missing: float | None = None,
) -> Column | DataFrame:
    """Join the named operand results and evaluate ``expr`` over them.

    ``sources`` maps variable name → DataFrame of (join keys…,
    ``value_col``).  ``join_keys`` defaults to every non-value column
    of the first referenced source (the NATURAL-join contract: all
    operands share the group-key + bucket_ts shape).  Output: one row
    per joined key tuple with ``out_col`` holding the result.
    """
    ast = parse_expression(expr)
    names = variables(ast)
    if not names:
        raise ValueError(f"expression references no sources: {expr!r}")
    missing = [n for n in names if n not in sources]
    if missing:
        raise ValueError(f"expression references unknown sources {missing}; have {sorted(sources)}")
    how = _JOIN_TYPES.get(join_type.lower())
    if how is None:
        raise ValueError(f"unsupported join type {join_type!r}; one of {sorted(_JOIN_TYPES)}")
    if how in ("left_outer", "right_outer") and len(names) != 2:
        raise ValueError(f"{join_type} join needs exactly 2 operands, got {len(names)}")

    first = sources[names[0]]
    keys = list(join_keys) if join_keys is not None else [c for c in first.columns if c != value_col]

    joined: DataFrame | None = None
    for i, name in enumerate(names):
        side = sources[name].select(*keys, F.col(value_col).alias(f"_v_{name}"))
        if joined is None:
            joined = side
            continue
        # NULL-SAFE key equality: a series missing a grouped tag forms
        # a NULL-keyed group (with_group_keys), and a plain USING join
        # would never match it across operands — the group would come
        # out doubled (outer) or silently dropped (inner), the same
        # class of bug fill_spine's spine join fixes.  Both inputs
        # still arrive hash partitioned on these keys, so no new
        # exchange is introduced.
        lhs, rhs = joined.alias("_l"), side.alias(f"_r{i}")
        cond = None
        for k in keys:
            c = F.col(f"_l.{k}").eqNullSafe(F.col(f"_r{i}.{k}"))
            cond = c if cond is None else (cond & c)
        prev_vals = [c for c in joined.columns if c.startswith("_v_")]
        joined = lhs.join(rhs, cond, how).select(
            *[F.coalesce(F.col(f"_l.{k}"), F.col(f"_r{i}.{k}")).alias(k) for k in keys],
            *[F.col(f"_l.{v}") for v in prev_vals],
            F.col(f"_r{i}._v_{name}"),
        )

    fill = F.lit(float(substitute_missing)).cast("double") if substitute_missing is not None else NAN()

    def resolve(name: str) -> Column:
        return F.coalesce(F.col(f"_v_{name}"), fill)

    result = compile_expression(ast, resolve)
    return joined.select(*keys, result.alias(out_col))

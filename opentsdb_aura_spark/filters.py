"""Series-selection filter algebra (SURVEY.md §2.2, F1-F10).

The reference resolves filters to RoaringBitmap sets over an inverted
index (core/src/main/java/net/opentsdb/aura/metrics/meta/NewDocStore.java:779-828,
filter algebra core/.../meta/Filter.java:137-186,
chain semantics core/.../meta/ChainFilter.java:79-110).  Here the same
algebra is a small AST compiled to a single Catalyst ``Column``
predicate — Spark's Parquet scan (row-group stats, dictionary and
partition pruning) plays the role of the bitmap index.

Semantics preserved from the reference:
- tag-value regexp uses *substring* matching — Java ``Matcher.find()``
  (Filter.java:160-174) — so patterns are not anchored; Spark ``rlike``
  has the same find() semantics.
- ``.*``-family regexes short-circuit to match-all (Filter.java:54-66).
- wildcard filters are globs rewritten to regexes
  (opentsdb/.../storage/QueryBuilderTSDBExt.java:105-112).
- a NOT chain member set is OR'ed together then AND-NOT'ed against the
  positive result (ChainFilter.java:87-108, MetaQueryBuilder.java:116-124)
  — boolean-algebra equivalent of ``positive & ~(n1 | n2 | ...)``.
- explicit-tags: the series' stored tag count must equal the number of
  distinct tag keys in the filter (QueryBuilderTSDBExt.java:52-56,
  TimeSeriesShard.java:718-732).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regexes the reference treats as match-all (Filter.java:54-66).
_MATCH_ALL_PATTERNS = {".*", "^.*", ".*$", "^.*$"}


@dataclass(frozen=True)
class Filter:
    """Base of the filter AST."""

    def to_column(self, tags: Column) -> Column:
        raise NotImplementedError

    # -- combinators -------------------------------------------------
    def __and__(self, other: "Filter") -> "Filter":
        return Chain("AND", [self, other])

    def __or__(self, other: "Filter") -> "Filter":
        return Chain("OR", [self, other])

    def __invert__(self) -> "Filter":
        return Not(self)

    def tag_keys(self) -> set[str]:
        """Distinct tag keys referenced (for explicit-tags counting)."""
        return set()


@dataclass(frozen=True)
class MetricLiteral(Filter):
    """F1 — metric == literal (MetricFilter.java:25-77)."""

    metric: str

    def to_column(self, tags: Column) -> Column:  # tags unused
        return F.col("metric") == F.lit(self.metric)


@dataclass(frozen=True)
class TagLiteralOr(Filter):
    """F2 — tags[k] IN (v1|v2|...) (LiteralFilter.java:24-53)."""

    key: str
    values: tuple[str, ...]

    def to_column(self, tags: Column) -> Column:
        return tags[self.key].isin(*self.values)

    def tag_keys(self) -> set[str]:
        return {self.key}


@dataclass(frozen=True)
class TagRegexp(Filter):
    """F3 — regex find() on tags[k] (RegexpFilter.java:21-47)."""

    key: str
    pattern: str

    def to_column(self, tags: Column) -> Column:
        if self.pattern in _MATCH_ALL_PATTERNS:
            # match-all fast path = tag key present (Filter.java:54-66)
            return tags[self.key].isNotNull()
        return tags[self.key].rlike(self.pattern)

    def tag_keys(self) -> set[str]:
        return {self.key}


def _glob_to_regex(glob: str) -> str:
    """``*`` glob → regex, as QueryBuilderTSDBExt.java:105-112 does."""
    parts = glob.split("*")
    return ".*".join(re.escape(p) for p in parts)


@dataclass(frozen=True)
class TagWildcard(Filter):
    """F4 — glob on tags[k], rewritten to an anchored regex."""

    key: str
    glob: str

    def to_column(self, tags: Column) -> Column:
        if self.glob.strip() == "*":
            return tags[self.key].isNotNull()
        return tags[self.key].rlike("^" + _glob_to_regex(self.glob) + "$")

    def tag_keys(self) -> set[str]:
        return {self.key}


@dataclass(frozen=True)
class TagKeyPresent(Filter):
    """F5 — series has tag key k (TagKeyFilter.java:27-77)."""

    key: str

    def to_column(self, tags: Column) -> Column:
        return F.map_contains_key(tags, self.key)

    def tag_keys(self) -> set[str]:
        return {self.key}


@dataclass(frozen=True)
class AnyFieldRegexp(Filter):
    """F6 — value regex on ANY tag key (AnyFilter.java:27-73)."""

    pattern: str

    def to_column(self, tags: Column) -> Column:
        if self.pattern in _MATCH_ALL_PATTERNS:
            return F.size(tags) > 0
        pattern = self.pattern
        return F.exists(F.map_values(tags), lambda v: v.rlike(pattern))


@dataclass(frozen=True)
class Not(Filter):
    """NOT wrapper; chains lift NOT members out (MetaQueryBuilder.java:116-124)."""

    inner: Filter

    def to_column(self, tags: Column) -> Column:
        # three-valued-logic guard: a tag-value predicate on a series
        # MISSING the key is NULL, and ~NULL is NULL — the row would be
        # dropped, where the reference's bitmap ANDNOT (positive &
        # ~(n1|n2|...)) INCLUDES series lacking the key.  Coalesce the
        # inner predicate to false so NOT(no-match) is true.
        return ~F.coalesce(self.inner.to_column(tags), F.lit(False))

    def tag_keys(self) -> set[str]:
        return self.inner.tag_keys()


@dataclass(frozen=True)
class Chain(Filter):
    """F7 — n-ary AND/OR with NOT-lifting (ChainFilter.java:79-110).

    NOT members are OR'ed together and AND-NOT'ed against the positive
    conjunction/disjunction; an all-NOT AND-chain is MATCH_ALL ANDNOT
    (n1|n2|...).
    """

    op: str  # "AND" | "OR"
    members: list[Filter] = field(default_factory=list)

    def __post_init__(self) -> None:
        # normalize + validate: the fold below branches on op == "AND",
        # so an unvalidated lowercase "and" would silently widen the
        # filter to OR
        object.__setattr__(self, "op", str(self.op).upper())
        if self.op not in ("AND", "OR"):
            raise ValueError(f"Chain op must be AND or OR, got {self.op!r}")

    def to_column(self, tags: Column) -> Column:
        positives = [m for m in self.members if not isinstance(m, Not)]
        negatives = [m.inner for m in self.members if isinstance(m, Not)]
        if positives:
            pos = positives[0].to_column(tags)
            for m in positives[1:]:
                pos = (pos & m.to_column(tags)) if self.op == "AND" else (pos | m.to_column(tags))
        else:
            pos = F.lit(True)  # all-NOT chain: MATCH_ALL as the positive base
        if negatives:
            neg = negatives[0].to_column(tags)
            for m in negatives[1:]:
                neg = neg | m.to_column(tags)
            # same NULL guard as Not.to_column: bitmap-ANDNOT semantics
            pos = pos & ~F.coalesce(neg, F.lit(False))
        return pos

    def tag_keys(self) -> set[str]:
        out: set[str] = set()
        for m in self.members:
            out |= m.tag_keys()
        return out


@dataclass(frozen=True)
class ExplicitTags(Filter):
    """F8 — series must have exactly the filtered tag keys
    (TimeSeriesShard.java:718-732): stored tag count == filter key count."""

    inner: Filter

    def to_column(self, tags: Column) -> Column:
        n = len(self.inner.tag_keys())
        return self.inner.to_column(tags) & (F.size(tags) == F.lit(n))

    def tag_keys(self) -> set[str]:
        return self.inner.tag_keys()


@dataclass(frozen=True)
class MatchAll(Filter):
    """F9 — select everything (MatchAllFilter.java:25-60)."""

    def to_column(self, tags: Column) -> Column:
        return F.lit(True)


def compile_filter(flt: Filter | None, tags_col: str = "tags") -> Column:
    """Filter AST → one Catalyst boolean Column (the WHERE clause)."""
    if flt is None:
        return F.lit(True)
    return flt.to_column(F.col(tags_col))


def time_range(start: int, end: int) -> Column:
    """F10 — [start, end) with **exclusive** end
    (aerospike/.../LongTermStorage.java:26-33)."""
    return (F.col("ts") >= F.lit(int(start))) & (F.col("ts") < F.lit(int(end)))

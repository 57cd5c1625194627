"""Filter algebra tests — NewDocStoreTest scenarios: literal / regex /
wildcard / tag-key / any-field / NOT chains / explicit-tags /
match-all."""

from conftest import BASE

from opentsdb_aura_spark.filters import (
    AnyFieldRegexp,
    Chain,
    ExplicitTags,
    MatchAll,
    MetricLiteral,
    Not,
    TagKeyPresent,
    TagLiteralOr,
    TagRegexp,
    TagWildcard,
    compile_filter,
)

FLEET = [
    ("cpu", {"host": "web01", "dc": "east"}),
    ("cpu", {"host": "web02", "dc": "west"}),
    ("cpu", {"host": "db01", "dc": "east", "extra": "1"}),
    ("mem", {"host": "web01", "dc": "east"}),
    ("mem", {"host": "db01"}),
]


def _series(make_points, flt):
    pts = make_points([(m, t, BASE + i, 1.0) for i, (m, t) in enumerate(FLEET)])
    rows = pts.where(compile_filter(flt)).select("metric", "tags").collect()
    return {(r["metric"], tuple(sorted(r["tags"].items()))) for r in rows}


def _key(i):
    m, t = FLEET[i]
    return (m, tuple(sorted(t.items())))


def test_metric_literal(make_points):
    assert _series(make_points, MetricLiteral("mem")) == {_key(3), _key(4)}


def test_tag_literal_or(make_points):
    got = _series(make_points, TagLiteralOr("host", ("web01", "web02")))
    assert got == {_key(0), _key(1), _key(3)}


def test_tag_regexp_find_semantics(make_points):
    # substring find: 'eb0' matches web01/web02 (not anchored)
    got = _series(make_points, TagRegexp("host", "eb0"))
    assert got == {_key(0), _key(1), _key(3)}


def test_tag_regexp_match_all_fast_path(make_points):
    got = _series(make_points, TagRegexp("dc", ".*"))
    assert got == {_key(0), _key(1), _key(2), _key(3)}  # dc present


def test_tag_wildcard(make_points):
    got = _series(make_points, TagWildcard("host", "web*"))
    assert got == {_key(0), _key(1), _key(3)}


def test_tag_key_present(make_points):
    assert _series(make_points, TagKeyPresent("extra")) == {_key(2)}


def test_any_field(make_points):
    got = _series(make_points, AnyFieldRegexp("^db01$"))
    assert got == {_key(2), _key(4)}


def test_chain_and_not(make_points):
    flt = Chain("AND", [MetricLiteral("cpu"), Not(TagLiteralOr("dc", ("west",)))])
    assert _series(make_points, flt) == {_key(0), _key(2)}


def test_all_not_chain(make_points):
    # all-NOT chain: MATCH_ALL ANDNOT (members OR'ed)
    flt = Chain("AND", [Not(MetricLiteral("cpu")), Not(TagKeyPresent("extra"))])
    assert _series(make_points, flt) == {_key(3), _key(4)}


def test_explicit_tags(make_points):
    # exactly {host, dc}: excludes db01-east (has extra) and mem-db01 (1 tag)
    flt = ExplicitTags(Chain("AND", [TagRegexp("host", ".*"), TagRegexp("dc", ".*")]))
    assert _series(make_points, flt) == {_key(0), _key(1), _key(3)}


def test_match_all(make_points):
    assert len(_series(make_points, MatchAll())) == 5
    assert len(_series(make_points, None)) == 5


def test_not_includes_series_missing_the_key(make_points):
    """Bitmap-ANDNOT semantics: NOT(tag filter) must INCLUDE series
    that lack the tag key entirely (three-valued SQL would NULL-drop
    them: tags['dc'].isin(...) is NULL, ~NULL is NULL)."""
    pts = make_points([
        ("mem", {"dc": "west", "host": "a"}, BASE, 1.0),
        ("mem", {"dc": "east", "host": "b"}, BASE, 2.0),
        ("mem", {"host": "c"}, BASE, 3.0),  # no dc tag at all
    ])
    flt = Chain("AND", [MetricLiteral("mem"), Not(TagLiteralOr("dc", ("west",)))])
    got = sorted(r["value"] for r in pts.where(compile_filter(flt)).collect())
    assert got == [2.0, 3.0]
    # bare Not too
    got2 = sorted(r["value"] for r in pts.where(compile_filter(Not(TagLiteralOr("dc", ("west",))))).collect())
    assert got2 == [2.0, 3.0]


def test_chain_op_validated(make_points):
    """Lowercase ops normalize; garbage raises instead of silently
    turning AND into OR."""
    import pytest

    c = Chain("and", [MetricLiteral("a"), MetricLiteral("b")])
    assert c.op == "AND"
    with pytest.raises(ValueError):
        Chain("nand", [MetricLiteral("a")])


def test_canonical_tags_escape_delimiters(spark):
    """Tag values containing '=' / ',' must not make distinct tag maps
    canonicalize identically (series_id collision)."""
    from pyspark.sql import functions as F

    from opentsdb_aura_spark.model import canonical_tags

    df = spark.createDataFrame(
        [({"a": "1", "b": "2"},), ({"a": "1,b=2"},)], "tags map<string,string>"
    )
    got = [r["c"] for r in df.select(canonical_tags(F.col("tags")).alias("c")).collect()]
    assert got[0] != got[1], got

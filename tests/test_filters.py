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

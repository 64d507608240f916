"""Golden parity for changeset-filter: the reference's full 52-case
matrix (test/changeset-filter/CMakeLists.txt), including the
--after/--before boundary sweep that pins the reference semantics
(after = open OR closed_at >= t; before = created_at <= t)."""

import calendar
import time as _time

import pytest

from osmium_tool_spark.operators.changesets import changeset_filter
from osmium_tool_spark.schema import fp
from osmium_tool_spark.sources.osmxml import read_changesets_xml

REF = "/root/reference/test/changeset-filter"

ALL = {15449957, 15449958}
FIRST = {15449957}
SECOND = {15449958}
EMPTY: set = set()
OPEN = {15450185}


def ts(s: str) -> int:
    return calendar.timegm(_time.strptime(s, "%Y-%m-%dT%H:%M:%SZ")) * 1_000_000


# (input, filter kwargs, expected id set) — transliterated 1:1 from the
# reference CMakeLists matrix
CASES = [
    ("input1.osm", {}, ALL),
    ("input1.osm", {"with_discussion": True}, EMPTY),
    ("input1.osm", {"with_discussion": False}, ALL),
    ("input1.osm", {"with_changes": True}, FIRST),
    ("input1.osm", {"with_changes": False}, SECOND),
    ("input1.osm", {"open_": True}, EMPTY),
    ("input1.osm", {"open_": False}, ALL),
    ("input1.osm", {"user": "Elbert"}, FIRST),
    ("input1.osm", {"uid": 1233268}, SECOND),
    ("input-open.osm", {"open_": True}, OPEN),
    ("input-open.osm", {"open_": False}, EMPTY),
] + [
    ("input1.osm", {"after": ts(t)}, exp)
    for t, exp in [
        ("2013-03-22T02:08:50Z", ALL), ("2013-03-22T02:08:54Z", ALL),
        ("2013-03-22T02:08:55Z", ALL), ("2013-03-22T02:08:56Z", ALL),
        ("2013-03-22T02:08:57Z", ALL), ("2013-03-22T02:08:58Z", ALL),
        ("2013-03-22T02:08:59Z", SECOND), ("2013-03-22T02:09:00Z", SECOND),
        ("2013-03-22T02:09:10Z", SECOND), ("2013-03-22T02:09:11Z", SECOND),
        ("2013-03-22T02:09:12Z", SECOND), ("2013-03-22T03:09:10Z", SECOND),
        ("2013-03-22T03:09:11Z", SECOND), ("2013-03-22T03:09:12Z", EMPTY),
        ("2013-03-22T03:09:20Z", EMPTY),
    ]
] + [
    ("input-open.osm", {"after": ts(t)}, OPEN)
    for t in ("2013-03-22T04:20:24Z", "2013-03-22T04:20:25Z", "2013-03-22T04:20:26Z")
] + [
    ("input1.osm", {"before": ts(t)}, exp)
    for t, exp in [
        ("2013-03-22T02:08:50Z", EMPTY), ("2013-03-22T02:08:54Z", EMPTY),
        ("2013-03-22T02:08:55Z", FIRST), ("2013-03-22T02:08:56Z", FIRST),
        ("2013-03-22T02:08:57Z", FIRST), ("2013-03-22T02:08:58Z", FIRST),
        ("2013-03-22T02:08:59Z", FIRST), ("2013-03-22T02:09:00Z", FIRST),
        ("2013-03-22T02:09:10Z", FIRST), ("2013-03-22T02:09:11Z", ALL),
        ("2013-03-22T02:09:12Z", ALL), ("2013-03-22T03:09:10Z", ALL),
        ("2013-03-22T03:09:11Z", ALL), ("2013-03-22T03:09:12Z", ALL),
        ("2013-03-22T03:09:20Z", ALL),
    ]
] + [
    ("input-open.osm", {"before": ts("2013-03-22T04:20:24Z")}, EMPTY),
    ("input-open.osm", {"before": ts("2013-03-22T04:20:25Z")}, OPEN),
    ("input-open.osm", {"before": ts("2013-03-22T04:20:26Z")}, OPEN),
    ("input1.osm", {"bbox": (fp(120), fp(-11), fp(121), fp(-10))}, FIRST),
    ("input1.osm", {"bbox": (fp(130), fp(-31), fp(131), fp(-30))}, EMPTY),
]


@pytest.mark.parametrize(
    "fname,kwargs,expected",
    CASES,
    ids=[f"{f.split('.')[0]}-{list(k.items())}" for f, k, _ in CASES],
)
def test_changeset_filter_matrix(spark, fname, kwargs, expected):
    cs = read_changesets_xml(spark, f"{REF}/{fname}")
    got = {r.id for r in changeset_filter(cs, **kwargs).collect()}
    assert got == expected

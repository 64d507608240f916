"""Property fuzz: the compiled Column predicate agrees with a direct
Python evaluation of the tags-filter grammar on random tag maps."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from osmium_tool_spark.functions.tagexpr import TagMatcher


def py_eval(matcher: TagMatcher, tags: dict) -> bool:
    """Driver-side semantics: any tag (k,v) matches (invert: key matches
    AND value does NOT)."""
    for k, v in tags.items():
        km = matcher.key.matches_str(k)
        if matcher.value is None:
            if km:
                return True
        elif matcher.invert:
            if km and not matcher.value.matches_str(v):
                return True
        else:
            if km and matcher.value.matches_str(v):
                return True
    return False


words = st.sampled_from(["amenity", "highway", "cafe", "bar", "x", "ab", "abc", ""])
expr_st = st.one_of(
    st.sampled_from([
        "amenity", "amenity=cafe", "amenity!=cafe", "a*", "*b", "*b*", "*",
        "amenity=c*", "amenity=*e", "highway,amenity", "amenity=cafe,bar",
        "amenity!=c*", "x=*",
    ])
)
tags_st = st.dictionaries(words.filter(bool), words, max_size=4)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=expr_st, tag_maps=st.lists(tags_st, min_size=1, max_size=8))
def test_column_matches_python_eval(spark, expr, tag_maps):
    matcher = TagMatcher.parse(expr)
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(tag_maps)], "i int, tags map<string,string>"
    )
    got = {
        r.i: r.m
        for r in df.select("i", matcher.col(F.col("tags")).alias("m")).collect()
    }
    for i, m in enumerate(tag_maps):
        assert bool(got[i]) == py_eval(matcher, m), (expr, m)

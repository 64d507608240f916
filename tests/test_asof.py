"""As-of join: union + keyed forward-fill window (no join node)."""

import pytest
from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    from osmium_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "a", 50), (4, "b", 999)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("b", 1000, 9.0)],
        "k string, t long, v double",
    )
    got = {
        r.lid: r.v
        for r in asof_join(left, right, key="k", ts="t", value_cols=["v"]).collect()
    }
    # lid 1: t=100 matches the equal-ts right row (inclusive >=)
    # lid 2: t=205 -> latest at 200; lid 3: t=50 -> none; lid 4: 999 < 1000 -> none
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}


def test_asof_join_keeps_left_payload_and_count(spark):
    from osmium_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, "k", i * 10, f"p{i}") for i in range(1, 6)],
        "lid long, k string, t long, payload string",
    )
    right = spark.createDataFrame([("k", 25, 7.0)], "k string, t long, v double")
    rows = asof_join(left, right, key="k", ts="t", value_cols=["v"]).collect()
    assert len(rows) == 5
    assert {r.payload for r in rows} == {f"p{i}" for i in range(1, 6)}
    assert {r.lid: r.v for r in rows} == {1: None, 2: None, 3: 7.0, 4: 7.0, 5: 7.0}


def test_asof_join_rejects_column_collision(spark):
    from osmium_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 10, 0.0)], "lid long, k string, t long, v double")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError, match="already has a column"):
        asof_join(left, right, key="k", ts="t", value_cols=["v"])


def test_asof_join_plan_has_no_join_node(spark):
    """The scalable shape: union + one keyed window — a range theta-join
    would appear as BroadcastNestedLoopJoin; assert it never does."""
    import contextlib
    import io

    from osmium_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 10)], "lid long, k string, t long")
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, t long, v double")
    out = asof_join(left, right, key="k", ts="t", value_cols=["v"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" not in plan  # union + window only


class TestIntervalJoin:
    def _iv(self, spark, rows):
        return spark.createDataFrame(rows, "id long, start long, end long")

    def _brute(self, a, b):
        out = []
        for i, s1, e1 in a:
            if s1 >= e1:
                continue
            for j, s2, e2 in b:
                if s2 >= e2:
                    continue
                if s1 < e2 and s2 < e1:
                    out.append((i, j, max(s1, s2), min(e1, e2)))
        return sorted(out)

    def test_halfopen_boundary(self, spark):
        from osmium_tool_spark.operators.asof import interval_join

        a = [(1, 0, 10)]
        b = [(2, 10, 20), (3, 9, 20)]  # touching is NOT overlap
        got = sorted(map(tuple, interval_join(
            self._iv(spark, a), self._iv(spark, b), 5,
            left_id="id", right_id="id").collect()))
        assert got == [(1, 3, 9, 10)]

    @staticmethod
    def _rand(seed, n):
        import random

        rng = random.Random(seed)
        out = []
        for i in range(n):
            s = rng.randint(-500, 2000)
            out.append((i, s, s + rng.randint(1, 300)))
        return out

    def test_bruteforce_parity_across_buckets(self, spark):
        from osmium_tool_spark.operators.asof import interval_join

        a, b = self._rand(1, 120), self._rand(2, 120)
        want = self._brute(a, b)
        for bucket in (1, 17, 256, 5000):
            got = sorted(map(tuple, interval_join(
                self._iv(spark, a), self._iv(spark, b), bucket,
                left_id="id", right_id="id").collect()))
            assert got == want, bucket

    def test_exact_bands_beyond_2_53(self, spark):
        """r5 ADVICE pin: band = floor(s/bucket) used to go through
        DOUBLE, so |start| >= 2^53 could land in the wrong band and
        silently drop overlapping pairs. The integer pmod/div path is
        exact at any long magnitude — pin against brute force at
        ~4e18 offsets (positive and negative)."""
        from osmium_tool_spark.operators.asof import interval_join

        base = 4 * 10**18
        # neighbours 1 apart at huge magnitude: double floor(s/bucket)
        # cannot even distinguish s values (ulp(4e18) = 512)
        a = [(1, base + 3, base + 12), (2, -base - 12, -base - 3),
             (3, base + 13, base + 20)]
        b = [(10, base + 11, base + 15), (11, -base - 5, -base + 7),
             (12, base - 2, base + 4)]
        want = self._brute(a, b)
        for bucket in (1, 7, 1000):
            got = sorted(map(tuple, interval_join(
                self._iv(spark, a), self._iv(spark, b), bucket,
                left_id="id", right_id="id").collect()))
            assert got == want, bucket

    def test_empty_and_degenerate(self, spark):
        from osmium_tool_spark.operators.asof import interval_join

        a = [(1, 5, 5), (2, 9, 3)]  # empty / inverted dropped
        b = [(9, 0, 100)]
        assert interval_join(self._iv(spark, a), self._iv(spark, b), 10,
                             left_id="id", right_id="id").count() == 0

    def test_band_explosion_guard(self, spark):
        import pytest as _pytest

        from osmium_tool_spark.operators.asof import interval_join

        a = [(1, 0, 10**9)]
        b = [(9, 0, 100)]
        with _pytest.raises(Exception, match="band explosion"):
            interval_join(self._iv(spark, a), self._iv(spark, b), 1,
                          left_id="id", right_id="id").collect()
        with _pytest.raises(ValueError, match="positive"):
            interval_join(self._iv(spark, a), self._iv(spark, b), 0,
                          left_id="id", right_id="id")

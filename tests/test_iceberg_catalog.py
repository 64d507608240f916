"""sources/iceberg_catalog.IcebergTable — the real-Iceberg binding of
the SnapshotTable API (r4 verdict item 7).

The integration class skip-marks when no Iceberg catalog is registered
(this container ships no iceberg-spark-runtime jar — the lz4/zstd/PIL
pattern); the always-run tests pin the availability probe and the
loud, actionable error contract so the swap-in point cannot rot.
"""

import pytest

from osmium_tool_spark.sources.iceberg_catalog import (
    IcebergTable,
    iceberg_available,
)


def _has_iceberg(spark) -> bool:
    return iceberg_available(spark, "local")


class TestContractAlwaysRun:
    def test_unavailable_probe_is_false_not_raise(self, spark):
        assert iceberg_available(spark, "no_such_catalog") is False

    def test_loud_error_names_the_jar(self, spark):
        if _has_iceberg(spark):
            pytest.skip("Iceberg present: loud error N/A")
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            IcebergTable(spark, "local.db.t")

    def test_identifier_validation(self, spark):
        with pytest.raises(ValueError, match="catalog.namespace.table"):
            IcebergTable(spark, "just_a_table")


class TestIntegration:
    """Runs only with a real Iceberg catalog registered as `local`."""

    @pytest.fixture(autouse=True)
    def _skip_without_jar(self, spark):
        if not _has_iceberg(spark):
            pytest.skip("no Iceberg catalog registered (jar absent)")

    def test_append_time_travel_rollback_expire(self, spark):
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.osmspark_it")
        t = IcebergTable(spark, "local.osmspark_it.snap_roundtrip")
        df1 = spark.range(3).selectExpr("id", "id * 10 AS v")
        t.create_or_replace(df1)
        s1 = t.current_id()
        t.append(spark.range(3, 5).selectExpr("id", "id * 10 AS v"))
        s2 = t.current_id()
        assert s2 != s1
        assert t.read().count() == 5
        assert t.read(snapshot_id=s1).count() == 3  # time travel
        t.rollback(s1)
        assert t.read().count() == 3
        assert len(t.snapshot_ids()) >= 2  # history append-only
        t.expire(keep_last=1)

    def test_merge_into(self, spark):
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.osmspark_it")
        t = IcebergTable(spark, "local.osmspark_it.snap_merge")
        t.create_or_replace(
            spark.range(4).selectExpr("id", "id AS v")
        )
        src = spark.createDataFrame(
            [(2, 99), (10, 100)], "id long, v long"
        )
        t.merge_into(src, on_cols=["id"], update_cols=["v"])
        got = {r.id: r.v for r in t.read().collect()}
        assert got[2] == 99 and got[10] == 100 and len(got) == 5

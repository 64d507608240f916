"""Location-index operators: create/query the id->(lon,lat) table and
add-locations-to-ways.

Reference: /root/reference/src/command_create_locations_index.cpp:102-141
(materialize a dense on-disk id->location array),
command_query_locations_index.cpp:119-161 (point lookup / full dump),
command_add_locations_to_ways.cpp:140-195 (inline node locations into way
refs; --keep-untagged-nodes / --ignore-missing-nodes options).

Spark shape: the "index" is a (id, lon, lat) table bucketed/sorted by id —
point lookups are partition-pruned scans; the add-locations join is the
posexplode location join of operators/export.locations_join with the
coords re-attached as `locations: array<struct<lon,lat>>` (the
locations_on_ways file-format feature, man/osmium-file-formats.md:105-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import NODE, RELATION, WAY


def create_locations_index(entities: DataFrame, path: str, buckets: int = 64) -> None:
    """Materialize the id->location table, range-laid-out by id so point
    lookups prune files via parquet min/max stats (the DenseFileArray
    analog — command_create_locations_index.cpp:121)."""
    nodes = entities.filter(F.col("type") == NODE).select("id", "lon", "lat")
    nodes.repartitionByRange(buckets, "id").sortWithinPartitions("id").write.mode(
        "overwrite"
    ).parquet(path)


def query_locations_index(
    spark: SparkSession, path: str, ids: list[int] | None = None
) -> DataFrame:
    """Point lookup (ids given) or full dump (ids None) — the scan prunes
    row groups via the id sort order."""
    idx = spark.read.parquet(path)
    if ids is None:
        return idx.orderBy("id")
    return idx.filter(F.col("id").isin(ids)).orderBy("id")


def add_locations_to_ways(
    entities: DataFrame,
    ignore_missing_nodes: bool = False,
    keep_untagged_nodes: bool = False,
    keep_member_nodes: bool = False,
) -> DataFrame:
    """Attach per-ref locations to ways (`locations` column parallel to
    `refs`). Untagged nodes are dropped from the output unless
    keep_untagged_nodes (their job — providing locations — is done;
    command_add_locations_to_ways.cpp:140-160). keep_member_nodes also
    keeps untagged nodes referenced from a relation (find_member_nodes,
    command_add_locations_to_ways.cpp:162-185) — a relations→members
    explode + distinct semi-join instead of the reference's in-RAM sorted
    id vector, so the member set never funnels through the driver."""
    from .export import locations_join

    nodes = entities.filter(F.col("type") == NODE)
    ways = entities.filter(F.col("type") == WAY)
    others = entities.filter(~F.col("type").isin(NODE, WAY))

    wc = locations_join(ways, nodes)
    if not ignore_missing_nodes:
        # coalesce: ways with no refs have NULL coords -> NULL exists()
        missing = F.coalesce(
            F.exists(F.col("coords"), lambda c: c["__lon"].isNull()), F.lit(False)
        )
        wc = wc.withColumn("__missing", missing)
    locs = F.transform(
        F.col("coords"),
        # cast: fixture frames carry int32 coords, derived frames int64 —
        # normalize so the union with the null-typed columns lines up
        lambda c: F.struct(
            c["__lon"].cast("long").alias("lon"), c["__lat"].cast("long").alias("lat")
        ),
    )
    ways_out = wc.withColumn("locations", locs).drop("coords")

    if keep_untagged_nodes:
        nodes_out = nodes
    else:
        tagged = F.size(F.map_keys("tags")) > 0
        nodes_out = nodes.filter(tagged)
        if keep_member_nodes:
            # positive_ref/positive_id matching per the reference
            member_ids = (
                entities.filter(F.col("type") == RELATION)
                .select(F.explode("members").alias("m"))
                .filter(F.col("m.mtype") == NODE)
                .select(F.abs(F.col("m.ref")).alias("__pid"))
                .distinct()
            )
            untagged_members = (
                nodes.filter(~tagged)
                .withColumn("__pid", F.abs(F.col("id")))
                .join(member_ids, "__pid", "left_semi")
                .drop("__pid")
            )
            nodes_out = nodes_out.unionByName(untagged_members)
    nodes_out = nodes_out.withColumn(
        "locations", F.lit(None).cast("array<struct<lon:long,lat:long>>")
    )
    if not ignore_missing_nodes:
        nodes_out = nodes_out.withColumn("__missing", F.lit(False))
        others = others.withColumn("__missing", F.lit(False))
    others = others.withColumn(
        "locations", F.lit(None).cast("array<struct<lon:long,lat:long>>")
    )
    out = nodes_out.unionByName(ways_out).unionByName(others)
    if not ignore_missing_nodes:
        # surface referential failures instead of silently emitting ways
        # with NULL coordinates (the reference aborts; callers may filter)
        out = out.withColumnRenamed("__missing", "missing_locations")
    return out

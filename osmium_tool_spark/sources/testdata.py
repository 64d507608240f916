"""Deterministic entity-model derivations over the driver's TPC-H-ish
testdata (/root/testdata/sf*/\\*.parquet).

The engine's native data model is the OSM-style entity stream (schema.py)
grafted onto an image table (sources/images.py). For the driver's
correctness gate we derive entity tables from the provided parquet with
*portable arithmetic only* — every expression here has an exact ANSI-SQL
twin that DuckDB evaluates bit-identically (integer mul/mod, no engine
hash functions), so `__spark_entry__.oracle_sql` can restate each query.

Derivation (mirrors the reference's fixture style, test/extract/input1.osm):
  nodes      <- part      (id=p_partkey, lon/lat = Knuth-multiplicative mix)
  ways       <- orders    (refs = that order's l_partkeys by l_linenumber)
  relations  <- customer  (members = that customer's orders by o_orderkey)
  history    <- events    (object per user_id, versions by event time)
  changesets <- events    (bbox derived from event_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import NODE, RELATION, WAY

# Knuth multiplicative constants; products stay < 2^63 for all testdata keys
A_LON = 2654435761
A_LAT = 2246822519
LON_SPAN = 3_600_000_000
LAT_SPAN = 1_800_000_000
LON_OFF = 1_800_000_000
LAT_OFF = 900_000_000


def lon_expr(key):
    """Fixed-point lon in [-1.8e9, 1.8e9): (k*A_LON) % SPAN - OFF."""
    return (key.cast("long") * A_LON) % LON_SPAN - LON_OFF


def lat_expr(key):
    return (key.cast("long") * A_LAT) % LAT_SPAN - LAT_OFF


# SQL twins (DuckDB): keep in sync with the Column versions above
LON_SQL = "(({k}) * 2654435761) % 3600000000 - 1800000000"
LAT_SQL = "(({k}) * 2246822519) % 1800000000 - 900000000"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def nodes_from_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One node per part: tags carry brand/type/name, coords are a
    deterministic spread over the whole world."""
    part = load(spark, sf_dir, "part")
    return part.select(
        F.lit(NODE).alias("type"),
        F.col("p_partkey").alias("id"),
        F.lit(1).alias("version"),
        F.lit(True).alias("visible"),
        F.lit(0).cast("long").alias("changeset"),
        (F.col("p_partkey") * 1000).cast("long").alias("ts"),
        F.lit(0).alias("uid"),
        F.lit("").alias("user"),
        F.create_map(
            F.lit("brand"), F.col("p_brand"),
            F.lit("type"), F.col("p_type"),
            F.lit("name"), F.col("p_name"),
        ).alias("tags"),
        lon_expr(F.col("p_partkey")).cast("long").alias("lon"),
        lat_expr(F.col("p_partkey")).cast("long").alias("lat"),
        F.lit(None).cast("array<long>").alias("refs"),
        F.lit(None).cast("array<struct<mtype:int,ref:long,role:string>>").alias("members"),
    )


def ways_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One way per order; refs = the order's part keys in line order."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    refs = (
        li.groupBy("l_orderkey")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s.l_partkey,
            ).alias("refs")
        )
    )
    return (
        orders.join(refs, orders.o_orderkey == refs.l_orderkey, "left")
        .select(
            F.lit(WAY).alias("type"),
            F.col("o_orderkey").alias("id"),
            F.lit(1).alias("version"),
            F.lit(True).alias("visible"),
            F.lit(0).cast("long").alias("changeset"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts"),
            F.lit(0).alias("uid"),
            F.lit("").alias("user"),
            F.create_map(
                F.lit("priority"), F.col("o_orderpriority"),
                F.lit("status"), F.col("o_orderstatus"),
            ).alias("tags"),
            F.lit(None).cast("long").alias("lon"),
            F.lit(None).cast("long").alias("lat"),
            F.coalesce(F.col("refs"), F.array().cast("array<long>")).alias("refs"),
            F.lit(None).cast("array<struct<mtype:int,ref:long,role:string>>").alias("members"),
        )
    )


def relations_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One relation per customer; members = the customer's orders (ways) in
    orderkey order. Customers without orders get no members array entry
    (empty array)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    mem = (
        orders.groupBy("o_custkey")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("o_orderkey")))),
                lambda s: F.struct(
                    F.lit(WAY).alias("mtype"),
                    s.o_orderkey.alias("ref"),
                    F.lit("order").alias("role"),
                ),
            ).alias("members")
        )
    )
    return (
        cust.join(mem, cust.c_custkey == mem.o_custkey, "left")
        .select(
            F.lit(RELATION).alias("type"),
            F.col("c_custkey").alias("id"),
            F.lit(1).alias("version"),
            F.lit(True).alias("visible"),
            F.lit(0).cast("long").alias("changeset"),
            (F.col("c_custkey") * 1000).cast("long").alias("ts"),
            F.lit(0).alias("uid"),
            F.lit("").alias("user"),
            F.create_map(F.lit("segment"), F.col("c_mktsegment")).alias("tags"),
            F.lit(None).cast("long").alias("lon"),
            F.lit(None).cast("long").alias("lat"),
            F.lit(None).cast("array<long>").alias("refs"),
            F.coalesce(
                F.col("members"),
                F.array().cast("array<struct<mtype:int,ref:long,role:string>>"),
            ).alias("members"),
        )
    )


def entities(spark: SparkSession, sf_dir: str, materialize: bool = True) -> DataFrame:
    """The full heterogeneous entity stream.

    With `materialize` (default) the derivation is written once per sf_dir
    to a deterministic /tmp location and re-read as parquet — multi-pass
    operators then scan a columnar table (the production shape: the entity
    table EXISTS; deriving it per query re-runs two groupBy joins)."""
    df = (
        nodes_from_part(spark, sf_dir)
        .unionByName(ways_from_orders(spark, sf_dir))
        .unionByName(relations_from_customer(spark, sf_dir))
    )
    if not materialize:
        return df
    import hashlib
    import os

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/osmium_entities_{tag}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # write to a private dir + atomic rename: concurrent processes race
        # benignly (first rename wins, losers read the winner's output)
        tmp = f"{path}.tmp.{os.getpid()}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def history_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-object history: one object per user_id; its events ordered
    by (ts, event_id) are versions 1..n; 'error' events are deletions
    (visible=false) — the .osh analog."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.lit(NODE).alias("type"),
        F.col("user_id").alias("id"),
        F.row_number().over(w).alias("version"),
        (F.col("event_type") != "error").alias("visible"),
        F.col("event_id").alias("changeset"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
        F.lit(0).alias("uid"),
        F.lit("").alias("user"),
        F.create_map(F.lit("etype"), F.col("event_type")).alias("tags"),
        lon_expr(F.col("event_id")).alias("lon"),
        lat_expr(F.col("event_id")).alias("lat"),
        F.lit(None).cast("array<long>").alias("refs"),
        F.lit(None).cast("array<struct<mtype:int,ref:long,role:string>>").alias("members"),
    )


def changesets_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changeset analog (command_changeset_filter.cpp predicate targets):
    id, created_at/closed_at (epoch micros; closed_at NULL while open),
    open flag, uid, num_changes, num_comments, and a small bbox centred on
    a deterministic point."""
    ev = load(spark, sf_dir, "events")
    clon = lon_expr(F.col("event_id"))
    clat = lat_expr(F.col("event_id"))
    half = 50_000_000  # 5 degrees in fixed-point
    created = F.unix_micros(F.col("ts").cast("timestamp"))
    is_open = F.col("event_type").isin("view", "click")
    # deterministic lifetime: up to 1 day after creation
    closed = created + (F.col("event_id") % 86_400) * F.lit(1_000_000)
    return ev.select(
        F.col("event_id").alias("id"),
        created.alias("created_at"),
        F.when(~is_open, closed).alias("closed_at"),
        is_open.alias("open"),
        F.col("user_id").cast("int").alias("uid"),
        F.lit("").alias("user"),
        # floor (not cast) — Spark's double->long cast truncates while the
        # SQL oracle's CAST rounds; floor agrees everywhere
        F.floor(F.col("value") * 100).cast("long").alias("num_changes"),
        (F.col("event_id") % 4).cast("long").alias("num_comments"),
        (clon - half).alias("min_lon"),
        (clon + half).alias("max_lon"),
        (clat - half).alias("min_lat"),
        (clat + half).alias("max_lat"),
    )


# local-trajectory constants: vertex offsets stay within +-1 degree of the
# way's base point so segment bboxes are cell-sized (no planet chords) —
# the shape a segment-level spatial join is designed for. SQL twins below.
TRAJ_D = 10_000_000  # 1 degree in fixed-point units
A_DX = 1013904223
A_DY = 1597334677


def local_way_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LOCAL polyline per order: vertex k sits at the way's Knuth-mixed
    base point plus a deterministic offset in [-1, 1] degrees, ordered by
    l_linenumber; consecutive vertices become segments.

    (way_id, seq, x1, y1, x2, y2) — fixed-point coords, seq = the leading
    vertex's l_linenumber. Ways have <= 7 vertices (TPC-H line numbers),
    segments <= ~2.8 degrees long: the localized-trajectory shape that
    segment-intersection joins (operators/spatial_join.segment_crossings)
    index by cell. Every expression is integer arithmetic with an exact
    DuckDB twin (oracle_sql 'ways_crossing')."""
    li = load(spark, sf_dir, "lineitem")
    span = 2 * TRAJ_D + 1
    v = li.select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.col("l_partkey").cast("long").alias("pk"),
        (
            lon_expr(F.col("l_orderkey"))
            + (F.col("l_partkey") * A_DX + F.col("l_linenumber") * A_LON) % span
            - TRAJ_D
        ).cast("long").alias("x"),
        (
            lat_expr(F.col("l_orderkey"))
            + (F.col("l_partkey") * A_DY + F.col("l_linenumber") * A_LAT) % span
            - TRAJ_D
        ).cast("long").alias("y"),
    )
    # l_linenumber is NOT unique per order in this testdata (and a few
    # (linenumber, partkey) pairs fully repeat) — order by (ln, pk), which
    # is total UP TO rows with identical coords, so the vertex sequence is
    # deterministic; seq = row_number gives segments a stable unique id.
    w = Window.partitionBy("way_id").orderBy("ln", "pk")
    return (
        v.select(
            "way_id",
            F.row_number().over(w).cast("long").alias("seq"),
            F.col("x").alias("x1"), F.col("y").alias("y1"),
            F.lead("x").over(w).alias("x2"), F.lead("y").over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
    )

"""Aggregation operators: fileinfo / tags-count.

Reference: /root/reference/src/command_fileinfo.cpp:75-187 (one-pass
profile: per-type counts, min/max ids, bbox, timestamps, orderedness, CRC),
command_tags_count.cpp (key / key=value occurrence counts with min/max-count
HAVING filter and 4 sort orders).

Both are single groupBy/agg jobs — map-side partial aggregation + one
shuffle; at 100 TB these are the cheapest operators in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fileinfo(entities: DataFrame) -> DataFrame:
    """Per-type stats + global bbox/timestamps. Columns:
    type, count, min_id, max_id, max_version, min_ts, max_ts,
    min_lon, max_lon, min_lat, max_lat (lon/lat only for nodes)."""
    return (
        entities.groupBy("type")
        .agg(
            F.count("*").alias("count"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            F.max("version").alias("max_version"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.min("lon").alias("min_lon"),
            F.max("lon").alias("max_lon"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
        )
        .orderBy("type")
    )


def fileinfo_crc(entities: DataFrame) -> DataFrame:
    """Content fingerprint: xxhash64 over the canonical row encoding,
    combined order-independently with bit_xor (a sum would overflow int64
    under ANSI mode) — the distributed analog of the reference's streaming
    CRC32 (command_fileinfo.cpp:102-126).
    """
    row_hash = F.xxhash64(
        F.col("type"), F.col("id"), F.col("version"), F.col("visible"), F.col("ts"),
        F.array_sort(F.map_entries("tags")),  # maps are unhashable directly
        F.col("lon"), F.col("lat"), F.col("refs"), F.col("members"),
    )
    return entities.agg(
        F.bit_xor(row_hash).alias("content_hash"), F.count("*").alias("rows")
    )


def tags_count(
    entities: DataFrame,
    expressions: list[str] | None = None,
    count_values: bool = False,
    min_count: int | None = None,
    max_count: int | None = None,
    sort_order: str = "count-desc",
) -> DataFrame:
    """Count tag keys (or key=value pairs) matching the expressions.

    Sort orders (command_tags_count.cpp:76-109): count-desc (default,
    tie-break name asc), count-asc, name-asc, name-desc. Output columns:
    (count, key[, value], rank).
    """
    kv = entities.select(F.explode_outer("tags").alias("key", "value")).filter(
        F.col("key").isNotNull()
    )
    if expressions:
        from ..functions.tagexpr import TagMatcher

        conds = None
        for e in expressions:
            m = TagMatcher.parse(e)
            if m.value is None:
                c = m.key.col(F.col("key"))
            else:
                c = m.key.col(F.col("key")) & (
                    ~m.value.col(F.col("value")) if m.invert else m.value.col(F.col("value"))
                )
            conds = c if conds is None else (conds | c)
        kv = kv.filter(conds)

    group = ["key", "value"] if count_values else ["key"]
    out = kv.groupBy(*group).agg(F.count("*").alias("count"))
    if min_count is not None:
        out = out.filter(F.col("count") >= min_count)
    if max_count is not None:
        out = out.filter(F.col("count") <= max_count)

    name_cols = [F.asc("key")] + ([F.asc("value")] if count_values else [])
    orders = {
        "count-desc": [F.desc("count")] + name_cols,
        "count-asc": [F.asc("count")] + name_cols,
        "name-asc": name_cols,
        "name-desc": [F.desc("key")] + ([F.desc("value")] if count_values else []),
    }
    if sort_order not in orders:
        raise ValueError(f"unknown sort order {sort_order!r}")
    # rank via distributed zipWithIndex — an unpartitioned Window.orderBy
    # would funnel the (possibly 10^8-distinct-key) result through one task
    from ..functions.zipindex import dense_index

    return dense_index(out, orders[sort_order], index_name="rank").orderBy("rank")

"""Distributed dense indexing (the "zipWithIndex" recipe).

A `row_number() over (partition by <3 type values> order by key)` window
serializes the whole table through <=3 tasks — the classic
single-partition-window scale killer (flagged for renumber/tags_count in
round-1 VERDICT). The scalable equivalent:

  1. repartitionByRange(group, key)  — partitions hold contiguous key
     ranges, each bounded by total/n rows;
  2. count rows per (physical partition, group)  — a tiny aggregate
     (n_partitions x n_groups rows) collected to the driver;
  3. prefix-sum those counts per group on the driver and broadcast the
     per-partition offsets back;
  4. row_number WITHIN each (partition, group) + offset  — every window
     task sees at most one range partition's rows, all in parallel.

The result is bit-identical to the global window (given a total order on
the key within each group) but the critical path is one balanced range
shuffle instead of a single-task sort. This mirrors the reference's
renumber id_map (/root/reference/src/command_renumber.cpp:61-91) which is
a sequential in-RAM scan — the distributed analog needs the prefix-sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_index(
    df: DataFrame,
    order_cols: list[Column],
    part_col: str | None = None,
    index_name: str = "new_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense index column in `order_cols` order (per
    `part_col` group if given) without a global single-task window.

    `order_cols` may include sort directions (F.desc(...)); they must
    totally order rows within each group (ties would make the index
    nondeterministic — same contract as row_number). The repartitioned
    input is localCheckpoint'ed: the counts job and the assignment job
    MUST see identical physical partitioning (range-partitioner sampling
    is not replayed against live lineage).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    range_cols = ([F.col(part_col)] if part_col else []) + list(order_cols)
    d = df.repartitionByRange(n, *range_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=True)

    group = ["__pid"] + ([part_col] if part_col else [])
    counts = d.groupBy(*group).agg(F.count("*").alias("__cnt")).collect()
    key_of = (lambda r: r[part_col]) if part_col else (lambda r: None)
    counts.sort(key=lambda r: ((key_of(r) is None, key_of(r)), r["__pid"]))
    acc: dict = {}
    rows = []
    for r in counts:
        g = key_of(r)
        rows.append((r["__pid"], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + r["__cnt"]

    if part_col:
        gtype = df.schema[part_col].dataType
        from pyspark.sql import types as T

        off_schema = T.StructType(
            [
                T.StructField("__pid", T.IntegerType(), False),
                T.StructField(part_col, gtype, True),
                T.StructField("__off", T.LongType(), False),
            ]
        )
        off = spark.createDataFrame(rows, off_schema)
        join_on = ["__pid", part_col]
    else:
        off = spark.createDataFrame(
            [(p, o) for p, _g, o in rows], "__pid int, __off long"
        )
        join_on = ["__pid"]

    w = Window.partitionBy(*group).orderBy(*order_cols)
    return (
        d.withColumn("__zi_rn", F.row_number().over(w))
        .join(F.broadcast(off), on=join_on)
        .withColumn(index_name, (F.col("__off") + F.col("__zi_rn")).cast("long"))
        .drop("__pid", "__zi_rn", "__off")
    )

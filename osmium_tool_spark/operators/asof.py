"""As-of join — each left row matched to the latest right row at or
before its timestamp, per key.

The temporal-join primitive the engine's CDC surface builds on
implicitly (time-filter is "snapshot as-of T for ALL ids"; this is the
row-wise generalization: every left row carries its own T). Spark has
no built-in as-of join; the scalable formulation is the union trick —
NOT a range theta-join (which Spark would plan as a broadcast
nested-loop: a cross product at 10^12 rows):

  1. union left probes and right updates into one frame, tagged;
  2. one window per key ordered by (ts, tag) — right rows sort BEFORE
     left rows at equal timestamps, giving the inclusive `l.ts >= r.ts`
     semantics of DuckDB/kdb ASOF;
  3. last_value(..., ignorenulls) forward-fills the right payload;
  4. keep the left rows.

Plan shape: ONE hash exchange on the key feeding one running window —
the same shape as sessionize_batch; no join node at all, so there is
nothing to mis-plan. Right-side duplicates per (key, ts) must be
resolved by the caller (pre-aggregate) — forward-fill would otherwise
pick the physically-last one, which is not a deterministic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """left columns + the latest right `value_cols` with right.ts <= left.ts
    (same key); nulls where no right row precedes the probe.

    `ts` must be consistently ordered between the two frames (use epoch
    numbers or timestamps in the same zone discipline).
    """
    left_cols = left.columns
    l = left.withColumn("__tag", F.lit(1))
    for c in value_cols:
        if c in l.columns:
            raise ValueError(f"asof_join: left already has a column named {c!r}")
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__tag"), *value_cols
    )
    u = l.select(F.col(key), F.col(ts), F.col("__tag"), *value_cols, *[
        c for c in left_cols if c not in (key, ts)
    ]).unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("__tag") == 1).drop("__tag")

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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair of HALF-OPEN
    intervals [start, end) that overlap — (id_a, id_b, ov_start,
    ov_end). The 1-D temporal sibling of dist_join's cell trick, and
    the missing classic next to asof_join (which matches a POINT to
    its preceding interval): session x outage overlap, validity-window
    intersection over history_intervals output, ad-impression x
    campaign windows.

    Spark plans a raw `l.start < r.end AND r.start < l.end` theta-join
    as a broadcast nested loop — a cross product at scale. The banded
    formulation stays an EQUI-join: each interval emits one row per
    `bucket`-sized time band it touches, pairs meet on the band key,
    and the exact overlap predicate filters. An overlapping pair would
    meet in EVERY shared band — the standard dedup rule keeps only the
    band containing max(l.start, r.start) (each pair's overlap start
    lies in exactly one band), so no distinct pass and no double
    counting. Candidate volume is sum over bands of n_l x n_r — local
    density, not corpus size; `bucket` tunes span-explosion vs
    band-crowding exactly like dist_join's radius-derived resolution
    (pick bucket ~ the median interval length; a degenerate interval
    longer than ~1e6 buckets fails loud rather than exploding).

    Exact integer semantics throughout: half-open overlap iff
    l.start < r.end AND r.start < l.end; ov_start/ov_end are the
    intersection bounds.
    """
    if bucket <= 0:
        raise ValueError(f"interval_join: bucket must be positive, got {bucket}")

    def banded(df: DataFrame, idc: str, side: str) -> DataFrame:
        # Exact integer floor-division banding (r5 ADVICE fix): the
        # old F.floor(s / bucket) went through DOUBLE, which above
        # 2^53 can round into the wrong band and silently drop or
        # double-count pairs. pmod subtracts the sign-adjusted
        # remainder so `div` (exact on BIGINT, here exactly
        # divisible) IS the mathematical floor for negatives too.
        s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
        staged0 = df.select(
            F.col(idc).alias(f"id_{side}"),
            s.alias(f"s_{side}"),
            e.alias(f"e_{side}"),
        ).filter(F.col(f"s_{side}") < F.col(f"e_{side}"))
        sc, ec = f"s_{side}", f"e_{side}"
        first_b = F.expr(f"({sc} - pmod({sc}, {bucket})) div {bucket}")
        last_b = F.expr(
            f"(({ec} - 1) - pmod({ec} - 1, {bucket})) div {bucket}"
        )
        n_bands = F.greatest(last_b - first_b + 1, F.lit(1))
        staged = staged0.select(
            f"id_{side}",
            sc,
            ec,
            first_b.cast("long").alias("__fb"),
            n_bands.cast("long").alias("__nb"),
        )
        # band-explosion guard evaluated IN the plan (no extra job):
        # the task fails loud the moment a degenerate interval appears
        staged = staged.withColumn(
            "__nb",
            F.when(
                F.col("__nb") <= 1_000_000, F.col("__nb")
            ).otherwise(
                F.assert_true(
                    F.lit(False),
                    F.lit(
                        "interval_join: an interval spans > 1e6 buckets"
                        " — raise `bucket` (band explosion guard)"
                    ),
                ).cast("long")
            ),
        )
        return staged.select(
            f"id_{side}",
            f"s_{side}",
            f"e_{side}",
            F.explode(
                F.sequence(F.col("__fb"), F.col("__fb") + F.col("__nb") - 1)
            ).alias("band"),
        )

    la = banded(left, left_id, "a")
    rb = banded(right, right_id, "b")
    ov_s = F.greatest(F.col("s_a"), F.col("s_b"))
    ov_e = F.least(F.col("e_a"), F.col("e_b"))
    # same exact floor-division as in banded(): the dedup band of the
    # overlap start must land in the identical band arithmetic
    ov_band = F.expr(
        f"(greatest(s_a, s_b) - pmod(greatest(s_a, s_b), {bucket}))"
        f" div {bucket}"
    )
    return (
        la.join(rb, "band")
        .filter(
            (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
            & (ov_band.cast("long") == F.col("band"))
        )
        .select(
            "id_a",
            "id_b",
            ov_s.alias("ov_start"),
            ov_e.alias("ov_end"),
        )
    )

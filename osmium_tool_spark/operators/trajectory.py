"""Trajectory resampling: fixed-interval track normalization.

Training pipelines over movement data (and the map-matching /
sessionization ops next door) want tracks on a UNIFORM clock — raw GPS
points arrive at irregular intervals. `resample_track` emits one
interpolated sample at every multiple of ``step`` inside each track's
time span: per-key `lead` window to form segments, a codegen'd
`sequence` for the sample clock (each sample belongs to the segment
with t_i <= k*step < t_{i+1}, so no boundary duplicates), and linear
interpolation in the single-division IEEE form both engines evaluate
bit-identically (ints are exact in doubles below 2^53; one correctly-
rounded divide, one multiply, one add — the contour_segments
precedent).

Scale shape: one window exchange keyed by track, then a bounded explode
(samples per segment = gap/step) — no joins, no driver state. Dense
supersampling (step << median gap) multiplies rows linearly; pick step
near the target model's tick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_track(
    points: DataFrame,
    step: int,
    key_col: str = "key",
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(key, t, x, y) samples at every t = k*step (a global phase — all
    tracks share the clock) with t_first <= t <= t_last per track,
    linearly interpolated within the bracketing segment; the final
    point is emitted iff t_last is itself on the clock. Ties in ``ts``
    order by... duplicate timestamps make zero-length segments, which
    emit nothing (the later row wins the next segment's start).
    Timestamps/coords must be integers (epoch micros / fixed-point)."""
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    # (ts, x, y) ordering: the coordinate tiebreak makes duplicate
    # timestamps deterministic across partitionings and engines
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(x_col).asc(), F.col(y_col).asc()
    )
    seg = points.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("t1"),
        F.col(x_col).cast("long").alias("x1"),
        F.col(y_col).cast("long").alias("y1"),
        F.lead(F.col(ts_col).cast("long")).over(w).alias("t2"),
        F.lead(F.col(x_col).cast("long")).over(w).alias("x2"),
        F.lead(F.col(y_col).cast("long")).over(w).alias("y2"),
    )

    # interior samples: ceil(t1/step) .. ceil(t2/step)-1 (k*step < t2)
    k1 = F.ceil(F.col("t1") / F.lit(float(step))).cast("long")
    k2 = F.ceil(F.col("t2") / F.lit(float(step))).cast("long") - 1
    ks = F.when(
        F.col("t2").isNotNull() & (k1 <= k2), F.sequence(k1, k2)
    ).otherwise(
        # track end: emit t_last itself iff it sits on the clock
        F.when(
            F.col("t2").isNull() & (F.col("t1") % step == 0),
            F.array(F.floor(F.col("t1") / F.lit(float(step))).cast("long")),
        ).otherwise(F.array().cast("array<long>"))
    )
    ex = seg.select("key", "t1", "x1", "y1", "t2", "x2", "y2",
                    F.explode(ks).alias("k"))
    t = F.col("k") * step
    frac = (t - F.col("t1")).cast("double") / (
        F.col("t2") - F.col("t1")
    ).cast("double")
    interp_x = F.col("x1").cast("double") + (
        F.col("x2") - F.col("x1")
    ).cast("double") * frac
    interp_y = F.col("y1").cast("double") + (
        F.col("y2") - F.col("y1")
    ).cast("double") * frac
    end = F.col("t2").isNull()
    return ex.select(
        "key",
        t.alias("t"),
        F.when(end, F.col("x1").cast("double")).otherwise(interp_x).alias("x"),
        F.when(end, F.col("y1").cast("double")).otherwise(interp_y).alias("y"),
    )

"""Skew handling: detection + salted two-phase aggregation/join.

The reference never needed this (single machine); at 10^12 rows dense
extract regions (osmium's classic planet-extract hotspot) make a handful
of cells/keys carry orders of magnitude more rows than the median —
SURVEY.md §4 "Skew" row, BASELINE.json north_rule ("salted repartitioning
to defuse skew from dense extract regions").

Three layers, used together:
  1. AQE skew-join splitting (on by default in session.py) fixes join-side
     stragglers at runtime;
  2. `detect_skew` measures per-key mass cheaply (sampled count-by-key) so
     jobs can decide salting factors BEFORE the expensive stage;
  3. `salted_count_by` / `salt_column` implement the classic two-phase
     pattern: group on (key, salt) first — map-side combine spreads the
     hot key over `n_salts` reducers — then re-aggregate on key alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def detect_skew(
    df: DataFrame, keys: list[str], threshold: float = 10.0, sample_fraction: float | None = None
) -> DataFrame:
    """Keys whose row mass exceeds `threshold` x the mean per-key mass.

    Returns (keys..., cnt, ratio) for hot keys; run on a sample for huge
    inputs (counts scale up by 1/fraction only in expectation — fine for a
    salting decision)."""
    d = df.sample(sample_fraction) if sample_fraction else df
    counts = d.groupBy(*keys).agg(F.count("*").alias("cnt"))
    mean = counts.agg(F.avg("cnt").alias("m")).collect()[0]["m"] or 1.0
    return counts.withColumn("ratio", F.col("cnt") / F.lit(mean)).filter(
        F.col("ratio") >= threshold
    )


def salt_column(id_col: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): spreads one hot key over
    n_salts shuffle partitions without RNG (repeatable plans)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_salts)).cast("int")


def salted_count_by(
    df: DataFrame, keys: list[str], id_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase count: groupBy(keys+salt) -> groupBy(keys).

    Phase 1's shuffle keys carry the salt, so a hot key's rows land on
    n_salts reducers; phase 2 merges n_salts partials per key (tiny).
    Identical result to a plain count, skew-proof plan."""
    phase1 = df.withColumn("__salt", salt_column(F.col(id_col), n_salts)).groupBy(
        *keys, "__salt"
    ).agg(F.count("*").alias("__c"))
    return phase1.groupBy(*keys).agg(F.sum("__c").cast("long").alias("cnt"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates.

    aggs maps column -> fn in {sum, count, min, max}; each is computed
    per (keys, salt) then re-combined per keys (sum->sum, count->sum,
    min->min, max->max)."""
    phase1_exprs, phase2_exprs = [], []
    for col, fn in aggs.items():
        name = f"{fn}_{col}"
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(name))
            phase2_exprs.append(F.sum(name).cast("long").alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(name))
            phase2_exprs.append(F.sum(name).alias(name))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(name))
            phase2_exprs.append(F.min(name).alias(name))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(name))
            phase2_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    phase1 = df.withColumn("__salt", salt_column(F.col(id_col), n_salts)).groupBy(
        *keys, "__salt"
    ).agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def broadcast_salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salts: int = 16
) -> DataFrame:
    """Skew-proof equi-join: replicate the (broadcastable) small side
    n_salts times and join on (key, salt) — every hot key's rows spread
    over n_salts tasks. Use when AQE's runtime splitting isn't available
    (e.g. inside a streaming micro-batch)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_s = big.withColumn("__salt", salt_column(F.col(on), n_salts))
    return big_s.join(F.broadcast(small_rep), on=[on, "__salt"]).drop("__salt")

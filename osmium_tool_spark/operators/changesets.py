"""`changeset-filter` — conjunctive predicate filter over changesets.

Reference: /root/reference/src/command_changeset_filter.cpp:233-251 — all
given predicates must hold (AND): open/closed, with/without changes,
uid, user, time window (after/before on created_at/closed_at), and
bbox overlap (:249, box intersection test).

Spark shape: one `df.filter(conjunction)` — fully pushed down to the scan
(PushedFilters on every scalar predicate; the bbox overlap is four interval
comparisons, also pushable). No shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bbox_overlap(
    min_lon: Column, max_lon: Column, min_lat: Column, max_lat: Column,
    left: int, bottom: int, right: int, top: int,
) -> Column:
    """Closed-interval box intersection (extract_bbox.cpp:30-32 semantics)."""
    return (min_lon <= right) & (max_lon >= left) & (min_lat <= top) & (max_lat >= bottom)


def changeset_filter(
    changesets: DataFrame,
    open_: bool | None = None,
    with_changes: bool | None = None,
    with_discussion: bool | None = None,
    uid: int | None = None,
    uids: list[int] | None = None,
    user: str | None = None,
    after: int | None = None,
    before: int | None = None,
    bbox: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """AND of all supplied predicates; times are epoch-micros.

    Time semantics match the reference exactly
    (command_changeset_filter.cpp:205-211): `after` keeps changesets that
    are still OPEN or closed at/after the time (closed_at >= after);
    `before` keeps changesets created at/before the time
    (created_at <= before). `with_discussion` tests num_comments."""
    conds: list[Column] = []
    if open_ is not None:
        conds.append(F.col("open") == open_)
    if with_changes is True:
        conds.append(F.col("num_changes") > 0)
    elif with_changes is False:
        conds.append(F.col("num_changes") == 0)
    if with_discussion is True:
        conds.append(F.col("num_comments") > 0)
    elif with_discussion is False:
        conds.append(F.col("num_comments") == 0)
    if uid is not None:
        conds.append(F.col("uid") == uid)
    if uids is not None:
        conds.append(F.col("uid").isin(uids))
    if user is not None:
        conds.append(F.col("user") == user)
    if after is not None:
        conds.append(F.col("open") | (F.col("closed_at") >= after))
    if before is not None:
        conds.append(F.col("created_at") <= before)
    if bbox is not None:
        left, bottom, right, top = bbox
        conds.append(
            bbox_overlap(
                F.col("min_lon"), F.col("max_lon"), F.col("min_lat"), F.col("max_lat"),
                left, bottom, right, top,
            )
        )
    out = changesets
    for c in conds:
        out = out.filter(c)
    return out

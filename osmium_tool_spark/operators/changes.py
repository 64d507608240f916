"""History / CDC operators: time-filter, apply-changes, derive-changes, diff.

Reference: /root/reference/src/command_time_filter.cpp (point-in-time
snapshot + range over history via diff-iterator pairing consecutive
versions), command_apply_changes.cpp (latest-version-wins upsert, ties
broken by LAST change file on the CLI :344-352; history mode = set union
:315-338), command_derive_changes.cpp (full-outer compare emitting
create/modify/delete), command_diff.cpp (sorted merge-join + per-column
CRC-refined equality).

Spark shape: the diff-iterator becomes a lead() window over
(type,id | version); merge-joins become full-outer equi-joins on
(type,id,version) — Catalyst picks sort-merge; apply-changes is the
canonical windowed-dedup "latest wins" (or MERGE INTO on Iceberg).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sortkeys import canonical_sort


def time_filter(history: DataFrame, t_from: int, t_to: int | None = None) -> DataFrame:
    """Point-in-time snapshot (t_to None): the version visible at t_from
    (DiffObject::is_visible_at — start<=t, end>t, visible). Range mode
    (DiffObject::is_between, golden-verified against
    test/time-filter/output-range-*.osh): start < to AND end > from, with
    the zero-length special case — a version superseded at its own
    timestamp (same-instant edits) is kept when that instant >= from.
    Tombstones kept in range mode (output is a history file).
    (command_time_filter.cpp:155-176 — an as-of join against constant T.)"""
    w = Window.partitionBy("type", "id").orderBy("version")
    with_next = history.withColumn("__next_ts", F.lead("ts").over(w))
    nxt = F.col("__next_ts")
    if t_to is None:
        out = with_next.filter(
            (F.col("ts") <= t_from)
            & (nxt.isNull() | (nxt > t_from))
            & F.col("visible")
        )
    else:
        end_ok = (
            nxt.isNull()
            | (nxt > t_from)
            | ((nxt == F.col("ts")) & (nxt >= t_from))
        )
        out = with_next.filter((F.col("ts") < t_to) & end_ok)
    return canonical_sort(out.drop("__next_ts"))


def history_intervals(history: DataFrame) -> DataFrame:
    """SCD-2 validity intervals from a history file: every (type, id,
    version) with the half-open window [valid_from, valid_to) during
    which it WAS the live version, plus is_current / is_delete flags.

    time_filter answers "the snapshot at instant T" by recomputing the
    lead() bound per query (command_time_filter.cpp:155-176 is the same
    rule one object at a time); materializing the intervals ONCE turns
    every subsequent as-of question into a range predicate — the
    slowly-changing-dimension table warehouses build from CDC streams,
    and the form a time-travel join against a 10^12-row history wants
    (valid_from <= T < coalesce(valid_to, inf) is sargable; parquet
    min/max stats prune whole files per T).

    valid_to is the NEXT version's timestamp (NULL while current —
    half-open, so same-instant re-edits yield zero-length windows,
    matching time_filter's is_visible_at rule that such versions are
    never visible at any instant). A tombstone (visible=false) still
    OPENS an interval — is_delete marks it; "visible at T" remains
    valid_from <= T < valid_to AND NOT is_delete, exactly
    DiffObject::is_visible_at.

    Scale shape: ONE window function over (type, id) — the same
    exchange time_filter already pays, paid once instead of per query;
    no join, no UDF, no second shuffle (the flags are column math over
    the lead).
    """
    w = Window.partitionBy("type", "id").orderBy("version")
    nxt = F.lead("ts").over(w)
    return history.select(
        "type",
        "id",
        "version",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        (~F.col("visible")).alias("is_delete"),
    )


def apply_changes(
    base: DataFrame,
    changes: list[DataFrame],
    with_history: bool = False,
    locations_on_ways: bool = False,
    redact: bool = False,
) -> DataFrame:
    """Apply change batches to a base snapshot.

    Data-file mode: per (type,id) the winning row is the one with highest
    (version, source_seq) — source_seq orders the change batches so the LAST
    batch wins ties (command_apply_changes.cpp:344-352); objects whose
    winner is a delete (visible=false) are dropped from the output.

    History mode: set-union keeping all versions; the reference's
    std::set_union equality is libosmium object order (type, id,
    version, timestamp), so a change object replaces an input object
    only when all four match (:333-338).

    Redact mode (--redact, :129-135 + :325-332): implies history mode;
    equality drops the timestamp (object_order_type_id_version_
    without_timestamp), so a change object wholesale-replaces the
    stored (type, id, version) — the history patch used to redact
    sensitive data from old versions.
    """
    if redact:
        if locations_on_ways:
            raise ValueError(
                "cannot use redact and locations_on_ways together"
            )
        with_history = True  # reference forces history mode (:129-135)
    tagged = [base.withColumn("__src", F.lit(0))] + [
        c.withColumn("__src", F.lit(i + 1)) for i, c in enumerate(changes)
    ]
    all_rows = reduce(DataFrame.unionByName, tagged)
    if with_history:
        key = ["type", "id", "version"]
        if not redact and "ts" in all_rows.columns:
            key.append("ts")
        w = Window.partitionBy(*key).orderBy(F.desc("__src"))
        out = (
            all_rows.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
        return canonical_sort(out)
    w = Window.partitionBy("type", "id").orderBy(F.desc("version"), F.desc("__src"))
    out = (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("visible"))
        .drop("__rn", "__src")
    )
    if locations_on_ways:
        from .locations import add_locations_to_ways

        out = add_locations_to_ways(
            out, ignore_missing_nodes=True, keep_untagged_nodes=True
        )
    return canonical_sort(out)


_CONTENT_COLS = ("visible", "ts", "tags", "lon", "lat", "refs", "members", "changeset", "uid", "user")


def _content_hash(prefix: str, ignore: set[str]):
    cols = []
    for c in _CONTENT_COLS:
        if c in ignore:
            continue
        col = F.col(f"{prefix}.{c}")
        if c == "tags":
            # maps are unhashable (nondeterministic entry order) -> canonical
            # sorted entries array
            col = F.array_sort(F.map_entries(col))
        cols.append(col)
    return F.xxhash64(*cols)


def diff(
    left: DataFrame,
    right: DataFrame,
    ignore: set[str] | None = None,
) -> DataFrame:
    """Two-way full-outer compare on (type,id,version); equality refined by a
    content hash over (visible,timestamp,tags,loc/refs/members,changeset,
    uid,user) minus `ignore`d columns (command_diff.cpp:278-381).

    Returns (type, id, version, status) with status in
    {'left','right','same','different'}."""
    ignore = ignore or set()
    l = left.alias("l")
    r = right.alias("r")
    j = l.join(r, on=["type", "id", "version"], how="full_outer")
    lh = _content_hash("l", ignore)
    rh = _content_hash("r", ignore)
    # presence markers: ts may legitimately be NULL, so use a non-null probe
    lpresent = F.col("l.visible").isNotNull()
    rpresent = F.col("r.visible").isNotNull()
    status = (
        F.when(~lpresent & rpresent, F.lit("right"))
        .when(lpresent & ~rpresent, F.lit("left"))
        .when(lh == rh, F.lit("same"))
        .otherwise(F.lit("different"))
    )
    return j.select("type", "id", "version", status.alias("status")).orderBy("type", "id", "version")


def replication_header(
    input_header: dict | None, t_from: int, t_to: int | None = None
) -> dict:
    """osmosis_replication_timestamp propagation for time-filter
    (command_time_filter.cpp:137-149): when the input header carries a
    replication timestamp at/after the filter's upper bound, the output
    header's timestamp becomes that bound (minus one second in range
    mode) — the filtered file can only vouch for data up to the cut.
    Filter times are epoch micros; the header value is ISO-8601 seconds.
    Unset/invalid input timestamps are ignored (reference behavior)."""
    import calendar
    import time as _time

    hdr: dict = {}
    raw = (input_header or {}).get("osmosis_replication_timestamp")
    if raw is None:
        return hdr
    try:
        if isinstance(raw, (int, float)):
            in_ts = int(raw)
        else:
            in_ts = calendar.timegm(_time.strptime(raw, "%Y-%m-%dT%H:%M:%SZ")) * 1_000_000
    except (ValueError, TypeError):
        return hdr
    upper = t_from if t_to is None else t_to
    if in_ts >= upper:
        out_ts = upper if t_to is None else upper - 1_000_000
        hdr["osmosis_replication_timestamp"] = _time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", _time.gmtime(out_ts // 1_000_000)
        )
    return hdr


def diff_compact(diff_df: DataFrame, suppress_common: bool = False) -> DataFrame:
    """Compact diff format (command_diff.cpp:216-247): one line per object,
    status mark + type char + id + ' v' + version — '-'=left-only,
    '+'=right-only, ' '=same, '*'=different (printed once, for the left
    object). `suppress_common` (-c) drops the 'same' lines."""
    d = diff_df.filter(F.col("status") != "same") if suppress_common else diff_df
    mark = (
        F.when(F.col("status") == "left", "-")
        .when(F.col("status") == "right", "+")
        .when(F.col("status") == "different", "*")
        .otherwise(" ")
    )
    tchar = (
        F.when(F.col("type") == 0, "n").when(F.col("type") == 1, "w").otherwise("r")
    )
    return d.select(
        F.concat(
            mark, tchar, F.col("id").cast("string"), F.lit(" v"), F.col("version").cast("string")
        ).alias("line")
    )


def diff_summary(diff_df: DataFrame) -> DataFrame:
    """Status counts for `-s` (command_diff.cpp:383-388): one row
    (left, right, same, different)."""
    return diff_df.agg(
        *[
            F.count(F.when(F.col("status") == s, 1)).alias(s)
            for s in ("left", "right", "same", "different")
        ]
    )


def derive_changes(
    old: DataFrame,
    new: DataFrame,
    increment_version: bool = False,
    keep_details: bool = False,
    update_timestamp: int | None = None,
) -> DataFrame:
    """Compute the change set old -> new (command_derive_changes.cpp
    merge loop): objects are matched per (type, id) and considered EQUAL
    when version matches and the timestamps match OR either side has no
    timestamp (libosmium object equality treats an unset timestamp as a
    wildcard — the only-version golden matrix pins this); unequal or
    new-only objects emit the NEW side (version 1 -> create, else modify
    — the change-writer convention), old-only objects emit synthesized
    deletion records (visible=false, only id/version/timestamp kept
    unless keep_details, version+1 if increment_version, ts overridden
    if update_timestamp). Output rows + `change_op` column.

    Works per (type,id) on latest versions (data files: <=1 version/object).
    """
    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, on=["type", "id"], how="full_outer")
    opresent = F.col("o.visible").isNotNull()
    npresent = F.col("n.visible").isNotNull()

    tsboth = F.col("o.ts").isNotNull() & F.col("n.ts").isNotNull()
    same = F.col("o.version").eqNullSafe(F.col("n.version")) & (
        ~tsboth | (F.col("o.ts") == F.col("n.ts"))
    )
    new_op = F.when(F.col("n.version") == 1, F.lit("create")).otherwise(F.lit("modify"))
    emitted = (
        j.filter(npresent & (~opresent | ~same))
        .select("n.*", new_op.alias("change_op"))
    )
    deleted = j.filter(opresent & ~npresent).select("o.*")
    deleted = deleted.withColumn("visible", F.lit(False)).withColumn("change_op", F.lit("delete"))
    if increment_version:
        deleted = deleted.withColumn("version", F.col("version") + 1)
    if update_timestamp is not None:
        deleted = deleted.withColumn("ts", F.lit(update_timestamp).cast("long"))
    if not keep_details:
        # golden output.osc: delete records keep only id/version/timestamp —
        # location, tags, refs/members, and user meta are all dropped
        deleted = (
            deleted.withColumn("tags", F.map_from_arrays(F.array(), F.array()))
            .withColumn("refs", F.when(F.col("refs").isNotNull(), F.array().cast("array<long>")))
            .withColumn(
                "members",
                F.when(F.col("members").isNotNull(), F.slice(F.col("members"), 1, 0)),
            )
            .withColumn("changeset", F.lit(None).cast("long"))
            .withColumn("uid", F.lit(0))
            .withColumn("user", F.lit(""))
            .withColumn("lon", F.lit(None).cast(dict(deleted.dtypes)["lon"]))
            .withColumn("lat", F.lit(None).cast(dict(deleted.dtypes)["lat"]))
        )
    out = emitted.unionByName(deleted)
    return canonical_sort(out)


def diff_marked(
    left: DataFrame,
    right: DataFrame,
    ignore: set[str] | None = None,
    suppress_common: bool = False,
) -> DataFrame:
    """Full-payload diff rows for the OPL output format (`osmium diff
    -f opl`, command_diff.cpp output handler; goldens test/diff/
    output.opl / output-c.opl): 'same' emits the left object once with a
    ' ' mark, 'left'/'right' emit '-'/'+', and 'different' emits BOTH
    sides — '-' left then '+' right. Returns the entity columns plus
    `mark`, in canonical (type, id, version, '-'-before-'+') order."""
    d = diff(left, right, ignore)
    key = ["type", "id", "version"]
    lmark = (
        F.when(F.col("status").isin("left", "different"), F.lit("-"))
        .when(F.col("status") == "same", F.lit(" "))
    )
    lj = (
        left.join(d, on=key)
        .withColumn("mark", lmark)
        .filter(F.col("mark").isNotNull())
    )
    rj = (
        right.join(d, on=key)
        .filter(F.col("status").isin("right", "different"))
        .withColumn("mark", F.lit("+"))
    )
    out = lj.unionByName(rj).drop("status")
    if suppress_common:
        out = out.filter(F.col("mark") != " ")
    rank = F.when(F.col("mark") == "+", 1).otherwise(0)
    return out.orderBy("type", "id", "version", rank)

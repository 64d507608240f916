"""Streaming maintenance of standing sketch tables — the incremental
half of operators/sketches.py.

A 10^12-row corpus is appended to continuously; re-scanning it to
refresh a sketch is the one thing a sketch exists to avoid. Because
every sketch in operators/sketches.py is MERGEABLE (HLL registers
max-merge, Bloom words OR-merge, count-min cells sum-merge), the
streaming shape is:

  landing dir --readStream--> micro-batches
      --foreachBatch-->
          1. build the batch's DELTA sketch (one scan of the batch)
          2. merge with the standing state (state is <= m rows — the
             merge input is two tiny tables, never the corpus)
          3. commit the merged state as a NEW SNAPSHOT of a
             sources.snapshots.SnapshotTable, tagged with batch_id

Exactly-once across replays: Structured Streaming's checkpoint replays
an uncommitted batch after a crash; the maintainer SKIPS any batch_id
at or below the last committed one (the snapshot manifest carries it),
so the merge is applied once no matter how often the batch is
re-delivered. The snapshot chain doubles as sketch TIME TRAVEL: the
state as of any batch is one `read(snapshot_id=...)` away, and expiry
keeps the chain bounded.

The state commit is `overwrite` (sketch state is a fixed-size
register/word/cell table, not an append-only log); old snapshots stay
readable until expired, so a reader pinned to snapshot k is never
invalidated by batch k+1.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.snapshots import SnapshotTable


class SketchMaintainer:
    """Maintains one standing sketch table through foreachBatch.

    ``build`` turns a micro-batch DataFrame into its delta sketch
    state; ``merge`` combines two states (both from
    operators/sketches.py: hll_registers/hll_merge,
    bloom_build/bloom_merge, cm_build/cm_merge — any mergeable state
    works). Wire into a stream with::

        q = (stream.writeStream
             .foreachBatch(maintainer.process_batch)
             .option("checkpointLocation", ckpt)
             .start())

    ``mode`` selects the commit shape: ``"overwrite"`` (default) for
    fixed-size mergeable state — the merged state replaces the current
    snapshot's; ``"append"`` for GROWING state (an index whose rows are
    per-corpus-row, e.g. IVF codes): the batch's delta is appended and
    ``merge`` is unused — the snapshot chain IS the merge.
    """

    def __init__(
        self,
        table: SnapshotTable,
        build: Callable[[DataFrame], DataFrame],
        merge: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
        mode: str = "overwrite",
    ):
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
        if mode == "overwrite" and merge is None:
            raise ValueError("overwrite mode needs a merge function")
        self.table = table
        self.build = build
        self.merge = merge
        self.mode = mode

    def last_committed_batch(self) -> int | None:
        sid = self.table.current_id()
        while sid:
            man = self.table.manifest(sid)
            b = man.get("batch_id")
            if b is not None:
                return int(b)
            sid = man.get("parent_id")
        return None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """foreachBatch hook. Returns a small metrics dict (also stamped
        into the snapshot manifest)."""
        spark = batch_df.sparkSession
        last = self.last_committed_batch()
        if last is not None and batch_id <= last:
            # checkpoint replay of an already-merged batch: exactly-once
            return {"batch_id": batch_id, "skipped": True}
        delta = self.build(batch_df)
        if self.mode == "append":
            # growing state: the delta only reads the BATCH, never the
            # table — a plain append commit
            sid = self.table.append(spark, delta, batch_id=batch_id)
        else:
            if self.table.current_id() is None:
                merged = delta
            else:
                merged = self.merge(self.table.read(spark), delta)
            # materialize BEFORE the overwrite commit: `merged` reads the
            # table's current files, and a lazy write that scans its own
            # target would race the state it replaces. The commit writes
            # to the NEW snapshot's dir (immutable files), so the only
            # ordering requirement is plan-materialization, which
            # .overwrite's write action performs against the still-live
            # old snapshot.
            sid = self.table.overwrite(spark, merged, batch_id=batch_id)
        man = self.table.manifest(sid)
        return {
            "batch_id": batch_id,
            "snapshot_id": sid,
            "state_rows": man["added_rows"],
            "skipped": False,
        }


def hll_maintainer(
    table: SnapshotTable,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
    hash: str = "xxhash64",
) -> SketchMaintainer:
    """Standing HLL register table updated per micro-batch."""
    from ..operators.sketches import hll_merge, hll_registers

    return SketchMaintainer(
        table,
        build=lambda df: hll_registers(df, group_cols, value_col, p, hash),
        merge=lambda a, b: hll_merge(a, b),
    )


def bloom_maintainer(
    table: SnapshotTable,
    value_col: str,
    k: int = 4,
    m_bits: int = 1 << 15,
    hash: str = "xxhash64",
) -> SketchMaintainer:
    """Standing Bloom filter updated per micro-batch — the streaming
    membership pre-filter (probe arrivals against it BEFORE the
    expensive standing-table anti-join)."""
    from ..operators.sketches import bloom_build, bloom_merge

    return SketchMaintainer(
        table,
        build=lambda df: bloom_build(df, value_col, k, m_bits, hash),
        merge=lambda a, b: bloom_merge(a, b),
    )


def cm_maintainer(
    table: SnapshotTable,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    hash: str = "xxhash64",
    weight_col: str | None = None,
) -> SketchMaintainer:
    """Standing count-min table updated per micro-batch."""
    from ..operators.sketches import cm_build, cm_merge

    return SketchMaintainer(
        table,
        build=lambda df: cm_build(df, value_col, d, w, hash, weight_col),
        merge=lambda a, b: cm_merge(a, b),
    )


def tile_maintainer(
    table: SnapshotTable,
    res: int,
    min_res: int = 0,
    lon: str = "lon",
    lat: str = "lat",
) -> SketchMaintainer:
    """Standing tile PYRAMID updated per micro-batch — incremental
    geospatial rollup. Not a sketch but the same mergeable-state
    contract: per-(res, cell) counts are sum-combinable, so each
    micro-batch contributes its own pyramid (operators/tiles.py
    tile_pyramid over batch-sized input) and the merge is
    union + one hash-agg over two AGGREGATE-sized tables. The corpus
    is scanned exactly once ever — the r4 gate's tile_rollup over
    10^12 rows becomes an O(delta) nightly increment, with the
    snapshot chain giving "map as of batch k" time travel."""
    from ..operators.tiles import tile_pyramid
    from pyspark.sql import functions as F

    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.unionByName(b)
            .groupBy("res", "cell")
            .agg(F.sum("n").alias("n"))
        )

    return SketchMaintainer(
        table,
        build=lambda df: tile_pyramid(df, res, min_res, lon=lon, lat=lat),
        merge=merge,
    )


def hist_maintainer(
    table: SnapshotTable,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> SketchMaintainer:
    """Standing fixed-grid histogram updated per micro-batch — grouped
    percentiles over the full corpus readable at any time from <= bins
    rows per group (operators/sketches.py hist_quantiles over the
    standing state), with the corpus scanned once ever."""
    from ..operators.sketches import hist_bins, hist_merge

    return SketchMaintainer(
        table,
        build=lambda df: hist_bins(df, group_cols, value_col, lo, hi, bins),
        merge=lambda a, b: hist_merge(a, b),
    )


def ann_index_maintainer(
    table: SnapshotTable,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SketchMaintainer:
    """Standing IVF-Flat ANN index grown per micro-batch (mode
    "append"): each arriving embedding batch is assigned to its nearest
    centroid under a FROZEN codebook (one Arrow-batched pass over the
    batch only) and its (id, embedding, cid) rows are appended. Query
    batches serve from the standing index via
    operators/similarity.ivf_probe_index — the corpus is never
    re-assigned, and snapshot time travel gives "index as of batch k"
    (e.g. to reproduce a retrieval run). Re-training the codebook is a
    batch-side decision: train new centroids, rebuild into a fresh
    table, swap readers — the frozen-codebook append path stays cheap."""
    from ..operators.similarity import ivf_assign
    from pyspark.sql import functions as F

    def build(df: DataFrame) -> DataFrame:
        return ivf_assign(df, centroids, vec_col, "cids", nprobe=1).select(
            id_col, vec_col, F.get("cids", 0).alias("cid")
        )

    return SketchMaintainer(table, build=build, mode="append")


def minhash_index_maintainer(
    table: SnapshotTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    band_size: int = 4,
) -> SketchMaintainer:
    """Standing MinHash LSH band index grown per micro-batch (mode
    "append") — near-dup-on-arrival at corpus scale: each arriving
    document batch is shingled/signed ONCE and its (id, band_idx,
    band) keys appended; probing a batch against the whole standing
    corpus (operators/dedup.py minhash_probe_index) is one equi-join
    on the band key, never a re-shingle of 10^12 documents. The
    exact-dedup sibling is streaming/image_ingest.py's anti-join; this
    is the NEAR-dup half the r3 verdict called the batch engine's job
    — made incremental by the standing index. Snapshot time travel =
    "index as of batch k"; probe-then-append within a batch also
    catches batch-vs-past dups before they enter."""
    from ..operators.dedup import minhash_bands

    return SketchMaintainer(
        table,
        build=lambda df: minhash_bands(
            df, id_col, text_col, n=n, num_perm=num_perm, band_size=band_size
        ),
        mode="append",
    )

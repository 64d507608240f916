"""Streaming standing-sketch maintenance (streaming/sketch_stream.py):
batch-sequence == direct-build equivalence for all three mergeable
sketches, exactly-once replay skip, snapshot time travel of the state,
and the end-to-end Structured Streaming drain + resume."""

import pytest
from pyspark.sql import functions as F

from osmium_tool_spark.sources.snapshots import SnapshotTable
from osmium_tool_spark.streaming.sketch_stream import (
    SketchMaintainer,
    bloom_maintainer,
    cm_maintainer,
    hll_maintainer,
)


def vals(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("v"))


def state_dict(df):
    return {tuple(r)[:-1]: tuple(r)[-1] for r in df.collect()}


class TestMaintainers:
    def test_hll_batches_equal_direct_build(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import hll_registers

        m = hll_maintainer(
            SnapshotTable(str(tmp_path / "t")), [], "v", p=8, hash="portable"
        )
        m.process_batch(vals(spark, 0, 400), 0)
        m.process_batch(vals(spark, 300, 800), 1)
        got = state_dict(m.table.read(spark))
        want = state_dict(hll_registers(vals(spark, 0, 800), [], "v", 8, "portable"))
        assert got == want

    def test_bloom_batches_equal_direct_build(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import bloom_build

        m = bloom_maintainer(
            SnapshotTable(str(tmp_path / "t")), "v", k=3, m_bits=2048, hash="portable"
        )
        m.process_batch(vals(spark, 0, 300), 0)
        m.process_batch(vals(spark, 200, 500), 1)
        got = state_dict(m.table.read(spark))
        want = state_dict(bloom_build(vals(spark, 0, 500), "v", 3, 2048, "portable"))
        assert got == want

    def test_cm_batches_equal_direct_build(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import cm_build

        m = cm_maintainer(
            SnapshotTable(str(tmp_path / "t")), "v", d=3, w=64, hash="portable"
        )
        m.process_batch(vals(spark, 0, 300), 0)
        m.process_batch(vals(spark, 0, 300), 1)  # same values count twice
        got = {(r.j, r.bucket): r.cnt for r in m.table.read(spark).collect()}
        want = {
            (r.j, r.bucket): 2 * r.cnt
            for r in cm_build(vals(spark, 0, 300), "v", 3, 64, "portable").collect()
        }
        assert got == want

    def test_exactly_once_replay_skipped(self, spark, tmp_path):
        m = bloom_maintainer(
            SnapshotTable(str(tmp_path / "t")), "v", k=3, m_bits=2048, hash="portable"
        )
        m.process_batch(vals(spark, 0, 100), 0)
        m.process_batch(vals(spark, 100, 200), 1)
        before = state_dict(m.table.read(spark))
        r = m.process_batch(vals(spark, 100, 200), 1)  # checkpoint replay
        assert r["skipped"] is True
        r0 = m.process_batch(vals(spark, 0, 100), 0)  # stale replay
        assert r0["skipped"] is True
        assert state_dict(m.table.read(spark)) == before
        assert m.last_committed_batch() == 1

    def test_state_time_travel(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import bloom_build

        m = bloom_maintainer(
            SnapshotTable(str(tmp_path / "t")), "v", k=3, m_bits=2048, hash="portable"
        )
        m.process_batch(vals(spark, 0, 100), 0)
        m.process_batch(vals(spark, 100, 200), 1)
        as_of_b0 = state_dict(m.table.read(spark, snapshot_id=1))
        want = state_dict(bloom_build(vals(spark, 0, 100), "v", 3, 2048, "portable"))
        assert as_of_b0 == want
        assert m.table.manifest(1)["batch_id"] == 0
        assert m.table.manifest(2)["batch_id"] == 1


class TestStream:
    def test_stream_drain_and_resume(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import bloom_build

        landing = str(tmp_path / "landing")
        ckpt = str(tmp_path / "ckpt")
        vals(spark, 0, 300).coalesce(1).write.mode("append").parquet(landing)
        vals(spark, 300, 600).coalesce(1).write.mode("append").parquet(landing)
        m = bloom_maintainer(
            SnapshotTable(str(tmp_path / "t")), "v", k=3, m_bits=4096, hash="portable"
        )

        def run():
            stream = (
                spark.readStream.schema("v long")
                .option("maxFilesPerTrigger", 1)
                .parquet(landing)
            )
            q = (
                stream.writeStream.foreachBatch(m.process_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        got = state_dict(m.table.read(spark))
        want = state_dict(bloom_build(vals(spark, 0, 600), "v", 3, 4096, "portable"))
        assert got == want

        # restart with new data: checkpoint skips old files, the state
        # advances by exactly the new batch
        vals(spark, 600, 900).coalesce(1).write.mode("append").parquet(landing)
        run()
        got2 = state_dict(m.table.read(spark))
        want2 = state_dict(bloom_build(vals(spark, 0, 900), "v", 3, 4096, "portable"))
        assert got2 == want2


class TestTileMaintainer:
    def test_incremental_pyramid_equals_direct(self, spark, tmp_path):
        from osmium_tool_spark.operators.tiles import tile_pyramid
        from osmium_tool_spark.streaming.sketch_stream import tile_maintainer

        S = 10_000_000

        def pts(lo, hi):
            return spark.range(lo, hi).select(
                (((F.col("id") * 37) % 300) * S - 150 * S).alias("lon"),
                (((F.col("id") * 53) % 150) * S - 75 * S).alias("lat"),
            )

        m = tile_maintainer(
            SnapshotTable(str(tmp_path / "t")), res=6, min_res=2
        )
        m.process_batch(pts(0, 400), 0)
        m.process_batch(pts(400, 900), 1)
        got = {(r.res, r.cell): r.n for r in m.table.read(spark).collect()}
        want = {
            (r.res, r.cell): r.n
            for r in tile_pyramid(pts(0, 900), 6, 2).collect()
        }
        assert got == want
        # replay skip keeps the state fixed
        assert m.process_batch(pts(400, 900), 1)["skipped"] is True
        assert {
            (r.res, r.cell): r.n for r in m.table.read(spark).collect()
        } == want


class TestHistMaintainer:
    def test_incremental_equals_direct_and_quantiles_read(self, spark, tmp_path):
        from osmium_tool_spark.operators.sketches import hist_bins, hist_quantiles
        from osmium_tool_spark.streaming.sketch_stream import hist_maintainer

        def xs(lo, hi):
            return spark.range(lo, hi).select(
                (F.col("id") % 2).cast("int").alias("g"),
                ((F.col("id") * 37) % 1000).cast("double").alias("x"),
            )

        m = hist_maintainer(
            SnapshotTable(str(tmp_path / "t")), ["g"], "x", 0.0, 1000.0, 128
        )
        m.process_batch(xs(0, 500), 0)
        m.process_batch(xs(500, 1200), 1)
        got = {(r.g, r.bin): r.cnt for r in m.table.read(spark).collect()}
        want = {
            (r.g, r.bin): r.cnt
            for r in hist_bins(xs(0, 1200), ["g"], "x", 0.0, 1000.0, 128).collect()
        }
        assert got == want
        # quantiles read straight off the standing state, bit-equal to
        # the direct build's
        qa = sorted(map(tuple, hist_quantiles(
            m.table.read(spark), ["g"], 0.0, 1000.0, 128, [0.5, 0.9]).collect()))
        qb = sorted(map(tuple, hist_quantiles(
            hist_bins(xs(0, 1200), ["g"], "x", 0.0, 1000.0, 128),
            ["g"], 0.0, 1000.0, 128, [0.5, 0.9]).collect()))
        assert qa == qb


class TestAnnIndexMaintainer:
    def _vecs(self, spark, lo, hi, dim=8):
        return spark.createDataFrame(
            [
                (i, [float((i * 31 + j * 17) % 13 - 6) for j in range(dim)])
                for i in range(lo, hi)
            ],
            "vec_id long, embedding array<float>",
        )

    def test_incremental_index_serves_like_batch_ivf(self, spark, tmp_path):
        from osmium_tool_spark.operators.similarity import (
            ann_topk_ivf,
            ivf_probe_index,
            train_ivf_centroids,
        )
        from osmium_tool_spark.streaming.sketch_stream import ann_index_maintainer

        b0, b1 = self._vecs(spark, 0, 120), self._vecs(spark, 120, 240)
        cents = train_ivf_centroids(b0, n_centroids=4, seed=7)
        m = ann_index_maintainer(SnapshotTable(str(tmp_path / "idx")), cents)
        m.process_batch(b0, 0)
        m.process_batch(b1, 1)

        qs = self._vecs(spark, 0, 240).filter(F.col("vec_id") % 40 == 0)
        served = sorted(map(tuple, ivf_probe_index(
            m.table.read(spark), qs, cents, k=3, nprobe=2).collect()))
        batch = sorted(map(tuple, ann_topk_ivf(
            b0.unionByName(b1), qs, k=3, centroids=cents, nprobe=2).collect()))
        assert served == batch

        # time travel: the index as of batch 0 only knows batch-0 rows
        old = ivf_probe_index(
            m.table.read(spark, snapshot_id=1), qs, cents, k=3, nprobe=2
        )
        assert old.filter(F.col("neighbor_id") >= 120).count() == 0

        # replay skip
        assert m.process_batch(b1, 1)["skipped"] is True
        assert m.table.read(spark).count() == 240

    def test_mode_validation(self, spark, tmp_path):
        from osmium_tool_spark.streaming.sketch_stream import SketchMaintainer

        t = SnapshotTable(str(tmp_path / "t"))
        with pytest.raises(ValueError):
            SketchMaintainer(t, build=lambda df: df, mode="merge")
        with pytest.raises(ValueError):
            SketchMaintainer(t, build=lambda df: df)  # overwrite needs merge


class TestMinhashIndexMaintainer:
    def _docs(self, spark, lo, hi):
        # every third doc repeats an earlier text -> cross-batch near-dups
        return spark.createDataFrame(
            [
                (
                    i,
                    " ".join(
                        f"w{(i - (i % 90)) * 7 + j}" if i % 3 == 0 else f"w{i * 13 + j}"
                        for j in range(30)
                    ),
                )
                for i in range(lo, hi)
            ],
            "doc_id long, text string",
        )

    def test_probe_matches_batch_operator_cross_pairs(self, spark, tmp_path):
        from osmium_tool_spark.operators.dedup import (
            minhash_bands,
            minhash_probe_index,
        )
        from osmium_tool_spark.streaming.sketch_stream import minhash_index_maintainer

        b0, b1 = self._docs(spark, 0, 90), self._docs(spark, 90, 180)
        m = minhash_index_maintainer(SnapshotTable(str(tmp_path / "idx")))
        m.process_batch(b0, 0)

        # probe the NEW batch against the standing (batch-0) index
        bands1 = minhash_bands(b1, "doc_id", "text")
        got = {
            (r.a, r.b)
            for r in minhash_probe_index(m.table.read(spark), bands1).collect()
        }
        # ground truth: band matches across the two slices, computed flat
        all_bands = minhash_bands(b0.unionByName(b1), "doc_id", "text")
        l = all_bands.select(F.col("id").alias("a"), "band_idx", "band")
        r = all_bands.select(F.col("id").alias("b"), "band_idx", "band")
        flat = {
            (ra, rb)
            for ra, rb in (
                (row.a, row.b)
                for row in l.join(r, on=["band_idx", "band"])
                .filter(F.col("a") != F.col("b"))
                .select("a", "b")
                .distinct()
                .collect()
            )
            if ra >= 90 and rb < 90  # batch-1 id probed against batch-0 id
        }
        assert got == flat
        assert got  # the repeated texts must actually collide

        # append batch 1; index now answers for the full corpus
        m.process_batch(b1, 1)
        assert m.table.read(spark).count() == all_bands.count()
        assert m.process_batch(b1, 1)["skipped"] is True

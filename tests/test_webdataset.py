"""WebDataset tar shard sink (sinks/webdataset.py): deterministic bytes,
closed-form size arithmetic, and the write -> read round trip."""

import os
import tarfile

from pyspark.sql import functions as F

from osmium_tool_spark.sinks.webdataset import (
    read_webdataset_shards,
    tar_size_py,
    write_webdataset_shards,
)


def _sample_df(spark):
    rows = [
        # (image_id, zcell, shard_id, bytes, caption, fmt)
        (1, 10, 0, b"\x89PNG-ish payload one", "a red square", "png"),
        (2, 11, 0, b"payload two " * 50, "a blue circle", "jpeg"),
        (3, 12, 0, b"", "empty payload member", "webp"),
        (4, 20, 1, b"third shard's first", "caption four", "png"),
        (5, 21, 1, b"x" * 513, "caption five crosses a block", "png"),
    ]
    return spark.createDataFrame(
        rows,
        "image_id long, zcell long, shard_id long, bytes binary, "
        "caption string, fmt string",
    )


def test_roundtrip_and_sizes(spark, tmp_path):
    out = str(tmp_path / "shards")
    man = write_webdataset_shards(_sample_df(spark), out).collect()
    assert sorted(m.shard_id for m in man) == [0, 1]
    by_id = {m.shard_id: m for m in man}
    assert by_id[0].n_samples == 3 and by_id[1].n_samples == 2

    # on-disk size == closed-form arithmetic
    for m in man:
        assert os.path.getsize(m.path) == m.tar_bytes

    rows = {
        (r.image_id, r.shard_id): r for r in _sample_df(spark).collect()
    }
    for sid in (0, 1):
        sizes = []
        for (iid, s), r in rows.items():
            if s == sid:
                sizes += [len(bytes(r.bytes)), len(r.caption.encode())]
        assert by_id[sid].tar_bytes == tar_size_py(sizes)
        assert by_id[sid].data_bytes == sum(sizes)

    # read back through the engine reader: every member, byte-exact
    back = read_webdataset_shards(spark, out).collect()
    assert len(back) == 10  # 5 samples x 2 members
    got = {(r.key, r.ext): bytes(r.data) for r in back}
    for (iid, _s), r in rows.items():
        stem = f"{iid:012d}"
        assert got[(stem, r.fmt)] == bytes(r.bytes)
        assert got[(stem, "txt")] == r.caption.encode()


def test_deterministic_bytes(spark, tmp_path):
    a = write_webdataset_shards(
        _sample_df(spark), str(tmp_path / "a")
    ).collect()
    b = write_webdataset_shards(
        _sample_df(spark).repartition(5), str(tmp_path / "b")
    ).collect()
    assert {(m.shard_id, m.sha256) for m in a} == {
        (m.shard_id, m.sha256) for m in b
    }


def test_tar_metadata_is_normalized(spark, tmp_path):
    out = str(tmp_path / "shards")
    man = write_webdataset_shards(_sample_df(spark), out).collect()
    with tarfile.open(man[0].path) as tar:
        members = tar.getmembers()
        assert members, "shard must not be empty"
        # members arrive in (zcell, image_id) order, payload before txt
        names = [m.name for m in members]
        assert names == sorted(names, key=lambda n: n.split(".")[0])
        for m in members:
            assert m.mtime == 0
            assert m.uid == 0 and m.gid == 0
            assert m.uname == "" and m.gname == ""
            assert m.mode == 0o644


def test_string_ids_pass_through(spark, tmp_path):
    df = spark.createDataFrame(
        [("imgA", 1, 0, b"p", "c", "png")],
        "image_id string, zcell long, shard_id long, bytes binary, "
        "caption string, fmt string",
    )
    out = str(tmp_path / "s")
    write_webdataset_shards(df, out).collect()
    back = read_webdataset_shards(spark, out).collect()
    assert {r.key for r in back} == {"imgA"}


def test_manifest_join_shape(spark, tmp_path):
    # the intended composition: shard_manifest decides placement, the
    # sink materializes it — spatial neighbors land in the same tar
    from osmium_tool_spark.operators.curation import shard_manifest

    n = 200
    imgs = spark.range(n).select(
        F.col("id").alias("image_id"),
        ((F.col("id") * 2654435761) % 3600000000 - 1800000000).alias("lon"),
        ((F.col("id") * 2246822519) % 1800000000 - 900000000).alias("lat"),
        F.lit(64).alias("n_bytes"),
        F.encode(F.concat(F.lit("payload"), F.col("id")), "UTF-8").alias("bytes"),
        F.concat(F.lit("caption "), F.col("id")).alias("caption"),
        F.lit("png").alias("fmt"),
    )
    man = shard_manifest(imgs, target_bytes=1024, res=8, prefix_res=2)
    joined = man.select("image_id", "zcell", "shard_id").join(
        imgs.select("image_id", "bytes", "caption", "fmt"), "image_id"
    )
    out = str(tmp_path / "m")
    manifest = write_webdataset_shards(joined, out).collect()
    assert sum(m.n_samples for m in manifest) == n
    # every shard's size obeys the arithmetic
    for m in manifest:
        assert os.path.getsize(m.path) == m.tar_bytes

"""OSM PBF writer — closes the binary interchange loop opened by
sources/pbf.py (reference: man/osmium-file-formats.md:42-66; writer
plumbing src/io.cpp:131-230; wire format
wiki.openstreetmap.org/wiki/PBF_Format).

Spark shape: entities are canonically sorted with ONE balanced range
shuffle, then each executor partition serializes its rows into framed
[len][BlobHeader][Blob] chunks of <=8000 entities per PrimitiveBlock
(osmium's block size) inside a mapInPandas closure — all encoding
(string tables, delta/zigzag coding, zlib) is executor-side and scales
with the data. One job writes the frames as base64 text parts; the
driver decodes part files in name order (= partition order = frame
order) into the single output stream — constant driver memory, no
parsing, the same single-output-stream shape as the reference's writer
thread. Nodes are written as DenseNodes (the required_features we
declare), ways/relations as plain messages; metadata (Info/DenseInfo)
is included only when present, matching the -nometadata variants.

Undefined locations (deleted nodes in history files) are encoded as
libosmium's undefined_coordinate sentinel (fixed 0x7FFFFFFF) and mapped
back to NULL by sources/pbf.py on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

GENERATOR = "osmium_tool_spark/0.1.0"

# libosmium osmium::Location undefined coordinate (fixed 1e-7 units)
UNDEFINED_COORD = 0x7FFFFFFF

_BLOCK_SIZE = 8000  # entities per PrimitiveBlock, osmium's default


def _encode_header_blob(
    generator: str, with_history: bool, bbox: tuple | None
) -> bytes:
    """OSMHeader frame: HeaderBlock{bbox?, required_features,
    writingprogram} wrapped in an uncompressed Blob."""
    enc = _make_encoders()
    parts = []
    if bbox is not None:
        left, bottom, right, top = bbox  # fixed 1e-7 -> nanodeg sint64
        bb = b"".join(
            [
                enc["key"](1, 0), enc["svarint"](left * 100),
                enc["key"](2, 0), enc["svarint"](right * 100),
                enc["key"](3, 0), enc["svarint"](top * 100),
                enc["key"](4, 0), enc["svarint"](bottom * 100),
            ]
        )
        parts.append(enc["key"](1, 2) + enc["ld"](bb))
    feats = ["OsmSchema-V0.6", "DenseNodes"]
    if with_history:
        feats.append("HistoricalInformation")
    for ft in feats:
        parts.append(enc["key"](4, 2) + enc["ld"](ft.encode()))
    parts.append(enc["key"](16, 2) + enc["ld"](generator.encode()))
    header_block = b"".join(parts)
    blob = enc["key"](2, 0) + enc["varint"](len(header_block))
    blob += enc["key"](1, 2) + enc["ld"](header_block)
    bh = enc["key"](1, 2) + enc["ld"](b"OSMHeader")
    bh += enc["key"](3, 0) + enc["varint"](len(blob))
    import struct

    return struct.pack(">I", len(bh)) + bh + blob


def _make_encoders() -> dict:
    """Protobuf primitive encoders, also embedded (by value) in the
    executor closure."""

    def varint(v: int) -> bytes:
        # int64 two's-complement for negatives (10-byte form)
        if v < 0:
            v += 1 << 64
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def svarint(v: int) -> bytes:  # zigzag
        return varint((v << 1) ^ (v >> 63))

    def key(tag: int, wt: int) -> bytes:
        return varint((tag << 3) | wt)

    def ld(payload: bytes) -> bytes:  # length-delimited
        return varint(len(payload)) + payload

    def packed(tag: int, vals, signed=False) -> bytes:
        if not vals:
            return b""
        body = b"".join(svarint(v) if signed else varint(v) for v in vals)
        return key(tag, 2) + ld(body)

    return {"varint": varint, "svarint": svarint, "key": key, "ld": ld,
            "packed": packed}


def _make_block_encoder(with_history: bool):
    """mapInPandas closure: rows (pre-sorted within partitions) ->
    framed OSMData blob chunks. Self-contained — executors only need
    stdlib + pandas (the package is not on their sys.path)."""

    def encode(batches):
        import struct
        import zlib

        import pandas as pd

        def varint(v):
            if v < 0:
                v += 1 << 64
            out = bytearray()
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        def svarint(v):
            return varint((v << 1) ^ (v >> 63))

        def key(tag, wt):
            return varint((tag << 3) | wt)

        def ld(payload):
            return varint(len(payload)) + payload

        def packed(tag, vals, signed=False):
            if not vals:
                return b""
            body = b"".join(svarint(v) if signed else varint(v) for v in vals)
            return key(tag, 2) + ld(body)

        UNDEF = 0x7FFFFFFF

        def isnull(v):  # None or NaN (pandas nullable scalars)
            return v is None or (isinstance(v, float) and v != v)

        def aslist(v):  # pandas delivers arrays as np.ndarray (no bool())
            return [] if v is None or (isinstance(v, float) and v != v) else list(v)

        class Strings:
            def __init__(self):
                self.idx = {"": 0}
                self.lst = [""]

            def get(self, s):
                if s is None:
                    s = ""
                i = self.idx.get(s)
                if i is None:
                    i = len(self.lst)
                    self.idx[s] = i
                    self.lst.append(s)
                return i

        def info_bytes(r, st):
            parts = []
            if not isnull(r["version"]):
                parts.append(key(1, 0) + varint(int(r["version"])))
            if not isnull(r["ts"]):
                parts.append(key(2, 0) + varint(int(r["ts"]) // 1_000_000))
            if not isnull(r["changeset"]):
                parts.append(key(3, 0) + varint(int(r["changeset"])))
            if not isnull(r["uid"]):
                parts.append(key(4, 0) + varint(int(r["uid"])))
            if not isnull(r["user"]):
                parts.append(key(5, 0) + varint(st.get(r["user"])))
            if with_history:
                parts.append(key(6, 0) + varint(1 if r["visible"] else 0))
            if not parts:
                return b""
            return key(4, 2) + ld(b"".join(parts))

        def tags_bytes(r, st):
            out = b""
            ks, vs = [], []
            for e in aslist(r["tags"]):
                ks.append(st.get(e["key"]))
                vs.append(st.get(e["value"]))
            out += packed(2, ks) + packed(3, vs)
            return out

        def dense_group(rows, st):
            ids, lats, lons, kv = [], [], [], []
            versions, tss, css, uids, usids, vis = [], [], [], [], [], []
            has_meta = any(not isnull(r["version"]) for r in rows)
            pid = plat = plon = pts = pcs = puid = pus = 0
            for r in rows:
                rid = int(r["id"])
                ids.append(rid - pid)
                pid = rid
                lat = UNDEF if isnull(r["lat"]) else int(r["lat"])
                lon = UNDEF if isnull(r["lon"]) else int(r["lon"])
                # granularity 100 nanodeg -> raw units == fixed 1e-7 units
                lats.append(lat - plat)
                lons.append(lon - plon)
                plat, plon = lat, lon
                for e in aslist(r["tags"]):
                    kv.append(st.get(e["key"]))
                    kv.append(st.get(e["value"]))
                kv.append(0)
                if has_meta:
                    versions.append(
                        int(r["version"]) if not isnull(r["version"]) else 0
                    )
                    ts = (
                        int(r["ts"]) // 1_000_000 if not isnull(r["ts"]) else 0
                    )
                    tss.append(ts - pts)
                    pts = ts
                    cs = int(r["changeset"]) if not isnull(r["changeset"]) else 0
                    css.append(cs - pcs)
                    pcs = cs
                    uid = int(r["uid"]) if not isnull(r["uid"]) else 0
                    uids.append(uid - puid)
                    puid = uid
                    us = st.get(r["user"])
                    usids.append(us - pus)
                    pus = us
                    vis.append(1 if r["visible"] else 0)
            body = packed(1, ids, signed=True)
            if has_meta:
                di = packed(1, versions)
                di += packed(2, tss, signed=True)
                di += packed(3, css, signed=True)
                di += packed(4, uids, signed=True)
                di += packed(5, usids, signed=True)
                if with_history:
                    di += packed(6, vis)
                body += key(5, 2) + ld(di)
            body += packed(8, lats, signed=True)
            body += packed(9, lons, signed=True)
            body += key(10, 2) + ld(b"".join(varint(v) for v in kv))
            return key(2, 2) + ld(body)

        def way_bytes(r, st):
            body = key(1, 0) + varint(int(r["id"]))
            body += tags_bytes(r, st)
            body += info_bytes(r, st)
            deltas, prev = [], 0
            for ref in aslist(r["refs"]):
                deltas.append(int(ref) - prev)
                prev = int(ref)
            body += packed(8, deltas, signed=True)
            return key(3, 2) + ld(body)

        def rel_bytes(r, st):
            body = key(1, 0) + varint(int(r["id"]))
            body += tags_bytes(r, st)
            body += info_bytes(r, st)
            roles, deltas, types = [], [], []
            prev = 0
            for m in aslist(r["members"]):
                roles.append(st.get(m["role"]))
                deltas.append(int(m["ref"]) - prev)
                prev = int(m["ref"])
                types.append(int(m["mtype"]))
            body += packed(8, roles)
            body += packed(9, deltas, signed=True)
            body += packed(10, types)
            return key(4, 2) + ld(body)

        def make_block(rows):
            st = Strings()
            groups = []
            i = 0
            while i < len(rows):
                t = rows[i]["type"]
                j = i
                while j < len(rows) and rows[j]["type"] == t:
                    j += 1
                run = rows[i:j]
                if t == 0:
                    groups.append(dense_group(run, st))
                elif t == 1:
                    groups.append(b"".join(way_bytes(r, st) for r in run))
                else:
                    groups.append(b"".join(rel_bytes(r, st) for r in run))
                i = j
            stbody = b"".join(
                key(1, 2) + ld(s.encode("utf-8")) for s in st.lst
            )
            block = key(1, 2) + ld(stbody)
            for g in groups:
                block += key(2, 2) + ld(g)
            # granularity/date_granularity left at proto defaults (100, 1000)
            return block

        def frame(block):
            comp = zlib.compress(block)
            blob = key(2, 0) + varint(len(block))
            blob += key(3, 2) + ld(comp)
            bh = key(1, 2) + ld(b"OSMData")
            bh += key(3, 0) + varint(len(blob))
            return struct.pack(">I", len(bh)) + bh + blob

        pending = []
        for pdf in batches:
            rows = pdf.to_dict("records")
            pending.extend(rows)
            frames = []
            while len(pending) >= 8000:
                frames.append(frame(make_block(pending[:8000])))
                pending = pending[8000:]
            if frames:
                yield pd.DataFrame({"frame": frames})
        if pending:
            yield pd.DataFrame({"frame": [frame(make_block(pending))]})

    return encode


def write_osm_pbf(
    entities: DataFrame,
    path: str,
    generator: str = GENERATOR,
    with_history: bool = False,
    bbox: tuple | None = None,
    num_partitions: int | None = None,
) -> None:
    """Write the canonical entity frame as a .osm.pbf file.

    Sorting + serialization + compression run distributed (one balanced
    range exchange, then per-partition encoding); the driver streams
    the ready frames to disk in order without inspecting them. PBF is a
    single-file format — for 100 TB-scale persistent storage use the
    parquet sink (sinks/writer.py); this sink is the interchange exit.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..functions.sortkeys import id_sort_key

    spark = entities.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    skey = [F.col("type"), id_sort_key(F.col("id")).alias("__k"), F.col("version")]
    # tags travel as an entries array (map dicts lose insertion order
    # through Arrow — same shape as the reader)
    prepped = (
        entities.repartitionByRange(n, *skey)
        .sortWithinPartitions(*skey)
        .withColumn("tags", F.map_entries("tags"))
        .select(
            "type", "id", "version", "visible", "changeset", "ts", "uid",
            "user", "tags", "lon", "lat", "refs", "members",
        )
    )
    frames = prepped.mapInPandas(
        _make_block_encoder(with_history),
        schema=T.StructType([T.StructField("frame", T.BinaryType(), False)]),
    )
    # ONE job writes base64 text parts (toLocalIterator re-executes the
    # whole upstream once per partition under AQE — measured 60x slower);
    # the driver then decodes part files in name order = partition order
    # = frame order. Spark's base64 emits no line wrapping, so each text
    # line is exactly one framed blob.
    import base64
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="osmpbf-", dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        frames.select(F.base64(F.col("frame")).alias("value")).write \
            .mode("overwrite").option("compression", "none") \
            .text(os.path.join(tmp, "parts"))
        with open(path, "wb") as f:
            f.write(_encode_header_blob(generator, with_history, bbox))
            for part in sorted(glob.glob(os.path.join(tmp, "parts", "part-*"))):
                with open(part, "rb") as pf:
                    for line in pf:
                        f.write(base64.b64decode(line))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

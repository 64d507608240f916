"""O5M reader tests. The reference ships no .o5m fixtures (its own o5m
tests live in libosmium), so fixtures are synthesized here by an
independent encoder following the public spec
(wiki.openstreetmap.org/wiki/O5m): delta-coded ids/coords/ts/changeset/
refs, MRU string-pair table with inline-then-reference semantics, the
sign-bit varint, per-member-type reference counters, and deleted
objects carried as id+meta-only datasets."""

import pytest

from osmium_tool_spark.sources.o5m import parse_o5m, read_o5m
from osmium_tool_spark.sources.osmxml import read_osm_xml
from tests.test_reference_goldens_xml import canon_rows

REF = "/root/reference/test"


# --- encoder (test-only twin of the reader) ---------------------------------


def uvar(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def svar(v: int) -> bytes:
    return uvar(v * 2 if v >= 0 else -v * 2 - 1)


class Enc:
    def __init__(self):
        self.ids = [0, 0, 0]
        self.lon = 0
        self.lat = 0
        self.ts = 0
        self.cs = 0
        self.wref = 0
        self.mref = [0, 0, 0]
        self.table: list[tuple[bytes, ...]] = []
        self.out = bytearray([0xFF])
        self.out += bytes([0xE0]) + uvar(4) + b"o5m2"

    def string(self, parts: tuple[bytes, ...]) -> bytes:
        if parts in self.table:
            return uvar(len(self.table) - self.table.index(parts))
        if sum(len(p) for p in parts) <= 250:
            self.table.append(parts)
        return b"\x00" + b"".join(p + b"\x00" for p in parts)

    def uid_user(self, uid: int, user: str) -> bytes:
        # first segment is the uid as BINARY varint bytes + terminator
        entry = ("uu", uid, user)
        if entry in self.table:
            return uvar(len(self.table) - self.table.index(entry))
        if 1 + len(user) <= 250:
            self.table.append(entry)
        return b"\x00" + uvar(uid) + b"\x00" + user.encode() + b"\x00"

    def meta(self, version, ts, cs, uid, user) -> bytes:
        if version is None:
            return uvar(0)
        b = uvar(version)
        b += svar(ts - self.ts)
        self.ts = ts
        if ts != 0:
            b += svar(cs - self.cs)
            self.cs = cs
            b += self.uid_user(uid, user)
        return b

    def node(self, nid, version=None, ts=0, cs=0, uid=0, user="",
             lon=None, lat=None, tags=()):
        body = svar(nid - self.ids[0])
        self.ids[0] = nid
        body += self.meta(version, ts, cs, uid, user)
        if lon is not None:
            body += svar(lon - self.lon) + svar(lat - self.lat)
            self.lon, self.lat = lon, lat
            for k, v in tags:
                body += self.string((k.encode(), v.encode()))
        self.out += bytes([0x10]) + uvar(len(body)) + body

    def way(self, wid, version, ts, cs, uid, user, refs, tags=()):
        body = svar(wid - self.ids[1])
        self.ids[1] = wid
        body += self.meta(version, ts, cs, uid, user)
        rb = b""
        for ref in refs:
            rb += svar(ref - self.wref)
            self.wref = ref
        body += uvar(len(rb)) + rb
        for k, v in tags:
            body += self.string((k.encode(), v.encode()))
        self.out += bytes([0x11]) + uvar(len(body)) + body

    def relation(self, rid, version, ts, cs, uid, user, members, tags=()):
        body = svar(rid - self.ids[2])
        self.ids[2] = rid
        body += self.meta(version, ts, cs, uid, user)
        rb = b""
        for mtype, ref, role in members:
            rb += svar(ref - self.mref[mtype])
            self.mref[mtype] = ref
            rb += self.string((str(mtype).encode() + role.encode(),))
        body += uvar(len(rb)) + rb
        for k, v in tags:
            body += self.string((k.encode(), v.encode()))
        self.out += bytes([0x12]) + uvar(len(body)) + body

    def reset(self):
        self.ids = [0, 0, 0]
        self.lon = self.lat = self.ts = self.cs = self.wref = 0
        self.mref = [0, 0, 0]
        self.table = []
        self.out += bytes([0xFF])

    def finish(self) -> bytes:
        return bytes(self.out) + bytes([0xFE])


# --- tests ------------------------------------------------------------------


def test_varint_roundtrip():
    from osmium_tool_spark.sources.o5m import _Reader

    for v in (0, 1, 63, 64, 127, 128, 300, 2**31, 2**56 + 5):
        assert _Reader(uvar(v)).uvarint() == v
    for v in (0, 1, -1, 7, -7, 2**40, -(2**40)):
        assert _Reader(svar(v)).svarint() == v


def test_parse_basic_entities():
    e = Enc()
    e.node(11, version=1, ts=1_420_070_400, cs=5, uid=3, user="alice",
           lon=12_500_000, lat=-34_500_000, tags=[("amenity", "post_box")])
    e.node(13, version=2, ts=1_420_070_401, cs=5, uid=3, user="alice",
           lon=12_600_000, lat=-34_400_000)
    e.way(20, 1, 1_420_070_402, 6, 4, "bob", [11, 13],
          tags=[("highway", "residential"), ("name", "x")])
    e.relation(30, 1, 1_420_070_403, 7, 4, "bob",
               [(0, 11, "stop"), (1, 20, "outer"), (1, 21, "")],
               tags=[("type", "route")])
    rows = parse_o5m(e.finish())
    assert [r["type"] for r in rows] == [0, 0, 1, 2]
    n11 = rows[0]
    assert (n11["id"], n11["lon"], n11["lat"]) == (11, 12_500_000, -34_500_000)
    assert n11["tags"] == [{"key": "amenity", "value": "post_box"}]
    assert (n11["version"], n11["ts"], n11["changeset"], n11["uid"], n11["user"]) == (
        1, 1_420_070_400_000_000, 5, 3, "alice")
    w = rows[2]
    assert w["refs"] == [11, 13]
    assert w["tags"][0] == {"key": "highway", "value": "residential"}
    r = rows[3]
    assert r["members"] == [
        {"mtype": 0, "ref": 11, "role": "stop"},
        {"mtype": 1, "ref": 20, "role": "outer"},
        {"mtype": 1, "ref": 21, "role": ""},
    ]


def test_string_table_references_and_reset():
    e = Enc()
    for i in range(1, 6):  # same tag pair 5x -> 4 table references
        e.node(i, version=1, ts=100 + i, cs=1, uid=2, user="u",
               lon=i * 10, lat=i * 20, tags=[("k", "v")])
    e.reset()
    e.node(100, version=1, ts=50, cs=1, uid=2, user="u",
           lon=7, lat=8, tags=[("k", "v")])  # re-inlined after reset
    rows = parse_o5m(e.finish())
    assert len(rows) == 6
    assert all(r["tags"] == [{"key": "k", "value": "v"}] for r in rows)
    assert rows[-1]["id"] == 100 and rows[-1]["lon"] == 7
    # encoder really did use references (bytes shrink after first pair)
    assert e.finish().count(b"\x00k\x00v\x00") == 2  # once per reset epoch


def test_deleted_object_and_no_meta():
    e = Enc()
    e.node(5, version=2, ts=1000, cs=3, uid=1, user="d")  # deleted: no coords
    e.node(6, lon=1, lat=2)  # version 0: no metadata
    rows = parse_o5m(e.finish())
    assert rows[0]["visible"] is False and rows[0]["lon"] is None
    assert rows[0]["version"] == 2
    assert rows[1]["visible"] is True and rows[1]["version"] is None
    assert rows[1]["lon"] == 1


def test_negative_ids_and_coords():
    e = Enc()
    e.node(-10, version=1, ts=1, cs=1, uid=1, user="u",
           lon=-1_799_999_999, lat=-899_999_999)
    e.node(-9, version=1, ts=2, cs=1, uid=1, user="u",
           lon=1_799_999_999, lat=899_999_999)
    rows = parse_o5m(e.finish())
    assert [r["id"] for r in rows] == [-10, -9]
    assert rows[0]["lon"] == -1_799_999_999
    assert rows[1]["lat"] == 899_999_999


def test_read_o5m_matches_xml_twin(spark, tmp_path):
    """Encode the entities of a committed reference XML fixture as o5m;
    read_o5m must produce the same canonical rows as read_osm_xml."""
    src = read_osm_xml(spark, f"{REF}/formats/f1.osm")
    e = Enc()
    for r in sorted(src.collect(), key=lambda r: (r.type, r.id)):
        ts = (r.ts or 0) // 1_000_000
        tags = [(k, v) for k, v in (r.tags or {}).items()]
        if r.type == 0:
            e.node(r.id, version=r.version, ts=ts, cs=r.changeset or 0,
                   uid=r.uid or 0, user=r.user or "", lon=r.lon, lat=r.lat,
                   tags=tags)
        elif r.type == 1:
            e.way(r.id, r.version, ts, r.changeset or 0, r.uid or 0,
                  r.user or "", list(r.refs or []), tags=tags)
        else:
            e.relation(r.id, r.version, ts, r.changeset or 0, r.uid or 0,
                       r.user or "", [(m.mtype, m.ref, m.role) for m in r.members],
                       tags=tags)
    p = tmp_path / "f1.o5m"
    p.write_bytes(e.finish())
    got = read_o5m(spark, str(p))

    def rows(df):
        return sorted(
            (r.type, r.id, r.version, r.ts, r.uid or 0, r.user or "",
             r.changeset, tuple(sorted((r.tags or {}).items())), r.lon, r.lat,
             tuple(r.refs or ()),
             tuple((m.mtype, m.ref, m.role) for m in (r.members or ())))
            for r in df.collect()
        )

    assert rows(got) == rows(src)


def test_cli_reads_o5m(spark, tmp_path):
    from osmium_tool_spark.cli import main

    e = Enc()
    e.node(1, version=1, ts=10, cs=1, uid=1, user="u", lon=100, lat=200)
    p = tmp_path / "in.o5m"
    p.write_bytes(e.finish())
    out = str(tmp_path / "out.opl")
    rc = main(["cat", str(p), "-o", out], spark=spark)
    assert rc == 0


def test_size_guard(tmp_path, spark, monkeypatch):
    import osmium_tool_spark.sources.o5m as o5m_mod

    monkeypatch.setattr(o5m_mod, "MAX_O5M_BYTES", 10)
    p = tmp_path / "big.o5m"
    p.write_bytes(b"\xff" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not splittable"):
        read_o5m(spark, str(p))


def test_bad_header(tmp_path, spark):
    e = Enc()
    buf = bytearray(e.finish())
    buf[buf.index(b"o5m2")] = ord("x")
    with pytest.raises(ValueError, match="unsupported o5m header"):
        parse_o5m(bytes(buf))

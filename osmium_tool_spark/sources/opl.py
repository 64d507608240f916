"""OPL format reader/writer — the reference's line-based interchange
format (man/osmium-file-formats.md:42-66; fixtures like
test/extract/antimeridian.opl use it).

Line shape (one object per line, space-separated single-letter fields):

    n10 v1 dV c1 t2020-01-01T00:00:00Z i0 u T x170 y66
    w40 v1 dV c1 t... i0 u Thighway=primary Nn10,n11,n12
    r30 v1 dV c1 t... i0 u Ttype=multipolygon Mw40@outer,w41@inner

Field letters: n/w/r=id(+object type), v=version, d=V|D visible/deleted,
c=changeset, t=ISO timestamp, i=uid, u=user, T=tags (k=v comma list),
x/y=lon/lat, N=way refs (nIDs), M=members (Tid@role). Special characters
in strings are %-escaped as %<hex codepoint>%.

Spark shape: `spark.read.text` splits the file(s) into line partitions;
parsing runs as an Arrow-batched closure (ingest edge, not a query hot
path — mirrors the reference doing format decode on reader threads). The
parser ships by value (no package import on executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import ENTITY_SCHEMA

_TYPES = {"n": 0, "w": 1, "r": 2}
_TYPE_CH = {0: "n", 1: "w", 2: "r"}


def _make_parser():
    """Self-contained OPL line parser (closure, cloudpickled by value)."""
    import calendar
    import time as _time

    types = {"n": 0, "w": 1, "r": 2}
    scale = 10_000_000

    def unescape(s: str) -> str:
        if "%" not in s:
            return s
        out, i = [], 0
        while i < len(s):
            if s[i] == "%":
                j = s.index("%", i + 1)
                out.append(chr(int(s[i + 1:j], 16)))
                i = j + 1
            else:
                out.append(s[i])
                i += 1
        return "".join(out)

    def parse_ts(v: str):
        # canonical ts unit is epoch MICROS (schema.py ENTITY_SCHEMA —
        # parquet-derived entities use unix_micros); OPL carries seconds
        if not v:
            return None
        return calendar.timegm(_time.strptime(v, "%Y-%m-%dT%H:%M:%SZ")) * 1_000_000

    def parse_line(line: str):
        line = line.strip()
        if not line or line.startswith("#"):
            return None
        fields = line.split(" ")
        t = types.get(fields[0][0])
        if t is None:
            return None
        row = {
            "type": t, "id": int(fields[0][1:]), "version": None, "visible": True,
            "changeset": None, "ts": None, "uid": None, "user": None,
            "tags": {}, "lon": None, "lat": None, "refs": None, "members": None,
        }
        for f in fields[1:]:
            if not f:
                continue
            k, v = f[0], f[1:]
            if k == "v" and v:
                row["version"] = int(v)
            elif k == "d":
                row["visible"] = v != "D"
            elif k == "c" and v:
                row["changeset"] = int(v)
            elif k == "t":
                row["ts"] = parse_ts(v)
            elif k == "i" and v:
                row["uid"] = int(v)
            elif k == "u":
                row["user"] = unescape(v)
            elif k == "T":
                if v:
                    tags = {}
                    for kv in v.split(","):
                        kk, _, vv = kv.partition("=")
                        tags[unescape(kk)] = unescape(vv)
                    row["tags"] = tags
            elif k == "x" and v:
                row["lon"] = int(round(float(v) * scale))
            elif k == "y" and v:
                row["lat"] = int(round(float(v) * scale))
            elif k == "N":
                row["refs"] = [int(r[1:]) for r in v.split(",")] if v else []
            elif k == "M":
                mem = []
                if v:
                    for m in v.split(","):
                        body, _, role = m.partition("@")
                        mem.append(
                            {"mtype": types[body[0]], "ref": int(body[1:]), "role": unescape(role)}
                        )
                row["members"] = mem
        return row

    return parse_line


def read_opl(spark: SparkSession, path: str) -> DataFrame:
    """Read .opl file(s) into the canonical entity schema."""
    lines = spark.read.text(path)
    parse_line = _make_parser()

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = [r for r in (parse_line(ln) for ln in pdf["value"]) if r]
            yield pd.DataFrame(
                rows,
                columns=[
                    "type", "id", "version", "visible", "changeset", "ts",
                    "uid", "user", "tags", "lon", "lat", "refs", "members",
                ],
            )

    return lines.mapInPandas(parse_batches, schema=ENTITY_SCHEMA)


_ESCAPE = set(' ,=@%\n\t\r')


def _make_serializer(omit: frozenset = frozenset()):
    """Self-contained OPL line serializer (closure). ``omit`` drops whole
    metadata fields from the line (the reference omits attributes its
    metadata settings exclude — e.g. `diff --ignore-uid` emits no i
    field, test/diff/output-compact-c-nouid-opl)."""
    import time as _time

    type_ch = {0: "n", 1: "w", 2: "r"}
    scale = 10_000_000
    esc_set = set(' ,=@%\n\t\r')

    def escape(s: str) -> str:
        if not s or not any(c in esc_set for c in s):
            return s or ""
        return "".join(f"%{ord(c):x}%" if c in esc_set else c for c in s)

    def fmt_coord(v) -> str:
        # exact integer fixed-point rendering (matches the XML writer)
        sign = "-" if v < 0 else ""
        av = -v if v < 0 else v
        ip, fp = divmod(av, scale)
        frac = f"{fp:07d}".rstrip("0")
        return f"{sign}{ip}.{frac}" if frac else f"{sign}{ip}"

    def fmt_ts(ts) -> str:
        # entity ts is epoch micros; OPL serializes whole seconds
        if ts is None:
            return ""
        return _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime(ts // 1_000_000))

    def serialize(row) -> str:
        parts = [f"{type_ch[row['type']]}{row['id']}"]
        parts.append(f"v{row['version'] if row['version'] is not None else ''}")
        parts.append(f"d{'V' if row['visible'] or row['visible'] is None else 'D'}")
        if "changeset" not in omit:
            parts.append(f"c{row['changeset'] if row['changeset'] is not None else ''}")
        parts.append(f"t{fmt_ts(row['ts'])}")
        if "uid" not in omit:
            parts.append(f"i{row['uid'] if row['uid'] is not None else ''}")
        if "user" not in omit:
            parts.append(f"u{escape(row['user'] or '')}")
        tags = row["tags"] or {}
        parts.append("T" + ",".join(f"{escape(k)}={escape(v)}" for k, v in tags.items()))
        if row["type"] == 0:
            if row["lon"] is not None:
                parts.append(f"x{fmt_coord(row['lon'])}")
                parts.append(f"y{fmt_coord(row['lat'])}")
        elif row["type"] == 1:
            # pandas hands arrays, not lists — no truthiness
            refs = row["refs"]
            refs = [] if refs is None else list(refs)
            parts.append("N" + ",".join(f"n{int(r)}" for r in refs))
        else:
            mem = row["members"]
            mem = [] if mem is None else list(mem)
            parts.append(
                "M" + ",".join(f"{type_ch[m['mtype']]}{m['ref']}@{escape(m['role'] or '')}" for m in mem)
            )
        return " ".join(parts)

    return serialize


def _opl_escape_col(c):
    """Column replica of the OPL escape: chars in ' ,=@%\\n\\t\\r' become
    %<hex-codepoint>%. '%' is replaced first so later replacements'
    markers are never re-escaped (same single-pass semantics as the
    Python serializer)."""
    from pyspark.sql import functions as F

    out = F.coalesce(c, F.lit(""))
    for ch in "% ,=@\n\t\r":
        out = F.replace(out, F.lit(ch), F.lit(f"%{ord(ch):x}%"))
    return out


def opl_line_col(omit: frozenset = frozenset()):
    """The whole OPL line as ONE Column expression — byte-equal to
    _make_serializer's output but entirely JVM-side (whole-stage
    codegen; pinned against the Python serializer by a property test)."""
    from pyspark.sql import functions as F

    from ..sinks.osmxml import _coord_col, _ts_col

    tch = (
        F.when(F.col("type") == 0, F.lit("n"))
        .when(F.col("type") == 1, F.lit("w"))
        .otherwise(F.lit("r"))
    )
    empty = F.lit("")

    def field(prefix, col):
        return F.concat(F.lit(" " + prefix), F.coalesce(col.cast("string"), empty))

    parts = [F.concat(tch, F.col("id").cast("string"))]
    parts.append(field("v", F.col("version")))
    parts.append(F.concat(
        F.lit(" d"),
        F.when(F.col("visible").isNull() | F.col("visible"), F.lit("V")).otherwise(F.lit("D")),
    ))
    if "changeset" not in omit:
        parts.append(field("c", F.col("changeset")))
    parts.append(F.concat(
        F.lit(" t"),
        F.when(F.col("ts").isNotNull(), _ts_col(F.col("ts"))).otherwise(empty),
    ))
    if "uid" not in omit:
        parts.append(field("i", F.col("uid")))
    if "user" not in omit:
        parts.append(F.concat(F.lit(" u"), _opl_escape_col(F.col("user"))))
    parts.append(F.concat(
        F.lit(" T"),
        F.array_join(
            F.transform(
                F.map_entries(F.coalesce(F.col("tags"), F.expr("map()").cast("map<string,string>"))),
                lambda t: F.concat(_opl_escape_col(t["key"]), F.lit("="), _opl_escape_col(t["value"])),
            ),
            ",",
        ),
    ))
    geom = (
        F.when(
            (F.col("type") == 0) & F.col("lon").isNotNull(),
            F.concat(F.lit(" x"), _coord_col(F.col("lon")),
                     F.lit(" y"), _coord_col(F.col("lat"))),
        )
        .when(
            F.col("type") == 1,
            F.concat(F.lit(" N"), F.array_join(
                F.transform(
                    F.coalesce(F.col("refs"), F.expr("array()").cast("array<long>")),
                    lambda r: F.concat(F.lit("n"), r.cast("string")),
                ), ",")),
        )
        .when(
            F.col("type") == 2,
            F.concat(F.lit(" M"), F.array_join(
                F.transform(
                    F.coalesce(
                        F.col("members"),
                        F.expr("array()").cast("array<struct<mtype:int,ref:long,role:string>>"),
                    ),
                    lambda m: F.concat(
                        F.when(m["mtype"] == 0, F.lit("n"))
                        .when(m["mtype"] == 1, F.lit("w")).otherwise(F.lit("r")),
                        m["ref"].cast("string"), F.lit("@"),
                        _opl_escape_col(m["role"]),
                    ),
                ), ",")),
        )
        .otherwise(empty)
    )
    parts.append(geom)
    return F.concat(*parts)


def to_opl_lines(entities: DataFrame) -> DataFrame:
    """Serialize entities to OPL line strings (one `value` column), rows
    in the input's order — rendered entirely JVM-side (opl_line_col,
    whole-stage codegen; tag order is map_entries document order like
    the reference, golden f1.osm.opl)."""
    return entities.select(opl_line_col().alias("value"))


def write_opl(entities: DataFrame, path: str,
              compression: str | None = None) -> None:
    """Write entities as ONE .opl file (canonical order restored first —
    the range sort also balances the render partitions). Executors
    render lines JVM-side and write text parts in one job (compressed
    executor-side for .opl.gz/.opl.bz2 targets); the driver concatenates
    part files in partition order = canonical order (sinks/textfile.py),
    matching the reference's single-file output (src/io.cpp:39-61)."""
    import os
    import shutil
    import tempfile

    from ..functions.sortkeys import canonical_sort
    from ..sinks.textfile import concat_parts, write_parts

    tmp = tempfile.mkdtemp(prefix="osmopl-",
                           dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        write_parts(to_opl_lines(canonical_sort(entities)),
                    os.path.join(tmp, "parts"), compression)
        concat_parts(path, os.path.join(tmp, "parts"), compression)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

"""The reference's DEBUG output format (osmium show -f debug), plain
(no color) variant — byte parity with test/show/output-debug.txt.

Layout rules derived from the committed golden: a `header` block
(multiple-versions flag, bounding boxes, options as `key = value`
lines), a 45-char `=` separator, then one block per object — field
labels in a 2-space-indented column padded so values start at column
13, tags as quoted keys padded to the object's longest quoted key,
way nodes as `index:` plus the ref right-aligned in an 11-char field
with an (open)/(closed) ring annotation. Driver-side by design: this is
the interactive `show` path, not a data sink (the 100 TB sinks are
parquet/PBF/OPL).
"""

from __future__ import annotations

import time as _time

from ..schema import COORD_SCALE, NODE, RELATION, TYPE_NAMES, WAY

SEPARATOR = "=" * 45
_VAL_COL = 13  # value column: 2-space indent + label padded to 11


def _fld(label: str, value: str) -> str:
    return "  " + f"{label}:".ljust(_VAL_COL - 2) + value


def _coord(fixed: int) -> str:
    s = f"{fixed / COORD_SCALE:.7f}".rstrip("0").rstrip(".")
    return s if s not in ("", "-") else "0"


def _ts(micros) -> str:
    if micros is None:
        return ""
    secs = micros // 1_000_000
    iso = _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime(secs))
    return f"{iso} ({secs})"


def debug_header_lines(options: dict, multiple_versions: bool = False) -> list[str]:
    lines = ["header"]
    lines.append(
        "  multiple object versions: %s" % ("yes" if multiple_versions else "no")
    )
    lines.append("  bounding boxes: ")
    lines.append("  options: ")
    for k, v in options.items():
        lines.append(f"    {k} = {v}")
    return lines


def debug_object_lines(row: dict) -> list[str]:
    t = row["type"]
    name = TYPE_NAMES.get(t, "object")
    visible = row.get("visible")
    vis = " visible" if visible is None or visible else " deleted"
    lines = [f"{name} {row['id']}{vis}"]
    lines.append(_fld("version", str(row.get("version") or 0)))
    lines.append(_fld("changeset", str(row.get("changeset") or 0)))
    lines.append(_fld("timestamp", _ts(row.get("ts"))))
    user = row.get("user") or ""
    lines.append(_fld("user", f'{row.get("uid") or 0} "{user}"'))
    if t == NODE:
        lines.append(_fld("lon/lat", f"{_coord(row['lon'])},{_coord(row['lat'])}"))
    tag_entries = list((row.get("tags") or {}).items())
    lines.append(_fld("tags", str(len(tag_entries))))
    if tag_entries:
        qkeys = [f'"{k}"' for k, _ in tag_entries]
        width = max(len(q) for q in qkeys)
        for q, (_, v) in zip(qkeys, tag_entries):
            lines.append(f"    {q.ljust(width)} = \"{v}\"")
    if t == WAY:
        refs = row.get("refs") or []
        ring = "(closed)" if len(refs) >= 2 and refs[0] == refs[-1] else "(open)"
        lines.append(_fld("nodes", f"{len(refs)} {ring}"))
        for i, ref in enumerate(refs):
            lines.append(f"    {i}: {ref:>10}")
    elif t == RELATION:
        members = row.get("members") or []
        lines.append(_fld("members", str(len(members))))
        mchar = {NODE: "n", WAY: "w", RELATION: "r"}
        for i, m in enumerate(members):
            mt, ref, role = m["mtype"], m["ref"], m.get("role") or ""
            lines.append(f"    {i}: {mchar.get(mt, '?')}{ref:>9} \"{role}\"")
    return lines


def to_debug_text(rows: list[dict], options: dict, multiple_versions: bool = False) -> str:
    """Full show -f debug document: header, separator, blank-line-separated
    object blocks, trailing newline."""
    parts = ["\n".join(debug_header_lines(options, multiple_versions))]
    parts.append("\n" + SEPARATOR + "\n")
    blocks = ["\n".join(debug_object_lines(r)) for r in rows]
    # every object block is followed by a blank line, including the last
    return "\n".join(parts) + "\n" + "\n\n".join(blocks) + "\n\n"

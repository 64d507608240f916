"""Single-file text output assembly shared by the XML / OPL / osc sinks.

The reference selects the compression codec from the output file suffix
(src/io.cpp:39-61: ``*.gz`` -> gzip, ``*.bz2`` -> bzip2, applied AFTER
the format suffix, so ``out.osm.gz`` is XML+gzip) and writes one stream.
The Spark-shaped equivalent keeps both the rendering AND the compression
distributed: executors write per-partition text parts with Spark's own
gzip/bzip2 codec, and the driver concatenates the compressed part files
raw. That is valid because both formats are *member-concatenative*:

 - RFC 1952 allows a gzip stream to be a sequence of members; every
   mainstream reader (zlib gzread, Python gzip, libosmium's gzip source)
   decodes the concatenation as the concatenated payload.
 - bzip2 streams concatenate the same way (planet .osm.bz2 dumps were
   historically multi-stream; libbz2's read loop and Python bz2 both
   handle it).

The header/footer are compressed driver-side as their own members
(deterministic: mtime=0), so no part file is ever re-encoded — the
driver does a sequential raw copy, constant memory, zero CPU beyond IO.
"""

from __future__ import annotations

import glob
import os
import shutil

# suffix -> (spark codec name, part-file extension)
_CODECS = {
    ".gz": ("gzip", ".gz"),
    ".bz2": ("bzip2", ".bz2"),
}


def split_compression(path: str) -> tuple[str, str | None]:
    """('out.osm.gz') -> ('out.osm', 'gzip'); passthrough when plain."""
    for suffix, (codec, _ext) in _CODECS.items():
        if path.endswith(suffix):
            return path[: -len(suffix)], codec
    return path, None


def _encode_member(data: bytes, codec: str | None) -> bytes:
    if codec is None:
        return data
    if codec == "gzip":
        import gzip

        return gzip.compress(data, mtime=0)
    if codec == "bzip2":
        import bz2

        return bz2.compress(data)
    raise ValueError(f"unknown text codec: {codec}")


def write_parts(df_value, parts_dir: str, codec: str | None) -> None:
    """ONE job writing the single-column `value` frame as text parts in
    partition order, compressed executor-side when codec is set."""
    (
        df_value.write.mode("overwrite")
        .option("compression", codec or "none")
        .text(parts_dir)
    )


def concat_parts(
    path: str,
    parts_dir: str,
    codec: str | None,
    head: bytes = b"",
    tail: bytes = b"",
) -> None:
    """Assemble head + part files (name order = partition order = the
    frame's global order) + tail into one output file. Parts must have
    been written with the SAME codec (write_parts) — they are copied
    raw, never decoded."""
    pattern = os.path.join(parts_dir, "part-*")
    with open(path, "wb") as f:
        if head:
            f.write(_encode_member(head, codec))
        for part in sorted(glob.glob(pattern)):
            with open(part, "rb") as pf:
                shutil.copyfileobj(pf, f)
        if tail:
            f.write(_encode_member(tail, codec))

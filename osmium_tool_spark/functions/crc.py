"""CRC32 combination over GF(2) — the distributed ordered-stream CRC.

The reference computes one CRC32 over its ordered object stream
(/root/reference/src/command_fileinfo.cpp:102,125-126) — inherently
sequential as written. CRC32 is linear over GF(2), so the checksum of a
concatenation combines from per-chunk checksums:

    crc(A || B) = combine(crc(A), crc(B), len(B))

where combine() advances crc(A) through len(B) zero bytes via GF(2)
matrix exponentiation (O(log len) 32x32 bit-matrix squarings — zlib's
published crc32_combine algorithm, reimplemented here from the spec).
Each partition therefore CRCs its own byte range independently and the
driver folds the (crc, length) pairs in partition order: an ordered
checksum with a fully parallel scan — the classic distributed-CRC trick.
"""

from __future__ import annotations

_POLY = 0xEDB88320  # CRC-32 (reflected), same polynomial zlib uses


def _gf2_matrix_times(mat: list[int], vec: int) -> int:
    s = 0
    i = 0
    while vec:
        if vec & 1:
            s ^= mat[i]
        vec >>= 1
        i += 1
    return s


def _gf2_matrix_square(square: list[int], mat: list[int]) -> None:
    for n in range(32):
        square[n] = _gf2_matrix_times(mat, mat[n])


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC32 of the concatenation of two byte streams, from their
    individual CRCs and the second stream's length."""
    if len2 <= 0:
        return crc1
    even = [0] * 32
    odd = [0] * 32

    # operator for one zero bit
    odd[0] = _POLY
    row = 1
    for n in range(1, 32):
        odd[n] = row
        row <<= 1
    _gf2_matrix_square(even, odd)  # two zero bits
    _gf2_matrix_square(odd, even)  # four zero bits

    # advance crc1 through len2 zero bytes, squaring operators per bit
    while True:
        _gf2_matrix_square(even, odd)
        if len2 & 1:
            crc1 = _gf2_matrix_times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        _gf2_matrix_square(odd, even)
        if len2 & 1:
            crc1 = _gf2_matrix_times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break
    return crc1 ^ crc2

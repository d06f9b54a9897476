"""Delta-gap + varint (LEB128) posting-list codec.

The reference stores one SQLite row per (term, frame) posting with a
lossy 63-bit position bitmap (storage/sqlite.py:1703-1725).  The
rebuild's persisted index instead stores one row per (term, doc-range
block) carrying delta-gap + varint compressed arrays — the classic
inverted-file layout (north_rule) — plus block-max metadata for WAND
pruning.  This module is the pure-Python/numpy codec used inside the
Arrow-batched UDFs; it never runs per-row at the driver.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_MASK = 0x7F
_CONT = 0x80


def encode_varints(values: Sequence[int]) -> bytes:
    """LEB128-encode a sequence of non-negative ints (each < 2**64)."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("varint values must be non-negative")
        while True:
            b = v & _MASK
            v >>= 7
            if v:
                out.append(b | _CONT)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_varints(data: bytes) -> np.ndarray:
    """Decode a LEB128 byte string to an int64 numpy array (values are
    produced mod 2**64 then reinterpreted signed, matching encode of
    Python ints below 2**64)."""
    if not data:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    values = []
    acc = 0
    shift = 0
    for b in buf:
        acc |= (int(b) & _MASK) << shift
        if b & _CONT:
            shift += 7
        else:
            values.append(acc & 0xFFFFFFFFFFFFFFFF)
            acc = 0
            shift = 0
    return np.array(values, dtype=np.uint64).astype(np.int64)


def encode_doc_gaps(doc_ids: Sequence[int]) -> bytes:
    """Delta-gap encode an int64 doc-id list sorted by its *unsigned*
    reinterpretation (the index's doc-range blocks are unsigned ranges
    of xxhash64 ids, so within-block order is unsigned).  The first
    value is stored separately (column ``first_doc``); this encodes the
    n-1 strictly-positive unsigned gaps."""
    arr = np.asarray(doc_ids, dtype=np.int64)
    if len(arr) <= 1:
        return b""
    gaps = np.diff(arr.astype(np.uint64).astype(object))
    if min(gaps) <= 0:
        raise ValueError("doc ids must be strictly increasing")
    return encode_varints([int(g) for g in gaps])


def decode_doc_gaps(first_doc: int, gaps: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_doc_gaps`: reconstruct n sorted doc ids."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.astype(np.int64)
    out[0] = np.uint64(np.int64(first_doc).astype(np.uint64))
    if n > 1:
        decoded = decode_varints(gaps).astype(np.uint64)
        out[1:] = decoded[: n - 1]
        out = np.cumsum(out, dtype=np.uint64)
    return out.astype(np.int64)

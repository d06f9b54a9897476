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
    """LEB128-encode a sequence of non-negative ints (each < 2**64).

    Vectorized: ~10 numpy passes (one per possible varint byte) instead
    of a per-value Python loop — this runs inside the index-build UDF
    over millions of postings."""
    if isinstance(values, np.ndarray) and values.dtype == np.uint64:
        arr = values
    elif isinstance(values, np.ndarray) and values.dtype.kind == "i":
        if values.size and int(values.min()) < 0:
            raise ValueError("varint values must be non-negative")
        arr = values.astype(np.uint64)
    else:
        lst = [int(v) for v in values]
        if any(v < 0 or v >= 2**64 for v in lst):
            raise ValueError("varint values must be in [0, 2**64)")
        arr = np.array(lst, dtype=np.uint64)
    if arr.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(arr.shape, dtype=np.int64)
    tmp = arr.copy()
    while np.any(tmp):
        nz = tmp != 0
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for i in range(max_b):
        sel = nbytes > i
        chunk = ((arr[sel] >> np.uint64(7 * i)) & np.uint64(_MASK)).astype(
            np.uint8
        )
        cont = (nbytes[sel] > i + 1).astype(np.uint8) * _CONT
        out[offsets[sel] + i] = chunk | cont
    return out.tobytes()


def decode_varints(data: bytes) -> np.ndarray:
    """Decode a LEB128 byte string to an int64 numpy array (values are
    produced mod 2**64 then reinterpreted signed, matching encode of
    Python ints below 2**64).  Vectorized with reduceat — this runs in
    the WAND scorer's hot path."""
    if not data:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    ends = np.flatnonzero(buf < _CONT)
    starts = np.empty(ends.shape, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    within = np.arange(buf.size, dtype=np.int64)
    # position of each byte inside its value group
    group = np.searchsorted(ends, within, side="left")
    within = within - starts[group]
    contrib = (buf.astype(np.uint64) & np.uint64(_MASK)) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts).astype(np.int64)


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

"""Vectorized text-similarity kernels (DuckDB-compatible semantics).

``byte_set_jaccard`` reproduces DuckDB's ``jaccard(a, b)`` exactly: the
Jaccard similarity of the *sets of utf-8 bytes* of the two strings
(verified: jaccard('héllo','hello') = 0.5 = |{h,l,o}| / |{h,0xC3,0xA9,e,l,o}|).
Representing each string as a 256-bit byte-presence bitmask (4 x uint64)
makes batch scoring a popcount matmul — no Python sets in the hot path.
"""

from __future__ import annotations

import numpy as np

_POPCNT = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)


def byte_masks(strings) -> np.ndarray:
    """(n,) strings -> (n, 4) uint64 byte-presence bitmasks."""
    n = len(strings)
    out = np.zeros((n, 4), dtype=np.uint64)
    for i, s in enumerate(strings):
        if not s:
            continue
        b = np.unique(np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8))
        w = b >> 6
        bit = np.uint64(1) << (b & 0x3F).astype(np.uint64)
        np.bitwise_or.at(out[i], w, bit)
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 via 16-bit table lookups."""
    x = np.ascontiguousarray(x)
    v = x.view(np.uint16).reshape(*x.shape, 4) if x.ndim else x.view(np.uint16)
    return _POPCNT[v].sum(axis=-1)


def byte_set_jaccard(masks_a: np.ndarray, masks_b: np.ndarray) -> np.ndarray:
    """Row-wise Jaccard of byte-set bitmasks -> float64 (DuckDB ``jaccard``)."""
    inter = popcount64(masks_a & masks_b).sum(axis=-1)
    union = popcount64(masks_a | masks_b).sum(axis=-1)
    union = np.maximum(union, 1)
    return inter / union

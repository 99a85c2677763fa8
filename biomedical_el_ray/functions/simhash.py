"""SimHash document fingerprints (Charikar 2002) — vectorized.

64-bit signatures from char-shingle hashes: each shingle votes ±1 on each
bit; the sign of the tally is the signature bit.  Near-duplicate candidates
= signatures within a small Hamming distance; bucketing by band rotations
gives the blocking keys.
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.functions.hashing import shingle_hashes_flat

_BITS = np.arange(64, dtype=np.uint64)


def simhash64(texts, k: int = 4) -> np.ndarray:
    """(n,) strings -> (n,) uint64 SimHash signatures, whole-batch vectorized.

    One ``shingle_hashes_flat`` pass over the concatenated batch, then 64
    bit-tally passes of ``np.add.reduceat`` over the flat hash array — no
    per-document Python and no (shingles x 64) matrix per document.
    Bit-identical to the old per-row loop (same distinct-shingle sets,
    same ``2*ones - n > 0`` majority rule)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    h, lengths = shingle_hashes_flat(texts, k)
    offsets = np.cumsum(lengths) - lengths
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat(
            ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64), offsets
        )
        out |= ((2 * ones - lengths) > 0).astype(np.uint64) << np.uint64(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distance between uint64 signature arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_band_keys(sigs: np.ndarray, bands: int = 4) -> list[list[str]]:
    """Split each 64-bit signature into ``bands`` contiguous chunks;
    signatures agreeing on any chunk become co-blocked candidates
    (tolerates up to bands-1 differing bits across the other chunks)."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = []
    for s in sigs:
        keys = []
        for b in range(bands):
            chunk = (s >> np.uint64(b * width)) & mask
            keys.append(f"sh{b}:{int(chunk):0{width // 4}x}")
        out.append(keys)
    return out

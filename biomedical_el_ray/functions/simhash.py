"""SimHash document fingerprints (Charikar 2002) — vectorized.

64-bit signatures from char-shingle hashes: each shingle votes ±1 on each
bit; the sign of the tally is the signature bit.  Near-duplicate candidates
= signatures within a small Hamming distance; bucketing by band rotations
gives the blocking keys.
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.functions.hashing import shingle_hashes

_BITS = np.arange(64, dtype=np.uint64)


def simhash64(texts, k: int = 4) -> np.ndarray:
    """(n,) strings -> (n,) uint64 SimHash signatures."""
    n = len(texts)
    out = np.empty(n, dtype=np.uint64)
    for i, s in enumerate(texts):
        h = shingle_hashes(s if s is not None else "", k)
        bits = (h[:, None] >> _BITS) & np.uint64(1)      # (n_shingles, 64)
        tally = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
        sig = np.uint64(0)
        sig_bits = (tally > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(sig_bits << _BITS) | sig
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

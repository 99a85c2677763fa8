"""Document fingerprinting: rolling-hash k-grams + winnowing.

Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD'03): slide a window of w
consecutive k-gram hashes, keep each window's minimum (rightmost on ties) —
a deterministic, position-robust fingerprint set for near-dup detection.
Vectorized with the same splitmix64 hashes as MinHash.
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.functions.hashing import splitmix64


def kgram_hashes(text: str, k: int = 5) -> np.ndarray:
    """Positional k-byte-gram hashes (NOT deduped; order preserved)."""
    raw = (text or "").encode("utf-8", "surrogatepass")
    if len(raw) < k:
        raw = raw + b"\x00" * (k - len(raw))
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = arr.size - k + 1
    packed = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        packed |= arr[j : j + n].astype(np.uint64) << np.uint64(8 * j)
    return splitmix64(packed)


def winnow(text: str, k: int = 5, w: int = 8) -> np.ndarray:
    """Winnowed fingerprint set -> sorted unique uint64 hashes."""
    h = kgram_hashes(text, k)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True)) if len(h) else np.array([], np.uint64)
    # sliding-window minimum via stride trick
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(h, w).min(axis=1)
    return np.unique(mins)


def winnow_similarity(a: str, b: str, k: int = 5, w: int = 8) -> float:
    """Jaccard over winnowed fingerprint sets (plagiarism-style score)."""
    fa, fb = set(winnow(a, k, w).tolist()), set(winnow(b, k, w).tolist())
    if not fa and not fb:
        return 1.0
    return len(fa & fb) / len(fa | fb)

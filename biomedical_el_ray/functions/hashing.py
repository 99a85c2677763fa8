"""Stable, process-independent 64-bit hashing (vectorized).

Python's builtin ``hash`` is salted per-process (PYTHONHASHSEED), so every
hash that feeds a shuffle key, a MinHash signature or a seeded sampler goes
through these functions instead.  Determinism across processes and across
parallelism levels (num_cpus=8 vs 32) is a hard requirement of the engine
(see SURVEY.md §4 "determinism"; the reference relies on ``set_seed``,
/root/reference/run_e2e_span.py:57-62, but resamples per epoch — we pin
every random choice to a key-derived seed instead).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Sebastiano Vigna)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = (x + _SM_GAMMA) & _MASK64
    x = ((x ^ (x >> np.uint64(30))) * _SM_M1) & _MASK64
    x = ((x ^ (x >> np.uint64(27))) * _SM_M2) & _MASK64
    return x ^ (x >> np.uint64(31))


def splitmix64_into(x: np.ndarray, out: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 with caller-provided buffers — zero allocations.

    ``out`` and ``tmp`` must be uint64 arrays of x's shape.  Identical
    output to ``splitmix64``; use in per-hash inner loops where the
    allocating version's temporaries (7 per call) blow the cache and
    saturate memory bandwidth under many concurrent workers.
    """
    np.add(x, _SM_GAMMA, out=out)
    np.right_shift(out, np.uint64(30), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    np.multiply(out, _SM_M1, out=out)
    np.right_shift(out, np.uint64(27), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    np.multiply(out, _SM_M2, out=out)
    np.right_shift(out, np.uint64(31), out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    return out


def stable_hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (blake2b-based, process independent)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def stable_seed(*parts: object) -> int:
    """Derive a 64-bit RNG seed from any key parts (strings/ints)."""
    h = hashlib.blake2b(digest_size=8)
    for p in parts:
        h.update(repr(p).encode("utf-8"))
        h.update(b"\x1f")
    return int.from_bytes(h.digest(), "little")


def hash64_column(strings) -> np.ndarray:
    """Stable 64-bit hashes for a sequence of strings -> uint64 array.

    Per-element blake2b over utf-8 bytes.  blake2b is C-implemented; this is
    the engine's exact-dedup / shuffle key hasher (SURVEY.md §2.7 D2:
    exact dedup = hash-partition + per-group first).
    """
    out = np.empty(len(strings), dtype=np.uint64)
    b2 = hashlib.blake2b
    for i, s in enumerate(strings):
        if s is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                b2(s.encode("utf-8", "surrogatepass"), digest_size=8).digest(),
                "little",
            )
    return out


def shingle_hashes_flat(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Distinct k-shingle hashes for a WHOLE batch of strings.

    Returns (flat values uint64, per-row lengths int64); row i's shingles
    are ``flat[offsets[i]:offsets[i]+lengths[i]]`` with
    ``offsets = cumsum(lengths) - lengths``.  One vectorized pass over the
    concatenated utf-8 bytes — the per-row variant costs ~1.4ms/row in
    numpy setup alone (measured: 235 core-s for a 167k-surface batch),
    this is ~100x less.
    """
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    enc = [
        (t if t is not None else "").encode("utf-8", "surrogatepass") for t in texts
    ]
    enc = [b if len(b) >= k else b + b"\x00" * (k - len(b)) for b in enc]
    blens = np.array([len(b) for b in enc], dtype=np.int64)
    arr = np.frombuffer(b"".join(enc), dtype=np.uint8)
    total = arr.size
    nwin = total - k + 1
    packed = np.zeros(nwin, dtype=np.uint64)
    for j in range(k):
        packed |= arr[j : j + nwin].astype(np.uint64) << np.uint64(8 * j)
    hashes = splitmix64(packed)
    # valid windows: start within a row and not crossing its end
    row_of = np.repeat(np.arange(n, dtype=np.int64), blens)[:nwin]
    ends = np.cumsum(blens)
    starts = ends - blens
    valid = np.arange(nwin, dtype=np.int64) <= ends[row_of] - k
    h = hashes[valid]
    r = row_of[valid]
    # per-row distinct: sort by (row, hash), drop adjacent duplicates
    order = np.lexsort((h, r))
    h, r = h[order], r[order]
    if h.size:
        keep = np.empty(h.size, dtype=bool)
        keep[0] = True
        keep[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        h, r = h[keep], r[keep]
    lengths = np.bincount(r, minlength=n).astype(np.int64)
    return h, lengths


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-byte-shingle hashes of a string -> uint64 array (vectorized).

    Slides a k-byte window over the utf-8 encoding, packs each window into a
    uint64 (k<=8) and applies splitmix64.  This is the engine's analog of the
    reference's WordPiece subword enumeration feeding candidate retrieval
    (/root/reference/tokenization_bert.py:444-494) — shingles feed MinHash
    blocking instead of a learned vocab.
    """
    raw = text.encode("utf-8", "surrogatepass")
    if len(raw) < k:
        raw = raw + b"\x00" * (k - len(raw))
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = arr.size - k + 1
    # pack k bytes into uint64 little-endian via strided view
    packed = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        packed |= arr[j : j + n].astype(np.uint64) << np.uint64(8 * j)
    return splitmix64(np.unique(packed))

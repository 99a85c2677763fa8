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
    """Vectorized splitmix64 finalizer over a uint64 array (wraparound
    multiply is the algorithm; numpy's overflow warning on 0-d inputs is
    suppressed, not a defect)."""
    with np.errstate(over="ignore"):
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


_POS_SALT = np.uint64(0xA076_1D64_78BD_642F)  # xxh64 prime (public constant)
_LEN_SALT = np.uint64(0xC2B2_AE3D_27D4_EB4F)


# rows at or under this byte length hash via the vectorized multilinear
# path; longer rows via per-row blake2b (C-speed on bulk bytes).  The
# choice is a pure function of the ROW's length, so the same string gets
# the same hash in every batch/stage — measured crossover on this box:
# vectorized 3.4x faster at ~20B/row, blake2b 6x faster at ~600B/row.
_VEC_LEN_CUT = 64


def _hash64_packed(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized variable-length hash over rows of a shared byte buffer.

    Multilinear construction: each row's bytes are packed into 8-byte words
    (zero-padded tail), every word is finalized together with its position
    (``splitmix64(word ^ splitmix64(pos * prime))`` — a distinct random-ish
    64-bit mixer per position, so permuted content hashes differently),
    word mixes are summed per row mod 2^64 (``np.add.reduceat``) and the
    sum is finalized with the row length.  Process-independent, identical
    at any batch split, no per-row Python.
    """
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if len(data) == 0:
        # all-empty batch: the shared buffer has no byte to gather; a
        # single zero byte feeds the (fully masked) tail words the same
        # zero padding non-empty batches see
        data = np.zeros(1, dtype=np.uint8)
    nw = np.maximum((lens + 7) // 8, 1)  # >=1 word so empty rows reduce cleanly
    W = int(nw.sum())
    row_of = np.repeat(np.arange(n, dtype=np.int64), nw)
    seg = np.cumsum(nw) - nw
    wpos = np.arange(W, dtype=np.int64) - np.repeat(seg, nw)  # word idx in row
    gstart = starts[row_of] + wpos * 8
    # one 2D byte gather (tail words may over-read; zeroed just below)
    cap = max(len(data) - 1, 0)
    idx = np.minimum(gstart[:, None] + np.arange(8, dtype=np.int64), cap)
    w = data[idx]  # (W, 8) uint8, fresh array
    tail_w = seg + nw - 1
    tail_valid = lens - (nw - 1) * 8  # valid bytes in each row's tail word
    need = tail_valid < 8
    if need.any():
        fw = tail_w[need]
        mask = np.arange(8)[None, :] < tail_valid[need][:, None]
        w[fw] &= mask.astype(np.uint8) * np.uint8(0xFF)
    w64 = np.ascontiguousarray(w).view(np.uint64).ravel()
    m = splitmix64(w64 ^ splitmix64(wpos.astype(np.uint64) * _POS_SALT))
    sums = np.add.reduceat(m, seg)
    return splitmix64(sums ^ (lens.astype(np.uint64) * _LEN_SALT))


def _hash64_blake_rows(data: np.ndarray, starts, lens, rows) -> np.ndarray:
    """blake2b-8 of selected long rows (bulk bytes at C speed, zero-copy
    memoryview slices of the shared buffer)."""
    b2 = hashlib.blake2b
    mv = memoryview(data)
    out = np.empty(len(rows), dtype=np.uint64)
    for i, r in enumerate(rows):
        s = int(starts[r])
        out[i] = int.from_bytes(
            b2(mv[s : s + int(lens[r])], digest_size=8).digest(), "little"
        )
    return out


def hash64_arrow(col) -> np.ndarray:
    """Stable 64-bit hashes of an Arrow string column -> uint64 (null -> 0).

    Zero-copy off the Arrow offsets/data buffers; the vectorized
    replacement for the old per-row blake2b loop (measured ~10x on
    document-length strings).  This is the engine's exact-dedup / shuffle
    key hasher (SURVEY.md §2.7 D2: exact dedup = hash-partition +
    per-group first) — values are internal keys, never query output.
    """
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nulls = col.null_count > 0
    if nulls:
        import pyarrow.compute as pc

        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        col = pc.fill_null(col, b"" if pa.types.is_binary(col.type)
                           or pa.types.is_large_binary(col.type) else "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    odt = (
        np.int64
        if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
        else np.int32
    )
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None
        else np.empty(0, np.uint8)
    )
    starts = offs[:-1]
    lens = offs[1:] - offs[:-1]
    long_rows = np.flatnonzero(lens > _VEC_LEN_CUT)
    if long_rows.size == 0:
        out = _hash64_packed(data, starts, lens)
    elif long_rows.size == n:
        out = _hash64_blake_rows(data, starts, lens, long_rows)
    else:
        out = np.empty(n, dtype=np.uint64)
        short_rows = np.flatnonzero(lens <= _VEC_LEN_CUT)
        out[short_rows] = _hash64_packed(
            data, starts[short_rows], lens[short_rows]
        )
        out[long_rows] = _hash64_blake_rows(data, starts, lens, long_rows)
    if nulls:
        out[null_mask] = 0
    return out


def hash64_column(strings) -> np.ndarray:
    """Stable 64-bit hashes for a sequence of strings -> uint64 array
    (null -> 0).  Accepts a Python sequence or an Arrow string column;
    see ``hash64_arrow`` for the vectorized construction."""
    import pyarrow as pa

    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        return hash64_arrow(strings)
    try:
        arr = pa.array(list(strings), pa.string())
    except (pa.ArrowInvalid, UnicodeEncodeError):
        # lone surrogates: hash the surrogatepass bytes (identical buffer
        # layout, and clean strings hash the same either way)
        arr = pa.array(
            [
                None if s is None else s.encode("utf-8", "surrogatepass")
                for s in strings
            ],
            pa.binary(),
        )
    return hash64_arrow(arr)


def packed_windows(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Every k-byte window of every string, packed little-endian into
    uint64 — the shared raw-window kernel under ``shingle_hashes_flat``
    (which splitmixes + dedups it) and the LM-quality bigram enumerator
    (which consumes k=2 codes directly).

    utf-8 encode with surrogatepass, zero-pad each row to >= k bytes,
    one pass over the concatenated buffer.  Returns (flat uint64 codes in
    row order WITH multiplicity, per-row window counts int64)."""
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
    # valid windows: start within a row and not crossing its end
    row_of = np.repeat(np.arange(n, dtype=np.int64), blens)[:nwin]
    ends = np.cumsum(blens)
    valid = np.arange(nwin, dtype=np.int64) <= ends[row_of] - k
    return packed[valid], blens - k + 1


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
    codes, counts = packed_windows(texts, k)
    h = splitmix64(codes)
    r = np.repeat(np.arange(n, dtype=np.int64), counts)
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

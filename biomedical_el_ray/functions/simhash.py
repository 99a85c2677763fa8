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


_M64 = 1 << 64
_SM_GAMMA_I = 0x9E3779B97F4A7C15
_SM_M1_I = 0xBF58476D1CE4E5B9
_SM_M2_I = 0x94D049BB133111EB


def _mulmod_sql(a: str, c: int) -> str:
    """SQL for ``(a * c) mod 2**64`` over HUGEINT without 128-bit overflow.

    Splits the 64-bit constant into 32-bit limbs: a*c_lo < 2**96 and
    a*c_hi < 2**96 both fit HUGEINT; the high product is reduced mod 2**32
    before the <<32 so every intermediate stays under 2**97."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"(({a} * {lo}::HUGEINT"
        f" + (({a} * {hi}::HUGEINT) % 4294967296) * 4294967296) % {_M64})"
    )


def simhash_oracle_sql(docs_rel: str = "documents", k: int = 4) -> str:
    """DuckDB SQL equivalent of ``simhash64`` over (doc_id, text).

    Reproduces the kernel exactly: utf-8 bytes zero-padded to >= k, all
    k-byte windows packed little-endian, ``splitmix64`` (verified
    bit-identical to the numpy kernel via HUGEINT limb arithmetic),
    per-document DISTINCT hashes, and the ``2*ones - n > 0`` per-bit
    majority.  Requires k == 4 so a packed window fits 32 bits and the
    byte decode can run through two 16-bit hex-lookup joins."""
    if k != 4:
        raise ValueError("oracle supports k=4 (packed window must fit 32 bits)")

    def _half(lo_bit: int) -> str:
        terms = [
            f"CASE WHEN 2 * sum((h // {1 << b}::HUGEINT) % 2) > count(*)"
            f" THEN {1 << (b - lo_bit)} ELSE 0 END"
            for b in range(lo_bit, lo_bit + 32)
        ]
        return "(" + "\n               + ".join(terms) + ")::BIGINT"

    return f"""
        WITH map16 AS (
          SELECT i AS v, printf('%02X%02X', i % 256, i // 256) AS hx4
          FROM range(65536) t(i)),
        d AS (
          SELECT doc_id,
                 hex(encode(text))
                   || repeat('00', greatest(0, {k} - octet_length(encode(text))))
                   AS hx,
                 greatest(octet_length(encode(text)), {k}) AS blen
          FROM {docs_rel}),
        pos AS (
          SELECT doc_id, hx, unnest(generate_series(0, blen - {k})) AS p
          FROM d),
        win AS (
          SELECT doc_id, substr(hx, 2 * p + 1, 4) AS c0,
                 substr(hx, 2 * p + 5, 4) AS c1
          FROM pos),
        sm AS (
          SELECT w.doc_id,
            (m0.v + 65536 * m1.v)::HUGEINT AS x,
            ((x + {_SM_GAMMA_I}::HUGEINT) % {_M64}) AS s1,
            xor(s1, s1 // {1 << 30}) AS s2,
            {_mulmod_sql('s2', _SM_M1_I)} AS s3,
            xor(s3, s3 // {1 << 27}) AS s4,
            {_mulmod_sql('s4', _SM_M2_I)} AS s5,
            xor(s5, s5 // {1 << 31}) AS h0
          FROM win w
          JOIN map16 m0 ON w.c0 = m0.hx4
          JOIN map16 m1 ON w.c1 = m1.hx4),
        sh AS (SELECT DISTINCT doc_id, h0 AS h FROM sm)
        SELECT doc_id,
               printf('%08x%08x', {_half(32)}, {_half(0)}) AS simhash
        FROM sh GROUP BY doc_id
    """

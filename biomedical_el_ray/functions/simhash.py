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


def _sig_cte(docs_rel: str, k: int) -> str:
    """CTE chain ending in ``ssig(doc_id, sig)``: the HUGEINT SimHash
    signature per document (shared by the fingerprint and dedup oracles)."""
    from biomedical_el_ray.functions.sql_hash import shingle_cte

    def _half(lo_bit: int) -> str:
        terms = [
            f"CASE WHEN 2 * sum((h // {1 << b}::HUGEINT) % 2) > count(*)"
            f" THEN {1 << (b - lo_bit)} ELSE 0 END"
            for b in range(lo_bit, lo_bit + 32)
        ]
        return "(" + "\n               + ".join(terms) + ")::BIGINT"

    return f"""{shingle_cte(docs_rel, k)},
        halves AS (
          SELECT doc_id, {_half(32)} AS hi, {_half(0)} AS lo
          FROM sh GROUP BY doc_id),
        ssig AS (
          SELECT doc_id, (hi::HUGEINT * 4294967296 + lo::HUGEINT) AS sig,
                 hi, lo
          FROM halves)"""


def simhash_oracle_sql(docs_rel: str = "documents", k: int = 4) -> str:
    """DuckDB SQL equivalent of ``simhash64`` over (doc_id, text).

    Reproduces the kernel exactly: utf-8 bytes zero-padded to >= k, all
    k-byte windows packed little-endian, ``splitmix64`` (bit-identical to
    the numpy kernel via HUGEINT limb arithmetic — see
    ``functions.sql_hash``), per-document DISTINCT hashes, and the
    ``2*ones - n > 0`` per-bit majority."""
    return f"""
        WITH {_sig_cte(docs_rel, k)}
        SELECT doc_id, printf('%08x%08x', hi, lo) AS simhash
        FROM ssig
    """


def simhash_dedup_oracle_sql(docs_rel: str = "documents", bands: int = 4,
                             max_hamming: int = 8, k: int = 4) -> str:
    """DuckDB SQL equivalent of ``pipelines.dedup.simhash_dedup_candidates``:
    pairs whose signatures agree on >= 1 of ``bands`` contiguous chunks and
    lie within ``max_hamming`` bits -> (doc_lo, doc_hi, hamming), exactly
    once per pair.  The Ray path's band-salted uint64 keys only prevent
    cross-band collisions, so joining on (band, chunk) directly is
    equivalent."""
    width = 64 // bands
    chunk_mask = (1 << width) - 1
    band_list = ", ".join(str(b) for b in range(bands))
    chunk_list = ", ".join(
        f"(sig // {1 << (b * width)}::HUGEINT) % {chunk_mask + 1}"
        for b in range(bands)
    )
    return f"""
        WITH {_sig_cte(docs_rel, k)},
        chunks AS (
          SELECT doc_id, sig,
                 unnest([{band_list}]) AS band,
                 unnest([{chunk_list}]) AS chunk
          FROM ssig),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
                 a.sig AS sa, b.sig AS sb
          FROM chunks a
          JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk
                       AND a.doc_id < b.doc_id)
        SELECT doc_lo, doc_hi, bit_count(xor(sa, sb))::BIGINT AS hamming
        FROM pairs
        WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """

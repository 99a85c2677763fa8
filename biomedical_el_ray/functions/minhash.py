"""Batch-vectorized MinHash signatures + LSH band keys.

The engine's analog of the reference's candidate retrieval: where
BioMedical-EL mines candidates by brute-force k-NN over every entity
embedding (/root/reference/utils_e2e_span.py:416-428 — torch.bmm + topk over
a 29k x 768 matrix), we block by MinHash/LSH over character shingles so two
string-similar mention surfaces land in the same band bucket without an
all-pairs comparison (Broder 1997; Leskovec-Rajaraman-Ullman ch.3).

All hashing is splitmix64-based and process independent, so N- and 4N-CPU
runs produce identical blocks (SURVEY.md §4 determinism).
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.functions.hashing import shingle_hashes_flat, splitmix64

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_seeds(num_hashes: int, seed: int) -> np.ndarray:
    base = splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(seed | 1))
    return base


def minhash_signatures(
    surfaces, num_hashes: int = 64, k: int = 3, seed: int = 0x5EED01
) -> np.ndarray:
    """MinHash signatures for a batch of strings -> (n, num_hashes) uint64.

    Fully batch-vectorized: one pass extracts every row's shingles
    (``shingle_hashes_flat``), then the permutation mins are computed over
    the concatenated shingle array using ``np.minimum.reduceat`` (no
    per-row Python or numpy setup in the loop).
    """
    n = len(surfaces)
    seeds = _perm_seeds(num_hashes, seed)
    if n == 0:
        return np.empty((0, num_hashes), dtype=np.uint64)
    flat, lengths = shingle_hashes_flat(surfaces, k)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    # per-hash in-place mix + reduceat: the whole inner loop works on two
    # shingle-sized buffers (cache-resident), instead of one (H x S)
    # matrix whose splitmix temporaries saturate memory bandwidth when
    # many workers run concurrently
    from biomedical_el_ray.functions.hashing import splitmix64_into

    sig = np.empty((n, num_hashes), dtype=np.uint64)
    buf = np.empty_like(flat)
    tmp = np.empty_like(flat)
    xored = np.empty_like(flat)
    for h in range(num_hashes):
        np.bitwise_xor(flat, seeds[h], out=xored)
        splitmix64_into(xored, buf, tmp)
        sig[:, h] = np.minimum.reduceat(buf, offsets)
    return sig


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """Fold each band's rows into one 64-bit value -> (n, bands) uint64.

    The band index seeds the fold, so equal values across different bands
    cannot collide; keys stay uint64 end-to-end (no string formatting —
    block keys, shuffle keys and the pair-dedup slot signature all consume
    these values directly).
    """
    n, h = sig.shape
    r = h // bands
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * r : (b + 1) * r]
        acc = np.full(n, np.uint64(b + 0x9E37), dtype=np.uint64)
        for j in range(r):
            acc = splitmix64(acc ^ chunk[:, j])
        out[:, b] = acc
    return out


def band_keys(sig: np.ndarray, bands: int, prefix: str = "mh") -> list[list[str]]:
    """String form of ``band_hashes`` -> per-row list of keys
    (``mh{band:02d}:{hash:016x}``) for pipelines that key on strings."""
    bh = band_hashes(sig, bands)
    n = bh.shape[0]
    return [
        [f"{prefix}{b:02d}:{bh[i, b]:016x}" for b in range(bands)] for i in range(n)
    ]


def band_keys_oracle_cte(docs_rel: str, id_col: str = "doc_id",
                         text_col: str = "text", num_hashes: int = 64,
                         bands: int = 16, k: int = 5,
                         seed: int = 0x5EED01,
                         prefix: str = "") -> tuple[str, str]:
    """CTE chain (to splice after ``WITH``) ending in ``bk(doc_id, band,
    bkey)``: every row's LSH band keys, bit-identical to
    ``band_hashes(minhash_signatures(...))``.

    Mechanically mirrors the kernels: DISTINCT k-shingle splitmix hashes
    (``functions.sql_hash.shingle_cte``), per-permutation minima of
    ``splitmix64(h ^ seed_i)`` (seeds embedded as constants from
    ``_perm_seeds`` so they cannot drift), then the sequential band fold
    ``acc = splitmix64(acc ^ sig[j])`` built with ``splitmix_step_ctes``
    (chained projection levels — lateral-alias chaining would grow the
    bound expression tree 32x per fold step and kill the binder).
    ``band`` is the slot index, so first-shared-slot logic can use it.
    ``prefix`` renames every internal CTE (final relation =
    ``{prefix}bk``) so the chain can coexist with other chains in one
    query."""
    from biomedical_el_ray.functions.sql_hash import (
        shingle_cte,
        splitmix_step_ctes,
        splitmix_steps,
    )

    q = prefix
    r = num_hashes // bands
    seeds = _perm_seeds(num_hashes, seed)
    seed_rows = ", ".join(
        f"({i}, {int(seeds[i])}::HUGEINT)" for i in range(num_hashes)
    )
    perm_defs, perm_out = splitmix_steps("xor(s.h, e.sd)", "p_")
    perm_cols = ",\n            ".join(perm_defs)
    piv_cols = ",\n            ".join(
        f"min(mh) FILTER (WHERE hi = {i}) AS m{i}" for i in range(num_hashes)
    )
    mcols = [f"m{i}" for i in range(num_hashes)]
    fold_text = ""
    rel = f"{q}piv"
    for j in range(r):
        if j == 0:
            apply = [
                (f"a{b}", f"xor({b + 0x9E37}::HUGEINT, m{b * r})")
                for b in range(bands)
            ]
        else:
            apply = [
                (f"a{b}", f"xor(a{b}, m{b * r + j})") for b in range(bands)
            ]
        # later fold steps still need the m columns; the last one only the accs
        carry = ["doc_id"] + (mcols if j < r - 1 else [])
        text, rel = splitmix_step_ctes(rel, carry, apply, f"{q}f{j}_")
        fold_text += ",\n        " + text
    band_list = ", ".join(str(b) for b in range(bands))
    final_list = ", ".join(f"a{b}" for b in range(bands))
    return f"""{shingle_cte(docs_rel, k, id_col=id_col, text_col=text_col, prefix=q)},
        {q}seeds(hi, sd) AS (VALUES {seed_rows}),
        {q}perm AS (
          SELECT s.doc_id, e.hi,
            {perm_cols}
          FROM {q}sh s CROSS JOIN {q}seeds e),
        {q}mins AS (
          SELECT doc_id, hi, min({perm_out}) AS mh
          FROM {q}perm GROUP BY doc_id, hi),
        {q}piv AS (
          SELECT doc_id,
            {piv_cols}
          FROM {q}mins GROUP BY doc_id){fold_text},
        {q}bk AS (
          SELECT doc_id, unnest([{band_list}]) AS band,
                 unnest([{final_list}]) AS bkey
          FROM {rel})""", f"{q}bk"


def minhash_dedup_oracle_sql(docs_rel: str = "documents",
                             num_hashes: int = 64, bands: int = 16,
                             k: int = 5, seed: int = 0x5EED01) -> str:
    """DuckDB SQL equivalent of ``pipelines.dedup.minhash_dedup_candidates``:
    (doc_lo, doc_hi, n_bands) for every pair colliding in >= 1 LSH band.
    n_bands falls out of the (band, key) equi-join count, exactly like
    the Ray path's per-pair band-equality sum (see
    ``band_keys_oracle_cte`` for the signature/fold reproduction)."""
    cte, bk = band_keys_oracle_cte(
        docs_rel, num_hashes=num_hashes, bands=bands, k=k, seed=seed
    )
    return f"""
        WITH {cte}
        SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
               count(*)::BIGINT AS n_bands
        FROM {bk} a
        JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """

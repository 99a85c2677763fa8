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


def winnow_dedup_oracle_sql(docs_rel: str = "documents", k: int = 5,
                            w: int = 8, max_fps: int = 24,
                            min_shared: int = 2, max_df: int = 32) -> str:
    """DuckDB SQL equivalent of ``pipelines.dedup.winnow_near_dup``:
    (doc_lo, doc_hi, n_shared) for pairs sharing >= ``min_shared`` winnowed
    fingerprints after the bottom-``max_fps`` sketch and the
    doc-frequency > ``max_df`` hot-key drop.

    Mirrors the kernels exactly: positional k-gram splitmix hashes
    (``sql_hash.shingle_cte(positional=True)`` == ``kgram_hashes``),
    sliding-window minima over a ``ROWS BETWEEN`` frame (full windows
    only, matching ``sliding_window_view(h, w).min(axis=1)``), the
    ``len(h) <= w`` whole-doc-min fallback, DISTINCT + ascending-order
    bottom sketch, then the fp self-join with a shared-count threshold."""
    from biomedical_el_ray.functions.sql_hash import shingle_cte

    return f"""
        WITH {shingle_cte(docs_rel, k, positional=True)},
        wm AS (
          SELECT doc_id, p, h,
                 count(*) OVER (PARTITION BY doc_id) AS n,
                 min(h) OVER (PARTITION BY doc_id ORDER BY p
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS m
          FROM sh),
        fpu AS (
          SELECT DISTINCT doc_id, m AS fp
          FROM wm WHERE n > {w} AND p <= n - {w}
          UNION ALL
          SELECT doc_id, min(h) AS fp
          FROM wm WHERE n <= {w} GROUP BY doc_id),
        sk AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
                   row_number() OVER (PARTITION BY doc_id ORDER BY fp) AS rn
            FROM fpu)
          WHERE rn <= {max_fps}),
        df AS (SELECT fp FROM sk GROUP BY fp HAVING count(*) <= {max_df})
        SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
               count(*)::BIGINT AS n_shared
        FROM sk a
        JOIN df USING (fp)
        JOIN sk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}
    """

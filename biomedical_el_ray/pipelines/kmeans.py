"""Distributed Lloyd k-means codebook over the ``embeddings`` table.

Closes the loop ``ann_ivf_topk`` documents ("swap the centroid Dataset
for a trained codebook at scale"): the coarse quantizer is TRAINED here
with a fixed number of Lloyd iterations, expressed Ray-Data-first —
each iteration is ONE streaming ``map_batches`` pass emitting bounded
per-block partials (cluster x dim integer sums + counts), reduced by a
``groupby`` over <= k*dim keys; only that bounded table reaches the
driver, which closes the iteration by broadcasting the next codebook
with ``ray.put``.  The corpus itself never materializes and the shuffle
per iteration moves k*dim rows per block, never vectors.

This mirrors the iterative shape of the reference's per-epoch
hard-negative mining loop (/root/reference/run_e2e_span.py:297-317):
a small state object is re-fit against the full dataset each round.

Determinism / oracle exactness (the ``lm_quality`` fixed-point design):

* elements are fixed-point ``floor(x * 1e6 + 0.5)`` int64, so partial
  sums are exact in any combine order;
* assignment = argmin of INTEGER squared L2, ties to the smaller
  cluster id;
* the centroid update divides integer sums by counts with
  truncation-toward-zero (DuckDB's ``//`` semantics; numpy's ``//``
  floors, so the engine emulates truncation with sign/abs) — keeping
  every iteration bit-identical to the chained-CTE DuckDB oracle;
* seeds = the vectors with ``vec_id < k`` (a relational init rule, like
  the IVF stride rule);
* clusters that lose all members are dropped (both sides: GROUP BY
  drops them naturally).

Overflow bounds: |q| <= SCALE * max|x|; squared diffs * dim and
per-cluster sums stay far inside int64 for any realistic embedding
range and cluster size (asserted at fit time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from biomedical_el_ray.pipelines.ann import _emb_matrix
from biomedical_el_ray.sources.readers import read_table
from biomedical_el_ray.util import ref_key, worker_state

SCALE = 1_000_000
DEFAULT_K = 8
DEFAULT_ITERS = 2


def _fixed_point(m: np.ndarray) -> np.ndarray:
    """f64 matrix -> int64 fixed point, floor(x * 1e6 + 0.5) (the
    ``label_centroids`` rule, identical in DuckDB)."""
    return np.floor(m * float(SCALE) + 0.5).astype(np.int64)


def _assign(q: np.ndarray, cids: np.ndarray, cmat: np.ndarray) -> np.ndarray:
    """(n, d) int64 points vs (k, d) int64 centroids -> cluster id per
    point: integer squared-L2 argmin, ties to the smaller cluster id
    (``cids`` must be ascending)."""
    # ||q - c||^2 = ||q||^2 - 2 q.c + ||c||^2 ; all int64-exact here but
    # the cross term can overflow int64 at SCALE^2 * dim magnitudes, so
    # compute the distance directly per centroid (k is small).
    n = q.shape[0]
    best = np.full(n, -1, dtype=np.int64)
    bestd = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(cmat.shape[0]):
        diff = q - cmat[j]
        d = np.einsum("nd,nd->n", diff, diff)
        upd = d < bestd
        bestd[upd] = d[upd]
        best[upd] = cids[j]
    return best


def _partial_sums(t: pa.Table, cb_ref) -> pa.Table:
    """One block -> (cluster_id, dim, sum_q, n_vecs) bounded partial."""
    cids, cmat = worker_state(
        ("kmeans_cb", ref_key(cb_ref)), lambda: ray.get(cb_ref)
    )
    q = _fixed_point(_emb_matrix(t["embedding"]))
    lab = _assign(q, cids, cmat)
    order = np.argsort(lab, kind="stable")
    lab, q = lab[order], q[order]
    first = np.ones(lab.size, dtype=bool)
    first[1:] = lab[1:] != lab[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(q, starts, axis=0)
    counts = np.diff(np.append(starts, lab.size))
    g, d = sums.shape
    return pa.Table.from_arrays(
        [
            pa.array(np.repeat(lab[starts], d)),
            pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
            pa.array(sums.ravel()),
            pa.array(np.repeat(counts.astype(np.int64), d)),
        ],
        names=["cluster_id", "dim", "sum_q", "n_vecs"],
    )


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB ``//``."""
    return np.sign(s) * (np.abs(s) // n)


def _seed_codebook(emb_ds, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeds = fixed-point vectors with vec_id < k (distributed filter,
    bounded collect)."""

    def _f(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids < k))

    rows = emb_ds.map_batches(_f, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    cids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = _fixed_point(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    )
    order = np.argsort(cids)
    return cids[order], mat[order]


def fit_kmeans(emb_ds, k: int = DEFAULT_K, iters: int = DEFAULT_ITERS):
    """embeddings Dataset -> (cluster ids, (k', d) int64 centroids,
    (k',) counts) after ``iters`` Lloyd iterations.

    Each iteration: one streaming pass + one bounded groupby; the driver
    holds only k*dim integers between passes."""
    from ray.data.aggregate import Sum

    cids, cmat = _seed_codebook(emb_ds, k)
    if np.abs(cmat).max(initial=0) > 2**40:
        raise OverflowError("embedding magnitude past the fixed-point bound")
    counts = None
    for _ in range(iters):
        cb_ref = ray.put((cids, cmat))
        agg = (
            emb_ds.map_batches(
                _partial_sums,
                fn_kwargs={"cb_ref": cb_ref},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(["cluster_id", "dim"])
            .aggregate(Sum("sum_q"), Sum("n_vecs"))
        )
        rows = agg.take_all()  # bounded: <= k * dim rows
        if not rows:
            break
        live = sorted({int(r["cluster_id"]) for r in rows})
        pos = {c: i for i, c in enumerate(live)}
        d = cmat.shape[1]
        sums = np.zeros((len(live), d), dtype=np.int64)
        cnt = np.zeros(len(live), dtype=np.int64)
        for r in rows:
            i = pos[int(r["cluster_id"])]
            sums[i, int(r["dim"])] = int(r["sum(sum_q)"])
            cnt[i] = int(r["sum(n_vecs)"])  # repeated per dim, same value
        cids = np.array(live, dtype=np.int64)
        cmat = _trunc_div(sums, cnt[:, None])
        counts = cnt
    return cids, cmat, counts


def kmeans_codebook(sf_dir: str, k: int = DEFAULT_K,
                    iters: int = DEFAULT_ITERS):
    """Driver-contract query: (cluster_id, dim, c_fp, n_vecs) — the
    trained codebook, flat one row per (cluster, dimension)."""
    import pandas as pd

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cids, cmat, counts = fit_kmeans(emb, k=k, iters=iters)
    if counts is None:  # empty table
        return pd.DataFrame(
            {"cluster_id": [], "dim": [], "c_fp": [], "n_vecs": []}
        ).astype(np.int64)
    kk, d = cmat.shape
    return pd.DataFrame(
        {
            "cluster_id": np.repeat(cids, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), kk),
            "c_fp": cmat.ravel(),
            "n_vecs": np.repeat(counts, d),
        }
    )


def kmeans_cte_parts(k: int = DEFAULT_K, iters: int = DEFAULT_ITERS,
                     dim: int = 64) -> tuple[str, str]:
    """The trained-codebook CTE chain as (joined parts sans WITH, final
    CTE name) so composite oracles (``semdedup``) can extend it with
    assignment / pruning CTEs instead of duplicating the unroll."""
    assert iters >= 1
    parts = [f"""
        q AS (
          SELECT e.vec_id, r.i AS dim,
                 CAST(floor(CAST(e.embedding AS DOUBLE[])[r.i + 1]
                            * {SCALE} + 0.5) AS BIGINT) AS q
          FROM embeddings e, range({dim}) r(i)),
        c0 AS (
          SELECT vec_id AS cluster_id, dim, q AS c
          FROM q WHERE vec_id < {k})"""]
    for it in range(1, iters + 1):
        prev, asn, upd = f"c{it - 1}", f"a{it}", f"c{it}"
        parts.append(f"""
        {asn} AS (
          SELECT vec_id, cluster_id FROM (
            SELECT p.vec_id, c.cluster_id,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY sum((p.q - c.c) * (p.q - c.c)),
                              c.cluster_id) AS rn
            FROM q p JOIN {prev} c USING (dim)
            GROUP BY p.vec_id, c.cluster_id) WHERE rn = 1),
        {upd} AS (
          SELECT a.cluster_id, p.dim,
                 CAST(sum(p.q) AS BIGINT) // count(*) AS c,
                 CAST(count(*) AS BIGINT) AS n
          FROM {asn} a JOIN q p USING (vec_id)
          GROUP BY a.cluster_id, p.dim)""")
    return ",".join(parts), f"c{iters}"


def kmeans_oracle_sql(k: int = DEFAULT_K, iters: int = DEFAULT_ITERS,
                      dim: int = 64) -> str:
    """Chained-CTE DuckDB twin of ``kmeans_codebook``: same fixed-point
    elements, integer distances, truncating division and seed rule,
    unrolled for ``iters`` Lloyd iterations."""
    parts, final = kmeans_cte_parts(k, iters, dim)
    return f"""
        WITH {parts}
        SELECT cluster_id, dim, c AS c_fp, n AS n_vecs
        FROM {final}
    """

"""Lloyd k-means codebook: kernel exactness vs a pure-numpy reference,
truncating-division semantics, empty-cluster drop, determinism across
block layouts.  The DuckDB oracle row is covered by
``test_oracle_equivalence``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from biomedical_el_ray.pipelines.kmeans import (
    SCALE,
    _assign,
    _fixed_point,
    _trunc_div,
    fit_kmeans,
)


def _ref_kmeans(X: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-node reference: same fixed point, same tie rules."""
    q = _fixed_point(X)
    sel = ids < k
    cids = ids[sel]
    order = np.argsort(cids)
    cids, cmat = cids[order], q[sel][order]
    counts = None
    for _ in range(iters):
        lab = _assign(q, cids, cmat)
        live = np.array(sorted(set(lab.tolist())), dtype=np.int64)
        sums = np.stack([q[lab == c].sum(axis=0) for c in live])
        cnt = np.array([(lab == c).sum() for c in live], dtype=np.int64)
        cmat = _trunc_div(sums, cnt[:, None])
        cids, counts = live, cnt
    return cids, cmat, counts


def _mk_ds(X: np.ndarray, ids: np.ndarray, blocks: int = 1):
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in X.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_trunc_div_matches_duckdb_semantics():
    s = np.array([7, -7, 9, -9, 0])
    n = np.array([2, 2, 3, 3, 5])
    assert _trunc_div(s, n).tolist() == [3, -3, 3, -3, 0]


def test_fit_matches_reference_single_block():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(80, 8)).astype(np.float32).astype(np.float64)
    ids = np.arange(80, dtype=np.int64)
    got = fit_kmeans(_mk_ds(X, ids), k=4, iters=2)
    want = _ref_kmeans(X, ids, k=4, iters=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_fit_is_block_layout_invariant():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(60, 6)).astype(np.float32).astype(np.float64)
    ids = np.arange(60, dtype=np.int64)
    a = fit_kmeans(_mk_ds(X, ids, blocks=1), k=3, iters=2)
    b = fit_kmeans(_mk_ds(X, ids, blocks=13), k=3, iters=2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_empty_cluster_dropped():
    # all three seeds identical -> every point ties -> cluster 0 wins,
    # clusters 1 and 2 starve and must drop out of the codebook
    X2 = np.vstack([np.full((3, 2), 0.0), np.full((5, 2), 0.0),
                    np.full((6, 2), 10.0)])
    ids2 = np.arange(len(X2), dtype=np.int64)
    cids, cmat, counts = fit_kmeans(_mk_ds(X2, ids2), k=3, iters=2)
    assert cids.tolist() == [0]
    assert counts.sum() == len(X2)


def test_counts_cover_all_rows():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 4))
    ids = np.arange(50, dtype=np.int64)
    _, _, counts = fit_kmeans(_mk_ds(X, ids, blocks=7), k=5, iters=1)
    assert counts.sum() == 50


def test_semdedup_keep_rule():
    """Every kept vec has NO smaller-id same-cluster neighbor above the
    threshold; every dropped vec HAS one (independent numpy recompute)."""
    import pyarrow.parquet as pq

    from biomedical_el_ray.pipelines.dedup import semdedup
    from biomedical_el_ray.pipelines.kmeans import _assign, _fixed_point

    sf = "/root/testdata/sf0.001"
    out = semdedup(sf, k=8, iters=2, threshold=0.3)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    kept = set(df["vec_id"].astype(int))

    # the distributed plan (local_threshold=0) must match the local one
    ddf = semdedup(sf, k=8, iters=2, threshold=0.3,
                   local_threshold=0).to_pandas()
    a = df.sort_values("vec_id").reset_index(drop=True)
    b = ddf.sort_values("vec_id").reset_index(drop=True)
    assert (a["vec_id"].to_numpy() == b["vec_id"].to_numpy()).all()
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()

    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    o = np.argsort(ids)
    ids, emb = ids[o], emb[o]
    q = _fixed_point(emb)
    cids, cmat = ids[ids < 8].astype(np.int64), q[ids < 8]
    for _ in range(2):
        a = _assign(q, cids, cmat)
        live = np.array(sorted(set(a)), dtype=np.int64)
        nm = []
        for c in live:
            m = a == c
            s = q[m].sum(0)
            n = int(m.sum())
            nm.append((np.sign(s) * (np.abs(s) // n)).astype(np.int64))
        cids, cmat = live, np.array(nm)
    a = _assign(q, cids, cmat)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / norms[:, None]
    want_drop = set()
    for c in set(a):
        m = np.where(a == c)[0]
        S = unit[m] @ unit[m].T
        iu, ju = np.triu_indices(len(m), 1)
        hit = S[iu, ju] >= 0.3
        for i, j in zip(m[iu[hit]], m[ju[hit]]):
            want_drop.add(int(max(ids[i], ids[j])))
    assert kept == set(ids.tolist()) - want_drop
    # cluster ids in the output match the recomputed assignment
    got = dict(zip(df["vec_id"].astype(int), df["cluster_id"].astype(int)))
    ref = dict(zip(ids.tolist(), a.tolist()))
    assert all(got[v] == ref[v] for v in kept)


def test_assign_fast_path_matches_exact_loop():
    """The f64-GEMM assignment (k >= 32) must be bit-identical to the
    exact int64 loop, including ties -> smaller cluster id."""
    from biomedical_el_ray.pipelines.kmeans import _assign

    rng = np.random.default_rng(3)
    q = rng.integers(-4_000_000, 4_000_000, size=(500, 64)).astype(np.int64)
    cmat = rng.integers(-4_000_000, 4_000_000, size=(64, 64)).astype(np.int64)
    # plant exact ties: duplicate centroids at different ids
    cmat[40] = cmat[7]
    cmat[63] = cmat[0]
    # and exact-hit points (distance 0 to two duplicated centroids)
    q[0] = cmat[7]
    q[1] = cmat[0]
    cids = np.arange(64, dtype=np.int64) * 3 + 1  # ascending, non-contiguous

    fast = _assign(q, cids, cmat)

    # force the exact loop by lying about k (slice to < 32 twice and merge)
    n = q.shape[0]
    best = np.full(n, -1, dtype=np.int64)
    bestd = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(cmat.shape[0]):
        diff = q - cmat[j]
        d = np.einsum("nd,nd->n", diff, diff)
        upd = d < bestd
        bestd[upd] = d[upd]
        best[upd] = cids[j]
    assert (fast == best).all()
    assert fast[0] == cids[7] and fast[1] == cids[0]

"""Mergeable sketches: DDSketch-style quantiles, count-min heavy
hitters, exact-moment covariance + PCA (oracle bit-exactness is covered
by the test_oracle_equivalence sweep; these pin the sketch PROPERTIES)."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines import ann, profile  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_qsketch_bucket_roundtrip_and_error_bound():
    """Every positive value's bucket lower bound is <= the value and
    within the 2^-5 relative error bound; small values are exact."""
    v = np.unique(np.concatenate([
        np.arange(1, 100),
        np.array([2**k for k in range(1, 40)]),
        np.array([2**k - 1 for k in range(2, 40)]),
        np.random.default_rng(3).integers(1, 10**9, 500),
    ])).astype(np.int64)
    b = profile._qsketch_buckets(v)
    lo = profile._qsketch_lower(b)
    assert (lo <= v).all()
    rel = (v - lo) / v
    assert rel.max() < 2.0 ** -profile._QSK_SUBBITS
    small = v < (1 << profile._QSK_SUBBITS)
    assert (lo[small] == v[small]).all()
    # buckets are monotone in value
    order = np.argsort(v)
    assert (np.diff(b[order]) >= 0).all()


def test_quantile_sketch_vs_exact(ray_session):
    """Sketch estimates are within the guaranteed relative error of the
    exact per-type quantiles."""
    import duckdb

    got = profile.quantile_sketch(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')")
    for q_pm in (250, 500, 750, 900, 990):
        ex = con.execute(f"""
            SELECT event_type,
                   CAST(quantile_disc(
                     CAST(floor(value*100+0.5) AS BIGINT), {q_pm/1000})
                   AS BIGINT) AS v
            FROM events GROUP BY 1""").df()
        m = got[got.q_pm == q_pm].merge(ex, on="event_type")
        assert len(m) > 0
        rel = ((m.v - m.v_est_cents).abs() / m.v.clip(lower=1)).max()
        assert rel <= 2.0 ** -profile._QSK_SUBBITS + 0.04, (q_pm, rel)


def test_quantile_sketch_deterministic(ray_session):
    a = profile.quantile_sketch(SF).to_pandas()
    b = profile.quantile_sketch(SF).to_pandas()
    assert a.equals(b)


def test_cms_overestimates_and_ranks(ray_session):
    """CMS guarantee: est >= exact for every candidate; ranking by est
    descends; determinism."""
    g1 = profile.heavy_hitters_cms(SF).to_pandas()
    g2 = profile.heavy_hitters_cms(SF).to_pandas()
    assert g1.equals(g2)
    assert len(g1) > 0
    assert (g1.est >= g1.n_exact).all()
    assert (np.diff(g1.est.to_numpy()) <= 0).all()


def test_cms_matches_reference_sketch(ray_session):
    """The distributed sketch equals a from-scratch single-process CMS
    over the same token stream."""
    from biomedical_el_ray.functions.hashing import hash64_column, splitmix64

    got = profile.heavy_hitters_cms(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    toks: dict[str, int] = {}
    for txt in t["text"].to_pylist():
        for w in (txt or "").split():
            if len(w.encode()) <= 64:
                toks[w] = toks.get(w, 0) + 1
    seeds = profile._cms_seeds()
    mat = np.zeros((profile._CMS_D, profile._CMS_W), dtype=np.int64)
    h = hash64_column(pa.array(list(toks), pa.string()))
    cnts = np.array(list(toks.values()), dtype=np.int64)
    for r in range(profile._CMS_D):
        pos = (splitmix64(h ^ np.uint64(seeds[r]))
               % np.uint64(profile._CMS_W)).astype(np.int64)
        np.add.at(mat[r], pos, cnts)
    cand = np.asarray(h < np.uint64(profile._CMS_CAND_BOUND))
    est = {}
    for i in np.flatnonzero(cand):
        e = min(
            int(mat[r, int((splitmix64(h[i:i+1] ^ np.uint64(seeds[r]))
                            % np.uint64(profile._CMS_W))[0])])
            for r in range(profile._CMS_D))
        est[list(toks)[i]] = e
    for row in got.itertuples():
        assert est[row.tok] == row.est, row.tok
        assert toks[row.tok] == row.n_exact, row.tok


def test_pca_components_reference(ray_session):
    """PCA loadings/explained variance match a direct numpy PCA on the
    quantized table; loadings are orthonormal and variance descends."""
    p = ann.pca_components(SF, n_components=4).to_pandas()
    E = ann._emb_matrix(
        pq.read_table(f"{SF}/embeddings.parquet")["embedding"])
    Q = np.floor(E * 1e6 + 0.5) / 1e6
    C = np.cov(Q.T, bias=True)
    w = np.sort(np.linalg.eigh(C)[0])[::-1][:4]
    ref_ev = w / np.trace(C)
    got_ev = (p.sort_values(["component", "dim"])
              .groupby("component")["explained_var_r"].first().to_numpy())
    assert np.allclose(got_ev, ref_ev, atol=1e-5)
    assert (np.diff(got_ev) <= 1e-12).all()
    L = p.pivot(index="component", columns="dim",
                values="loading_r").to_numpy()
    assert np.allclose(L @ L.T, np.eye(4), atol=1e-6)
    # sign convention: max-|loading| entry positive
    for row in L:
        assert row[np.argmax(np.abs(row))] > 0


def test_covariance_row_bound_raises(ray_session, monkeypatch):
    monkeypatch.setattr(ann, "_cov_max_rows", lambda scale: 10)
    import pytest

    with pytest.raises(ValueError, match="bound exceeded"):
        ann.embedding_covariance(SF)


def test_cov_max_rows_tracks_scale():
    """The int64 overflow bound must move with the caller's scale so the
    "lower scale" advice in the error message is actionable (ADVICE r4)."""
    assert ann._cov_max_rows(1_000_000) == (1 << 62) // 10**12
    # 10x smaller scale buys ~100x more rows (floor-division slack <= 1)
    assert abs(ann._cov_max_rows(100_000)
               - 100 * ann._cov_max_rows(1_000_000)) <= 100
    # a scale whose square exceeds 2^62 rejects EVERY non-empty corpus
    # (even one row's q*q would wrap int64) instead of silently passing
    assert ann._cov_max_rows(1 << 32) == 0


def test_embedding_drift_empty_parity_raises(ray_session, tmp_path):
    """All-one-parity vec_ids must raise a named error, not a bare
    ZeroDivisionError (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    pq.write_table(pa.table({
        "vec_id": pa.array([0, 2, 4, 6], pa.int64()),
        "embedding": pa.array([[0.1, 0.2]] * 4,
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ValueError, match="parity slice empty"):
        ann.embedding_drift(str(tmp_path))


def test_embedding_drift_properties(ray_session):
    """Drift is deterministic, nonnegative, and near zero when the two
    slices are the same distribution (both halves of one synthetic
    table) relative to the table's own scale."""
    a = ann.embedding_drift(SF).to_pandas()
    b = ann.embedding_drift(SF).to_pandas()
    assert a.equals(b)
    r = a.iloc[0]
    assert r.n_a > 0 and r.n_b > 0
    assert r.mean_l2_r >= 0 and r.cov_fro_r >= 0
    # same-distribution halves: mean shift well under the ~unit vector norm
    assert r.mean_l2_r < 0.5


def test_labeling_batch_stratified_and_deterministic(ray_session):
    """Labeling batch: deterministic, <= per_band rows per band, rnk
    1..k within band, bands clamped to [0, 9]."""
    from biomedical_el_ray.pipelines import linkage_emb as lemb

    a = lemb.labeling_batch(SF).to_pandas()
    b = lemb.labeling_batch(SF).to_pandas()
    key = ["band", "rnk"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    assert len(a) > 0
    assert a.band.between(0, 9).all()
    for band, g in a.groupby("band"):
        assert len(g) <= lemb._LB_PER_BAND
        assert sorted(g.rnk) == list(range(1, len(g) + 1))
    # every sampled pair scores inside its band
    dec = np.clip(np.floor(a.score_r * 10), 0, 9)
    # score_r is rounded; allow the band edge to flip by at most one
    assert (np.abs(dec - a.band) <= 1).all()

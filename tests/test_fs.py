"""Fellegi-Sunter weight estimation — supervised counts + unsupervised EM.

``fs_weights`` is covered by the oracle-equivalence sweep; here we pin the
EM path (rows-only): the histogram EM must equal a from-scratch per-pair
EM reference, its likelihood must be non-decreasing, and its evidence
directions must agree with the supervised estimates.
"""

import numpy as np
import pytest

from biomedical_el_ray.pipelines.linkage_emb import (
    comparison_histogram,
    em_fit,
    fs_em_weights,
    fs_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_em_per_pair(hist, iters):
    """Naive, from-scratch EM over the EXPANDED pair list (one row per
    pair), written independently of em_fit's vectorized form."""
    rows = []
    for cell in range(27):
        rows.extend([(cell // 9, (cell // 3) % 3, cell % 3)] * int(hist[cell]))
    lam = 0.1
    m = [[0.1, 0.3, 0.6] for _ in range(3)]
    u = [[0.7, 0.2, 0.1] for _ in range(3)]
    for _ in range(iters):
        resp = []
        for jw, lev, cos in rows:
            pm = lam * m[0][jw] * m[1][lev] * m[2][cos]
            pu = (1.0 - lam) * u[0][jw] * u[1][lev] * u[2][cos]
            resp.append(pm / max(pm + pu, 1e-300))
        wm = sum(resp)
        wu = sum(1.0 - r for r in resp)
        lam = wm / len(rows)
        newm = [[0.0] * 3 for _ in range(3)]
        newu = [[0.0] * 3 for _ in range(3)]
        for (jw, lev, cos), r in zip(rows, resp):
            for f, lv in ((0, jw), (1, lev), (2, cos)):
                newm[f][lv] += r
                newu[f][lv] += 1.0 - r
        for f in range(3):
            for lv in range(3):
                m[f][lv] = min(max(newm[f][lv] / max(wm, 1e-300), 1e-9), 1.0)
                u[f][lv] = min(max(newu[f][lv] / max(wu, 1e-300), 1e-9), 1.0)
    return lam, np.array(m), np.array(u)


@pytest.fixture(scope="module")
def hist(ray_session):
    return comparison_histogram(SF_DIR)


def test_histogram_em_equals_per_pair_reference(hist):
    lam_a, m_a, u_a = em_fit(hist, iters=8)
    lam_b, m_b, u_b = _reference_em_per_pair(hist, iters=8)
    assert lam_a == pytest.approx(lam_b, rel=1e-9)
    np.testing.assert_allclose(m_a, m_b, rtol=1e-9)
    np.testing.assert_allclose(u_a, u_b, rtol=1e-9)


def test_em_likelihood_nondecreasing(hist):
    idx = np.arange(27)
    bands = np.stack([idx // 9, (idx // 3) % 3, idx % 3])
    n = np.asarray(hist, np.float64)

    def loglik(lam, m, u):
        pm = lam * m[0, bands[0]] * m[1, bands[1]] * m[2, bands[2]]
        pu = (1 - lam) * u[0, bands[0]] * u[1, bands[1]] * u[2, bands[2]]
        return float((n * np.log(np.maximum(pm + pu, 1e-300))).sum())

    lls = [loglik(*em_fit(hist, iters=k)) for k in (1, 3, 6, 12, 25, 50)]
    assert all(b >= a - 1e-6 for a, b in zip(lls, lls[1:])), lls


def test_em_directions_agree_with_supervised(ray_session, hist):
    """Where the UNSUPERVISED fit takes a confident stance (EM likelihood
    ratio outside a neutral band), it must point the same way as the
    supervised gold-labeled estimate.  (EM assumes feature independence,
    so marginal levels of correlated features may legitimately land
    neutral where the supervised table is confident — those are skipped.)
    """
    sup = fs_weights(SF_DIR).to_pandas().set_index(["feature", "level"])
    lam, m, u = em_fit(hist, iters=50)
    fidx = {"jw": 0, "lev": 1, "cos": 2}
    checked = 0
    for (feat, lv), row in sup.iterrows():
        if row["n_match"] + row["n_nonmatch"] < 30 or row["lr_r"] == 0.0:
            continue
        em_lr = float(m[fidx[feat], lv]) / max(float(u[fidx[feat], lv]), 1e-9)
        if 0.5 <= em_lr <= 2.0:
            continue  # EM is neutral here; no stance to compare
        sup_dir = row["lr_r"] > 1.0
        em_dir = em_lr > 1.0
        assert em_dir == sup_dir, (feat, lv, row["lr_r"], em_lr)
        checked += 1
    assert checked >= 1


def test_fs_em_weights_shape(ray_session):
    t = fs_em_weights(SF_DIR, iters=10).to_pandas()
    assert len(t) == 9
    assert set(t.columns) == {
        "feature", "level", "m_em_r", "u_em_r", "lr_em_r", "lambda_r"}
    assert (t["lambda_r"] > 0).all() and (t["lambda_r"] < 1).all()

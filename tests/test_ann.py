"""ANN variants: IVF oracle-exactness is covered by
test_oracle_equivalence; here we pin the approximation quality of both
scale paths (LSH buckets, IVF inverted lists) against brute force."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.ann import (  # noqa: E402
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def brute_pairs(ray_session):
    df = ann_brute_topk(SF).to_pandas()
    return set(zip(df.q_vec_id, df.vec_id))


def _recall(df, brute) -> float:
    got = set(zip(df.q_vec_id, df.vec_id))
    return len(got & brute) / len(brute)


def test_lsh_recall_vs_brute(ray_session, brute_pairs):
    # bucket width sized to the 500-vector corpus (2^5 buckets); the
    # 8-bit default is tuned for much larger tables
    df = ann_lsh_topk(SF, bits=5).to_pandas()
    assert _recall(df, brute_pairs) >= 0.3


def test_ivf_recall_vs_brute(ray_session, brute_pairs):
    df = ann_ivf_topk(SF).to_pandas()
    r = _recall(df, brute_pairs)
    assert r >= 0.5, r  # nprobe=6 of ~14 lists

    # every result must rank <= k and carry the brute-force cosine for
    # pairs both searches retrieved (the IVF score path is exact)
    assert df.rnk.max() <= 10


def test_ivf_trained_recall_vs_brute(ray_session, brute_pairs):
    from biomedical_el_ray.pipelines.ann import ann_ivf_trained_topk

    df = ann_ivf_trained_topk(SF, n_centroids=8, iters=2, nprobe=4).to_pandas()
    r = _recall(df, brute_pairs)
    assert r >= 0.5, r  # nprobe=4 of <= 8 trained lists
    assert df.rnk.max() <= 10


def test_ivf_trained_is_deterministic(ray_session):
    from biomedical_el_ray.pipelines.ann import ann_ivf_trained_topk

    a = ann_ivf_trained_topk(SF).to_pandas().sort_values(
        ["q_vec_id", "rnk"]).reset_index(drop=True)
    b = ann_ivf_trained_topk(SF).to_pandas().sort_values(
        ["q_vec_id", "rnk"]).reset_index(drop=True)
    assert a.equals(b)

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


def test_knn_join_matches_duckdb(ray_session):
    import duckdb

    from biomedical_el_ray.pipelines.ann import knn_join, knn_join_oracle_sql

    got = (
        knn_join(SF, k=5)
        .to_pandas()
        .sort_values(["q_vec_id", "rnk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(knn_join_oracle_sql(k=5))
        .df()
        .sort_values(["q_vec_id", "rnk"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got[want.columns].astype(str).values == want.astype(str).values).all()


def test_knn_join_tiny_index(ray_session, tmp_path):
    # index smaller than k+1: every query gets n-1 neighbors, never a
    # self-match, ranks are 1..n-1
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_el_ray.pipelines.ann import knn_join

    rng = np.random.default_rng(7)
    n, d = 3, 4
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(rng.normal(size=(n, d)))),
        }
    )
    p = str(tmp_path)
    pq.write_table(t, p + "/embeddings.parquet")
    df = knn_join(p, k=5).to_pandas()
    assert len(df) == n * (n - 1)
    assert (df.q_vec_id != df.vec_id).all()
    assert df.groupby("q_vec_id").rnk.max().eq(n - 1).all()


def test_knn_join_index_cap(ray_session):
    from biomedical_el_ray.pipelines.ann import knn_join

    with pytest.raises(ValueError, match="IVF-partitioned"):
        knn_join(SF, max_index_rows=10)

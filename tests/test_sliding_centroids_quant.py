"""Edge cases for events_sliding, label_centroids and quantize_embeddings:
window membership counts, negative-value fixed-point sums, zero vectors."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_sliding_rejects_non_multiple_hop(ray_session):
    from biomedical_el_ray.pipelines.analytics import events_sliding

    with pytest.raises(ValueError, match="multiple"):
        events_sliding("/root/testdata/sf0.001", window_us=10, hop_us=3)


def test_sliding_event_lands_in_k_windows(ray_session, tmp_path):
    from biomedical_el_ray.pipelines.analytics import events_sliding

    # one event -> exactly window/hop = 4 windows, consecutive buckets,
    # each carrying the full value
    ts = pa.array([7_200_000_000], pa.timestamp("us"))  # 2h epoch
    tbl = pa.table({
        "event_id": [0], "ts": ts, "user_id": [1],
        "event_type": ["click"], "value": [2.5], "props": ["{}"],
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    df = events_sliding(str(tmp_path)).to_pandas().sort_values("win_bucket")
    assert len(df) == 4
    assert df.win_bucket.tolist() == [5, 6, 7, 8]  # 7.2e9/9e8 = 8, minus 0..3
    assert (df.n_events == 1).all()
    assert (df.sum_value_cents == 250).all()


def test_label_centroids_negative_values(ray_session, tmp_path):
    import duckdb

    from biomedical_el_ray.pipelines.ann import (
        label_centroids,
        label_centroids_oracle_sql,
    )

    # negative sums exercise the f64-division path (DuckDB's integer //
    # truncates while numpy floors — the mean must NOT go through either)
    emb = pa.array(
        [[-1.5, 0.25], [-0.5, 0.25], [3.0, -1.0]],
        pa.list_(pa.float32()),
    )
    tbl = pa.table({
        "vec_id": [0, 1, 2], "embedding": emb,
        "label": pa.array([7, 7, 9], pa.int32()),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    rdf = (
        label_centroids(str(tmp_path))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    odf = (
        con.execute(label_centroids_oracle_sql()).df()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert rdf.sum_fp.tolist() == odf.sum_fp.tolist() == [
        -2_000_000, 500_000, 3_000_000, -1_000_000
    ]
    assert (rdf.mean_fp.values == odf.mean_fp.values).all()
    assert rdf.mean_fp.tolist()[0] == -1_000_000.0


def test_quantize_zero_vector_and_roundtrip(ray_session, tmp_path):
    from biomedical_el_ray.pipelines.ann import quantize_embeddings

    rng = np.random.default_rng(7)
    vecs = [rng.standard_normal(8).astype(np.float32) for _ in range(5)]
    vecs.append(np.zeros(8, dtype=np.float32))
    tbl = pa.table({
        "vec_id": list(range(6)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 6, pa.int32()),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    df = quantize_embeddings(str(tmp_path)).to_pandas()
    z = df[df.vec_id == 5]
    assert (z.qval == 0).all() and (z.scale == 0.0).all()
    nz = df[df.vec_id < 5]
    assert nz.qval.abs().max() == 127  # the max element hits full range
    # dequantization error bound: |x - q*scale| <= scale/2 per element
    for vid, g in nz.groupby("vec_id"):
        g = g.sort_values("dim")
        x = vecs[vid].astype(np.float64)
        err = np.abs(x - g.qval.values * g.scale.values)
        assert (err <= g.scale.values / 2 + 1e-12).all()

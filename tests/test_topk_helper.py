"""util.grouped_topk_arrow — the shared Arrow per-group top-k reduce."""

import sys

import numpy as np
import pyarrow as pa
import ray.data

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.util import grouped_topk_arrow  # noqa: E402


def _rows(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return sorted(
        zip(*(t[c].to_pylist() for c in t.column_names)),
    ), t.column_names


def test_topk_rank_and_ties(ray_session):
    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "score": pa.array([0.9, 0.9, 0.5, 0.7, 0.3, 0.8], pa.float64()),
        "id": pa.array([7, 3, 1, 2, 9, 4], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = grouped_topk_arrow(
        ds, "g", [("score", "descending"), ("id", "ascending")], 2,
        out_cols=["g", "id", "rnk"],
    )
    rows, cols = _rows(out)
    assert cols == ["g", "id", "rnk"]
    # group 1: tie at 0.9 -> smaller id first; group 2: 0.8 then 0.3
    assert rows == [(1, 3, 1), (1, 7, 2), (2, 4, 1), (2, 9, 2)]


def test_topk_k_larger_than_group(ray_session):
    t = pa.table({
        "g": pa.array([5, 5], pa.int64()),
        "score": pa.array([1.0, 2.0], pa.float64()),
        "id": pa.array([1, 2], pa.int64()),
    })
    out = grouped_topk_arrow(
        ray.data.from_arrow(t), "g",
        [("score", "descending"), ("id", "ascending")], 10,
    )
    rows, _ = _rows(out)
    assert len(rows) == 2


def test_topk_derive_and_many_groups(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "g": pa.array(rng.integers(0, 97, n), pa.int64()),
        "score": pa.array(rng.random(n), pa.float64()),
        "id": pa.array(np.arange(n), pa.int64()),
    })

    def _derive(tb: pa.Table) -> pa.Table:
        s = tb["score"].to_numpy(zero_copy_only=False)
        return tb.append_column("s_r", pa.array(np.round(s, 6)))

    out = grouped_topk_arrow(
        ray.data.from_arrow(t).repartition(8), "g",
        [("score", "descending"), ("id", "ascending")], 3,
        derive=_derive, out_cols=["g", "id", "rnk", "s_r"],
    )
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    # reference: pandas per-group top-3
    df = t.to_pandas()
    ref = (
        df.sort_values(["g", "score", "id"], ascending=[True, False, True],
                       kind="mergesort")
        .groupby("g").head(3)
    )
    assert got.num_rows == len(ref)
    gg = got.to_pandas().sort_values(["g", "rnk"]).reset_index(drop=True)
    ref = ref.reset_index(drop=True)
    assert gg["id"].tolist() == ref["id"].tolist()
    # rnk is 1..k within each group
    assert (gg.groupby("g")["rnk"].min() == 1).all()
    assert (gg.groupby("g")["rnk"].apply(
        lambda s: (sorted(s) == list(range(1, len(s) + 1)))).all())

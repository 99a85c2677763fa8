"""Skew safety of the shared grouped-pairs machinery (stages/grouped_pairs.py).

A planted hot block must be triangle-salted into bounded sub-groups and
still yield EXACTLY the unsalted pair set; an oversized block must be
dropped whole and counted, never silently.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from biomedical_el_ray.pipelines import dedup
from biomedical_el_ray.stages.grouped_pairs import grouped_pairs

SF = "/root/testdata/sf0.001"


def _pairs_df(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_lo", "doc_hi"])
        .reset_index(drop=True)
    )


def test_jaccard_salted_equals_unsalted(ray_session):
    base = _pairs_df(dedup.jaccard_pairs(SF))
    c = {}
    salted = _pairs_df(dedup.jaccard_pairs(SF, salt_threshold=8, counters=c))
    assert c["salted_groups"] > 0  # the planted-hot-block condition held
    assert c["dropped_oversized_rows"] == 0
    assert salted.equals(base)


def test_embedding_salted_equals_unsalted(ray_session):
    base = dedup.embedding_near_dup(SF).to_pandas()
    c = {}
    salted = dedup.embedding_near_dup(SF, salt_threshold=8, counters=c).to_pandas()
    key = ["vec_lo", "vec_hi"]
    a = base.sort_values(key).reset_index(drop=True)
    b = salted.sort_values(key).reset_index(drop=True)
    assert c["salted_groups"] > 0
    assert a.equals(b)


def test_oversized_group_dropped_and_counted(ray_session):
    # one group of 40 rows (> max_group_size=30) + one of 5: only the small
    # group's 10 pairs survive, the big one is counted, never scored
    n_big, n_small = 40, 5
    t = pa.table(
        {
            "rid": pa.array(range(n_big + n_small), pa.int64()),
            "gkey": pa.array([1] * n_big + [2] * n_small, pa.int64()),
        }
    )
    out_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def score(tbl, li, ri):
        ids = tbl["rid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(ids[li], ids[ri]), pa.int64()),
                "hi": pa.array(np.maximum(ids[li], ids[ri]), pa.int64()),
            }
        )

    c = {}
    out = grouped_pairs(
        rd.from_arrow(t),
        score,
        out_schema,
        id_col="rid",
        salt_threshold=8,
        salt_target=4,
        max_group_size=30,
        counters=c,
    ).to_pandas()
    assert c["dropped_oversized_groups"] == 1
    assert c["dropped_oversized_rows"] == n_big
    assert len(out) == n_small * (n_small - 1) // 2
    assert out["lo"].min() >= n_big  # every pair is from the small group


def test_salting_exactly_once(ray_session):
    # a single 50-row group, salt_target=4 -> many sub-groups; the union
    # must be every unordered pair exactly once
    n = 50
    t = pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "gkey": pa.array([7] * n, pa.int64()),
        }
    )
    out_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def score(tbl, li, ri):
        ids = tbl["rid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(ids[li], ids[ri]), pa.int64()),
                "hi": pa.array(np.maximum(ids[li], ids[ri]), pa.int64()),
            }
        )

    out = grouped_pairs(
        rd.from_arrow(t),
        score,
        out_schema,
        id_col="rid",
        salt_threshold=8,
        salt_target=4,
        counters=None,
    ).to_pandas()
    got = set(zip(out["lo"], out["hi"]))
    want = {(i, j) for i in range(n) for j in range(i + 1, n)}
    assert len(out) == len(got) == len(want)
    assert got == want

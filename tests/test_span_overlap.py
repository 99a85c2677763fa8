"""Span-overlap eval: drive the partial/missed/spurious matcher paths.

The default synthetic corpus extracts gold mentions perfectly, so its
oracle row only ever exercises the all-exact path; this crafted corpus
plants one of each mismatch kind plus a whitespace-collapsing offset
rebase, and checks Ray == DuckDB == hand-computed expectation."""

import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.windows import (  # noqa: E402
    span_overlap_eval_corpus,
    span_overlap_oracle_sql,
)


def _write_corpus(d):
    pq.write_table(
        pa.table(
            {
                "entity_id": pa.array(["e1", "e2"], pa.string()),
                "name": pa.array(["alpha beta", "gamma"], pa.string()),
                "aliases": pa.array([["alpha beta"], ["gamma"]],
                                    pa.list_(pa.string())),
            }
        ),
        d / "entities.parquet",
    )
    turns = [
        ("c1", 0, "alpha beta here"),     # gold == pred        -> exact
        ("c1", 1, "xx gamma yy"),         # gold wider than pred -> partial
        ("c1", 2, "nothing matches"),     # gold, no pred        -> missed
        ("c1", 3, "gamma appears"),       # pred, no gold        -> spurious
        ("c2", 0, "  alpha   beta  "),    # exact after whitespace collapse
    ]
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([t[0] for t in turns], pa.string()),
                "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
                "text": pa.array([t[2] for t in turns], pa.string()),
            }
        ),
        d / "transcripts.parquet",
    )
    gold = [
        ("m1", "c1", 0, 0, 10, "alpha beta", "e1"),
        ("m2", "c1", 1, 3, 11, "gamma yy", "e2"),
        ("m3", "c1", 2, 0, 7, "nothing", "e1"),
        ("m4", "c2", 0, 2, 14, "alpha beta", "e1"),
    ]
    pq.write_table(
        pa.table(
            {
                "mention_id": pa.array([g[0] for g in gold], pa.string()),
                "conv_id": pa.array([g[1] for g in gold], pa.string()),
                "turn_idx": pa.array([g[2] for g in gold], pa.int32()),
                "start": pa.array([g[3] for g in gold], pa.int32()),
                "end": pa.array([g[4] for g in gold], pa.int32()),
                "surface": pa.array([g[5] for g in gold], pa.string()),
                "entity_id": pa.array([g[6] for g in gold], pa.string()),
            }
        ),
        d / "gold_mentions.parquet",
    )


def test_hard_matcher_paths(ray_session, tmp_path):
    _write_corpus(tmp_path)
    ray_df = (
        span_overlap_eval_corpus(str(tmp_path))
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    sql_df = (
        duckdb.connect()
        .execute(span_overlap_oracle_sql(str(tmp_path)))
        .df()
        .set_index("conv_id")
        .sort_index()
    )
    assert ray_df.astype("int64").equals(sql_df.astype("int64"))

    c1 = ray_df.loc["c1"]
    assert (c1.n_gold, c1.n_pred) == (3, 3)
    assert (c1.n_exact, c1.n_partial, c1.n_missed, c1.n_spurious) == (1, 1, 1, 1)
    c2 = ray_df.loc["c2"]
    assert (c2.n_gold, c2.n_pred, c2.n_exact) == (1, 1, 1)
    assert (c2.n_partial, c2.n_missed, c2.n_spurious) == (0, 0, 0)

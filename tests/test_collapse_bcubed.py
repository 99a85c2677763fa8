"""collapse_turns run-merge semantics (on data with REAL same-role runs —
the synthetic corpus alternates roles, so the sweep alone never exercises
the merge path) and bcubed_eval metric sanity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from biomedical_el_ray.pipelines.transcripts_queries import collapse_turns_ds


def _mk_ds(rows, blocks=3):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    # scatter across blocks in shuffled order: the operator must not rely
    # on input row order or block layout
    rng = np.random.default_rng(7)
    idx = rng.permutation(len(rows))
    parts = np.array_split(idx, blocks)
    return ray.data.from_arrow([t.take(pa.array(p)) for p in parts if len(p)])


ROWS = [
    ("c1", 0, "user", "hi"),
    ("c1", 1, "assistant", "hello"),
    ("c1", 2, "assistant", "more"),
    ("c1", 3, "assistant", "again"),
    ("c1", 4, "tool", "result"),
    ("c1", 5, "assistant", "done"),
    ("c2", 0, "assistant", "solo"),
    ("c2", 2, "assistant", "gap still merges"),
    ("c2", 3, "user", "q"),
    ("c3", 0, None, "nullrole"),
    ("c3", 1, None, None),
]


def test_collapse_turns_merges_runs():
    df = (
        collapse_turns_ds(_mk_ds(ROWS))
        .to_pandas()
        .sort_values(["conv_id", "run_idx"])
        .reset_index(drop=True)
    )
    got = {
        (r.conv_id, int(r.run_idx)): (
            r.role, int(r.turn_lo), int(r.turn_hi), int(r.n_turns), r.text)
        for r in df.itertuples()
    }
    assert got[("c1", 0)] == ("user", 0, 0, 1, "hi")
    assert got[("c1", 1)] == ("assistant", 1, 3, 3, "hello\nmore\nagain")
    assert got[("c1", 2)] == ("tool", 4, 4, 1, "result")
    assert got[("c1", 3)] == ("assistant", 5, 5, 1, "done")
    # non-contiguous turn_idx still merges (runs are adjacency-in-order)
    assert got[("c2", 0)] == ("assistant", 0, 2, 2, "solo\ngap still merges")
    assert got[("c2", 1)] == ("user", 3, 3, 1, "q")
    # null role/text normalize to "" and merge with each other
    assert got[("c3", 0)] == ("", 0, 1, 2, "nullrole\n")
    assert len(df) == 7


def test_collapse_turns_matches_duckdb_on_runs():
    eng = collapse_turns_ds(_mk_ds(ROWS, blocks=5)).to_pandas()
    con = duckdb.connect()
    con.register(
        "tr",
        pa.table(
            {
                "conv_id": [r[0] for r in ROWS],
                "turn_idx": [r[1] for r in ROWS],
                "role": [r[2] for r in ROWS],
                "text": [r[3] for r in ROWS],
            }
        ),
    )
    sdf = con.execute("""
        WITH s AS (
          SELECT conv_id, turn_idx, coalesce(role, '') AS role,
                 coalesce(text, '') AS text,
                 CASE WHEN lag(coalesce(role, '')) OVER w
                        IS DISTINCT FROM coalesce(role, '')
                      THEN 1 ELSE 0 END AS brk
          FROM tr WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        r AS (
          SELECT *, sum(brk) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) - 1 AS run_idx
          FROM s)
        SELECT conv_id, CAST(run_idx AS BIGINT) AS run_idx,
               any_value(role) AS role,
               CAST(min(turn_idx) AS BIGINT) AS turn_lo,
               CAST(max(turn_idx) AS BIGINT) AS turn_hi,
               count(*) AS n_turns,
               string_agg(text, chr(10) ORDER BY turn_idx) AS text
        FROM r GROUP BY conv_id, run_idx
    """).df()
    cols = sorted(eng.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = sdf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_bcubed_perfect_and_degenerate():
    """B³ == 1.0 when clustering equals the gold partition; known closed
    forms for all-singletons (P=1, R=Σn_g²-weighted) and one-big-cluster."""
    from biomedical_el_ray.pipelines.linkage_emb import _B3_SCALE

    # independent miniature recompute of the engine's fixed-point formula
    def b3(assign):  # assign: list of (cluster, gold)
        from collections import Counter

        cont = Counter(assign)
        n_c = Counter()
        n_g = Counter()
        for (c, g), w in cont.items():
            n_c[c] += w
            n_g[g] += w
        n = sum(n_c.values())
        sp = sum(w * w * _B3_SCALE // n_c[c] for (c, g), w in cont.items())
        sr = sum(w * w * _B3_SCALE // n_g[g] for (c, g), w in cont.items())
        return sp / (_B3_SCALE * n), sr / (_B3_SCALE * n)

    gold = ["a"] * 4 + ["b"] * 2
    p, r = b3(list(zip(gold, gold)))
    assert p == pytest.approx(1.0) and r == pytest.approx(1.0)
    p, r = b3(list(zip(range(6), gold)))  # all singletons
    assert p == pytest.approx(1.0)
    assert r == pytest.approx((4 * (1 / 4) + 2 * (1 / 2)) / 6, abs=1e-5)
    p, r = b3(list(zip([0] * 6, gold)))  # one big cluster
    assert r == pytest.approx(1.0)
    assert p == pytest.approx((4 * (4 / 6) + 2 * (2 / 6)) / 6, abs=1e-5)


def test_response_latency_edge_cases():
    """assistant-after-assistant and user-after-assistant never count;
    only assistant-directly-after-user does; zero-response convs emit a
    zeros row."""
    import datetime as dt

    from biomedical_el_ray.pipelines.transcripts_queries import (
        response_latency_ds,
    )

    def ts(us):
        return dt.datetime(2026, 1, 1) + dt.timedelta(microseconds=us)

    rows = [
        ("c1", 0, "user", ts(0)),
        ("c1", 1, "assistant", ts(1500)),   # counts: 1500
        ("c1", 2, "assistant", ts(9000)),   # assistant-after-assistant: no
        ("c1", 3, "user", ts(10000)),
        ("c1", 4, "tool", ts(11000)),       # tool-after-user: no
        ("c1", 5, "assistant", ts(12000)),  # assistant-after-tool: no
        ("c1", 6, "user", ts(20000)),
        ("c1", 7, "assistant", ts(20400)),  # counts: 400
        ("c2", 0, "user", ts(0)),           # zero responses
        ("c2", 1, "user", ts(100)),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    rng = np.random.default_rng(5)
    idx = rng.permutation(len(rows))
    parts = np.array_split(idx, 4)
    ds = ray.data.from_arrow([t.take(pa.array(p)) for p in parts if len(p)])
    df = response_latency_ds(ds).to_pandas().set_index("conv_id")
    assert int(df.loc["c1", "n_responses"]) == 2
    assert int(df.loc["c1", "total_latency_us"]) == 1900
    assert int(df.loc["c1", "max_latency_us"]) == 1500
    assert int(df.loc["c1", "avg_latency_us"]) == 950
    assert int(df.loc["c2", "n_responses"]) == 0
    assert int(df.loc["c2", "total_latency_us"]) == 0
    assert int(df.loc["c2", "avg_latency_us"]) == 0

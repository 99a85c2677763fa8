"""Kernel-level tests for the session-8 operators — the pure per-batch
classes/helpers exercised directly on crafted Arrow tables (no Ray
pipeline needed; the driver-contract oracle sweep covers the
distributed paths)."""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pyarrow as pa

from biomedical_el_ray.pipelines.multimodal import (
    _AMAGIC, _AUDIO_WIN, VadSegmenter,
)
from biomedical_el_ray.pipelines.textstats import _doc_tok_table


def _pcm_payload(windows: list[str]) -> bytes:
    """Build a FAUD payload from a per-window plan: 'loud' windows are
    alternating +-30000 (energy 256*9e8 >> threshold), 'silent' are
    zeros."""
    samples = []
    for w in windows:
        if w == "loud":
            blk = np.tile(np.array([30000, -30000], np.int16), _AUDIO_WIN // 2)
        else:
            blk = np.zeros(_AUDIO_WIN, np.int16)
        samples.append(blk)
    s = np.concatenate(samples)
    return _AMAGIC + struct.pack("<I", len(s)) + s.tobytes()


def test_vad_segmenter_maximal_runs():
    plan = ["silent", "loud", "loud", "silent", "loud"]
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "payload": pa.array([_pcm_payload(plan)], pa.binary()),
    })
    out = VadSegmenter()(t)
    rows = out.to_pylist()
    assert rows == [
        {"doc_id": 7, "seg_idx": 0, "start_win": 1, "end_win": 2,
         "n_windows": 2},
        {"doc_id": 7, "seg_idx": 1, "start_win": 4, "end_win": 4,
         "n_windows": 1},
    ]


def test_vad_segmenter_all_silent_emits_nothing():
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array(
            [_pcm_payload(["silent", "silent"])], pa.binary()),
    })
    assert VadSegmenter()(t).num_rows == 0


def test_vad_segmenter_voiced_at_edges():
    plan = ["loud", "silent", "loud"]
    t = pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "payload": pa.array([_pcm_payload(plan)], pa.binary()),
    })
    out = VadSegmenter()(t).to_pylist()
    assert [(r["start_win"], r["end_win"]) for r in out] == [(0, 0), (2, 2)]


def test_doc_tok_table_offsets_and_empties():
    t = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(["a  bb\tc", "", None], pa.string()),
    })
    out = _doc_tok_table(t)
    assert out["doc_id"].to_pylist() == [10, 10, 10]
    assert out["tok"].to_pylist() == ["a", "bb", "c"]


def test_inverted_cdf_rule_matches_quantile_disc():
    """The engine's ceil(q·n)−1 indexing (event_anomalies median/MAD,
    sampled_quantiles grid) must agree with DuckDB quantile_disc for odd
    AND even group sizes."""
    rng = np.random.default_rng(42)
    con = duckdb.connect()
    for n in (1, 2, 5, 8, 101):
        vals = np.sort(rng.integers(0, 1000, n))
        for q_pm in (250, 500, 750, 900, 990):
            idx = max((q_pm * n + 999) // 1000, 1) - 1
            got = int(vals[idx])
            want = con.execute(
                f"SELECT quantile_disc(v, {q_pm / 1000}) FROM "
                f"(SELECT unnest({vals.tolist()}) AS v)"
            ).fetchone()[0]
            assert got == want, (n, q_pm)


def test_fs_scores_factors_positive_for_seen_levels():
    """fs_scores gathers lr 0.0 only for levels absent from the data —
    sanity-pin the gather construction on a synthetic weight table."""
    lr = {("jw", 0): 0.5, ("jw", 2): 8.0}
    jw_lr = np.array([lr.get(("jw", i), 0.0) for i in range(3)])
    jwb = np.array([0, 2, 2])
    out = jw_lr[jwb]
    assert out.tolist() == [0.5, 8.0, 8.0]

"""Iterative hard-negative mining loop (train-path A4 parity).

Reference semantics: each epoch re-mines hard negatives excluding those
already accumulated (/root/reference/run_e2e_span.py:297-317,
utils_e2e_span.py:432-461); the loop state must survive a mid-loop kill.
"""

import sys

sys.path.insert(0, "/root/repo")

import shutil

from biomedical_el_ray.pipelines.linking import mine_negative_rounds
from biomedical_el_ray.stages.checkpoint import read_manifest

SF = "/root/testdata/sf0.001"


def _pairs(ds):
    return {(r["mention_id"], r["entity_id"]) for r in ds.take_all()}


def test_rounds_exclude_earlier_rounds(tmp_path):
    rounds = mine_negative_rounds(SF, str(tmp_path), rounds=3, per_round=2)
    sets = [_pairs(ds) for ds in rounds]
    assert all(s for s in sets), "every round should mine something"
    # round k+1 excludes everything round <= k used
    assert not (sets[1] & sets[0])
    assert not (sets[2] & (sets[0] | sets[1]))
    # per-mention cap holds and the round column is stamped
    for rnd, ds in enumerate(rounds):
        rows = ds.take_all()
        assert all(r["round"] == rnd for r in rows)
        from collections import Counter

        per_mention = Counter(r["mention_id"] for r in rows)
        assert max(per_mention.values()) <= 2


def test_kill_mid_loop_resumes_identically(tmp_path):
    a = tmp_path / "full"
    b = tmp_path / "killed"
    full = mine_negative_rounds(SF, str(a), rounds=3, per_round=2)
    want = [sorted(_pairs(ds)) for ds in full]

    # simulate a mid-loop kill: run only the first round, then "crash"
    mine_negative_rounds(SF, str(b), rounds=1, per_round=2)
    assert read_manifest(b / "negatives_round_0") is not None
    # wipe a later round's leftovers if any (none should exist)
    assert read_manifest(b / "negatives_round_1") is None

    # resume: completed round 0 must load from its checkpoint (manifest
    # config hash unchanged -> builder skipped), rounds 1-2 mine fresh
    resumed = mine_negative_rounds(SF, str(b), rounds=3, per_round=2)
    got = [sorted(_pairs(ds)) for ds in resumed]
    assert got == want

    # the round-0 checkpoint was reused, not rewritten: same manifest
    m_a = read_manifest(a / "negatives_round_0")
    m_b = read_manifest(b / "negatives_round_0")
    assert m_a["rows_out"] == m_b["rows_out"]
    assert m_a["config_hash"] == m_b["config_hash"]


def test_corrupted_round_rebuilds_byte_identical(tmp_path):
    """Destroying a mid-loop checkpoint and re-running reproduces the
    same rows (deterministic, order-free mining)."""
    w = tmp_path / "w"
    first = mine_negative_rounds(SF, str(w), rounds=2, per_round=2)
    want = sorted(_pairs(first[1]))
    shutil.rmtree(w / "negatives_round_1")
    again = mine_negative_rounds(SF, str(w), rounds=2, per_round=2)
    assert sorted(_pairs(again[1])) == want

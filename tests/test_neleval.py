"""neleval-style strong/overlap measures — matcher semantics.

The default synthetic corpus extracts near-perfectly, so strong and
overlap coincide there (both driver-oracle-checked); these tests drive
the partition matcher on crafted spans where the two measures diverge.
"""

import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa

from biomedical_el_ray.pipelines.neleval import _match_partition


def _tbl(rows):
    cols = ["conv_id", "turn_idx", "start", "end", "kb", "mid", "src"]
    return pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})


def _counts(rows):
    t = _match_partition(_tbl(rows))
    return {k: t[k][0].as_py() for k in t.column_names}


def test_exact_match_counts_for_both():
    rows = [
        ("c1", 1, 5, 10, "E1", "g1", "g"),
        ("c1", 1, 5, 10, "E1", "p1", "p"),
    ]
    c = _counts(rows)
    assert c == {"n_gold": 1, "n_pred": 1, "tp_strong": 1, "tp_overlap": 1}


def test_overlap_but_not_exact_counts_overlap_only():
    rows = [
        ("c1", 1, 5, 10, "E1", "g1", "g"),
        ("c1", 1, 7, 12, "E1", "p1", "p"),
    ]
    c = _counts(rows)
    assert c["tp_strong"] == 0
    assert c["tp_overlap"] == 1


def test_kbid_mismatch_matches_neither():
    rows = [
        ("c1", 1, 5, 10, "E1", "g1", "g"),
        ("c1", 1, 5, 10, "E2", "p1", "p"),
    ]
    c = _counts(rows)
    assert c["tp_strong"] == 0 and c["tp_overlap"] == 0


def test_one_to_one_overlap_matching():
    # one pred overlapping two golds with the same kbid: mutual-first
    # pairs it with the first gold only
    rows = [
        ("c1", 1, 0, 6, "E1", "g1", "g"),
        ("c1", 1, 4, 9, "E1", "g2", "g"),
        ("c1", 1, 3, 7, "E1", "p1", "p"),
    ]
    c = _counts(rows)
    assert c["n_gold"] == 2 and c["n_pred"] == 1
    assert c["tp_overlap"] == 1


def test_turn_and_conv_boundaries_respected():
    # same span coordinates in a different turn / conversation never match
    rows = [
        ("c1", 1, 5, 10, "E1", "g1", "g"),
        ("c1", 2, 5, 10, "E1", "p1", "p"),
        ("c2", 1, 5, 10, "E1", "p2", "p"),
    ]
    c = _counts(rows)
    assert c["tp_strong"] == 0 and c["tp_overlap"] == 0
    assert c["n_pred"] == 2


def test_mutual_first_crossing_pairs():
    # crossing double-overlap: g1 overlaps p1+p2, g2 overlaps p1.
    # g1's first pred is p1; p1's first gold is g1 -> (g1, p1) matches.
    # g2's first (only) pred is p1, but p1 prefers g1 -> g2 unmatched;
    # p2's first gold is g1, but g1 prefers p1 -> p2 unmatched.
    rows = [
        ("c1", 1, 0, 10, "E1", "g1", "g"),
        ("c1", 1, 1, 4, "E1", "g2", "g"),
        ("c1", 1, 2, 5, "E1", "p1", "p"),
        ("c1", 1, 6, 9, "E1", "p2", "p"),
    ]
    c = _counts(rows)
    assert c["tp_overlap"] == 1


def test_empty_and_single_side_partitions():
    assert _match_partition(_tbl([])).num_rows == 0
    c = _counts([("c1", 1, 0, 3, "E1", "g1", "g")])
    assert c == {"n_gold": 1, "n_pred": 0, "tp_strong": 0, "tp_overlap": 0}

"""Cluster evaluation: pairwise precision / recall / F1.

G4-analog of the reference's eval metrics (P@1 / MAP / macro-F1 machinery at
/root/reference/run_e2e_span.py:617-663 — computation commented out there;
ours is live).  Pairwise F1 is computed over a *labeled pair set* (pairs
co-occurring in at least one blocking key, per BASELINE.json's
"same blocking key" rule): a pair is positive for a clustering iff both
members share a cluster representative.
"""

from __future__ import annotations


def pairwise_prf(pred: dict, ref: dict, labeled_pairs) -> dict:
    """pred/ref: {mention_id: cluster_rep}; labeled_pairs: [(a, b), ...]."""
    tp = fp = fn = tn = 0
    for a, b in labeled_pairs:
        p_same = pred.get(a) is not None and pred.get(a) == pred.get(b)
        r_same = ref.get(a) is not None and ref.get(a) == ref.get(b)
        if p_same and r_same:
            tp += 1
        elif p_same:
            fp += 1
        elif r_same:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
        "n_labeled_pairs": len(labeled_pairs) if hasattr(labeled_pairs, "__len__") else None,
    }


def clusters_from_gold(gold_mentions_rows) -> dict:
    """Gold clustering keyed the same way the engine keys mentions.

    Mention identity is (conv_id, turn_idx, k-th mention in the turn) on
    both sides: the generator plants mentions left-to-right and the
    extractor emits leftmost-first, so the engine id ``{conv}:{turn}:{k}``
    aligns with the k-th gold row of that turn.
    """
    from collections import defaultdict

    per_turn: dict = defaultdict(list)
    for r in gold_mentions_rows:
        per_turn[(r["conv_id"], r["turn_idx"])].append((r["start"], r["entity_id"]))
    out = {}
    for (conv, turn), rows in per_turn.items():
        rows.sort()
        for k, (_, eid) in enumerate(rows):
            out[f"{conv}:{turn}:{k}"] = eid
    return out

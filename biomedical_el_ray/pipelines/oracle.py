"""Single-node exact oracle for the linkage pipeline (test-scale only).

SURVEY.md §5: the cluster-gold generator — brute-force all-pairs within each
blocking key (the analog of the reference's brute-force k-NN over all
entity embeddings, /root/reference/utils_e2e_span.py:416-428), identical
deterministic scoring, exact union-find.  Because the distributed path
computes the same scores over the same (salting-preserved) pair set, its
pairwise F1 against this oracle must be 1.0; the >= 0.99 gate leaves room
only for explicitly-counted oversized-block drops.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.stages.scoring import PairScorer
from biomedical_el_ray.state.unionfind import local_union_find


def oracle_clusters(mention_ids, surfaces, cfg: PipelineConfig | None = None):
    """Exact clusters {mention_id: cluster_rep} + the labeled pair set.

    Returns (clusters, labeled_pairs): labeled_pairs is the set of
    co-blocked canonical pairs — "labeled pairs at the same blocking key"
    per BASELINE.json's north rule.
    """
    cfg = cfg or PipelineConfig()
    n = len(mention_ids)

    # identical slot signatures to the distributed blocker
    from biomedical_el_ray.stages.blocking import BlockKeyGenerator

    slots, _ = BlockKeyGenerator(cfg).signatures(surfaces)  # (n, S)
    S = slots.shape[1] if n else 0

    by_key: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        for s in range(S):
            by_key[int(slots[i, s])].append(i)

    pair_set: set[tuple[int, int]] = set()
    for members in by_key.values():
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda i: mention_ids[i])
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                ia, ib = members[a], members[b]
                if mention_ids[ia] != mention_ids[ib]:
                    pair_set.add((ia, ib))

    # oversized-block drop, same pure rule as the engine (stages/pairs.py
    # first-shared-slot rule): a pair's canonical block is the first slot
    # where the two signatures agree; if that block exceeds max_block_size
    # the pair is dropped with it.
    sizes = {k: len(v) for k, v in by_key.items()}
    def _canonical_ok(a: int, b: int) -> bool:
        eq = slots[a] == slots[b]
        first = int(np.argmax(eq))
        return sizes[int(slots[a, first])] <= cfg.max_block_size

    pair_set = {(a, b) for (a, b) in pair_set if _canonical_ok(a, b)}

    pairs = sorted(pair_set, key=lambda p: (mention_ids[p[0]], mention_ids[p[1]]))
    scorer = PairScorer(cfg)
    s_lo = [surfaces[a] for a, _ in pairs]
    s_hi = [surfaces[_b] for _, _b in pairs]
    _, _, _, score = (
        scorer.score_arrays(s_lo, s_hi) if pairs else ([], [], [], [])
    )
    edges = [
        (mention_ids[a], mention_ids[b])
        for (a, b), sc in zip(pairs, score)
        if sc >= cfg.score_threshold
    ]
    clusters = local_union_find(edges, nodes=list(mention_ids))
    labeled_pairs = [
        tuple(sorted((mention_ids[a], mention_ids[b]))) for a, b in pairs
    ]
    return clusters, labeled_pairs

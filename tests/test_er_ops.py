"""Behavior pins for the round-3 ER operators (oracle equality is covered
by the sweep; these pin the semantics the SQL twin can't express as
directly)."""

import pandas as pd
import pytest

from biomedical_el_ray.pipelines.linkage_emb import (
    _REFINE_SIZE_CAP,
    linkage_emb_clusters,
    linkage_incremental,
    refine_clusters,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def refined(ray_session) -> pd.DataFrame:
    return refine_clusters(SF_DIR).to_pandas()


@pytest.fixture(scope="module")
def incremental(ray_session) -> pd.DataFrame:
    return linkage_incremental(SF_DIR).to_pandas()


def test_refine_partitions_all_surfaces(ray_session, refined):
    base = linkage_emb_clusters(SF_DIR).to_pandas()
    assert sorted(refined["surface"]) == sorted(base["surface"])
    assert refined["surface"].is_unique


def test_refine_untouched_clusters_identical(ray_session, refined):
    """refined=0 rows keep exactly their base-pass cluster assignment."""
    base = linkage_emb_clusters(SF_DIR).to_pandas().set_index("surface")
    untouched = refined[refined["refined"] == 0]
    for surface, cid in zip(untouched["surface"], untouched["cluster_id"]):
        assert base.loc[surface, "cluster_id"] == cid


def test_refine_splits_are_subsets(ray_session, refined):
    """Every refined cluster is a subset of ONE oversized base cluster,
    and oversized base clusters only shrink (never gain members)."""
    base = linkage_emb_clusters(SF_DIR).to_pandas()
    bmap = base.set_index("surface")["cluster_id"]
    touched = refined[refined["refined"] == 1]
    if touched.empty:
        pytest.skip("no oversized clusters at this scale")
    for cid, grp in touched.groupby("cluster_id"):
        parents = {bmap[s] for s in grp["surface"]}
        assert len(parents) == 1
        parent_size = int((base["cluster_id"] == parents.pop()).sum())
        assert parent_size > _REFINE_SIZE_CAP
        assert len(grp) <= parent_size


def test_incremental_base_is_frozen(ray_session, incremental):
    """src='base' rows must equal clustering the base side alone — new
    arrivals never perturb existing cluster ids (the master-file
    contract)."""
    from biomedical_el_ray.pipelines.sampling import md5_prefix
    from biomedical_el_ray.pipelines.linkage_emb import _INC_NEW_PREFIX

    base_rows = incremental[incremental["src"] == "base"]
    # base rows are exactly the non-new surfaces
    h2 = md5_prefix(list(base_rows["surface"]))
    assert all(h < _INC_NEW_PREFIX for h in h2)
    # base cluster ids are base surfaces (min member), never new ones
    h2c = md5_prefix(list(base_rows["cluster_id"].unique()))
    assert all(h < _INC_NEW_PREFIX for h in h2c)


def test_incremental_partitions_all_surfaces(ray_session, incremental):
    full = linkage_emb_clusters(SF_DIR).to_pandas()
    assert sorted(incremental["surface"]) == sorted(full["surface"])
    assert incremental["surface"].is_unique


def test_incremental_attached_join_existing_clusters(ray_session, incremental):
    base_ids = set(
        incremental[incremental["src"] == "base"]["cluster_id"])
    att = incremental[incremental["src"] == "attached"]
    if att.empty:
        pytest.skip("no attachments at this scale")
    assert set(att["cluster_id"]) <= base_ids


def test_sorted_neighborhood_structure(ray_session):
    """Window semantics: exact pair count ((w-1)·n − w(w-1)/2), gap
    bounds, rank order (s_lo < s_hi), and the cross-bucket boundary path
    actually firing (pairs spanning a first-two-byte prefix change)."""
    from biomedical_el_ray.pipelines.linkage_string import (
        _SN_WINDOW,
        sorted_neighborhood_pairs,
    )

    w = _SN_WINDOW
    df = sorted_neighborhood_pairs(SF_DIR).to_pandas()
    n = len(set(df["s_lo"]) | set(df["s_hi"]))
    assert len(df) == (w - 1) * n - w * (w - 1) // 2
    assert df["gap"].between(1, w - 1).all()
    assert (df["s_lo"] < df["s_hi"]).all()
    assert not df.duplicated(["s_lo", "s_hi", "gap"]).any()
    cross = df[df["s_lo"].str[:2] != df["s_hi"].str[:2]]
    assert len(cross) > 0, "boundary (cross-bucket) path never fired"


def test_graph_stats_vs_bruteforce(ray_session):
    """Triangle/wedge counts re-derived from the edge list with a
    from-scratch adjacency-set counter (independent of both the
    distributed census and the SQL triple join)."""
    from itertools import combinations

    from biomedical_el_ray.pipelines.linkage_emb import (
        EMB_CFG,
        graph_stats,
        linkage_emb_pairs,
    )

    gs = graph_stats(SF_DIR).to_pandas().iloc[0]
    pairs = linkage_emb_pairs(SF_DIR).to_pandas()
    edges = {
        (r.s_lo, r.s_hi)
        for r in pairs.itertuples()
        if r.score_r >= EMB_CFG.score_threshold
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for v, ns in adj.items()
        for x, y in combinations(sorted(ns), 2)
        if v < x and (x, y) in edges
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    assert gs["n_nodes"] == len(adj)
    assert gs["n_edges"] == len(edges)
    assert gs["n_triangles"] == tri
    assert gs["n_wedges"] == wedges
    assert gs["max_degree"] == max(len(ns) for ns in adj.values())


def test_pagerank_vs_bruteforce(ray_session):
    """Fixed-point PageRank re-derived with a from-scratch dict-based
    power iteration using the same integer floor rules."""
    from biomedical_el_ray.pipelines.linkage_emb import (
        _PR_ITERS,
        _PR_SCALE,
        EMB_CFG,
        linkage_emb_pairs,
        pagerank,
    )

    pr = pagerank(SF_DIR).to_pandas().set_index("surface")["pr"]
    pairs = linkage_emb_pairs(SF_DIR).to_pandas()
    edges = [
        (r.s_lo, r.s_hi)
        for r in pairs.itertuples()
        if r.score_r >= EMB_CFG.score_threshold
    ]
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    base = _PR_SCALE * 15 // (100 * n)
    p = {v: _PR_SCALE // n for v in adj}
    for _ in range(_PR_ITERS):
        nxt = {v: base for v in adj}
        for u, ns in adj.items():
            c = 85 * p[u] // (100 * len(ns))
            for v in ns:
                nxt[v] += c
        p = nxt
    assert len(pr) == n
    for v, val in p.items():
        assert pr[v] == val, v


def test_merge_candidates_empty_band(ray_session):
    """band=0.0 makes the near-miss slice [thr, thr) empty; the
    broadcast plan must return the empty result table, not crash on
    pa.concat_tables of a zero-batch stream (code-review r5 finding —
    Ray's iter_batches yields NO batches when every map output is
    0-row)."""
    from biomedical_el_ray.pipelines.linkage_emb import (
        cluster_merge_candidates,
    )

    out = cluster_merge_candidates(SF_DIR, band=0.0)
    assert out.num_rows == 0
    assert out.column_names == [
        "cluster_a", "cluster_b", "n_near_edges", "max_score_r"]


def test_cluster_timelines_consistency(ray_session):
    """Timeline invariants: mention mass equals the extraction count,
    n_convs <= n_mentions, and spans are well-ordered."""
    from biomedical_el_ray.pipelines.transcripts_queries import (
        cluster_timelines,
        mentions_extracted,
    )

    tl = cluster_timelines(SF_DIR).to_pandas()
    n_mentions = mentions_extracted(SF_DIR).count()
    assert tl["n_mentions"].sum() == n_mentions
    assert (tl["n_convs"] >= 1).all()
    assert (tl["n_convs"] <= tl["n_mentions"]).all()
    assert (tl["first_us"] <= tl["last_us"]).all()
    assert tl["cluster_id"].is_unique


def test_threshold_sweep_monotone(ray_session):
    """Raising the threshold can only shrink the predicted and
    true-positive sets; the compared-gold denominator is constant; the
    flagship threshold row agrees with the count of kept edges."""
    from biomedical_el_ray.pipelines.linkage_emb import (
        EMB_CFG,
        linkage_emb_pairs,
        threshold_sweep,
    )

    sw = threshold_sweep(SF_DIR).to_pandas().sort_values("thr_pct")
    assert (sw["n_pred"].diff().dropna() <= 0).all()
    assert (sw["n_tp"].diff().dropna() <= 0).all()
    assert sw["n_gold"].nunique() == 1
    assert (sw["n_tp"] <= sw["n_pred"]).all()
    pairs = linkage_emb_pairs(SF_DIR).to_pandas()
    thr_row = sw[sw["thr_pct"] == int(EMB_CFG.score_threshold * 100)]
    assert len(thr_row) == 1
    assert int(thr_row["n_pred"].iloc[0]) == int(
        (pairs["score_r"] >= EMB_CFG.score_threshold).sum())

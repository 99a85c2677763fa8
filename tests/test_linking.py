"""Entity-linking (NED-analog) semantics at smoke scale."""

import sys

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines import linking

SF = "/root/testdata/sf0.001"


def test_top1_links_mostly_to_gold():
    """Aliases are string-similar variants of their entity's name, so the
    argmax link (T2-analog) should recover the gold entity for most
    mentions — the analog of the reference's P@1 (run_e2e_span.py:570-575)."""
    top1 = {r["mention_id"]: r["entity_id"] for r in linking.entity_link_top1(SF).take_all()}
    import pyarrow.parquet as pq

    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir

    gold = pq.read_table(
        str(ensure_corpus_for_sf_dir(SF) / "gold_mentions.parquet"),
        columns=["mention_id", "entity_id"],
    )
    g = dict(zip(gold["mention_id"].to_pylist(), gold["entity_id"].to_pylist()))
    assert set(top1) == set(g)  # every mention linked exactly once
    acc = sum(top1[m] == g[m] for m in g) / len(g)
    assert acc > 0.8, f"P@1 too low: {acc:.3f}"


def test_rank_histogram_mass_at_one():
    """G1-analog: the gold entity should land at rank 1 for most surfaces
    and inside the top-10 for nearly all (recall@k sanity)."""
    hist = {r["rnk"]: r["n_mentions"] for r in linking.candidate_rank_histogram(SF).take_all()}
    total = sum(hist.values())
    assert hist.get(1, 0) / total > 0.8
    assert hist.get(0, 0) / total < 0.05  # rank 0 = not retrieved at all


def test_hard_negatives_exclude_gold():
    """A4-analog: mined negatives never contain the mention's gold entity."""
    import pyarrow.parquet as pq

    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir

    gold = pq.read_table(
        str(ensure_corpus_for_sf_dir(SF) / "gold_mentions.parquet"),
        columns=["mention_id", "entity_id"],
    )
    g = dict(zip(gold["mention_id"].to_pylist(), gold["entity_id"].to_pylist()))
    negs = linking.hard_negatives(SF).take_all()
    assert len(negs) > 0
    for r in negs:
        assert r["entity_id"] != g[r["mention_id"]]


def test_tfidf_candidates_retrieve_gold():
    """TF-IDF strategy (run_e2e_span.py:868 use_tfidf_candidates): alias
    surfaces share name tokens with their gold entity, so the retriever
    should place the gold entity in the top-10 for most mentions and the
    ranking should be valid (1..k per surface, scores non-increasing)."""
    import pyarrow.parquet as pq

    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir

    rows = linking.tfidf_candidates(SF).take_all()
    assert rows, "retriever returned nothing"
    by_surf = {}
    for r in rows:
        by_surf.setdefault(r["surface"], []).append(r)
    for surf, cands in by_surf.items():
        cands.sort(key=lambda r: r["rnk"])
        assert [c["rnk"] for c in cands] == list(range(1, len(cands) + 1))
        sims = [c["sim_r"] for c in cands]
        assert all(a >= b - 1e-9 for a, b in zip(sims, sims[1:])), surf
    gold = pq.read_table(
        str(ensure_corpus_for_sf_dir(SF) / "gold_mentions.parquet"),
        columns=["surface", "entity_id"],
    )
    hits = total = 0
    cand_sets = {s: {c["entity_id"] for c in cs} for s, cs in by_surf.items()}
    for s, e in zip(gold["surface"].to_pylist(), gold["entity_id"].to_pylist()):
        total += 1
        hits += e in cand_sets.get(s, ())
    assert hits / total > 0.7, f"TF-IDF recall@10 too low: {hits/total:.3f}"


def test_link_quality_consistent_with_histogram():
    """MAP/R@k summary must agree with the rank histogram it is derived
    from (run_e2e_span.py:617-663 analog)."""
    hist = {r["rnk"]: r["n_mentions"] for r in linking.candidate_rank_histogram(SF).take_all()}
    row = linking.link_quality(SF).to_pylist()[0]
    n = sum(hist.values())
    assert row["n_mentions"] == n
    assert row["n_at_1"] == hist.get(1, 0)
    assert row["n_at_10"] == sum(v for k, v in hist.items() if 1 <= k <= 10)
    assert row["rr_micro"] == sum(v * (1_000_000 // k) for k, v in hist.items() if k >= 1)
    assert abs(row["p_at_1"] - row["n_at_1"] / n) < 1e-9
    assert 0.0 <= row["map_r"] <= 1.0 and row["map_r"] >= row["p_at_1"] - 1e-9

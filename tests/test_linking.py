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

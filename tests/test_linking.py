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


def test_large_kb_routes_to_retrieve_rerank():
    """Plan choice: a 500k-name KB must route link_topk away from the
    brute cross join and still return the exact brute top-k wherever the
    retrieval stage recovers the brute candidate set (surfaces are close
    lexical variants of KB names, so char-3-gram retrieval does)."""
    import time

    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from biomedical_el_ray.pipelines.linking import (
        LINK_BRUTE_KB_MAX,
        LINK_TOPK,
        link_topk,
    )

    n = 500_000
    assert n > LINK_BRUTE_KB_MAX
    rng = np.random.default_rng(7)
    first = np.array(["alpha", "bravo", "carbon", "delta", "echo", "fentanyl",
                      "gliom", "hepat", "insulin", "julep"])
    second = np.array(["ase", "itis", "osis", "amide", "ektomy", "pril",
                       "mycin", "azole", "gene", "blast"])
    names = np.char.add(
        np.char.add(first[rng.integers(0, 10, n)], second[rng.integers(0, 10, n)]),
        np.char.add(" ", np.arange(n).astype(str)),
    )
    kb = pa.table({"entity_id": np.arange(n, dtype=np.int64), "name": names})

    # surfaces: exact names and last-digit typos of KB rows (near-unique
    # matches, so the brute top-k is not a 10^4-way entity_id tie the
    # retrieval stage could never reproduce)
    picks = rng.choice(n, 15, replace=False)
    surfaces = [str(names[i]) for i in picks] + [
        str(names[i])[:-1] + "X" for i in rng.choice(n, 5, replace=False)
    ]
    surf_ds = ray.data.from_arrow(pa.table({"surface": surfaces}))

    t0 = time.monotonic()
    routed = link_topk(surf_ds, kb).to_pandas()  # plan="auto" -> rerank
    elapsed = time.monotonic() - t0
    # brute at this size would cross-score 20 x 500k per batch and take
    # far longer; the routed plan must finish promptly
    assert elapsed < 120, f"routed plan too slow: {elapsed:.1f}s"
    assert set(routed["surface"]) == set(surfaces)
    assert (routed.groupby("surface").size() <= LINK_TOPK).all()

    # exact brute oracle on the same surfaces (DuckDB, single pass)
    con = duckdb.connect()
    con.register("kb", kb)
    con.register("s", pa.table({"surface": pa.array(surfaces, pa.string())}))
    brute = con.execute(
        """
        SELECT surface, entity_id, CAST(rn AS BIGINT) AS rnk,
               round(sim, 6) AS sim_r
        FROM (
          SELECT s.surface, k.entity_id,
                 jaro_winkler_similarity(s.surface, k.name) AS sim,
                 row_number() OVER (
                   PARTITION BY s.surface
                   ORDER BY jaro_winkler_similarity(s.surface, k.name) DESC,
                            k.entity_id) AS rn
          FROM s CROSS JOIN kb k)
        WHERE rn <= 10
        """
    ).fetchdf()

    # on the overlap set — (surface, entity) pairs both plans retrieved —
    # the reranked similarity must equal the brute similarity exactly
    # (identical JW formula, only the candidate pool differs)
    merged = routed.merge(
        brute, on=["surface", "entity_id"], suffixes=("_r", "_b")
    )
    assert len(merged) >= 40, f"overlap set too small: {len(merged)}"
    assert np.allclose(merged["sim_r_r"], merged["sim_r_b"])

    # the decision that matters — the argmax link — must match brute for
    # EVERY surface (the exact match / near-typo is always retrievable by
    # its character grams; deeper ranks may legitimately differ where JW
    # favors digit transpositions that share no 3-gram with the surface)
    r1 = routed[routed["rnk"] == 1].set_index("surface")["entity_id"]
    b1 = brute[brute["rnk"] == 1].set_index("surface")["entity_id"]
    assert (r1.sort_index() == b1.sort_index()).all()

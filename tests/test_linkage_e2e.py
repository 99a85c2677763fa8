"""End-to-end linkage: distributed pipeline vs exact oracle and gold labels.

This is the BASELINE.json correctness gate: pairwise F1 >= 0.99 vs the
reference clusters (single-node exact oracle, same blocking key).
"""

import pyarrow.parquet as pq
import pytest

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.evaluate import clusters_from_gold, pairwise_prf
from biomedical_el_ray.pipelines.linkage import run_linkage
from biomedical_el_ray.pipelines.oracle import oracle_clusters


@pytest.fixture(scope="module")
def linkage_result(unit_corpus):
    out = run_linkage(str(unit_corpus), PipelineConfig())
    clusters = {r["mention_id"]: r["cluster_id"] for r in out["clusters"].take_all()}
    mentions = out["mentions"].take_all()
    return out, clusters, mentions


def test_every_mention_clustered(linkage_result):
    out, clusters, mentions = linkage_result
    assert set(clusters) == {m["mention_id"] for m in mentions}


def test_f1_vs_exact_oracle(linkage_result, unit_corpus):
    out, clusters, mentions = linkage_result
    mids = [m["mention_id"] for m in mentions]
    surfs = [m["surface"] for m in mentions]
    oracle, labeled = oracle_clusters(mids, surfs, PipelineConfig())
    res = pairwise_prf(clusters, oracle, labeled)
    assert res["f1"] >= 0.99, res


def test_f1_vs_gold_entities(linkage_result, unit_corpus):
    out, clusters, mentions = linkage_result
    mids = [m["mention_id"] for m in mentions]
    surfs = [m["surface"] for m in mentions]
    _, labeled = oracle_clusters(mids, surfs, PipelineConfig())
    gold = clusters_from_gold(
        pq.read_table(unit_corpus / "gold_mentions.parquet").to_pylist()
    )
    res = pairwise_prf(clusters, gold, labeled)
    # quality (not the gate): blocking+scoring should recover planted clusters
    assert res["f1"] >= 0.95, res


def test_counters_present(linkage_result):
    out, _, _ = linkage_result
    assert {"hot_blocks", "dropped_oversized_blocks", "dropped_oversized_rows"} <= set(
        out["counters"]
    )

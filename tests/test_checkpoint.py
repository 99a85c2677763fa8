"""Checkpoint / lineage / resume semantics (north rule: resume without
recompute; byte-stable outputs across reruns)."""

import json

import pyarrow as pa
import pytest
import ray.data

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import run_linkage_checkpointed
from biomedical_el_ray.stages.checkpoint import (
    load_stage,
    read_manifest,
    run_stage,
    write_stage,
)


def _toy_ds():
    return ray.data.from_arrow(
        pa.table({"k": ["a", "b", "c"], "v": pa.array([1, 2, 3], pa.int64())})
    )


def test_write_then_load_roundtrip(tmp_path):
    out = write_stage(_toy_ds(), tmp_path / "s1", "s1", "h1", counters={"x": 7})
    assert sorted(r["k"] for r in out.take_all()) == ["a", "b", "c"]
    m = read_manifest(tmp_path / "s1")
    assert m["complete"] and m["rows_out"] == 3 and m["counters"] == {"x": 7}
    assert sum(p["rows"] for p in m["partitions"]) == 3
    again = load_stage(tmp_path / "s1", "h1")
    assert again is not None
    assert sorted(r["v"] for r in again.take_all()) == [1, 2, 3]


def test_config_hash_mismatch_forces_rebuild(tmp_path):
    write_stage(_toy_ds(), tmp_path / "s1", "s1", "h1")
    assert load_stage(tmp_path / "s1", "OTHER") is None


def test_run_stage_skips_builder_on_hit(tmp_path):
    calls = []

    def builder():
        calls.append(1)
        return _toy_ds()

    ds1, resumed1 = run_stage(tmp_path, "stage_a", "h", builder)
    ds2, resumed2 = run_stage(tmp_path, "stage_a", "h", builder)
    assert (resumed1, resumed2) == (False, True)
    assert len(calls) == 1
    assert ds1.count() == ds2.count() == 3


def test_linkage_resume_without_recompute(tmp_path, unit_corpus):
    cfg = PipelineConfig()
    out1 = run_linkage_checkpointed(str(unit_corpus), str(tmp_path), cfg)
    assert out1["resumed"] == {
        "mentions": False, "scored_pairs": False, "clusters": False}
    clusters1 = sorted(
        (r["mention_id"], r["cluster_id"]) for r in out1["clusters"].take_all()
    )

    # simulate a kill after stage 2: delete the clusters checkpoint only
    import shutil

    shutil.rmtree(tmp_path / "clusters")
    out2 = run_linkage_checkpointed(str(unit_corpus), str(tmp_path), cfg)
    assert out2["resumed"] == {
        "mentions": True, "scored_pairs": True, "clusters": False}
    clusters2 = sorted(
        (r["mention_id"], r["cluster_id"]) for r in out2["clusters"].take_all()
    )
    assert clusters1 == clusters2

    # full rerun: everything resumes, identical output
    out3 = run_linkage_checkpointed(str(unit_corpus), str(tmp_path), cfg)
    assert all(out3["resumed"].values())
    clusters3 = sorted(
        (r["mention_id"], r["cluster_id"]) for r in out3["clusters"].take_all()
    )
    assert clusters1 == clusters3

    # manifests carry lineage
    m = read_manifest(tmp_path / "scored_pairs")
    assert m["rows_out"] > 0 and len(m["partitions"]) >= 1


def test_config_change_invalidates_linkage(tmp_path, unit_corpus):
    out1 = run_linkage_checkpointed(str(unit_corpus), str(tmp_path), PipelineConfig())
    out2 = run_linkage_checkpointed(
        str(unit_corpus), str(tmp_path), PipelineConfig(score_threshold=0.9)
    )
    assert out2["resumed"]["mentions"] is False  # hash changed -> rebuild

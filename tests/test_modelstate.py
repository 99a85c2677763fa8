"""Model-state checkpoint (K4): save/load round-trip + probe verification."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.state.modelstate import (  # noqa: E402
    MANIFEST,
    load_model_state,
    save_model_state,
)


def test_save_load_roundtrip(ray_session, unit_corpus, tmp_path):
    ents = f"{unit_corpus}/entities.parquet"
    manifest = save_model_state(ents, tmp_path)
    assert manifest["complete"]

    emb, ds = load_model_state(tmp_path)
    rows = ds.take_all()
    assert len(rows) == manifest["n_entities"] > 0

    # stored vectors must equal a fresh embed of the same names
    import pyarrow.parquet as pq

    names = {
        r["entity_id"]: r["name"]
        for r in pq.read_table(ents, columns=["entity_id", "name"]).to_pylist()
    }
    some = rows[:20]
    fresh = emb.embed([names[r["entity_id"]] for r in some]).astype(np.float32)
    stored = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in some])
    # float32 BLAS results vary in the last bits with batch shape; the
    # checkpoint was embedded in large batches, `fresh` in a 20-row one
    assert np.allclose(fresh, stored, atol=1e-6)
    assert np.einsum("ij,ij->i", fresh, stored).min() > 0.999999


def test_tampered_spec_refuses_to_load(ray_session, unit_corpus, tmp_path):
    save_model_state(f"{unit_corpus}/entities.parquet", tmp_path)
    mf = tmp_path / MANIFEST
    m = json.loads(mf.read_text())
    m["spec"]["seed"] = 12345  # wrong weights for the stored matrix
    mf.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="probe verification"):
        load_model_state(tmp_path)


def test_incomplete_checkpoint_refuses(ray_session, unit_corpus, tmp_path):
    save_model_state(f"{unit_corpus}/entities.parquet", tmp_path)
    mf = tmp_path / MANIFEST
    m = json.loads(mf.read_text())
    m["complete"] = False
    mf.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="incomplete"):
        load_model_state(tmp_path)


def test_rademacher_spec_round_trips(ray_session, unit_corpus, tmp_path):
    # the projection key must survive the manifest round-trip: a
    # rademacher checkpoint used to reload as gaussian and always fail
    # the probe
    save_model_state(
        f"{unit_corpus}/entities.parquet", tmp_path,
        spec={"projection": "rademacher"},
    )
    emb, ds = load_model_state(tmp_path)
    assert emb.projection == "rademacher"
    assert emb.proj_int is not None
    assert ds.count() > 0

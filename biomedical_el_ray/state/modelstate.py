"""Model-state checkpoint writer/loader (K4-analog).

The reference persists its dual encoder with ``torch.save`` /
``from_pretrained`` (/root/reference/run_e2e_span.py:731-756,103-109) and
precomputes the full candidate-entity embedding matrix before inference
(/root/reference/utils_e2e_span.py:265-270).  This engine's model state is

* the **embedder spec** — for the deterministic hash encoder the spec IS
  the weights (a pure function of config; a torch encoder would add a
  weights-blob path behind the same manifest), and
* the **KB entity-embedding matrix**, materialized DISTRIBUTED (actor-pool
  ``map_batches`` over the entities table — never a driver-side loop) into
  partitioned Parquet,

written atomically next to a manifest that carries the spec plus a
sample-probe digest: the loader re-embeds the probe surfaces and refuses
to serve a checkpoint whose stored vectors the reconstructed embedder
cannot reproduce (the analog of a weights/config mismatch on load).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from biomedical_el_ray.stages.embed import HashEmbedder

MANIFEST = "model_manifest.json"

# fixed probe surfaces: tiny, format-diverse, stable across versions
_PROBE = ["", "a", "probe surface", "hypertension", "[Ms] marker [Me]"]


def _probe_digest(emb: HashEmbedder) -> list[list[float]]:
    """First 4 embedding dims of each probe surface, rounded for JSON."""
    vecs = emb.embed(_PROBE)[:, :4]
    return [[round(float(v), 10) for v in row] for row in vecs]


class _EntityEmbedder:
    """Actor: embedder built once per worker in __init__ (A2 pattern)."""

    def __init__(self, spec: dict):
        self.emb = HashEmbedder(**spec)

    def __call__(self, t: pa.Table) -> pa.Table:
        vecs = self.emb.embed(t["name"].to_pylist()).astype(np.float32)
        return pa.Table.from_arrays(
            [
                t["entity_id"],
                pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), pa.float32()), vecs.shape[1]
                ),
            ],
            names=["entity_id", "embedding"],
        )


def save_model_state(entities_path: str, ckpt_dir: str | Path,
                     spec: dict | None = None, batch_size: int = 4096) -> dict:
    """Embed every KB entity and write the model checkpoint.

    Returns the manifest.  Layout: ``<ckpt_dir>/entity_embeddings/*.parquet``
    (partitioned; resumable consumers skip by file) + ``model_manifest.json``
    (atomic rename, so a killed writer leaves no complete manifest).
    """
    spec = dict(spec or {})
    emb = HashEmbedder(**spec)
    full_spec = {
        "dim": emb.dim, "n_features": emb.n_features,
        "seed": spec.get("seed", 0x5EED02), "shingle_k": emb.shingle_k,
        "projection": emb.projection,
    }
    ckpt_dir = Path(ckpt_dir)
    data_dir = ckpt_dir / "entity_embeddings"
    if data_dir.exists():
        shutil.rmtree(data_dir)
    data_dir.mkdir(parents=True)

    ents = ray.data.read_parquet(entities_path, columns=["entity_id", "name"])
    out = ents.map_batches(
        _EntityEmbedder,
        fn_constructor_kwargs={"spec": spec},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )
    out.write_parquet(str(data_dir))

    n_rows = sum(
        pq.read_metadata(f).num_rows for f in sorted(data_dir.glob("*.parquet"))
    )
    manifest = {
        "kind": "hash_embedder",
        "spec": full_spec,
        "n_entities": n_rows,
        "probe_surfaces": _PROBE,
        "probe_digest": _probe_digest(emb),
        "complete": True,
    }
    tmp = ckpt_dir / f".{MANIFEST}.tmp{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, ckpt_dir / MANIFEST)
    return manifest


def load_model_state(ckpt_dir: str | Path):
    """(HashEmbedder, entity-embedding Dataset) from a checkpoint.

    Reconstructs the embedder from the manifest spec and verifies it
    reproduces the stored probe digest — a spec/weights mismatch (edited
    manifest, incompatible embedder version) raises instead of silently
    serving stale vectors."""
    ckpt_dir = Path(ckpt_dir)
    mf = ckpt_dir / MANIFEST
    if not mf.exists():
        raise FileNotFoundError(f"no model manifest at {mf}")
    manifest = json.loads(mf.read_text())
    if not manifest.get("complete"):
        raise ValueError(f"incomplete model checkpoint at {ckpt_dir}")
    spec = manifest["spec"]
    emb = HashEmbedder(
        dim=spec["dim"], n_features=spec["n_features"],
        seed=spec["seed"], shingle_k=spec["shingle_k"],
        # manifests written before the projection option default to the
        # gaussian draw they were saved with
        projection=spec.get("projection", "gaussian"),
    )
    if _probe_digest(emb) != manifest["probe_digest"]:
        raise ValueError(
            f"model checkpoint at {ckpt_dir} fails probe verification: "
            "stored embeddings were not produced by this spec/embedder version"
        )
    ds = ray.data.read_parquet(str(ckpt_dir / "entity_embeddings"))
    return emb, ds

"""Stage checkpointing with per-partition lineage manifests (A5/K2-analog).

The reference memoizes its feature pipeline with ``torch.save`` caches keyed
by mode+model (/root/reference/run_e2e_span.py:674-712) and resumes training
from saved checkpoints (:103-109,158-168).  This engine checkpoints every
stage to *partitioned Parquet* plus a ``manifest.json`` recording, per
output partition file: row count and byte size; plus stage-level counters
(G3-analog of the reference's omitted-mention counters,
/root/reference/data_preprocessing.py:174) and the stage's config hash.

Resume contract (north rule: "resumes without recompute"): a stage whose
manifest exists, is complete, and matches the current config hash is loaded
with ``read_parquet`` — the builder is never invoked.  Manifest writes are
atomic (tmp + rename), so a killed run leaves either no manifest (stage
reruns) or a complete one (stage skips).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import ray.data

MANIFEST = "manifest.json"


def _scan_partitions(data_dir: Path) -> list[dict]:
    parts = []
    for f in sorted(data_dir.glob("*.parquet")):
        md = pq.read_metadata(f)
        parts.append({"file": f.name, "rows": md.num_rows,
                      "bytes": f.stat().st_size})
    return parts


def write_stage(ds, stage_dir: str | Path, stage: str, config_hash: str,
                counters: dict | None = None):
    """Write a Dataset checkpoint + manifest; returns the re-read Dataset."""
    stage_dir = Path(stage_dir)
    data_dir = stage_dir / "data"
    if data_dir.exists():
        shutil.rmtree(data_dir)
    data_dir.mkdir(parents=True)
    ds.write_parquet(str(data_dir))
    parts = _scan_partitions(data_dir)
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "complete": True,
        "rows_out": sum(p["rows"] for p in parts),
        "partitions": parts,
        "counters": counters or {},
    }
    tmp = stage_dir / f".{MANIFEST}.tmp{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, stage_dir / MANIFEST)
    return ray.data.read_parquet(str(data_dir))


def load_stage(stage_dir: str | Path, config_hash: str):
    """Dataset if a complete matching checkpoint exists, else None."""
    stage_dir = Path(stage_dir)
    mf = stage_dir / MANIFEST
    if not mf.exists():
        return None
    manifest = json.loads(mf.read_text())
    if not manifest.get("complete") or manifest.get("config_hash") != config_hash:
        return None
    return ray.data.read_parquet(str(stage_dir / "data"))


def read_manifest(stage_dir: str | Path) -> dict | None:
    mf = Path(stage_dir) / MANIFEST
    return json.loads(mf.read_text()) if mf.exists() else None


def run_stage(workdir: str | Path, stage: str, config_hash: str, builder,
              counters: dict | None = None):
    """(dataset, resumed: bool) — builder() only runs on checkpoint miss."""
    stage_dir = Path(workdir) / stage
    ds = load_stage(stage_dir, config_hash)
    if ds is not None:
        return ds, True
    ds = builder()
    return write_stage(ds, stage_dir, stage, config_hash, counters), False

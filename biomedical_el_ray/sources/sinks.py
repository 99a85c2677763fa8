"""Partition-aware resumable Parquet sink (K2-analog at partition
granularity).

``write_partitioned`` writes hive-layout Parquet (one directory per
partition-key value, Ray's ``partition_cols``) plus a ``manifest.json``
recording per-partition lineage (rows, bytes, files).  A rerun of the
same sink DIR skips every partition the manifest marks complete: the
finished key set is broadcast and the input is filtered BEFORE any
bytes are written, so recovering a 100-TB job re-reads cheap keys, not
re-writes finished output — the brief's "failed run skips finished
partitions; never one giant file" contract.

The stage-level variant (whole-dataset checkpoint + config hash) lives
in ``stages/checkpoint.py``; this sink is for the OUTPUT of a pipeline,
where the resume key is data-defined (a date, a shard id, a source)
rather than a config hash.

Crash safety: the manifest is rewritten atomically AFTER all data files
land; a partition directory without a manifest entry is re-written from
scratch on resume (cleared first, so partial output never double-counts).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

# underscore prefix: hidden to parquet dataset discovery (pyarrow's
# default ignore_prefixes is ['.', '_'], same convention as Spark's
# _SUCCESS), so readers can point at the sink dir directly
MANIFEST = "_manifest.json"


def _scan_partition_dirs(root: Path, n_cols: int) -> dict[str, dict]:
    """{relative hive path: {rows, bytes, files}} for complete key dirs."""
    out: dict[str, dict] = {}

    def walk(d: Path, depth: int):
        if depth == n_cols:
            files = sorted(d.glob("*.parquet"))
            if files:
                out[str(d.relative_to(root))] = {
                    "rows": sum(pq.read_metadata(f).num_rows for f in files),
                    "bytes": sum(f.stat().st_size for f in files),
                    "files": len(files),
                }
            return
        for sub in sorted(d.iterdir()):
            if sub.is_dir() and "=" in sub.name:
                walk(sub, depth + 1)

    if root.exists():
        walk(root, 0)
    return out


def _hive_path(key: tuple, partition_cols: list[str]) -> str:
    return "/".join(f"{c}={v}" for c, v in zip(partition_cols, key))


def read_sink_manifest(out_dir: str | Path) -> dict | None:
    mf = Path(out_dir) / MANIFEST
    return json.loads(mf.read_text()) if mf.exists() else None


def write_partitioned(ds, out_dir: str | Path,
                      partition_cols: list[str]) -> dict:
    """Write ``ds`` hive-partitioned by ``partition_cols`` with resume.

    Returns the manifest dict: {"partition_cols", "partitions":
    {hive_path: {rows, bytes, files}}, "skipped": [hive paths]}.
    """
    out_dir = Path(out_dir)
    prior = read_sink_manifest(out_dir) or {"partitions": {}}
    # every manifest entry is complete by construction (the manifest is
    # only rewritten after all data files land)
    finished = set(prior.get("partitions", {}))
    if prior.get("partition_cols") not in (None, partition_cols):
        raise ValueError(
            f"sink {out_dir} was written with partition_cols="
            f"{prior['partition_cols']}, got {partition_cols}"
        )

    # clear partition dirs that exist on disk but are NOT in the manifest
    # (a crash mid-write): they re-run from scratch
    on_disk = _scan_partition_dirs(out_dir, len(partition_cols))
    for p in on_disk:
        if p not in finished:
            shutil.rmtree(out_dir / p)

    skipped = sorted(finished)
    if finished:
        import pyarrow.compute as pc

        fin_arr = pa.array(sorted(finished), pa.string())

        def _drop_finished(t: pa.Table) -> pa.Table:
            # vectorized hive-path per row: "c1=v1/c2=v2/..."
            pieces = []
            for i, c in enumerate(partition_cols):
                v = pc.cast(t[c], pa.string())
                prefix = (f"/{c}=" if i else f"{c}=")
                pieces.append(pc.binary_join_element_wise(
                    pa.array([prefix] * t.num_rows, pa.string()), v, ""
                ))
            path = pieces[0]
            for p in pieces[1:]:
                path = pc.binary_join_element_wise(path, p, "")
            keep = pc.invert(pc.is_in(path, value_set=fin_arr))
            return t.filter(keep)

        ds = ds.map_batches(
            _drop_finished, batch_format="pyarrow", zero_copy_batch=True
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(str(out_dir), partition_cols=partition_cols)

    parts = _scan_partition_dirs(out_dir, len(partition_cols))
    manifest = {
        "partition_cols": partition_cols,
        "partitions": parts,
        "skipped": skipped,
    }
    tmp = out_dir / f".{MANIFEST}.tmp{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, out_dir / MANIFEST)
    return manifest

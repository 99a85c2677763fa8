"""Parquet table readers (column-pruned at the read)."""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Read one driver testdata table; ALWAYS pass ``columns`` in pipelines
    so only the needed columns leave storage (S5-analog of the reference's
    feature-cache load, but pruned).

    Small files (single-file tables at test scale) would otherwise become
    1-3 blocks, capping every downstream map/shuffle at that width; for
    inputs under ~16 MB/CPU we ask Ray for ~one block per CPU instead.  At
    real scale the size check leaves Ray's own block planning alone.
    """
    return read_parquet_spread(os.path.join(sf_dir, f"{name}.parquet"), columns)


def read_parquet_spread(path: str, columns: list[str] | None = None):
    """``read_parquet`` widened to ~3 blocks per CPU.

    Downstream ``map_batches`` runs one task per block, so block count caps
    stage parallelism AND load balance: at exactly one block per CPU a
    single slow block (text-length skew) staggers the whole wave.  ~3x
    over-decomposition keeps every core busy until the end.  Applied only
    while blocks stay >= ~8 MB; huge files keep Ray's own planning.
    """
    kwargs = {}
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        size = os.path.getsize(path)
        target = cpus * 3
        if size < target * 8 * 1024 * 1024:
            target = max(cpus, size // (8 * 1024 * 1024) + 1)
        if size < 16 * 1024 * 1024 * 1024:
            kwargs["override_num_blocks"] = int(target)
    except Exception:
        pass
    return ray.data.read_parquet(path, columns=columns, **kwargs)

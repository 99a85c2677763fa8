"""Parquet table readers (column-pruned at the read)."""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Read one driver testdata table; ALWAYS pass ``columns`` in pipelines
    so only the needed columns leave storage (S5-analog of the reference's
    feature-cache load, but pruned)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )

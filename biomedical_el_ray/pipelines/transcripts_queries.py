"""Transcript-table query wrappers for the driver contract.

Each callable takes a driver ``sf_dir`` and runs over the deterministic
synthetic transcript corpus scaled to it (BASELINE.json input_hint: the
engine's primary input is the transcripts table, synthesized at small
scale for tests/benchmarks — the driver's TPC-H-ish dirs carry no
transcripts, so scale is mapped via sources.synthetic.spec_for_sf_dir).
"""

from __future__ import annotations

import os

import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import run_linkage
from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts

import ray.data

from biomedical_el_ray.sources.readers import read_parquet_spread


def normalize_turns(sf_dir: str):
    """(conv_id, turn_idx, norm_text) — DuckDB-oracle-exact normalization."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    return normalize_transcripts(ds).map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "norm_text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def mentions_extracted(sf_dir: str):
    """mentions table (rows-only: gazetteer matching is not SQL-expressible)."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    return extract_mentions(
        normalize_transcripts(ds), entities_path=os.path.join(d, "entities.parquet")
    )


def linkage_clusters(sf_dir: str):
    """Flagship pipeline output (mention_id, cluster_id) — rows-only."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    return run_linkage(str(d), PipelineConfig())["clusters"]


def linkage_scored_pairs(sf_dir: str):
    """Scored candidate pairs (id_lo, id_hi, block_key, emb_sim, jw, lev,
    score) — rows-only."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    return run_linkage(str(d), PipelineConfig(), keep_scored=True)["scored"]

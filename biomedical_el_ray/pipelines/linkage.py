"""Flagship pipeline: transcripts -> entity clusters (end-to-end).

The Ray-Data-first recast of the reference's inference path
(/root/reference/run_e2e_span.py:325-665 — SURVEY.md §3.3):

    read_parquet(transcripts, pruned columns)
      -> normalize            (stateless map_batches, Arrow)
      -> mention extraction   (gazetteer actor pool)
      -> blocking keys        (MinHash/LSH + dense SimHash buckets)
      -> candidate pairs      (salted self-join on block_key + dedup)
      -> pairwise scoring     (DuckDB string kernels + embedding cosine)
      -> threshold -> edges
      -> connected components (distributed union-find)
      -> clusters (mention_id, cluster_id)

Everything streams; the only materializations are the self-join input, the
edge-iteration invariant inside connected components, and the mentions
table (consumed by both the blocker and the node list).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts
from biomedical_el_ray.stages.pairs import generate_pairs
from biomedical_el_ray.stages.scoring import edges_from_scores, score_pairs
from biomedical_el_ray.state.unionfind import connected_components


def run_linkage(
    corpus_dir: str,
    cfg: PipelineConfig | None = None,
    keep_scored: bool = False,
):
    """Run the full linkage pipeline over a corpus directory.

    ``corpus_dir`` must contain ``transcripts.parquet`` and
    ``entities.parquet`` (see sources.synthetic).  Returns a dict with the
    ``clusters`` Dataset (mention_id, cluster_id), the materialized
    ``mentions`` Dataset, skew ``counters``, and optionally the ``scored``
    pairs Dataset.
    """
    cfg = cfg or PipelineConfig()
    transcripts = ray.data.read_parquet(
        os.path.join(corpus_dir, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],  # prune at the read
    )
    norm = normalize_transcripts(transcripts)
    mentions = extract_mentions(
        norm,
        entities_path=os.path.join(corpus_dir, "entities.parquet"),
        batch_size=cfg.extract_batch_size,
    ).materialize()  # consumed by blocker AND the cluster node list

    blocks = add_block_keys(mentions, cfg)
    counters: dict = {}
    pairs = generate_pairs(blocks, cfg, counters=counters)
    scored = score_pairs(pairs, cfg)
    if keep_scored:
        scored = scored.materialize()
    edges = edges_from_scores(scored, cfg)
    nodes = mentions.map_batches(
        lambda t: pa.Table.from_arrays([t["mention_id"]], names=["node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    comps = connected_components(edges, nodes)
    clusters = comps.map_batches(
        lambda t: t.rename_columns(["mention_id", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = {"clusters": clusters, "mentions": mentions, "counters": counters}
    if keep_scored:
        out["scored"] = scored
    return out


def run_linkage_checkpointed(
    corpus_dir: str,
    workdir: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Checkpointed variant: every stage writes partitioned Parquet + a
    lineage manifest; a rerun (same corpus + config) resumes from the last
    complete stage without recompute (north rule; A5-analog of
    /root/reference/run_e2e_span.py:674-687).

    Returns {clusters, mentions, scored, counters, resumed: {stage: bool}}.
    """
    from biomedical_el_ray.stages.checkpoint import run_stage

    cfg = cfg or PipelineConfig()
    chash = f"{cfg.config_hash()}:{os.path.basename(os.path.normpath(corpus_dir))}"
    resumed: dict = {}
    counters: dict = {}

    def _build_mentions():
        transcripts = ray.data.read_parquet(
            os.path.join(corpus_dir, "transcripts.parquet"),
            columns=["conv_id", "turn_idx", "text"],
        )
        return extract_mentions(
            normalize_transcripts(transcripts),
            entities_path=os.path.join(corpus_dir, "entities.parquet"),
            batch_size=cfg.extract_batch_size,
        )

    mentions, resumed["mentions"] = run_stage(workdir, "mentions", chash, _build_mentions)

    def _build_scored():
        blocks = add_block_keys(mentions, cfg)
        pairs = generate_pairs(blocks, cfg, counters=counters)
        return score_pairs(pairs, cfg)

    scored, resumed["scored_pairs"] = run_stage(
        workdir, "scored_pairs", chash, _build_scored, counters=counters
    )

    def _build_clusters():
        edges = edges_from_scores(scored, cfg)
        nodes = mentions.map_batches(
            lambda t: pa.Table.from_arrays([t["mention_id"]], names=["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return connected_components(edges, nodes).map_batches(
            lambda t: t.rename_columns(["mention_id", "cluster_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    clusters, resumed["clusters"] = run_stage(workdir, "clusters", chash, _build_clusters)
    return {
        "clusters": clusters,
        "mentions": mentions,
        "scored": scored,
        "counters": counters,
        "resumed": resumed,
    }

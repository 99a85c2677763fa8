"""Flagship pipeline: transcripts -> entity clusters (end-to-end).

The Ray-Data-first recast of the reference's inference path
(/root/reference/run_e2e_span.py:325-665 — SURVEY.md §3.3):

    read_parquet(transcripts, pruned columns)
      -> normalize            (stateless map_batches, Arrow)
      -> mention extraction   (gazetteer actor pool)
      -> DISTINCT SURFACES    (groupby(surface_id) — see below)
      -> blocking keys        (MinHash/LSH + dense SimHash buckets)
      -> candidate pairs      (salted self-join on block_key + dedup)
      -> pairwise scoring     (DuckDB string kernels + embedding cosine)
      -> threshold -> surface edges
      -> connected components over the surface graph (distributed union-find)
      -> one hash join assigning each mention its surface's component
      -> clusters (mention_id, cluster_id)

**Surface-level blocking** is the scale-critical design point: blocking and
scoring are pure functions of the surface string, and same-surface mentions
always score 1.0 >= theta, so clustering {distinct surfaces} and assigning
each mention its surface's component produces EXACTLY the clusters of
mention-level pairing while collapsing the Zipf-hot identical-surface
blocks (a hot entity with 10^5 identical mentions would otherwise force
10^10 in-block pairs).  The surface table is the analog of the reference's
entity KB (29k entities vs millions of mentions,
/root/reference/utils_e2e_span.py:25-32): candidate generation runs on the
small domain; mention assignment is one hash join.  ``cluster_id`` is the
component's min surface id (``~s:<hash64>``), deterministic across runs
and parallelism levels.

Everything streams; the only materializations are the self-join input, the
edge-iteration invariant inside connected components, and the mentions
table (consumed by the surface dedup and the node list).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.sources.readers import read_parquet_spread

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts
from biomedical_el_ray.stages.pairs import generate_pairs
from biomedical_el_ray.stages.scoring import edges_from_scores, score_pairs
from biomedical_el_ray.state.unionfind import connected_components

SURFACE_PREFIX = "~s:"  # '~' (0x7E) sorts after all mention-id characters


def _sid_batch(t: pa.Table) -> pa.Table:
    """Map-side combine: per-batch-distinct (surface_id, surface) rows —
    the shuffle moves per-batch-distinct surfaces, not every mention.

    Arrow/numpy throughout: ``pc.unique`` for the distinct (no Python-
    object set), vectorized 64-bit hash, and one ``binascii.hexlify``
    over the packed big-endian buffer instead of a per-value f-string."""
    import binascii

    import numpy as np

    from biomedical_el_ray.functions.hashing import hash64_column

    surfs = pc.unique(t["surface"].combine_chunks())
    h = hash64_column(surfs)
    hexs = np.frombuffer(
        binascii.hexlify(h.astype(">u8").tobytes()), dtype="S16"
    )
    sids = np.char.add(SURFACE_PREFIX.encode(), hexs).astype(str)
    return pa.Table.from_arrays(
        [pa.array(sids, pa.string()), surfs],
        names=["mention_id", "surface"],
    )


def _dedup_partition(t: pa.Table) -> pa.Table:
    """One hash partition of (surface_id, surface) rows -> distinct rows
    (sort + adjacent-dedup; complete id groups per partition)."""
    import numpy as np

    if t.num_rows == 0 or "mention_id" not in t.column_names:
        return pa.schema(
            [("mention_id", pa.string()), ("surface", pa.string())]
        ).empty_table()
    idx = pc.sort_indices(t["mention_id"].combine_chunks())
    t = t.take(idx)
    ids = np.asarray(t["mention_id"].to_pylist(), dtype=object)
    keep = np.empty(len(ids), dtype=bool)
    keep[0] = True
    keep[1:] = ids[1:] != ids[:-1]
    return t.filter(pa.array(keep))


def distinct_surfaces(mentions_ds):
    """mentions -> distinct (mention_id=surface_id, surface) rows.

    ``surface_id`` is a content-derived id; exact dedup = hash-partition +
    per-partition first (SURVEY.md §2.7 D2) via ONE keyed repartition +
    an in-task sort/dedup — measured ~6x less reduce-side CPU than Ray's
    hash-aggregate for the same result.  Column name stays ``mention_id``
    so the blocking/pair stages are domain-agnostic.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    keyed = mentions_ds.map_batches(
        _sid_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    keyed = ensure_hash_shuffle(keyed)
    return keyed.repartition(shuffle_partitions(), keys=["mention_id"]).map_batches(
        _dedup_partition, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def mention_surface_edges(mentions_ds):
    """(mention_id -> surface_id) star edges for the union-find."""
    from biomedical_el_ray.functions.hashing import hash64_column

    def _e(t: pa.Table) -> pa.Table:
        h = hash64_column(t["surface"])
        sids = [f"{SURFACE_PREFIX}{v:016x}" for v in h]
        return pa.Table.from_arrays(
            [t["mention_id"], pa.array(sids, pa.string())], names=["src", "dst"]
        )

    return mentions_ds.map_batches(_e, batch_format="pyarrow", zero_copy_batch=True)


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
    transcripts = read_parquet_spread(
        os.path.join(corpus_dir, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],  # prune at the read
    )
    norm = normalize_transcripts(transcripts)
    mentions = extract_mentions(
        norm,
        entities_path=os.path.join(corpus_dir, "entities.parquet"),
        batch_size=cfg.extract_batch_size,
    ).materialize()  # consumed by blocker AND the cluster node list

    # small (|distinct surfaces| rows); consumed by blocking AND the
    # cluster node list — materialize so the dedup groupby runs once
    surfaces = distinct_surfaces(mentions).materialize()
    blocks = add_block_keys(surfaces, cfg)
    counters: dict = {}
    # block rows per surface = minhash bands + optional embedding bucket;
    # the hint sizes the pair-gen hash partitions without materializing
    keys_per_surface = cfg.minhash_bands + (1 if cfg.use_embedding_blocks else 0)
    out = {"mentions": mentions, "counters": counters}
    rows_hint = surfaces.count() * keys_per_surface
    if keep_scored:
        # debug/inspection path: the FULL candidate set with score columns
        pairs = generate_pairs(
            blocks, cfg, counters=counters, rows_hint=rows_hint, gate=False
        )
        scored = score_pairs(pairs, cfg).materialize()
        out["scored"] = scored
        edges = edges_from_scores(scored, cfg)
    else:
        # hot path: dedup, gate, scoring and thresholding all inside the
        # pair-gen tasks; candidate pairs never cross the object store
        edges = generate_pairs(
            blocks, cfg, counters=counters, rows_hint=rows_hint, emit="edges"
        )
    out["clusters"] = _clusters_from_surface_graph(mentions, surfaces, edges, cfg)
    return out


class _BroadcastAssigner:
    """Actor-pool map labeling each mention with its surface's component.

    Holds the broadcast (sorted surface-hash keys, cluster ids) lookup —
    built once per actor from a ``ray.put`` ref (J2 broadcast-small-side
    pattern, /root/reference/utils_e2e_span.py:25-32); per batch the lookup
    is one vectorized ``np.searchsorted``.
    """

    def __init__(self, lookup_ref):
        import numpy as np  # noqa: F811 (actor-side import)

        self.keys, self.vals = (
            ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from biomedical_el_ray.functions.hashing import hash64_column

        # surfaces repeat heavily (~60 mentions per distinct surface):
        # hash only the batch's uniques, expand by inverse index
        surfs = np.asarray(t["surface"].to_pylist(), dtype=object)
        uniq, inv = np.unique(surfs, return_inverse=True)
        h = hash64_column(list(uniq))[inv]
        idx = np.searchsorted(self.keys, h)
        idx = np.clip(idx, 0, len(self.keys) - 1)
        if len(h) and not (self.keys[idx] == h).all():
            raise ValueError("surface missing from component map")
        return pa.Table.from_arrays(
            [t["mention_id"], pa.array(self.vals[idx], pa.string())],
            names=["mention_id", "cluster_id"],
        )


def _clusters_from_surface_graph(mentions, surfaces, surf_edges, cfg):
    """Union-find on the SURFACE graph + one assignment map/join.

    The distributed union-find iterates over |distinct surfaces| nodes (the
    small domain); mentions are then labeled with their surface's component
    representative.  Physical plan choice (broadcast-vs-shuffle join): when
    the component map fits a worker (< ``assign_broadcast_rows``), it is
    broadcast once with ``ray.put`` and the assignment is a pure
    ``map_batches`` over mentions (scales linearly, no exchange); larger
    maps fall back to a hash join.  ``cluster_id`` is the component's min
    surface id (deterministic across runs and parallelism levels).
    """
    import numpy as np

    from biomedical_el_ray.state.unionfind import local_union_find
    from biomedical_el_ray.util import shuffle_partitions

    n_surf = surfaces.count()

    if n_surf <= cfg.assign_broadcast_rows:
        # SMALL component map (physical-plan choice, broadcast-vs-shuffle):
        # the surface graph fits the driver — fetch the (thresholded) edge
        # list once, run the exact union-find locally, and broadcast the
        # (surface-hash -> component) arrays straight to an assignment
        # map.  No adjacency Dataset, no comps Dataset, no join: removes
        # ~10s of small-Dataset execution ramps per run.  Larger graphs
        # take the distributed union-find + hash-join path below.
        # prepend an empty typed table: an edge dataset with NO passing
        # pair (valid for low-duplication corpora) yields zero batches,
        # and concat_tables of [] raises — all-singleton clusters are the
        # correct result then
        empty_edges = pa.schema([("src", pa.string()), ("dst", pa.string())]).empty_table()
        et = pa.concat_tables(
            [empty_edges]
            + list(surf_edges.iter_batches(batch_format="pyarrow")),
            promote_options="permissive",
        )
        st = pa.concat_tables(list(surfaces.iter_batches(batch_format="pyarrow")))
        nodes = st["mention_id"].to_pylist()
        assignment = local_union_find(
            list(zip(et["src"].to_pylist(), et["dst"].to_pylist())), nodes=nodes
        )
        keys = np.array(
            [np.uint64(int(s[len(SURFACE_PREFIX):], 16)) for s in nodes],
            dtype=np.uint64,
        )
        vals = np.asarray([assignment[s] for s in nodes], dtype=object)
        order = np.argsort(keys)
        lookup_ref = ray.put((keys[order], vals[order]))

        def _assign(batch, lookup_ref=lookup_ref):
            from biomedical_el_ray.util import ref_key, worker_state

            a = worker_state(
                ("assign", ref_key(lookup_ref)), lambda: _BroadcastAssigner(lookup_ref)
            )
            return a(batch)

        return mentions.map_batches(
            _assign, batch_format="pyarrow", zero_copy_batch=True
        )

    surf_nodes = surfaces.map_batches(
        lambda t: pa.Table.from_arrays([t["mention_id"]], names=["node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    comps = connected_components(surf_edges, surf_nodes).map_batches(
        lambda t: t.rename_columns(["s_node", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    star = mention_surface_edges(mentions)  # (src=mention_id, dst=surface_id)
    P = shuffle_partitions()
    return star.join(
        comps, "inner", num_partitions=P, on=("dst",), right_on=("s_node",)
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["src"], t["cluster_id"]], names=["mention_id", "cluster_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


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
        transcripts = read_parquet_spread(
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
        blocks = add_block_keys(distinct_surfaces(mentions), cfg)
        pairs = generate_pairs(blocks, cfg, counters=counters)
        return score_pairs(pairs, cfg)

    scored, resumed["scored_pairs"] = run_stage(
        workdir, "scored_pairs", chash, _build_scored, counters=counters
    )

    def _build_clusters():
        return _clusters_from_surface_graph(
            mentions, distinct_surfaces(mentions), edges_from_scores(scored, cfg), cfg
        )

    clusters, resumed["clusters"] = run_stage(workdir, "clusters", chash, _build_clusters)
    return {
        "clusters": clusters,
        "mentions": mentions,
        "scored": scored,
        "counters": counters,
        "resumed": resumed,
    }

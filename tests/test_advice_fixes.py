"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. use_embedding_blocks=False must not silently gate out every pair
   (blocks used to carry ZERO emb_q vectors -> quantized cos = 0 < gate_min).
2. An edge dataset with zero passing pairs must yield all-singleton
   clusters, not an ArrowInvalid crash in the small-graph concat.
3. _pairgen_salted must return the EDGES schema for empty partitions in
   edges mode (mixed-schema blocks KeyError'd the distributed clusterer).
"""

import pyarrow as pa
import ray.data

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import (
    SURFACE_PREFIX,
    _clusters_from_surface_graph,
)
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.pairs import (
    _EDGES_SCHEMA,
    _pairgen_salted,
    generate_pairs,
)


def _surfaces_ds(surfaces):
    return ray.data.from_arrow(
        pa.table(
            {
                "mention_id": pa.array([f"m{i}" for i in range(len(surfaces))]),
                "surface": pa.array(surfaces, pa.string()),
            }
        )
    )


def test_no_embedding_blocks_still_pairs():
    """Near-identical surfaces must pair even without an embedder: the
    cosine gate becomes a no-op (null emb_q), never a drop-everything."""
    cfg = PipelineConfig(use_embedding_blocks=False)
    blocks = add_block_keys(_surfaces_ds(["acme corp", "acme corp"]), cfg)
    pairs = generate_pairs(blocks, cfg, gate=True).take_all()
    assert {(r["id_lo"], r["id_hi"]) for r in pairs} == {("m0", "m1")}


def test_no_embedding_blocks_edges_mode():
    """Fused in-task scoring path under use_embedding_blocks=False."""
    cfg = PipelineConfig(use_embedding_blocks=False)
    blocks = add_block_keys(_surfaces_ds(["acme corp", "acme corp"]), cfg)
    edges = generate_pairs(blocks, cfg, emit="edges").take_all()
    assert {(r["src"], r["dst"]) for r in edges} == {("m0", "m1")}


def test_pairgen_salted_empty_partition_edges_schema():
    cfg = PipelineConfig()
    out = _pairgen_salted(pa.table({}), cfg, emit="edges")
    assert out.schema.equals(_EDGES_SCHEMA)
    out_pairs = _pairgen_salted(pa.table({}), cfg, emit="pairs")
    assert out_pairs.column_names == ["id_lo", "id_hi", "s_lo", "s_hi", "block_key"]


def test_empty_edges_yield_singleton_clusters():
    from biomedical_el_ray.functions.hashing import hash64_column

    surfaces = ["alpha beta", "gamma delta", "epsilon"]
    sids = [f"{SURFACE_PREFIX}{v:016x}" for v in hash64_column(surfaces)]
    mentions = ray.data.from_arrow(
        pa.table(
            {
                "mention_id": pa.array([f"m{i}" for i in range(3)]),
                "surface": pa.array(surfaces),
            }
        )
    )
    surf_ds = ray.data.from_arrow(
        pa.table({"mention_id": pa.array(sids), "surface": pa.array(surfaces)})
    )
    empty_edges = ray.data.from_arrow(
        pa.schema([("src", pa.string()), ("dst", pa.string())]).empty_table()
    )
    clusters = _clusters_from_surface_graph(
        mentions, surf_ds, empty_edges, PipelineConfig()
    ).take_all()
    assert len(clusters) == 3
    assert len({r["cluster_id"] for r in clusters}) == 3

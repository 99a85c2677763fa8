"""Blocking-key generation: mentions -> (block_key, mention_id, surface) rows.

The shuffle-side half of candidate retrieval (SURVEY.md §2.4 J3): each
mention explodes into ``minhash_bands`` MinHash band keys plus (optionally)
one dense-embedding SimHash bucket key.  Downstream, a single
``groupby(block_key)`` shuffle materializes candidate pairs — this replaces
the reference's broadcast mention x all-entities k-NN
(/root/reference/utils_e2e_span.py:416-428), which cannot scale past an
in-memory KB.

One fused stage computes both key families in one pass over each batch
(single read of the mention table, one output explode).  The stage is a
callable class (holds the projection matrix) run as an actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.functions.minhash import band_keys, minhash_signatures
from biomedical_el_ray.stages.embed import HashEmbedder
from biomedical_el_ray.util import resolve_concurrency

BLOCKS_SCHEMA = pa.schema(
    [
        ("block_key", pa.string()),
        ("mention_id", pa.string()),
        ("surface", pa.string()),
        # '|'-joined sorted list of ALL this member's block keys; carried
        # through the pair self-join so duplicate emissions of a pair (one
        # per shared key) are resolved map-side by the min-common-key rule
        # (stages/pairs.py) instead of a global dedup shuffle.
        ("keys_all", pa.string()),
    ]
)


class BlockKeyGenerator:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.embedder = (
            HashEmbedder(cfg.embed_dim, cfg.embed_features, cfg.embed_seed, cfg.shingle_k)
            if cfg.use_embedding_blocks
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        surfaces = batch["surface"].to_pylist()
        mids = batch["mention_id"].to_pylist()
        n = len(surfaces)

        sig = minhash_signatures(
            surfaces, cfg.minhash_hashes, cfg.minhash_shingle_k, cfg.minhash_seed
        )
        keys_per_row = band_keys(sig, cfg.minhash_bands)
        if self.embedder is not None:
            emb = self.embedder.embed(surfaces)
            ebuckets = self.embedder.buckets(emb, cfg.embed_bucket_bits)
            for i in range(n):
                keys_per_row[i].append(ebuckets[i])

        keys_per_row = [sorted(set(row)) for row in keys_per_row]
        counts = np.array([len(k) for k in keys_per_row], dtype=np.int64)
        flat_keys = [k for row in keys_per_row for k in row]
        joined = ["|".join(row) for row in keys_per_row]
        rep_mid = np.repeat(np.asarray(mids, dtype=object), counts)
        rep_surf = np.repeat(np.asarray(surfaces, dtype=object), counts)
        rep_keys = np.repeat(np.asarray(joined, dtype=object), counts)
        return pa.Table.from_arrays(
            [
                pa.array(flat_keys, pa.string()),
                pa.array(rep_mid, pa.string()),
                pa.array(rep_surf, pa.string()),
                pa.array(rep_keys, pa.string()),
            ],
            schema=BLOCKS_SCHEMA,
        )


def add_block_keys(mentions_ds, cfg: PipelineConfig | None = None):
    """mentions Dataset -> exploded blocks Dataset (streaming)."""
    cfg = cfg or PipelineConfig()
    return mentions_ds.map_batches(
        BlockKeyGenerator,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.extract_batch_size,
        concurrency=resolve_concurrency(cfg.actor_concurrency),
    )

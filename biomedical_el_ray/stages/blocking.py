"""Blocking-key generation: mentions -> exploded (block_key, slot, ...) rows.

The shuffle-side half of candidate retrieval (SURVEY.md §2.4 J3): each
mention row explodes into ``minhash_bands`` MinHash band keys plus
(optionally) one dense-embedding SimHash bucket key.  Downstream, one hash
repartition on ``block_key`` materializes candidate pairs — this replaces
the reference's broadcast mention x all-entities k-NN
(/root/reference/utils_e2e_span.py:416-428), which cannot scale past an
in-memory KB.

Keys are uint64 end-to-end (no string formatting): every row carries its
full **slot signature** ``sig`` — a fixed-width vector with the slot-s key
value at position s (bands 0..B-1, embedding bucket at slot B).  Two rows
share block s iff their sig values at slot s are equal, which is what the
pair stage's vectorized first-shared-slot dedup rule consumes
(stages/pairs.py).  Slot folds are seeded by the slot index, so values
never collide across slots.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.functions.minhash import band_hashes, minhash_signatures


def num_slots(cfg: PipelineConfig) -> int:
    return cfg.minhash_bands + (1 if cfg.use_embedding_blocks else 0)


def blocks_schema(cfg: PipelineConfig) -> pa.Schema:
    return pa.schema(
        [
            ("block_key", pa.uint64()),
            ("slot", pa.int8()),
            ("mention_id", pa.string()),
            ("surface", pa.string()),
            ("sig", pa.list_(pa.uint64(), num_slots(cfg))),
            # int8-quantized L2-normalized embedding (round(e*127)): feeds
            # the pair stage's sound cosine gate without re-embedding
            ("emb_q", pa.list_(pa.int8(), cfg.embed_dim)),
        ]
    )


class BlockKeyGenerator:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        from biomedical_el_ray.stages.model_embed import build_embedder

        self.embedder = build_embedder(cfg) if cfg.use_embedding_blocks else None

    def signatures(self, surfaces) -> tuple[np.ndarray, np.ndarray | None]:
        """(n,) strings -> ((n, S) uint64 slot signatures, (n, dim) int8
        quantized embeddings or None)."""
        cfg = self.cfg
        sig = minhash_signatures(
            surfaces, cfg.minhash_hashes, cfg.minhash_shingle_k, cfg.minhash_seed
        )
        cols = [band_hashes(sig, cfg.minhash_bands)]
        emb_q = None
        if self.embedder is not None:
            emb = self.embedder.embed(surfaces)
            cols.append(
                self.embedder.bucket_values(emb, cfg.embed_bucket_bits)[:, None]
            )
            emb_q = np.clip(np.rint(emb * 127.0), -127, 127).astype(np.int8)
        return np.concatenate(cols, axis=1), emb_q

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        n = len(surfaces)
        slots, emb_q = self.signatures(surfaces)  # (n, S), (n, dim)
        S = slots.shape[1]
        dim = self.cfg.embed_dim
        # explode: row i -> S rows, one per slot
        block_key = slots.reshape(-1)  # row-major: (i, s) at i*S + s
        slot = np.tile(np.arange(S, dtype=np.int8), n)
        rep = np.repeat(np.arange(n, dtype=np.int64), S)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(slots, S, axis=0).reshape(-1), pa.uint64()), S
        )
        if emb_q is None:
            # no embedder -> NULL emb_q (all-null column makes the pair
            # stage's quantized-cosine gate a no-op; zero vectors would
            # compute cos=0 < gate_min and silently drop every pair)
            embq_col = pa.nulls(n * S, pa.list_(pa.int8(), dim))
        else:
            embq_col = pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(emb_q, S, axis=0).reshape(-1), pa.int8()), dim
            )
        return pa.Table.from_arrays(
            [
                pa.array(block_key, pa.uint64()),
                pa.array(slot, pa.int8()),
                pa.compute.take(batch["mention_id"].combine_chunks(), pa.array(rep)),
                pa.compute.take(batch["surface"].combine_chunks(), pa.array(rep)),
                sig_col,
                embq_col,
            ],
            names=["block_key", "slot", "mention_id", "surface", "sig", "emb_q"],
        )


def _block_keys_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Task-based key generation; generator cached once per worker."""
    from biomedical_el_ray.util import worker_state

    gen = worker_state(
        ("block_keys", cfg.config_hash()), lambda: BlockKeyGenerator(cfg)
    )
    return gen(batch)


def add_block_keys(mentions_ds, cfg: PipelineConfig | None = None):
    """mentions Dataset -> exploded blocks Dataset (streaming tasks;
    per-worker state cache instead of an actor pool — no launch ramp)."""
    cfg = cfg or PipelineConfig()
    return mentions_ds.map_batches(
        _block_keys_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.extract_batch_size,
    )

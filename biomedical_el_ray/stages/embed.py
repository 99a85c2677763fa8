"""Deterministic dense embedder (actor-pool stage) + sign-bit LSH buckets.

A2-analog of the reference's dual encoder: BioMedical-EL embeds mentions and
candidate entities with two BERTs and links by dot product
(/root/reference/modeling_e2e_span.py:17-29,161-162).  This engine ships a
deterministic hash-projection embedder with the same *interface* — a
callable class whose expensive state (the projection matrix; for a real
model, the weights) is built once per actor in ``__init__`` and applied
per batch in ``__call__`` — so a torch dual encoder can be dropped in
behind the same signature (``embed(surfaces) -> (n, dim) float32``).

Features are hashed character-trigram counts (the hashing trick); the
projection is a fixed seeded Gaussian; output rows are L2-normalized so
dot product == cosine.  The first ``bucket_bits`` projection signs give a
SimHash-style blocking key (Charikar 2002), the dense-side blocking key of
SURVEY.md §7 step 4b.
"""

from __future__ import annotations

import numpy as np

from biomedical_el_ray.functions.hashing import shingle_hashes


class HashEmbedder:
    """Deterministic surface-form embedder. Safe to construct anywhere;
    cheap enough for actors, pure function of (config, surface)."""

    def __init__(
        self,
        dim: int = 64,
        n_features: int = 512,
        seed: int = 0x5EED02,
        shingle_k: int = 3,
    ):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((n_features, dim)).astype(np.float32)
        self.n_features = n_features
        self.shingle_k = shingle_k
        self.dim = dim

    def embed(self, surfaces) -> np.ndarray:
        """(n,) strings -> (n, dim) float32, L2-normalized."""
        n = len(surfaces)
        nf = self.n_features
        if n == 0:
            return np.empty((0, self.dim), dtype=np.float32)
        idx_parts, row_parts = [], []
        for i, s in enumerate(surfaces):
            h = shingle_hashes(s if s is not None else "", self.shingle_k)
            idx_parts.append((h % np.uint64(nf)).astype(np.int64))
            row_parts.append(np.full(len(h), i, dtype=np.int64))
        flat = np.concatenate(idx_parts) + np.concatenate(row_parts) * nf
        counts = np.bincount(flat, minlength=n * nf).reshape(n, nf).astype(np.float32)
        emb = counts @ self.proj
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        return emb / norms

    def buckets(self, emb: np.ndarray, bits: int) -> list[str]:
        """Sign-bit SimHash bucket key per row: ``eb:{value:04x}``."""
        signs = (emb[:, :bits] > 0).astype(np.uint64)
        weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        vals = signs @ weights
        return [f"eb:{v:04x}" for v in vals]

    def cosine(self, a_surfaces, b_surfaces) -> np.ndarray:
        """Row-wise cosine similarity between two equal-length surface lists."""
        ea = self.embed(a_surfaces)
        eb = self.embed(b_surfaces)
        return np.einsum("ij,ij->i", ea, eb)

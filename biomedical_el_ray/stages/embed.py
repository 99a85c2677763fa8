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

from biomedical_el_ray.functions.hashing import shingle_hashes_flat, splitmix64


# seed mixer for the Rademacher sign matrix: the effective salt is
# splitmix64(seed ^ RAD_SALT_BASE), embedded as a constant into oracle SQL
RAD_SALT_BASE = np.uint64(0x5AD0_0000_0000_0001)


def rademacher_salt(seed: int) -> int:
    return int(splitmix64(np.uint64(seed) ^ RAD_SALT_BASE))


class HashEmbedder:
    """Deterministic surface-form embedder. Safe to construct anywhere;
    cheap enough for actors, pure function of (config, surface).

    ``projection="gaussian"`` (default) is the flagship JL projection;
    ``projection="rademacher"`` derives a +-1 matrix from splitmix64 so the
    un-normalized embedding is an exact integer (``embed_int``) reproducible
    in DuckDB HUGEINT arithmetic (``functions.sql_hash.rademacher_emb_cte``).
    Both are valid Johnson-Lindenstrauss projections (Achlioptas 2003)."""

    def __init__(
        self,
        dim: int = 64,
        n_features: int = 512,
        seed: int = 0x5EED02,
        shingle_k: int = 3,
        projection: str = "gaussian",
    ):
        self.projection = projection
        if projection == "rademacher":
            idx = np.arange(n_features * dim, dtype=np.uint64)
            bits = splitmix64(idx ^ np.uint64(rademacher_salt(seed)))
            signs = 1 - 2 * (bits >> np.uint64(63)).astype(np.int64)
            self.proj_int = signs.reshape(n_features, dim)
            # float32 matmul over integer-valued operands stays exact while
            # partial sums are < 2**24, so sign bits (buckets) agree with
            # the integer path bit-for-bit
            self.proj = self.proj_int.astype(np.float32)
        elif projection == "gaussian":
            rng = np.random.default_rng(seed)
            self.proj = rng.standard_normal((n_features, dim)).astype(np.float32)
            self.proj_int = None
        else:
            raise ValueError(f"unknown projection {projection!r}")
        self.n_features = n_features
        self.shingle_k = shingle_k
        self.dim = dim

    def _counts(self, surfaces) -> np.ndarray:
        """(n,) strings -> (n, n_features) int64 hashed-shingle counts.

        ``shingle_hashes_flat`` dedups shingles PER ROW, so each distinct
        shingle contributes exactly 1 to its cell (distinct shingles can
        still share a cell) — the SQL oracle (``rademacher_emb_cte``)
        depends on this; do not "fix" either side to multiplicity."""
        n = len(surfaces)
        nf = self.n_features
        flat, lengths = shingle_hashes_flat(surfaces, self.shingle_k)
        rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
        cells = (flat % np.uint64(nf)).astype(np.int64) + rows * nf
        return np.bincount(cells, minlength=n * nf).reshape(n, nf)

    def embed(self, surfaces) -> np.ndarray:
        """(n,) strings -> (n, dim) float32, L2-normalized."""
        if len(surfaces) == 0:
            return np.empty((0, self.dim), dtype=np.float32)
        counts = self._counts(surfaces).astype(np.float32)
        emb = counts @ self.proj
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        return emb / norms

    def embed_int(self, surfaces) -> tuple[np.ndarray, np.ndarray]:
        """(n,) strings -> ((n, dim) int64 un-normalized embedding,
        (n,) int64 squared norms) — exact integers (rademacher only).

        cosine(a, b) = dot_int / sqrt(sq_a * sq_b) computed in float64 is
        then bit-identical between numpy and DuckDB (single correctly-
        rounded sqrt + division over exactly-representable integers)."""
        if self.proj_int is None:
            raise ValueError("embed_int requires projection='rademacher'")
        if len(surfaces) == 0:
            z = np.empty((0, self.dim), dtype=np.int64)
            return z, np.empty(0, dtype=np.int64)
        counts = self._counts(surfaces)
        # fast path: float32 BLAS matmul over integer operands is exact
        # while every |partial sum| stays < 2**24; partial sums are bounded
        # by the row's total shingle count (all matrix entries are +-1), so
        # short surfaces (the linkage domain) take sgemm, not the ~20x
        # slower int64 einsum
        if counts.sum(axis=1).max() < (1 << 23):
            emb = np.rint(counts.astype(np.float32) @ self.proj).astype(np.int64)
        else:
            emb = counts @ self.proj_int
        return emb, np.einsum("ij,ij->i", emb, emb)

    _EB_SALT = np.uint64(0xEB00_5EED_0000_0001)

    def bucket_values(self, emb: np.ndarray, bits: int) -> np.ndarray:
        """Sign-bit SimHash bucket per row -> uint64 (salted so embedding
        buckets can never collide with MinHash band hashes)."""
        signs = (emb[:, :bits] > 0).astype(np.uint64)
        weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        return splitmix64((signs @ weights) ^ self._EB_SALT)

    def buckets(self, emb: np.ndarray, bits: int) -> list[str]:
        """String form of ``bucket_values``: ``eb:{value:016x}``."""
        return [f"eb:{v:016x}" for v in self.bucket_values(emb, bits)]

    def cosine(self, a_surfaces, b_surfaces) -> np.ndarray:
        """Row-wise cosine similarity between two equal-length surface lists."""
        ea = self.embed(a_surfaces)
        eb = self.embed(b_surfaces)
        return np.einsum("ij,ij->i", ea, eb)

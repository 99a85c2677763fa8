"""Batched pairwise scoring — the engine's "linker" (J4-analog).

The reference scores (mention, candidate) pairs by a dot product between
dual-encoder embeddings (/root/reference/modeling_e2e_span.py:161-162, and
the all-candidates variant at :227-232).  Here each candidate pair gets

    score = w_jw * jaro_winkler(s_lo, s_hi)
          + w_lev * (1 - levenshtein(s_lo, s_hi) / max_len)
          + w_emb * cosine(embed(s_lo), embed(s_hi))

computed in large batches: the string kernels run inside DuckDB (vectorized
C++ over the Arrow batch, zero-copy register), the cosine via the
deterministic hash-projection embedder (numpy matmul).  The stage is a
callable class so the DuckDB connection + projection matrix are built once
per actor (``__init__``), not per batch.

Thresholding (T3-analog of the reference's ``sigmoid >= gamma`` span filter,
/root/reference/run_e2e_span.py:536-544) turns scored pairs into edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.config import PipelineConfig


SCORED_SCHEMA_COLS = [
    "id_lo", "id_hi", "block_key", "emb_sim", "jw", "lev", "score", "ge_thr",
]


class PairScorer:
    """Callable class for ``map_batches(PairScorer, concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig):
        import duckdb

        self.cfg = cfg
        self.con = duckdb.connect()
        # one thread per actor: the pool already owns one CPU per actor;
        # DuckDB's default (all cores) would oversubscribe N actors x N
        # threads and thrash the node
        self.con.execute("SET threads TO 1")
        from biomedical_el_ray.stages.model_embed import build_embedder

        # A2 plan choice: deterministic hash projection, or a real model
        # behind the same interface (embed_projection="model:<loader>")
        self.embedder = build_embedder(cfg)
        # surface -> embedding-row memo: pairs repeat surfaces heavily
        # (each distinct surface appears in ~deg(surface) pairs), so
        # embedding per pair-side would recompute each vector O(degree)
        # times.  Bounded: cleared past _MEMO_MAX entries.  The float and
        # integer-exact paths store different value shapes (normalized
        # row vs (vec, sq) tuple), so each keeps its own dict — sharing
        # one would serve mis-shaped entries if both paths ever ran on a
        # single scorer instance.
        self._memo: dict = {}
        self._memo_int: dict = {}

    _MEMO_MAX = 1_000_000

    def _embed_both(self, s_lo, s_hi) -> tuple[np.ndarray, np.ndarray]:
        """Embeddings for both pair sides via one np.unique gather.

        Python cost is O(#unique surfaces) per batch, never O(#pairs):
        memo lookups and inserts run on the unique list; the per-pair
        expansion is a single vectorized row gather.
        """
        n = len(s_lo)
        alls = np.concatenate(
            [np.asarray(s_lo, dtype=object), np.asarray(s_hi, dtype=object)]
        )
        uniq, inv = np.unique(alls, return_inverse=True)
        memo = self._memo
        miss = [s for s in uniq if s not in memo]
        if miss:
            vecs = self.embedder.embed(list(miss))
            if len(memo) + len(miss) > self._MEMO_MAX:
                memo.clear()
            memo.update(zip(miss, vecs))
        mat = np.empty((len(uniq), self.embedder.dim), dtype=np.float32)
        for i, s in enumerate(uniq):
            mat[i] = memo[s]
        rows = mat[inv]
        return rows[:n], rows[n:]

    def _embed_both_exact(self, s_lo, s_hi):
        """Integer-exact sibling of ``_embed_both`` (rademacher projection):
        returns (vec_lo, sq_lo, vec_hi, sq_hi) with int64 un-normalized
        embeddings + squared norms, memoized per unique surface."""
        n = len(s_lo)
        alls = np.concatenate(
            [np.asarray(s_lo, dtype=object), np.asarray(s_hi, dtype=object)]
        )
        uniq, inv = np.unique(alls, return_inverse=True)
        memo = self._memo_int
        miss = [s for s in uniq if s not in memo]
        if miss:
            vecs, sqs = self.embedder.embed_int(list(miss))
            if len(memo) + len(miss) > self._MEMO_MAX:
                memo.clear()
            memo.update(zip(miss, zip(vecs, sqs)))
        mat = np.empty((len(uniq), self.embedder.dim), dtype=np.int64)
        sq = np.empty(len(uniq), dtype=np.int64)
        for i, s in enumerate(uniq):
            mat[i], sq[i] = memo[s]
        rows, rsq = mat[inv], sq[inv]
        return rows[:n], rsq[:n], rows[n:], rsq[n:]

    def score_arrays(self, s_lo, s_hi):
        """(jw, lev, emb_sim, score) float32/int32 arrays for surface pairs."""
        cfg = self.cfg
        tbl = pa.Table.from_arrays(
            [pa.array(s_lo, pa.string()), pa.array(s_hi, pa.string())],
            names=["a", "b"],
        )
        self.con.register("pairs_batch", tbl)
        res = self.con.execute(
            """
            SELECT jaro_winkler_similarity(a, b) AS jw,
                   levenshtein(a, b) AS lev,
                   greatest(length(a), length(b)) AS mx
            FROM pairs_batch
            """
        ).arrow()
        self.con.unregister("pairs_batch")
        jw = np.asarray(res["jw"], dtype=np.float64)
        lev = np.asarray(res["lev"], dtype=np.int64)
        mx = np.maximum(np.asarray(res["mx"], dtype=np.int64), 1)
        if self.embedder.proj_int is not None:
            # rademacher: exact integer dot + one correctly-rounded
            # sqrt/divide over f64 -> bit-identical to the DuckDB oracle
            # (functions.sql_hash.rademacher_emb_cte)
            ea, qa, eb, qb = self._embed_both_exact(s_lo, s_hi)
            dot = np.einsum("ij,ij->i", ea, eb).astype(np.float64)
            emb = dot / np.sqrt(qa.astype(np.float64) * qb.astype(np.float64))
        else:
            ea, eb = self._embed_both(s_lo, s_hi)
            emb = np.einsum("ij,ij->i", ea, eb).astype(np.float64)
        score = (
            cfg.w_jaro_winkler * jw
            + cfg.w_levenshtein * (1.0 - lev / mx)
            + cfg.w_embedding * emb
        )
        return jw, lev, emb, score

    def __call__(self, batch: pa.Table) -> pa.Table:
        s_lo = batch["s_lo"].to_pylist()
        s_hi = batch["s_hi"].to_pylist()
        jw, lev, emb, score = self.score_arrays(s_lo, s_hi)
        # threshold on the f64 score BEFORE the float32 display cast, so
        # edges_from_scores agrees bit-for-bit with the in-task hot path
        # (_score_edges_in_task) and the DuckDB oracle for scores within
        # half a float32 ULP of score_threshold
        return pa.Table.from_arrays(
            [
                batch["id_lo"],
                batch["id_hi"],
                batch["block_key"],
                pa.array(emb.astype(np.float32)),
                pa.array(jw.astype(np.float32)),
                pa.array(lev.astype(np.int32)),
                pa.array(score.astype(np.float32)),
                pa.array(score >= self.cfg.score_threshold),
            ],
            names=SCORED_SCHEMA_COLS,
        )


def _score_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Task-based scoring; DuckDB conn + embedder cached per worker."""
    from biomedical_el_ray.util import worker_state

    scorer = worker_state(("pair_scorer", cfg.config_hash()), lambda: PairScorer(cfg))
    return scorer(batch)


def score_pairs(pairs_ds, cfg: PipelineConfig | None = None):
    """pairs Dataset -> scored pairs Dataset (streaming tasks; the
    DuckDB connection, projection matrix and embedding memo live in a
    per-worker state cache — actor-pool state semantics without the
    staggered pool launch)."""
    cfg = cfg or PipelineConfig()
    return pairs_ds.map_batches(
        _score_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.score_batch_size,
    )


def edges_from_scores(scored_ds, cfg: PipelineConfig | None = None):
    """Threshold filter -> (src, dst) edge Dataset for clustering.

    Uses the precomputed ``ge_thr`` column (f64 threshold decision made
    inside the scorer, before the float32 display cast) when present, so
    keep_scored-path clusters match the hot in-task path exactly; falls
    back to thresholding the f32 score for pre-ge_thr scored tables."""
    cfg = cfg or PipelineConfig()
    thr = cfg.score_threshold

    def _f(t: pa.Table) -> pa.Table:
        if "ge_thr" in t.column_names:
            kept = t.filter(t["ge_thr"])
        else:
            kept = t.filter(pc.greater_equal(t["score"], thr))
        return pa.Table.from_arrays(
            [kept["id_lo"], kept["id_hi"]], names=["src", "dst"]
        )

    return scored_ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)



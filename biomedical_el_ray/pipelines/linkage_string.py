"""String-only linkage variant — the flagship machinery, oracle-exact.

Runs the SAME distributed machinery as the flagship — MinHash/LSH
blocking (`stages/blocking.py`), salted single-shuffle pair generation
(`stages/pairs.py`), DuckDB string scoring (`stages/scoring.py`),
connected components (`state/unionfind.py`) — with the embedding weight
OFF, over the gold-mention surface domain, where every step is
relational: blocking rides the splitmix CTE machinery
(``functions.minhash.band_keys_oracle_cte``), scoring is the very same
DuckDB jaro_winkler/levenshtein kernels, and clustering is a recursive
reachability CTE.  A driver-green row here isolates the blocking /
pair-dedup / first-shared-slot / scoring / union-find path against SQL
with no embedding term at all; the full three-term flagship is itself
oracle-exact via the Rademacher projection
(``transcripts_queries.linkage_clusters_oracle_sql``), and
``linkage_emb`` covers the same on this gold-surface domain.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.sources.readers import read_parquet_spread
from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.pairs import generate_pairs
from biomedical_el_ray.pipelines.linkage import distinct_surfaces

# string-only config: no embedding blocks, no embedding score weight, no
# cosine gate; jw/lev weights renormalized, threshold tuned to the same
# strictness band as the flagship's 0.82
STRING_CFG = PipelineConfig(
    use_embedding_blocks=False,
    w_jaro_winkler=0.6,
    w_levenshtein=0.4,
    w_embedding=0.0,
    emb_gate=False,
    score_threshold=0.85,
)


def _surface_mentions(sf_dir: str):
    d = ensure_corpus_for_sf_dir(sf_dir)
    return read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"), columns=["mention_id", "surface"]
    )


def _scored_surface_pairs(sf_dir: str):
    """(s_lo, s_hi, jw, lev, score) over canonicalized surface pairs."""
    from biomedical_el_ray.util import worker_state

    mentions = _surface_mentions(sf_dir)
    surfaces = distinct_surfaces(mentions).materialize()
    blocks = add_block_keys(surfaces, STRING_CFG)
    pairs = generate_pairs(
        blocks, STRING_CFG, gate=False,
        rows_hint=surfaces.count() * STRING_CFG.minhash_bands,
    )

    def _score(t: pa.Table) -> pa.Table:
        from biomedical_el_ray.stages.scoring import PairScorer

        scorer = worker_state(
            ("pair_scorer", STRING_CFG.config_hash()),
            lambda: PairScorer(STRING_CFG),
        )
        s_lo = t["s_lo"].to_pylist()
        s_hi = t["s_hi"].to_pylist()
        jw, lev, _, score = scorer.score_arrays(s_lo, s_hi)
        # canonicalize by surface string (not by the internal surface-id
        # hash) so the output ordering is SQL-expressible
        a = np.asarray(s_lo, dtype=object)
        b = np.asarray(s_hi, dtype=object)
        swap = a > b
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.string()),
                pa.array(hi, pa.string()),
                pa.array(jw, pa.float64()),
                pa.array(lev.astype(np.int64), pa.int64()),
                pa.array(score, pa.float64()),
            ],
            names=["s_lo", "s_hi", "jw", "lev", "score"],
        )

    return pairs.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True), surfaces


def linkage_string_pairs(sf_dir: str):
    """(s_lo, s_hi, jw_r, lev, score_r) — the flagship candidate-pair +
    scoring path with the embedding weight off (DuckDB-oracle exact)."""
    scored, _ = _scored_surface_pairs(sf_dir)

    def _round(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["s_lo"], t["s_hi"],
                pa.array(np.round(t["jw"].to_numpy(zero_copy_only=False), 6)),
                t["lev"],
                pa.array(np.round(t["score"].to_numpy(zero_copy_only=False), 6)),
            ],
            names=["s_lo", "s_hi", "jw_r", "lev", "score_r"],
        )

    return scored.map_batches(_round, batch_format="pyarrow", zero_copy_batch=True)


def linkage_string_clusters(sf_dir: str):
    """(surface, cluster_id) — connected components over threshold edges
    of the string-only scored pairs; cluster_id = lexicographic-min
    surface of the component (DuckDB-oracle exact via recursive CTE)."""
    from biomedical_el_ray.state.unionfind import connected_components

    scored, surfaces = _scored_surface_pairs(sf_dir)
    thr = STRING_CFG.score_threshold

    def _edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = t.filter(pc.greater_equal(t["score"], thr))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"]
        )

    edges = scored.map_batches(_edges, batch_format="pyarrow", zero_copy_batch=True)
    nodes = surfaces.map_batches(
        lambda t: pa.Table.from_arrays([t["surface"]], names=["node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return connected_components(edges, nodes).map_batches(
        lambda t: t.rename_columns(["surface", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _pairs_cte(corpus_dir: str) -> str:
    """CTE chain ending in ``scored(s_lo, s_hi, jw, lev, score)``:
    band keys via the splitmix machinery, candidate pairs = >=1 shared
    band whose FIRST shared slot's block is under ``max_block_size``,
    scoring via the same DuckDB kernels the engine calls."""
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte

    cfg = STRING_CFG
    bk_cte, bk = band_keys_oracle_cte(
        "surf", id_col="surface", text_col="surface",
        num_hashes=cfg.minhash_hashes, bands=cfg.minhash_bands,
        k=cfg.minhash_shingle_k, seed=cfg.minhash_seed,
    )
    return f"""surf AS (
          SELECT DISTINCT surface
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        {bk_cte},
        bsize AS (
          SELECT band, bkey, count(*) AS csize
          FROM {bk} GROUP BY 1, 2),
        coll AS (
          SELECT least(a.doc_id, b.doc_id) AS s_lo,
                 greatest(a.doc_id, b.doc_id) AS s_hi,
                 a.band, a.bkey
          FROM {bk} a
          JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
                     AND a.doc_id < b.doc_id),
        firstslot AS (
          SELECT s_lo, s_hi, min(band) AS fband
          FROM coll GROUP BY 1, 2),
        cand AS (
          SELECT f.s_lo, f.s_hi
          FROM firstslot f
          JOIN coll c ON c.s_lo = f.s_lo AND c.s_hi = f.s_hi
                     AND c.band = f.fband
          JOIN bsize z ON z.band = c.band AND z.bkey = c.bkey
          WHERE z.csize <= {cfg.max_block_size}),
        scored AS (
          SELECT s_lo, s_hi,
                 jaro_winkler_similarity(s_lo, s_hi) AS jw,
                 CAST(levenshtein(s_lo, s_hi) AS BIGINT) AS lev,
                 {cfg.w_jaro_winkler} * jaro_winkler_similarity(s_lo, s_hi)
                   + {cfg.w_levenshtein} * (1.0 - levenshtein(s_lo, s_hi)
                       / greatest(greatest(length(s_lo), length(s_hi)), 1))
                   AS score
          FROM cand)"""


def linkage_string_pairs_oracle_sql(corpus_dir: str) -> str:
    return f"""
        WITH {_pairs_cte(corpus_dir)}
        SELECT s_lo, s_hi, round(jw, 6) AS jw_r, lev,
               round(score, 6) AS score_r
        FROM scored
    """


def linkage_string_clusters_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = STRING_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM scored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {_pairs_cte(corpus_dir)},
        {reach}
        SELECT s AS surface, min(r) AS cluster_id
        FROM reach GROUP BY s
    """

"""Embedding-weighted linkage variant — the FULL flagship score, oracle-exact.

Runs the flagship's full three-term score (jaro_winkler + levenshtein +
embedding cosine, the J4-analog of the reference's dot-product linker,
/root/reference/modeling_e2e_span.py:161-162) AND the dense embedding
blocking slot (A2/J3-analog) over the gold-mention surface domain.  The
default projection is a splitmix64-derived Rademacher +-1 matrix (a
valid JL projection per Achlioptas 2003): the un-normalized embedding is
an exact integer vector, cosine = dot / sqrt(sq_a * sq_b) is one
correctly-rounded f64 sqrt+divide on both sides, and every term of the
score is bit-identical between numpy and DuckDB
(``functions.sql_hash.rademacher_emb_cte``).  ``scored_pairs_cte`` here
is also the engine of the flagship end-to-end oracle
(``transcripts_queries.linkage_clusters_oracle_sql``), which chains it
after the gazetteer-extraction CTE over the extracted-mention domain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import distinct_surfaces
from biomedical_el_ray.pipelines.linkage_string import _surface_mentions
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.pairs import generate_pairs

# flagship weights/threshold/blocking, Rademacher projection; the quantized
# gate stays off (its int8 quantization rides float32 normalization, which
# SQL cannot reproduce — gate soundness is pinned by test_edge_gate instead)
EMB_CFG = PipelineConfig(embed_projection="rademacher", emb_gate=False)


def _scored_pairs(sf_dir: str):
    """(s_lo, s_hi, jw, lev, cos, score) over canonicalized surface pairs.

    Memoized per session (``util.memo_derived``): a dozen downstream
    queries (threshold sweep, cluster eval/refine/merge, NIL, graph
    metrics) consume this identical chain; each used to re-run
    block→pair→score from the parquet read.  Both outputs are at
    aggregate grain (distinct surfaces / candidate pairs)."""
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    def _build():
        from biomedical_el_ray.pipelines.linkage_string import _gold_surfaces

        ensure_hash_shuffle()
        surfaces = _gold_surfaces(sf_dir)  # shared with the blocking catalog
        scored = _scored_pairs_from_surfaces(surfaces).materialize()
        return scored, surfaces

    scored, surfaces = memo_derived(("lemb_scored_pairs", str(sf_dir)), _build)
    return ensure_hash_shuffle(scored), ensure_hash_shuffle(surfaces)


def _scored_pairs_from_surfaces(surfaces):
    """The flagship block→pair→score chain over ANY materialized surface
    Dataset (one ``surface`` column) — shared by the gold-domain queries
    and domain-restricted variants (e.g. NIL clustering)."""
    from biomedical_el_ray.util import worker_state

    blocks = add_block_keys(surfaces, EMB_CFG)
    pairs = generate_pairs(
        blocks, EMB_CFG, gate=False,
        rows_hint=surfaces.count() * (EMB_CFG.minhash_bands + 1),
    )

    def _score(t: pa.Table) -> pa.Table:
        from biomedical_el_ray.stages.scoring import PairScorer

        scorer = worker_state(
            ("pair_scorer", EMB_CFG.config_hash()),
            lambda: PairScorer(EMB_CFG),
        )
        s_lo = t["s_lo"].to_pylist()
        s_hi = t["s_hi"].to_pylist()
        jw, lev, cos, score = scorer.score_arrays(s_lo, s_hi)
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
                pa.array(cos, pa.float64()),
                pa.array(score, pa.float64()),
            ],
            names=["s_lo", "s_hi", "jw", "lev", "cos", "score"],
        )

    return pairs.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)


def linkage_emb_pairs(sf_dir: str):
    """(s_lo, s_hi, jw_r, lev, cos_r, score_r) — flagship candidate-pair +
    full three-term scoring path (DuckDB-oracle exact)."""
    scored, _ = _scored_pairs(sf_dir)

    def _round(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["s_lo"], t["s_hi"],
                pa.array(np.round(t["jw"].to_numpy(zero_copy_only=False), 6)),
                t["lev"],
                pa.array(np.round(t["cos"].to_numpy(zero_copy_only=False), 6)),
                pa.array(np.round(t["score"].to_numpy(zero_copy_only=False), 6)),
            ],
            names=["s_lo", "s_hi", "jw_r", "lev", "cos_r", "score_r"],
        )

    return scored.map_batches(_round, batch_format="pyarrow", zero_copy_batch=True)


def _cluster_map(sf_dir: str):
    """Materialized (surface, cluster_id) flagship cluster map, memoized
    per session: connected components over threshold edges of the
    full-score pairs; cluster_id = lexicographic-min member surface.

    Every cluster-consuming query (cohesion, merge queue, refine pass 1,
    the four eval metrics) reads this ONE components execution instead of
    re-running the iterative union-find per consumer — the in-session
    analog of reading a checkpointed clusters stage."""
    from biomedical_el_ray.state.unionfind import connected_components
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    def _build():
        scored, surfaces = _scored_pairs(sf_dir)
        thr = EMB_CFG.score_threshold

        def _edges(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            kept = t.filter(pc.greater_equal(t["score"], thr))
            return pa.Table.from_arrays(
                [kept["s_lo"], kept["s_hi"]], names=["src", "dst"]
            )

        edges = scored.map_batches(
            _edges, batch_format="pyarrow", zero_copy_batch=True)
        nodes = surfaces.map_batches(
            lambda t: pa.Table.from_arrays([t["surface"]], names=["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return connected_components(edges, nodes).map_batches(
            lambda t: t.rename_columns(["surface", "cluster_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    return ensure_hash_shuffle(
        memo_derived(("lemb_cluster_map", str(sf_dir)), _build))


def linkage_emb_clusters(sf_dir: str):
    """(surface, cluster_id) — the flagship cluster map (memoized; see
    ``_cluster_map``)."""
    return _cluster_map(sf_dir)


def correlation_clusters(sf_dir: str):
    """(surface, cluster_id) — deterministic KwikCluster correlation
    clustering over the SAME threshold edges as ``linkage_emb_clusters``;
    cluster_id = the cluster's pivot surface.

    The non-chaining alternative to transitive closure: connected
    components merge A–B–C chains even when the A–C pair scored below
    threshold; KwikCluster keeps such chains apart (3-approximation to
    min-disagreement, Ailon et al. 2008 — see ``state/correlation.py``
    for the deterministic parallel construction and its exactness proof).
    Rows-only for the driver (the pivot-peeling fixpoint is iterative,
    not SQL-expressible); pytest verifies the distributed path
    bit-identical to the sequential reference on random graphs and the
    corpus."""
    from biomedical_el_ray.state.correlation import correlation_components

    scored, surfaces = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold

    def _edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = t.filter(pc.greater_equal(t["score"], thr))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"]
        )

    edges = scored.map_batches(_edges, batch_format="pyarrow",
                               zero_copy_batch=True)
    nodes = surfaces.map_batches(
        lambda t: pa.Table.from_arrays([t["surface"]], names=["node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return correlation_components(edges, nodes).map_batches(
        lambda t: t.rename_columns(["surface", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def scored_pairs_cte(surf_body: str, cfg: PipelineConfig) -> str:
    """CTE chain ending in ``lkscored(s_lo, s_hi, jw, lev, cos, score)``
    over the surface domain ``surf`` defined by ``surf_body`` (a SELECT
    yielding one ``surface`` column): MinHash band keys (slots 0..B-1) +
    the sign-bit embedding bucket (slot B) via the splitmix machinery,
    candidate pairs = first shared slot under ``max_block_size``
    (reproducing the engine's first-shared-slot exactly-once rule —
    salting splits hot blocks physically but never changes the pair set),
    then the full three-term score with the integer-exact Rademacher
    cosine.  ``cfg.embed_projection`` must be "rademacher".  Internal CTEs
    are prefixed mh/em/lk so the chain composes with e.g. the mention
    extraction chain (``stages.mentions.mentions_cte``) in one query."""
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte
    from biomedical_el_ray.functions.sql_hash import rademacher_emb_cte
    from biomedical_el_ray.stages.embed import HashEmbedder, rademacher_salt

    if cfg.embed_projection != "rademacher":
        raise ValueError("scored_pairs_cte requires the rademacher projection")
    bk_cte, bk = band_keys_oracle_cte(
        "surf", id_col="surface", text_col="surface",
        num_hashes=cfg.minhash_hashes, bands=cfg.minhash_bands,
        k=cfg.minhash_shingle_k, seed=cfg.minhash_seed, prefix="mh",
    )
    emb_cte = rademacher_emb_cte(
        "surf", k=cfg.shingle_k, n_features=cfg.embed_features,
        dim=cfg.embed_dim, salt=rademacher_salt(cfg.embed_seed),
        id_col="surface", text_col="surface", prefix="em",
        bucket_bits=cfg.embed_bucket_bits, eb_salt=int(HashEmbedder._EB_SALT),
    )
    cos = "CAST(t.dot AS DOUBLE) / sqrt(CAST(qa.sq AS DOUBLE) * CAST(qb.sq AS DOUBLE))"
    # MATERIALIZED on every multiply-referenced relation: DuckDB inlines
    # plain CTEs by duplicating their subtree per reference, which
    # re-evaluates the whole upstream chain (measured: the flagship
    # clusters oracle went from >560 s to seconds)
    return f"""surf AS MATERIALIZED ({surf_body}),
        {bk_cte},
        {emb_cte},
        lkall AS MATERIALIZED (
          SELECT doc_id, band AS slot, bkey AS key FROM {bk}
          UNION ALL
          SELECT doc_id, {cfg.minhash_bands} AS slot, ebkey AS key FROM emebk),
        lkbsize AS (
          SELECT slot, key, count(*) AS csize
          FROM lkall GROUP BY 1, 2),
        lkcoll AS MATERIALIZED (
          SELECT a.doc_id AS s_lo, b.doc_id AS s_hi, a.slot, a.key
          FROM lkall a
          JOIN lkall b ON a.slot = b.slot AND a.key = b.key
                      AND a.doc_id < b.doc_id),
        lkfirst AS (
          SELECT s_lo, s_hi, min(slot) AS fslot
          FROM lkcoll GROUP BY 1, 2),
        lkcand AS (
          SELECT f.s_lo, f.s_hi
          FROM lkfirst f
          JOIN lkcoll c ON c.s_lo = f.s_lo AND c.s_hi = f.s_hi
                       AND c.slot = f.fslot
          JOIN lkbsize z ON z.slot = c.slot AND z.key = c.key
          WHERE z.csize <= {cfg.max_block_size}),
        lkdots AS (
          SELECT c.s_lo, c.s_hi, CAST(sum(a.e * b.e) AS BIGINT) AS dot
          FROM lkcand c
          JOIN ememb a ON a.doc_id = c.s_lo
          JOIN ememb b ON b.doc_id = c.s_hi AND b.d = a.d
          GROUP BY 1, 2),
        lkscored AS MATERIALIZED (
          SELECT t.s_lo, t.s_hi,
                 jaro_winkler_similarity(t.s_lo, t.s_hi) AS jw,
                 CAST(levenshtein(t.s_lo, t.s_hi) AS BIGINT) AS lev,
                 {cos} AS cos,
                 {cfg.w_jaro_winkler} * jaro_winkler_similarity(t.s_lo, t.s_hi)
                   + {cfg.w_levenshtein} * (1.0 - levenshtein(t.s_lo, t.s_hi)
                       / greatest(greatest(length(t.s_lo), length(t.s_hi)), 1))
                   + {cfg.w_embedding} * ({cos})
                   AS score
          FROM lkdots t
          JOIN emsq qa ON qa.doc_id = t.s_lo
          JOIN emsq qb ON qb.doc_id = t.s_hi)"""


def _gold_surf_body(corpus_dir: str) -> str:
    return ("SELECT DISTINCT surface FROM "
            f"read_parquet('{corpus_dir}/gold_mentions.parquet')")


def linkage_emb_pairs_oracle_sql(corpus_dir: str) -> str:
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), EMB_CFG)}
        SELECT s_lo, s_hi, round(jw, 6) AS jw_r, lev,
               round(cos, 6) AS cos_r, round(score, 6) AS score_r
        FROM lkscored
    """


def linkage_emb_clusters_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach}
        SELECT s AS surface, min(r) AS cluster_id
        FROM reach GROUP BY s
    """


# --------------------------------------------------------------------------
# B-cubed clustering evaluation
# --------------------------------------------------------------------------

_B3_SCALE = 1_000_000


def _cluster_entity_contingency(sf_dir: str, max_cells: int):
    """The (cluster_id, entity_id, ncg) contingency table of the
    full-score flagship clustering vs gold entity labels — the shared
    reduction of :func:`bcubed_eval` and :func:`pairwise_eval`.  See
    ``bcubed_eval`` for the scale shape."""
    import os

    from ray.data.aggregate import Sum

    from biomedical_el_ray.sources.readers import read_parquet_spread
    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    d = ensure_corpus_for_sf_dir(sf_dir)
    pred = linkage_emb_clusters(sf_dir)
    gm = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["surface", "entity_id"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["surface", "entity_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["surface", "entity_id", "w"])

    joined = gm.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        pred,
        join_type="inner",
        num_partitions=shuffle_partitions(),
        on=("surface",),
    )
    cont = (
        drop_empty_blocks(joined.select_columns(["cluster_id", "entity_id", "w"]))
        .groupby(["cluster_id", "entity_id"])
        .aggregate(Sum("w", alias_name="ncg"))
        .take_all()
    )
    if len(cont) > max_cells:
        raise ValueError(
            f"contingency table has {len(cont)} cells "
            f"(> max_cells={max_cells}); raise max_cells explicitly"
        )
    n_c: dict = {}
    n_g: dict = {}
    for r in cont:
        n_c[r["cluster_id"]] = n_c.get(r["cluster_id"], 0) + int(r["ncg"])
        n_g[r["entity_id"]] = n_g.get(r["entity_id"], 0) + int(r["ncg"])
    return cont, n_c, n_g


def bcubed_eval(sf_dir: str, max_cells: int = 5_000_000):
    """One-row B³ precision/recall/F1 (Bagga & Baldwin 1998) of the
    full-score flagship clustering against the gold entity labels —
    the standard mention-level ER clustering measure, complementing the
    engine's pairwise P/R/F1 (``pipelines.evaluate.pairwise_prf``).

    Items are gold MENTIONS; each mention's predicted cluster is its
    surface's component (the flagship clusters by surface), so the whole
    measure reduces to the (cluster, entity) contingency table:
    B³P = Σ n(c,g)²/n(c) / N and B³R = Σ n(c,g)²/n(g) / N.

    Scale shape: mentions are compressed map-side to (surface, entity,
    weight) partials before ONE hash-shuffle join to the surface→cluster
    map, then a bounded multi-key groupby builds the contingency table —
    the only thing the driver ever holds (≤ distinct (surface, entity)
    pairs; ``max_cells`` raises loudly rather than truncating).  The
    per-cell terms use exact-integer fixed point (Python bigints vs
    DuckDB HUGEINT), so the sums are combine-order-free and bit-identical
    to the oracle.
    """
    cont, n_c, n_g = _cluster_entity_contingency(sf_dir, max_cells)
    n_tot = sum(n_c.values())
    sp = sum(
        (int(r["ncg"]) * int(r["ncg"]) * _B3_SCALE) // n_c[r["cluster_id"]]
        for r in cont
    )
    sr = sum(
        (int(r["ncg"]) * int(r["ncg"]) * _B3_SCALE) // n_g[r["entity_id"]]
        for r in cont
    )
    denom = float(_B3_SCALE) * max(n_tot, 1)
    p = float(sp) / denom
    r_ = float(sr) / denom
    f1 = 0.0 if sp + sr == 0 else 2.0 * p * r_ / (p + r_)
    return pa.table({
        "n_mentions": pa.array([n_tot], pa.int64()),
        "n_clusters": pa.array([len(n_c)], pa.int64()),
        "n_entities": pa.array([len(n_g)], pa.int64()),
        "b3_precision_r": pa.array([round(p, 6)], pa.float64()),
        "b3_recall_r": pa.array([round(r_, 6)], pa.float64()),
        "b3_f1_r": pa.array([round(f1, 6)], pa.float64()),
    })


def bcubed_eval_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: the flagship cluster CTE chain + the (cluster, entity)
    contingency table + HUGEINT fixed-point B³ sums (``//`` truncation ==
    Python floor on non-negative terms)."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    s = _B3_SCALE
    p_expr = f"CAST(sp AS DOUBLE) / ({s}.0 * greatest(n_m, 1))"
    r_expr = f"CAST(sr AS DOUBLE) / ({s}.0 * greatest(n_m, 1))"
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        gmc AS (
          SELECT g.entity_id, c.cluster_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet') g
          JOIN comp c ON g.surface = c.surface),
        cont AS (
          SELECT cluster_id, entity_id, count(*) AS ncg
          FROM gmc GROUP BY 1, 2),
        byc AS (SELECT cluster_id, sum(ncg) AS n_c FROM cont GROUP BY 1),
        byg AS (SELECT entity_id, sum(ncg) AS n_g FROM cont GROUP BY 1),
        agg AS (
          SELECT CAST(sum(t.ncg) AS BIGINT) AS n_m,
                 count(DISTINCT t.cluster_id) AS n_cl,
                 count(DISTINCT t.entity_id) AS n_en,
                 sum(CAST(t.ncg AS HUGEINT) * t.ncg * {s} // c.n_c) AS sp,
                 sum(CAST(t.ncg AS HUGEINT) * t.ncg * {s} // g.n_g) AS sr
          FROM cont t
          JOIN byc c ON t.cluster_id = c.cluster_id
          JOIN byg g ON t.entity_id = g.entity_id)
        SELECT coalesce(n_m, 0) AS n_mentions,
               CAST(n_cl AS BIGINT) AS n_clusters,
               CAST(n_en AS BIGINT) AS n_entities,
               round(coalesce({p_expr}, 0.0), 6) AS b3_precision_r,
               round(coalesce({r_expr}, 0.0), 6) AS b3_recall_r,
               round(CASE WHEN coalesce(sp + sr, 0) = 0 THEN 0.0
                     ELSE 2.0 * ({p_expr}) * ({r_expr})
                          / (({p_expr}) + ({r_expr})) END, 6) AS b3_f1_r
        FROM agg
    """


def pairwise_eval(sf_dir: str, max_cells: int = 5_000_000):
    """One-row pairwise precision/recall/F1 of the full-score flagship
    clustering vs gold entity labels — THE north-rule agreement metric
    (BASELINE.json: pairwise F1 vs reference clusters) as a first-class
    driver query over the mention domain.

    All three counts reduce over the same (cluster, entity) contingency
    table as :func:`bcubed_eval`: true pairs = Σ C(n(c,g),2), predicted
    pairs = Σ C(n(c),2), gold pairs = Σ C(n(g),2) — exact integers, so
    any combine order matches the DuckDB HUGEINT oracle; the three
    ratios are single f64 divisions rounded to 6.
    """
    cont, n_c, n_g = _cluster_entity_contingency(sf_dir, max_cells)
    n_tot = sum(n_c.values())
    tp = sum(int(r["ncg"]) * (int(r["ncg"]) - 1) // 2 for r in cont)
    pp = sum(v * (v - 1) // 2 for v in n_c.values())
    gp = sum(v * (v - 1) // 2 for v in n_g.values())
    p = tp / max(pp, 1)
    r_ = tp / max(gp, 1)
    f1 = 0.0 if tp == 0 else 2.0 * p * r_ / (p + r_)
    return pa.table({
        "n_mentions": pa.array([n_tot], pa.int64()),
        "n_true_pairs": pa.array([tp], pa.int64()),
        "n_pred_pairs": pa.array([pp], pa.int64()),
        "n_gold_pairs": pa.array([gp], pa.int64()),
        "pair_precision_r": pa.array([round(p, 6)], pa.float64()),
        "pair_recall_r": pa.array([round(r_, 6)], pa.float64()),
        "pair_f1_r": pa.array([round(f1, 6)], pa.float64()),
    })


def pairwise_eval_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin of :func:`pairwise_eval` over the same cluster CTE
    chain and contingency table."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    p_expr = "CAST(tp AS DOUBLE) / greatest(pp, 1)"
    r_expr = "CAST(tp AS DOUBLE) / greatest(gp, 1)"
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        gmc AS (
          SELECT g.entity_id, c.cluster_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet') g
          JOIN comp c ON g.surface = c.surface),
        cont AS (
          SELECT cluster_id, entity_id, count(*) AS ncg
          FROM gmc GROUP BY 1, 2),
        agg AS (
          SELECT CAST(coalesce(sum(ncg), 0) AS BIGINT) AS n_m,
                 coalesce(sum(CAST(ncg AS HUGEINT) * (ncg - 1) // 2), 0) AS tp
          FROM cont),
        aggc AS (
          SELECT coalesce(sum(CAST(n_c AS HUGEINT) * (n_c - 1) // 2), 0) AS pp
          FROM (SELECT sum(ncg) AS n_c FROM cont GROUP BY cluster_id)),
        aggg AS (
          SELECT coalesce(sum(CAST(n_g AS HUGEINT) * (n_g - 1) // 2), 0) AS gp
          FROM (SELECT sum(ncg) AS n_g FROM cont GROUP BY entity_id))
        SELECT n_m AS n_mentions,
               CAST(tp AS BIGINT) AS n_true_pairs,
               CAST(pp AS BIGINT) AS n_pred_pairs,
               CAST(gp AS BIGINT) AS n_gold_pairs,
               round({p_expr}, 6) AS pair_precision_r,
               round({r_expr}, 6) AS pair_recall_r,
               round(CASE WHEN tp = 0 THEN 0.0
                     ELSE 2.0 * ({p_expr}) * ({r_expr})
                          / (({p_expr}) + ({r_expr})) END, 6) AS pair_f1_r
        FROM agg, aggc, aggg
    """


def ari_eval(sf_dir: str, max_cells: int = 5_000_000):
    """One-row Adjusted Rand Index (Hubert & Arabie 1985) of the
    full-score flagship clustering vs gold entity labels — the
    chance-corrected partition-agreement measure, completing the
    engine's cluster-eval trio (pairwise P/R/F1, B³, ARI).

    Reduces over the same (cluster, entity) contingency table as
    :func:`pairwise_eval`; with S = C(n,2), T = Σ C(n(c,g),2),
    A = Σ C(n(c),2), B = Σ C(n(g),2):

        ARI = (S·T − A·B) / (S·(A+B)/2 − A·B)

    computed denominator-cleared as 2(S·T − A·B) / (S(A+B) − 2AB) so
    every term is an exact integer (Python bigint vs DuckDB HUGEINT) in
    any combine order; the final value is ONE correctly-rounded f64
    division on both sides.  Identical trivial-partition convention to
    sklearn: denominator 0 (e.g. everything one cluster on both sides)
    means the partitions agree perfectly → 1.0.
    """
    cont, n_c, n_g = _cluster_entity_contingency(sf_dir, max_cells)
    n_tot = sum(n_c.values())
    t = sum(int(r["ncg"]) * (int(r["ncg"]) - 1) // 2 for r in cont)
    a = sum(v * (v - 1) // 2 for v in n_c.values())
    b = sum(v * (v - 1) // 2 for v in n_g.values())
    s = n_tot * (n_tot - 1) // 2
    num = 2 * (s * t - a * b)
    den = s * (a + b) - 2 * a * b
    ari = 1.0 if den == 0 else float(num) / float(den)
    return pa.table({
        "n_mentions": pa.array([n_tot], pa.int64()),
        "n_true_pairs": pa.array([t], pa.int64()),
        "n_pred_pairs": pa.array([a], pa.int64()),
        "n_gold_pairs": pa.array([b], pa.int64()),
        "ari_r": pa.array([round(ari, 6)], pa.float64()),
    })


def ari_eval_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin of :func:`ari_eval`: the same cluster CTE chain and
    contingency table, the index denominator-cleared in HUGEINT."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        gmc AS (
          SELECT g.entity_id, c.cluster_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet') g
          JOIN comp c ON g.surface = c.surface),
        cont AS (
          SELECT cluster_id, entity_id, count(*) AS ncg
          FROM gmc GROUP BY 1, 2),
        agg AS (
          SELECT CAST(coalesce(sum(ncg), 0) AS HUGEINT) AS n_m,
                 coalesce(sum(CAST(ncg AS HUGEINT) * (ncg - 1) // 2), 0) AS tp
          FROM cont),
        aggc AS (
          SELECT coalesce(sum(CAST(n_c AS HUGEINT) * (n_c - 1) // 2), 0) AS pp
          FROM (SELECT sum(ncg) AS n_c FROM cont GROUP BY cluster_id)),
        aggg AS (
          SELECT coalesce(sum(CAST(n_g AS HUGEINT) * (n_g - 1) // 2), 0) AS gp
          FROM (SELECT sum(ncg) AS n_g FROM cont GROUP BY entity_id)),
        terms AS (
          SELECT n_m, tp, pp, gp,
                 n_m * (n_m - 1) // 2 AS s,
                 2 * ((n_m * (n_m - 1) // 2) * tp - pp * gp) AS num,
                 (n_m * (n_m - 1) // 2) * (pp + gp) - 2 * pp * gp AS den
          FROM agg, aggc, aggg)
        SELECT CAST(n_m AS BIGINT) AS n_mentions,
               CAST(tp AS BIGINT) AS n_true_pairs,
               CAST(pp AS BIGINT) AS n_pred_pairs,
               CAST(gp AS BIGINT) AS n_gold_pairs,
               round(CASE WHEN den = 0 THEN 1.0
                     ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6)
                 AS ari_r
        FROM terms
    """


_NMI_SCALE = 10**12


def _fp_term(x: float) -> int:
    """floor(x·1e12 + 0.5): round-half-up fixed point — the identical f64
    sequence DuckDB's ``floor(x * 1e12 + 0.5)`` performs, so per-term
    values match bit-exactly and the integer SUM is combine-order-free."""
    import math

    return math.floor(x * 1e12 + 0.5)


def nmi_eval(sf_dir: str, max_cells: int = 5_000_000):
    """One-row normalized mutual information of the full-score flagship
    clustering vs gold entity labels — completing the clustering-eval
    quartet (pairwise P/R/F1, B³, ARI, NMI).  Arithmetic-mean
    normalization: NMI = MI / ((H_cluster + H_entity) / 2).

    Exactness: per-cell terms need ``ln``; CPython's ``math.log`` and
    DuckDB's ``ln`` both call glibc log and are bit-identical on this
    platform (verified over 12k inputs, 0 ULP), unlike numpy's SIMD log
    (1 ULP off).  Each term is computed with the identical f64 op
    sequence on both sides, fixed-pointed via floor(·1e12 + .5), and
    summed as exact integers — combine-order-free, so the BIGINT sums in
    the result row hash-match the oracle exactly.  Count products must
    stay in exact-double range: raises if N·max(ncg) or max(n_c)·max(n_g)
    reaches 2^53 (at that scale the contingency table itself — ``ncg``
    cells at aggregate grain — is the thing to shard first).

    Scale shape: same bounded contingency reduction as ``bcubed_eval``;
    only the ≤``max_cells`` table reaches the driver.
    """
    import math

    cont, n_c, n_g = _cluster_entity_contingency(sf_dir, max_cells)
    N = sum(n_c.values())
    if N:
        mx = max(int(r["ncg"]) for r in cont)
        if N * mx >= 2**53 or max(n_c.values()) * max(n_g.values()) >= 2**53:
            raise ValueError(
                "nmi_eval count products exceed exact-double range; "
                "shard the contingency reduction before the metric")
    mi_fp = 0
    for r in cont:
        n = int(r["ncg"])
        a = n_c[r["cluster_id"]]
        b = n_g[r["entity_id"]]
        mi_fp += _fp_term((n / N) * math.log((N * n) / (a * b)))
    hc_fp = sum(_fp_term(-(a / N) * math.log(a / N)) for a in n_c.values())
    hg_fp = sum(_fp_term(-(b / N) * math.log(b / N)) for b in n_g.values())
    denom = 0.5 * (hc_fp + hg_fp)
    nmi = 0.0 if denom == 0.0 else mi_fp / denom
    # half-AWAY-from-zero at 6 decimals (DuckDB round semantics; Python's
    # round() is banker's and would disagree on an exact decimal half) —
    # nmi >= 0 here so floor(v + 0.5) is the half-away rule
    nmi_r = math.floor(nmi * 1e6 + 0.5) / 1e6
    return pa.table({
        "n_mentions": pa.array([N], pa.int64()),
        "n_clusters": pa.array([len(n_c)], pa.int64()),
        "n_entities": pa.array([len(n_g)], pa.int64()),
        "mi_fp": pa.array([mi_fp], pa.int64()),
        "h_cluster_fp": pa.array([hc_fp], pa.int64()),
        "h_entity_fp": pa.array([hg_fp], pa.int64()),
        "nmi_r": pa.array([nmi_r], pa.float64()),
    })


def nmi_eval_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin of :func:`nmi_eval`: same cluster CTE chain and
    contingency table; per-term f64 sequence ``(n/N)·ln((N·n)/(a·b))``
    fixed-pointed with ``floor(·1e12 + .5)`` and summed as BIGINT."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    S = "1000000000000.0"

    def fp(expr: str) -> str:
        return f"CAST(floor(({expr}) * {S} + 0.5) AS BIGINT)"

    mi_term = (
        "(CAST(t.ncg AS DOUBLE) / CAST(tot.n AS DOUBLE)) * "
        "ln(CAST(tot.n * t.ncg AS DOUBLE) / CAST(c.n_c * g.n_g AS DOUBLE))"
    )
    hc_term = ("-(CAST(n_c AS DOUBLE) / CAST(tot.n AS DOUBLE)) * "
               "ln(CAST(n_c AS DOUBLE) / CAST(tot.n AS DOUBLE))")
    hg_term = ("-(CAST(n_g AS DOUBLE) / CAST(tot.n AS DOUBLE)) * "
               "ln(CAST(n_g AS DOUBLE) / CAST(tot.n AS DOUBLE))")
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        gmc AS (
          SELECT g.entity_id, c.cluster_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet') g
          JOIN comp c ON g.surface = c.surface),
        cont AS MATERIALIZED (
          SELECT cluster_id, entity_id, count(*) AS ncg
          FROM gmc GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(ncg) AS BIGINT) AS n FROM cont),
        byc AS (SELECT cluster_id, CAST(sum(ncg) AS BIGINT) AS n_c
                FROM cont GROUP BY 1),
        byg AS (SELECT entity_id, CAST(sum(ncg) AS BIGINT) AS n_g
                FROM cont GROUP BY 1),
        mi AS (
          SELECT coalesce(sum({fp(mi_term)}), 0) AS mi_fp
          FROM cont t
          JOIN byc c ON t.cluster_id = c.cluster_id
          JOIN byg g ON t.entity_id = g.entity_id
          CROSS JOIN tot),
        hc AS (SELECT coalesce(sum({fp(hc_term)}), 0) AS hc_fp
               FROM byc CROSS JOIN tot),
        hg AS (SELECT coalesce(sum({fp(hg_term)}), 0) AS hg_fp
               FROM byg CROSS JOIN tot)
        SELECT coalesce(tot.n, 0) AS n_mentions,
               (SELECT CAST(count(*) AS BIGINT) FROM byc) AS n_clusters,
               (SELECT CAST(count(*) AS BIGINT) FROM byg) AS n_entities,
               CAST(mi_fp AS BIGINT) AS mi_fp,
               CAST(hc_fp AS BIGINT) AS h_cluster_fp,
               CAST(hg_fp AS BIGINT) AS h_entity_fp,
               round(CASE WHEN 0.5 * CAST(hc_fp + hg_fp AS DOUBLE) = 0.0
                     THEN 0.0
                     ELSE CAST(mi_fp AS DOUBLE)
                          / (0.5 * CAST(hc_fp + hg_fp AS DOUBLE)) END, 6)
                 AS nmi_r
        FROM mi, hc, hg, tot
    """


def cluster_size_histogram(sf_dir: str):
    """(n_members, n_clusters) — the distribution of flagship cluster
    sizes over the gold-surface domain, the first diagnostic an ER
    practitioner reads (a heavy tail says the threshold is too loose; a
    spike at 1 says blocking recall is the binding constraint).

    Two bounded groupbys: cluster sizes (keyed by cluster id), then the
    histogram over sizes — both aggregate-scale, nothing driver-side.
    """
    from ray.data.aggregate import Count

    from biomedical_el_ray.util import drop_empty_blocks

    pred = linkage_emb_clusters(sf_dir)
    sizes = (
        drop_empty_blocks(pred)
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n_members"))
    )
    hist = (
        drop_empty_blocks(sizes.select_columns(["n_members"]))
        .groupby("n_members")
        .aggregate(Count(alias_name="n_clusters"))
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["n_members"].cast(pa.int64()), t["n_clusters"].cast(pa.int64())],
            names=["n_members", "n_clusters"],
        )

    return hist.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def cluster_representatives(sf_dir: str):
    """(cluster_id, rep_surface, n_members, n_mentions) — survivorship /
    golden-record construction over the flagship clustering: each cluster's
    canonical surface is its most-frequently-mentioned member (ties broken
    by lexicographically smallest surface), the standard "most frequent
    value wins" survivorship rule of record-linkage practice (Christen
    2012 ch. 2; the reference's analog is picking the KB canonical name
    for a linked id, /root/reference/utils_e2e_span.py:25-32).

    Scale shape: mention frequencies are compressed map-side to
    (surface, w) partials before anything moves; one hash-shuffle join
    attaches each surface's cluster id; then ONE keyed repartition on the
    cluster id with an in-task Arrow re-aggregate + sort + run-detection
    argmax.  Rows per task are bounded by cluster size x upstream block
    count (surfaces, never mentions), and only one row per cluster leaves.
    """
    import os

    import pyarrow.compute as pc

    from biomedical_el_ray.sources.readers import read_parquet_spread
    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
    from biomedical_el_ray.util import (
        drop_empty_blocks, ensure_hash_shuffle, shuffle_partitions,
    )

    d = ensure_corpus_for_sf_dir(sf_dir)
    pred = linkage_emb_clusters(sf_dir)
    gm = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"), columns=["surface"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["surface"]).aggregate([([], "count_all")])
        return g.rename_columns(["surface", "w"])

    joined = (
        gm.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .join(
            pred,
            join_type="inner",
            num_partitions=shuffle_partitions(),
            on=("surface",),
        )
        .select_columns(["cluster_id", "surface", "w"])
    )

    def _rep(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("cluster_id", pa.string()), ("rep_surface", pa.string()),
             ("n_members", pa.int64()), ("n_mentions", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        # re-sum the map-side partials (one surface may arrive as several
        # (surface, w) rows from different upstream batches) ...
        t = t.group_by(["cluster_id", "surface"]).aggregate([("w", "sum")])
        # ... then argmax per cluster = first row of each cluster run under
        # (w desc, surface asc) order
        t = t.sort_by([
            ("cluster_id", "ascending"),
            ("w_sum", "descending"),
            ("surface", "ascending"),
        ])
        cid = t["cluster_id"].combine_chunks()
        n = t.num_rows
        brk = np.ones(n, bool)
        brk[1:] = ~pc.equal(
            cid.slice(1), cid.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        members = np.diff(np.append(starts, n)).astype(np.int64)
        w = t["w_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        mentions = np.add.reduceat(w, starts).astype(np.int64)
        return pa.Table.from_arrays(
            [
                cid.take(starts),
                t["surface"].combine_chunks().take(starts),
                pa.array(members),
                pa.array(mentions),
            ],
            schema=schema,
        )

    keyed = ensure_hash_shuffle(drop_empty_blocks(joined))
    return (
        keyed.repartition(shuffle_partitions(), keys=["cluster_id"])
        .map_batches(_rep, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


_FS_PKEY_MIX = np.uint64(0xFE11_E915_0000_0001)

# agreement-level boundaries (level 2 = strong agree, 0 = disagree); jw and
# cos are bit-identical between numpy and DuckDB on the flagship path, so
# thresholding them is oracle-safe
_FS_JW_BANDS = (0.8, 0.94)
_FS_COS_BANDS = (0.6, 0.9)
_FS_LEV_BANDS = (3, 1)  # lev <= 1 -> 2, lev <= 3 -> 1, else 0


def fs_weights(sf_dir: str, max_products: int = 1 << 52):
    """(feature, level, n_match, n_nonmatch, m_r, u_r, lr_r) — Fellegi-
    Sunter match/non-match conditional probabilities and likelihood
    ratios (Fellegi & Sunter 1969; Christen 2012 ch. 6) of the flagship's
    three comparison features (jaro-winkler, levenshtein, embedding
    cosine), each discretized into three agreement levels, estimated from
    the candidate pairs labeled by the gold entity relation (a pair is a
    match iff its surfaces share an entity).  This is the principled
    version of the flagship's hand-set score weights: lr_r = m/u is the
    evidence each agreement level contributes, and a user retunes
    ``PipelineConfig`` weights from this table.

    Population = COMPARED pairs (the candidate set), the standard FS
    estimation frame; blocking recall is measured separately by
    ``linkage_string.blocking_quality``.

    Scale shape: candidate pairs ride the proven exactly-once
    ``generate_pairs`` path with their comparison vector; gold pairs are
    enumerated in-task after ONE keyed repartition on an entity hash;
    labeling is a tagged union + ONE keyed repartition on the pair hash
    with in-task run detection; only per-task 6-bin partial counts per
    feature reach the driver (<= 18 ints/task).  The final probability
    table is 9 rows of driver math on exact integers.
    """
    import os

    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.sources.readers import read_parquet_spread
    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    d = ensure_corpus_for_sf_dir(sf_dir)
    scored, surfaces = _scored_pairs(sf_dir)
    n_surf = surfaces.count()

    names = ["s_lo", "s_hi", "jw", "lev", "cos", "c", "g"]

    def _cand_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t["s_lo"], t["s_hi"], t["jw"],
                pc.cast(t["lev"], pa.int64()), t["cos"],
                pa.array(np.ones(n, np.int8)),
                pa.array(np.zeros(n, np.int8)),
            ],
            names=names,
        )

    gm = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["surface", "entity_id"],
    )

    def _gold_prep(t: pa.Table) -> pa.Table:
        dd = t.group_by(["entity_id", "surface"]).aggregate([])
        ek = hash64_column(dd["entity_id"]).view(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ek, pa.int64()), dd["surface"]],
            names=["ekey", "surface"],
        )

    def _gold_pairs(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.float64()), pa.array([], pa.int64()),
             pa.array([], pa.float64()), pa.array([], pa.int8()),
             pa.array([], pa.int8())],
            names=names,
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("ekey", "ascending"), ("surface", "ascending")])
        ek = t["ekey"].to_numpy(zero_copy_only=False)
        sv = np.asarray(t["surface"].to_pylist(), dtype=object)
        keep = np.ones(len(ek), bool)
        keep[1:] = (ek[1:] != ek[:-1]) | (sv[1:] != sv[:-1])
        ek, sv = ek[keep], sv[keep]
        starts = np.flatnonzero(np.concatenate(([True], ek[1:] != ek[:-1])))
        ends = np.append(starts[1:], len(ek))
        lo_parts, hi_parts = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            lo_parts.append(sv[s + iu])
            hi_parts.append(sv[s + ju])
        if not lo_parts:
            return empty
        lo = np.concatenate(lo_parts)
        hi = np.concatenate(hi_parts)
        n = len(lo)
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.string()), pa.array(hi, pa.string()),
                pa.array(np.zeros(n, np.float64)),
                pa.array(np.zeros(n, np.int64)),
                pa.array(np.zeros(n, np.float64)),
                pa.array(np.zeros(n, np.int8)),
                pa.array(np.ones(n, np.int8)),
            ],
            names=names,
        )

    nparts = shuffle_partitions(rows_hint=n_surf * 4)
    gold = (
        ensure_hash_shuffle(gm.map_batches(
            _gold_prep, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["ekey"])
        .map_batches(_gold_pairs, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    tagged = scored.map_batches(
        _cand_tag, batch_format="pyarrow", zero_copy_batch=True
    ).union(gold)

    def _pkey(t: pa.Table) -> pa.Table:
        pk = (
            hash64_column(pc.binary_join_element_wise(
                t["s_lo"], t["s_hi"], "\x1f"))
            + _FS_PKEY_MIX
        ).view(np.int64)
        return t.append_column("pkey", pa.array(pk, pa.int64()))

    def _partial(t: pa.Table) -> pa.Table:
        # per-task 6-bin (level x label) counts per feature; pkey only
        # routes — run detection is on the actual pair strings
        schema = pa.schema(
            [("feature", pa.string()), ("level", pa.int64()),
             ("ism", pa.int64()), ("n", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("s_lo", "ascending"), ("s_hi", "ascending")])
        lo = np.asarray(t["s_lo"].to_pylist(), dtype=object)
        hi = np.asarray(t["s_hi"].to_pylist(), dtype=object)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = t["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))))
        run_id = np.cumsum(
            np.concatenate(([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])))
        ) - 1
        has_g = np.add.reduceat(g, starts) > 0
        # exactly one candidate row per pair (exactly-once rule); its
        # features are the comparison vector
        cmask = c == 1
        label = has_g[run_id[cmask]].astype(np.int64)
        jw = t["jw"].to_numpy(zero_copy_only=False)[cmask]
        lev = t["lev"].to_numpy(zero_copy_only=False)[cmask]
        cos = t["cos"].to_numpy(zero_copy_only=False)[cmask]
        jwb = (jw >= _FS_JW_BANDS[0]).astype(np.int64) + (jw >= _FS_JW_BANDS[1])
        cosb = (cos >= _FS_COS_BANDS[0]).astype(np.int64) + (cos >= _FS_COS_BANDS[1])
        levb = (lev <= _FS_LEV_BANDS[0]).astype(np.int64) + (lev <= _FS_LEV_BANDS[1])
        feats, levels, isms, ns = [], [], [], []
        for fname, band in (("jw", jwb), ("lev", levb), ("cos", cosb)):
            cnt = np.bincount(band * 2 + label, minlength=6)
            for lv in range(3):
                for lab in range(2):
                    v = int(cnt[lv * 2 + lab])
                    if v:
                        feats.append(fname)
                        levels.append(lv)
                        isms.append(lab)
                        ns.append(v)
        return pa.Table.from_arrays(
            [pa.array(feats, pa.string()), pa.array(levels, pa.int64()),
             pa.array(isms, pa.int64()), pa.array(ns, pa.int64())],
            schema=schema,
        )

    parts = (
        ensure_hash_shuffle(tagged.map_batches(
            _pkey, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["pkey"])
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    counts: dict = {}
    for r in parts:
        k = (r["feature"], int(r["level"]), int(r["ism"]))
        counts[k] = counts.get(k, 0) + int(r["n"])
    nm = sum(v for (f, l, m), v in counts.items() if f == "jw" and m == 1)
    nu = sum(v for (f, l, m), v in counts.items() if f == "jw" and m == 0)
    if nm * nu >= max_products:
        raise ValueError(
            "pair counts too large for double-exact ratio products; "
            "raise max_products only with an exact-rational oracle"
        )
    feats, levels, nms, nus, mrs, urs, lrs = [], [], [], [], [], [], []
    for fname in ("jw", "lev", "cos"):
        for lv in range(3):
            a = counts.get((fname, lv, 1), 0)
            b = counts.get((fname, lv, 0), 0)
            if a == 0 and b == 0:
                continue
            feats.append(fname)
            levels.append(lv)
            nms.append(a)
            nus.append(b)
            mrs.append(round(a / max(nm, 1), 6))
            urs.append(round(b / max(nu, 1), 6))
            lrs.append(
                0.0 if a == 0 or b == 0 else round((a * nu) / (nm * b), 6))
    return pa.table({
        "feature": pa.array(feats, pa.string()),
        "level": pa.array(levels, pa.int64()),
        "n_match": pa.array(nms, pa.int64()),
        "n_nonmatch": pa.array(nus, pa.int64()),
        "m_r": pa.array(mrs, pa.float64()),
        "u_r": pa.array(urs, pa.float64()),
        "lr_r": pa.array(lrs, pa.float64()),
    })


def fs_weights_oracle_sql(corpus_dir: str) -> str:
    jw_lo, jw_hi = _FS_JW_BANDS
    cos_lo, cos_hi = _FS_COS_BANDS
    lev_lo, lev_hi = _FS_LEV_BANDS
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), EMB_CFG)},
        se AS (
          SELECT DISTINCT surface, entity_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        gp AS (
          SELECT DISTINCT a.surface AS s_lo, b.surface AS s_hi
          FROM se a JOIN se b
            ON a.entity_id = b.entity_id AND a.surface < b.surface),
        lab AS (
          SELECT p.jw, p.lev, p.cos,
                 CASE WHEN g.s_lo IS NULL THEN 0 ELSE 1 END AS ism
          FROM lkscored p
          LEFT JOIN gp g ON g.s_lo = p.s_lo AND g.s_hi = p.s_hi),
        b AS (
          SELECT CASE WHEN jw >= {jw_hi} THEN 2
                      WHEN jw >= {jw_lo} THEN 1 ELSE 0 END AS jwb,
                 CASE WHEN lev <= {lev_hi} THEN 2
                      WHEN lev <= {lev_lo} THEN 1 ELSE 0 END AS levb,
                 CASE WHEN cos >= {cos_hi} THEN 2
                      WHEN cos >= {cos_lo} THEN 1 ELSE 0 END AS cosb,
                 ism
          FROM lab),
        u AS (
          SELECT 'jw' AS feature, jwb AS level, ism FROM b
          UNION ALL SELECT 'lev', levb, ism FROM b
          UNION ALL SELECT 'cos', cosb, ism FROM b),
        tot AS (
          SELECT count(*) FILTER (WHERE ism = 1) AS nm,
                 count(*) FILTER (WHERE ism = 0) AS nu
          FROM lab),
        agg AS (
          SELECT feature, level,
                 count(*) FILTER (WHERE ism = 1) AS a,
                 count(*) FILTER (WHERE ism = 0) AS bb
          FROM u GROUP BY 1, 2)
        SELECT feature, CAST(level AS BIGINT) AS level,
               CAST(a AS BIGINT) AS n_match,
               CAST(bb AS BIGINT) AS n_nonmatch,
               round(CAST(a AS DOUBLE) / greatest(nm, 1), 6) AS m_r,
               round(CAST(bb AS DOUBLE) / greatest(nu, 1), 6) AS u_r,
               CASE WHEN a = 0 OR bb = 0 THEN 0.0
                    ELSE round(CAST(a * nu AS DOUBLE)
                               / CAST(nm * bb AS DOUBLE), 6) END AS lr_r
        FROM agg, tot
    """


def comparison_histogram(sf_dir: str):
    """The 27-cell (jw_band, lev_band, cos_band) -> n_pairs histogram of
    the flagship candidate pairs — the sufficient statistic for
    unsupervised FS parameter estimation.  Per-batch bincount partials;
    27 ints per block are all that reach the driver."""
    scored, _ = _scored_pairs(sf_dir)

    def _hist(t: pa.Table) -> pa.Table:
        jw = t["jw"].to_numpy(zero_copy_only=False)
        lev = t["lev"].to_numpy(zero_copy_only=False)
        cos = t["cos"].to_numpy(zero_copy_only=False)
        jwb = (jw >= _FS_JW_BANDS[0]).astype(np.int64) + (jw >= _FS_JW_BANDS[1])
        levb = (lev <= _FS_LEV_BANDS[0]).astype(np.int64) + (lev <= _FS_LEV_BANDS[1])
        cosb = (cos >= _FS_COS_BANDS[0]).astype(np.int64) + (cos >= _FS_COS_BANDS[1])
        cnt = np.bincount(jwb * 9 + levb * 3 + cosb, minlength=27)
        return pa.table({
            "cell": pa.array(np.arange(27, dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    out = np.zeros(27, np.int64)
    for part in scored.map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        out[part["cell"].to_numpy(zero_copy_only=False)] += part[
            "n"].to_numpy(zero_copy_only=False)
    return out


def em_fit(hist, iters: int = 50):
    """Deterministic naive-Bayes EM (Winkler 1988's unsupervised FS fit,
    the algorithm behind Splink's `estimate_parameters_using_em`) over a
    27-cell comparison-vector histogram.  Pure driver math on the bounded
    sufficient statistic — identical at any parallelism.  Returns
    (lambda, m[3][3], u[3][3]) with probabilities clamped to [1e-9, 1]."""
    idx = np.arange(27)
    bands = np.stack([idx // 9, (idx // 3) % 3, idx % 3])  # (3 features, 27)
    n = np.asarray(hist, np.float64)
    total = n.sum()
    if total <= 0:
        raise ValueError("empty comparison histogram")
    lam = 0.1
    # deliberately generic monotone init: matches favor high agreement
    m = np.array([[0.1, 0.3, 0.6]] * 3)
    u = np.array([[0.7, 0.2, 0.1]] * 3)
    for _ in range(iters):
        pm = lam * m[0, bands[0]] * m[1, bands[1]] * m[2, bands[2]]
        pu = (1.0 - lam) * u[0, bands[0]] * u[1, bands[1]] * u[2, bands[2]]
        r = pm / np.maximum(pm + pu, 1e-300)
        wm = n * r
        wu = n * (1.0 - r)
        lam = float(wm.sum() / total)
        for f in range(3):
            for lv in range(3):
                sel = bands[f] == lv
                m[f, lv] = wm[sel].sum() / max(wm.sum(), 1e-300)
                u[f, lv] = wu[sel].sum() / max(wu.sum(), 1e-300)
        m = np.clip(m, 1e-9, 1.0)
        u = np.clip(u, 1e-9, 1.0)
    return lam, m, u


def fs_em_weights(sf_dir: str, iters: int = 50):
    """(feature, level, m_em_r, u_em_r, lr_em_r, lambda_r) — UNSUPERVISED
    Fellegi-Sunter parameter estimates via naive-Bayes EM over the
    flagship comparison vectors, no gold labels consumed — the
    Splink-shaped counterpart of the supervised :func:`fs_weights`
    (which a user without labels cannot run).  Iterative float EM is the
    brief's non-SQL carve-out: registered rows-only, pytest-verified
    against a from-scratch per-pair EM reference and against the
    supervised estimates' evidence directions.

    Scale shape: the ONLY distributed work is the 27-cell histogram
    (per-batch bincount partials); EM is driver math on 27 ints, so cost
    is independent of corpus size given the candidate-pair pass.
    """
    hist = comparison_histogram(sf_dir)
    lam, m, u = em_fit(hist, iters=iters)
    feats, levels, ms, us, lrs = [], [], [], [], []
    for f, fname in enumerate(("jw", "lev", "cos")):
        for lv in range(3):
            feats.append(fname)
            levels.append(lv)
            ms.append(round(float(m[f, lv]), 6))
            us.append(round(float(u[f, lv]), 6))
            lrs.append(round(float(m[f, lv] / max(u[f, lv], 1e-9)), 6))
    return pa.table({
        "feature": pa.array(feats, pa.string()),
        "level": pa.array(levels, pa.int64()),
        "m_em_r": pa.array(ms, pa.float64()),
        "u_em_r": pa.array(us, pa.float64()),
        "lr_em_r": pa.array(lrs, pa.float64()),
        "lambda_r": pa.array([round(lam, 6)] * 9, pa.float64()),
    })


def fs_scores(sf_dir: str):
    """(s_lo, s_hi, jw_level, lev_level, cos_level, match_lr_r) — every
    compared pair scored by the estimated Fellegi-Sunter model (the
    Splink ``predict()`` shape): the pair's three agreement levels looked
    up in the supervised m/u table (:func:`fs_weights`) and its total
    match evidence = the product of the per-feature likelihood ratios
    under the naive-Bayes independence assumption.  The table a reviewer
    thresholds INSTEAD of the hand-set flagship score when labeled data
    exists.

    Scale shape: estimation is :func:`fs_weights` (driver math on
    bounded per-task partial counts); the 9-row weight table broadcasts
    in the closure and applying it is ONE streaming vectorized pass over
    the compared frame — three bincount-band gathers and two f64
    multiplies per pair, no shuffle.  Bit-exactness: each factor is the
    identical round(·, 6) on both sides and the product is the identical
    left-associated f64 multiply sequence.
    """
    weights = fs_weights(sf_dir)
    lr = {
        (f, int(l)): float(v)
        for f, l, v in zip(
            weights["feature"].to_pylist(),
            weights["level"].to_pylist(),
            weights["lr_r"].to_pylist(),
        )
    }
    # levels absent from the table had zero pairs at both labels, so the
    # 0.0 default is never gathered by a real row
    jw_lr = np.array([lr.get(("jw", i), 0.0) for i in range(3)])
    lev_lr = np.array([lr.get(("lev", i), 0.0) for i in range(3)])
    cos_lr = np.array([lr.get(("cos", i), 0.0) for i in range(3)])

    scored, _ = _scored_pairs(sf_dir)

    def _apply(t: pa.Table) -> pa.Table:
        jw = t["jw"].to_numpy(zero_copy_only=False)
        lev = t["lev"].to_numpy(zero_copy_only=False)
        cos = t["cos"].to_numpy(zero_copy_only=False)
        jwb = (jw >= _FS_JW_BANDS[0]).astype(np.int64) + (jw >= _FS_JW_BANDS[1])
        levb = (lev <= _FS_LEV_BANDS[0]).astype(np.int64) + (lev <= _FS_LEV_BANDS[1])
        cosb = (cos >= _FS_COS_BANDS[0]).astype(np.int64) + (cos >= _FS_COS_BANDS[1])
        w = (jw_lr[jwb] * lev_lr[levb]) * cos_lr[cosb]
        return pa.table({
            "s_lo": t["s_lo"],
            "s_hi": t["s_hi"],
            "jw_level": pa.array(jwb),
            "lev_level": pa.array(levb),
            "cos_level": pa.array(cosb),
            "match_lr_r": pa.array(w),
        })

    return scored.map_batches(
        _apply, batch_format="pyarrow", zero_copy_batch=True)


def fs_scores_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: the fs_weights estimation chain kept with pair
    identities, the weight table joined back on each feature's level,
    the identical left-associated ratio product."""
    jw_lo, jw_hi = _FS_JW_BANDS
    cos_lo, cos_hi = _FS_COS_BANDS
    lev_lo, lev_hi = _FS_LEV_BANDS
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), EMB_CFG)},
        se AS (
          SELECT DISTINCT surface, entity_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        gp AS (
          SELECT DISTINCT a.surface AS s_lo, b.surface AS s_hi
          FROM se a JOIN se b
            ON a.entity_id = b.entity_id AND a.surface < b.surface),
        lab AS (
          SELECT p.s_lo, p.s_hi, p.jw, p.lev, p.cos,
                 CASE WHEN g.s_lo IS NULL THEN 0 ELSE 1 END AS ism
          FROM lkscored p
          LEFT JOIN gp g ON g.s_lo = p.s_lo AND g.s_hi = p.s_hi),
        b AS (
          SELECT s_lo, s_hi,
                 CASE WHEN jw >= {jw_hi} THEN 2
                      WHEN jw >= {jw_lo} THEN 1 ELSE 0 END AS jwb,
                 CASE WHEN lev <= {lev_hi} THEN 2
                      WHEN lev <= {lev_lo} THEN 1 ELSE 0 END AS levb,
                 CASE WHEN cos >= {cos_hi} THEN 2
                      WHEN cos >= {cos_lo} THEN 1 ELSE 0 END AS cosb,
                 ism
          FROM lab),
        u AS (
          SELECT 'jw' AS feature, jwb AS level, ism FROM b
          UNION ALL SELECT 'lev', levb, ism FROM b
          UNION ALL SELECT 'cos', cosb, ism FROM b),
        tot AS (
          SELECT count(*) FILTER (WHERE ism = 1) AS nm,
                 count(*) FILTER (WHERE ism = 0) AS nu
          FROM lab),
        agg AS (
          SELECT feature, level,
                 count(*) FILTER (WHERE ism = 1) AS a,
                 count(*) FILTER (WHERE ism = 0) AS bb
          FROM u GROUP BY 1, 2),
        w AS (
          SELECT feature, level,
                 CASE WHEN a = 0 OR bb = 0 THEN 0.0
                      ELSE round(CAST(a * nu AS DOUBLE)
                                 / CAST(nm * bb AS DOUBLE), 6) END AS lr
          FROM agg, tot)
        SELECT b.s_lo, b.s_hi,
               CAST(b.jwb AS BIGINT) AS jw_level,
               CAST(b.levb AS BIGINT) AS lev_level,
               CAST(b.cosb AS BIGINT) AS cos_level,
               (wj.lr * wl.lr) * wc.lr AS match_lr_r
        FROM b
        JOIN w wj ON wj.feature = 'jw' AND wj.level = b.jwb
        JOIN w wl ON wl.feature = 'lev' AND wl.level = b.levb
        JOIN w wc ON wc.feature = 'cos' AND wc.level = b.cosb
    """


# --------------------------------------------------------------------------
# NIL detection + NIL clustering (out-of-KB mention handling)
# --------------------------------------------------------------------------

_NIL_THR = 0.93       # best-KB-similarity below this => mention is NIL
_NIL_EDGE_THR = 0.75  # NIL-domain clustering threshold (looser than the
                      # flagship 0.82: NIL surfaces have no KB anchor, so
                      # the calibrated in-KB threshold over-fragments them)


def nil_clusters(sf_dir: str, nil_thr: float = _NIL_THR,
                 edge_thr: float = _NIL_EDGE_THR):
    """(surface, best_sim_r, cluster_id) — the standard entity-linking
    NIL step: surfaces whose BEST KB candidate scores below ``nil_thr``
    are declared out-of-KB (the reference's threshold-with-fallback
    pruning, /root/reference/run_e2e_span.py:536-544, applied at the KB
    boundary) and then clustered AMONG THEMSELVES with the flagship
    block→pair→score→components chain — NIL clustering, the step that
    turns unlinkable mentions into emergent new-entity candidates
    instead of dropping them.

    Scale shape: the top-1 KB pass is the proven broadcast-KB linker;
    the NIL filter is map-side; the restricted flagship chain runs over
    only the NIL surface domain (cost shrinks with KB coverage); one
    hash join attaches ``best_sim_r`` back to the components.  The
    threshold compares the same round(·, 6) value on both sides.
    """
    import pyarrow.compute as pc

    from biomedical_el_ray.pipelines.linking import _kb_top1
    from biomedical_el_ray.state.unionfind import connected_components
    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    # the rnk=1 slice of the memoized broadcast-KB candidate table (one
    # cross-score execution per session, shared with entity_link_*)
    top1 = _kb_top1(sf_dir)

    def _nil(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.less(t["sim_r"], nil_thr))
        return kept.select(["surface", "sim_r"]).rename_columns(
            ["surface", "best_sim_r"])

    nil = drop_empty_blocks(top1.map_batches(
        _nil, batch_format="pyarrow", zero_copy_batch=True)).materialize()
    # blocking expects (mention_id=surface_id, surface) rows; nil
    # surfaces are already distinct, so just attach the content id
    from biomedical_el_ray.pipelines.linkage import _sid_batch

    surfaces = nil.select_columns(["surface"]).map_batches(
        _sid_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    scored = _scored_pairs_from_surfaces(surfaces)

    def _edges(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["score"], edge_thr))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"])

    edges = scored.map_batches(
        _edges, batch_format="pyarrow", zero_copy_batch=True)
    nodes = surfaces.map_batches(
        lambda t: pa.Table.from_arrays([t["surface"]], names=["node"]),
        batch_format="pyarrow", zero_copy_batch=True)
    comps = connected_components(edges, nodes).map_batches(
        lambda t: t.rename_columns(["surface", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return comps.join(
        nil, "inner", num_partitions=shuffle_partitions(), on=("surface",))


def nil_clusters_oracle_sql(corpus_dir: str,
                            nil_thr: float = _NIL_THR,
                            edge_thr: float = _NIL_EDGE_THR) -> str:
    """DuckDB twin: best-KB-similarity census, the NIL cut, the flagship
    scored-pairs chain restricted to the NIL surface domain, one
    reachability pass."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored "
        f"WHERE score >= {edge_thr}",
        "SELECT surface FROM surf",
    )
    nil_body = f"SELECT surface FROM nilb WHERE best_sim_r < {nil_thr}"
    return f"""
        WITH RECURSIVE nilb AS (
          SELECT s.surface,
                 round(max(jaro_winkler_similarity(s.surface, k.name)), 6)
                   AS best_sim_r
          FROM (SELECT DISTINCT surface
                FROM read_parquet('{corpus_dir}/gold_mentions.parquet')) s
          CROSS JOIN (
            SELECT CASE WHEN length(regexp_extract_all(name, '\\S+')) > 128
                        THEN array_to_string(
                          regexp_extract_all(name, '\\S+')[1:128], ' ')
                        ELSE name END AS name
            FROM read_parquet('{corpus_dir}/entities.parquet')) k
          GROUP BY s.surface),
        {scored_pairs_cte(nil_body, cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s)
        SELECT c.surface, n.best_sim_r, c.cluster_id
        FROM comp c JOIN nilb n ON n.surface = c.surface
    """


_REFINE_SIZE_CAP = 3       # clusters LARGER than this get re-clustered
_REFINE_THR2 = 0.88        # stricter second-pass threshold (base = 0.82)
_REFINE_MAX_OVERSIZED = 1_000_000  # loud driver-side bound on oversized ids


def refine_clusters(sf_dir: str, size_cap: int = _REFINE_SIZE_CAP,
                    thr2: float = _REFINE_THR2):
    """(surface, cluster_id, refined) — two-threshold cluster refinement:
    components larger than ``size_cap`` at the base threshold are
    re-clustered over only their ``score >= thr2`` edges (thr2 stricter
    than the base), while smaller clusters pass through untouched.  This
    is the standard production remedy for transitive-closure giant
    components (a single borderline edge chaining two real entities
    together): tightening the threshold ONLY where the graph is
    suspiciously dense, instead of globally trading recall for it.

    ``refined`` = 1 on rows whose cluster went through the second pass.
    Refined ids cannot collide with untouched ids (every cluster id is
    the min member surface, and membership is disjoint).

    Scale shape: sizes are one bounded groupby; only the OVERSIZED
    cluster ids (loudly capped at ``_REFINE_MAX_OVERSIZED``) come to the
    driver and are broadcast back; members/edges of oversized clusters
    are selected by broadcast-set filters (no extra shuffle); the second
    components pass runs on the strict-edge subgraph only.
    """
    import ray

    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from biomedical_el_ray.state.unionfind import connected_components
    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    scored, _surfaces = _scored_pairs(sf_dir)

    # base pass = the memoized flagship cluster map (one components run
    # per session, shared with every other cluster consumer)
    comp1 = _cluster_map(sf_dir)

    oversized_rows = (
        drop_empty_blocks(comp1)
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n"))
        .filter(expr=f"n > {int(size_cap)}")
        .take_all()
    )
    if len(oversized_rows) > _REFINE_MAX_OVERSIZED:
        raise ValueError(
            f"{len(oversized_rows)} oversized clusters exceed the "
            f"driver-side bound {_REFINE_MAX_OVERSIZED}; raise it explicitly"
        )
    oversized = {r["cluster_id"] for r in oversized_rows}
    if not oversized:
        return comp1.map_batches(
            lambda t: t.append_column(
                "refined", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    over_ref = ray.put(oversized)

    def _keep_small(t: pa.Table) -> pa.Table:
        ov = pa.array(sorted(ray.get(over_ref)), pa.string())
        kept = t.filter(pc.invert(pc.is_in(t["cluster_id"], value_set=ov)))
        return kept.append_column(
            "refined", pa.array(np.zeros(kept.num_rows, np.int64)))

    def _member_nodes(t: pa.Table) -> pa.Table:
        ov = pa.array(sorted(ray.get(over_ref)), pa.string())
        kept = t.filter(pc.is_in(t["cluster_id"], value_set=ov))
        return pa.Table.from_arrays([kept["surface"]], names=["node"])

    small = comp1.map_batches(
        _keep_small, batch_format="pyarrow", zero_copy_batch=True)
    nodes2 = comp1.map_batches(
        _member_nodes, batch_format="pyarrow", zero_copy_batch=True)

    # strict edges restricted to oversized-cluster members: an edge's two
    # endpoints always share a component, so testing s_lo's membership via
    # the surface->cluster join is equivalent; we avoid that join entirely
    # by testing against the (broadcast) member set of oversized clusters
    nodes2 = nodes2.materialize()
    if nodes2.count() > _REFINE_MAX_OVERSIZED:
        raise ValueError(
            "oversized-cluster membership exceeds the driver-side bound; "
            "switch refine_clusters to the join plan for this corpus"
        )
    members_ref = ray.put(set(nodes2.to_pandas()["node"]))

    def _strict_edges(t: pa.Table) -> pa.Table:
        mem = pa.array(sorted(ray.get(members_ref)), pa.string())
        kept = t.filter(pc.greater_equal(t["score"], thr2))
        kept = kept.filter(pc.is_in(kept["s_lo"], value_set=mem))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"])

    comp2 = connected_components(
        scored.map_batches(_strict_edges, batch_format="pyarrow",
                           zero_copy_batch=True),
        nodes2,
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column(0), t.column(1),
             pa.array(np.ones(t.num_rows, np.int64))],
            names=["surface", "cluster_id", "refined"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return small.union(comp2)


def refine_clusters_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    thr1, thr2, cap = cfg.score_threshold, _REFINE_THR2, _REFINE_SIZE_CAP
    reach1 = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {thr1}",
        "SELECT surface FROM surf",
    )
    reach2 = reachability_cte(
        f"""SELECT p.s_lo AS a, p.s_hi AS b FROM lkscored p
            JOIN ov1 o ON o.surface = p.s_lo
            WHERE p.score >= {thr2}""",
        "SELECT surface FROM ov1",
        prefix="r2",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach1},
        comp1 AS MATERIALIZED (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        sz AS (
          SELECT cluster_id, count(*) AS n FROM comp1 GROUP BY cluster_id),
        ov1 AS MATERIALIZED (
          SELECT c.surface, c.cluster_id
          FROM comp1 c JOIN sz ON sz.cluster_id = c.cluster_id
          WHERE sz.n > {cap}),
        {reach2},
        comp2 AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM r2reach GROUP BY s)
        SELECT c.surface, c.cluster_id, CAST(0 AS BIGINT) AS refined
        FROM comp1 c JOIN sz ON sz.cluster_id = c.cluster_id
        WHERE sz.n <= {cap}
        UNION ALL
        SELECT surface, cluster_id, CAST(1 AS BIGINT) AS refined
        FROM comp2
    """


_INC_NEW_PREFIX = "d0"     # md5 2-hex prefix >= this => the NEW batch (~19%)
_INC_MAX_BATCH = 2_000_000  # loud driver-side bound on the new-batch size


def linkage_incremental(sf_dir: str):
    """(surface, cluster_id, src) — incremental ER of a NEW surface batch
    against a FROZEN clustered base (the master-file linkage shape of
    continuous ingestion, the flagship twin of
    ``dedup.near_dedup_incremental``):

    * ``src='base'``: base surfaces keep their base-only clustering
      (components over base-base edges) — existing cluster ids never
      change when a batch arrives;
    * ``src='attached'``: a new surface with at least one threshold edge
      into the base joins the smallest linked base cluster;
    * ``src='new'``: remaining new surfaces cluster among themselves
      (components over their residual new-new edges).

    The batch membership is a pure function of the surface (md5-prefix
    split, the repo's deterministic-split convention), so the result is
    identical at any parallelism.

    Scale shape: the new batch is bounded BY DESIGN (continuous
    ingestion) — it is collected under a loud ``_INC_MAX_BATCH`` cap and
    broadcast once via ``ray.put``; every edge/node classification is a
    vectorized ``pc.is_in`` against it (cost scales with the batch, not
    the base); attachment is one hash-shuffle join to the base cluster
    map + one bounded groupby-min; the base components pass is the same
    work the base corpus already required.
    """
    import ray

    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from biomedical_el_ray.pipelines.sampling import md5_prefix
    from biomedical_el_ray.state.unionfind import connected_components
    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    scored, surfaces = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold
    scored = scored.materialize()

    def _new_only(t: pa.Table) -> pa.Table:
        h2 = md5_prefix(t["surface"].to_pylist())
        mask = pa.array([h >= _INC_NEW_PREFIX for h in h2])
        return pa.Table.from_arrays(
            [t.filter(mask)["surface"]], names=["surface"])

    new_tbl = surfaces.map_batches(
        _new_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if new_tbl.count() > _INC_MAX_BATCH:
        raise ValueError(
            f"new batch exceeds _INC_MAX_BATCH={_INC_MAX_BATCH}; "
            "ingest in smaller batches or raise the bound explicitly"
        )
    new_arr = pa.array(sorted(new_tbl.to_pandas()["surface"]), pa.string())
    new_ref = ray.put(new_arr)

    def _is_new(col):
        return pc.is_in(col, value_set=ray.get(new_ref))

    def _base_nodes(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.invert(_is_new(t["surface"])))
        return pa.Table.from_arrays([kept["surface"]], names=["node"])

    def _base_edges(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["score"], thr))
        kept = kept.filter(pc.and_(
            pc.invert(_is_new(kept["s_lo"])),
            pc.invert(_is_new(kept["s_hi"]))))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"])

    bcomp = connected_components(
        scored.map_batches(_base_edges, batch_format="pyarrow",
                           zero_copy_batch=True),
        surfaces.map_batches(_base_nodes, batch_format="pyarrow",
                             zero_copy_batch=True),
    ).map_batches(
        lambda t: t.rename_columns(["surface", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def _cross_edges(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["score"], thr))
        lo_new = _is_new(kept["s_lo"])
        hi_new = _is_new(kept["s_hi"])
        a = kept.filter(pc.and_(pc.invert(lo_new), hi_new))      # base, new
        b = kept.filter(pc.and_(lo_new, pc.invert(hi_new)))      # new, base
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([
                    a["s_lo"].combine_chunks(), b["s_hi"].combine_chunks()]),
                pa.concat_arrays([
                    a["s_hi"].combine_chunks(), b["s_lo"].combine_chunks()]),
            ],
            names=["base_surface", "new_surface"],
        )

    cross = scored.map_batches(
        _cross_edges, batch_format="pyarrow", zero_copy_batch=True)
    att = (
        drop_empty_blocks(cross)
        .join(
            bcomp.map_batches(
                lambda t: t.rename_columns(["base_surface", "cluster_id"]),
                batch_format="pyarrow", zero_copy_batch=True),
            join_type="inner",
            num_partitions=shuffle_partitions(),
            on=("base_surface",),
        )
        .groupby("new_surface")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .materialize()
    )
    attached = set(att.to_pandas()["new_surface"])  # bounded by the batch
    unatt = [s for s in new_arr.to_pylist() if s not in attached]
    unatt_arr = pa.array(unatt, pa.string())
    unatt_ref = ray.put(unatt_arr)

    def _resid_edges(t: pa.Table) -> pa.Table:
        ua = ray.get(unatt_ref)
        kept = t.filter(pc.greater_equal(t["score"], thr))
        kept = kept.filter(pc.and_(
            pc.is_in(kept["s_lo"], value_set=ua),
            pc.is_in(kept["s_hi"], value_set=ua)))
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"]], names=["src", "dst"])

    import ray.data as rd
    ncomp = connected_components(
        scored.map_batches(_resid_edges, batch_format="pyarrow",
                           zero_copy_batch=True),
        rd.from_arrow(pa.table({"node": unatt_arr})),
    ).map_batches(
        lambda t: t.rename_columns(["surface", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _tag(src_label):
        def _f(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t["surface"], t["cluster_id"],
                 pa.array([src_label] * t.num_rows, pa.string())],
                names=["surface", "cluster_id", "src"],
            )
        return _f

    att_rows = att.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["new_surface"], t["cluster_id"],
             pa.array(["attached"] * t.num_rows, pa.string())],
            names=["surface", "cluster_id", "src"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return (
        bcomp.map_batches(_tag("base"), batch_format="pyarrow",
                          zero_copy_batch=True)
        .union(drop_empty_blocks(att_rows))
        .union(ncomp.map_batches(_tag("new"), batch_format="pyarrow",
                                 zero_copy_batch=True))
    )


def linkage_incremental_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    thr = cfg.score_threshold
    pfx = _INC_NEW_PREFIX
    reach_b = reachability_cte(
        f"""SELECT e.s_lo AS a, e.s_hi AS b FROM lkscored e
            WHERE e.score >= {thr}
              AND substr(md5(e.s_lo), 1, 2) < '{pfx}'
              AND substr(md5(e.s_hi), 1, 2) < '{pfx}'""",
        f"SELECT surface FROM surf WHERE substr(md5(surface), 1, 2) < '{pfx}'",
    )
    reach_n = reachability_cte(
        """SELECT e.s_lo AS a, e.s_hi AS b FROM lkscored e
           JOIN unatt x ON x.surface = e.s_lo
           JOIN unatt y ON y.surface = e.s_hi
           WHERE e.score >= """ + str(thr),
        "SELECT surface FROM unatt",
        prefix="n2",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach_b},
        bcomp AS MATERIALIZED (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        cross_e AS (
          SELECT e.s_lo AS base_surface, e.s_hi AS new_surface
          FROM lkscored e
          WHERE e.score >= {thr}
            AND substr(md5(e.s_lo), 1, 2) < '{pfx}'
            AND substr(md5(e.s_hi), 1, 2) >= '{pfx}'
          UNION ALL
          SELECT e.s_hi, e.s_lo
          FROM lkscored e
          WHERE e.score >= {thr}
            AND substr(md5(e.s_hi), 1, 2) < '{pfx}'
            AND substr(md5(e.s_lo), 1, 2) >= '{pfx}'),
        att AS MATERIALIZED (
          SELECT c.new_surface AS surface, min(b.cluster_id) AS cluster_id
          FROM cross_e c JOIN bcomp b ON b.surface = c.base_surface
          GROUP BY c.new_surface),
        unatt AS MATERIALIZED (
          SELECT surface FROM surf
          WHERE substr(md5(surface), 1, 2) >= '{pfx}'
            AND surface NOT IN (SELECT surface FROM att)),
        {reach_n},
        ncomp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM n2reach GROUP BY s)
        SELECT surface, cluster_id, 'base' AS src FROM bcomp
        UNION ALL
        SELECT surface, cluster_id, 'attached' AS src FROM att
        UNION ALL
        SELECT surface, cluster_id, 'new' AS src FROM ncomp
    """


def cluster_representatives_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        freq AS (
          SELECT surface, count(*) AS w
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')
          GROUP BY surface),
        ranked AS (
          SELECT c.cluster_id, c.surface, f.w,
                 row_number() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY f.w DESC, c.surface) AS rn,
                 count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
                 sum(f.w) OVER (PARTITION BY c.cluster_id) AS n_mentions
          FROM comp c JOIN freq f ON f.surface = c.surface)
        SELECT cluster_id, surface AS rep_surface,
               CAST(n_members AS BIGINT) AS n_members,
               CAST(n_mentions AS BIGINT) AS n_mentions
        FROM ranked WHERE rn = 1
    """


def cluster_size_histogram_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        sz AS (
          SELECT cluster_id, count(*) AS n_members
          FROM comp GROUP BY cluster_id)
        SELECT CAST(n_members AS BIGINT) AS n_members,
               count(*) AS n_clusters
        FROM sz GROUP BY n_members
    """


# ---------------------------------------------------------------------------
# Similarity-graph diagnostics (degree profile + distributed triangle count)
# ---------------------------------------------------------------------------

_GRAPH_MAX_NODES = 5_000_000
_GRAPH_MAX_OUT_DEGREE = 20_000


def _graph_edges(sf_dir: str):
    """(a, b) threshold edges of the full-score flagship, a < b distinct."""
    import pyarrow.compute as pc

    scored, _ = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold

    def _e(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["score"], thr))
        return pa.Table.from_arrays([kept["s_lo"], kept["s_hi"]],
                                    names=["a", "b"])

    return scored.map_batches(_e, batch_format="pyarrow", zero_copy_batch=True)


def _deg_partial(t: pa.Table) -> pa.Table:
    v = pa.concat_arrays([
        t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"],
        t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"],
    ])
    g = pa.table({"node": v}).group_by("node").aggregate([([], "count_all")])
    return g.rename_columns(["node", "d"])


def _orient_batch(t: pa.Table, deg_ref) -> pa.Table:
    """Orient each edge from its (degree, hash-id)-smaller endpoint — the
    compact-forward orientation that bounds every node's out-degree by
    ~sqrt(2·m), so wedge enumeration never explodes at hubs."""
    import ray

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ref_key, worker_state

    keys, degs = worker_state(
        ("graph_degs", ref_key(deg_ref)), lambda: ray.get(deg_ref))
    ka = hash64_column(t["a"]).view(np.int64)
    kb = hash64_column(t["b"]).view(np.int64)
    da = degs[np.searchsorted(keys, ka)]
    db = degs[np.searchsorted(keys, kb)]
    a_first = (da < db) | ((da == db) & (ka < kb))
    av = np.asarray(t["a"].to_pylist(), dtype=object)
    bv = np.asarray(t["b"].to_pylist(), dtype=object)
    u = np.where(a_first, av, bv)
    v = np.where(a_first, bv, av)
    uk = np.where(a_first, ka, kb)
    return pa.Table.from_arrays(
        [pa.array(uk, pa.int64()), pa.array(u, pa.string()),
         pa.array(v, pa.string())],
        names=["uk", "u", "v"],
    )


_WEDGE_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()), ("kind", pa.int8())])


def _wedge_partition(t: pa.Table, max_out_degree: int) -> pa.Table:
    """All out-neighbor pairs of every center node in this hash partition
    (the keyed repartition on ``uk`` co-locates a node's out-edges),
    canonicalized to string order so they key like the edge rows."""
    if t.num_rows == 0:
        return _WEDGE_SCHEMA.empty_table()
    t = t.sort_by([("uk", "ascending"), ("v", "ascending")])
    uk = t["uk"].to_numpy(zero_copy_only=False)
    vv = np.asarray(t["v"].to_pylist(), dtype=object)
    starts = np.flatnonzero(np.concatenate(([True], uk[1:] != uk[:-1])))
    ends = np.append(starts[1:], uk.size)
    lo_parts, hi_parts = [], []
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        if k > max_out_degree:
            raise ValueError(
                f"oriented out-degree {k} exceeds max_out_degree="
                f"{max_out_degree} — the (degree, id) orientation bounds "
                "this by ~sqrt(2m); raise the cap explicitly for a graph "
                "this dense")
        iu, ju = np.triu_indices(k, 1)
        lo_parts.append(vv[s + iu])
        hi_parts.append(vv[s + ju])
    if not lo_parts:
        return _WEDGE_SCHEMA.empty_table()
    lo = np.concatenate(lo_parts)
    hi = np.concatenate(hi_parts)
    swap = lo > hi
    lo, hi = np.where(swap, hi, lo), np.where(swap, lo, hi)
    return pa.Table.from_arrays(
        [pa.array(lo, pa.string()), pa.array(hi, pa.string()),
         pa.array(np.ones(lo.size, np.int8))],
        names=["x", "y", "kind"],
    )


def _tri_partial(t: pa.Table) -> pa.Table:
    """Triangles closed in this pair-hash partition: wedge rows whose
    (x, y) run also contains an edge row."""
    if t.num_rows == 0:
        return pa.table({"nt": pa.array([0], pa.int64())})
    t = t.sort_by([("x", "ascending"), ("y", "ascending")])
    x = np.asarray(t["x"].to_pylist(), dtype=object)
    y = np.asarray(t["y"].to_pylist(), dtype=object)
    kind = t["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.flatnonzero(
        np.concatenate(([True], (x[1:] != x[:-1]) | (y[1:] != y[:-1]))))
    n_wedge = np.add.reduceat(kind, starts)
    has_edge = np.add.reduceat(1 - kind, starts) > 0
    return pa.table({"nt": pa.array([int(n_wedge[has_edge].sum())], pa.int64())})


def graph_stats(sf_dir: str, max_nodes: int = _GRAPH_MAX_NODES,
                max_out_degree: int = _GRAPH_MAX_OUT_DEGREE):
    """One-row structural profile of the flagship's threshold similarity
    graph: node/edge counts, exact triangle count, wedge count
    (Σ C(deg, 2)), max degree and the global clustering coefficient
    3·triangles / wedges — the diagnostics that tell an ER practitioner
    whether the edge threshold yields tight cliques (high clustering:
    safe to transitively close) or sprawling hubs (low clustering +
    a high max degree: expect giant components, reach for
    ``refine_clusters``).

    Distributed triangle counting, compact-forward shape (Chiba-Nishizeki
    / Cohen's MapReduce variant): degrees from per-batch Arrow hash
    partials + one bounded groupby (collected under a loud ``max_nodes``
    cap and broadcast once via ``ray.put``); every edge is oriented from
    its (degree, id)-smaller endpoint, which provably bounds out-degrees
    by ~sqrt(2m); ONE keyed repartition on the center node enumerates
    wedges in-task (loud ``max_out_degree`` guard, never silent); wedges
    + edges then ride the tagged-union pair-hash census of
    ``blocking_quality`` — only per-partition triangle counts reach the
    driver.  Every count is an exact integer; the clustering coefficient
    is ONE f64 division on both sides.
    """
    import ray

    from biomedical_el_ray.util import (
        drop_empty_blocks,
        ensure_hash_shuffle,
        shuffle_partitions,
    )

    edges = _graph_edges(sf_dir).materialize()
    deg_rows = (
        drop_empty_blocks(edges.map_batches(
            _deg_partial, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("node").sum("d").take_all()
    )
    if len(deg_rows) > max_nodes:
        raise ValueError(
            f"graph has {len(deg_rows)} nodes (> max_nodes={max_nodes}); "
            "swap the broadcast degree table for the two hash-shuffle "
            "join plan before raising the cap")
    from biomedical_el_ray.functions.hashing import hash64_column

    n_edges = edges.count()
    n_nodes = len(deg_rows)
    degs_py = {r["node"]: int(r["sum(d)"]) for r in deg_rows}
    max_deg = max(degs_py.values(), default=0)
    n_wedges = sum(d * (d - 1) // 2 for d in degs_py.values())
    if n_nodes:
        karr = hash64_column(pa.array(list(degs_py), pa.string())).view(np.int64)
        order = np.argsort(karr)
        keys = karr[order]
        darr = np.fromiter(degs_py.values(), dtype=np.int64,
                           count=n_nodes)[order]
    else:
        keys = np.empty(0, np.int64)
        darr = np.empty(0, np.int64)
    deg_ref = ray.put((keys, darr))

    nparts = shuffle_partitions(rows_hint=n_edges)
    wedges = (
        ensure_hash_shuffle(edges.map_batches(
            _orient_batch, fn_kwargs={"deg_ref": deg_ref},
            batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["uk"])
        .map_batches(_wedge_partition,
                     fn_kwargs={"max_out_degree": max_out_degree},
                     batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )
    tagged = wedges.union(edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["a"], t["b"],
             pa.array(np.zeros(t.num_rows, np.int8))],
            names=["x", "y", "kind"]),
        batch_format="pyarrow", zero_copy_batch=True))

    def _pkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pk = hash64_column(pc.binary_join_element_wise(
            t["x"], t["y"], "\x1f")).view(np.int64)
        return t.append_column("pkey", pa.array(pk, pa.int64()))

    parts = (
        ensure_hash_shuffle(tagged.map_batches(
            _pkey, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["pkey"])
        .map_batches(_tri_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    n_tri = sum(r["nt"] for r in parts)
    cc = 0.0 if n_wedges == 0 else (3.0 * float(n_tri)) / float(n_wedges)
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "max_degree": pa.array([max_deg], pa.int64()),
        "clustering_r": pa.array([round(cc, 6)], pa.float64()),
    })


def graph_stats_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: canonical-edge triple join for triangles (each
    triangle {x<y<z} matches exactly once as (x,y),(x,z),(y,z)), degree
    profile from the endpoint union."""
    cfg = EMB_CFG
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        e AS (
          SELECT s_lo AS a, s_hi AS b FROM lkscored
          WHERE score >= {cfg.score_threshold}),
        deg AS (
          SELECT v, count(*) AS d
          FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          GROUP BY v),
        tri AS (
          SELECT count(*) AS t
          FROM e e1
          JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        w AS (
          SELECT coalesce(sum(CAST(d AS HUGEINT) * (d - 1) // 2), 0) AS nw,
                 coalesce(max(d), 0) AS md,
                 count(*) AS nn
          FROM deg)
        SELECT CAST(nn AS BIGINT) AS n_nodes,
               (SELECT count(*) FROM e) AS n_edges,
               CAST(t AS BIGINT) AS n_triangles,
               CAST(nw AS BIGINT) AS n_wedges,
               CAST(md AS BIGINT) AS max_degree,
               round(CASE WHEN nw = 0 THEN 0.0
                     ELSE (3.0 * CAST(t AS DOUBLE)) / CAST(nw AS DOUBLE)
                     END, 6) AS clustering_r
        FROM tri, w
    """


# ---------------------------------------------------------------------------
# PageRank over the similarity graph (fixed-iteration, fixed-point)
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3


def pagerank(sf_dir: str, iters: int = _PR_ITERS, scale: int = _PR_SCALE):
    """(surface, pr) — PageRank over the flagship's threshold similarity
    graph (undirected edges walked both ways, damping 0.85, uniform
    teleport over the graph's nodes), the canonical importance score for
    picking cluster exemplars and spotting hub surfaces that
    ``graph_stats`` flags.  A FIXED iteration count (default 3) with
    all-integer fixed-point arithmetic (``scale`` = 1e12): every node
    starts at ``scale // n``; each round a node keeps
    ``scale·15 // (100·n)`` teleport mass plus the floor-divided shares
    ``85·p(u) // (100·deg(u))`` of its neighbors — deterministic in any
    combine order (integer sums), so the unrolled DuckDB twin is
    bit-exact.  Every node has degree >= 1 by construction (edge
    endpoints), so there is no dangling-mass term.

    Scale shape — the union-find iteration pattern: the bidirectional
    edge list materializes ONCE; each round is one hash-shuffle join
    (state onto edge sources) + one bounded groupby-sum (per-node
    in-mass) + one join back onto the static degree table; the driver
    never holds node state, only the loop counter.
    """
    import pyarrow.compute as pc

    from biomedical_el_ray.util import (
        drop_empty_blocks,
        shuffle_partitions,
    )

    edges = _graph_edges(sf_dir).materialize()

    def _bidir(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    bidir = edges.map_batches(
        _bidir, batch_format="pyarrow", zero_copy_batch=True).materialize()
    deg = drop_empty_blocks(
        edges.map_batches(_deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("node").sum("d")
    ).map_batches(
        lambda t: t.rename_columns(["node", "d"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    n = deg.count()
    if n == 0:
        return pa.table({"surface": pa.array([], pa.string()),
                         "pr": pa.array([], pa.int64())})
    p0 = scale // n
    base = scale * 15 // (100 * n)
    nparts = shuffle_partitions(rows_hint=n)
    state = deg.map_batches(
        lambda t: t.append_column(
            "p", pa.array(np.full(t.num_rows, p0, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        joined = bidir.join(
            state.select_columns(["node", "d", "p"]),
            join_type="inner",
            num_partitions=nparts,
            on=("src",),
            right_on=("node",),
        )

        def _contrib(t: pa.Table) -> pa.Table:
            p = t["p"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            return pa.table({
                "dst": t["dst"].combine_chunks()
                if isinstance(t["dst"], pa.ChunkedArray) else t["dst"],
                "c": pa.array(85 * p // (100 * d)),
            })

        sums = drop_empty_blocks(
            drop_empty_blocks(joined.select_columns(["dst", "p", "d"])
                              .map_batches(_contrib, batch_format="pyarrow",
                                           zero_copy_batch=True))
            .groupby("dst").sum("c")
        )
        merged = deg.join(
            sums,
            join_type="left_outer",
            num_partitions=nparts,
            on=("node",),
            right_on=("dst",),
        )

        def _apply(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t["sum(c)"], 0).to_numpy(zero_copy_only=False)
            return pa.table({
                "node": t["node"].combine_chunks()
                if isinstance(t["node"], pa.ChunkedArray) else t["node"],
                "d": t["d"].combine_chunks()
                if isinstance(t["d"], pa.ChunkedArray) else t["d"],
                "p": pa.array(base + s.astype(np.int64)),
            })

        state = drop_empty_blocks(merged).map_batches(
            _apply, batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()

    return state.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["node"], t["p"]], names=["surface", "pr"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def pagerank_oracle_sql(corpus_dir: str, iters: int = _PR_ITERS,
                        scale: int = _PR_SCALE) -> str:
    """DuckDB twin: the iteration unrolled (fixed count), every state CTE
    MATERIALIZED (each is referenced twice per round — plain CTEs would
    re-evaluate the whole chain exponentially)."""
    cfg = EMB_CFG
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""pr{i} AS MATERIALIZED (
          SELECT t.v, t.d,
                 {scale} * 15 // (100 * c.n) + coalesce(s.s, 0) AS p
          FROM pr{i - 1} t
          CROSS JOIN prc c
          LEFT JOIN (
            SELECT e2.dst AS v, sum(85 * u.p // (100 * u.d)) AS s
            FROM e2 JOIN pr{i - 1} u ON u.v = e2.src
            GROUP BY 1) s ON s.v = t.v)""")
    chain = ",\n        ".join(rounds)
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        e AS (
          SELECT s_lo AS a, s_hi AS b FROM lkscored
          WHERE score >= {cfg.score_threshold}),
        e2 AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e
          UNION ALL
          SELECT b AS src, a AS dst FROM e),
        pdeg AS (SELECT src AS v, count(*) AS d FROM e2 GROUP BY 1),
        prc AS (SELECT count(*) AS n FROM pdeg),
        pr0 AS MATERIALIZED (
          SELECT v, d, {scale} // c.n AS p FROM pdeg CROSS JOIN prc c),
        {chain}
        SELECT v AS surface, CAST(p AS BIGINT) AS pr FROM pr{iters}
    """


# ---------------------------------------------------------------------------
# Threshold sweep: P/R/F1 of the edge decision across a threshold grid
# ---------------------------------------------------------------------------

_TS_GRID = (70, 75, 80, 82, 85, 90)
_TS_PKEY_MIX = np.uint64(0x7513_3EE9_0000_0001)


def threshold_sweep(sf_dir: str, grid: tuple = _TS_GRID):
    """(thr_pct, n_pred, n_tp, n_gold, precision_r, recall_r, f1_r) —
    pairwise edge precision/recall/F1 at each candidate score threshold:
    the calibration curve a practitioner reads before pinning
    ``PipelineConfig.score_threshold`` (the flagship ships 0.82; this
    query shows what 0.70–0.90 would trade).  Population = COMPARED
    pairs, the FS estimation frame of :func:`fs_weights`; blocking
    recall is ``blocking_quality``'s job.

    Scale shape: the ``fs_weights`` tagged-union pair-hash census —
    scored pairs with their f64 score + in-task-enumerated gold pairs,
    ONE keyed repartition, run detection on the pair strings — but the
    per-task partial here is one (|grid| + 1)-row count vector
    (predicted / true-positive per threshold, compared-gold total), so
    only ~7 rows per task reach the driver.  Thresholds compare as the
    identical f64 division ``t / 100.0`` on both sides; counts are exact
    integers; the three ratios are single f64 divisions.
    """
    import os

    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.sources.readers import read_parquet_spread
    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    d = ensure_corpus_for_sf_dir(sf_dir)
    scored, surfaces = _scored_pairs(sf_dir)
    n_surf = surfaces.count()
    names = ["s_lo", "s_hi", "score", "c", "g"]

    def _cand_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t["s_lo"], t["s_hi"], t["score"],
             pa.array(np.ones(n, np.int8)),
             pa.array(np.zeros(n, np.int8))],
            names=names,
        )

    gm = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["surface", "entity_id"],
    )

    def _gold_prep(t: pa.Table) -> pa.Table:
        dd = t.group_by(["entity_id", "surface"]).aggregate([])
        ek = hash64_column(dd["entity_id"]).view(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ek, pa.int64()), dd["surface"]],
            names=["ekey", "surface"],
        )

    def _gold_pairs(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.float64()), pa.array([], pa.int8()),
             pa.array([], pa.int8())],
            names=names,
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("ekey", "ascending"), ("surface", "ascending")])
        ek = t["ekey"].to_numpy(zero_copy_only=False)
        sv = np.asarray(t["surface"].to_pylist(), dtype=object)
        keep = np.ones(len(ek), bool)
        keep[1:] = (ek[1:] != ek[:-1]) | (sv[1:] != sv[:-1])
        ek, sv = ek[keep], sv[keep]
        starts = np.flatnonzero(np.concatenate(([True], ek[1:] != ek[:-1])))
        ends = np.append(starts[1:], len(ek))
        lo_parts, hi_parts = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            lo_parts.append(sv[s + iu])
            hi_parts.append(sv[s + ju])
        if not lo_parts:
            return empty
        lo = np.concatenate(lo_parts)
        hi = np.concatenate(hi_parts)
        n = len(lo)
        return pa.Table.from_arrays(
            [pa.array(lo, pa.string()), pa.array(hi, pa.string()),
             pa.array(np.zeros(n, np.float64)),
             pa.array(np.zeros(n, np.int8)),
             pa.array(np.ones(n, np.int8))],
            names=names,
        )

    nparts = shuffle_partitions(rows_hint=n_surf * 4)
    gold = (
        ensure_hash_shuffle(gm.map_batches(
            _gold_prep, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["ekey"])
        .map_batches(_gold_pairs, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    tagged = scored.map_batches(
        lambda t: _cand_tag(t), batch_format="pyarrow", zero_copy_batch=True
    ).union(gold)

    def _pkey(t: pa.Table) -> pa.Table:
        pk = (
            hash64_column(pc.binary_join_element_wise(
                t["s_lo"], t["s_hi"], "\x1f"))
            + _TS_PKEY_MIX
        ).view(np.int64)
        return t.append_column("pkey", pa.array(pk, pa.int64()))

    thr = np.array(grid, dtype=np.int64)
    thr_f = thr / 100.0

    def _partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("thr_pct", pa.int64()), ("np_", pa.int64()),
             ("tp", pa.int64()), ("ng", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("s_lo", "ascending"), ("s_hi", "ascending")])
        lo = np.asarray(t["s_lo"].to_pylist(), dtype=object)
        hi = np.asarray(t["s_hi"].to_pylist(), dtype=object)
        sc = t["score"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = t["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))))
        has_c = np.add.reduceat(c, starts) > 0
        has_g = np.add.reduceat(g, starts) > 0
        # the scored row's score per run (gold-tag rows carry 0; a run
        # has at most one scored row, so max-with-weights recovers it)
        run_score = np.maximum.reduceat(np.where(c > 0, sc, -1.0), starts)
        sc_runs = run_score[has_c]
        gold_runs = has_g[has_c]
        pred = sc_runs[None, :] >= thr_f[:, None]
        n_pred = pred.sum(axis=1).astype(np.int64)
        n_tp = (pred & gold_runs[None, :]).sum(axis=1).astype(np.int64)
        ng = int((has_c & has_g).sum())
        return pa.table({
            "thr_pct": pa.array(thr),
            "np_": pa.array(n_pred),
            "tp": pa.array(n_tp),
            "ng": pa.array(np.full(thr.size, ng, dtype=np.int64)),
        })

    parts = (
        ensure_hash_shuffle(tagged.map_batches(
            _pkey, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(nparts, keys=["pkey"])
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    agg = {int(t): [0, 0, 0] for t in thr}
    for r in parts:
        a = agg[int(r["thr_pct"])]
        a[0] += int(r["np_"])
        a[1] += int(r["tp"])
        a[2] += int(r["ng"])
    rows = []
    for t in thr:
        n_pred, tp, ng = agg[int(t)]
        p = tp / max(n_pred, 1)
        r_ = tp / max(ng, 1)
        f1 = 0.0 if tp == 0 else 2.0 * p * r_ / (p + r_)
        rows.append((int(t), n_pred, tp, ng,
                     round(p, 6), round(r_, 6), round(f1, 6)))
    cols = list(zip(*rows))
    return pa.table({
        "thr_pct": pa.array(cols[0], pa.int64()),
        "n_pred": pa.array(cols[1], pa.int64()),
        "n_tp": pa.array(cols[2], pa.int64()),
        "n_gold": pa.array(cols[3], pa.int64()),
        "precision_r": pa.array(cols[4], pa.float64()),
        "recall_r": pa.array(cols[5], pa.float64()),
        "f1_r": pa.array(cols[6], pa.float64()),
    })


def threshold_sweep_oracle_sql(corpus_dir: str,
                               grid: tuple = _TS_GRID) -> str:
    """DuckDB twin: scored pairs LEFT JOIN the distinct same-entity
    pair relation, CROSS JOIN the threshold grid, one grouped pass."""
    cfg = EMB_CFG
    vals = ", ".join(f"({t})" for t in grid)
    p_expr = "CAST(tp AS DOUBLE) / greatest(np_, 1)"
    r_expr = "CAST(tp AS DOUBLE) / greatest(ng, 1)"
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        se AS (
          SELECT DISTINCT surface, entity_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        gp AS (
          SELECT DISTINCT a.surface AS s_lo, b.surface AS s_hi
          FROM se a JOIN se b
            ON a.entity_id = b.entity_id AND a.surface < b.surface),
        lab AS MATERIALIZED (
          SELECT l.s_lo, l.s_hi, l.score,
                 CASE WHEN g.s_lo IS NOT NULL THEN 1 ELSE 0 END AS ism
          FROM lkscored l
          LEFT JOIN gp g ON g.s_lo = l.s_lo AND g.s_hi = l.s_hi),
        grid(thr_pct) AS (VALUES {vals}),
        agg AS (
          SELECT t.thr_pct,
                 sum(CASE WHEN l.score >= t.thr_pct / 100.0
                     THEN 1 ELSE 0 END) AS np_,
                 sum(CASE WHEN l.score >= t.thr_pct / 100.0 AND l.ism = 1
                     THEN 1 ELSE 0 END) AS tp,
                 sum(l.ism) AS ng
          FROM grid t CROSS JOIN lab l
          GROUP BY t.thr_pct)
        SELECT CAST(thr_pct AS BIGINT) AS thr_pct,
               CAST(np_ AS BIGINT) AS n_pred,
               CAST(tp AS BIGINT) AS n_tp,
               CAST(ng AS BIGINT) AS n_gold,
               round({p_expr}, 6) AS precision_r,
               round({r_expr}, 6) AS recall_r,
               round(CASE WHEN tp = 0 THEN 0.0
                     ELSE 2.0 * ({p_expr}) * ({r_expr})
                          / (({p_expr}) + ({r_expr})) END, 6) AS f1_r
        FROM agg
    """


# ---------------------------------------------------------------------------
# Cluster cohesion report (per-cluster edge-quality QA)
# ---------------------------------------------------------------------------

_COHESION_Q = 1_000_000_000.0  # fixed-point scale for the order-free score sum


def cluster_cohesion(sf_dir: str):
    """(cluster_id, n_members, n_edges, min_score_r, avg_score_r,
    density_r) — per-cluster quality diagnostics over the flagship
    clustering: how many threshold edges each component kept, its weakest
    retained edge, the mean edge score, and the edge density
    ``2E / (m(m-1))``.  The survivorship QA report an ER practitioner
    reads before trusting a merge: low-density clusters are chain-merge
    suspects (A~B~C with no A~C), a low ``min_score_r`` pinpoints the
    single edge whose removal splits the component.  Singleton clusters
    carry no edges and are excluded (they live in
    ``cluster_size_histogram``).

    Scale shape — plan="auto" on the cluster-map size (the
    ``cluster_merge_candidates`` dial): every retained edge is
    intra-cluster by construction (components of the threshold graph), so
    under ``_MERGE_BROADCAST_MAX`` rows the map ships once via
    ``ray.put`` and edges are labeled map-side (Arrow ``index_in``) with
    per-batch per-cluster partials combined on the driver — zero shuffle
    ops (and zero exposures to this host's per-shuffle aggregator-launch
    tail); past the cap, ONE hash-shuffle join labels the edge stream
    and the stats run as a distributed groupby.  Per-cluster stats are
    order-free aggregates (count, min, and a sum of ``floor(score *
    1e9)`` int64 fixed-point terms — identical f64 multiply + floor on
    both engine and oracle, so combine order never shows).  The final
    density/avg math runs on the aggregate-scale (per-cluster) frame
    only under either plan.
    """
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    # the memoized scored-pairs chain feeds the edge stream; the cluster
    # map is the memoized components run (_cluster_map)
    scored, _surfaces = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold

    def _edges_q(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = t.filter(pc.greater_equal(t["score"], thr))
        sc = kept["score"].to_numpy(zero_copy_only=False)
        q = np.floor(sc * _COHESION_Q).astype(np.int64)
        return pa.Table.from_arrays(
            [kept["s_lo"], pa.array(sc, pa.float64()), pa.array(q, pa.int64())],
            names=["s_lo", "score", "q"],
        )

    edges = scored.map_batches(
        _edges_q, batch_format="pyarrow", zero_copy_batch=True
    )

    # the flagship cluster map is memoized (one components run per session)
    comp = _cluster_map(sf_dir)
    n_comp = comp.count()  # materialized memo -> metadata, no data pass
    if n_comp <= _MERGE_BROADCAST_MAX:
        return _cohesion_broadcast(edges, sf_dir)

    labeled = drop_empty_blocks(edges).join(
        comp,
        join_type="inner",
        num_partitions=shuffle_partitions(rows_hint=n_comp),
        on=("s_lo",),
        right_on=("surface",),
    )
    edge_stats = (
        drop_empty_blocks(labeled)
        .groupby("cluster_id")
        .aggregate(
            Count(alias_name="n_edges"),
            Min("score", alias_name="mn"),
            Sum("q", alias_name="sq"),
        )
    )
    sizes = (
        drop_empty_blocks(comp)
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n_members"))
    )
    joined = drop_empty_blocks(sizes).join(
        drop_empty_blocks(edge_stats),
        join_type="inner",
        num_partitions=shuffle_partitions(rows_hint=n_comp),
        on=("cluster_id",),
    )

    def _finish(t: pa.Table) -> pa.Table:
        m = t["n_members"].to_numpy(zero_copy_only=False).astype(np.int64)
        ne = t["n_edges"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = t["mn"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.round(sq / (ne * _COHESION_Q), 6)
        dens = np.round(2.0 * ne / (m * (m - 1.0)), 6)
        return pa.Table.from_arrays(
            [
                t["cluster_id"],
                pa.array(m, pa.int64()),
                pa.array(ne, pa.int64()),
                pa.array(np.round(mn, 6), pa.float64()),
                pa.array(avg, pa.float64()),
                pa.array(dens, pa.float64()),
            ],
            names=["cluster_id", "n_members", "n_edges", "min_score_r",
                   "avg_score_r", "density_r"],
        )

    return joined.map_batches(
        _finish, batch_format="pyarrow", zero_copy_batch=True
    )


def _cohesion_broadcast(edges, sf_dir: str):
    """Broadcast plan for ``cluster_cohesion``: label intra-cluster edges
    map-side against the session-shared ``_comp_broadcast`` cluster map,
    pre-reduce per batch (Arrow ``group_by`` count/min/sum over the
    int64 fixed-point terms), and combine the bounded per-cluster
    partials on the driver.  Member counts come from the broadcast map
    itself.  Identical values to the shuffle plan and the DuckDB twin
    (order-free aggregates; the same f64 rounding sequence)."""
    import pyarrow.compute as pc
    import ray

    from biomedical_el_ray.util import worker_state

    surf_arr, cid_arr, comp_ref, rkey = _comp_broadcast(sf_dir)

    _EMPTY = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.int64()),
         pa.array([], pa.float64()), pa.array([], pa.int64())],
        names=["cluster_id", "ne", "mn", "sq"])

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        surf, cid = worker_state(
            ("merge_comp", rkey), lambda: ray.get(comp_ref))
        ia = pc.index_in(t["s_lo"], value_set=surf)
        ok = pc.is_valid(ia)  # inner-join rule
        if not pc.any(ok).as_py():
            return _EMPTY
        t = t.filter(ok)
        lab = pc.take(cid, ia.filter(ok))
        part = pa.table({
            "cluster_id": lab,
            "score": t["score"],
            "q": t["q"],
        }).group_by(["cluster_id"]).aggregate(
            [("q", "count"), ("score", "min"), ("q", "sum")])
        return part.select(
            ["cluster_id", "q_count", "score_min", "q_sum"]
        ).rename_columns(["cluster_id", "ne", "mn", "sq"])

    part_batches = list(
        edges.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    # zero batches for an all-empty stream — guard before concat
    parts = pa.concat_tables(part_batches) if part_batches else _EMPTY
    out_names = ["cluster_id", "n_members", "n_edges", "min_score_r",
                 "avg_score_r", "density_r"]
    if parts.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.float64()),
             pa.array([], pa.float64()), pa.array([], pa.float64())],
            names=out_names)
    agg = parts.group_by(["cluster_id"]).aggregate(
        [("ne", "sum"), ("mn", "min"), ("sq", "sum")])
    sizes = pa.table({"cluster_id": cid_arr}).group_by(
        ["cluster_id"]).aggregate([([], "count_all")])
    joined = agg.join(sizes, keys=["cluster_id"], join_type="inner")
    m = np.asarray(joined["count_all"], dtype=np.int64)
    ne = np.asarray(joined["ne_sum"], dtype=np.int64)
    mn = np.asarray(joined["mn_min"], dtype=np.float64)
    sq = np.asarray(joined["sq_sum"], dtype=np.float64)
    avg = np.round(sq / (ne * _COHESION_Q), 6)
    dens = np.round(2.0 * ne / (m * (m - 1.0)), 6)
    return pa.Table.from_arrays(
        [joined["cluster_id"], pa.array(m, pa.int64()),
         pa.array(ne, pa.int64()),
         pa.array(np.round(mn, 6), pa.float64()),
         pa.array(avg, pa.float64()), pa.array(dens, pa.float64())],
        names=out_names)


def cluster_cohesion_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: comp CTE + intra-cluster edge aggregates (identical
    fixed-point floor quantization; BIGINT sum cast back before the f64
    divide so both sides do the same correctly rounded operations)."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        sz AS (
          SELECT cluster_id, count(*) AS n_members
          FROM comp GROUP BY 1),
        ed AS (
          SELECT c.cluster_id, p.score,
                 CAST(floor(p.score * {_COHESION_Q}) AS BIGINT) AS q
          FROM lkscored p JOIN comp c ON p.s_lo = c.surface
          WHERE p.score >= {cfg.score_threshold}),
        es AS (
          SELECT cluster_id, count(*) AS n_edges, min(score) AS mn,
                 sum(q) AS sq
          FROM ed GROUP BY 1)
        SELECT s.cluster_id,
               CAST(s.n_members AS BIGINT) AS n_members,
               CAST(e.n_edges AS BIGINT) AS n_edges,
               round(e.mn, 6) AS min_score_r,
               round(CAST(e.sq AS DOUBLE)
                     / (e.n_edges * {_COHESION_Q}), 6) AS avg_score_r,
               round(2.0 * e.n_edges
                     / (s.n_members * (s.n_members - 1.0)), 6) AS density_r
        FROM sz s JOIN es e USING (cluster_id)
    """


# --------------------------------------------------------------------------
# cluster-merge suggestions: near-threshold cross-cluster edges
# --------------------------------------------------------------------------

_MERGE_BAND = 0.10


_MERGE_BROADCAST_MAX = 5_000_000  # cluster-map rows; past it, shuffle plan


def cluster_merge_candidates(sf_dir: str, band: float = _MERGE_BAND):
    """(cluster_a, cluster_b, n_near_edges, max_score_r) — merge
    suggestions for the flagship clustering: compared pairs whose score
    landed just BELOW the clustering threshold (within ``band``) but
    whose endpoints resolved to DIFFERENT clusters.  The complement of
    ``refine_clusters`` (which splits over-merged components): this
    surfaces under-merges, ranked by how many near-miss edges connect the
    two clusters and the strongest of them.  An ER reviewer works this
    queue top-down; accepted suggestions feed a threshold recalibration
    (``threshold_sweep``).

    Scale shape — plan="auto" on the cluster-map size (the J3 KB-size
    routing dial):
    * map ≤ ``_MERGE_BROADCAST_MAX`` rows (it is an aggregate-grain
      deliverable, bounded by distinct surfaces): broadcast it once
      (``ray.put``) and label BOTH endpoints map-side via Arrow
      ``index_in`` — zero shuffle joins; per-batch Arrow partials
      (bounded by the near-band pair count) reduce on the driver.
      Besides removing two all-to-all exchanges, this sidesteps the
      per-shuffle aggregator-actor launch tail measured on this host
      (1.2 s nominal, 4–20 s tail per shuffle op — see BASELINE.md
      round-5 root-cause note).
    * past the cap: the original TWO hash-shuffle joins, partitioned by
      the MAP's row count (not the CPU count — the near band is always
      the rare slice), and an order-free Count/Max groupby.
    The per-(a, b) reduce is over int64 fixed-point scores on both
    plans; the final ``max_score_r`` is the identical single f64 divide
    on both sides, so the plans and the DuckDB twin are bit-exact.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Max

    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    # the memoized scored-pairs chain feeds the near band; the cluster
    # map is the memoized components run (_cluster_map)
    scored, _surfaces = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold
    lo_thr = thr - band

    def _near(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.and_(
            pc.greater_equal(t["score"], lo_thr),
            pc.less(t["score"], thr),
        ))
        sc = kept["score"].to_numpy(zero_copy_only=False)
        q = np.floor(sc * _COHESION_Q).astype(np.int64)
        return pa.Table.from_arrays(
            [kept["s_lo"], kept["s_hi"], pa.array(q, pa.int64())],
            names=["s_lo", "s_hi", "q"],
        )

    near = drop_empty_blocks(scored.map_batches(
        _near, batch_format="pyarrow", zero_copy_batch=True))

    comp = _cluster_map(sf_dir)
    n_comp = comp.count()  # materialized memo -> metadata, no data pass
    if n_comp <= _MERGE_BROADCAST_MAX:
        return _merge_candidates_broadcast(near, sf_dir)

    a = near.join(comp, join_type="inner",
                  num_partitions=shuffle_partitions(rows_hint=n_comp),
                  on=("s_lo",), right_on=("surface",))

    def _ra(t: pa.Table) -> pa.Table:
        return t.select(["s_hi", "q", "cluster_id"]).rename_columns(
            ["s_hi", "q", "ca"])

    b = drop_empty_blocks(a.map_batches(
        _ra, batch_format="pyarrow", zero_copy_batch=True)).join(
        comp, join_type="inner",
        num_partitions=shuffle_partitions(rows_hint=n_comp),
        on=("s_hi",), right_on=("surface",))

    def _cross(t: pa.Table) -> pa.Table:
        # cluster ids are lexicographic-min member surfaces (strings);
        # canonicalize the unordered pair with Arrow string comparisons
        t2 = t.filter(pc.not_equal(t["ca"], t["cluster_id"]))
        ca, cb = t2["ca"].combine_chunks(), t2["cluster_id"].combine_chunks()
        lt = pc.less(ca, cb)
        return pa.table({
            "cluster_a": pc.if_else(lt, ca, cb),
            "cluster_b": pc.if_else(lt, cb, ca),
            "q": t2["q"],
        })

    def _finish(t: pa.Table) -> pa.Table:
        mq = t["mq"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "cluster_a": t["cluster_a"],
            "cluster_b": t["cluster_b"],
            "n_near_edges": pc.cast(t["n_near_edges"], pa.int64()),
            "max_score_r": pa.array(mq / _COHESION_Q),
        })

    return (
        drop_empty_blocks(b.map_batches(
            _cross, batch_format="pyarrow", zero_copy_batch=True))
        .groupby(["cluster_a", "cluster_b"])
        .aggregate(Count(alias_name="n_near_edges"),
                   Max("q", alias_name="mq"))
        .map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def _comp_broadcast(sf_dir: str):
    """Driver-side broadcast handle for the memoized cluster map:
    (surface array, cluster_id array, ObjectRef, worker-cache key).
    Concatenated and ``ray.put`` ONCE per session (``memo_derived``), so
    every broadcast-plan consumer (merge queue, cohesion, repeated bench
    reps) shares one object-store copy and one per-worker cache entry —
    the stable ref key means ``worker_state`` never accumulates
    duplicate map copies (code-review r5 finding)."""
    import ray

    from biomedical_el_ray.util import memo_derived, ref_key

    def _build():
        comp = _cluster_map(sf_dir)
        batches = list(comp.iter_batches(
            batch_format="pyarrow", batch_size=None))
        if batches:
            ctab = pa.concat_tables(batches).combine_chunks()
            surf = ctab.column("surface").combine_chunks()
            cid = ctab.column("cluster_id").combine_chunks()
        else:  # empty map -> empty lookup (labels nothing, inner-join rule)
            surf = pa.chunked_array([pa.array([], pa.string())])
            cid = pa.chunked_array([pa.array([], pa.string())])
        ref = ray.put((surf, cid))
        return surf, cid, ref, ref_key(ref)

    return memo_derived(("lemb_comp_bcast", str(sf_dir)), _build)


def _merge_candidates_broadcast(near, sf_dir: str):
    """Broadcast plan for ``cluster_merge_candidates``: the materialized
    cluster map rides ``ray.put`` once per session (``_comp_broadcast``);
    each near-band batch labels both endpoints with Arrow ``index_in``
    against the broadcast surface array, filters cross-cluster rows,
    canonicalizes the pair, and pre-reduces in-batch (Arrow ``group_by``
    Count/Max — output bounded by the batch's distinct cluster pairs).
    Partials are a bounded aggregate (≤ distinct near pairs × blocks),
    combined on the driver with one final Arrow group_by: identical
    values to the shuffle plan and the DuckDB twin (int64 fixed-point
    max, single f64 divide)."""
    import pyarrow.compute as pc
    import ray

    from biomedical_el_ray.util import worker_state

    _surf, _cid, comp_ref, rkey = _comp_broadcast(sf_dir)

    _EMPTY = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.string()),
         pa.array([], pa.int64()), pa.array([], pa.int64())],
        names=["cluster_a", "cluster_b", "n", "mq"])

    def _label_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        surf, cid = worker_state(
            ("merge_comp", rkey), lambda: ray.get(comp_ref))
        ia = pc.index_in(t["s_lo"], value_set=surf)
        ib = pc.index_in(t["s_hi"], value_set=surf)
        ok = pc.and_(pc.is_valid(ia), pc.is_valid(ib))  # inner-join rule
        if not pc.any(ok).as_py():
            return _EMPTY
        t = t.filter(ok)
        ca = pc.take(cid, ia.filter(ok))
        cb = pc.take(cid, ib.filter(ok))
        cross = pc.not_equal(ca, cb)
        if not pc.any(cross).as_py():
            return _EMPTY
        ca, cb = ca.filter(cross), cb.filter(cross)
        lt = pc.less(ca, cb)
        part = pa.table({
            "cluster_a": pc.if_else(lt, ca, cb),
            "cluster_b": pc.if_else(lt, cb, ca),
            "q": t.filter(cross)["q"],
        }).group_by(["cluster_a", "cluster_b"]).aggregate(
            [("q", "count"), ("q", "max")])
        return part.select(
            ["cluster_a", "cluster_b", "q_count", "q_max"]
        ).rename_columns(["cluster_a", "cluster_b", "n", "mq"])

    part_batches = list(
        near.map_batches(_label_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    # iter_batches yields ZERO batches for an all-empty stream (Ray skips
    # 0-row outputs), so guard before concat (code-review r5 finding)
    parts = pa.concat_tables(part_batches) if part_batches else _EMPTY
    if parts.num_rows == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["cluster_a", "cluster_b", "n_near_edges", "max_score_r"])
    agg = parts.group_by(["cluster_a", "cluster_b"]).aggregate(
        [("n", "sum"), ("mq", "max")])
    mq = np.asarray(agg["mq_max"], dtype=np.float64)
    return pa.table({
        "cluster_a": agg["cluster_a"],
        "cluster_b": agg["cluster_b"],
        "n_near_edges": pc.cast(agg["n_sum"], pa.int64()),
        "max_score_r": pa.array(mq / _COHESION_Q),
    })


def cluster_merge_candidates_oracle_sql(corpus_dir: str,
                                        band: float = _MERGE_BAND) -> str:
    """DuckDB twin: scored-pairs chain, reachability components, the
    near-miss band, endpoint labeling, Count/Max reduce with the
    identical fixed-point floor."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    thr = cfg.score_threshold
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {thr}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        comp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        near AS (
          SELECT p.s_lo, p.s_hi,
                 CAST(floor(p.score * {_COHESION_Q}) AS BIGINT) AS q
          FROM lkscored p
          WHERE p.score >= {thr - band} AND p.score < {thr}),
        lab AS (
          SELECT least(ca.cluster_id, cb.cluster_id) AS cluster_a,
                 greatest(ca.cluster_id, cb.cluster_id) AS cluster_b,
                 n.q
          FROM near n
          JOIN comp ca ON ca.surface = n.s_lo
          JOIN comp cb ON cb.surface = n.s_hi
          WHERE ca.cluster_id <> cb.cluster_id)
        SELECT cluster_a, cluster_b,
               CAST(count(*) AS BIGINT) AS n_near_edges,
               CAST(max(q) AS DOUBLE) / {_COHESION_Q} AS max_score_r
        FROM lab GROUP BY 1, 2
    """


# --------------------------------------------------------------------------
# Uncertainty-band labeling batch (active-learning pair sampling)
# --------------------------------------------------------------------------

_LB_PER_BAND = 8


def labeling_batch(sf_dir: str, per_band: int = _LB_PER_BAND):
    """(band, s_lo, s_hi, score_r, rnk) — a deterministic
    stratified-by-score sample of compared pairs for human labeling: the
    workflow behind every threshold calibration (Splink's labeling tool,
    active-learning ER): ``per_band`` pairs from each score decile,
    chosen by pair-hash order so the batch is a pure function of the
    data — reviewers on different days label the same pairs, and
    uncertainty bands near the threshold get equal representation
    instead of being swamped by the easy extremes.

    Scale shape: the memoized scored-pairs chain streams through a
    map-side per-batch pre-reduce (≤ 10·per_band rows out per batch),
    then the shared Arrow grouped-top-k reduce on the 10-row band key.
    The pair key is ``splitmix64(h(s_lo) + h(s_hi)·γ)`` — composed from
    the per-surface 64-bit hashes so the SQL twin never hashes a
    >64-byte concatenation.
    """
    from biomedical_el_ray.functions.hashing import hash64_column, splitmix64
    from biomedical_el_ray.util import grouped_topk_arrow

    scored, _ = _scored_pairs(sf_dir)
    gamma = np.uint64(0x9E3779B97F4A7C15)

    def _rank_in_band(t: pa.Table, k: int) -> pa.Table:
        t = t.sort_by([("band", "ascending"), ("h", "ascending"),
                       ("s_lo", "ascending"), ("s_hi", "ascending")])
        band = t["band"].to_numpy(zero_copy_only=False)
        n = len(band)
        brk = np.ones(n, bool)
        brk[1:] = band[1:] != band[:-1]
        starts = np.flatnonzero(brk)
        rank = np.arange(n, dtype=np.int64)
        rank -= np.repeat(rank[starts], np.diff(np.append(starts, n)))
        return t.filter(pa.array(rank < k))

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "band": pa.array([], pa.int64()),
            "h": pa.array([], pa.uint64()),
            "s_lo": pa.array([], pa.string()),
            "s_hi": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        score = t["score"].to_numpy(zero_copy_only=False)
        band = np.clip(np.floor(score * 10.0), 0, 9).astype(np.int64)
        h = splitmix64(hash64_column(t["s_lo"])
                       + hash64_column(t["s_hi"]) * gamma)
        tb = pa.table({
            "band": pa.array(band),
            "h": pa.array(h, pa.uint64()),
            "s_lo": t["s_lo"].combine_chunks()
            if isinstance(t["s_lo"], pa.ChunkedArray) else t["s_lo"],
            "s_hi": t["s_hi"].combine_chunks()
            if isinstance(t["s_hi"], pa.ChunkedArray) else t["s_hi"],
            "score": pa.array(score, pa.float64()),
        })
        return _rank_in_band(tb, per_band)  # map-side pre-reduce

    partials = scored.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    def _derive(t: pa.Table) -> pa.Table:
        sc = t["score"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "score_r", pa.array(np.round(sc, 6), pa.float64()))

    return grouped_topk_arrow(
        partials, "band",
        [("h", "ascending"), ("s_lo", "ascending"), ("s_hi", "ascending")],
        per_band, derive=_derive,
        out_cols=["band", "s_lo", "s_hi", "score_r", "rnk"],
    )


def labeling_batch_oracle_sql(corpus_dir: str,
                              per_band: int = _LB_PER_BAND) -> str:
    """DuckDB twin: the scored-pairs chain, per-surface multilinear
    hashes joined to both pair sides, one splitmix combine, and a
    row_number per clamped score decile."""
    from biomedical_el_ray.functions.sql_hash import (
        MASK64, SM_GAMMA, hash64_short_cte, mulmod_sql, splitmix_step_ctes,
    )

    cfg = EMB_CFG
    hcte, hrel = hash64_short_cte("lbs", [], "lbh", tok_col="tok",
                                  out_col="hs")
    mcte, mrel = splitmix_step_ctes(
        "lb0", ["band", "s_lo", "s_hi", "score"],
        [("h", f"((hlo + {mulmod_sql('hhi', SM_GAMMA)}) & {MASK64})")],
        "lbm",
    )
    return f"""
        WITH {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        lbs AS (
          SELECT s_lo AS tok FROM lkscored
          UNION
          SELECT s_hi FROM lkscored),
        {hcte},
        lb0 AS (
          SELECT l.s_lo, l.s_hi, l.score,
                 least(greatest(CAST(floor(l.score * 10) AS BIGINT), 0), 9)
                   AS band,
                 ha.hs AS hlo, hb.hs AS hhi
          FROM lkscored l
          JOIN {hrel} ha ON ha.tok = l.s_lo
          JOIN {hrel} hb ON hb.tok = l.s_hi),
        {mcte},
        lbr AS (
          SELECT band, s_lo, s_hi, score,
                 row_number() OVER (
                   PARTITION BY band ORDER BY h, s_lo, s_hi) AS rnk
          FROM {mrel})
        SELECT CAST(band AS BIGINT) AS band, s_lo, s_hi,
               round(score, 6) AS score_r, CAST(rnk AS BIGINT) AS rnk
        FROM lbr WHERE rnk <= {per_band}
    """


# --------------------------------------------------------------------------
# One-row ER run report (the dashboard row)
# --------------------------------------------------------------------------

def er_report(sf_dir: str):
    """(n_surfaces, n_cand_pairs, n_edges, n_clusters, n_singletons,
    max_cluster_size, pairs_per_surface_r, edge_rate_r) — the one-row
    summary an ER operator reads after every run: how hard blocking
    worked (candidate pairs per surface), how selective scoring was
    (edge rate), and what the clustering produced (cluster count,
    singleton share, largest component — the over-merge canary).

    Scale shape: every number is a bounded aggregate over the memoized
    session chains (scored pairs, cluster map) — counts and one bounded
    per-cluster size groupby; the two ratios are single f64 divides
    rounded identically on both sides.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from biomedical_el_ray.util import drop_empty_blocks

    scored, surfaces = _scored_pairs(sf_dir)
    thr = EMB_CFG.score_threshold
    n_surfaces = surfaces.count()
    n_pairs = scored.count()
    n_edges = scored.map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.cast(pc.greater_equal(t["score"], thr), pa.int64())],
            names=["e"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).sum("e")
    sizes = drop_empty_blocks(
        _cluster_map(sf_dir).groupby("cluster_id").aggregate(
            Count(alias_name="n"))
    ).take_all()
    n_clusters = len(sizes)
    n_singletons = sum(1 for r in sizes if int(r["n"]) == 1)
    max_size = max((int(r["n"]) for r in sizes), default=0)
    return pa.table({
        "n_surfaces": pa.array([n_surfaces], pa.int64()),
        "n_cand_pairs": pa.array([n_pairs], pa.int64()),
        "n_edges": pa.array([int(n_edges or 0)], pa.int64()),
        "n_clusters": pa.array([n_clusters], pa.int64()),
        "n_singletons": pa.array([n_singletons], pa.int64()),
        "max_cluster_size": pa.array([max_size], pa.int64()),
        "pairs_per_surface_r": pa.array(
            [round(n_pairs / max(n_surfaces, 1), 6)], pa.float64()),
        "edge_rate_r": pa.array(
            [round(int(n_edges or 0) / max(n_pairs, 1), 6)], pa.float64()),
    })


def er_report_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: the scored-pairs chain + one reachability pass, the
    identical counts and f64 ratio sequence."""
    from biomedical_el_ray.functions.sql_hash import reachability_cte

    cfg = EMB_CFG
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored "
        f"WHERE score >= {cfg.score_threshold}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {scored_pairs_cte(_gold_surf_body(corpus_dir), cfg)},
        {reach},
        ercomp AS (
          SELECT s AS surface, min(r) AS cluster_id
          FROM reach GROUP BY s),
        ersz AS (
          SELECT cluster_id, count(*) AS n FROM ercomp GROUP BY 1),
        ern AS (
          SELECT (SELECT count(*) FROM surf) AS n_surfaces,
                 (SELECT count(*) FROM lkscored) AS n_pairs,
                 (SELECT count(*) FROM lkscored
                  WHERE score >= {cfg.score_threshold}) AS n_edges,
                 (SELECT count(*) FROM ersz) AS n_clusters,
                 (SELECT count(*) FROM ersz WHERE n = 1) AS n_singletons,
                 (SELECT coalesce(max(n), 0) FROM ersz) AS max_size)
        SELECT CAST(n_surfaces AS BIGINT) AS n_surfaces,
               CAST(n_pairs AS BIGINT) AS n_cand_pairs,
               CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_clusters AS BIGINT) AS n_clusters,
               CAST(n_singletons AS BIGINT) AS n_singletons,
               CAST(max_size AS BIGINT) AS max_cluster_size,
               round(CAST(n_pairs AS DOUBLE) / greatest(n_surfaces, 1), 6)
                 AS pairs_per_surface_r,
               round(CAST(n_edges AS DOUBLE) / greatest(n_pairs, 1), 6)
                 AS edge_rate_r
        FROM ern
    """

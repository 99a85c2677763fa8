"""Entity linking: mention surfaces -> KB candidates (the reference's NED).

The reference links each mention by dot-product similarity against ALL
entity embeddings and takes the argmax (/root/reference/run_e2e_span.py:
343-366 builds the C x 768 candidate matrix; modeling_e2e_span.py:227-232
scores it; run_e2e_span.py:570-575 argmaxes), and mines the top-k
non-gold candidates as hard negatives (/root/reference/utils_e2e_span.py:
416-428 bmm+topk, :432-461 accumulation).

Ray-Data-first recast: the KB is the SMALL side (29k entities in the
reference), so it is broadcast once with ``ray.put`` and each actor holds
it registered in an embedded DuckDB connection (built once in
``__init__``); each ``map_batches`` batch of distinct mention surfaces is
cross-scored against the whole KB by DuckDB's vectorized
``jaro_winkler_similarity`` kernel with a windowed top-k — the exact
structure of the reference's brute-force k-NN (FAISS imported but unused,
utils_e2e_span.py:265-270).  At 10^12-turn scale the linking domain is
|distinct surfaces| (surface dedup upstream), not |mentions|, and a KB too
large to broadcast would be bucketed by the same MinHash/embedding blocking
keys as the self-join pipeline (stages/blocking.py).

Query contract (all DuckDB-oracle checkable):
  * entity_link_topk       — T1-analog top-k candidates per surface
  * entity_link_top1       — T2-analog argmax link per mention
  * candidate_rank_histogram — G1-analog position-of-gold histogram
                               (utils_e2e_span.py:441-444,614-615)
  * hard_negatives         — A4-analog non-gold top-k per mention
  * tfidf_candidates       — TF-IDF candidate strategy
                             (run_e2e_span.py:868-869 use_tfidf_candidates;
                             utils_e2e_span.py:350-356 consumes the
                             precomputed m["tfidf_candidates"] list — here
                             the retriever itself is implemented)
  * link_quality           — P@1 / MAP / R@k ranking metrics
                             (run_e2e_span.py:617-663, commented out in
                             the reference; live here)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from biomedical_el_ray.sources.readers import read_parquet_spread
import ray.data

from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.util import drop_empty_blocks, resolve_concurrency, shuffle_partitions

LINK_TOPK = 10  # num_candidates default (/root/reference/run_e2e_span.py:883)
# M8-analog: the reference truncates each entity's text window to 128
# tokens before encoding it (/root/reference/utils_e2e_span.py:166-170);
# here the whitespace-token analog caps KB names before candidate scoring
MAX_NAME_TOKENS = 128


def truncate_name_tokens(col, max_tokens: int = MAX_NAME_TOKENS):
    """Whitespace-token truncation of a string column, vectorized.

    Rows at or under the cap pass through byte-identical (no whitespace
    renormalization); rows over it keep their first ``max_tokens`` tokens
    joined by single spaces — the same semantics as the oracle SQL's
    ``array_to_string(regexp_extract_all(name, '\\S+')[1:128], ' ')``.
    """
    import pyarrow.compute as pc

    split = pc.utf8_split_whitespace(col)
    need = pc.greater(pc.list_value_length(split), max_tokens)
    joined = pc.binary_join(pc.list_slice(split, 0, max_tokens), " ")
    return pc.if_else(need, joined, col)


class KBLinker:
    """Actor-pool stage: batch of surfaces -> top-k KB candidates each.

    ``kb_ref``: ``ray.put`` ObjectRef of an Arrow table (entity_id, name)
    (or the table itself for driver-side use) — broadcast once, registered
    into a per-actor DuckDB connection in ``__init__``.
    """

    def __init__(self, kb_ref, k: int = LINK_TOPK):
        import duckdb

        kb = ray.get(kb_ref) if isinstance(kb_ref, ray.ObjectRef) else kb_ref
        self.k = k
        self.con = duckdb.connect()
        self.con.register("kb", kb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.con.register("surf_batch", batch.select(["surface"]))
        out = self.con.execute(
            """
            SELECT surface, entity_id, CAST(rn AS BIGINT) AS rnk,
                   round(sim, 6) AS sim_r
            FROM (
              SELECT s.surface, k.entity_id,
                     jaro_winkler_similarity(s.surface, k.name) AS sim,
                     row_number() OVER (
                       PARTITION BY s.surface
                       ORDER BY jaro_winkler_similarity(s.surface, k.name) DESC,
                                k.entity_id) AS rn
              FROM surf_batch s CROSS JOIN kb k)
            WHERE rn <= ?
            """,
            [self.k],
        ).arrow()
        self.con.unregister("surf_batch")
        return pa.table(out)


# --------------------------------------------------------------------------
# TF-IDF candidate retriever (use_tfidf_candidates strategy)
# --------------------------------------------------------------------------
#
# The reference consumes an externally precomputed ``tfidf_candidates``
# list per mention (/root/reference/utils_e2e_span.py:350-356, flag at
# run_e2e_span.py:868-869); the retriever behind it is a TF-IDF match of
# the mention surface against KB entity names.  Rebuilt here
# deterministically with character-3-gram features (the standard
# entity-linking TF-IDF retriever form — robust to the typo/truncation
# alias variants whole-token match misses): distinct-gram (0/1 tf)
# vectors, smoothed idf = ln((N+1)/(df+1)) + 1 over the KB, cosine
# scoring.  To make the score independent of summation order (Ray batch
# boundaries vs the oracle's single pass), idf weights are quantized to
# integer micro-units once; dots and squared norms are then exact BIGINT
# sums.  Both the per-actor DuckDB prep and the driver oracle SQL are
# generated from these same templates so float behavior matches
# bit-for-bit.

# distinct character 3-grams of the lowercased string (strings shorter
# than 3 chars contribute their whole lowercased self as one gram)
_TFIDF_GRAMS_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(length({col}) - 2, 1) + 1), "
    "i -> substring(lower({col}), i, 3)))"
)

_TFIDF_KB_PREP_SQL = """
    WITH kb_t AS (
      SELECT entity_id,
             unnest(""" + _TFIDF_GRAMS_SQL.format(col="name") + """) AS tok
      FROM {kb}),
    df_t AS (SELECT tok, count(*) AS df FROM kb_t GROUP BY tok),
    nn AS (SELECT count(*) AS n FROM {kb})
    SELECT kb_t.entity_id, kb_t.tok,
           CAST(floor((ln((nn.n + 1.0) / (df_t.df + 1.0)) + 1.0) * 1000000 + 0.5)
                AS BIGINT) AS wq
    FROM kb_t JOIN df_t USING (tok) CROSS JOIN nn
"""

# CTE list + final select, WITHOUT the leading WITH so callers can merge
# extra CTEs in front (the oracle prepends kb_tok)
_TFIDF_SCORE_SQL = """
    st AS (
      SELECT surface,
             unnest(""" + _TFIDF_GRAMS_SQL.format(col="surface") + """) AS tok
      FROM {surfaces}),
    sw AS (
      SELECT st.surface, st.tok,
             CAST(floor((ln((nn.n + 1.0) / (coalesce(df_t.df, 0) + 1.0)) + 1.0)
                        * 1000000 + 0.5) AS BIGINT) AS wq
      FROM st LEFT JOIN {tok_df} df_t USING (tok) CROSS JOIN {nn} nn),
    snorm AS (SELECT surface, sqrt(CAST(sum(wq * wq) AS DOUBLE)) AS nrm
              FROM sw GROUP BY surface),
    knorm AS (SELECT entity_id, sqrt(CAST(sum(wq * wq) AS DOUBLE)) AS nrm
              FROM {kb_tok} GROUP BY entity_id),
    dots AS (
      SELECT sw.surface, kt.entity_id, sum(sw.wq * kt.wq) AS dot
      FROM sw JOIN {kb_tok} kt USING (tok)
      GROUP BY 1, 2),
    scored AS (
      SELECT d.surface, d.entity_id,
             CAST(d.dot AS DOUBLE) / (s.nrm * k.nrm) AS sim,
             row_number() OVER (
               PARTITION BY d.surface
               ORDER BY CAST(d.dot AS DOUBLE) / (s.nrm * k.nrm) DESC,
                        d.entity_id) AS rn
      FROM dots d JOIN snorm s USING (surface) JOIN knorm k USING (entity_id))
    SELECT surface, entity_id, CAST(rn AS BIGINT) AS rnk, round(sim, 6) AS sim_r
    FROM scored WHERE rn <= {k}
"""


def tfidf_oracle_sql(entities_parquet: str, surfaces_sql: str,
                     k: int = LINK_TOPK,
                     max_name_tokens: int = MAX_NAME_TOKENS) -> str:
    """Full DuckDB oracle for the TF-IDF retriever (same templates as the
    actor path, so scores match exactly)."""
    kb = f"""(SELECT entity_id,
                     CASE WHEN length(regexp_extract_all(name, '\\S+')) > {max_name_tokens}
                          THEN array_to_string(regexp_extract_all(name, '\\S+')[1:{max_name_tokens}], ' ')
                          ELSE name END AS name
              FROM read_parquet('{entities_parquet}'))"""
    prep = _TFIDF_KB_PREP_SQL.format(kb=kb)
    score = _TFIDF_SCORE_SQL.format(
        surfaces=f"({surfaces_sql})",
        tok_df="(SELECT tok, count(*) AS df FROM kb_tok GROUP BY tok)",
        nn=f"(SELECT count(*) AS n FROM {kb})",
        kb_tok="kb_tok",
        k=k,
    )
    return f"WITH kb_tok AS ({prep}), {score}"


class TfidfLinker:
    """Actor-pool stage: batch of surfaces -> top-k TF-IDF KB candidates.

    The KB token/idf tables are built ONCE per actor in ``__init__`` from
    the broadcast KB table; each batch runs one vectorized DuckDB token
    join.  At 100-TB scale the KB side stays broadcastable (token table ~
    |KB| x tokens-per-name rows); the surface side streams."""

    def __init__(self, kb_ref, k: int = LINK_TOPK):
        import duckdb

        kb = ray.get(kb_ref) if isinstance(kb_ref, ray.ObjectRef) else kb_ref
        self.k = k
        self.con = duckdb.connect()
        self.con.register("kb", kb)
        self.con.execute(
            "CREATE TABLE kb_tok AS " + _TFIDF_KB_PREP_SQL.format(kb="kb")
        )
        self.con.execute(
            "CREATE TABLE tok_df AS SELECT tok, count(*) AS df FROM kb_tok GROUP BY tok"
        )
        self.con.execute("CREATE TABLE nn AS SELECT count(*) AS n FROM kb")

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.con.register("surf_batch", batch.select(["surface"]))
        out = self.con.execute(
            "WITH " + _TFIDF_SCORE_SQL.format(
                surfaces="surf_batch", tok_df="tok_df", nn="nn",
                kb_tok="kb_tok", k=self.k,
            )
        ).arrow()
        self.con.unregister("surf_batch")
        return pa.table(out)


def tfidf_link_topk(surfaces_ds, kb: pa.Table, k: int = LINK_TOPK,
                    batch_size: int = 1024,
                    max_name_tokens: int = MAX_NAME_TOKENS):
    """surfaces Dataset -> (surface, entity_id, rnk, sim_r) TF-IDF top-k."""
    name_idx = kb.schema.get_field_index("name")
    kb = kb.set_column(
        name_idx, "name", truncate_name_tokens(kb["name"], max_name_tokens)
    )
    ref = ray.put(kb)
    return surfaces_ds.map_batches(
        TfidfLinker,
        fn_constructor_kwargs={"kb_ref": ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=resolve_concurrency(None),
    )


class RetrieveRerankLinker:
    """Actor-pool stage for LARGE KBs: TF-IDF retrieve, Jaro-Winkler rerank.

    The brute ``KBLinker`` cross-scores every surface against every KB name
    — O(|surfaces| x |KB|), faithful to the reference's 29k-entity
    brute-force (utils_e2e_span.py:416-428) but explosive at a 10M-name
    KB.  This plan bounds per-batch cost: a char-3-gram TF-IDF token join
    retrieves ``retrieve_k`` candidates per surface (cost scales with
    shared grams, not the cross product), then only those pairs are
    rescored with Jaro-Winkler and cut to top-k.  Same output schema and
    score column as ``KBLinker``; recall is bounded by the retrieval stage
    (candidates lexically disjoint from the surface can be missed — the
    standard retrieve-then-rerank trade)."""

    def __init__(self, kb_ref, k: int = LINK_TOPK, retrieve_k: int | None = None):
        import duckdb

        kb = ray.get(kb_ref) if isinstance(kb_ref, ray.ObjectRef) else kb_ref
        self.k = k
        self.retrieve_k = retrieve_k or max(10 * k, 100)
        self.con = duckdb.connect()
        self.con.register("kb", kb)
        self.con.execute(
            "CREATE TABLE kb_tok AS " + _TFIDF_KB_PREP_SQL.format(kb="kb")
        )
        self.con.execute(
            "CREATE TABLE tok_df AS SELECT tok, count(*) AS df FROM kb_tok GROUP BY tok"
        )
        self.con.execute("CREATE TABLE nn AS SELECT count(*) AS n FROM kb")

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.con.register("surf_batch", batch.select(["surface"]))
        retrieved = self.con.execute(
            "WITH " + _TFIDF_SCORE_SQL.format(
                surfaces="surf_batch", tok_df="tok_df", nn="nn",
                kb_tok="kb_tok", k=self.retrieve_k,
            )
        ).arrow()
        self.con.register("retrieved", retrieved)
        out = self.con.execute(
            """
            SELECT surface, entity_id, CAST(rn AS BIGINT) AS rnk,
                   round(sim, 6) AS sim_r
            FROM (
              SELECT r.surface, r.entity_id,
                     jaro_winkler_similarity(r.surface, k.name) AS sim,
                     row_number() OVER (
                       PARTITION BY r.surface
                       ORDER BY jaro_winkler_similarity(r.surface, k.name) DESC,
                                r.entity_id) AS rn
              FROM retrieved r JOIN kb k USING (entity_id))
            WHERE rn <= ?
            """,
            [self.k],
        ).arrow()
        self.con.unregister("retrieved")
        self.con.unregister("surf_batch")
        return pa.table(out)


def _distinct_surfaces(gold_ds):
    """gold mentions -> one row per distinct surface string."""
    return drop_empty_blocks(
        gold_ds.groupby("surface").count()
    ).select_columns(["surface"])


def _corpus_tables(sf_dir: str):
    d = ensure_corpus_for_sf_dir(sf_dir)
    gold = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["mention_id", "surface", "entity_id"],
    )
    import pyarrow.parquet as pq

    kb = pq.read_table(os.path.join(d, "entities.parquet"), columns=["entity_id", "name"])
    return gold, kb


# Plan-choice threshold: below this KB size the exact brute cross-score
# is cheap (the reference's own regime: 29k entities); above it the
# O(|surfaces| x |KB|) per-batch cross join explodes and link_topk routes
# through TF-IDF retrieve + Jaro-Winkler rerank instead — the same
# explicit size-thresholded plan switch as the broadcast-vs-shuffle
# choices in linkage.py/unionfind.py.
LINK_BRUTE_KB_MAX = 100_000


def link_topk(surfaces_ds, kb: pa.Table, k: int = LINK_TOPK, batch_size: int = 1024,
              max_name_tokens: int = MAX_NAME_TOKENS, plan: str = "auto",
              retrieve_k: int | None = None):
    """surfaces Dataset -> (surface, entity_id, rnk, sim_r) top-k Dataset.

    KB names are token-truncated ONCE on the driver before the broadcast
    (M8-analog, /root/reference/utils_e2e_span.py:166-170), so overlong
    aliases cannot skew the Jaro-Winkler candidate scoring.

    ``plan``: ``"brute"`` (exact cross-score), ``"retrieve_rerank"``
    (TF-IDF retrieve + JW rerank, bounded cost for large KBs), or
    ``"auto"`` (brute iff ``kb.num_rows <= LINK_BRUTE_KB_MAX``)."""
    if plan == "auto":
        plan = "brute" if kb.num_rows <= LINK_BRUTE_KB_MAX else "retrieve_rerank"
    if plan not in ("brute", "retrieve_rerank"):
        raise ValueError(f"unknown link_topk plan: {plan!r}")
    name_idx = kb.schema.get_field_index("name")
    kb = kb.set_column(
        name_idx, "name", truncate_name_tokens(kb["name"], max_name_tokens)
    )
    ref = ray.put(kb)
    if plan == "brute":
        cls, kwargs = KBLinker, {"kb_ref": ref, "k": k}
    else:
        cls = RetrieveRerankLinker
        kwargs = {"kb_ref": ref, "k": k, "retrieve_k": retrieve_k}
    return surfaces_ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=resolve_concurrency(None),
    )


# --------------------------------------------------------------------------
# driver-contract queries
# --------------------------------------------------------------------------

def _kb_topk(sf_dir: str):
    """Materialized (surface, entity_id, rnk, sim_r) top-``LINK_TOPK`` KB
    candidate table, memoized per session: entity_link_topk/top1, the
    rank histogram, hard_negatives, link_quality and the NIL cut all
    consume this identical broadcast-KB pass — one execution serves all
    (the in-session analog of a persisted candidates stage).  top-1 =
    the ``rnk = 1`` slice (identical ordering rule)."""
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    d = str(ensure_corpus_for_sf_dir(sf_dir))

    def _build():
        gold, kb = _corpus_tables(sf_dir)
        return link_topk(_distinct_surfaces(gold), kb).materialize()

    return ensure_hash_shuffle(memo_derived(("link_kb_topk", d), _build))


def _kb_top1(sf_dir: str):
    """(surface, entity_id, rnk, sim_r) best KB candidate per surface —
    the rnk = 1 slice of the memoized top-k table."""
    import pyarrow.compute as pc

    return _kb_topk(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["rnk"], 1)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def entity_link_topk(sf_dir: str):
    """Top-k KB candidates per distinct mention surface (T1/J3-analog)."""
    return _kb_topk(sf_dir)


def entity_link_top1(sf_dir: str):
    """(mention_id, entity_id, sim_r): argmax link per mention (T2-analog).

    Surface-level top-1 (small domain) joined back to mentions by one hash
    join — same assign-by-surface pattern as the flagship clusterer.
    """
    gold, _kb = _corpus_tables(sf_dir)
    top1 = _kb_top1(sf_dir)

    def _strip(t: pa.Table) -> pa.Table:
        return t.select(["surface", "entity_id", "sim_r"]).rename_columns(
            ["surface", "linked_entity_id", "sim_r"]
        )

    top1 = drop_empty_blocks(
        top1.map_batches(_strip, batch_format="pyarrow", zero_copy_batch=True)
    )
    joined = gold.select_columns(["mention_id", "surface"]).join(
        top1, "inner", num_partitions=shuffle_partitions(), on=("surface",)
    )
    return joined.map_batches(
        lambda t: t.select(["mention_id", "linked_entity_id", "sim_r"]).rename_columns(
            ["mention_id", "entity_id", "sim_r"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def candidate_rank_histogram(sf_dir: str):
    """(rnk, n_mentions): where the gold entity lands in the top-k
    candidate list, 0 = not retrieved (G1-analog,
    /root/reference/utils_e2e_span.py:441-444,614-615)."""
    import pyarrow.compute as pc

    gold, _kb = _corpus_tables(sf_dir)
    topk = drop_empty_blocks(
        _kb_topk(sf_dir).map_batches(
            lambda t: t.select(["surface", "entity_id", "rnk"]).rename_columns(
                ["surface", "cand_entity_id", "rnk"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # left join mentions -> their gold entity's rank among candidates
    joined = gold.join(
        topk,
        "left_outer",
        num_partitions=shuffle_partitions(),
        on=("surface", "entity_id"),
        right_on=("surface", "cand_entity_id"),
    )

    def _fill(t: pa.Table) -> pa.Table:
        rnk = pc.fill_null(pc.cast(t["rnk"], pa.int64()), 0)
        return pa.Table.from_arrays([rnk], names=["rnk"])

    filled = joined.map_batches(_fill, batch_format="pyarrow", zero_copy_batch=True)
    return drop_empty_blocks(filled.groupby("rnk").count()).map_batches(
        lambda t: t.rename_columns(["rnk", "n_mentions"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def hard_negatives(sf_dir: str):
    """(mention_id, entity_id, rnk): top-k NON-gold candidates per mention
    (A4-analog of mention_hard_negatives accumulation,
    /root/reference/utils_e2e_span.py:432-461 — gold excluded like the
    ``include_positive`` branch excludes the positive)."""
    gold, _kb = _corpus_tables(sf_dir)
    topk = drop_empty_blocks(
        _kb_topk(sf_dir).map_batches(
            lambda t: t.select(["surface", "entity_id", "rnk"]).rename_columns(
                ["surface", "cand_entity_id", "rnk"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    joined = gold.join(
        topk, "inner", num_partitions=shuffle_partitions(), on=("surface",)
    )

    def _non_gold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = t.filter(pc.not_equal(t["entity_id"], t["cand_entity_id"]))
        return pa.Table.from_arrays(
            [kept["mention_id"], kept["cand_entity_id"], kept["rnk"]],
            names=["mention_id", "entity_id", "rnk"],
        )

    return joined.map_batches(_non_gold, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_candidates(sf_dir: str):
    """Top-k TF-IDF-retrieved KB candidates per distinct mention surface
    (the reference's use_tfidf_candidates strategy, run_e2e_span.py:868)."""
    gold, kb = _corpus_tables(sf_dir)
    return tfidf_link_topk(_distinct_surfaces(gold), kb)


# --------------------------------------------------------------------------
# Iterative hard-negative mining loop (train-path A4 parity)
# --------------------------------------------------------------------------

_NEG_SCHEMA = pa.schema(
    [
        ("mention_id", pa.string()),
        ("entity_id", pa.string()),
        ("rnk", pa.int64()),
        ("round", pa.int64()),
    ]
)


def _topm_per_mention(t: pa.Table, m: int, rnd: int) -> pa.Table:
    """One hash partition (complete mention groups) -> lowest-``m``-rank
    rows per mention, tagged with the round number.  In-task sort + numpy
    run detection; no per-group Python."""
    import pyarrow.compute as pc

    if t.num_rows == 0 or "mention_id" not in t.column_names:
        return _NEG_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t, sort_keys=[("mention_id", "ascending"), ("rnk", "ascending")]
    )
    t = t.take(idx)
    mid = t["mention_id"].to_numpy(zero_copy_only=False)
    n = len(mid)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = mid[1:] != mid[:-1]
    starts = np.flatnonzero(change)
    rid = np.cumsum(change) - 1
    pos = np.arange(n) - starts[rid]
    kept = t.filter(pa.array(pos < m))
    return pa.Table.from_arrays(
        [
            kept["mention_id"],
            kept["entity_id"].cast(pa.string()),
            kept["rnk"].cast(pa.int64()),
            pa.array(np.full(kept.num_rows, rnd, dtype=np.int64)),
        ],
        schema=_NEG_SCHEMA,
    )


def mine_negative_rounds(sf_dir: str, workdir: str, rounds: int = 3,
                         per_round: int = 3):
    """Iterative mine -> checkpoint -> exclude -> re-mine loop.

    The reference regenerates training features every epoch with freshly
    mined hard negatives (/root/reference/run_e2e_span.py:297-317),
    accumulating ``mention_hard_negatives`` so each epoch's mining
    excludes negatives already taken (/root/reference/
    utils_e2e_span.py:432-461).  Data-plane recast: round ``r`` mines the
    top-``per_round`` non-gold candidates per mention, anti-joined
    against the UNION of all earlier rounds' checkpointed negatives (the
    K5 state), and checkpoints the round via ``run_stage`` — a killed
    loop resumes from the completed rounds without recompute and
    reproduces identical rows.

    Returns a list of per-round Datasets with schema
    (mention_id, entity_id, rnk, round).
    """
    import hashlib as _hl

    from biomedical_el_ray.stages.checkpoint import run_stage
    from biomedical_el_ray.util import ensure_hash_shuffle

    gold, kb = _corpus_tables(sf_dir)
    surfaces = _distinct_surfaces(gold)
    out: list = []
    chain = _hl.sha256(
        f"negrounds-v1|{sf_dir}|{rounds}|{per_round}".encode()
    ).hexdigest()
    for r in range(rounds):
        chain = _hl.sha256(f"{chain}|round{r}".encode()).hexdigest()
        prev = list(out)  # rounds < r, already checkpointed

        def _builder(r=r, prev=prev):
            # enough depth that >= per_round non-gold survive the gold +
            # used-set exclusions (at most 1 gold per mention ranks in-k)
            k_needed = per_round * (r + 1) + 1
            topk = drop_empty_blocks(
                link_topk(surfaces, kb, k=k_needed).map_batches(
                    lambda t: t.select(["surface", "entity_id", "rnk"])
                    .rename_columns(["surface", "cand_entity_id", "rnk"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            cands = gold.join(
                topk, "inner", num_partitions=shuffle_partitions(),
                on=("surface",),
            )

            def _non_gold(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                kept = t.filter(
                    pc.not_equal(t["entity_id"], t["cand_entity_id"])
                )
                return pa.Table.from_arrays(
                    [
                        kept["mention_id"],
                        kept["cand_entity_id"].cast(pa.string()),
                        kept["rnk"].cast(pa.int64()),
                    ],
                    names=["mention_id", "entity_id", "rnk"],
                )

            fresh = cands.map_batches(
                _non_gold, batch_format="pyarrow", zero_copy_batch=True
            )
            if prev:
                used = prev[0]
                for p in prev[1:]:
                    used = used.union(p)
                used = used.map_batches(
                    lambda t: pa.Table.from_arrays(
                        [t["mention_id"], t["entity_id"],
                         pa.array(np.ones(t.num_rows, dtype=np.int8))],
                        names=["u_mid", "u_eid", "u_flag"],
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                joined = fresh.join(
                    used, "left_outer",
                    num_partitions=shuffle_partitions(),
                    on=("mention_id", "entity_id"),
                    right_on=("u_mid", "u_eid"),
                )

                def _unused(t: pa.Table) -> pa.Table:
                    import pyarrow.compute as pc

                    kept = t.filter(pc.is_null(t["u_flag"]))
                    return kept.select(["mention_id", "entity_id", "rnk"])

                fresh = joined.map_batches(
                    _unused, batch_format="pyarrow", zero_copy_batch=True
                )
            fresh = ensure_hash_shuffle(fresh)
            return fresh.repartition(
                shuffle_partitions(), keys=["mention_id"]
            ).map_batches(
                _topm_per_mention,
                fn_kwargs={"m": per_round, "rnd": r},
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )

        ds, _resumed = run_stage(workdir, f"negatives_round_{r}", chain, _builder)
        out.append(ds)
    return out


def hard_negative_rounds(sf_dir: str, rounds: int = 2, per_round: int = 3):
    """(mention_id, entity_id, rnk, round) — union of the iterative
    mining loop's per-round checkpoints.  With the static candidate
    scorer, round r's output is exactly per-mention non-gold rank
    positions (r*per_round, (r+1)*per_round] — which is what the DuckDB
    oracle (``hard_negative_rounds`` entry in ``oracle_sql()``) computes
    in one pass, so the loop's exclusion semantics are oracle-checked."""
    import hashlib
    import tempfile

    d = str(ensure_corpus_for_sf_dir(sf_dir))
    tag = hashlib.sha256(f"{d}|{rounds}|{per_round}".encode()).hexdigest()[:16]
    workdir = os.path.join(tempfile.gettempdir(), "bel_ray_negrounds", tag)
    parts = mine_negative_rounds(sf_dir, workdir, rounds, per_round)
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def link_quality(sf_dir: str):
    """One-row ranking-metric summary over the top-k linker: P@1, MAP
    (== MRR with a single gold per mention), R@5, R@10
    (/root/reference/run_e2e_span.py:617-663 — commented out there).

    Computed from the (tiny, <= k+1 rows) rank histogram so the heavy
    part reuses the oracle-green candidate machinery; the reciprocal-rank
    sum uses integer micro-units (floor(1e6/rnk)) so the result is
    independent of summation order."""
    hist = candidate_rank_histogram(sf_dir)
    t = pa.concat_tables(
        [b for b in hist.iter_batches(batch_format="pyarrow")]
        or [pa.table({"rnk": pa.array([], pa.int64()),
                      "n_mentions": pa.array([], pa.int64())})]
    )
    rnk = t["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t["n_mentions"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(cnt.sum())
    found = rnk >= 1
    n1 = int(cnt[rnk == 1].sum())
    n5 = int(cnt[found & (rnk <= 5)].sum())
    n10 = int(cnt[found & (rnk <= 10)].sum())
    rr_micro = int((cnt[found] * (1_000_000 // rnk[found])).sum())
    nd = float(max(n, 1))
    return pa.table(
        {
            "n_mentions": pa.array([n], pa.int64()),
            "n_at_1": pa.array([n1], pa.int64()),
            "n_at_5": pa.array([n5], pa.int64()),
            "n_at_10": pa.array([n10], pa.int64()),
            "rr_micro": pa.array([rr_micro], pa.int64()),
            "p_at_1": pa.array([round(n1 / nd, 6)], pa.float64()),
            "r_at_5": pa.array([round(n5 / nd, 6)], pa.float64()),
            "r_at_10": pa.array([round(n10 / nd, 6)], pa.float64()),
            "map_r": pa.array([round(rr_micro / 1_000_000.0 / nd, 6)], pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# cross-encoder rerank (retrieve-then-rerank second stage)
# --------------------------------------------------------------------------

RERANK_K = 5


class CrossRerankLinker:
    """Actor-pool retrieve-then-RERANK stage: the first stage retrieves
    ``retrieve_k`` candidates per surface (the proven ``KBLinker``
    Jaro-Winkler plan), the second rescores each (surface, name) pair
    with a pluggable CROSS scorer loaded once per actor from
    ``stages.model_embed.CROSS_SCORERS`` and cuts to ``k`` — the
    standard two-tower-retrieve / cross-encoder-rerank retrieval layout
    (the reference's own shape: dual-encoder candidates re-scored by the
    joint forward, modeling_e2e_span.py:210-232).  Retrieval, name
    lookup, scoring and the re-rank all stay inside the task; only the
    final k rows per surface leave."""

    def __init__(self, kb_ref, scorer="hash-ce",
                 k: int = RERANK_K, retrieve_k: int = LINK_TOPK):
        from biomedical_el_ray.stages.model_embed import CROSS_SCORERS

        kb = ray.get(kb_ref) if isinstance(kb_ref, ray.ObjectRef) else kb_ref
        self._linker = KBLinker(kb_ref=kb, k=retrieve_k)
        # a registry name resolves worker-side (loaders must be importable,
        # as with MODEL_LOADERS); a factory/instance ships pickled — the
        # seam for ad-hoc scorers that are not registered on every worker
        if isinstance(scorer, str):
            self._scorer = CROSS_SCORERS[scorer]()
        elif isinstance(scorer, type) or (
            callable(scorer) and not hasattr(scorer, "score_pairs")
        ):
            self._scorer = scorer()
        else:
            self._scorer = scorer
        self._kb_ids = kb["entity_id"].combine_chunks()
        self._kb_names = kb["name"].combine_chunks()
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.schema([
            ("surface", pa.string()), ("entity_id", pa.string()),
            ("rnk", pa.int64()), ("ce_score", pa.int64()),
        ]).empty_table()
        cands = self._linker(batch)
        if cands.num_rows == 0:
            return empty
        names = self._kb_names.take(
            pc.index_in(cands["entity_id"], value_set=self._kb_ids))
        sc = self._scorer.score_pairs(
            cands["surface"].combine_chunks(), names)
        t = pa.table({
            "surface": cands["surface"],
            "entity_id": cands["entity_id"],
            "ce_score": pa.array(sc, pa.int64()),
        }).sort_by([
            ("surface", "ascending"), ("ce_score", "descending"),
            ("entity_id", "ascending"),
        ])
        s = t["surface"].combine_chunks()
        n = len(s)
        new = np.ones(n, bool)
        new[1:] = np.asarray(pc.not_equal(s.slice(1), s.slice(0, n - 1)))
        starts = np.flatnonzero(new)
        runlen = np.diff(np.append(starts, n))
        rnk = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen) + 1
        keep = rnk <= self.k
        t = t.filter(pa.array(keep)).append_column(
            "rnk", pa.array(rnk[keep]))
        return t.select(["surface", "entity_id", "rnk", "ce_score"])


def rerank_topk(sf_dir: str, scorer: str = "hash-ce", k: int = RERANK_K,
                retrieve_k: int = LINK_TOPK, batch_size: int = 1024):
    """(surface, entity_id, rnk, ce_score) — cross-encoder rerank of the
    KB retrieval: top-``retrieve_k`` Jaro-Winkler candidates per distinct
    surface, rescored pairwise by the ``scorer`` cross model and cut to
    top-``k``.  With the default deterministic ``hash-ce`` standin the
    whole chain is DuckDB-expressible (both hash sides <= 64 utf-8
    bytes); ``scorer="msmarco-minilm"`` swaps in the real torch
    cross-encoder behind the same actor-pool seam (import-gated, one
    model load per actor — pass GPU resources through map_batches on a
    GPU cluster)."""
    gold, kb = _corpus_tables(sf_dir)
    name_idx = kb.schema.get_field_index("name")
    kb = kb.set_column(
        name_idx, "name", truncate_name_tokens(kb["name"], MAX_NAME_TOKENS)
    )
    ref = ray.put(kb)
    return _distinct_surfaces(gold).map_batches(
        CrossRerankLinker,
        fn_constructor_kwargs={
            "kb_ref": ref, "scorer": scorer, "k": k,
            "retrieve_k": retrieve_k,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=resolve_concurrency(None),
    )


def rerank_topk_oracle_sql(corpus_dir: str, k: int = RERANK_K,
                           retrieve_k: int = LINK_TOPK) -> str:
    """DuckDB twin of the hash-ce rerank: the proven JW top-k CTE
    retrieves, both hash sides go through the multilinear short-string
    CTE (surfaces and truncated KB names are <= 64 utf-8 bytes), and the
    re-rank window orders by the masked XOR score."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    hs_cte, hs_rel = hash64_short_cte(
        "surf", [], "rrs", tok_col="surface", out_col="hs")
    hn_cte, hn_rel = hash64_short_cte(
        "kbt", ["entity_id"], "rrn", tok_col="name", out_col="hn")
    return f"""
        WITH kbt AS (
          SELECT entity_id,
                 CASE WHEN length(regexp_extract_all(name, '\\S+')) > 128
                      THEN array_to_string(regexp_extract_all(name, '\\S+')[1:128], ' ')
                      ELSE name END AS name
          FROM read_parquet('{corpus_dir}/entities.parquet')),
        surf AS (
          SELECT DISTINCT surface
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        r AS (
          SELECT s.surface, t.entity_id,
                 row_number() OVER (
                   PARTITION BY s.surface
                   ORDER BY jaro_winkler_similarity(s.surface, t.name) DESC,
                            t.entity_id) AS rn
          FROM surf s CROSS JOIN kbt t),
        topr AS (SELECT surface, entity_id FROM r WHERE rn <= {retrieve_k}),
        {hs_cte},
        {hn_cte},
        scored AS (
          SELECT c.surface, c.entity_id,
                 CAST(xor(hq.hs, hd.hn) & 9223372036854775807::HUGEINT
                      AS BIGINT) AS ce_score
          FROM topr c
          JOIN {hs_rel} hq ON hq.surface = c.surface
          JOIN {hn_rel} hd ON hd.entity_id = c.entity_id),
        rr AS (
          SELECT surface, entity_id, ce_score,
                 row_number() OVER (
                   PARTITION BY surface
                   ORDER BY ce_score DESC, entity_id) AS rn2
          FROM scored)
        SELECT surface, entity_id, CAST(rn2 AS BIGINT) AS rnk, ce_score
        FROM rr WHERE rn2 <= {k}
    """

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
"""

from __future__ import annotations

import os

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


def link_topk(surfaces_ds, kb: pa.Table, k: int = LINK_TOPK, batch_size: int = 1024,
              max_name_tokens: int = MAX_NAME_TOKENS):
    """surfaces Dataset -> (surface, entity_id, rnk, sim_r) top-k Dataset.

    KB names are token-truncated ONCE on the driver before the broadcast
    (M8-analog, /root/reference/utils_e2e_span.py:166-170), so overlong
    aliases cannot skew the Jaro-Winkler candidate scoring."""
    name_idx = kb.schema.get_field_index("name")
    kb = kb.set_column(
        name_idx, "name", truncate_name_tokens(kb["name"], max_name_tokens)
    )
    ref = ray.put(kb)
    return surfaces_ds.map_batches(
        KBLinker,
        fn_constructor_kwargs={"kb_ref": ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=resolve_concurrency(None),
    )


# --------------------------------------------------------------------------
# driver-contract queries
# --------------------------------------------------------------------------

def entity_link_topk(sf_dir: str):
    """Top-k KB candidates per distinct mention surface (T1/J3-analog)."""
    gold, kb = _corpus_tables(sf_dir)
    return link_topk(_distinct_surfaces(gold), kb)


def entity_link_top1(sf_dir: str):
    """(mention_id, entity_id, sim_r): argmax link per mention (T2-analog).

    Surface-level top-1 (small domain) joined back to mentions by one hash
    join — same assign-by-surface pattern as the flagship clusterer.
    """
    gold, kb = _corpus_tables(sf_dir)
    top1 = link_topk(_distinct_surfaces(gold), kb, k=1)

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

    gold, kb = _corpus_tables(sf_dir)
    topk = drop_empty_blocks(
        link_topk(_distinct_surfaces(gold), kb).map_batches(
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
    gold, kb = _corpus_tables(sf_dir)
    topk = drop_empty_blocks(
        link_topk(_distinct_surfaces(gold), kb).map_batches(
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

"""neleval-style end-to-end linking measures (strong / overlap matching).

The reference evaluates its gold/pred TSVs externally with the public
``neleval`` tool using ``strong_all_match`` (exact span + exact KB id)
and ``overlap-maxmax::span+kbid`` (overlapping span + exact KB id)
(/root/reference/README.md tail).  This module computes both measures
inside the engine over the synthetic corpus:

* ``strong_all_match`` — a gold mention counts as matched iff some
  predicted mention has the identical (conv, turn, start, end) span in
  normalized coordinates AND the identical linked KB id.
* ``overlap_maxmax`` — a (gold, pred) pair is admissible iff their spans
  overlap and KB ids agree; the matching is the deterministic
  "mutual-first" rule: gold g pairs with pred p iff p is g's first
  admissible pred in (start, end, pred_id) order AND g is p's first
  admissible gold in (start, end, gold_id) order.  This reproduces
  neleval's one-to-one overlap matching on all non-degenerate data (a
  mention set would need crossing double-overlaps with equal KB ids for
  greedy-maximal and mutual-first to diverge).

Both measures are micro-averaged: P = tp/n_pred, R = tp/n_gold,
F1 = 2*tp/(n_gold + n_pred).  Predictions are the engine's own
gazetteer extraction linked to its top-1 KB candidate — the exact
pred-side provenance of the reference's TSV (run_e2e_span.py:570-575).

Scale shape: ONE keyed repartition on conv_id; the matcher runs
vectorized per partition (numpy run detection, tiny per-turn loops);
only 4 counters per partition leave the tasks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.sources.readers import read_parquet_spread
from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.stages.mentions import extract_mentions, mentions_cte
from biomedical_el_ray.stages.normalize import normalize_transcripts
from biomedical_el_ray.util import (
    drop_empty_blocks,
    ensure_hash_shuffle,
    shuffle_partitions,
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("n_gold", pa.int64()),
        ("n_pred", pa.int64()),
        ("tp_strong", pa.int64()),
        ("tp_overlap", pa.int64()),
    ]
)


def _match_partition(t: pa.Table) -> pa.Table:
    """One hash partition (complete conversations) -> one partial-count row.

    Input columns: conv_id, turn_idx, start, end, kb, mid, src ('g'/'p').
    """
    if t.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("src", "ascending"), ("start", "ascending"),
            ("end", "ascending"), ("mid", "ascending"),
        ],
    )
    t = t.take(idx)
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    start = t["start"].to_numpy(zero_copy_only=False)
    end = t["end"].to_numpy(zero_copy_only=False)
    kb = t["kb"].to_numpy(zero_copy_only=False)
    src = t["src"].to_numpy(zero_copy_only=False)
    n = len(conv)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])
    tstarts = np.flatnonzero(change)
    tends = np.append(tstarts[1:], n)
    is_gold = src == "g"
    n_gold = int(np.count_nonzero(is_gold))
    n_pred = n - n_gold
    tp_strong = tp_overlap = 0
    for lo, hi in zip(tstarts, tends):
        k = lo + int(np.count_nonzero(is_gold[lo:hi]))  # 'g' sorts first
        if k == lo or k == hi:  # gold-only or pred-only turn: no matches
            continue
        gs, ge, gkb = start[lo:k], end[lo:k], kb[lo:k]
        ps, pe, pkb = start[k:hi], end[k:hi], kb[k:hi]
        pred_set = set(zip(ps, pe, pkb))
        tp_strong += sum(
            (s, e, c) in pred_set for s, e, c in zip(gs, ge, gkb)
        )
        # mutual-first overlap matching (both sides already in
        # (start, end, id) order from the global sort)
        gfirst = np.full(len(gs), -1, dtype=np.int64)
        pfirst = np.full(len(ps), -1, dtype=np.int64)
        for gi in range(len(gs)):
            for pj in range(len(ps)):
                if pe[pj] > gs[gi] and ps[pj] < ge[gi] and pkb[pj] == gkb[gi]:
                    if gfirst[gi] < 0:
                        gfirst[gi] = pj
                    if pfirst[pj] < 0:
                        pfirst[pj] = gi
        tp_overlap += int(
            sum(
                1
                for gi in range(len(gs))
                if gfirst[gi] >= 0 and pfirst[gfirst[gi]] == gi
            )
        )
    return pa.Table.from_arrays(
        [
            pa.array([n_gold], pa.int64()),
            pa.array([n_pred], pa.int64()),
            pa.array([tp_strong], pa.int64()),
            pa.array([tp_overlap], pa.int64()),
        ],
        schema=_PARTIAL_SCHEMA,
    )


def _metric_row(measure: str, tp: int, n_gold: int, n_pred: int) -> dict:
    p = round(tp / n_pred, 6) if n_pred else 0.0
    r = round(tp / n_gold, 6) if n_gold else 0.0
    f1 = round(2.0 * tp / (n_gold + n_pred), 6) if (n_gold + n_pred) else 0.0
    return {
        "measure": measure, "n_gold": n_gold, "n_pred": n_pred,
        "tp": tp, "p_r": p, "r_r": r, "f1_r": f1,
    }


def neleval_measures(sf_dir: str):
    """Two-row table: micro P/R/F1 for strong_all_match + overlap_maxmax."""
    return neleval_measures_corpus(str(ensure_corpus_for_sf_dir(sf_dir)))


def neleval_measures_corpus(corpus_dir: str):
    import pyarrow.parquet as pq
    import ray.data

    from biomedical_el_ray.pipelines.linking import link_topk
    from biomedical_el_ray.pipelines.windows import norm_offset_of

    d = corpus_dir
    t = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    pred = extract_mentions(
        normalize_transcripts(t), entities_path=os.path.join(d, "entities.parquet")
    )
    # top-1 KB link per distinct predicted surface (broadcast KB)
    kb = pq.read_table(
        os.path.join(d, "entities.parquet"), columns=["entity_id", "name"]
    )
    surfaces = drop_empty_blocks(
        pred.groupby("surface").count()
    ).select_columns(["surface"])
    top1 = drop_empty_blocks(
        link_topk(surfaces, kb, k=1).map_batches(
            lambda b: pa.Table.from_arrays(
                [b["surface"], b["entity_id"].cast(pa.string())],
                names=["l_surface", "kbid"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    pred_k = pred.join(
        top1, "inner", num_partitions=shuffle_partitions(),
        on=("surface",), right_on=("l_surface",),
    ).map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b["conv_id"], b["turn_idx"].cast(pa.int64()),
                b["start"].cast(pa.int64()), b["end"].cast(pa.int64()),
                b["kbid"], b["mention_id"],
                pa.array(["p"] * len(b), pa.string()),
            ],
            names=["conv_id", "turn_idx", "start", "end", "kb", "mid", "src"],
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # gold spans rebased raw -> normalized coordinates (same per-turn
    # offset map as span_overlap_eval_corpus)
    gold = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["mention_id", "conv_id", "turn_idx", "start", "end", "entity_id"],
    ).map_batches(
        lambda b: b.rename_columns(
            ["g_mid", "g_conv", "g_turn", "g_start", "g_end", "g_eid"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    turns = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    gjoin = gold.join(
        turns, "inner", num_partitions=shuffle_partitions(),
        on=("g_conv", "g_turn"), right_on=("conv_id", "turn_idx"),
    )

    def _rebase(b: pa.Table) -> pa.Table:
        convs = b["g_conv"].to_pylist()
        turnsx = b["g_turn"].to_pylist()
        starts = b["g_start"].to_pylist()
        ends = b["g_end"].to_pylist()
        texts = b["text"].to_pylist()
        maps: dict = {}
        ns, ne = [], []
        for c, t_, s, e, tx in zip(convs, turnsx, starts, ends, texts):
            m = maps.get((c, t_))
            if m is None:
                m = maps[(c, t_)] = norm_offset_of(tx)
            ns.append(int(m[s]))
            ne.append(int(m[e - 1]) + 1 if e > s else int(m[s]))
        return pa.Table.from_arrays(
            [
                pa.array(convs, pa.string()),
                pa.array(turnsx).cast(pa.int64()),
                pa.array(ns, pa.int64()),
                pa.array(ne, pa.int64()),
                b["g_eid"].cast(pa.string()),
                b["g_mid"],
                pa.array(["g"] * len(convs), pa.string()),
            ],
            names=["conv_id", "turn_idx", "start", "end", "kb", "mid", "src"],
        )

    gold_norm = gjoin.map_batches(
        _rebase, batch_format="pyarrow", zero_copy_batch=True
    )

    both = ensure_hash_shuffle(pred_k.union(gold_norm))
    partials = drop_empty_blocks(
        both.repartition(shuffle_partitions(), keys=["conv_id"]).map_batches(
            _match_partition,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    )
    # bounded reduce: one 4-int row per partition
    tot = pa.concat_tables(
        [b for b in partials.iter_batches(batch_format="pyarrow")]
        or [_PARTIAL_SCHEMA.empty_table()]
    )
    n_gold = int(pc.sum(tot["n_gold"]).as_py() or 0)
    n_pred = int(pc.sum(tot["n_pred"]).as_py() or 0)
    tp_s = int(pc.sum(tot["tp_strong"]).as_py() or 0)
    tp_o = int(pc.sum(tot["tp_overlap"]).as_py() or 0)
    rows = [
        _metric_row("strong_all_match", tp_s, n_gold, n_pred),
        _metric_row("overlap_maxmax", tp_o, n_gold, n_pred),
    ]
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


def neleval_oracle_sql(corpus_dir: str) -> str:
    """DuckDB equivalent: pred extraction via the recursive gazetteer CTE
    (``mentions_cte``), top-1 KB link via the JW window, gold rebase via
    the normalized-prefix-length expression, then the same two matching
    rules (EXISTS for strong; mutual-first double row_number for
    overlap)."""
    gold = f"read_parquet('{corpus_dir}/gold_mentions.parquet')"
    trans = f"read_parquet('{corpus_dir}/transcripts.parquet')"
    ents = f"read_parquet('{corpus_dir}/entities.parquet')"
    nprefix = (
        r"length(regexp_replace(trim(lower(substr(t.text, 1, {0}))),"
        r" '\s+', ' ', 'g'))"
    )
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)},
        pred0 AS (
          SELECT mention_id AS pid, conv_id, turn_idx,
                 start AS ps, "end" AS pe, surface
          FROM mres),
        kb AS (
          SELECT entity_id,
                 CASE WHEN length(regexp_extract_all(name, '\\S+')) > 128
                      THEN array_to_string(regexp_extract_all(name, '\\S+')[1:128], ' ')
                      ELSE name END AS name
          FROM {ents}),
        surf AS (SELECT DISTINCT surface FROM pred0),
        lr AS (
          SELECT s.surface, k.entity_id,
                 row_number() OVER (
                   PARTITION BY s.surface
                   ORDER BY jaro_winkler_similarity(s.surface, k.name) DESC,
                            k.entity_id) AS rn
          FROM surf s CROSS JOIN kb k),
        t1 AS (SELECT surface, entity_id AS kbid FROM lr WHERE rn = 1),
        pred AS (
          SELECT p.pid, p.conv_id, p.turn_idx, p.ps, p.pe, t1.kbid
          FROM pred0 p JOIN t1 USING (surface)),
        gm AS (
          SELECT g.mention_id AS gid, g.conv_id, g.turn_idx,
                 {nprefix.format('g.start + 1')} - 1 AS gs,
                 {nprefix.format('g."end"')} AS ge,
                 g.entity_id AS kbid
          FROM {gold} g
          JOIN {trans} t
            ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx),
        strong AS (
          SELECT count(*) AS tp FROM gm
          WHERE EXISTS (
            SELECT 1 FROM pred p
            WHERE p.conv_id = gm.conv_id AND p.turn_idx = gm.turn_idx
              AND p.ps = gm.gs AND p.pe = gm.ge AND p.kbid = gm.kbid)),
        pairs AS (
          SELECT gm.gid, p.pid,
                 row_number() OVER (
                   PARTITION BY gm.gid ORDER BY p.ps, p.pe, p.pid) AS rng,
                 row_number() OVER (
                   PARTITION BY p.pid ORDER BY gm.gs, gm.ge, gm.gid) AS rnp
          FROM gm JOIN pred p
            ON p.conv_id = gm.conv_id AND p.turn_idx = gm.turn_idx
           AND p.kbid = gm.kbid AND p.pe > gm.gs AND p.ps < gm.ge),
        ov AS (SELECT count(*) AS tp FROM pairs WHERE rng = 1 AND rnp = 1),
        tot AS (SELECT (SELECT count(*) FROM gm) AS n_gold,
                       (SELECT count(*) FROM pred) AS n_pred)
        SELECT 'strong_all_match' AS measure,
               CAST(n_gold AS BIGINT) AS n_gold,
               CAST(n_pred AS BIGINT) AS n_pred,
               CAST(strong.tp AS BIGINT) AS tp,
               coalesce(round(CAST(strong.tp AS DOUBLE) / nullif(n_pred, 0), 6), 0) AS p_r,
               coalesce(round(CAST(strong.tp AS DOUBLE) / nullif(n_gold, 0), 6), 0) AS r_r,
               coalesce(round(2.0 * strong.tp / nullif(n_gold + n_pred, 0), 6), 0) AS f1_r
        FROM tot, strong
        UNION ALL
        SELECT 'overlap_maxmax',
               CAST(n_gold AS BIGINT), CAST(n_pred AS BIGINT),
               CAST(ov.tp AS BIGINT),
               coalesce(round(CAST(ov.tp AS DOUBLE) / nullif(n_pred, 0), 6), 0),
               coalesce(round(CAST(ov.tp AS DOUBLE) / nullif(n_gold, 0), 6), 0),
               coalesce(round(2.0 * ov.tp / nullif(n_gold + n_pred, 0), 6), 0)
        FROM tot, ov
    """

"""Segmentation / windowing / span-eval queries (M5-M7, M15-M16, J5).

``segment_conversations`` is DuckDB-oracle checked (the greedy fold is
reproduced in SQL with a recursive CTE) and so is ``mention_windows``
(window_one's budget-spill arithmetic reproduced with list/window SQL,
see ``mention_windows_oracle_sql``); ``span_overlap_eval`` is oracle
checked too (``span_overlap_oracle_sql``: gazetteer extraction rides the
``mentions_oracle_sql`` recursive CTE, the raw->norm offset rebase and
the first-equal-else-first-overlap matcher are relational).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from biomedical_el_ray.sources.readers import read_parquet_spread

from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.stages.normalize import normalize_transcripts
from biomedical_el_ray.stages.windowing import mention_windows_batch, segment_turns
from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions


def _per_turn_stats(d) -> "ray.data.Dataset":
    """(conv_id, turn_idx, n_tokens, n_mentions) — token counts on the
    normalized text, mention counts from the gold table (left join, 0-fill)."""
    t = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    norm = normalize_transcripts(t)

    def _tok(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["norm_text"], pattern=r"\S+")
        return pa.Table.from_arrays(
            [b["conv_id"], b["turn_idx"], pc.cast(n, pa.int64())],
            names=["conv_id", "turn_idx", "n_tokens"],
        )

    toks = norm.map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)
    gold = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"), columns=["conv_id", "turn_idx"]
    )
    def _counts_cast(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["g_conv", "g_turn", "nm"])
        # hash-aggregate may promote the int32 key; restore for the join
        return b.set_column(1, "g_turn", pc.cast(b["g_turn"], pa.int32()))

    counts = drop_empty_blocks(
        gold.groupby(["conv_id", "turn_idx"]).count()
    ).map_batches(_counts_cast, batch_format="pyarrow", zero_copy_batch=True)
    joined = toks.join(
        counts,
        "left_outer",
        num_partitions=shuffle_partitions(),
        on=("conv_id", "turn_idx"),
        right_on=("g_conv", "g_turn"),
    )

    def _fill(b: pa.Table) -> pa.Table:
        nm = pc.fill_null(pc.cast(b["nm"], pa.int64()), 0)
        return pa.Table.from_arrays(
            [b["conv_id"], b["turn_idx"], b["n_tokens"], nm],
            names=["conv_id", "turn_idx", "n_tokens", "n_mentions"],
        )

    return joined.map_batches(_fill, batch_format="pyarrow", zero_copy_batch=True)


def segment_conversations(sf_dir: str):
    """(conv_id, seg_idx, turn_lo, turn_hi, n_turns, n_tokens, n_mentions)
    — greedy ≤8-mention / <256-token conversation chunking (M5-analog)."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    return segment_turns(_per_turn_stats(d))


def mention_windows(sf_dir: str):
    """(mention_id, window, tok_start, tok_end, bio) — [Ms]/[Me]-marked
    token windows with BIO tags per gold mention (M6/M7-analog)."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    gold = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["mention_id", "conv_id", "turn_idx", "start", "end"],
    )
    turns = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    ).map_batches(
        lambda b: b.rename_columns(["t_conv", "t_turn", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = gold.join(
        turns,
        "inner",
        num_partitions=shuffle_partitions(),
        on=("conv_id", "turn_idx"),
        right_on=("t_conv", "t_turn"),
    )
    return joined.map_batches(
        mention_windows_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"text_col": "text"},
    )


# --------------------------------------------------------------------------
# span-overlap evaluation (J5 / M16 analog)
# --------------------------------------------------------------------------

def mention_feature_rows(sf_dir: str):
    """(mention_id, input_ids, attention_mask, tag_ids) — fixed-width
    padded feature export per mention (M9 + M13 analog, ref
    utils_e2e_span.py:193-199,223-234; rows-only, hash vocab)."""
    from biomedical_el_ray.stages.features import mention_features

    return mention_features(mention_windows(sf_dir))


def mention_features_flat(sf_dir: str):
    """(mention_id, pos, input_id, att, tag_id) — the padded feature grid
    unnested to one row per cell, which makes every cell of the fixed-width
    export DuckDB-oracle checkable (``mention_features_oracle_sql``; list
    columns don't survive the driver's value-hash canonicalization, the
    flat form does)."""
    from biomedical_el_ray.stages.features import SEQ_LEN

    feats = mention_feature_rows(sf_dir)

    def _flat(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), SEQ_LEN)
        mids = t["mention_id"].combine_chunks().take(pa.array(idx))
        pos = np.tile(np.arange(SEQ_LEN, dtype=np.int64), n)
        cols = {
            name: t[name].combine_chunks().flatten()
            for name in ("input_ids", "attention_mask", "tag_ids")
        }
        return pa.Table.from_arrays(
            [
                mids,
                pa.array(pos, pa.int64()),
                cols["input_ids"],
                cols["attention_mask"],
                cols["tag_ids"],
            ],
            names=["mention_id", "pos", "input_id", "att", "tag_id"],
        )

    return feats.map_batches(_flat, batch_format="pyarrow", zero_copy_batch=True)


def mention_features_oracle_sql(corpus_dir: str) -> str:
    """DuckDB SQL equivalent of ``mention_features_flat``.

    Rides the ``mention_windows`` oracle for the window/tag geometry and
    ``hash64_short_cte`` (exact SQL reproduction of the engine's
    multilinear string hash) for the hash-vocab token ids; the pad/CLS/SEP
    grid, attention mask and marker-aware BIO alignment are pure CASE
    arithmetic over a mention x position cross join.  Valid for window
    tokens <= 64 utf-8 bytes (the vectorized-hash length class; windower
    tokens are whitespace words, far below the bound)."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte
    from biomedical_el_ray.stages.features import SEQ_LEN, VOCAB_SIZE

    hcte, hrel = hash64_short_cte("dt", [], "th_")
    cap = SEQ_LEN - 2
    mod = VOCAB_SIZE - 3
    return f"""
        WITH mw AS ({mention_windows_oracle_sql(corpus_dir)}),
        base AS (
          SELECT mention_id, "window" AS win,
                 tok_start AS ts, tok_end AS te,
                 CASE WHEN "window" = '' THEN 0
                      ELSE least(len(string_split("window", ' ')), {cap})
                 END AS kept
          FROM mw),
        tkx AS (
          SELECT mention_id, u.ii - 1 AS j, u.tok
          FROM (SELECT mention_id, kept,
                       unnest(list_transform(string_split(win, ' '),
                              (x, ii) -> {{'tok': x, 'ii': ii}})) AS u
                FROM base WHERE kept > 0) q
          WHERE u.ii <= kept),
        dt AS (SELECT DISTINCT tok FROM tkx),
        {hcte},
        tid AS (SELECT tok, 3 + CAST(h % {mod} AS BIGINT) AS id FROM {hrel}),
        grid AS (
          SELECT b.mention_id, g.p, b.ts, b.te, b.kept,
                 g.p - 1 AS j,
                 g.p - 1 - CASE WHEN g.p - 1 > b.ts THEN 1 ELSE 0 END
                         - CASE WHEN g.p - 1 > b.te + 1 THEN 1 ELSE 0 END AS bj
          FROM base b
          CROSS JOIN (SELECT unnest(generate_series(0, {SEQ_LEN - 1})) AS p) g),
        vals AS (
          SELECT g.mention_id, g.p AS pos,
                 CASE WHEN g.p = 0 THEN 1
                      WHEN g.p <= g.kept THEN t.id
                      WHEN g.p = g.kept + 1 THEN 2
                      ELSE 0 END AS input_id,
                 CASE WHEN g.p <= g.kept + 1 THEN 1 ELSE 0 END AS att,
                 CASE WHEN g.j >= 0 AND g.j < g.kept
                           AND NOT (g.j = g.ts AND g.te > g.ts)
                           AND NOT (g.j = g.te + 1 AND g.te > g.ts)
                      THEN CASE WHEN g.bj = g.ts AND g.te > g.ts THEN 1
                                WHEN g.bj > g.ts AND g.bj < g.te
                                     AND g.te > g.ts THEN 2
                                ELSE 0 END
                      ELSE -100 END AS tag_id
          FROM grid g
          LEFT JOIN tkx ON tkx.mention_id = g.mention_id AND tkx.j = g.j
          LEFT JOIN tid t ON t.tok = tkx.tok)
        SELECT mention_id, CAST(pos AS BIGINT) AS pos,
               CAST(input_id AS INTEGER) AS input_id,
               CAST(att AS TINYINT) AS att,
               CAST(tag_id AS INTEGER) AS tag_id
        FROM vals
    """


def norm_offset_of(text: str) -> np.ndarray:
    """raw-char-index -> norm-char-index map for the normalize() transform
    (lower + collapse whitespace runs + trim): the M5 offset-rebasing
    analog (/root/reference/data_preprocessing.py:119-120,156-157)."""
    out = np.empty(len(text) + 1, dtype=np.int64)
    npos = 0
    emitted_nonspace = False
    pending_space = False
    for i, ch in enumerate(text):
        out[i] = npos + (1 if pending_space else 0)
        if ch.isspace():
            if emitted_nonspace:
                pending_space = True
        else:
            if pending_space:
                npos += 1
                pending_space = False
            out[i] = npos
            npos += 1
            emitted_nonspace = True
    out[len(text)] = npos + (1 if pending_space else 0)
    return out


def _overlap_counts(pred: list, gold: list) -> tuple[int, int, int, int]:
    """(n_exact, n_partial, n_missed, n_spurious) between two span lists —
    partial-overlap semantics of find_partially_overlapping_spans
    (/root/reference/run_e2e_span.py:449-518: any overlap matches; gold
    left unmatched = missed, preds matching nothing = extraneous)."""
    n_exact = n_partial = 0
    matched_p = [False] * len(pred)
    for gs, ge in gold:
        best = None
        for j, (ps, pe) in enumerate(pred):
            if pe > gs and ps < ge:
                if (ps, pe) == (gs, ge):
                    best = ("exact", j)
                    break
                if best is None:
                    best = ("partial", j)
        if best is None:
            continue
        kind, j = best
        matched_p[j] = True
        if kind == "exact":
            n_exact += 1
        else:
            n_partial += 1
    n_missed = len(gold) - n_exact - n_partial
    n_spurious = matched_p.count(False)
    return n_exact, n_partial, n_missed, n_spurious


_SPAN_EVAL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_gold", pa.int64()),
        ("n_pred", pa.int64()),
        ("n_exact", pa.int64()),
        ("n_partial", pa.int64()),
        ("n_missed", pa.int64()),
        ("n_spurious", pa.int64()),
    ]
)


def _overlap_eval_partition(t: pa.Table) -> pa.Table:
    """One hash partition (complete conversations) -> per-conv overlap stats.

    In-task vectorized: one sort by (conv, turn, src, start, end), numpy
    run detection for turn and conversation boundaries, then the tiny
    per-turn matcher runs on array slices (spans per turn are O(1-10));
    per-conv sums accumulate into numpy arrays indexed by conv run id.
    No per-group pandas, no second shuffle for the conv-level rollup.
    """
    if t.num_rows == 0:
        return _SPAN_EVAL_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending"),
            ("src", "ascending"), ("start", "ascending"), ("end", "ascending"),
        ],
    )
    t = t.take(idx)
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    start = t["start"].to_numpy(zero_copy_only=False)
    end = t["end"].to_numpy(zero_copy_only=False)
    src = t["src"].to_numpy(zero_copy_only=False)
    n = len(conv)
    conv_change = np.empty(n, dtype=bool)
    conv_change[0] = True
    conv_change[1:] = conv[1:] != conv[:-1]
    crid = np.cumsum(conv_change) - 1            # conv run id per row
    n_convs = int(crid[-1]) + 1
    turn_change = conv_change.copy()
    turn_change[1:] |= turn[1:] != turn[:-1]
    tstarts = np.flatnonzero(turn_change)
    tends = np.append(tstarts[1:], n)
    is_gold = src == "g"
    out = np.zeros((n_convs, 6), dtype=np.int64)  # gold pred exact partial missed spurious
    for lo, hi in zip(tstarts, tends):
        k = lo + int(np.count_nonzero(is_gold[lo:hi]))  # 'g' sorts before 'p'
        g = list(zip(start[lo:k], end[lo:k]))
        p = list(zip(start[k:hi], end[k:hi]))
        ex, part, miss, spur = _overlap_counts(p, g)
        out[crid[lo]] += (len(g), len(p), ex, part, miss, spur)
    firsts = np.flatnonzero(conv_change)
    return pa.Table.from_arrays(
        [pa.array(conv[firsts], pa.string())]
        + [pa.array(out[:, j]) for j in range(6)],
        schema=_SPAN_EVAL_SCHEMA,
    )


def span_overlap_eval(sf_dir: str):
    """Per-conversation span-detection quality: predicted (gazetteer) vs
    gold spans, matched by interval overlap in normalized coordinates.

    Output: (conv_id, n_gold, n_pred, n_exact, n_partial, n_missed,
    n_spurious) — DuckDB-oracle checked (``span_overlap_oracle_sql``)."""
    return span_overlap_eval_corpus(ensure_corpus_for_sf_dir(sf_dir))


def span_overlap_eval_corpus(corpus_dir: str):
    """``span_overlap_eval`` over an explicit corpus directory (used by
    tests to drive the partial/missed/spurious matcher paths, which the
    default synthetic corpus — where extraction is perfect — never
    exercises)."""
    from biomedical_el_ray.stages.mentions import extract_mentions

    d = corpus_dir
    t = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    pred = extract_mentions(
        normalize_transcripts(t), entities_path=os.path.join(d, "entities.parquet")
    ).map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b["conv_id"], b["turn_idx"], b["start"], b["end"],
                pa.array(["p"] * len(b), pa.string()),
            ],
            names=["conv_id", "turn_idx", "start", "end", "src"],
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # gold spans rebased raw -> norm coordinates (per-turn offset map)
    gold = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["conv_id", "turn_idx", "start", "end"],
    ).map_batches(
        lambda b: b.rename_columns(["g_conv", "g_turn", "g_start", "g_end"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    turns = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    gjoin = gold.join(
        turns,
        "inner",
        num_partitions=shuffle_partitions(),
        on=("g_conv", "g_turn"),
        right_on=("conv_id", "turn_idx"),
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
                pa.array(turnsx, pa.int32()),
                pa.array(ns, pa.int32()),
                pa.array(ne, pa.int32()),
                pa.array(["g"] * len(convs), pa.string()),
            ],
            names=["conv_id", "turn_idx", "start", "end", "src"],
        )

    gold_norm = gjoin.map_batches(_rebase, batch_format="pyarrow", zero_copy_batch=True)

    from biomedical_el_ray.util import ensure_hash_shuffle

    both = ensure_hash_shuffle(pred.union(gold_norm))
    # ONE keyed repartition co-locates each conversation's pred+gold rows;
    # the matcher then runs over whole partitions with numpy run detection
    # (one task per partition, not one pandas call per (conv, turn) group —
    # the per-row-Python anti-pattern at 10^9-turn scale)
    return drop_empty_blocks(
        both.repartition(shuffle_partitions(), keys=["conv_id"]).map_batches(
            _overlap_eval_partition,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    )


# DuckDB reproduction of window_one's budget-spill arithmetic (validated
# exact-equal against mention_windows on the sf0.01 corpus, 26k windows);
# {C} is substituted with the corpus directory.  Structure: raw
# single-space split with positional offsets (cumulative length+1 over raw
# elements, so empty splits advance pos by 1 exactly like the Python
# tokenizer), overlap -> ts/te, then the prefix/suffix spill chain
# (utils_e2e_span.py:71-87 analog) and the T6 >20-token degenerate mask.
_MENTION_WINDOWS_ORACLE = """WITH j AS (
  SELECT g.mention_id, g.start AS mstart, g."end" AS mend, t.text
  FROM read_parquet('{C}/gold_mentions.parquet') g
  JOIN read_parquet('{C}/transcripts.parquet') t
    ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx),
raw AS (
  SELECT mention_id, mstart, mend,
         unnest(list_transform(string_split(text, ' '),
                               (x, ii) -> {'tok': x, 'ii': ii})) AS u
  FROM j),
rawx AS (
  SELECT mention_id, mstart, mend, u.tok AS tok, u.ii AS i FROM raw),
pos AS (
  SELECT mention_id, mstart, mend, tok, i,
         coalesce(sum(length(tok) + 1) OVER (
           PARTITION BY mention_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM rawx),
toks AS (
  SELECT mention_id, mstart, mend, tok,
         s, s + length(tok) AS e,
         row_number() OVER (PARTITION BY mention_id ORDER BY i) AS ti
  FROM pos WHERE tok <> ''),
agg AS (
  SELECT mention_id,
         list(tok ORDER BY ti) AS tl,
         count(*) AS ntoks,
         min(ti) FILTER (WHERE e > mstart AND s < mend) AS ts1,
         max(ti) FILTER (WHERE e > mstart AND s < mend) AS te1
  FROM toks GROUP BY mention_id),
calc AS (
  SELECT mention_id, tl, ntoks, ts1, te1,
         ts1 - 1 AS ts0,
         te1 - ts1 + 1 AS mlen,
         greatest(32 - mlen, 0) AS avail,
         avail // 2 AS want_pre,
         avail - want_pre AS want_suf,
         least(want_pre, ts0) AS pre0,
         least(want_suf + want_pre - pre0, ntoks - te1) AS suf,
         least(pre0 + greatest(want_suf - suf, 0), ts0) AS pre1,
         ts0 - pre1 AS lo0,
         te1 + suf AS hi0
  FROM agg),
final AS (
  SELECT mention_id,
         CASE WHEN ts1 IS NULL OR mlen > 20 THEN ''
              ELSE array_to_string(
                     list_slice(tl, lo0 + 1, ts0) || ['[Ms]']
                     || list_slice(tl, ts0 + 1, te1) || ['[Me]']
                     || list_slice(tl, te1 + 1, hi0), ' ') END AS window,
         CASE WHEN ts1 IS NULL OR mlen > 20 THEN 0 ELSE pre1 END AS tok_start,
         CASE WHEN ts1 IS NULL OR mlen > 20 THEN 0 ELSE pre1 + mlen END AS tok_end,
         CASE WHEN ts1 IS NULL OR mlen > 20 THEN ''
              ELSE array_to_string(list_filter([
                     rtrim(repeat('O ', CAST(pre1 AS INTEGER))),
                     'B' || CASE WHEN mlen > 1
                                 THEN ' ' || rtrim(repeat('I ', CAST(mlen - 1 AS INTEGER)))
                                 ELSE '' END,
                     rtrim(repeat('O ', CAST(hi0 - te1 AS INTEGER)))
                   ], x -> x <> ''), ' ') END AS bio
  FROM calc)
SELECT mention_id, "window",
       CAST(tok_start AS INTEGER) AS tok_start,
       CAST(tok_end AS INTEGER) AS tok_end, bio
FROM final
"""


def mention_windows_oracle_sql(corpus_dir: str) -> str:
    """Oracle SQL for ``mention_windows`` over the given corpus dir."""
    return _MENTION_WINDOWS_ORACLE.replace("{C}", str(corpus_dir))


def span_overlap_oracle_sql(corpus_dir: str) -> str:
    """DuckDB SQL equivalent of ``span_overlap_eval``.

    Predicted spans come from the gazetteer-extraction oracle
    (``mentions_oracle_sql``, embedded as a subquery); gold spans are
    rebased raw -> normalized coordinates relationally: for a non-space
    char at raw index ``i`` the normalized index is
    ``len(normalize(text[:i+1])) - 1`` (the char is the last non-space
    char of its normalized prefix), so ``gs = f(start+1) - 1`` and
    ``ge = f(end)`` reproduce ``norm_offset_of`` exactly.  The matcher
    (``_overlap_counts``) reduces to: per gold, the chosen pred is the
    first equal-coordinates pred if one exists, else the first
    overlapping pred in (start, end) order; spurious preds are those
    chosen by no gold in their turn."""
    from biomedical_el_ray.stages.mentions import mentions_oracle_sql

    mentions = mentions_oracle_sql(corpus_dir)
    gold = f"read_parquet('{corpus_dir}/gold_mentions.parquet')"
    trans = f"read_parquet('{corpus_dir}/transcripts.parquet')"
    nprefix = (
        r"length(regexp_replace(trim(lower(substr(t.text, 1, {0}))),"
        r" '\s+', ' ', 'g'))"
    )
    return f"""
        WITH pred AS (
          SELECT conv_id, turn_idx, start AS ps, "end" AS pe,
                 row_number() OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY start, "end") AS pj
          FROM ({mentions}) z),
        gm AS (
          SELECT g.mention_id, g.conv_id, g.turn_idx,
                 {nprefix.format('g.start + 1')} - 1 AS gs,
                 {nprefix.format('g."end"')} AS ge
          FROM {gold} g
          JOIN {trans} t
            ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx),
        jg AS (
          SELECT gm.mention_id, gm.conv_id, gm.turn_idx,
                 p.pj, (p.ps = gm.gs AND p.pe = gm.ge) AS ex
          FROM gm LEFT JOIN pred p
            ON p.conv_id = gm.conv_id AND p.turn_idx = gm.turn_idx
           AND p.pe > gm.gs AND p.ps < gm.ge),
        per_gold AS (
          SELECT mention_id, conv_id, turn_idx,
                 coalesce(max(CASE WHEN ex THEN 1 ELSE 0 END), 0) AS has_exact,
                 max(CASE WHEN pj IS NOT NULL THEN 1 ELSE 0 END) AS has_any,
                 coalesce(min(pj) FILTER (WHERE ex), min(pj)) AS cj
          FROM jg GROUP BY 1, 2, 3),
        turn_gold AS (
          SELECT conv_id, turn_idx, count(*) AS n_gold,
                 sum(has_exact) AS n_exact,
                 sum(CASE WHEN has_any = 1 AND has_exact = 0
                          THEN 1 ELSE 0 END) AS n_partial,
                 count(DISTINCT cj) AS n_matched
          FROM per_gold GROUP BY 1, 2),
        turn_pred AS (
          SELECT conv_id, turn_idx, count(*) AS n_pred
          FROM pred GROUP BY 1, 2),
        turn_all AS (
          SELECT coalesce(g.conv_id, p.conv_id) AS conv_id,
                 coalesce(g.n_gold, 0) AS n_gold,
                 coalesce(p.n_pred, 0) AS n_pred,
                 coalesce(g.n_exact, 0) AS n_exact,
                 coalesce(g.n_partial, 0) AS n_partial,
                 coalesce(g.n_gold, 0) - coalesce(g.n_exact, 0)
                   - coalesce(g.n_partial, 0) AS n_missed,
                 coalesce(p.n_pred, 0) - coalesce(g.n_matched, 0) AS n_spurious
          FROM turn_gold g FULL OUTER JOIN turn_pred p
            ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx)
        SELECT conv_id,
               CAST(sum(n_gold) AS BIGINT) AS n_gold,
               CAST(sum(n_pred) AS BIGINT) AS n_pred,
               CAST(sum(n_exact) AS BIGINT) AS n_exact,
               CAST(sum(n_partial) AS BIGINT) AS n_partial,
               CAST(sum(n_missed) AS BIGINT) AS n_missed,
               CAST(sum(n_spurious) AS BIGINT) AS n_spurious
        FROM turn_all GROUP BY conv_id
    """

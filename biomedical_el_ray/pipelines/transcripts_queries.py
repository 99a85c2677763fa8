"""Transcript-table query wrappers for the driver contract.

Each callable takes a driver ``sf_dir`` and runs over the deterministic
synthetic transcript corpus scaled to it (BASELINE.json input_hint: the
engine's primary input is the transcripts table, synthesized at small
scale for tests/benchmarks — the driver's TPC-H-ish dirs carry no
transcripts, so scale is mapped via sources.synthetic.spec_for_sf_dir).
"""

from __future__ import annotations

import os

import pyarrow as pa

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import run_linkage
from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts

import ray.data

from biomedical_el_ray.sources.readers import read_parquet_spread


def normalize_turns(sf_dir: str):
    """(conv_id, turn_idx, norm_text) — DuckDB-oracle-exact normalization."""
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"), columns=["conv_id", "turn_idx", "text"]
    )
    return normalize_transcripts(ds).map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "norm_text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def mentions_extracted(sf_dir: str):
    """mentions table (oracle: greedy gazetteer scan as a recursive CTE,
    ``stages.mentions.mentions_oracle_sql``).  Memoized per session
    (``util.memo_derived``): the resolved-mention deliverables re-join
    this table and used to re-run normalize+extract each."""
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    d = ensure_corpus_for_sf_dir(sf_dir)

    def _build():
        ensure_hash_shuffle()
        ds = read_parquet_spread(
            os.path.join(d, "transcripts.parquet"),
            columns=["conv_id", "turn_idx", "text"],
        )
        return extract_mentions(
            normalize_transcripts(ds),
            entities_path=os.path.join(d, "entities.parquet"),
        ).materialize()

    # re-patch the captured context on every hit: consumers join/repartition
    # this dataset and assume the hash-shuffle strategy
    return ensure_hash_shuffle(
        memo_derived(("tq_mentions_extracted", str(d)), _build))


def linkage_clusters(sf_dir: str):
    """Flagship pipeline output (mention_id, cluster_id) — oracle-exact:
    the default config's Rademacher projection makes every stage
    (extraction, blocking, scoring, clustering) DuckDB-expressible
    (``linkage_clusters_oracle_sql``).  The cluster map is memoized per
    session at its aggregate grain — every cluster-consuming query
    (crosswalk, timelines) shares one flagship execution, exactly as a
    checkpointed production run reads the stage output once."""
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    d = ensure_corpus_for_sf_dir(sf_dir)
    return ensure_hash_shuffle(memo_derived(
        ("tq_linkage_clusters", str(d)),
        lambda: run_linkage(str(d), PipelineConfig())["clusters"].materialize(),
    ))


def linkage_scored_pairs(sf_dir: str):
    """Flagship scored candidate pairs, canonical rounded form
    (id_lo, id_hi, jw_r, lev, emb_r, score_r) — oracle-exact.

    ``block_key`` (a physical artifact: salted sub-keys for hot blocks)
    is not part of the logical result and is dropped here; the full raw
    schema remains available via ``run_linkage(keep_scored=True)``."""
    import numpy as np

    d = ensure_corpus_for_sf_dir(sf_dir)
    scored = run_linkage(str(d), PipelineConfig(), keep_scored=True)["scored"]

    def _round(t: pa.Table) -> pa.Table:
        def r6(col):
            return pa.array(
                np.round(col.to_numpy(zero_copy_only=False).astype(np.float64), 6)
            )

        return pa.Table.from_arrays(
            [
                t["id_lo"], t["id_hi"],
                r6(t["jw"]),
                t["lev"].cast(pa.int64()),
                r6(t["emb_sim"]),
                r6(t["score"]),
            ],
            names=["id_lo", "id_hi", "jw_r", "lev", "emb_r", "score_r"],
        )

    return scored.map_batches(_round, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# DuckDB oracles for the flagship queries
# --------------------------------------------------------------------------

def _sids_cte() -> tuple[str, str]:
    """CTE chain (after the ``surf`` relation exists) ending in
    ``sids(surface, sid)`` — the engine's content-derived surface id
    ``~s:<hash64 hex>`` (``linkage._sid_batch``), via the multilinear
    string-hash reproduction ``hash64_short_cte`` (valid for surfaces
    <= 64 utf-8 bytes; synthetic entity aliases are bounded well below)."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    t, rel = hash64_short_cte("surf", [], "hs", tok_col="surface", out_col="h")
    return f"""{t},
        sids AS MATERIALIZED (
          SELECT surface,
                 '~s:' || lower(lpad(hex(CAST(h AS UBIGINT)), 16, '0')) AS sid
          FROM {rel})""", "sids"


def linkage_scored_pairs_oracle_sql(corpus_dir: str) -> str:
    """Mention extraction (recursive gazetteer CTE) -> distinct surfaces ->
    blocking/pair-gen/scoring CTE (``linkage_emb.scored_pairs_cte``) ->
    sid-canonical rounded pair rows.  The engine stores jw/emb/score as
    float32; ``CAST(x AS FLOAT)`` reproduces that rounding before the
    round-to-6."""
    from biomedical_el_ray.config import DEFAULT_CONFIG
    from biomedical_el_ray.pipelines.linkage_emb import scored_pairs_cte
    from biomedical_el_ray.stages.mentions import mentions_cte

    sids_t, _ = _sids_cte()
    f32r = "round(CAST(CAST({0} AS FLOAT) AS DOUBLE), 6)"
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)},
        {scored_pairs_cte("SELECT DISTINCT surface FROM mres", DEFAULT_CONFIG)},
        {sids_t}
        SELECT CASE WHEN a.sid < b.sid THEN a.sid ELSE b.sid END AS id_lo,
               CASE WHEN a.sid < b.sid THEN b.sid ELSE a.sid END AS id_hi,
               {f32r.format('t.jw')} AS jw_r,
               t.lev,
               {f32r.format('t.cos')} AS emb_r,
               {f32r.format('t.score')} AS score_r
        FROM lkscored t
        JOIN sids a ON a.surface = t.s_lo
        JOIN sids b ON b.surface = t.s_hi
    """


def linkage_clusters_oracle_sql(corpus_dir: str) -> str:
    """Full flagship end-to-end in SQL: extraction -> surfaces -> scored
    pairs -> threshold edges (the engine's quantized-cosine gate only
    removes provably sub-threshold pairs, so the edge set needs no gate)
    -> reachability components -> cluster_id = component min surface id ->
    one join labeling every mention."""
    from biomedical_el_ray.config import DEFAULT_CONFIG
    from biomedical_el_ray.pipelines.linkage_emb import scored_pairs_cte
    from biomedical_el_ray.stages.mentions import mentions_cte

    from biomedical_el_ray.functions.sql_hash import reachability_cte

    thr = DEFAULT_CONFIG.score_threshold
    sids_t, _ = _sids_cte()
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {thr}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)},
        {scored_pairs_cte("SELECT DISTINCT surface FROM mres", DEFAULT_CONFIG)},
        {sids_t},
        {reach},
        comp AS (
          SELECT rc.s AS surface, min(d.sid) AS cluster_id
          FROM reach rc JOIN sids d ON d.surface = rc.r
          GROUP BY rc.s)
        SELECT m.mention_id, c.cluster_id
        FROM mres m JOIN comp c ON m.surface = c.surface
    """


def conversation_stats(sf_dir: str):
    """(conv_id, n_turns, n_user, n_assistant, n_tool_calls, n_roles,
    duration_s, total_chars) — per-conversation transcript profile (the
    input_hint's role/tool/ts columns as first-class signals: session
    auditing, agent-loop detection, context-budget planning).

    Scale shape: a per-batch Arrow hash-aggregate partial (one row per
    conv-per-batch crosses the shuffle, carrying only int64 counters and
    the ts extrema) then ONE bounded groupby combine — every partial is
    associative (sums, min, max), and derived columns (n_roles from the
    zero-ness of per-role counts, duration from the extrema) are computed
    after the combine, so the result is identical in any combine order.
    """
    import numpy as np

    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "role", "tool", "text", "ts"],
    )
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        def flag(cond):
            return pc.cast(pc.fill_null(cond, False), pa.int64())

        role = t["role"]
        prep = pa.Table.from_arrays(
            [
                t["conv_id"],
                flag(pc.equal(role, "user")),
                flag(pc.equal(role, "assistant")),
                flag(pc.equal(role, "tool")),
                flag(pc.not_equal(pc.fill_null(t["tool"], ""), "")),
                pc.cast(pc.utf8_length(pc.fill_null(t["text"], "")), pa.int64()),
                pc.cast(t["ts"], pa.int64()),
                pc.cast(t["ts"], pa.int64()),
            ],
            names=["conv_id", "u", "a", "r_tool", "tc", "chars",
                   "ts_min", "ts_max"],
        )
        g = prep.group_by("conv_id").aggregate(
            [("u", "sum"), ("a", "sum"), ("r_tool", "sum"), ("tc", "sum"),
             ("chars", "sum"), ("ts_min", "min"), ("ts_max", "max"),
             ("u", "count")]
        )
        return g.rename_columns(
            ["conv_id", "u", "a", "r_tool", "tc", "chars",
             "ts_min", "ts_max", "n"]
        )

    from ray.data.aggregate import Max, Min, Sum

    from biomedical_el_ray.util import drop_empty_blocks

    agg = drop_empty_blocks(
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(
            Sum("n"), Sum("u"), Sum("a"), Sum("r_tool"), Sum("tc"),
            Sum("chars"), Min("ts_min"), Max("ts_max"),
        )
    )

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            ["conv_id", "n_turns", "n_user", "n_assistant", "n_role_tool",
             "n_tool_calls", "total_chars", "ts_min", "ts_max"]
        )
        u = t["n_user"].to_numpy(zero_copy_only=False)
        a = t["n_assistant"].to_numpy(zero_copy_only=False)
        rt = t["n_role_tool"].to_numpy(zero_copy_only=False)
        n = t["n_turns"].to_numpy(zero_copy_only=False)
        other = n - u - a - rt
        n_roles = (u > 0).astype(np.int64) + (a > 0) + (rt > 0) + (other > 0)
        dur = (
            t["ts_max"].to_numpy(zero_copy_only=False)
            - t["ts_min"].to_numpy(zero_copy_only=False)
        ) // 1_000_000
        return pa.Table.from_arrays(
            [
                t["conv_id"], t["n_turns"], t["n_user"], t["n_assistant"],
                t["n_tool_calls"], pa.array(n_roles.astype(np.int64)),
                pa.array(dur.astype(np.int64)), t["total_chars"],
            ],
            names=["conv_id", "n_turns", "n_user", "n_assistant",
                   "n_tool_calls", "n_roles", "duration_s", "total_chars"],
        )

    return agg.map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)


def conversation_stats_oracle_sql(corpus_dir: str) -> str:
    """Exact DuckDB twin of ``conversation_stats``."""
    return f"""
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(*) FILTER (role = 'user') AS BIGINT) AS n_user,
               CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
                 AS n_assistant,
               CAST(count(*) FILTER (coalesce(tool, '') <> '') AS BIGINT)
                 AS n_tool_calls,
               CAST(count(DISTINCT CASE role
                      WHEN 'user' THEN 'user'
                      WHEN 'assistant' THEN 'assistant'
                      WHEN 'tool' THEN 'tool'
                      ELSE 'other' END) AS BIGINT) AS n_roles,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                    AS BIGINT) AS duration_s,
               CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars
        FROM read_parquet('{corpus_dir}/transcripts.parquet')
        GROUP BY conv_id
    """


# --------------------------------------------------------------------------
# Consecutive same-role turn collapsing
# --------------------------------------------------------------------------

def collapse_turns(sf_dir: str):
    """(conv_id, run_idx, role, turn_lo, turn_hi, n_turns, text) — merge
    each maximal run of consecutive same-role turns within a conversation
    into one row, text newline-joined in turn order.  The standard
    transcript-normalization step before tokenization/windowing (multiple
    assistant/tool messages in a row become one logical turn; the
    reference's title+abstract concatenation,
    /root/reference/data_preprocessing.py:34-43, is the same shape at
    document grain).

    Scale shape: ONE keyed repartition on a conv hash, then a fully
    vectorized in-task pass — sort by (conv_id, turn_idx), boundary mask
    (conv change | role change), run aggregation via ``np.add.reduceat``
    for counts/extents and an Arrow ``ListArray`` + ``binary_join`` for
    the concatenated text (the text bytes are never touched row-by-row).
    """
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text"],
    )
    return collapse_turns_ds(ds)


def collapse_turns_ds(ds):
    """Dataset form of :func:`collapse_turns` (same schema contract:
    conv_id, turn_idx, role, text)."""
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    def _ckey(t: pa.Table) -> pa.Table:
        ck = hash64_column(t["conv_id"]).view(np.int64)
        return t.append_column("ckey", pa.array(ck, pa.int64()))

    def _collapse(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.string())],
            names=["conv_id", "run_idx", "role", "turn_lo", "turn_hi",
                   "n_turns", "text"],
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = t["conv_id"].combine_chunks()
        role = pc.fill_null(t["role"], "").combine_chunks()
        tix = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        conv_brk = np.ones(n, bool)
        conv_brk[1:] = ~pc.equal(
            conv.slice(1), conv.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        role_brk = np.ones(n, bool)
        role_brk[1:] = ~pc.equal(
            role.slice(1), role.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        brk = conv_brk | role_brk
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        # run_idx = per-conversation 0-based run counter
        conv_starts = np.flatnonzero(conv_brk[starts])
        run_idx = np.arange(len(starts), dtype=np.int64)
        run_idx -= np.repeat(
            run_idx[conv_starts],
            np.diff(np.append(conv_starts, len(starts))),
        )
        counts = (ends - starts).astype(np.int64)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        text = pc.fill_null(t["text"], "").combine_chunks()
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, text), "\n")
        return pa.Table.from_arrays(
            [
                conv.take(starts), pa.array(run_idx, pa.int64()),
                role.take(starts),
                pa.array(tix[starts], pa.int64()),
                pa.array(tix[ends - 1], pa.int64()),
                pa.array(counts, pa.int64()),
                joined,
            ],
            names=["conv_id", "run_idx", "role", "turn_lo", "turn_hi",
                   "n_turns", "text"],
        )

    keyed = ensure_hash_shuffle(
        ds.map_batches(_ckey, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        keyed.repartition(shuffle_partitions(), keys=["ckey"])
        .map_batches(_collapse, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def collapse_turns_oracle_sql(corpus_dir: str) -> str:
    """Exact DuckDB twin via lag()-boundary + running-sum run numbering +
    ORDER BY string_agg."""
    return f"""
        WITH s AS (
          SELECT conv_id, turn_idx, coalesce(role, '') AS role,
                 coalesce(text, '') AS text,
                 CASE WHEN lag(coalesce(role, '')) OVER w
                        IS DISTINCT FROM coalesce(role, '')
                      THEN 1 ELSE 0 END AS brk
          FROM read_parquet('{corpus_dir}/transcripts.parquet')
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        r AS (
          SELECT *, sum(brk) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) - 1 AS run_idx
          FROM s)
        SELECT conv_id, CAST(run_idx AS BIGINT) AS run_idx,
               any_value(role) AS role,
               CAST(min(turn_idx) AS BIGINT) AS turn_lo,
               CAST(max(turn_idx) AS BIGINT) AS turn_hi,
               count(*) AS n_turns,
               string_agg(text, chr(10) ORDER BY turn_idx) AS text
        FROM r GROUP BY conv_id, run_idx
    """


# --------------------------------------------------------------------------
# Entity co-occurrence graph (per-conversation, exact fixed-point lift)
# --------------------------------------------------------------------------

def entity_cooccurrence(sf_dir: str, max_entities_per_conv: int = 1000,
                        counters: dict | None = None):
    """(e_lo, e_hi, n_ab, n_lo, n_hi, lift_ppm) — the entity co-occurrence
    graph over conversations: for every pair of entities appearing in the
    same conversation, the co-occurring-conversation count, both
    marginals, and the exact integer association lift
    ``N·n_ab·10⁶ // (n_a·n_b)`` (ppm of statistical independence — the
    monotone ``exp(PMI)`` transform, kept integral so the distributed
    result is combine-order-free and the DuckDB oracle bit-exact).
    The KB-graph analog of the reference's candidate co-mention structure
    (documents grouped per doc id, /root/reference/utils_e2e_span.py:44-58).

    Scale shape: per-batch distinct (conv, entity) partials, ONE keyed
    repartition on a conv hash, in-task run detection + per-conversation
    pair enumeration compacted by ``np.unique`` before leaving the task,
    per-partition marginal/total sentinel rows (the ``_census`` fold
    trick), ONE bounded multi-key groupby-sum, then a streaming final map
    with the marginal table broadcast via ``ray.put`` and joined by
    vectorized ``pc.index_in``.  A conversation with more than
    ``max_entities_per_conv`` distinct entities has its pair explosion
    dropped and counted (loudly, never silently) — marginals and the
    conversation total still include it.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import (
        Counters, drop_empty_blocks, ensure_hash_shuffle, shuffle_partitions,
    )

    d = ensure_corpus_for_sf_dir(sf_dir)
    gm = read_parquet_spread(
        os.path.join(d, "gold_mentions.parquet"),
        columns=["conv_id", "entity_id"],
    )
    cnt = Counters()
    handle = cnt.handle

    def _prep(t: pa.Table) -> pa.Table:
        dd = t.group_by(["conv_id", "entity_id"]).aggregate([])
        ck = hash64_column(dd["conv_id"]).view(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ck, pa.int64()), dd["conv_id"], dd["entity_id"]],
            names=["ckey", "conv_id", "entity_id"],
        )

    out_names = ["kind", "a", "b", "w"]
    out_schema = pa.schema(
        [("kind", pa.int8()), ("a", pa.string()), ("b", pa.string()),
         ("w", pa.int64())]
    )

    def _task(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.sort_by([("conv_id", "ascending"), ("entity_id", "ascending")])
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        ent = np.asarray(t["entity_id"].to_pylist(), dtype=object)
        n = len(conv)
        keep = np.ones(n, bool)  # cross-batch (conv, entity) dedup
        keep[1:] = (conv[1:] != conv[:-1]) | (ent[1:] != ent[:-1])
        conv, ent = conv[keep], ent[keep]
        # dictionary-encode entities for compact in-task pair counting
        edict, ecode = np.unique(ent, return_inverse=True)
        starts = np.flatnonzero(
            np.concatenate(([True], conv[1:] != conv[:-1])))
        ends = np.append(starts[1:], len(conv))
        sizes = ends - starts
        over = sizes > max_entities_per_conv
        if over.any():
            Counters.add(handle, {
                "dropped_oversized_convs": int(over.sum()),
                "dropped_oversized_conv_entities": int(sizes[over].sum()),
            })
        lo_parts, hi_parts = [], []
        for s, e in zip(starts[~over], ends[~over]):
            k = e - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            lo_parts.append(ecode[s + iu])
            hi_parts.append(ecode[s + ju])
        tables = []
        if lo_parts:
            lo = np.concatenate(lo_parts)
            hi = np.concatenate(hi_parts)
            # entity codes are sorted within a conv, so lo < hi already
            pairs, w = np.unique(
                lo.astype(np.int64) * len(edict) + hi, return_counts=True)
            tables.append(pa.Table.from_arrays(
                [
                    pa.array(np.zeros(len(pairs), np.int8)),
                    pa.array(edict[pairs // len(edict)], pa.string()),
                    pa.array(edict[pairs % len(edict)], pa.string()),
                    pa.array(w.astype(np.int64)),
                ],
                names=out_names,
            ))
        marg = np.bincount(ecode, minlength=len(edict)).astype(np.int64)
        tables.append(pa.Table.from_arrays(
            [
                pa.array(np.ones(len(edict), np.int8)),
                pa.array(edict, pa.string()),
                pa.array([""] * len(edict), pa.string()),
                pa.array(marg),
            ],
            names=out_names,
        ))
        tables.append(pa.Table.from_arrays(
            [
                pa.array([np.int8(2)]), pa.array([""], pa.string()),
                pa.array([""], pa.string()),
                pa.array([np.int64(len(starts))]),
            ],
            names=out_names,
        ))
        return pa.concat_tables(tables)

    from ray.data.aggregate import Sum

    prep = ensure_hash_shuffle(
        gm.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    )
    agg = (
        drop_empty_blocks(
            prep.repartition(shuffle_partitions(), keys=["ckey"])
            .map_batches(_task, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        )
        .groupby(["kind", "a", "b"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()
    )
    if counters is not None:
        counters.update(cnt.fetch())
    side = agg.filter(expr="kind > 0").take_all()
    n_convs = sum(r["w"] for r in side if r["kind"] == 2)
    ments = sorted(r["a"] for r in side if r["kind"] == 1)
    marg_map = {r["a"]: int(r["w"]) for r in side if r["kind"] == 1}
    ent_arr = pa.array(ments, pa.string())
    na_arr = np.array([marg_map[e] for e in ments], dtype=np.int64)
    side_ref = ray.put((ent_arr, na_arr, int(n_convs)))

    def _final(t: pa.Table) -> pa.Table:
        ents, na, nc = ray.get(side_ref)
        ia = pc.index_in(t["a"], value_set=ents).to_numpy(zero_copy_only=False)
        ib = pc.index_in(t["b"], value_set=ents).to_numpy(zero_copy_only=False)
        n_lo = na[ia]
        n_hi = na[ib]
        n_ab = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = n_ab.astype(object) * 1_000_000 * nc  # Python bigints: no
        lift = num // (n_lo.astype(object) * n_hi)  # overflow at any scale
        return pa.Table.from_arrays(
            [
                t["a"], t["b"], pa.array(n_ab),
                pa.array(n_lo), pa.array(n_hi),
                pa.array(lift.astype(np.int64)),
            ],
            names=["e_lo", "e_hi", "n_ab", "n_lo", "n_hi", "lift_ppm"],
        )

    return drop_empty_blocks(agg.filter(expr="kind == 0")).map_batches(
        _final, batch_format="pyarrow", zero_copy_batch=True
    )


def entity_cooccurrence_oracle_sql(corpus_dir: str) -> str:
    """Exact DuckDB twin: distinct (conv, entity) -> self-join pairs ->
    marginals -> HUGEINT lift."""
    return f"""
        WITH ce AS MATERIALIZED (
          SELECT DISTINCT conv_id, entity_id
          FROM read_parquet('{corpus_dir}/gold_mentions.parquet')),
        nn AS (SELECT count(DISTINCT conv_id) AS nc FROM ce),
        marg AS (SELECT entity_id, count(*) AS na FROM ce GROUP BY 1),
        pr AS (
          SELECT a.entity_id AS e_lo, b.entity_id AS e_hi,
                 count(*) AS n_ab
          FROM ce a JOIN ce b
            ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
          GROUP BY 1, 2)
        SELECT p.e_lo, p.e_hi, CAST(p.n_ab AS BIGINT) AS n_ab,
               CAST(ma.na AS BIGINT) AS n_lo, CAST(mb.na AS BIGINT) AS n_hi,
               CAST(CAST(p.n_ab AS HUGEINT) * 1000000 * nn.nc
                    // (ma.na * mb.na) AS BIGINT) AS lift_ppm
        FROM pr p
        JOIN marg ma ON ma.entity_id = p.e_lo
        JOIN marg mb ON mb.entity_id = p.e_hi
        CROSS JOIN nn
    """


# --------------------------------------------------------------------------
# Assistant response latency (ts/role columns as first-class signals)
# --------------------------------------------------------------------------

def response_latency(sf_dir: str):
    """(conv_id, n_responses, total_latency_us, max_latency_us,
    avg_latency_us) — per-conversation assistant reply latency: for every
    assistant turn whose immediate predecessor (in turn_idx order) is a
    user turn, ``ts − prev_ts`` in exact integer microseconds.  The
    agent-ops profiling counterpart of ``conversation_stats``.

    Scale shape: ONE keyed repartition on a conv hash, in-task sort +
    shifted-compare masks (no per-row Python), integer sums so any
    partition layout yields identical rows; ``avg`` is one truncating
    integer division after the combine (conversations are wholly owned
    by one task, so there IS no combine — the aggregate is exact by
    construction).
    """
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "ts"],
    )
    return response_latency_ds(ds)


def response_latency_ds(ds):
    """Dataset form of :func:`response_latency` (schema contract:
    conv_id, turn_idx, role, ts)."""
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    def _ckey(t: pa.Table) -> pa.Table:
        ck = hash64_column(t["conv_id"]).view(np.int64)
        return t.append_column("ckey", pa.array(ck, pa.int64()))

    def _lat(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("conv_id", pa.string()), ("n_responses", pa.int64()),
             ("total_latency_us", pa.int64()), ("max_latency_us", pa.int64()),
             ("avg_latency_us", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        role = np.asarray(
            pc.fill_null(t["role"], "").to_pylist(), dtype=object)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(conv)
        same_conv = np.zeros(n, bool)
        same_conv[1:] = conv[1:] == conv[:-1]
        resp = np.zeros(n, bool)
        resp[1:] = (
            same_conv[1:] & (role[1:] == "assistant") & (role[:-1] == "user")
        )
        lat = np.zeros(n, np.int64)
        lat[1:] = ts[1:] - ts[:-1]
        # group rows per conversation (conversations are whole here)
        starts = np.flatnonzero(~same_conv)
        gid = np.cumsum(~same_conv) - 1
        nr = np.bincount(gid[resp], minlength=len(starts)).astype(np.int64)
        tot = np.zeros(len(starts), np.int64)
        np.add.at(tot, gid[resp], lat[resp])
        mx = np.zeros(len(starts), np.int64)
        np.maximum.at(mx, gid[resp], lat[resp])
        return pa.Table.from_arrays(
            [
                pa.array(conv[starts], pa.string()),
                pa.array(nr), pa.array(tot), pa.array(mx),
                pa.array(tot // np.maximum(nr, 1)),
            ],
            schema=schema,
        )

    keyed = ensure_hash_shuffle(
        ds.map_batches(_ckey, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        keyed.repartition(shuffle_partitions(), keys=["ckey"])
        .map_batches(_lat, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def response_latency_oracle_sql(corpus_dir: str) -> str:
    """Exact DuckDB twin via lag() over (conv, turn_idx)."""
    return f"""
        WITH s AS (
          SELECT conv_id,
                 coalesce(role, '') AS role,
                 lag(coalesce(role, '')) OVER w AS prev_role,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER w AS lat
          FROM read_parquet('{corpus_dir}/transcripts.parquet')
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT conv_id,
               CAST(count(*) FILTER (role = 'assistant' AND prev_role = 'user')
                    AS BIGINT) AS n_responses,
               CAST(coalesce(sum(lat) FILTER (role = 'assistant'
                    AND prev_role = 'user'), 0) AS BIGINT) AS total_latency_us,
               CAST(coalesce(max(lat) FILTER (role = 'assistant'
                    AND prev_role = 'user'), 0) AS BIGINT) AS max_latency_us,
               CAST(coalesce(sum(lat) FILTER (role = 'assistant'
                    AND prev_role = 'user'), 0)
                    // greatest(count(*) FILTER (role = 'assistant'
                               AND prev_role = 'user'), 1) AS BIGINT)
                 AS avg_latency_us
        FROM s GROUP BY conv_id
    """


# --------------------------------------------------------------------------
# Turn-grain exact dedup (boilerplate-turn removal)
# --------------------------------------------------------------------------

def dedup_turns(sf_dir: str):
    """(conv_id, turn_idx, n_copies) — one row per DISTINCT normalized
    turn text, keeping its first occurrence by (conv_id, turn_idx) order
    with the corpus-wide copy count: the turn-grain twin of
    ``exact_dedup`` (boilerplate greetings / tool banners / system
    prompts are the dominant transcript duplication mode).

    Scale shape: normalize per batch, ONE keyed repartition on the
    64-bit text hash (the text itself never rides the shuffle twice —
    the hash routes, the text disambiguates collisions in-task), in-task
    sort + run detection for first/count.
    """
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        nt = pc.replace_substring_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(t["text"], ""))),
            r"\s+", " ",
        )
        h = hash64_column(nt).view(np.int64)
        return pa.Table.from_arrays(
            [pa.array(h, pa.int64()), t["conv_id"], t["turn_idx"], nt],
            names=["tkey", "conv_id", "turn_idx", "norm_text"],
        )

    def _first(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int64()),
             ("n_copies", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([
            ("norm_text", "ascending"),
            ("conv_id", "ascending"), ("turn_idx", "ascending"),
        ])
        txt = t["norm_text"].combine_chunks()
        n = t.num_rows
        brk = np.ones(n, bool)
        brk[1:] = ~pc.equal(
            txt.slice(1), txt.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t["conv_id"].combine_chunks().take(starts),
                pc.cast(t["turn_idx"].combine_chunks().take(starts), pa.int64()),
                pa.array(counts),
            ],
            schema=schema,
        )

    keyed = ensure_hash_shuffle(
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        keyed.repartition(shuffle_partitions(), keys=["tkey"])
        .map_batches(_first, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def dedup_turns_oracle_sql(corpus_dir: str) -> str:
    return f"""
        WITH n AS (
          SELECT conv_id, turn_idx,
                 regexp_replace(trim(lower(coalesce(text, ''))),
                                '\\s+', ' ', 'g') AS norm_text
          FROM read_parquet('{corpus_dir}/transcripts.parquet')),
        r AS (
          SELECT conv_id, turn_idx,
                 row_number() OVER (
                   PARTITION BY norm_text
                   ORDER BY conv_id, turn_idx) AS rn,
                 count(*) OVER (PARTITION BY norm_text) AS n_copies
          FROM n)
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               CAST(n_copies AS BIGINT) AS n_copies
        FROM r WHERE rn = 1
    """


def resolved_mentions(sf_dir: str):
    """(mention_id, conv_id, turn_idx, surface, cluster_id, rep_surface) —
    the end-user DELIVERABLE of the ER engine: every extracted mention
    labeled with its flagship cluster and the cluster's canonical surface
    (survivorship by extracted-mention frequency, lexicographic
    tie-break).  Fully unsupervised — unlike
    ``linkage_emb.cluster_representatives`` (which profiles the GOLD
    mention table), the frequencies here come from the engine's own
    extraction, so this is exactly the crosswalk a user materializes.

    Memoized per session (it IS the deliverable table a production run
    would persist): consumers like ``cluster_timelines`` read it instead
    of re-running the mention⋈cluster joins and representative election.

    Scale shape: one hash-shuffle join attaches cluster ids to mentions;
    representative election is map-side (cluster, surface) count partials
    + ONE keyed repartition with in-task re-aggregate + run-detection
    argmax (one row per cluster out); one final hash-shuffle join brings
    the canonical surface back.  Nothing is driver-materialized.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, memo_derived

    d = ensure_corpus_for_sf_dir(sf_dir)
    return ensure_hash_shuffle(memo_derived(
        ("tq_resolved_mentions", str(d)),
        lambda: _resolved_mentions_build(sf_dir).materialize(),
    ))


def _resolved_mentions_build(sf_dir: str):
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.util import (
        drop_empty_blocks, ensure_hash_shuffle, shuffle_partitions,
    )

    # flip the global shuffle strategy BEFORE creating any dataset here:
    # DataContext is captured per-dataset at creation, and both the joins
    # and the keyed repartition below need HASH_SHUFFLE
    ensure_hash_shuffle()
    m = mentions_extracted(sf_dir).map_batches(
        lambda t: t.select(["mention_id", "conv_id", "turn_idx", "surface"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cl = linkage_clusters(sf_dir)
    joined = ensure_hash_shuffle(m.join(
        cl, join_type="inner",
        num_partitions=shuffle_partitions(), on=("mention_id",),
    ).materialize())

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cluster_id", "surface"]).aggregate([([], "count_all")])
        return g.rename_columns(["cluster_id", "surface", "w"])

    def _rep(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("cluster_id", pa.string()), ("rep_surface", pa.string())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.group_by(["cluster_id", "surface"]).aggregate([("w", "sum")])
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
        return pa.Table.from_arrays(
            [cid.take(starts), t["surface"].combine_chunks().take(starts)],
            schema=schema,
        )

    partials = ensure_hash_shuffle(drop_empty_blocks(
        joined.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    ))
    reps = (
        partials.repartition(shuffle_partitions(), keys=["cluster_id"])
        .map_batches(_rep, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    return joined.join(
        ensure_hash_shuffle(reps), join_type="inner",
        num_partitions=shuffle_partitions(), on=("cluster_id",),
    )


def resolved_mentions_oracle_sql(corpus_dir: str) -> str:
    from biomedical_el_ray.config import DEFAULT_CONFIG
    from biomedical_el_ray.functions.sql_hash import reachability_cte
    from biomedical_el_ray.pipelines.linkage_emb import scored_pairs_cte
    from biomedical_el_ray.stages.mentions import mentions_cte

    thr = DEFAULT_CONFIG.score_threshold
    sids_t, _ = _sids_cte()
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {thr}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)},
        {scored_pairs_cte("SELECT DISTINCT surface FROM mres", DEFAULT_CONFIG)},
        {sids_t},
        {reach},
        comp AS (
          SELECT rc.s AS surface, min(d.sid) AS cluster_id
          FROM reach rc JOIN sids d ON d.surface = rc.r
          GROUP BY rc.s),
        rsv AS MATERIALIZED (
          SELECT m.mention_id, m.conv_id, m.turn_idx, m.surface, c.cluster_id
          FROM mres m JOIN comp c ON m.surface = c.surface),
        freq AS (
          SELECT cluster_id, surface, count(*) AS w
          FROM rsv GROUP BY 1, 2),
        rep AS (
          SELECT cluster_id, surface AS rep_surface FROM (
            SELECT cluster_id, surface,
                   row_number() OVER (
                     PARTITION BY cluster_id
                     ORDER BY w DESC, surface) AS rn
            FROM freq) WHERE rn = 1)
        SELECT r.mention_id, r.conv_id, r.turn_idx, r.surface,
               r.cluster_id, p.rep_surface
        FROM rsv r JOIN rep p ON p.cluster_id = r.cluster_id
    """


def cluster_timelines(sf_dir: str):
    """(cluster_id, n_mentions, n_convs, first_us, last_us) — the
    temporal profile of every flagship entity cluster: how often, in how
    many conversations, and over what wall-clock span (exact integer
    epoch microseconds) the entity is mentioned.  The ts column as a
    first-class ER signal: burst-y short-lived clusters read differently
    from long-running ones when a user triages resolution output.

    Scale shape: reads the memoized ``resolved_mentions`` deliverable
    (the mention⋈cluster join + representative election run once per
    session), joins each mention's turn timestamp (pruned
    (conv_id, turn_idx, ts) read, timestamps as int64 µs) — ONE
    hash-shuffle join — then ONE keyed repartition on the cluster id
    co-locates each cluster's rows so a single in-task Arrow pass
    computes count, time extremes AND exact distinct-conversation
    counts together (every stat of a cluster lives in one partition by
    construction).  Two shuffle ops total, replacing the prior
    join + four-groupby + join chain (six launches of the per-shuffle
    aggregator fleet — the dominant cost at bench scale, see the
    BASELINE.md round-5 shuffle-launch note).  Nothing is
    driver-materialized; skew exposure is the hottest cluster's mention
    count, the same bound the groupby plan had.
    """
    import pyarrow.compute as pc

    from biomedical_el_ray.util import (
        drop_empty_blocks, ensure_hash_shuffle, shuffle_partitions,
    )

    ensure_hash_shuffle()
    d = ensure_corpus_for_sf_dir(sf_dir)
    nparts = shuffle_partitions()
    j1 = resolved_mentions(sf_dir).map_batches(
        lambda t: t.select(["cluster_id", "conv_id", "turn_idx"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    turns = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "ts"],
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["conv_id"], t["turn_idx"], pc.cast(t["ts"], pa.int64())],
            names=["conv_id", "turn_idx", "us"],
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = (
        ensure_hash_shuffle(j1)
        .join(turns, join_type="inner", num_partitions=nparts,
              on=("conv_id", "turn_idx"))
        .select_columns(["cluster_id", "conv_id", "us"])
    )

    def _cluster_stats(t: pa.Table) -> pa.Table:
        names = ["cluster_id", "n_mentions", "n_convs", "first_us",
                 "last_us"]
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64())], names=names)
        g = t.group_by("cluster_id").aggregate(
            [([], "count_all"), ("us", "min"), ("us", "max")])
        nc = (t.group_by(["cluster_id", "conv_id"]).aggregate([])
              .group_by("cluster_id").aggregate([([], "count_all")])
              .rename_columns(["cluster_id", "nc"]))
        j = g.join(nc, keys=["cluster_id"], join_type="inner")
        return pa.Table.from_arrays(
            [j["cluster_id"],
             pc.cast(j["count_all"], pa.int64()),
             pc.cast(j["nc"], pa.int64()),
             pc.cast(j["us_min"], pa.int64()),
             pc.cast(j["us_max"], pa.int64())],
            names=names)

    return drop_empty_blocks(
        drop_empty_blocks(j2)
        .repartition(nparts, keys=["cluster_id"])
        .map_batches(_cluster_stats, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def cluster_timelines_oracle_sql(corpus_dir: str) -> str:
    """DuckDB twin: the resolved-mentions chain joined to the turn
    timestamps, one grouped aggregate."""
    from biomedical_el_ray.config import DEFAULT_CONFIG
    from biomedical_el_ray.functions.sql_hash import reachability_cte
    from biomedical_el_ray.pipelines.linkage_emb import scored_pairs_cte
    from biomedical_el_ray.stages.mentions import mentions_cte

    thr = DEFAULT_CONFIG.score_threshold
    sids_t, _ = _sids_cte()
    reach = reachability_cte(
        f"SELECT s_lo AS a, s_hi AS b FROM lkscored WHERE score >= {thr}",
        "SELECT surface FROM surf",
    )
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)},
        {scored_pairs_cte("SELECT DISTINCT surface FROM mres", DEFAULT_CONFIG)},
        {sids_t},
        {reach},
        comp AS (
          SELECT rc.s AS surface, min(d.sid) AS cluster_id
          FROM reach rc JOIN sids d ON d.surface = rc.r
          GROUP BY rc.s),
        rsv AS (
          SELECT m.conv_id, m.turn_idx, c.cluster_id
          FROM mres m JOIN comp c ON m.surface = c.surface),
        wts AS (
          SELECT r.cluster_id, r.conv_id, epoch_us(t.ts) AS us
          FROM rsv r
          JOIN read_parquet('{corpus_dir}/transcripts.parquet') t
            ON t.conv_id = r.conv_id AND t.turn_idx = r.turn_idx)
        SELECT cluster_id,
               count(*) AS n_mentions,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(min(us) AS BIGINT) AS first_us,
               CAST(max(us) AS BIGINT) AS last_us
        FROM wts GROUP BY 1
    """


# --------------------------------------------------------------------------
# Tool-transition matrix (agent-ops Markov profile of the tool column)
# --------------------------------------------------------------------------

def tool_transitions(sf_dir: str):
    """(from_tool, to_tool, n, p) — the first-order Markov transition
    matrix over consecutive tool invocations inside each conversation:
    for every pair of successive tool turns (intervening user/assistant
    turns skipped), count ``from_tool -> to_tool`` corpus-wide and derive
    the row-normalized probability ``p = n / sum(n per from_tool)``.
    The agent-ops "which tool follows which" dashboard — loop detection
    (heavy diagonal), pipeline shapes (retrieval->editor), dead tools.

    Scale shape: tool rows are FILTERED MAP-SIDE before any exchange (at
    10^12 turns only the tool-role minority ever moves), then ONE keyed
    repartition on a conv hash co-locates each conversation, the in-task
    kernel is sort + shifted-compare masks (no per-row Python), and each
    task emits only its local bigram census — bounded by |tools|^2 = 49
    rows per task — into one bounded groupby-sum.  ``p`` is one correctly
    rounded f64 divide over exact int64 counts inside the final <= 49-row
    block, so the result is bit-identical to the DuckDB twin in any
    partition layout.  Zipf-hot tools (the synthetic corpus plants them)
    cost nothing here: hot keys fatten the bounded census, never a pair
    stream.
    """
    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "tool"],
    )
    return tool_transitions_ds(ds)


def tool_transitions_ds(ds):
    """Dataset form of :func:`tool_transitions` (schema contract:
    conv_id, turn_idx, tool)."""
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    def _ckey(t: pa.Table) -> pa.Table:
        # map-side filter: only tool turns ever reach the shuffle
        keep = pc.invert(
            pc.equal(pc.fill_null(t["tool"], ""), "")
        )
        t = t.filter(keep)
        ck = hash64_column(t["conv_id"]).view(np.int64)
        return t.append_column("ckey", pa.array(ck, pa.int64()))

    partial_schema = pa.schema(
        [("from_tool", pa.string()), ("to_tool", pa.string()),
         ("n", pa.int64())]
    )

    def _census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return partial_schema.empty_table()
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        tool = np.asarray(t["tool"].to_pylist(), dtype=object)
        n = len(conv)
        same = np.zeros(n, bool)
        same[1:] = conv[1:] == conv[:-1]
        src = tool[:-1][same[1:]]
        dst = tool[1:][same[1:]]
        if len(src) == 0:
            return partial_schema.empty_table()
        # tiny per-task vocab -> integer codes -> bincount census
        vocab, codes_all = np.unique(np.concatenate([src, dst]),
                                     return_inverse=True)
        k = len(vocab)
        code = codes_all[: len(src)] * k + codes_all[len(src):]
        cnt = np.bincount(code, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_arrays(
            [
                pa.array(vocab[nz // k], pa.string()),
                pa.array(vocab[nz % k], pa.string()),
                pa.array(cnt[nz], pa.int64()),
            ],
            schema=partial_schema,
        )

    def _prob(t: pa.Table) -> pa.Table:
        # final block is <= |tools|^2 rows: row-normalize locally
        nn = t["n"].to_numpy(zero_copy_only=False)
        src = np.asarray(t["from_tool"].to_pylist(), dtype=object)
        vocab, code = np.unique(src, return_inverse=True)
        tot = np.zeros(len(vocab), np.int64)
        np.add.at(tot, code, nn)
        p = nn.astype(np.float64) / tot[code].astype(np.float64)
        return t.append_column("p", pa.array(p, pa.float64()))

    keyed = ensure_hash_shuffle(
        ds.map_batches(_ckey, batch_format="pyarrow", zero_copy_batch=True)
    )
    census = (
        keyed.repartition(shuffle_partitions(), keys=["ckey"])
        .map_batches(_census, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )
    return (
        census.groupby(["from_tool", "to_tool"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["from_tool", "to_tool", "n"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .repartition(1)
        .map_batches(_prob, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )


def tool_transitions_oracle_sql(corpus_dir: str) -> str:
    """Exact DuckDB twin via lag() over tool turns per conversation."""
    return f"""
        WITH tt AS (
          SELECT conv_id, turn_idx, tool
          FROM read_parquet('{corpus_dir}/transcripts.parquet')
          WHERE coalesce(tool, '') <> ''),
        s AS (
          SELECT tool AS to_tool,
                 lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS from_tool
          FROM tt)
        SELECT from_tool, to_tool,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY from_tool) AS p
        FROM s WHERE from_tool IS NOT NULL
        GROUP BY from_tool, to_tool
    """

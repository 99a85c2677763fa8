"""Candidate-pair materialization: blocks -> deduped (id_lo, id_hi) pairs.

E3-analog of the reference's (mention x candidate) cross within a candidate
set (/root/reference/modeling_e2e_span.py:149-151,179-199), expressed as ONE
hash repartition on ``block_key`` (``Dataset.repartition(P, keys=[...])``)
followed by vectorized in-task pair generation over the key runs of each
partition — strictly less data movement than a self-join (the shuffle moves
n member rows per block, never n^2 joined rows), and no separate global
hot-key counting pass: a task holds EVERY row of each of its keys, so block
sizes are known exactly in-task.

Partitioning contract: Ray 2.49's hash-shuffle finalize emits exactly ONE
block per partition (hash_shuffle.py `finalize`, "TODO break down blocks to
target size" — not yet implemented), so every block holds complete groups
and in-task run detection (argsort on the uint64 key) is exact.
``num_partitions`` must therefore scale with input size
(cfg.pair_partition_rows rows per partition) so a partition fits a worker's
heap.

Skew handling (SURVEY.md §4 "skew" — the reference avoids skew only by
capping documents at 8 mentions, /root/reference/data_preprocessing.py:99),
decided per group, in-task, from the exact group size n:

* n <= salt_threshold — pairs generated inline (np.triu_indices).
* salt_threshold < n <= max_block_size — **deferred triangle salting**:
  the group is split into s = ceil(n / salt_target) hash-buckets; each
  member with bucket h is re-emitted under sub-keys (ga, gb), ga<=gb, with
  h in {ga, gb}.  A second, much smaller keyed repartition routes the
  sub-groups to their own tasks; pairing within (a, a) is all-pairs of
  bucket a, within (a, b) cross-bucket only.  The union over sub-groups is
  EXACTLY the full pair set of the block while every sub-group stays
  O(salt_target^2).
* n > max_block_size — the block is dropped whole and *counted* via
  emitted counter rows (never silent — the anti-pattern is the reference's
  silent row drops, /root/reference/utils_e2e_span.py:312-318).

Cross-band duplicate pairs (the same pair emitted once per shared block
key) are removed IN-TASK by the **first-shared-slot rule**: every member
row carries its full slot signature ``sig`` (slot-s key value at position
s, stages/blocking.py), and a generated pair is kept iff the slot it was
generated in is the FIRST slot where the two signatures agree —
``argmax(sig_l == sig_r) == emitting slot``, one vectorized comparison
per pair, no string handling, no per-pair Python.  Each pair has exactly
one such slot, so the union over blocks is exactly-once with no dedup
shuffle (SURVEY.md §2.7 D2 expressed map-side).  The rule is a pure
function of (sig_l, sig_r, slot), so every task decides identically —
including the corollary that a pair whose canonical (first-shared-slot)
block is oversized is dropped with that block even if the pair shares
other keys; those drops are exactly the counted ``dropped_oversized_*``
rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.functions.hashing import hash64_column, splitmix64

PAIR_COLS = ["id_lo", "id_hi", "s_lo", "s_hi", "block_key"]

PAIRS_SCHEMA = pa.schema(
    [
        ("id_lo", pa.string()),
        ("id_hi", pa.string()),
        ("s_lo", pa.string()),
        ("s_hi", pa.string()),
        ("block_key", pa.uint64()),
    ]
)

_EMPTY_PAIRS = PAIRS_SCHEMA.empty_table()

_SALT_MIX = np.uint64(0x5A17_0000_0000_0001)


# phase-1 unified output: kind 0 = pair row (PAIR columns filled),
# kind 1 = deferred salted member row.  Skew/deferral COUNTS go to the
# Counters actor (util.Counters, one RPC per partition), not the data
# plane — that cut the third full consumer pass (stats scan + take_all)
# over the materialized phase-1 output, a measured scaling cost.
# ``sig`` is a VARIABLE list (uniform row length) so the schema does not
# depend on the slot count S — empty partitions then unify cleanly.
P1_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
        ("id_lo", pa.string()),      # pair id_lo | deferred mention_id
        ("id_hi", pa.string()),
        ("s_lo", pa.string()),       # pair s_lo  | deferred surface
        ("s_hi", pa.string()),       # pair s_hi
        ("block_key", pa.uint64()),  # pair logical key | deferred SALTED key
        ("slot", pa.int8()),
        ("sig", pa.list_(pa.uint64())),
        ("emb_q", pa.list_(pa.int8())),
        ("bkt", pa.int32()),
        ("ga", pa.int32()),
        ("gb", pa.int32()),
    ]
)


def _sig_matrix(t: pa.Table) -> np.ndarray:
    """sig list column (fixed or uniform-variable) -> (n, S) uint64."""
    col = t["sig"].combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(len(col), -1)


def _sig_list_array(mat: np.ndarray) -> pa.ListArray:
    """(k, S) uint64 -> variable list<uint64> array (uniform lengths)."""
    k, S = mat.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(k + 1, dtype=np.int32) * S, pa.int32()),
        pa.array(mat.reshape(-1), pa.uint64()),
    )


def _take_sorted(t: pa.Table):
    """Sort a partition by its uint64 block_key; return (table, keys)."""
    keys = t["block_key"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    if not np.array_equal(order, np.arange(len(order))):
        t = t.take(pa.array(order))
        keys = keys[order]
    return t, keys


_TRIU_CACHE: dict = {}


def _triu(m: int):
    """Cached upper-triangle index pair for group size m (bounded by the
    salt threshold / sub-group size, so the cache stays small; avoids one
    allocation pair per group run — thousands per partition)."""
    v = _TRIU_CACHE.get(m)
    if v is None:
        v = np.triu_indices(m, 1)
        if m <= 4096:
            _TRIU_CACHE[m] = v
    return v


def _runs(keys: np.ndarray):
    """Contiguous equal-key runs of a sorted uint64 column -> (starts, ends)."""
    n = len(keys)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    return starts, np.append(starts[1:], n)


def _q_cosine(Qa: np.ndarray, Qb: np.ndarray) -> np.ndarray:
    """Approx cosine from int8-quantized rows (chunked int32 accumulate)."""
    m = len(Qa)
    out = np.empty(m, dtype=np.float32)
    inv = np.float32(1.0 / (127.0 * 127.0))
    step = 131072
    for i in range(0, m, step):
        a = Qa[i : i + step].astype(np.int32)
        b = Qb[i : i + step].astype(np.int32)
        out[i : i + step] = np.einsum("ij,ij->i", a, b) * inv
    return out


def _emb_q_matrix(t: pa.Table) -> np.ndarray | None:
    if "emb_q" not in t.column_names:
        return None
    col = t["emb_q"].combine_chunks()
    if col.null_count == len(col):
        return None
    vals = col.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(len(col), -1)


def gate_min_cosine(cfg: PipelineConfig) -> float | None:
    """Sound lower bound on the cosine a pair needs to possibly pass the
    score threshold, minus the quantization-error margin; None = no gate."""
    if not cfg.emb_gate or cfg.w_embedding <= 0:
        return None
    return (
        cfg.score_threshold - cfg.w_jaro_winkler - cfg.w_levenshtein
    ) / cfg.w_embedding - cfg.emb_gate_margin


def _dedup_gate(sig, slot, li, ri, Q=None, gate_min=None):
    """First-shared-slot dedup + (optional) sound quantized-cosine gate."""
    eq = sig[li] == sig[ri]                      # (npairs, S)
    keep = eq.argmax(axis=1) == slot[li]         # emitting slot is first shared
    li, ri = li[keep], ri[keep]
    if len(li) and Q is not None and gate_min is not None:
        cos = _q_cosine(Q[li], Q[ri])
        pass_gate = cos >= gate_min
        li, ri = li[pass_gate], ri[pass_gate]
    return li, ri


def _score_edges_in_task(t: pa.Table, cfg, li, ri) -> tuple:
    """Exact in-task scoring of surviving candidate pairs -> passing
    (src, dst) id arrays.

    The scorer (DuckDB conn + embedder + memo) lives in the per-worker
    state cache; pair rows never leave the task — only the thresholded
    edges do (~1-2% of candidates), which keeps object-store traffic and
    the kernel page-management tax (the measured scaling limiter on one
    box: system time 297 vs 86 core-s going 4 -> 16 CPUs) off the pair
    axis entirely.
    """
    from biomedical_el_ray.stages.scoring import PairScorer
    from biomedical_el_ray.util import worker_state

    surfs = np.asarray(t["surface"].to_pylist(), dtype=object)
    ids = np.asarray(t["mention_id"].to_pylist(), dtype=object)
    scorer = worker_state(("pair_scorer", cfg.config_hash()), lambda: PairScorer(cfg))
    src_parts, dst_parts = [], []
    step = 262144
    for i in range(0, len(li), step):
        ls, rs = li[i : i + step], ri[i : i + step]
        _, _, _, score = scorer.score_arrays(surfs[ls].tolist(), surfs[rs].tolist())
        passing = np.asarray(score) >= cfg.score_threshold
        src_parts.append(ids[ls[passing]])
        dst_parts.append(ids[rs[passing]])
    if not src_parts:
        return np.array([], dtype=object), np.array([], dtype=object)
    return np.concatenate(src_parts), np.concatenate(dst_parts)


def _pairs_from_indices(
    t: pa.Table, keys, sig, slot, li, ri, Q=None, gate_min=None
) -> pa.Table:
    """Index pairs (li, ri) -> canonical deduped PAIRS_SCHEMA table.

    Dedup: first-shared-slot rule, one vectorized (npairs, S) comparison.
    Gate: pairs whose quantized cosine proves the score can never reach
    the threshold are dropped here (sound — see gate_min_cosine), so junk
    candidates never materialize as pair rows.  Canonical orientation
    (id_lo < id_hi): Arrow string kernels — no Python objects anywhere on
    the pair axis.
    """
    li, ri = _dedup_gate(sig, slot, li, ri, Q, gate_min)
    if len(li) == 0:
        return _EMPTY_PAIRS
    ids = t["mention_id"].combine_chunks()
    surfs = t["surface"].combine_chunks()
    id_l = pc.take(ids, pa.array(li))
    id_r = pc.take(ids, pa.array(ri))
    s_l = pc.take(surfs, pa.array(li))
    s_r = pc.take(surfs, pa.array(ri))
    swap = pc.greater(id_l, id_r)
    return pa.Table.from_arrays(
        [
            pc.if_else(swap, id_r, id_l),
            pc.if_else(swap, id_l, id_r),
            pc.if_else(swap, s_r, s_l),
            pc.if_else(swap, s_l, s_r),
            pa.array(keys[li], pa.uint64()),
        ],
        schema=PAIRS_SCHEMA,
    )


def _edge_chunk(src, dst, schema) -> pa.Table:
    """Passing (src, dst) ids -> kind-0 rows of the phase-1 schema
    (edges mode: only the two id columns carry data)."""
    k = len(src)
    return pa.Table.from_arrays(
        [
            pa.array(np.zeros(k, np.int8)),
            pa.array(src, pa.string()),
            pa.array(dst, pa.string()),
            pa.nulls(k, pa.string()),
            pa.nulls(k, pa.string()),
            pa.array(np.zeros(k, np.uint64)),
            pa.array(np.zeros(k, np.int8)),
            pa.nulls(k, pa.list_(pa.uint64())),
            pa.nulls(k, pa.list_(pa.int8())),
            pa.array(np.full(k, -1, np.int32)),
            pa.array(np.full(k, -1, np.int32)),
            pa.array(np.full(k, -1, np.int32)),
        ],
        schema=schema,
    )


def _phase1(
    t: pa.Table,
    cfg: PipelineConfig,
    gate: bool = True,
    emit: str = "pairs",
    counters_handle=None,
) -> pa.Table:
    """One hash partition of block rows -> pairs-or-edges + deferred rows
    (``emit="edges"`` scores in-task and emits only thresholded edges —
    see _score_edges_in_task).  Skew counts (hot blocks, oversized drops,
    deferred rows) go to ``counters_handle`` — one RPC per partition."""
    schema = P1_SCHEMA
    if t.num_rows == 0 or "block_key" not in t.column_names:
        return schema.empty_table()
    t, keys = _take_sorted(t)
    sig = _sig_matrix(t)
    slot = t["slot"].to_numpy(zero_copy_only=False)
    Q = _emb_q_matrix(t) if gate else None
    gmin = gate_min_cosine(cfg) if Q is not None else None

    starts, ends = _runs(keys)
    sizes = ends - starts
    li_parts, ri_parts = [], []
    defer_runs = []
    n_dropped_blocks = n_dropped_rows = n_salted = 0
    for s, e, m in zip(starts, ends, sizes):
        if m < 2:
            continue
        if m > cfg.max_block_size:
            n_dropped_blocks += 1
            n_dropped_rows += int(m)
            continue
        if m > cfg.salt_threshold:
            n_salted += 1
            defer_runs.append((s, e))
            continue
        iu, ju = _triu(m)
        li_parts.append(iu + s)
        ri_parts.append(ju + s)

    chunks = []
    if li_parts:
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        if emit == "edges":
            li, ri = _dedup_gate(sig, slot, li, ri, Q, gmin)
            src, dst = (
                _score_edges_in_task(t, cfg, li, ri)
                if len(li)
                else (np.array([], object), np.array([], object))
            )
            k = len(src)
            if k:
                chunks.append(_edge_chunk(src, dst, schema))
        else:
            pt = _pairs_from_indices(t, keys, sig, slot, li, ri, Q=Q, gate_min=gmin)
            k = pt.num_rows
            if k:
                chunks.append(
                    pa.Table.from_arrays(
                        [
                            pa.array(np.zeros(k, np.int8)),
                            pt["id_lo"], pt["id_hi"], pt["s_lo"], pt["s_hi"],
                            pt["block_key"],
                            pa.array(np.zeros(k, np.int8)),
                            pa.nulls(k, pa.list_(pa.uint64())),
                            pa.nulls(k, pa.list_(pa.int8())),
                            pa.array(np.full(k, -1, np.int32)),
                            pa.array(np.full(k, -1, np.int32)),
                            pa.array(np.full(k, -1, np.int32)),
                        ],
                        schema=schema,
                    )
                )
    if defer_runs:
        idx_parts, sk_parts, bkt_parts, ga_parts, gb_parts = [], [], [], [], []
        for s, e in defer_runs:
            m = e - s
            nsalt = -(-m // cfg.salt_target)  # ceil
            h = (
                hash64_column(t["mention_id"].slice(s, m))
                % np.uint64(nsalt)
            ).astype(np.int32)
            key = keys[s]
            # member with bucket h goes to every sub-group (ga, gb) with
            # h in {ga, gb}: nsalt replicas per member
            a = np.repeat(np.arange(nsalt, dtype=np.int32)[None, :], m, axis=0)
            hh = np.repeat(h[:, None], nsalt, axis=1)
            ga = np.minimum(a, hh).ravel()
            gb = np.maximum(a, hh).ravel()
            idx = np.repeat(np.arange(s, e, dtype=np.int64), nsalt)
            sub = splitmix64(
                np.uint64(key)
                ^ (_SALT_MIX + ga.astype(np.uint64) * np.uint64(0x10001) + gb.astype(np.uint64))
            )
            idx_parts.append(idx); sk_parts.append(sub)
            bkt_parts.append(np.repeat(h, nsalt)); ga_parts.append(ga); gb_parts.append(gb)
        idx = np.concatenate(idx_parts)
        k = len(idx)
        ids = t["mention_id"].combine_chunks()
        surfs = t["surface"].combine_chunks()
        sig_col = _sig_list_array(sig[idx])
        if Q is not None:
            qm = Q[idx]
            embq_col = pa.ListArray.from_arrays(
                pa.array(np.arange(k + 1, dtype=np.int32) * qm.shape[1], pa.int32()),
                pa.array(qm.reshape(-1), pa.int8()),
            )
        else:
            embq_col = pa.nulls(k, pa.list_(pa.int8()))
        chunks.append(
            pa.Table.from_arrays(
                [
                    pa.array(np.ones(k, np.int8)),
                    pc.take(ids, pa.array(idx)),
                    pa.nulls(k, pa.string()),
                    pc.take(surfs, pa.array(idx)),
                    pa.nulls(k, pa.string()),
                    pa.array(np.concatenate(sk_parts), pa.uint64()),
                    pa.array(slot[idx], pa.int8()),
                    sig_col.cast(pa.list_(pa.uint64())),
                    embq_col,
                    pa.array(np.concatenate(bkt_parts), pa.int32()),
                    pa.array(np.concatenate(ga_parts), pa.int32()),
                    pa.array(np.concatenate(gb_parts), pa.int32()),
                ],
                schema=schema,
            )
        )
    if counters_handle is not None and (defer_runs or n_dropped_blocks):
        from biomedical_el_ray.util import Counters

        n_deferred = sum(
            (e - s) * -(-(e - s) // cfg.salt_target) for s, e in defer_runs
        )
        Counters.add(
            counters_handle,
            {
                "hot_blocks": n_salted + n_dropped_blocks,
                "dropped_oversized_blocks": n_dropped_blocks,
                "dropped_oversized_rows": n_dropped_rows,
                "n_deferred": n_deferred,
            },
        )
    if not chunks:
        return schema.empty_table()
    return pa.concat_tables(chunks)


def _pairgen_salted(
    t: pa.Table, cfg: PipelineConfig, gate: bool = True, emit: str = "pairs"
) -> pa.Table:
    """Phase 2: one partition of salted sub-group member rows -> pairs.

    Runs are (ga, gb) sub-groups of hot blocks: (a, a) pairs all-of-bucket-a
    (triu); (a, b), a<b, pairs cross-bucket only, one orientation.
    """
    if t.num_rows == 0 or "block_key" not in t.column_names:
        # schema must match the emit mode: empty hash-shuffle partitions
        # are common (sub-key count < p2), and a 5-column pairs block in
        # an edges dataset KeyErrors downstream consumers on t["src"]
        return _EMPTY_PAIRS if emit == "pairs" else _EDGES_SCHEMA.empty_table()
    t, keys = _take_sorted(t)
    sig = _sig_matrix(t)
    slot = t["slot"].to_numpy(zero_copy_only=False)
    Q = _emb_q_matrix(t) if gate else None
    gmin = gate_min_cosine(cfg) if Q is not None else None
    bkt = t["bkt"].to_numpy(zero_copy_only=False)
    ga = t["ga"].to_numpy(zero_copy_only=False)
    gb = t["gb"].to_numpy(zero_copy_only=False)

    starts, ends = _runs(keys)
    li_parts, ri_parts = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if ga[s] != gb[s]:
            idx = np.arange(s, e)
            a_idx = idx[bkt[s:e] == ga[s]]
            b_idx = idx[bkt[s:e] == gb[s]]
            if len(a_idx) and len(b_idx):
                la, lb = np.meshgrid(a_idx, b_idx, indexing="ij")
                li_parts.append(la.ravel())
                ri_parts.append(lb.ravel())
        else:
            iu, ju = _triu(m)
            li_parts.append(iu + s)
            ri_parts.append(ju + s)
    if not li_parts:
        return _EMPTY_PAIRS if emit == "pairs" else _EDGES_SCHEMA.empty_table()
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    if emit == "edges":
        li, ri = _dedup_gate(sig, slot, li, ri, Q, gmin)
        if len(li) == 0:
            return _EDGES_SCHEMA.empty_table()
        src, dst = _score_edges_in_task(t, cfg, li, ri)
        return pa.Table.from_arrays(
            [pa.array(src, pa.string()), pa.array(dst, pa.string())],
            schema=_EDGES_SCHEMA,
        )
    return _pairs_from_indices(t, keys, sig, slot, li, ri, Q=Q, gate_min=gmin)


def _select_pairs(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "kind" not in t.column_names:
        return _EMPTY_PAIRS
    kept = t.filter(pc.equal(t["kind"], 0))
    return kept.select(PAIR_COLS)


_EDGES_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def _select_edges(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "kind" not in t.column_names:
        return _EDGES_SCHEMA.empty_table()
    kept = t.filter(pc.equal(t["kind"], 0))
    return pa.Table.from_arrays(
        [kept["id_lo"], kept["id_hi"]], schema=_EDGES_SCHEMA
    )


_DEFERRED_SCHEMA = pa.schema(
    [
        ("block_key", pa.uint64()), ("slot", pa.int8()),
        ("mention_id", pa.string()), ("surface", pa.string()),
        ("sig", pa.list_(pa.uint64())), ("emb_q", pa.list_(pa.int8())),
        ("bkt", pa.int32()), ("ga", pa.int32()), ("gb", pa.int32()),
    ]
)


def _select_deferred(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "kind" not in t.column_names:
        return _DEFERRED_SCHEMA.empty_table()
    kept = t.filter(pc.equal(t["kind"], 1))
    return pa.Table.from_arrays(
        [
            kept["block_key"], kept["slot"], kept["id_lo"], kept["s_lo"],
            kept["sig"], kept["emb_q"], kept["bkt"], kept["ga"], kept["gb"],
        ],
        names=[
            "block_key", "slot", "mention_id", "surface", "sig", "emb_q",
            "bkt", "ga", "gb",
        ],
    )


def generate_pairs(
    blocks_ds,
    cfg: PipelineConfig | None = None,
    num_partitions: int | None = None,
    counters: dict | None = None,
    rows_hint: int | None = None,
    gate: bool = True,
    emit: str = "pairs",
):
    """blocks Dataset -> deduped candidate-pairs Dataset (``emit="pairs"``)
    or thresholded (src, dst) edges (``emit="edges"``).

    ONE full-data wide op (hash repartition on ``block_key``); pair
    materialization, skew detection, salting decisions, cross-band dedup
    and canonicalization all happen inside the downstream tasks.  Hot
    blocks re-shuffle only their own member rows in a second, much smaller
    keyed repartition.  In edges mode even SCORING runs inside those same
    tasks, so candidate pairs never cross the object store at all — only
    the ~1-2% of thresholded edges do.  ``counters`` (optional dict)
    receives skew accounting: hot-block count, dropped oversized
    blocks/rows.  ``rows_hint`` (estimated block rows) sizes the partition
    count without forcing an extra materialization.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    cfg = cfg or PipelineConfig()
    blocks_ds = ensure_hash_shuffle(blocks_ds)
    if num_partitions is None:
        if rows_hint is None:
            blocks_ds = blocks_ds.materialize()
            rows_hint = blocks_ds.count()
        num_partitions = max(
            shuffle_partitions(), -(-rows_hint // cfg.pair_partition_rows)
        )
    from biomedical_el_ray.util import Counters

    cnt = Counters()
    part = blocks_ds.repartition(num_partitions, keys=["block_key"])
    phase1 = part.map_batches(
        _phase1,
        fn_kwargs={
            "cfg": cfg,
            "gate": gate,
            "emit": emit,
            "counters_handle": cnt.handle,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # batch = the whole partition block (complete groups)
    ).materialize()  # consumed by the select pass (+ deferred pass if salted)

    # materialize() above means every phase-1 task has finished, so the
    # actor totals are complete — no data-plane stats scan needed
    totals = cnt.fetch()
    n_deferred = int(totals.get("n_deferred", 0))
    if counters is not None:
        counters["hot_blocks"] = int(totals.get("hot_blocks", 0))
        counters["dropped_oversized_blocks"] = int(
            totals.get("dropped_oversized_blocks", 0)
        )
        counters["dropped_oversized_rows"] = int(
            totals.get("dropped_oversized_rows", 0)
        )

    select = _select_edges if emit == "edges" else _select_pairs
    pairs1 = phase1.map_batches(
        select, batch_format="pyarrow", zero_copy_batch=True
    )
    if n_deferred == 0:
        return pairs1
    deferred = phase1.map_batches(
        _select_deferred, batch_format="pyarrow", zero_copy_batch=True
    )
    # phase-2 partitions are sized by PAIR work, not rows: every deferred
    # row sits in a sub-group that generates ~salt_target/2 pairs per
    # member, so row-based sizing under-partitions ~salt_target/2-fold
    # (measured: a 16-partition phase 2 gave one 48.7s straggler task vs
    # a 9.4s mean)
    est_pairs = n_deferred * cfg.salt_target // 2
    p2 = max(
        shuffle_partitions(), -(-est_pairs // cfg.phase2_pairs_per_partition)
    )
    pairs2 = deferred.repartition(p2, keys=["block_key"]).map_batches(
        _pairgen_salted,
        fn_kwargs={"cfg": cfg, "gate": gate, "emit": emit},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return pairs1.union(pairs2)

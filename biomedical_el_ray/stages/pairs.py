"""Candidate-pair materialization: blocks -> deduped (id_lo, id_hi) pairs.

E3-analog of the reference's (mention x candidate) cross within a candidate
set (/root/reference/modeling_e2e_span.py:149-151,179-199), expressed as ONE
hash repartition on ``block_key`` (``Dataset.repartition(P, keys=[...],
sort=True)``) followed by vectorized in-task pair generation over the
contiguous key runs of each partition — strictly less data movement than a
self-join (the shuffle moves n member rows per block, never n^2 joined
rows), and no separate global hot-key counting pass: a task holds EVERY row
of each of its keys, so block sizes are known exactly in-task.

Partitioning contract: Ray 2.49's hash-shuffle finalize emits exactly ONE
block per partition (hash_shuffle.py `finalize`, "TODO break down blocks to
target size" — not yet implemented), so every block holds complete,
key-sorted groups and in-task run detection is exact.  ``num_partitions``
must therefore scale with input size (cfg.pair_partition_rows rows per
partition) so a partition fits a worker's heap.

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
key) are removed IN-TASK by the **min-common-key rule**: every member row
carries its full sorted key list (``keys_all``, built in stages/blocking),
and a generated pair is kept iff the block it was generated in is the
MINIMUM key shared by both members.  Each pair has exactly one such block,
so the union over blocks is exactly-once with no dedup shuffle (SURVEY.md
§2.7 D2 expressed map-side).  The rule is a pure function of
(keys_all_lo, keys_all_hi, block_key), so every task decides identically —
including the corollary that a pair whose canonical (min-common) block is
oversized is dropped with that block even if the pair shares other keys;
those drops are exactly the counted ``dropped_oversized_*`` rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.functions.hashing import hash64_column

PAIR_COLS = ["id_lo", "id_hi", "s_lo", "s_hi", "block_key"]

_EMPTY_PAIRS = pa.Table.from_arrays(
    [pa.array([], pa.string()) for _ in PAIR_COLS], names=PAIR_COLS
)

# phase-1 unified output schema: kind 0 = pair row (PAIR_COLS filled),
# kind 1 = deferred salted member row, kind 2 = per-block counter row
_P1_FIELDS = [
    ("kind", pa.int8()),
    ("id_lo", pa.string()),     # pair id_lo      | deferred mention_id
    ("id_hi", pa.string()),
    ("s_lo", pa.string()),      # pair s_lo       | deferred surface
    ("s_hi", pa.string()),      # pair s_hi       | counter "salted"/"dropped"
    ("block_key", pa.string()),  # pair logical key | deferred SALTED key | counter logical key
    ("keys_all", pa.string()),  # deferred only
    ("bkt", pa.int32()),
    ("ga", pa.int32()),
    ("gb", pa.int32()),
    ("n", pa.int64()),          # counter only: block size
]
P1_SCHEMA = pa.schema(_P1_FIELDS)


def _min_common_key_mask(ka_l, ka_r, base_key) -> np.ndarray:
    """keep[i] = base_key[i] is the minimum key common to both key lists.

    Vectorized fast path for the common case ka_l == ka_r (identical key
    sets: min shared = first element of either list); Python set
    intersection only for the remainder.
    """
    m = len(base_key)
    keep = np.empty(m, dtype=bool)
    same = ka_l == ka_r
    if same.any():
        firsts = np.array(
            [k.split("|", 1)[0] if "|" in k else k for k in ka_l[same]],
            dtype=object,
        )
        keep[same] = firsts == base_key[same]
    diff_idx = np.flatnonzero(~same)
    for i in diff_idx:
        rset = set(ka_r[i].split("|"))
        keep[i] = next(
            (k for k in ka_l[i].split("|") if k in rset), None
        ) == base_key[i]
    return keep


def _pairs_table(mids, surfs, kas, keys, li, ri) -> pa.Table:
    """Index pairs (li, ri) -> canonical deduped PAIR_COLS table."""
    id_l, id_r = mids[li], mids[ri]
    s_l, s_r = surfs[li], surfs[ri]
    key = keys[li]
    # strip salt suffix so the compared/reported key is the logical block
    base_key = np.array(
        [k.rsplit("#", 1)[0] if "#" in k else k for k in key], dtype=object
    )
    keep = _min_common_key_mask(kas[li], kas[ri], base_key)
    id_l, id_r, s_l, s_r, base_key = (
        x[keep] for x in (id_l, id_r, s_l, s_r, base_key)
    )
    swap = id_l > id_r
    id_lo = np.where(swap, id_r, id_l)
    id_hi = np.where(swap, id_l, id_r)
    s_lo = np.where(swap, s_r, s_l)
    s_hi = np.where(swap, s_l, s_r)
    return pa.Table.from_arrays(
        [
            pa.array(id_lo, pa.string()),
            pa.array(id_hi, pa.string()),
            pa.array(s_lo, pa.string()),
            pa.array(s_hi, pa.string()),
            pa.array(base_key, pa.string()),
        ],
        names=PAIR_COLS,
    )


def _runs(keys: np.ndarray):
    """Contiguous equal-key runs of a key-sorted column -> (starts, ends)."""
    n = len(keys)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    return starts, np.append(starts[1:], n)


def _sort_by_key(t: pa.Table) -> pa.Table:
    """In-task sort by block_key (stable).

    The keyed repartition runs with ``sort=False``: Ray 2.49's shuffle-side
    sort crashes on empty partitions (Concat.finalize sorts a no-schema
    empty block), and an in-task argsort of one partition is cheap anyway.
    """
    idx = pc.sort_indices(t["block_key"].combine_chunks())
    return t.take(idx)


def _phase1(t: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """One hash partition of block rows -> pairs + deferred rows + counters."""
    n = t.num_rows
    if n == 0:
        return P1_SCHEMA.empty_table()
    t = _sort_by_key(t)
    keys = np.asarray(t["block_key"].to_pylist(), dtype=object)
    mids = np.asarray(t["mention_id"].to_pylist(), dtype=object)
    surfs = np.asarray(t["surface"].to_pylist(), dtype=object)
    kas = np.asarray(t["keys_all"].to_pylist(), dtype=object)

    starts, ends = _runs(keys)
    li_all, ri_all = [], []
    defer_runs: list[tuple[int, int]] = []
    cnt_key: list[str] = []
    cnt_tag: list[str] = []
    cnt_n: list[int] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > cfg.max_block_size:
            cnt_key.append(keys[s])
            cnt_tag.append("dropped")
            cnt_n.append(int(m))
            continue
        if m > cfg.salt_threshold:
            cnt_key.append(keys[s])
            cnt_tag.append("salted")
            cnt_n.append(int(m))
            defer_runs.append((s, e))
            continue
        iu, ju = np.triu_indices(m, 1)
        li_all.append(iu + s)
        ri_all.append(ju + s)

    chunks = []
    if li_all:
        pt = _pairs_table(
            mids, surfs, kas, keys, np.concatenate(li_all), np.concatenate(ri_all)
        )
        k = pt.num_rows
        chunks.append(
            pa.Table.from_arrays(
                [
                    pa.array(np.zeros(k, dtype=np.int8)),
                    pt["id_lo"], pt["id_hi"], pt["s_lo"], pt["s_hi"], pt["block_key"],
                    pa.nulls(k, pa.string()),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(np.zeros(k, np.int64)),
                ],
                schema=P1_SCHEMA,
            )
        )
    if defer_runs:
        dk, dm, dsf, dka = [], [], [], []
        dbkt, dga, dgb = [], [], []
        for s, e in defer_runs:
            m = e - s
            nsalt = -(-m // cfg.salt_target)  # ceil
            h_arr = hash64_column(list(mids[s:e])) % np.uint64(nsalt)
            key = keys[s]
            for i in range(s, e):
                h = int(h_arr[i - s])
                for a in range(nsalt):
                    ga, gb = (a, h) if a < h else (h, a)
                    dk.append(f"{key}#{ga:04d}_{gb:04d}")
                    dm.append(mids[i])
                    dsf.append(surfs[i])
                    dka.append(kas[i])
                    dbkt.append(h)
                    dga.append(ga)
                    dgb.append(gb)
        k = len(dk)
        chunks.append(
            pa.Table.from_arrays(
                [
                    pa.array(np.ones(k, dtype=np.int8)),
                    pa.array(dm, pa.string()),
                    pa.nulls(k, pa.string()),
                    pa.array(dsf, pa.string()),
                    pa.nulls(k, pa.string()),
                    pa.array(dk, pa.string()),
                    pa.array(dka, pa.string()),
                    pa.array(dbkt, pa.int32()),
                    pa.array(dga, pa.int32()),
                    pa.array(dgb, pa.int32()),
                    pa.array(np.zeros(k, np.int64)),
                ],
                schema=P1_SCHEMA,
            )
        )
    if cnt_key:
        k = len(cnt_key)
        chunks.append(
            pa.Table.from_arrays(
                [
                    pa.array(np.full(k, 2, dtype=np.int8)),
                    pa.nulls(k, pa.string()),
                    pa.nulls(k, pa.string()),
                    pa.nulls(k, pa.string()),
                    pa.array(cnt_tag, pa.string()),
                    pa.array(cnt_key, pa.string()),
                    pa.nulls(k, pa.string()),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(np.full(k, -1, np.int32)),
                    pa.array(cnt_n, pa.int64()),
                ],
                schema=P1_SCHEMA,
            )
        )
    if not chunks:
        return P1_SCHEMA.empty_table()
    return pa.concat_tables(chunks)


def _pairgen_salted(t: pa.Table) -> pa.Table:
    """Phase 2: one partition of salted sub-group member rows -> pairs.

    Runs are (ga, gb) sub-groups of hot blocks: (a, a) pairs all-of-bucket-a
    (triu); (a, b), a<b, pairs cross-bucket only, one orientation.
    """
    n = t.num_rows
    if n == 0:
        return _EMPTY_PAIRS
    t = _sort_by_key(t)
    keys = np.asarray(t["block_key"].to_pylist(), dtype=object)
    mids = np.asarray(t["mention_id"].to_pylist(), dtype=object)
    surfs = np.asarray(t["surface"].to_pylist(), dtype=object)
    kas = np.asarray(t["keys_all"].to_pylist(), dtype=object)
    bkt = t["bkt"].to_numpy(zero_copy_only=False)
    ga = t["ga"].to_numpy(zero_copy_only=False)
    gb = t["gb"].to_numpy(zero_copy_only=False)

    starts, ends = _runs(keys)
    li_all, ri_all = [], []
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
                li_all.append(la.ravel())
                ri_all.append(lb.ravel())
        else:
            iu, ju = np.triu_indices(m, 1)
            li_all.append(iu + s)
            ri_all.append(ju + s)
    if not li_all:
        return _EMPTY_PAIRS
    return _pairs_table(
        mids, surfs, kas, keys, np.concatenate(li_all), np.concatenate(ri_all)
    )


def _select_pairs(t: pa.Table) -> pa.Table:
    kept = t.filter(pc.equal(t["kind"], 0))
    return kept.select(PAIR_COLS)


def _select_deferred(t: pa.Table) -> pa.Table:
    kept = t.filter(pc.equal(t["kind"], 1))
    return pa.Table.from_arrays(
        [
            kept["block_key"], kept["id_lo"], kept["s_lo"], kept["keys_all"],
            kept["bkt"], kept["ga"], kept["gb"],
        ],
        names=["block_key", "mention_id", "surface", "keys_all", "bkt", "ga", "gb"],
    )


def generate_pairs(
    blocks_ds,
    cfg: PipelineConfig | None = None,
    num_partitions: int | None = None,
    counters: dict | None = None,
    rows_hint: int | None = None,
):
    """blocks Dataset -> deduped candidate-pairs Dataset.

    ONE full-data wide op (hash repartition on ``block_key``, sorted within
    partition); pair materialization, skew detection, salting decisions,
    cross-band dedup and canonicalization all happen inside the downstream
    tasks.  Hot blocks re-shuffle only their own member rows in a second,
    much smaller keyed repartition.  ``counters`` (optional dict) receives
    skew accounting: hot-block count, dropped oversized blocks/rows.
    ``rows_hint`` (estimated block rows) sizes the partition count without
    forcing an extra materialization.
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
    part = blocks_ds.repartition(num_partitions, keys=["block_key"])
    phase1 = part.map_batches(
        _phase1,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # batch = the whole partition block (complete groups)
    ).materialize()  # consumed by pairs + deferred + counter reads

    if counters is not None:
        crows = phase1.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 2)).select(["s_hi", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
        over = [r for r in crows if r["s_hi"] == "dropped"]
        counters["hot_blocks"] = len(crows)
        counters["dropped_oversized_blocks"] = len(over)
        counters["dropped_oversized_rows"] = int(sum(r["n"] for r in over))

    pairs1 = phase1.map_batches(
        _select_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    deferred = phase1.map_batches(
        _select_deferred, batch_format="pyarrow", zero_copy_batch=True
    )
    n_deferred = deferred.count()
    if n_deferred == 0:
        return pairs1
    p2 = max(
        shuffle_partitions(), -(-n_deferred // cfg.pair_partition_rows)
    )
    pairs2 = deferred.repartition(p2, keys=["block_key"]).map_batches(
        _pairgen_salted,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return pairs1.union(pairs2)

"""Generic salted in-group pair generation for single-key blockings.

The dedup pipelines (byte-set Jaccard, embedding-cosine) block rows by ONE
key each (``(lang, source)``, ``label``) — unlike the linkage pair stage
(stages/pairs.py) there is no multi-band membership and hence no
first-shared-slot dedup; a pair exists in exactly one group.  That permits
a simpler and cheaper plan than the two-phase deferred salting:

1. **Hot-group census** — a pre-aggregated ``groupby(key).count()`` over
   the 8-byte key column only (partial counts combine map-side inside the
   hash aggregate; the exchange moves key+count, never payload).  Groups
   above ``salt_threshold`` become the broadcast *hot set* (bounded by
   rows/salt_threshold entries); groups above ``max_group_size`` become
   the *oversized set*, dropped whole and counted (never silent — the
   counter-example is the reference's silent row drops,
   /root/reference/utils_e2e_span.py:312-318).
2. **Routing** — a streaming ``map_batches`` assigns each row its final
   shuffle key: cold rows keep their group key; hot rows are triangle-salt
   replicated (member with bucket ``h = hash(id) % nsalt`` is emitted under
   every sub-key ``(ga, gb)``, ``ga <= gb``, with ``h in {ga, gb}`` — the
   union of sub-group pairings is EXACTLY the group's pair set, each pair
   once, every sub-group O(salt_target^2)); oversized rows are filtered.
   Fully vectorized (np.isin / searchsorted / repeat) — no per-row Python.
3. **ONE keyed repartition** on the routing key (Ray hash shuffle; the
   partitioning contract util.assert_partition_contract guards) followed
   by in-task run detection and pair generation; the caller's vectorized
   ``score_fn(table, li, ri) -> pa.Table`` scores each partition's pairs
   in place, so only scored survivors leave the task.

Compared to a block self-join this moves n member rows per group instead of
n^2 joined rows, and compared to the deferred two-phase it needs no
materialized intermediate at all — the census pass touches only the key
column.  Skew accounting lands in the caller's ``counters`` dict driver-side
(the census already knows every hot/oversized group size exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from biomedical_el_ray.functions.hashing import splitmix64

_SALT_MIX = np.uint64(0x5A17_0000_0000_0001)
_ROUTE_COLS = ("rkey", "bkt", "ga", "gb")


def _census(census_src, key_col: str, salt_threshold: int, max_group_size: int):
    """Count group sizes; return (hot_keys, hot_sizes, oversized_keys,
    oversized_sizes, total_rows) — numpy arrays (uint64 / int64) + int.

    ONE driver-blocking job: the groupby output batches are folded
    map-side into (hot rows + one per-batch total sentinel row), so the
    take_all yields both the bounded hot set (<= rows / salt_threshold
    entries) and the exact total row count without a second aggregate or
    a counts materialize."""
    import pyarrow.compute as pc

    def _fold(t: pa.Table) -> pa.Table:
        if t.num_rows:
            tot = int(pc.sum(t["count()"]).as_py() or 0)
            hot = t.filter(pc.greater(t["count()"], salt_threshold))
            k = hot[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            c = hot["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            tot = 0
            k = np.empty(0, np.int64)
            c = np.empty(0, np.int64)
        return pa.table(
            {
                key_col: pa.array(np.append(k, 0).astype(np.int64)),
                "cnt": pa.array(np.append(c, tot).astype(np.int64)),
                "is_total": pa.array(
                    np.append(np.zeros(len(k), np.int8), np.int8(1))
                ),
            }
        )

    rows = (
        census_src.select_columns([key_col])
        .groupby(key_col)
        .count()
        .map_batches(_fold, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    total = sum(r["cnt"] for r in rows if r["is_total"])
    hot = [(r[key_col], r["cnt"]) for r in rows if not r["is_total"]]
    if not hot:
        e64 = np.array([], np.uint64)
        e = np.array([], np.int64)
        return e64, e, e64, e, int(total)
    # key_col is int64 on the Dataset side (Ray's hash aggregate cannot
    # round-trip uint64 keys above int64 max); view back to uint64 here
    keys = np.array([k for k, _ in hot], dtype=np.int64).view(np.uint64)
    sizes = np.array([c for _, c in hot], dtype=np.int64)
    order = np.argsort(keys)
    keys, sizes = keys[order], sizes[order]
    over = sizes > max_group_size
    return keys[~over], sizes[~over], keys[over], sizes[over], int(total)


def _route_batch(
    t: pa.Table,
    key_col: str,
    id_col: str,
    hot_ref,
    over_ref,
) -> pa.Table:
    """One input batch -> routed (payload + rkey/bkt/ga/gb) rows.

    Cold rows pass through once (rkey = group key, bkt = ga = gb = -1);
    hot rows are replicated to their triangle sub-keys; oversized rows are
    dropped (already counted driver-side by the census)."""
    hot_keys, hot_nsalt = ray.get(hot_ref)
    over_keys = ray.get(over_ref)
    keys = (
        t[key_col]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
        .view(np.uint64)
    )
    if over_keys.size:
        drop = np.isin(keys, over_keys)
        if drop.any():
            t = t.filter(pa.array(~drop))
            keys = keys[~drop]
    n = len(keys)
    if hot_keys.size and n:
        pos = np.searchsorted(hot_keys, keys)
        posc = np.minimum(pos, len(hot_keys) - 1)
        is_hot = hot_keys[posc] == keys
    else:
        is_hot = np.zeros(n, dtype=bool)

    neg1 = np.int32(-1)
    parts = []
    cold_idx = np.flatnonzero(~is_hot)
    if cold_idx.size:
        cold = t.take(pa.array(cold_idx)) if is_hot.any() else t
        k = cold.num_rows
        parts.append(
            cold.append_column(
                "rkey", pa.array(keys[cold_idx].view(np.int64), pa.int64())
            )
            .append_column("bkt", pa.array(np.full(k, neg1)))
            .append_column("ga", pa.array(np.full(k, neg1)))
            .append_column("gb", pa.array(np.full(k, neg1)))
        )
    hot_idx = np.flatnonzero(is_hot)
    if hot_idx.size:
        ns = hot_nsalt[posc[hot_idx]].astype(np.int64)  # replicas per row
        ids = (
            t[id_col]
            .to_numpy(zero_copy_only=False)[hot_idx]
            .astype(np.int64, copy=False)
            .view(np.uint64)
        )
        h = (splitmix64(ids) % ns.astype(np.uint64)).astype(np.int64)
        total = int(ns.sum())
        starts = np.cumsum(ns) - ns
        # within-row replica counter 0..nsalt-1, fully vectorized
        a = np.arange(total, dtype=np.int64) - np.repeat(starts, ns)
        hh = np.repeat(h, ns)
        ga = np.minimum(a, hh)
        gb = np.maximum(a, hh)
        sub = splitmix64(
            np.repeat(keys[hot_idx], ns)
            ^ (
                _SALT_MIX
                + ga.astype(np.uint64) * np.uint64(0x10001)
                + gb.astype(np.uint64)
            )
        )
        rep = t.take(pa.array(np.repeat(hot_idx, ns)))
        parts.append(
            rep.append_column("rkey", pa.array(sub.view(np.int64), pa.int64()))
            .append_column("bkt", pa.array(hh.astype(np.int32)))
            .append_column("ga", pa.array(ga.astype(np.int32)))
            .append_column("gb", pa.array(gb.astype(np.int32)))
        )
    if not parts:
        sch = t.schema
        for name, typ in zip(
            _ROUTE_COLS, (pa.int64(), pa.int32(), pa.int32(), pa.int32())
        ):
            sch = sch.append(pa.field(name, typ))
        return sch.empty_table()
    return pa.concat_tables(parts)


def _partition_pairs(t: pa.Table, score_fn, out_schema: pa.Schema) -> pa.Table:
    """One routed hash partition (complete rkey groups) -> scored pairs.

    Runs with ga == -1 are whole cold groups (all-pairs triu); (a, a)
    sub-groups pair bucket-a members; (a, b), a < b, pair cross-bucket
    only, one orientation — together exactly the hot group's pair set."""
    if t.num_rows == 0 or "rkey" not in t.column_names:
        return out_schema.empty_table()
    keys = t["rkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    if not np.array_equal(order, np.arange(len(order))):
        t = t.take(pa.array(order))
        keys = keys[order]
    ga = t["ga"].to_numpy(zero_copy_only=False)
    gb = t["gb"].to_numpy(zero_copy_only=False)
    bkt = t["bkt"].to_numpy(zero_copy_only=False)
    n = len(keys)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    li_parts, ri_parts = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if ga[s] >= 0 and ga[s] != gb[s]:
            idx = np.arange(s, e)
            a_idx = idx[bkt[s:e] == ga[s]]
            b_idx = idx[bkt[s:e] == gb[s]]
            if len(a_idx) and len(b_idx):
                la, lb = np.meshgrid(a_idx, b_idx, indexing="ij")
                li_parts.append(la.ravel())
                ri_parts.append(lb.ravel())
        else:
            iu, ju = np.triu_indices(m, 1)
            li_parts.append(iu + s)
            ri_parts.append(ju + s)
    if not li_parts:
        return out_schema.empty_table()
    return score_fn(t, np.concatenate(li_parts), np.concatenate(ri_parts))


def grouped_pairs(
    prepped,
    score_fn,
    out_schema: pa.Schema,
    *,
    key_col: str = "gkey",
    id_col: str,
    salt_threshold: int = 256,
    salt_target: int = 128,
    max_group_size: int = 100_000,
    pair_partition_rows: int = 50_000,
    pairs_per_partition: int = 1_000_000,
    counters: dict | None = None,
    census_ds=None,
):
    """Prepped Dataset (uint64 ``key_col`` + payload) -> scored in-group
    pairs Dataset, skew-safe.

    ``score_fn(table, li, ri)`` receives one partition's sorted row table
    and the generated index pairs and returns an ``out_schema`` table; it
    runs inside the shuffle-consumer tasks, so only its output crosses the
    object store.  ``counters`` receives exact skew accounting (salted /
    dropped groups and rows) computed driver-side from the census.

    ``census_ds``: optional CHEAP dataset carrying the same ``key_col``
    per source row (e.g. a pruned re-read of just the blocking columns).
    When given, the hot-group census runs on it and ``prepped`` streams
    straight into routing with no materialize barrier — the prep payload
    (byte masks, embeddings) is computed exactly once and never parked in
    the object store.  Without it, ``prepped`` is materialized and
    censused directly (two consumers of one lineage).
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    if census_ds is None:
        prepped = ensure_hash_shuffle(prepped).materialize()
        census_src = prepped
    else:
        prepped = ensure_hash_shuffle(prepped)
        census_src = ensure_hash_shuffle(census_ds)
    hot_keys, hot_sizes, over_keys, over_sizes, rows = _census(
        census_src, key_col, salt_threshold, max_group_size
    )
    if counters is not None:
        counters["salted_groups"] = int(len(hot_keys))
        counters["dropped_oversized_groups"] = int(len(over_keys))
        counters["dropped_oversized_rows"] = int(over_sizes.sum())
    hot_nsalt = -(-hot_sizes // salt_target)  # ceil
    hot_ref = ray.put((hot_keys, hot_nsalt.astype(np.int64)))
    over_ref = ray.put(over_keys)

    routed = prepped.map_batches(
        _route_batch,
        fn_kwargs={
            "key_col": key_col,
            "id_col": id_col,
            "hot_ref": hot_ref,
            "over_ref": over_ref,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    routed_rows = rows + int((hot_sizes * hot_nsalt).sum())
    est_hot_pairs = int((hot_sizes * salt_target).sum()) // 2
    num_partitions = max(
        shuffle_partitions(),
        -(-routed_rows // pair_partition_rows),
        -(-est_hot_pairs // pairs_per_partition),
    )
    out = routed.repartition(num_partitions, keys=["rkey"]).map_batches(
        _partition_pairs,
        fn_kwargs={"score_fn": score_fn, "out_schema": out_schema},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # batch = whole partition (complete groups)
    )
    # degenerate inputs (no groups at all) can yield a ZERO-block dataset,
    # whose to_pandas() loses the schema; one typed empty block pins it
    # (plain union — no materialize on the pair output)
    return ray.data.from_arrow(out_schema.empty_table()).union(out)

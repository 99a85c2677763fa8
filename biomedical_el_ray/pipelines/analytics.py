"""Relational pipelines over the TPC-H-ish driver tables.

Exercises the engine's aggregation / join / top-k / windowing operators
(SURVEY.md §2.5 G1-G5, §2.4 J1, §2.6 T1-T5) with exact DuckDB oracles.
Money amounts are aggregated as integer cents (round(x*100) per row, then
int64 sums) so Ray's parallel partial aggregation and DuckDB's sequential
sum are bit-identical — double sums are not associative, int sums are.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from biomedical_el_ray.sources.readers import read_table


def _cents(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    # floor(x*100 + 0.5), NOT round(): pyarrow rounds half-to-even while
    # DuckDB rounds half-away-from-zero; floor(+0.5) is identical in both
    return pc.cast(
        pc.floor(pc.add(pc.multiply(arr, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()
    )


def pricing_summary(sf_dir: str):
    """Q1-style pricing summary (G1-analog grouped aggregation).

    (l_returnflag, l_linestatus, sum_qty, sum_base_cents, sum_disc_cents,
     count_order)
    """
    li = read_table(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        qty = pc.cast(
            pc.floor(pc.add(t["l_quantity"], pa.scalar(0.5))), pa.int64()
        )
        base = _cents(t["l_extendedprice"])
        disc = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )
        return pa.Table.from_arrays(
            [t["l_returnflag"], t["l_linestatus"], qty, base, disc],
            names=["l_returnflag", "l_linestatus", "qty", "base_c", "disc_c"],
        )

    from ray.data.aggregate import Count, Sum

    agg = (
        li.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty"), Sum("base_c"), Sum("disc_c"), Count())
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_cents",
                "sum_disc_cents",
                "count_order",
            ]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def top_customers(sf_dir: str, k: int = 10):
    """Top-k customers by total order value (J1 join + T1 top-k).

    (c_custkey, c_name, total_cents, n_orders) — ties broken by c_custkey.
    """
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_custkey"], _cents(t["o_totalprice"])], names=["o_custkey", "cents"]
        )

    from ray.data.aggregate import Count, Sum

    per_cust = (
        orders.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("cents"), Count())
        .map_batches(
            lambda t: t.rename_columns(["o_custkey", "total_cents", "n_orders"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # T1 at scale: per-block partial top-k inside map_batches (no data moves),
    # then a global merge over <= k rows/block — replaces the full sort+limit
    # all-to-all; the k-row winner set then resolves names via broadcast
    # lookup, never a shuffle join of the whole customer table.
    from biomedical_el_ray.util import drop_empty_blocks

    per_cust = drop_empty_blocks(per_cust)  # schema-less empty hash partitions

    def _partial_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t,
            sort_keys=[("total_cents", "descending"), ("o_custkey", "ascending")],
        )
        return t.take(order[:k])

    topk_rows = (
        per_cust.map_batches(_partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["total_cents", "o_custkey"], descending=[True, False])
        .limit(k)
        .take_all()
    )  # k rows — small-result materialization
    keys = [r["o_custkey"] for r in topk_rows]
    key_arr = np.asarray(keys, dtype=np.int64)

    def _lookup(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ck, key_arr)))

    names = {
        r["c_custkey"]: r["c_name"]
        for r in cust.map_batches(
            _lookup, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    }
    out = pa.Table.from_arrays(
        [
            pa.array(keys, pa.int64()),
            pa.array([names[v] for v in keys], pa.string()),
            pa.array([r["total_cents"] for r in topk_rows], pa.int64()),
            pa.array([int(r["n_orders"]) for r in topk_rows], pa.int64()),
        ],
        names=["c_custkey", "c_name", "total_cents", "n_orders"],
    )
    return ray.data.from_arrow(out)


def customers_per_region(sf_dir: str):
    """3-way dim join via broadcast dicts (J2-analog: small side in a dict,
    not a shuffle join): (r_name, n_customers)."""
    import pyarrow.parquet as pq
    import os

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    r_by_key = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n_to_r = {
        nk: r_by_key[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    }
    lookup_ref = ray.put(n_to_r)

    class _Tag:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = [self.lookup[nk] for nk in t["c_nationkey"].to_pylist()]
            return pa.Table.from_arrays([pa.array(names, pa.string())], names=["r_name"])

    cust = read_table(sf_dir, "customer", ["c_nationkey"])
    tagged = cust.map_batches(
        _Tag, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )
    return (
        tagged.groupby("r_name")
        .count()
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["r_name"], pc.cast(t["count()"], pa.int64())],
                names=["r_name", "n_customers"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def lineitems_per_order_histogram(sf_dir: str):
    """Two-level aggregate (G5-analog): (n_items, n_orders)."""
    li = read_table(sf_dir, "lineitem", ["l_orderkey"])
    from ray.data.aggregate import Count

    per_order = li.groupby("l_orderkey").count()
    return (
        per_order.map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.cast(t["count()"], pa.int64())], names=["n_items"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_items")
        .count()
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["n_items"], pc.cast(t["count()"], pa.int64())],
                names=["n_items", "n_orders"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def events_by_type(sf_dir: str):
    """(event_type, n_events, sum_value_cents)."""
    ev = read_table(sf_dir, "events", ["event_type", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["event_type"], _cents(t["value"])], names=["event_type", "cents"]
        )

    from ray.data.aggregate import Count, Sum

    return (
        ev.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Count(), Sum("cents"))
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["event_type"], pc.cast(t["count()"], pa.int64()), t["sum(cents)"]],
                names=["event_type", "n_events", "sum_value_cents"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


SESSION_GAP_US = 1_800_000_000  # 30 min


_SESSIONS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_sessions", pa.int64()),
        ("max_gap_us", pa.int64()),
    ]
)


def _sessions_partition(t: pa.Table) -> pa.Table:
    """One hash partition (complete user groups) -> per-user session stats.

    Fully vectorized windowed aggregate: one in-task sort by
    (user_id, ts, event_id), run detection by a shifted compare, session
    counts via np.bincount and max gaps via np.maximum.at — no per-group
    Python, unlike groupby().map_groups which calls a pandas fn once per
    user (the per-row-Python anti-pattern at 10^12-row scale).
    """
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return _SESSIONS_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending"),
        ],
    )
    t = t.take(idx)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = (
        t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    )
    n = len(uid)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = uid[1:] != uid[:-1]
    rid = np.cumsum(change) - 1          # run id per row
    n_runs = int(rid[-1]) + 1
    gaps = np.diff(ts)
    valid = ~change[1:]                   # gap i is within-user iff no uid change
    n_events = np.bincount(rid, minlength=n_runs)
    breaks = valid & (gaps > SESSION_GAP_US)
    n_sessions = 1 + np.bincount(rid[:-1][breaks], minlength=n_runs)
    max_gap = np.zeros(n_runs, dtype=np.int64)
    np.maximum.at(max_gap, rid[:-1][valid], gaps[valid])
    starts = np.flatnonzero(change)
    return pa.Table.from_arrays(
        [
            pa.array(uid[starts], pa.int64()),
            pa.array(n_events.astype(np.int64)),
            pa.array(n_sessions.astype(np.int64)),
            pa.array(max_gap),
        ],
        schema=_SESSIONS_SCHEMA,
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ref_event_id", pa.int64()),
        ("lag_us", pa.int64()),
    ]
)


def _asof_partition(t: pa.Table, left_type: str, right_type: str) -> pa.Table:
    """One hash partition (complete user groups) -> as-of joined left rows.

    Vectorized last-prior-match: sort (user_id, ts, side, event_id) with
    reference rows first at equal timestamps, take a running
    ``maximum.accumulate`` of reference positions, and reject matches that
    leak across a user boundary — no per-group Python.
    """
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return _ASOF_SCHEMA.empty_table()
    side = pc.equal(t["event_type"], left_type).to_numpy(zero_copy_only=False)
    idx = pc.sort_indices(
        pa.Table.from_arrays(
            [t["user_id"], t["ts"], pa.array(side.astype(np.int8)), t["event_id"]],
            names=["user_id", "ts", "side", "event_id"],
        ),
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                   ("side", "ascending"), ("event_id", "ascending")],
    ).to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy(zero_copy_only=False)[idx]
    eid = t["event_id"].to_numpy(zero_copy_only=False)[idx]
    ts = (
        t["ts"].to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)[idx]
    )
    is_left = side[idx]
    n = len(uid)
    pos = np.arange(n, dtype=np.int64)
    last_ref = np.maximum.accumulate(np.where(~is_left, pos, -1))
    lrows = np.flatnonzero(is_left)
    g = last_ref[lrows]
    # a match must not cross a user boundary
    ok = (g >= 0) & (uid[np.maximum(g, 0)] == uid[lrows])
    ref_ids = np.where(ok, eid[np.maximum(g, 0)], 0)
    lags = np.where(ok, ts[lrows] - ts[np.maximum(g, 0)], 0)
    return pa.Table.from_arrays(
        [
            pa.array(eid[lrows], pa.int64()),
            pa.array(uid[lrows], pa.int64()),
            pa.array(ref_ids, pa.int64(), mask=~ok),
            pa.array(lags, pa.int64(), mask=~ok),
        ],
        schema=_ASOF_SCHEMA,
    )


def events_asof(sf_dir: str, left_type: str = "purchase",
                right_type: str = "click"):
    """As-of join custom operator: each ``left_type`` event joined to the
    most recent prior-or-simultaneous ``right_type`` event of the same
    user (ties at equal timestamps -> highest reference event_id;
    unmatched lefts keep null reference/lag).

    (event_id, user_id, ref_event_id, lag_us) — ONE keyed hash
    repartition on user_id co-locates each user's full history, then the
    merge is a vectorized in-task scan.  Partitioning assumption: a
    user's history fits one partition (same contract as sessionization);
    at 100 TB, salt by coarse time range and stitch boundaries with a
    second tiny pass over per-range tail references.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array([left_type, right_type])))

    ev = ensure_hash_shuffle(ev.map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True))
    return ev.repartition(shuffle_partitions(), keys=["user_id"]).map_batches(
        _asof_partition,
        fn_kwargs={"left_type": left_type, "right_type": right_type},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


_RANGE_WIN_US = 600_000_000  # 10 min


def _range_partition(t: pa.Table, left_type: str, right_type: str,
                     win_us: int) -> pa.Table:
    """One hash partition (complete user groups) -> range-joined pairs.

    Vectorized interval join: sort each side per user by timestamp, then
    two ``searchsorted`` calls per partition bound the window
    ``[ts - win, ts]`` for every left row at once; pairs are expanded
    with repeat/arange arithmetic — no per-row Python."""
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ref_event_id", pa.int64()),
            ("lag_us", pa.int64()),
        ]
    )
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return schema.empty_table()
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    ts = (
        t["ts"].to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)
    )
    etype = t["event_type"].to_numpy(zero_copy_only=False)
    # sort each side by (user, ts, eid)
    lsel = etype == left_type
    rsel = etype == right_type
    lorder = np.lexsort((eid[lsel], ts[lsel], uid[lsel]))
    rorder = np.lexsort((eid[rsel], ts[rsel], uid[rsel]))
    lu, lt_, le = uid[lsel][lorder], ts[lsel][lorder], eid[lsel][lorder]
    ru, rt, re_ = uid[rsel][rorder], ts[rsel][rorder], eid[rsel][rorder]
    nl, nr = len(lu), len(ru)
    if nl == 0 or nr == 0:
        return schema.empty_table()

    def _rank(qu: np.ndarray, qt: np.ndarray, marker: int) -> np.ndarray:
        """Position of each (user, ts) query key in the (ru, rt) order —
        merge-rank: lexsort the union with a marker deciding whether
        equal keys land before (marker -1) or after (marker 1) the
        reference rows.  O((nl+nr) log) total, no per-row search."""
        allu = np.concatenate([ru, qu])
        allt = np.concatenate([rt, qt])
        mk = np.concatenate(
            [np.zeros(nr, np.int8), np.full(nl, marker, np.int8)]
        )
        order = np.lexsort((mk, allt, allu))
        # rank of each merged row among reference rows = #refs before it
        is_q = order >= nr
        ref_before = np.cumsum(~is_q) - (~is_q)
        pos = np.empty(nl, dtype=np.int64)
        pos[order[is_q] - nr] = ref_before[is_q]
        return pos

    lo = _rank(lu, lt_ - win_us, -1)
    hi = _rank(lu, lt_, 1)
    counts = hi - lo
    rows = np.repeat(np.arange(nl), counts)
    intra = np.arange(int(counts.sum())) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    refs = np.repeat(lo, counts) + intra
    # the ts window is bounded per the merge ranks; users can only
    # mismatch if a window spilled into a neighbor's slice — filter
    keep = ru[refs] == lu[rows]
    rows, refs = rows[keep], refs[keep]
    return pa.Table.from_arrays(
        [
            pa.array(le[rows], pa.int64()),
            pa.array(lu[rows], pa.int64()),
            pa.array(re_[refs], pa.int64()),
            pa.array(lt_[rows] - rt[refs], pa.int64()),
        ],
        schema=schema,
    )


def events_range_join(sf_dir: str, left_type: str = "error",
                      right_type: str = "click",
                      win_us: int = _RANGE_WIN_US):
    """Range-join custom operator: every (``left_type`` event, same-user
    ``right_type`` event within the ``win_us`` window before it) pair.

    (event_id, user_id, ref_event_id, lag_us) with 0 <= lag_us <=
    win_us.  Same partitioning contract as the as-of join: one keyed
    hash repartition on user_id co-locates each user's history; the
    in-task join is sort + binary-search window bounds.  At 100 TB,
    salt by coarse time range and replay the window-width boundary
    strip in a second pass.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array([left_type, right_type])))

    ev = ensure_hash_shuffle(ev.map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True))
    return ev.repartition(shuffle_partitions(), keys=["user_id"]).map_batches(
        _range_partition,
        fn_kwargs={"left_type": left_type, "right_type": right_type,
                   "win_us": win_us},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def events_range_join_oracle_sql(left_type: str = "error",
                                 right_type: str = "click",
                                 win_us: int = _RANGE_WIN_US) -> str:
    """DuckDB SQL equivalent of ``events_range_join``."""
    return f"""
        WITH l AS (
          SELECT event_id, user_id, epoch_us(ts) AS tu
          FROM events WHERE event_type = '{left_type}'),
        r AS (
          SELECT event_id AS ref_event_id, user_id, epoch_us(ts) AS rtu
          FROM events WHERE event_type = '{right_type}')
        SELECT l.event_id, l.user_id, r.ref_event_id,
               l.tu - r.rtu AS lag_us
        FROM l JOIN r
          ON l.user_id = r.user_id
         AND r.rtu BETWEEN l.tu - {win_us} AND l.tu
    """


def events_asof_oracle_sql(left_type: str = "purchase",
                           right_type: str = "click") -> str:
    """DuckDB SQL equivalent of ``events_asof`` (window-function form so
    the equal-timestamp tie-break is explicit, unlike native ASOF JOIN)."""
    return f"""
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS tu
          FROM events WHERE event_type IN ('{left_type}', '{right_type}')),
        o AS (
          SELECT event_id, user_id, event_type, tu,
                 last_value(CASE WHEN event_type = '{right_type}'
                                 THEN event_id END IGNORE NULLS)
                   OVER w AS ref_id,
                 last_value(CASE WHEN event_type = '{right_type}'
                                 THEN tu END IGNORE NULLS)
                   OVER w AS ref_tu
          FROM ev
          WINDOW w AS (
            PARTITION BY user_id
            ORDER BY tu,
                     CASE WHEN event_type = '{right_type}' THEN 0 ELSE 1 END,
                     event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, ref_id AS ref_event_id,
               tu - ref_tu AS lag_us
        FROM o WHERE event_type = '{left_type}'
    """


def user_sessions(sf_dir: str):
    """Windowed sessionization (per-user ordered gap analysis — the
    engine's windowed-aggregate custom operator): ONE keyed hash
    repartition on user_id, then vectorized in-task window analysis.

    (user_id, n_events, n_sessions, max_gap_us)
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id"])
    ev = ensure_hash_shuffle(ev)
    return ev.repartition(shuffle_partitions(), keys=["user_id"]).map_batches(
        _sessions_partition,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def events_hourly(sf_dir: str):
    """(hour_bucket, event_type, n_events, sum_value_cents) — tumbling
    one-hour window aggregate over the events stream.

    The bucket is integer microsecond-epoch floor-division (no calendar
    formatting, so numpy and DuckDB agree exactly); the aggregation is the
    standard partial-combine groupby — the shuffle moves one row per
    (bucket, type) per block, never the events."""
    ev = read_table(sf_dir, "events", ["event_type", "value", "ts"])

    def _prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # timestamp[us] -> epoch micros
        bucket = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.Table.from_arrays(
            [bucket, t["event_type"], _cents(t["value"])],
            names=["hour_bucket", "event_type", "cents"],
        )

    from ray.data.aggregate import Count, Sum

    return (
        ev.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour_bucket", "event_type"])
        .aggregate(Count(), Sum("cents"))
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t["hour_bucket"], t["event_type"],
                    pc.cast(t["count()"], pa.int64()), t["sum(cents)"],
                ],
                names=["hour_bucket", "event_type", "n_events", "sum_value_cents"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def events_hourly_oracle_sql(events_rel: str = "events") -> str:
    return f"""
        SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents
        FROM {events_rel}
        GROUP BY 1, 2
    """


def events_sliding(sf_dir: str, window_us: int = 3_600_000_000,
                   hop_us: int = 900_000_000):
    """(win_bucket, event_type, n_events, sum_value_cents) — HOPPING
    (sliding) window aggregate: one-hour windows advancing every 15
    minutes.  ``win_bucket`` is the window's start time in hop units
    (start = win_bucket * hop_us microseconds since epoch).

    The streaming-window shape Ray Data lacks natively: each event is
    exploded into the window_us/hop_us (= 4 by default) windows that
    contain it — a bounded, in-task fan-out — then the same partial-
    combine groupby as the tumbling variant reduces per block before one
    small (bucket, type) shuffle.  At 100 TB the explode factor is the
    overlap ratio, a constant; nothing per-window ever holds the events.
    """
    if window_us % hop_us != 0:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us
    ev = read_table(sf_dir, "events", ["event_type", "value", "ts"])

    def _explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = us // hop_us
        n = base.size
        # windows with start bucket base-k+1 .. base all contain t
        buckets = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return pa.Table.from_arrays(
            [
                pa.array(buckets),
                t["event_type"].take(idx),
                _cents(t["value"]).take(idx),
            ],
            names=["win_bucket", "event_type", "cents"],
        )

    from ray.data.aggregate import Count, Sum

    return (
        ev.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["win_bucket", "event_type"])
        .aggregate(Count(), Sum("cents"))
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t["win_bucket"], t["event_type"],
                    pc.cast(t["count()"], pa.int64()), t["sum(cents)"],
                ],
                names=["win_bucket", "event_type", "n_events",
                       "sum_value_cents"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def events_sliding_oracle_sql(events_rel: str = "events",
                              window_us: int = 3_600_000_000,
                              hop_us: int = 900_000_000) -> str:
    k = window_us // hop_us
    return f"""
        SELECT epoch_us(ts) // {hop_us} - w.i AS win_bucket,
               event_type, count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents
        FROM {events_rel} CROSS JOIN range({k}) w(i)
        GROUP BY 1, 2
    """


def priority_revenue(sf_dir: str, since: str = "1998-01-01",
                     num_partitions: int | None = None):
    """Revenue by order priority over recent shipments — the engine's
    large-x-large distributed JOIN (lineitem |><| orders on orderkey,
    TPC-H Q12 shape).

    Unlike the broadcast joins elsewhere (J2: small side via ``ray.put``),
    BOTH sides here grow with the dataset, so this routes through Ray
    Data's hash-shuffle ``Dataset.join``: each side is hash-partitioned
    on the order key and matching partitions join in-task.  Two choices
    keep the shuffle small at 100 TB:

    - the date filter and a map-side combine run BEFORE the shuffle:
      each lineitem batch is filtered then pre-aggregated per orderkey
      with Arrow's hash aggregate, so the join's probe side carries one
      (orderkey, rev_c, n_items) row per orderkey-per-batch — int cents,
      never the raw price columns (sum associativity makes the partial
      rows safe to aggregate after the join);
    - ``num_partitions`` defaults to the cluster CPU count; at real scale
      size it so each hash partition's build side fits a worker's heap.

    Output: (o_orderpriority, n_items, revenue_cents), priority-ascending.
    """
    li = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    cut = pa.scalar(pd.Timestamp(since), pa.timestamp("us"))

    def _combine(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_shipdate"], cut))
        rev = _cents(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        )
        tt = pa.Table.from_arrays(
            [t["l_orderkey"], rev], names=["l_orderkey", "rev_c"]
        )
        g = tt.group_by("l_orderkey").aggregate(
            [("rev_c", "sum"), ("rev_c", "count")]
        )
        return g.rename_columns(["l_orderkey", "rev_c", "n_items"])

    if num_partitions is None:
        num_partitions = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    part = li.map_batches(
        _combine, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    agg = (
        part.groupby("o_orderpriority")
        .aggregate(Sum("rev_c"), Sum("n_items"))
        .map_batches(
            lambda t: t.rename_columns(
                ["o_orderpriority", "revenue_cents", "n_items"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return drop_empty_blocks(agg).sort("o_orderpriority")


def priority_revenue_oracle_sql(since: str = "1998-01-01") -> str:
    """Exact DuckDB twin of ``priority_revenue`` (int-cent sums)."""
    return f"""
        SELECT o_orderpriority,
               CAST(sum(CAST(floor(
                      l_extendedprice * (1 - l_discount) * 100 + 0.5
                    ) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '{since}'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


def dormant_customers(sf_dir: str, since: str = "2000-01-01",
                      num_partitions: int | None = None):
    """(c_custkey, c_name) — customers with NO order since ``since``:
    the distributed ANTI-join (the churn / negative-audience query, and
    the same shape as training-data "drop everything already seen"
    filters when the seen-set is too large to broadcast).

    Where ``hard_negatives`` anti-joins against a BROADCAST gold set,
    both sides here scale with the dataset, so this uses the hash-shuffle
    join with ``join_type="left_anti"``.  The probe side is first
    filtered to the window and deduplicated per batch with ``pc.unique``
    (a map-side combine: at most one key per custkey-per-batch rides the
    shuffle, not one per order).  Output is custkey-ascending.
    """
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cut = pa.scalar(pd.Timestamp(since), pa.timestamp("us"))

    def _recent_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], cut))
        keys = t["o_custkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.Table.from_arrays([pc.unique(keys)], names=["o_custkey"])

    if num_partitions is None:
        num_partitions = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    anti = cust.join(
        orders.map_batches(
            _recent_keys, batch_format="pyarrow", zero_copy_batch=True
        ),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    from biomedical_el_ray.util import drop_empty_blocks

    return drop_empty_blocks(anti).sort("c_custkey")


def dormant_customers_oracle_sql(since: str = "2000-01-01") -> str:
    """Exact DuckDB twin of ``dormant_customers``."""
    return f"""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '{since}')
        ORDER BY c_custkey
    """


def events_rollup(sf_dir: str):
    """(event_type, hour_bucket, n_events, sum_value_cents, lvl) — the
    SQL ROLLUP shape over the events stream: lvl 0 = per (type, hour)
    detail, lvl 1 = per-type subtotal (hour_bucket = -1), lvl 2 = grand
    total (event_type = 'ALL') — the multi-level report every dashboard
    wants from one pass.

    The subtotal levels aggregate the BOUNDED lvl-0 table (hours x
    types), never the raw events: the detail groupby is the proven
    ``events_hourly`` partial-combine; lvl 1 is one tiny groupby over
    it; the grand total is a driver scalar over the same bounded rows.
    Integer sentinels (-1 / 'ALL') instead of SQL NULL rollup markers
    keep the hash compare unambiguous.
    """
    import ray
    from ray.data.aggregate import Sum

    base = events_hourly(sf_dir).materialize()

    def _lvl0(t: pa.Table) -> pa.Table:
        return t.select(
            ["event_type", "hour_bucket", "n_events", "sum_value_cents"]
        ).append_column("lvl", pa.array(np.zeros(t.num_rows, np.int64)))

    lvl0 = base.map_batches(_lvl0, batch_format="pyarrow",
                            zero_copy_batch=True)
    lvl1 = base.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t["event_type"],
                pa.array(np.full(t.num_rows, -1, np.int64)),
                pc.cast(t["n_events"], pa.int64()),
                pc.cast(t["sum_value_cents"], pa.int64()),
                pa.array(np.ones(t.num_rows, np.int64)),
            ],
            names=["event_type", "hour_bucket", "n_events",
                   "sum_value_cents", "lvl"],
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    totals = base.sum(["n_events", "sum_value_cents"])
    lvl2 = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["ALL"], pa.string()),
        "hour_bucket": pa.array([-1], pa.int64()),
        "n_events": pa.array([int(totals["sum(n_events)"])], pa.int64()),
        "sum_value_cents": pa.array(
            [int(totals["sum(sum_value_cents)"])], pa.int64()),
        "lvl": pa.array([2], pa.int64()),
    }))
    return lvl0.union(lvl1, lvl2)


def events_rollup_oracle_sql(events_rel: str = "events") -> str:
    """DuckDB twin: GROUP BY ROLLUP with GROUPING() mapped to the same
    integer sentinels."""
    return f"""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               CASE WHEN GROUPING(hb) = 1 THEN -1 ELSE hb END AS hour_bucket,
               count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS sum_value_cents,
               CAST(GROUPING(hb) + GROUPING(event_type) AS BIGINT) AS lvl
        FROM (
          SELECT epoch_us(ts) // 3600000000 AS hb, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM {events_rel})
        GROUP BY ROLLUP (event_type, hb)
    """


def user_running_totals(sf_dir: str):
    """(event_id, user_id, rn, running_cents) — the running (cumulative)
    window aggregate: each user's events in (ts, event_id) order with the
    inclusive prefix sum of their integer-cent values and the row number
    — SUM(...) OVER (PARTITION BY user ORDER BY ... ROWS UNBOUNDED
    PRECEDING) as a Ray-Data operator, completing the window family next
    to lag (``response_latency``), gap sessionization
    (``user_sessions``) and tumbling/hopping aggregates.

    ONE keyed repartition on user_id, then per-partition vectorized
    work: one sort, one global cumsum, and the per-user rebase trick of
    ``textstats._pack_partition`` (subtract each run's first-row running
    total) — no per-user Python loop.  Integer cents make every prefix
    sum exact, so the window oracle matches bit-for-bit.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = read_table(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["event_id"], pc.cast(t["ts"], pa.int64()), t["user_id"],
             _cents(t["value"])],
            names=["event_id", "tu", "user_id", "cents"],
        )

    def _run(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("rn", pa.int64()), ("running_cents", pa.int64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("tu", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        excl = np.cumsum(c) - c
        first = np.ones(u.size, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, u.size))
        base = np.repeat(excl[starts], runlen)
        rn = np.arange(u.size, dtype=np.int64) - np.repeat(starts, runlen) + 1
        return pa.Table.from_arrays(
            [t["event_id"], t["user_id"], pa.array(rn),
             pa.array(excl - base + c)],
            names=["event_id", "user_id", "rn", "running_cents"],
        )

    keyed = ensure_hash_shuffle(ev.map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True))
    return keyed.repartition(
        shuffle_partitions(), keys=["user_id"]
    ).map_batches(_run, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)


def user_running_totals_oracle_sql(events_rel: str = "events") -> str:
    return f"""
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    OVER w AS BIGINT) AS running_cents
        FROM {events_rel}
        WINDOW w AS (
          PARTITION BY user_id
          ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def event_zscores(sf_dir: str):
    """(event_id, event_type, z_r) — per-group standardization (the
    StandardScaler of ML preprocessing) of event values within their
    event_type, population statistics, in EXACT integer moments:

        z = (v·n − s) / sqrt(n·q − s²)

    with v in integer cents and (n, s, q) the group's count / sum /
    sum-of-squares — one integer numerator, one sqrt of an exact
    integer, one f64 division, so the oracle matches bit-for-bit
    (zero-variance groups standardize to 0 by convention).

    Scale shape: the moment table is one partial-combine groupby over
    <= |event_type| rows, broadcast once via ``ray.put``; the z pass is
    a streaming vectorized map (``pc.index_in`` against the broadcast
    group list).  Python-bigint moments driver-side and HUGEINT in SQL
    keep n·q − s² exact at any corpus size; the per-row numerator stays
    int64 (documented bound: |cents|·n < 2⁶³).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from biomedical_el_ray.util import ref_key, worker_state

    ev = read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"])
        return pa.Table.from_arrays(
            [t["event_id"], t["event_type"], c,
             pc.multiply(c, c)],
            names=["event_id", "event_type", "cents", "sq"],
        )

    stats = (
        ev.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Count(), Sum("cents"), Sum("sq"))
        .take_all()
    )
    types = [r["event_type"] for r in stats]
    n = {r["event_type"]: int(r["count()"]) for r in stats}
    s = {r["event_type"]: int(r["sum(cents)"]) for r in stats}
    q = {r["event_type"]: int(r["sum(sq)"]) for r in stats}
    # exact integer variance term per group (Python bigints, no overflow)
    den = np.array(
        [float(n[t_] * q[t_] - s[t_] * s[t_]) for t_ in types], np.float64)
    den = np.sqrt(den)
    st_ref = ray.put((
        pa.array(types, pa.string()),
        np.array([n[t_] for t_ in types], np.int64),
        np.array([s[t_] for t_ in types], np.int64),
        den,
    ))

    def _z(t: pa.Table) -> pa.Table:
        tys, narr, sarr, denarr = worker_state(
            ("zscore_stats", ref_key(st_ref)), lambda: ray.get(st_ref))
        gi = np.asarray(
            pc.index_in(t["event_type"], value_set=tys)).astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        num = (c * narr[gi] - sarr[gi]).astype(np.float64)
        d = denarr[gi]
        z = np.where(d == 0.0, 0.0, num / np.where(d == 0.0, 1.0, d))
        return pa.Table.from_arrays(
            [t["event_id"], t["event_type"],
             pa.array(np.round(z, 6), pa.float64())],
            names=["event_id", "event_type", "z_r"],
        )

    return ev.map_batches(_z, batch_format="pyarrow", zero_copy_batch=True)


def event_zscores_oracle_sql(events_rel: str = "events") -> str:
    return f"""
        WITH b AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM {events_rel}),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(cents) AS HUGEINT) AS s,
                 CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
          FROM b GROUP BY 1)
        SELECT b.event_id, b.event_type,
               round(CASE WHEN m.n * m.q - m.s * m.s = 0 THEN 0.0
                     ELSE CAST(b.cents * m.n - m.s AS DOUBLE)
                          / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE))
                     END, 6) AS z_r
        FROM b JOIN m ON m.event_type = b.event_type
    """


def order_priority_counts(sf_dir: str, since: str = "1997-01-01",
                          until: str = "1998-01-01",
                          min_discount: float = 0.06,
                          num_partitions: int | None = None):
    """(o_orderpriority, n_orders) — orders placed in [since, until) that
    contain at least one deeply-discounted lineitem, counted per
    priority: the distributed SEMI-join (TPC-H Q4's EXISTS shape), the
    one hash-shuffle join type the engine had not yet exercised
    (priority_revenue = inner, dormant_customers = left_anti).

    A semi join is the right plan whenever only EXISTENCE on the big
    probe side matters: the probe side ships only its KEY column —
    filtered, then per-batch ``pc.unique``-deduplicated map-side, so at
    most one key per orderkey-per-batch rides the shuffle — and the
    build side never widens (no fanout when an order has many matching
    lineitems, which an inner join + distinct would pay for).
    """
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_discount"])
    lo = pa.scalar(pd.Timestamp(since), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(until), pa.timestamp("us"))

    def _window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    def _disc_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_discount"],
                                      pa.scalar(min_discount)))
        keys = t["l_orderkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.Table.from_arrays([pc.unique(keys)], names=["l_orderkey"])

    if num_partitions is None:
        num_partitions = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    semi = orders.map_batches(
        _window, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        li.map_batches(
            _disc_keys, batch_format="pyarrow", zero_copy_batch=True),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    from ray.data.aggregate import Count

    from biomedical_el_ray.util import drop_empty_blocks

    agg = (
        drop_empty_blocks(semi)
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_orderpriority"], t["n_orders"].cast(pa.int64())],
            names=["o_orderpriority", "n_orders"])

    return drop_empty_blocks(agg).map_batches(
        _cast, batch_format="pyarrow", zero_copy_batch=True
    ).sort("o_orderpriority")


def order_priority_counts_oracle_sql(since: str = "1997-01-01",
                                     until: str = "1998-01-01",
                                     min_discount: float = 0.06) -> str:
    """Exact DuckDB twin of ``order_priority_counts``."""
    return f"""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{since}'
          AND o_orderdate <  TIMESTAMP '{until}'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_discount >= {min_discount})
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str):
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view,
    n_events, value_cents) — the events stream crosstabbed per user: one
    column per event type (the PIVOT / conditional-aggregate shape every
    feature-engineering pipeline produces for per-entity activity
    vectors).

    The pivot happens MAP-SIDE: each batch turns event_type into five
    0/1 indicator columns with vectorized Arrow equality, pre-aggregates
    per user with Arrow's hash aggregate, and only (user_id, 7 ints)
    partial rows ride the ONE bounded groupby-sum — the type dimension
    is folded into columns before the shuffle instead of shipping one
    row per (user, type) and re-pivoting after.  Integer cents keep the
    value sum combine-order-free.  The type set is fixed and declared
    (like the reference's code-defined schemas); an unexpected type
    still counts in n_events/value_cents, so nothing is silently lost.
    """
    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    ev = read_table(sf_dir, "events", ["user_id", "event_type", "value"])
    ind_names = [f"n_{t}" for t in _EVENT_TYPES]

    def _indicators(t: pa.Table) -> pa.Table:
        cols = [t["user_id"]]
        names = ["user_id"]
        for ty, nm in zip(_EVENT_TYPES, ind_names):
            cols.append(pc.cast(
                pc.equal(t["event_type"], pa.scalar(ty)), pa.int64()))
            names.append(nm)
        cols.append(pa.array(np.ones(t.num_rows, dtype=np.int64)))
        names.append("n_events")
        cols.append(_cents(t["value"]))
        names.append("value_cents")
        tt = pa.Table.from_arrays(cols, names=names)
        g = tt.group_by("user_id").aggregate(
            [(nm, "sum") for nm in names[1:]])
        return g.rename_columns(names)

    agg = (
        drop_empty_blocks(
            ev.map_batches(
                _indicators, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("user_id")
        .aggregate(*[Sum(nm, alias_name=nm)
                     for nm in ind_names + ["n_events", "value_cents"]])
    )
    return drop_empty_blocks(agg).sort("user_id")


def user_event_pivot_oracle_sql() -> str:
    """Exact DuckDB twin of ``user_event_pivot`` (FILTER aggregates)."""
    inds = ",\n               ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES)
    return f"""
        SELECT user_id,
               {inds},
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """


_FUNNEL_STAGES = ("signup", "click", "purchase")


def funnel_counts(sf_dir: str, stages: tuple[str, ...] = _FUNNEL_STAGES):
    """(stage_idx, stage, n_users) — the ordered conversion funnel over
    the events stream: a user counts for stage k when their FIRST
    occurrence of every stage 1..k exists and the first-occurrence
    timestamps are strictly increasing along the funnel (first signup
    before first click before first purchase) — the product-analytics
    staple (Amplitude/Mixpanel "funnel" with first-touch semantics).

    Scale shape: one streaming pass folds each batch into per-user
    MIN-timestamp indicator columns per stage (the ``user_event_pivot``
    map-side shape with min instead of count), then ONE bounded
    groupby-min per user; the strict-order prefix test is a vectorized
    comparison over that bounded (users x stages) table, and only the
    per-block stage counts reach the driver.  Timestamps compare as
    exact integer microseconds.
    """
    from ray.data.aggregate import Min

    from biomedical_el_ray.util import drop_empty_blocks

    ev = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])
    k = len(stages)
    SENT = np.int64(2**62)  # "never happened" sentinel, beyond any real ts

    def _mins(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        cols, names = [t["user_id"]], ["user_id"]
        for i, st in enumerate(stages):
            m = pc.equal(t["event_type"], pa.scalar(st))
            cols.append(pc.if_else(m, ts, pa.scalar(SENT, pa.int64())))
            names.append(f"t{i}")
        tt = pa.Table.from_arrays(cols, names=names)
        g = tt.group_by("user_id").aggregate(
            [(f"t{i}", "min") for i in range(k)])
        return g.rename_columns(names)

    per_user = (
        drop_empty_blocks(
            ev.map_batches(_mins, batch_format="pyarrow",
                           zero_copy_batch=True))
        .groupby("user_id")
        .aggregate(*[Min(f"t{i}", alias_name=f"t{i}") for i in range(k)])
    )

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({f"n{i}": pa.array([0], pa.int64())
                             for i in range(k)})
        ts = [t[f"t{i}"].to_numpy(zero_copy_only=False).astype(np.int64)
              for i in range(k)]
        ok = ts[0] < SENT
        counts = [int(ok.sum())]
        for i in range(1, k):
            ok = ok & (ts[i] < SENT) & (ts[i - 1] < ts[i])
            counts.append(int(ok.sum()))
        return pa.table({f"n{i}": pa.array([c], pa.int64())
                         for i, c in enumerate(counts)})

    parts = drop_empty_blocks(per_user).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = [sum(r[f"n{i}"] for r in parts) for i in range(k)]
    return pa.table({
        "stage_idx": pa.array(list(range(1, k + 1)), pa.int64()),
        "stage": pa.array(list(stages), pa.string()),
        "n_users": pa.array(n, pa.int64()),
    })


def funnel_counts_oracle_sql(stages: tuple[str, ...] = _FUNNEL_STAGES) -> str:
    """Exact DuckDB twin of ``funnel_counts`` (epoch-µs min per stage,
    strict-order prefix counts)."""
    k = len(stages)
    mins = ",\n               ".join(
        f"min(epoch_us(ts)) FILTER (event_type = '{s}') AS t{i}"
        for i, s in enumerate(stages))
    selects = []
    for i in range(k):
        conds = [f"t{j} IS NOT NULL" for j in range(i + 1)]
        conds += [f"t{j - 1} < t{j}" for j in range(1, i + 1)]
        selects.append(f"""
        SELECT {i + 1} AS stage_idx, '{stages[i]}' AS stage,
               CAST(count(*) FILTER ({" AND ".join(conds)}) AS BIGINT)
                 AS n_users
        FROM m""")
    union = "\n        UNION ALL".join(selects)
    return f"""
        WITH m AS (
          SELECT user_id,
               {mins}
          FROM events GROUP BY user_id)
        {union}
    """


def retention_cohorts(sf_dir: str, num_partitions: int | None = None):
    """(cohort_week, week_offset, n_users) — the classic retention
    matrix: users bucketed by the ISO week of their FIRST event (the
    cohort), then for every later week in which they were active, one
    distinct (cohort, offset) cell count.  Weeks are epoch-µs integer
    floor-division buckets (7*86400e6), so bucketing is exact integer
    math on both sides.

    Scale shape: ONE keyed hash repartition on user_id carries the whole
    operator.  Events shrink map-side to per-batch-distinct (user, week)
    pairs first (an Arrow hash group-by per batch), so the exchange moves
    at most one 16-byte row per (user, week) per batch — never raw
    events.  The repartition co-locates each user's full activity, so
    the global (user, week) dedup, the min-week cohort, and the offset
    cells are all ONE vectorized in-task lexsort + run-detection pass
    (Ray's sort-based ``groupby`` on a user-cardinality key measured
    ~170x slower than this at sf0.1).  Only bounded per-partition cell
    partials reach the final cohort x offset groupby.
    """
    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import (
        drop_empty_blocks,
        ensure_hash_shuffle,
        shuffle_partitions,
    )

    WEEK_US = 7 * 86_400_000_000
    ensure_hash_shuffle()  # before dataset creation (context captured then)
    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _uw(t: pa.Table) -> pa.Table:
        # integer floor division (matches SQL //), exact for negatives too
        tsn = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        wkn = tsn // WEEK_US
        tt = pa.Table.from_arrays(
            [t["user_id"], pa.array(wkn)], names=["user_id", "wk"])
        return tt.group_by(["user_id", "wk"]).aggregate([])

    def _cells_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3,
                names=["cohort_week", "week_offset", "n"])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # global (user, week) dedup: the batch-level dedup is not global
        keep = np.ones(u.size, bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        # first row of each user run is its min week (sorted) -> cohort
        starts = np.ones(u.size, bool)
        starts[1:] = u[1:] != u[:-1]
        run_ids = np.cumsum(starts) - 1
        cohort = w[starts][run_ids]
        off = w - cohort
        cells = pa.Table.from_arrays(
            [pa.array(cohort), pa.array(off)],
            names=["cohort_week", "week_offset"])
        g = cells.group_by(["cohort_week", "week_offset"]).aggregate(
            [("cohort_week", "count")])
        return g.rename_columns(["cohort_week", "week_offset", "n"])

    uw = ev.map_batches(_uw, batch_format="pyarrow", zero_copy_batch=True)
    partials = uw.repartition(
        num_partitions or shuffle_partitions(), keys=["user_id"]
    ).map_batches(
        _cells_partition, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    agg = (
        drop_empty_blocks(partials)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["cohort_week"].cast(pa.int64()),
             t["week_offset"].cast(pa.int64()),
             t["n_users"].cast(pa.int64())],
            names=["cohort_week", "week_offset", "n_users"])

    return drop_empty_blocks(agg).map_batches(
        _cast, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["cohort_week", "week_offset"])


def retention_cohorts_oracle_sql() -> str:
    """Exact DuckDB twin of ``retention_cohorts`` (integer week buckets,
    distinct user-week activity, min-week cohort)."""
    return """
        WITH uw AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 604800000000 AS wk
          FROM events),
        coh AS (
          SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
        SELECT c.cohort_week,
               CAST(u.wk - c.cohort_week AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM uw u JOIN coh c ON u.user_id = c.user_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def promo_revenue(sf_dir: str, num_partitions: int | None = None):
    """(ship_month, promo_cents, total_cents, promo_pct_r) — the TPC-H
    Q14 shape: per ship-month, how much lineitem revenue came from parts
    whose type is PROMO.  The fact x dimension join where BOTH sides
    scale with the dataset (part grows with SF), so it routes through
    the hash-shuffle ``Dataset.join`` — never a broadcast of part.

    Scale shape: lineitem batches pre-aggregate per (l_partkey, month)
    map-side (int-cent revenue partials; sum associativity makes partial
    rows safe to re-aggregate), so the shuffle carries at most one row
    per partkey-month per batch, not one per lineitem.  The part side is
    projected to (p_partkey, promo flag) map-side before the exchange.
    The post-join groupby is BOUNDED (months), and the promo share is
    one double divide + round per month — bit-identical to the SQL twin.
    """
    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    li = read_table(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    part = read_table(sf_dir, "part", ["p_partkey", "p_type"])

    def _li_partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        )
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                        pa.scalar(100, pa.int64())),
            pc.cast(pc.month(t["l_shipdate"]), pa.int64()),
        )
        tt = pa.Table.from_arrays(
            [t["l_partkey"], ym, rev], names=["l_partkey", "ship_month", "rev_c"]
        )
        g = tt.group_by(["l_partkey", "ship_month"]).aggregate([("rev_c", "sum")])
        return g.rename_columns(["l_partkey", "ship_month", "rev_c"])

    def _part_flag(t: pa.Table) -> pa.Table:
        promo = pc.cast(pc.equal(t["p_type"], pa.scalar("PROMO")), pa.int64())
        return pa.Table.from_arrays(
            [t["p_partkey"], promo], names=["p_partkey", "is_promo"]
        )

    if num_partitions is None:
        num_partitions = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    joined = li.map_batches(
        _li_partial, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        part.map_batches(_part_flag, batch_format="pyarrow", zero_copy_batch=True),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def _split(t: pa.Table) -> pa.Table:
        rev = t["rev_c"]
        promo_c = pc.multiply(rev, t["is_promo"])
        return pa.Table.from_arrays(
            [t["ship_month"], promo_c, rev],
            names=["ship_month", "promo_c", "total_c"],
        )

    agg = (
        drop_empty_blocks(
            joined.map_batches(_split, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("ship_month")
        .aggregate(Sum("promo_c"), Sum("total_c"))
    )

    def _pct(t: pa.Table) -> pa.Table:
        promo = pc.cast(t["sum(promo_c)"], pa.int64())
        total = pc.cast(t["sum(total_c)"], pa.int64())
        pct = pc.round(
            pc.divide(pc.cast(promo, pa.float64()), pc.cast(total, pa.float64())),
            ndigits=6,
        )
        return pa.Table.from_arrays(
            [t["ship_month"], promo, total, pct],
            names=["ship_month", "promo_cents", "total_cents", "promo_pct_r"],
        )

    return drop_empty_blocks(agg).map_batches(
        _pct, batch_format="pyarrow", zero_copy_batch=True
    ).sort("ship_month")


def promo_revenue_oracle_sql() -> str:
    """Exact DuckDB twin of ``promo_revenue`` (int-cent partial algebra)."""
    return """
        SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
                 AS ship_month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS promo_cents,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
               round(CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
                     / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                * 100 + 0.5) AS BIGINT)) AS DOUBLE), 6)
                 AS promo_pct_r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1 ORDER BY 1
    """


_Q5_CUST_BROADCAST_MAX = 5_000_000  # customer rows; past it, shuffle join


def local_supplier_volume(sf_dir: str, num_partitions: int | None = None):
    """(n_name, revenue_cents, n_items) — the TPC-H Q5 shape: lineitem
    revenue where the ordering customer and the supplying supplier sit in
    the SAME nation; the engine's deepest relational pipeline (five
    tables, two hash-shuffle joins plus two broadcast dimensions).

    Plan, sized for 100 TB:

    - orders |><| customer on custkey: plan="auto" on the customer
      row count (the J3 size-routing dial) — under
      ``_Q5_CUST_BROADCAST_MAX`` rows the custkey->nationkey map (two
      int64 arrays) ships once via ``ray.put`` and orders are tagged
      map-side with a ``searchsorted`` lookup (no shuffle); past the
      cap it is the large x large hash-shuffle join.  Either way only
      (o_orderkey, c_nationkey) survive the projection.
    - lineitem is pre-aggregated map-side per (l_orderkey, l_suppkey)
      into int-cent revenue partials before its hash-shuffle join with
      the tagged orders on orderkey — the exchange carries partials,
      never raw price columns.
    - supplier -> nationkey and nation -> name are genuinely bounded
      dimensions (|suppliers| << |lineitems|; 25 nations), broadcast
      once via ``ray.put`` and read per actor, mirroring J2; if supplier
      ever outgrows the heap the same key is already hash-join-ready.
    """
    import os

    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    supp_nat = dict(
        zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist())
    )
    nat_name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    supp_ref = ray.put(supp_nat)
    nat_ref = ray.put(nat_name)

    if num_partitions is None:
        num_partitions = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )

    cust_rows = cust.count()  # parquet metadata count — no data pass
    if cust_rows <= _Q5_CUST_BROADCAST_MAX:
        import numpy as np

        from biomedical_el_ray.util import ref_key, worker_state

        ck_parts, cn_parts = [], []
        for b in cust.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
            ck_parts.append(
                b["c_custkey"].to_numpy(zero_copy_only=False)
                .astype(np.int64))
            cn_parts.append(
                b["c_nationkey"].to_numpy(zero_copy_only=False)
                .astype(np.int64))
        ck = (np.concatenate(ck_parts) if ck_parts
              else np.empty(0, np.int64))
        cn = (np.concatenate(cn_parts) if cn_parts
              else np.empty(0, np.int64))
        o = np.argsort(ck)
        cust_ref = ray.put((ck[o], cn[o]))
        crkey = ref_key(cust_ref)

        def _tag_orders(t: pa.Table) -> pa.Table:
            empty = pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["o_orderkey", "c_nationkey"])
            keys, nats = worker_state(
                ("q5_cust", crkey), lambda: ray.get(cust_ref))
            if t.num_rows == 0 or len(keys) == 0:
                return empty  # inner-join rule: nothing matches
            ok_ = t["o_custkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(keys, ok_)
            idx = np.minimum(idx, len(keys) - 1)
            hit = keys[idx] == ok_  # inner-join rule: drop misses
            return pa.Table.from_arrays(
                [t["o_orderkey"].filter(pa.array(hit)),
                 pa.array(nats[idx[hit]], pa.int64())],
                names=["o_orderkey", "c_nationkey"],
            )

        ord_nat = orders.map_batches(
            _tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    else:
        ord_nat = orders.join(
            cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "c_nationkey"])

    def _li_partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        )
        tt = pa.Table.from_arrays(
            [t["l_orderkey"], t["l_suppkey"], rev],
            names=["l_orderkey", "l_suppkey", "rev_c"],
        )
        g = tt.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("rev_c", "sum"), ("rev_c", "count")]
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "rev_c", "n_items"])

    joined = li.map_batches(
        _li_partial, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        ord_nat,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    class _LocalFilter:
        """Broadcast supplier->nation + nation->name; keep same-nation rows."""

        def __init__(self):
            sn = ray.get(supp_ref)
            n = max(sn) + 1
            self._s2n = np.full(n, -1, dtype=np.int64)
            for k, v in sn.items():
                self._s2n[k] = v
            self._names = ray.get(nat_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            snat = self._s2n[sk]
            keep = snat == t["c_nationkey"].to_numpy(zero_copy_only=False)
            kept = t.filter(pa.array(keep))
            names = pa.array(
                [self._names[v] for v in snat[keep]], pa.string()
            )
            return pa.Table.from_arrays(
                [names, kept["rev_c"], kept["n_items"]],
                names=["n_name", "rev_c", "n_items"],
            )

    agg = (
        drop_empty_blocks(
            joined.map_batches(
                _LocalFilter,
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=(1, 4),
            )
        )
        .groupby("n_name")
        .aggregate(Sum("rev_c"), Sum("n_items"))
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["n_name"], pc.cast(t["sum(rev_c)"], pa.int64()),
             pc.cast(t["sum(n_items)"], pa.int64())],
            names=["n_name", "revenue_cents", "n_items"],
        )

    return (
        drop_empty_blocks(agg)
        .map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["revenue_cents", "n_name"], descending=[True, False])
    )


def local_supplier_volume_oracle_sql() -> str:
    """Exact DuckDB twin of ``local_supplier_volume``."""
    return """
        SELECT n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE c.c_nationkey = s.s_nationkey
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC, n_name
    """


def json_props_stats(sf_dir: str):
    """(event_type, n_events, n_missing, sum_k, min_k, max_k) — the
    semi-structured column operator: extract the integer field ``k``
    from the JSON ``props`` string per event and aggregate per type.

    The extraction is a VECTORIZED fast path for flat JSON objects:
    ``pc.extract_regex`` pulls ``"k": <int>`` straight out of the string
    buffer (no per-row json.loads; documents the flat-object assumption
    — nested/escaped payloads would need a real parser stage).  Rows
    without the key become nulls and are counted, never dropped
    silently.  Per-batch Arrow hash partials (sum/min/max/counts) ride
    the exchange; the global groupby is BOUNDED by event-type
    cardinality, so 100 TB of events reduce to a handful of rows.
    """
    from ray.data.aggregate import Max, Min, Sum

    from biomedical_el_ray.util import drop_empty_blocks

    ev = read_table(sf_dir, "events", ["event_type", "props"])

    def _partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k"\s*:\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        missing = pc.cast(pc.is_null(k), pa.int64())
        k0 = pc.fill_null(k, 0)  # sum over nulls-as-0; true sum since missing counted
        tt = pa.Table.from_arrays(
            [t["event_type"], k, k0, missing],
            names=["event_type", "k", "k0", "missing"],
        )
        g = tt.group_by("event_type").aggregate(
            [("k0", "sum"), ("k", "min"), ("k", "max"),
             ("k0", "count"), ("missing", "sum")]
        )
        return g.rename_columns(
            ["event_type", "sum_k", "min_k", "max_k", "n_rows", "n_miss"]
        )

    agg = (
        drop_empty_blocks(
            ev.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_rows", alias_name="n_events"),
            Sum("n_miss", alias_name="n_missing"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["event_type"]]
            + [pc.cast(t[c], pa.int64())
               for c in ["n_events", "n_missing", "sum_k", "min_k", "max_k"]],
            names=["event_type", "n_events", "n_missing", "sum_k", "min_k",
                   "max_k"],
        )

    return drop_empty_blocks(agg).map_batches(
        _cast, batch_format="pyarrow", zero_copy_batch=True
    ).sort("event_type")


def json_props_stats_oracle_sql() -> str:
    """Exact DuckDB twin of ``json_props_stats`` (json_extract path)."""
    return """
        WITH x AS (
          SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS n_missing,
               CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k
        FROM x GROUP BY event_type ORDER BY event_type
    """


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (LEFT OUTER join)
# --------------------------------------------------------------------------

def customer_order_distribution(sf_dir: str, exclude_status: str = "F"):
    """(c_count, custdist) — how many customers placed exactly k
    qualifying orders (``o_orderstatus <> exclude_status``), INCLUDING
    the zero bucket: the TPC-H Q13 LEFT OUTER JOIN + double-groupby
    shape (the "engagement distribution" every marketplace runs).

    Scale shape: the outer join is never materialized row-level.  The
    fact side collapses map-side (per-batch ``value_counts`` on
    o_custkey -> at most one partial per key-per-batch rides the ONE
    hash shuffle), the per-customer counts fold into a BOUNDED c_count
    histogram map-side (bincount partials), and the zero bucket is
    arithmetic: ``|customer| - |customers with >= 1 qualifying order|``
    — two driver scalars against bounded aggregates, valid because
    orders.o_custkey is referentially contained in customer.c_custkey
    (enforced by ``data_quality_audit``'s anti-join check; a dangling
    custkey would also break the oracle hash, so the assumption is
    driver-verified every round).  At 10^12 facts nothing but 12-byte
    (key, count) partials and a <= max_orders-row histogram ever moves.
    """
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    cust = read_table(sf_dir, "customer", ["c_custkey"])

    def _key_partials(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.invert(pc.equal(t["o_orderstatus"], exclude_status))
        )
        keys = t["o_custkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vc = keys.value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["o_custkey", "n"],
        )

    per_cust = (
        orders.map_batches(
            _key_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("o_custkey")
        .sum("n")
    )

    def _hist_partial(t: pa.Table) -> pa.Table:
        cnts = t["sum(n)"].to_numpy(zero_copy_only=False)
        if len(cnts) == 0:
            return pa.table(
                {"c_count": pa.array([], pa.int64()),
                 "custdist": pa.array([], pa.int64())}
            )
        bc = np.bincount(cnts)
        nz = np.flatnonzero(bc)
        return pa.table(
            {"c_count": pa.array(nz, pa.int64()),
             "custdist": pa.array(bc[nz], pa.int64())}
        )

    hist = (
        per_cust.map_batches(
            _hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("c_count")
        .sum("custdist")
        .map_batches(
            lambda t: t.rename_columns(["c_count", "custdist"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    hist_df = hist.to_pandas()
    n_cust = cust.count()
    n_zero = int(n_cust - hist_df["custdist"].sum())
    if n_zero > 0:
        hist_df = pd.concat(
            [hist_df, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    hist_df = hist_df.astype({"c_count": "int64", "custdist": "int64"})
    return hist_df.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def customer_order_distribution_oracle_sql(exclude_status: str = "F") -> str:
    """Exact DuckDB twin: the canonical Q13 LEFT OUTER JOIN form."""
    return f"""
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_custkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderstatus <> '{exclude_status}'
          GROUP BY c.c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """


# ---------------------------------------------------------------------------
# time-series densification: gap-filled hourly grid
# ---------------------------------------------------------------------------

_GAP_FILL_MAX_CELLS = 50_000_000


def events_gap_fill(sf_dir: str, max_cells: int = _GAP_FILL_MAX_CELLS):
    """(hour_bucket, event_type, n_events, sum_value_cents) — the DENSE
    hourly grid: every (hour, type) cell between the stream's first and
    last hour, zero-filled where no events landed.  The densification /
    resampling step dashboards and forecasting features need (a tumbling
    window shows only hours that HAVE events; trend math needs the empty
    ones too).  This is the engine's row-GENERATING shape: output rows
    that exist in no input block.

    Scale shape: the unbounded side (events) reduces through the same
    per-block partial-combine groupby as ``events_hourly``; the dense
    grid is GENERATED at aggregate grain — hours-span x |types|, bounded
    by wall-clock time (a decade of hours x 1000 types = 87M cells), not
    by data volume, and guarded by a loud ``max_cells`` cap.  The sparse
    aggregate is scattered into the dense frame with one vectorized
    searchsorted; nothing event-grain ever reaches the driver.
    """
    from ray.data.aggregate import Count, Sum

    ev = read_table(sf_dir, "events", ["event_type", "value", "ts"])

    def _prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        bucket = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.Table.from_arrays(
            [bucket, t["event_type"], _cents(t["value"])],
            names=["hour_bucket", "event_type", "cents"],
        )

    sparse = (
        ev.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour_bucket", "event_type"])
        .aggregate(Count(), Sum("cents"))
        .take_all()  # bounded: one row per non-empty (hour, type) cell
    )
    if not sparse:
        return pa.schema([
            ("hour_bucket", pa.int64()), ("event_type", pa.string()),
            ("n_events", pa.int64()), ("sum_value_cents", pa.int64()),
        ]).empty_table()
    hb = np.array([r["hour_bucket"] for r in sparse], np.int64)
    et = np.array([r["event_type"] for r in sparse], object)
    n = np.array([r["count()"] for r in sparse], np.int64)
    c = np.array([r["sum(cents)"] for r in sparse], np.int64)
    lo, hi = int(hb.min()), int(hb.max())
    types = np.array(sorted(set(et.tolist())), object)
    n_hours, n_types = hi - lo + 1, len(types)
    if n_hours * n_types > max_cells:
        raise ValueError(
            f"gap-fill grid {n_hours} hours x {n_types} types exceeds "
            f"max_cells={max_cells}; raise the cap or coarsen the bucket"
        )
    dense_n = np.zeros(n_hours * n_types, np.int64)
    dense_c = np.zeros(n_hours * n_types, np.int64)
    ti = np.searchsorted(types, et)
    cell = (hb - lo) * n_types + ti
    dense_n[cell] = n
    dense_c[cell] = c
    return pa.table({
        "hour_bucket": pa.array(
            np.repeat(np.arange(lo, hi + 1, dtype=np.int64), n_types)),
        "event_type": pa.array(np.tile(types, n_hours), pa.string()),
        "n_events": pa.array(dense_n),
        "sum_value_cents": pa.array(dense_c),
    })


def events_gap_fill_oracle_sql(events_rel: str = "events") -> str:
    """DuckDB twin: bounded hourly aggregate, generate_series dense axis,
    cross join with the distinct-type axis, zero-filled LEFT JOIN."""
    return f"""
        WITH b AS (
          SELECT epoch_us(ts) // 3600000000 AS hb, event_type,
                 count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
          FROM {events_rel} GROUP BY 1, 2),
        ext AS (SELECT min(hb) AS lo, max(hb) AS hi FROM b),
        hours AS (
          SELECT unnest(generate_series(lo, hi)) AS hour_bucket FROM ext),
        types AS (SELECT DISTINCT event_type FROM {events_rel})
        SELECT h.hour_bucket, t.event_type,
               CAST(coalesce(b.n, 0) AS BIGINT) AS n_events,
               CAST(coalesce(b.c, 0) AS BIGINT) AS sum_value_cents
        FROM hours h
        CROSS JOIN types t
        LEFT JOIN b ON b.hb = h.hour_bucket AND b.event_type = t.event_type
    """


# ---------------------------------------------------------------------------
# temporal event dedup: drop same-(user, type) events within a window
# ---------------------------------------------------------------------------

_EDW_WINDOW_US = 21_600_000_000  # 6 h


def events_dedup_window(sf_dir: str, window_us: int = _EDW_WINDOW_US):
    """(event_id, user_id, event_type, ts_us) — the event stream with
    temporal duplicates removed: within each (user, type) stream ordered
    by (ts, event_id), an event whose predecessor arrived less than
    ``window_us`` earlier is dropped (the standard stream-dedup /
    debounce rule for retried or double-fired instrumentation; the
    lag-based variant, so the keep decision is vectorizable — a
    drop never un-suppresses its successor).

    Scale shape: ONE keyed repartition on a user hash co-locates each
    user's events; the (user, type) sort, shifted-compare gap mask and
    filter are all in-task numpy; kept rows stream out — no driver
    materialization.  Exact integer microseconds end to end.
    """
    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = read_table(sf_dir, "events",
                    ["event_id", "user_id", "event_type", "ts"])

    def _ukey(t: pa.Table) -> pa.Table:
        uk = hash64_column(
            pc.cast(t["user_id"], pa.string())).view(np.int64)
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "ukey": pa.array(uk, pa.int64()),
        })

    def _dedup(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("event_type", pa.string()), ("ts_us", pa.int64()),
        ])
        if t.num_rows == 0:
            return schema.empty_table()
        t = t.sort_by([
            ("user_id", "ascending"), ("event_type", "ascending"),
            ("ts_us", "ascending"), ("event_id", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        n = len(uid)
        same = np.zeros(n, bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(n, np.int64)
        gap[0] = window_us
        gap[1:] = ts[1:] - ts[:-1]
        keep = ~same | (gap >= window_us)
        return t.select(
            ["event_id", "user_id", "event_type", "ts_us"]
        ).filter(pa.array(keep))

    keyed = ensure_hash_shuffle(ev.map_batches(
        _ukey, batch_format="pyarrow", zero_copy_batch=True))
    return keyed.repartition(
        shuffle_partitions(), keys=["ukey"]
    ).map_batches(_dedup, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)


def events_dedup_window_oracle_sql(events_rel: str = "events",
                                   window_us: int = _EDW_WINDOW_US) -> str:
    """DuckDB twin: lag() over the identical (ts, event_id) order, the
    same integer-µs gap rule."""
    return f"""
        WITH e AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM {events_rel}),
        l AS (
          SELECT *, lag(ts_us) OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts_us, event_id) AS prev
          FROM e)
        SELECT event_id, user_id, event_type, ts_us
        FROM l WHERE prev IS NULL OR ts_us - prev >= {window_us}
    """


# ---------------------------------------------------------------------------
# robust anomaly profile: median / MAD outlier counts per event type
# ---------------------------------------------------------------------------

_ANOMALY_K = 3


def event_anomalies(sf_dir: str, k: int = _ANOMALY_K):
    """(event_type, n_events, med_cents, mad_cents, n_outliers) — the
    robust (median / MAD) anomaly profile of the value stream: per event
    type, the exact integer-cent median, the median absolute deviation,
    and how many events sit more than ``k`` MADs from the median — the
    outlier rule that, unlike z-scores (``event_zscores``), is itself
    immune to the outliers it counts.

    Scale shape: ONE keyed repartition on event_type co-locates each
    type's cents; median, MAD and the outlier census are all in-task
    numpy on the sorted group (exact order statistics need the whole
    group by definition — at 100 TB swap the in-task kernel for a
    t-digest/KLL merge behind the same output schema, as
    ``source_length_quantiles`` documents).  All comparisons are exact
    integers (``|v - med| > k * mad``), so the DuckDB ``quantile_disc``
    twin is bit-exact.  Both statistics use the inverted-CDF rule
    (``ceil(q n) - 1``), matching ``quantile_disc``.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ev = ensure_hash_shuffle(read_table(sf_dir, "events", ["event_type", "value"]))

    def _prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["event_type"], _cents(t["value"])],
            names=["event_type", "v"],
        )

    def _stats(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("event_type", pa.string()), ("n_events", pa.int64()),
            ("med_cents", pa.int64()), ("mad_cents", pa.int64()),
            ("n_outliers", pa.int64()),
        ])
        if t.num_rows == 0:
            return schema.empty_table()
        idx = pc.sort_indices(
            t, sort_keys=[("event_type", "ascending"), ("v", "ascending")])
        t = t.take(idx)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        v = t["v"].to_numpy(zero_copy_only=False)
        change = np.empty(len(et), bool)
        change[0] = True
        change[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(et))
        out_et, out_n, out_med, out_mad, out_no = [], [], [], [], []
        for s, e in zip(starts, ends):
            g = v[s:e]
            n = e - s
            med = int(g[(n + 1) // 2 - 1])          # ceil(0.5 n) - 1
            d = np.abs(g - med)
            mad = int(np.sort(d)[(n + 1) // 2 - 1])
            out_et.append(et[s])
            out_n.append(n)
            out_med.append(med)
            out_mad.append(mad)
            out_no.append(int((d > k * mad).sum()))
        return pa.Table.from_arrays(
            [pa.array(out_et, pa.string()),
             pa.array(np.asarray(out_n, np.int64)),
             pa.array(np.asarray(out_med, np.int64)),
             pa.array(np.asarray(out_mad, np.int64)),
             pa.array(np.asarray(out_no, np.int64))],
            schema=schema,
        )

    return ev.map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(shuffle_partitions(), keys=["event_type"]).map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def event_anomalies_oracle_sql(events_rel: str = "events",
                               k: int = _ANOMALY_K) -> str:
    """DuckDB twin: per-type quantile_disc median, MAD over the joined
    deviations, exact integer outlier census."""
    return f"""
        WITH c AS (
          SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
          FROM {events_rel}),
        med AS (
          SELECT event_type, quantile_disc(v, 0.5) AS med
          FROM c GROUP BY event_type),
        dev AS (
          SELECT c.event_type, c.v, m.med, abs(c.v - m.med) AS d
          FROM c JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, any_value(med) AS med,
                 quantile_disc(d, 0.5) AS mad, count(*) AS n
          FROM dev GROUP BY event_type)
        SELECT m.event_type, CAST(m.n AS BIGINT) AS n_events,
               CAST(m.med AS BIGINT) AS med_cents,
               CAST(m.mad AS BIGINT) AS mad_cents,
               CAST((SELECT count(*) FROM dev d
                     WHERE d.event_type = m.event_type
                       AND d.d > {k} * m.mad) AS BIGINT) AS n_outliers
        FROM mad m
    """

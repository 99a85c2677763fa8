"""Column profiling — the data-quality audit every ingest runs first.

``profile_table`` emits one row per column with row/null/exact-distinct
counts and min/max (rendered as strings), the standard pre-pipeline
audit (Great-Expectations/Deequ shape) as one driver query.  The
reference's analog is its inline corpus counters — documents parsed,
mentions omitted, overlong docs (/root/reference/data_preprocessing.py:88,
124,174) — here generalized to arbitrary relational inputs.

Scale shape:

* **counts + extremes** — one streaming ``map_batches`` pass emits ONE
  partial row per (block, column): row/null counts and the block's
  native-typed min/max rendered to string AFTER comparison (so integer
  columns compare numerically, never lexicographically).  The collected
  partial table is n_blocks x n_cols rows — bounded and tiny relative
  to the data; the driver combine parses integer extremes back for the
  final compare.
* **exact distinct** — (col_id, value-string) rows deduped map-side per
  batch, ONE hash groupby for the global distinct set, then per-block
  partial counts per column; only the bounded per-block count partials
  reach the driver.  This is COUNT(DISTINCT) cost: a key column shuffles
  one row per value — exactly what exactness requires (the sketched
  alternative is a different operator).

Only int64 and string columns are profiled by default: their string
rendering is collation-identical between Arrow and DuckDB
(``CAST(BIGINT AS VARCHAR)``), which keeps the oracle bit-exact.
Floats/timestamps are excluded deliberately — their text formats differ
between engines, so a "profile" of them could never be oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.sources.readers import read_table

# per-table default column sets (int64/string only — see module docstring)
DEFAULT_COLUMNS = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    "documents": ["doc_id", "source", "lang", "n_chars"],
}


def _col_str(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type):
        return col
    return pc.cast(col, pa.string())


def _stats_partial(t: pa.Table, columns: list[str]) -> pa.Table:
    names, nrows, nnull, mins, maxs, isint = [], [], [], [], [], []
    for c in columns:
        col = t[c]
        n = len(col)
        nn = col.null_count
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        names.append(c)
        nrows.append(n)
        nnull.append(nn)
        mins.append(None if mn is None else str(mn))
        maxs.append(None if mx is None else str(mx))
        isint.append(not pa.types.is_string(
            col.type if not isinstance(col, pa.ChunkedArray) else col.type))
    return pa.table({
        "col_name": pa.array(names, pa.string()),
        "n": pa.array(nrows, pa.int64()),
        "nnull": pa.array(nnull, pa.int64()),
        "mn": pa.array(mins, pa.string()),
        "mx": pa.array(maxs, pa.string()),
        "isint": pa.array(isint, pa.bool_()),
    })


def _distinct_partial(t: pa.Table, columns: list[str]) -> pa.Table:
    ids, vals = [], []
    for ci, c in enumerate(columns):
        v = pc.unique(pc.drop_null(_col_str(t[c])))
        ids.append(np.full(len(v), ci, dtype=np.int64))
        vals.append(v)
    return pa.table({
        "col_id": pa.array(np.concatenate(ids) if ids else
                           np.empty(0, np.int64)),
        "v": pa.concat_arrays(vals) if vals else pa.array([], pa.string()),
    })


def _distinct_count_partial(t: pa.Table) -> pa.Table:
    cid = t["col_id"].to_numpy(zero_copy_only=False)
    if cid.size == 0:
        return pa.table({"col_id": pa.array([], pa.int64()),
                         "nd": pa.array([], pa.int64())})
    b = np.sort(cid)
    starts = np.flatnonzero(np.concatenate(([True], b[1:] != b[:-1])))
    return pa.table({
        "col_id": pa.array(b[starts]),
        "nd": pa.array(np.diff(np.append(starts, b.size)).astype(np.int64)),
    })


def profile_table(sf_dir: str, table: str = "orders",
                  columns: list[str] | None = None):
    """(col_name, n_rows, n_null, n_distinct, min_v, max_v) — one audit
    row per profiled column (exact counts; extremes as strings, compared
    in the column's native type)."""
    from biomedical_el_ray.util import drop_empty_blocks

    columns = columns or DEFAULT_COLUMNS[table]
    ds = read_table(sf_dir, table, columns)

    parts = ds.map_batches(
        _stats_partial, fn_kwargs={"columns": columns},
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    agg: dict = {c: [0, 0, None, None, False] for c in columns}
    for r in parts:
        a = agg[r["col_name"]]
        a[0] += int(r["n"])
        a[1] += int(r["nnull"])
        a[4] = bool(r["isint"])
        for slot, v, better in ((2, r["mn"], min), (3, r["mx"], max)):
            if v is None:
                continue
            cur = a[slot]
            nv = int(v) if a[4] else v
            a[slot] = nv if cur is None else better(cur, nv)

    nd_parts = (
        drop_empty_blocks(
            ds.map_batches(_distinct_partial, fn_kwargs={"columns": columns},
                           batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["col_id", "v"]).count()
        )
        .map_batches(_distinct_count_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .take_all()
    )
    nd = {c: 0 for c in columns}
    for r in nd_parts:
        nd[columns[int(r["col_id"])]] += int(r["nd"])

    return pa.table({
        "col_name": pa.array(columns, pa.string()),
        "n_rows": pa.array([agg[c][0] for c in columns], pa.int64()),
        "n_null": pa.array([agg[c][1] for c in columns], pa.int64()),
        "n_distinct": pa.array([nd[c] for c in columns], pa.int64()),
        "min_v": pa.array([None if agg[c][2] is None else str(agg[c][2])
                           for c in columns], pa.string()),
        "max_v": pa.array([None if agg[c][3] is None else str(agg[c][3])
                           for c in columns], pa.string()),
    })


def profile_table_oracle_sql(table: str = "orders",
                             columns: list[str] | None = None) -> str:
    """DuckDB twin: one UNION ALL arm per column."""
    columns = columns or DEFAULT_COLUMNS[table]
    arms = [
        f"""SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_v,
               CAST(max({c}) AS VARCHAR) AS max_v
        FROM {table}"""
        for c in columns
    ]
    return " UNION ALL ".join(arms)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) approximate-distinct sketch
# ---------------------------------------------------------------------------

def _kmv_partial(t: pa.Table, column: str, k: int) -> pa.Table:
    from biomedical_el_ray.functions.hashing import hash64_column

    h = hash64_column(_col_str(t[column]))
    h = np.unique(h)  # sorted ascending (unsigned)
    return pa.table({"h": pa.array(h[:k], pa.uint64())})


def approx_distinct_kmv(sf_dir: str, table: str = "lineitem",
                        column: str = "l_partkey", k: int = 256):
    """(k, kth_hash, est_distinct, exact_mode) — the k-minimum-values
    distinct-count sketch (Bar-Yossef et al. 2002): keep the k smallest
    64-bit value hashes; the k-th smallest h_k estimates the distinct
    count as floor((k−1)·2⁶⁴ / h_k).  The one cardinality sketch that is
    fully DETERMINISTIC (a pure function of the value set), so unlike
    HLL it admits a bit-exact DuckDB twin — and the merge is a trivial
    set-union, the property that makes it the distributed-sketch shape.

    Scale shape: each block contributes its bottom-k distinct hashes
    (one vectorized hash + ``np.unique`` per batch, k·8 bytes out); the
    driver unions the bounded n_blocks·k candidates and reads one order
    statistic.  When the global distinct count is below k the sketch IS
    the exact answer (``exact_mode``).  Values hash via their string
    rendering (the ``profile_table`` collation contract), and the final
    estimate is floor()ed so both sides do the same single f64 divide.
    """
    ds = read_table(sf_dir, table, [column])
    parts = ds.map_batches(
        _kmv_partial, fn_kwargs={"column": column, "k": k},
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    merged = np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))
    if merged.size < k:
        kth, est, exact = "NA", int(merged.size), True
    else:
        hk = int(merged[k - 1])
        kth = str(hk)
        est = int(np.floor((k - 1) * 18446744073709551616.0 / float(hk)))
        exact = False
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "kth_hash": pa.array([kth], pa.string()),
        "est_distinct": pa.array([est], pa.int64()),
        "exact_mode": pa.array([exact], pa.bool_()),
    })


def approx_distinct_kmv_oracle_sql(table: str = "lineitem",
                                   column: str = "l_partkey",
                                   k: int = 256) -> str:
    """DuckDB twin: the multilinear string-hash CTE over the distinct
    value renderings, one order statistic, the same floored estimate."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    cte, rel = hash64_short_cte("kvvals", [], "kv", tok_col="tok",
                                out_col="h")
    return f"""
        WITH kvvals AS (
          SELECT DISTINCT CAST({column} AS VARCHAR) AS tok FROM {table}),
        {cte},
        kvd AS (SELECT DISTINCT h FROM {rel}),
        kvr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM kvd),
        kvc AS (SELECT count(*) AS n FROM kvd),
        kvk AS (SELECT h FROM kvr WHERE rn = {k})
        SELECT CAST({k} AS BIGINT) AS k,
               CASE WHEN c.n < {k} THEN 'NA'
                    ELSE CAST((SELECT h FROM kvk) AS VARCHAR) END AS kth_hash,
               CASE WHEN c.n < {k} THEN CAST(c.n AS BIGINT)
                    ELSE CAST(floor(({k} - 1) * 18446744073709551616.0
                              / CAST((SELECT h FROM kvk) AS DOUBLE))
                         AS BIGINT) END AS est_distinct,
               c.n < {k} AS exact_mode
        FROM kvc c
    """


# --------------------------------------------------------------------------
# deterministic-sample global quantiles (bounded-sample order statistics)
# --------------------------------------------------------------------------

_SQ_QS = (250, 500, 750, 900, 990)  # per-mille quantile grid


def sampled_quantiles(sf_dir: str, table: str = "lineitem",
                      column: str = "l_extendedprice", k: int = 1024):
    """(q_pm, n_sample, v_cents) — global quantile estimates of a value
    column from a DETERMINISTIC uniform row sample: the k rows whose
    64-bit row-key hashes are globally smallest (the KMV idea applied to
    ROW sampling), then exact inverted-CDF order statistics
    (``ceil(q·n)−1``) over the sampled cents-quantized values.  The
    bounded-sample scale path for global order statistics — the exact
    companion (``source_length_quantiles``) shuffles whole groups, this
    moves k·16 bytes per block regardless of data size; and because the
    sample is a pure function of the key set, the result is identical at
    any parallelism and admits a bit-exact DuckDB twin (hash ties broken
    by value on both sides).

    Scale shape: one streaming pass emits each block's bottom-k (hash,
    cents) pairs; the driver merges the bounded n_blocks·k candidates,
    takes the global bottom-k, and reads five order statistics.  When
    the table has <= k rows the sample is the whole table and the
    quantiles are exact.
    """
    ds = read_table(sf_dir, table, ["l_orderkey", "l_linenumber", column])

    def _partial(t: pa.Table, column: str, k: int) -> pa.Table:
        from biomedical_el_ray.functions.hashing import hash64_column

        tok = pc.binary_join_element_wise(
            _col_str(t["l_orderkey"]), _col_str(t["l_linenumber"]), "#")
        h = hash64_column(tok)
        val = t[column].to_numpy(zero_copy_only=False)
        v = np.floor(val * 100 + 0.5).astype(np.int64)
        ord_ = np.lexsort((v, h))[:k]
        return pa.table({
            "h": pa.array(h[ord_], pa.uint64()),
            "v": pa.array(v[ord_], pa.int64()),
        })

    parts = ds.map_batches(
        _partial, fn_kwargs={"column": column, "k": k},
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    h = np.array([r["h"] for r in parts], dtype=np.uint64)
    v = np.array([r["v"] for r in parts], dtype=np.int64)
    ord_ = np.lexsort((v, h))[:k]
    sample = np.sort(v[ord_])
    n = int(sample.size)
    qs, vs = [], []
    for q_pm in _SQ_QS:
        idx = max((q_pm * n + 999) // 1000, 1) - 1
        qs.append(q_pm)
        vs.append(int(sample[idx]))
    return pa.table({
        "q_pm": pa.array(qs, pa.int64()),
        "n_sample": pa.array([n] * len(qs), pa.int64()),
        "v_cents": pa.array(vs, pa.int64()),
    })


def sampled_quantiles_oracle_sql(table: str = "lineitem",
                                 column: str = "l_extendedprice",
                                 k: int = 1024) -> str:
    """DuckDB twin: the multilinear row-key hash, the global bottom-k by
    (hash, value), and the identical ceil(q·n)−1 order statistics."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    cte, rel = hash64_short_cte("sq0", ["vc"], "sq", tok_col="tok",
                                out_col="h")
    vals = ", ".join(f"({q})" for q in _SQ_QS)
    return f"""
        WITH sq0 AS (
          SELECT CAST(l_orderkey AS VARCHAR) || '#'
                 || CAST(l_linenumber AS VARCHAR) AS tok,
                 CAST(floor({column} * 100 + 0.5) AS BIGINT) AS vc
          FROM {table}),
        {cte},
        sqr AS (
          SELECT vc AS v, row_number() OVER (ORDER BY h, vc) AS rn
          FROM {rel}),
        samp AS (SELECT v FROM sqr WHERE rn <= {k}),
        sn AS (SELECT count(*) AS n FROM samp),
        sv AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM samp),
        qg(q_pm) AS (VALUES {vals})
        SELECT CAST(q.q_pm AS BIGINT) AS q_pm,
               CAST(sn.n AS BIGINT) AS n_sample,
               (SELECT sv.v FROM sv
                WHERE sv.r = greatest((q.q_pm * sn.n + 999) // 1000, 1))
                 AS v_cents
        FROM qg q, sn
    """


# --------------------------------------------------------------------------
# Pearson correlation matrix from exact integer moments
# --------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _exact_sum(a: np.ndarray) -> int:
    """Exact Python-int sum of an int64 array: 65,536-row int64 partials
    (bounded by 65,536 * 1e14 < 2^63 for cents-quantized products of
    values up to ~1e5 dollars) merged in arbitrary-precision Python."""
    out = 0
    for i in range(0, a.size, 65536):
        out += int(a[i:i + 65536].sum(dtype=np.int64))
    return out


def column_correlations(sf_dir: str, table: str = "lineitem",
                        columns: list[str] | None = None):
    """(col_a, col_b, n_rows, corr) — the pairwise Pearson correlation
    matrix of a table's numeric columns over their cents-quantized
    values (floor(x*100+0.5), the engine's standard exactness
    quantization): the Deequ/"analyzer" profiling step behind feature
    selection and drift monitoring, as one streaming pass.

    Exactness: every needed moment (n, Sx, Sxx, Sxy) is an integer, so
    per-block partials combine in any order; partials ride to the driver
    as DECIMAL-free strings (one row per block) and merge in
    arbitrary-precision Python, because Sxy of cents-squared magnitudes
    overflows int64 across blocks.  The final r =
    (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)) is
    computed with one float conversion per term and IEEE sqrt/divide —
    the identical op sequence the DuckDB twin runs on its HUGEINT sums,
    so the doubles match bit-for-bit.  Documented bound: n * Sxy must
    stay under 2^127 (HUGEINT), which holds to ~10^12 rows of
    cents-scale data.
    """
    import math

    cols = list(columns) if columns is not None else list(_CORR_COLS)
    ds = read_table(sf_dir, table, cols)
    k = len(cols)

    def _partial(t: pa.Table) -> pa.Table:
        ints = []
        for c in cols:
            v = pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(t[c], pa.float64()), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64())
            ints.append(v.to_numpy(zero_copy_only=False))
        names, vals = ["n"], [str(t.num_rows)]
        for i in range(k):
            names.append(f"s{i}")
            vals.append(str(_exact_sum(ints[i])))
            for j in range(i, k):
                names.append(f"q{i}_{j}")
                vals.append(str(_exact_sum(ints[i] * ints[j])))
        return pa.Table.from_arrays(
            [pa.array([v], pa.string()) for v in vals], names=names)

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(int(r["n"]) for r in parts)
    S = [sum(int(r[f"s{i}"]) for r in parts) for i in range(k)]
    Q = {}
    for i in range(k):
        for j in range(i, k):
            Q[(i, j)] = sum(int(r[f"q{i}_{j}"]) for r in parts)

    col_a, col_b, corr = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            num = n * Q[(i, j)] - S[i] * S[j]
            da = n * Q[(i, i)] - S[i] * S[i]
            db = n * Q[(j, j)] - S[j] * S[j]
            col_a.append(cols[i])
            col_b.append(cols[j])
            if da == 0 or db == 0:
                corr.append(None)
            else:
                corr.append(
                    float(num) / (math.sqrt(float(da)) * math.sqrt(float(db))))
    return pa.Table.from_arrays(
        [pa.array(col_a, pa.string()), pa.array(col_b, pa.string()),
         pa.array([n] * len(col_a), pa.int64()),
         pa.array(corr, pa.float64())],
        names=["col_a", "col_b", "n_rows", "corr"])


def column_correlations_oracle_sql(table: str = "lineitem",
                                   columns: list[str] | None = None) -> str:
    """DuckDB twin: HUGEINT moment sums, the identical final expression
    (one DOUBLE cast per term, IEEE sqrt/divide)."""
    cols = list(columns) if columns is not None else list(_CORR_COLS)
    k = len(cols)
    qexprs = []
    for i, c in enumerate(cols):
        qexprs.append(
            f"CAST(floor(CAST({c} AS DOUBLE) * 100 + 0.5) AS HUGEINT) AS x{i}")
    moments = ["count(*) AS n"]
    for i in range(k):
        moments.append(f"sum(x{i}) AS s{i}")
        for j in range(i, k):
            moments.append(f"sum(x{i} * x{j}) AS q{i}_{j}")
    selects = []
    for i in range(k):
        for j in range(i + 1, k):
            selects.append(f"""
        SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,
               CAST(n AS BIGINT) AS n_rows,
               CAST(n * q{i}_{j} - s{i} * s{j} AS DOUBLE)
                 / (sqrt(CAST(n * q{i}_{i} - s{i} * s{i} AS DOUBLE))
                    * sqrt(CAST(n * q{j}_{j} - s{j} * s{j} AS DOUBLE)))
                 AS corr
        FROM agg""")
    union = "\n        UNION ALL".join(selects)
    return f"""
        WITH m AS (
          SELECT {", ".join(qexprs)} FROM {table}),
        agg AS (
          SELECT {", ".join(moments)} FROM m)
        {union}
    """


# ---------------------------------------------------------------------------
# Rule-based data-quality audit (the Deequ/Great-Expectations "checks" shape)
# ---------------------------------------------------------------------------

def data_quality_audit(sf_dir: str):
    """(rule, n_checked, n_violations) — the rule-based validation gate a
    100-TB ingest runs before anything downstream: per-row predicate
    rules over orders/lineitem plus one cross-table referential-
    integrity rule, each reported with its checked-row denominator so a
    zero is "proven clean", never "didn't run".

    Scale shape: ONE streaming pass per table.  Each scan emits BOTH its
    vectorized per-row rule partials (two int64s per block per rule,
    parked under a sentinel key — the data plane never carries failing
    rows) and its referential-integrity join keys (lineitem's foreign
    keys deduplicated map-side with ``pc.unique``, orders' primary keys
    tagged as-is), so the 100-TB tables are scanned exactly once.  One
    keyed hash exchange of 9-byte rows co-locates each orderkey's tags;
    the orphan count and distinct-FK denominator fall out of an in-task
    run-detection pass, and the driver folds the resulting
    <= (partitions + rules)-row partial stream — no groupby or sort
    operator runs at all.  The reference's analog is its inline corpus
    counters (omitted mentions / overlong docs,
    data_preprocessing.py:88,124,174) generalized to a declarative
    rule report.
    """
    import pandas as pd

    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    # before ANY dataset creation: the context is captured per-dataset,
    # and the keyed repartition below requires the hash strategy
    ensure_hash_shuffle()

    # rule-partial rows ride the same stream under this key; orderkeys
    # are strictly positive in every TPC-H-shaped generator
    SENTINEL = np.int64(-1)

    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("2000-01-01"), pa.timestamp("us"))

    def _pack(viol: dict, n: int, keys, is_li: bool) -> pa.Table:
        """Tagged RI keys + this batch's rule partials in ONE table."""
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = keys.cast(pa.int64())
        nk, nr = len(keys), len(viol)
        tag = np.zeros(nk + nr, np.int64)
        tag[:nk] = 1
        li_col = tag if is_li else np.zeros(nk + nr, np.int64)
        od_col = np.zeros(nk + nr, np.int64) if is_li else tag
        nch = np.zeros(nk + nr, np.int64)
        nch[nk:] = n
        nv = np.zeros(nk + nr, np.int64)
        nv[nk:] = np.fromiter(viol.values(), np.int64, nr)
        return pa.Table.from_arrays(
            [pa.concat_arrays(
                [keys, pa.array(np.full(nr, SENTINEL), pa.int64())]),
             pa.array(li_col), pa.array(od_col),
             pa.concat_arrays(
                 [pa.nulls(nk, pa.string()),
                  pa.array(list(viol.keys()), pa.string())]),
             pa.array(nch), pa.array(nv)],
            names=["key", "is_li", "is_ord", "rule",
                   "n_checked", "n_violations"],
        )

    def _orders_pass(t: pa.Table) -> pa.Table:
        viol = {
            "orders.totalprice_nonneg": pc.sum(
                pc.cast(pc.less(t["o_totalprice"], pa.scalar(0.0)), pa.int64())
            ).as_py() or 0,
            "orders.status_domain": pc.sum(pc.cast(
                pc.invert(pc.is_in(t["o_orderstatus"],
                                   value_set=pa.array(["O", "F", "P"]))),
                pa.int64())).as_py() or 0,
            "orders.orderdate_window_1995_2000": pc.sum(pc.cast(
                pc.or_(pc.less(t["o_orderdate"], lo),
                       pc.greater_equal(t["o_orderdate"], hi)),
                pa.int64())).as_py() or 0,
            "orders.status_P_exceptional": pc.sum(pc.cast(
                pc.equal(t["o_orderstatus"], pa.scalar("P")), pa.int64()
            )).as_py() or 0,
        }
        # primary keys ride as-is (already unique by construction)
        return _pack(viol, t.num_rows, t["o_orderkey"], is_li=False)

    def _li_pass(t: pa.Table) -> pa.Table:
        viol = {
            "lineitem.discount_in_0_1": pc.sum(pc.cast(
                pc.or_(pc.less(t["l_discount"], pa.scalar(0.0)),
                       pc.greater(t["l_discount"], pa.scalar(1.0))),
                pa.int64())).as_py() or 0,
            "lineitem.quantity_positive": pc.sum(pc.cast(
                pc.less_equal(t["l_quantity"], pa.scalar(0.0)), pa.int64()
            )).as_py() or 0,
            "lineitem.price_positive": pc.sum(pc.cast(
                pc.less_equal(t["l_extendedprice"], pa.scalar(0.0)), pa.int64()
            )).as_py() or 0,
        }
        keys = t["l_orderkey"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return _pack(viol, t.num_rows, pc.unique(keys), is_li=True)

    def _audit_partition(t: pa.Table) -> pa.Table:
        """One hash partition (complete key groups + maybe the sentinel
        partition's rule partials) -> partial (rule, n_checked, n_viol)."""
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=["rule", "n_checked", "n_violations"])
        if t.num_rows == 0:
            return empty
        rule_valid = pc.is_valid(t["rule"])
        out = []
        rp = t.filter(rule_valid)
        if rp.num_rows:
            g = (rp.select(["rule", "n_checked", "n_violations"])
                 .group_by(["rule"])
                 .aggregate([("n_checked", "sum"), ("n_violations", "sum")]))
            out.append(g.rename_columns(
                ["rule", "n_checked", "n_violations"]))
        tk = t.filter(pc.invert(rule_valid))
        if tk.num_rows:
            k = tk["key"].to_numpy(zero_copy_only=False)
            li = tk["is_li"].to_numpy(zero_copy_only=False)
            od = tk["is_ord"].to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            k, li, od = k[order], li[order], od[order]
            starts = np.ones(k.size, bool)
            starts[1:] = k[1:] != k[:-1]
            run_ids = np.cumsum(starts) - 1
            n_runs = int(run_ids[-1]) + 1
            has_li = np.zeros(n_runs, bool)
            has_od = np.zeros(n_runs, bool)
            np.logical_or.at(has_li, run_ids, li.astype(bool))
            np.logical_or.at(has_od, run_ids, od.astype(bool))
            out.append(pa.Table.from_arrays(
                [pa.array(["lineitem.orderkey_in_orders"], pa.string()),
                 pa.array([int(np.sum(has_li))], pa.int64()),
                 pa.array([int(np.sum(has_li & ~has_od))], pa.int64())],
                names=["rule", "n_checked", "n_violations"]))
        return pa.concat_tables(out) if out else empty

    tagged = (
        read_table(
            sf_dir, "orders",
            ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"],
        )
        .map_batches(_orders_pass, batch_format="pyarrow",
                     zero_copy_batch=True)
        .union(
            read_table(
                sf_dir, "lineitem",
                ["l_orderkey", "l_discount", "l_quantity",
                 "l_extendedprice"],
            ).map_batches(_li_pass, batch_format="pyarrow",
                          zero_copy_batch=True)
        )
    )
    partials = tagged.repartition(
        shuffle_partitions(), keys=["key"]
    ).map_batches(
        _audit_partition, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).take_all()

    # driver fold: <= (partitions + 7) tiny rows — the profile_table/KMV
    # pattern; a distributed groupby here would cost a whole extra stage
    folded: dict[str, list[int]] = {}
    for r in partials:
        a = folded.setdefault(r["rule"], [0, 0])
        a[0] += int(r["n_checked"])
        a[1] += int(r["n_violations"])
    rules = sorted(folded)
    return pa.table({
        "rule": pa.array(rules, pa.string()),
        "n_checked": pa.array([folded[r][0] for r in rules], pa.int64()),
        "n_violations": pa.array([folded[r][1] for r in rules], pa.int64()),
    })


def data_quality_audit_oracle_sql() -> str:
    """Exact DuckDB twin of ``data_quality_audit``."""
    return """
        SELECT 'orders.totalprice_nonneg' AS rule,
               count(*) AS n_checked,
               CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
                 AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders.status_domain', count(*),
               CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders.orderdate_window_1995_2000', count(*),
               CAST(count(*) FILTER (
                 WHERE o_orderdate < TIMESTAMP '1995-01-01'
                    OR o_orderdate >= TIMESTAMP '2000-01-01') AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders.status_P_exceptional', count(*),
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem.discount_in_0_1', count(*),
               CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.quantity_positive', count(*),
               CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.price_positive', count(*),
               CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.orderkey_in_orders',
               count(DISTINCT l_orderkey),
               CAST(count(DISTINCT l_orderkey) FILTER (
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                 AS BIGINT)
        FROM lineitem
        ORDER BY rule
    """


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch with EXACT integer register algebra
# ---------------------------------------------------------------------------

_HLL_P = 9               # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
_HLL_Q = 64 - _HLL_P     # 55 suffix bits
_HLL_S = _HLL_Q + 1      # max rho; scaled term = 2^(S - rho)


def _hll_partial(t: pa.Table, column: str) -> pa.Table:
    """(reg, rho) — per-block register maxima, <= 512 rows out."""
    from biomedical_el_ray.functions.hashing import hash64_column

    h = hash64_column(_col_str(t[column]))
    reg = (h >> np.uint64(_HLL_Q)).astype(np.int64)
    w = (h & np.uint64((1 << _HLL_Q) - 1)).astype(np.uint64)
    # exact bit length via 55 vectorized compares — float log2 is unsafe
    # past 2^53 (mantissa rounding flips boundary values)
    bl = np.zeros(w.size, np.int64)
    for k in range(_HLL_Q):
        bl += w >= np.uint64(1 << k)
    rho = (_HLL_Q + 1) - bl          # w == 0 -> S (all-zero suffix)
    regs = np.zeros(_HLL_M, np.int64)
    np.maximum.at(regs, reg, rho)    # unbuffered scatter-max, O(batch)
    nz = np.nonzero(regs)[0]
    return pa.table({
        "reg": pa.array(nz, pa.int64()),
        "rho": pa.array(regs[nz], pa.int64()),
    })


def approx_distinct_hll(sf_dir: str, table: str = "lineitem",
                        column: str = "l_partkey"):
    """(p, m, v_zero, sum_scaled, est_distinct) — the HyperLogLog
    cardinality sketch (Flajolet et al. 2007), the mergeable
    constant-memory distinct counter every 100-TB profile wants next to
    the exact ``profile_table`` count and the KMV order statistic.

    HLL is usually "approximately reproducible" at best; here it admits
    a bit-exact DuckDB twin because the register harmonic sum is kept in
    EXACT integer algebra: every term 2^(-rho) is a dyadic rational, so
    the sum is carried scaled by 2^S as integers (max 512 * 2^56 < 2^66,
    HUGEINT/Python int on either side) and only ONE float divide + floor
    produces the estimate — float sum ordering can never skew a bit.

    Scale shape: each block emits its <= 512 (register, max-rho) partial
    rows (vectorized splitmix64 hash + 55 integer compares for the exact
    bit length); the driver folds the bounded n_blocks x 512 partials
    with a scatter-max — the classic mergeable-sketch topology, and the
    whole reduce is O(registers), independent of row count.  The
    small-range linear-counting correction (E <= 2.5m with empty
    registers) is implemented on both sides; sf-scale key columns sit in
    the bias-corrected branch.
    """
    import math

    ds = read_table(sf_dir, table, [column])
    parts = ds.map_batches(
        _hll_partial, fn_kwargs={"column": column},
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    regs = np.zeros(_HLL_M, np.int64)
    if parts:
        pr = np.array([r["reg"] for r in parts], dtype=np.int64)
        ph = np.array([r["rho"] for r in parts], dtype=np.int64)
        np.maximum.at(regs, pr, ph)
    v_zero = int(np.sum(regs == 0))
    # exact: sum of 2^(S - rho) over all m registers (rho = 0 when empty)
    sum_scaled = sum(1 << (_HLL_S - int(r)) for r in regs)
    m = float(_HLL_M)
    est = math.floor(
        0.7213 / (1.0 + 1.079 / m) * m * m
        * float(1 << _HLL_S) / float(sum_scaled)
    )
    if est <= 2.5 * _HLL_M and v_zero > 0:
        est = math.floor(m * math.log(m / float(v_zero)))
    return pa.table({
        "p": pa.array([_HLL_P], pa.int64()),
        "m": pa.array([_HLL_M], pa.int64()),
        "v_zero": pa.array([v_zero], pa.int64()),
        "sum_scaled": pa.array([str(sum_scaled)], pa.string()),
        "est_distinct": pa.array([est], pa.int64()),
    })


def approx_distinct_hll_oracle_sql(table: str = "lineitem",
                                   column: str = "l_partkey") -> str:
    """DuckDB twin: same splitmix64 string hash, exact bit length via
    bin() string length (no float log2), HUGEINT-scaled harmonic sum,
    the identical single-divide estimate."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    cte, rel = hash64_short_cte("hlvals", [], "hl", tok_col="tok",
                                out_col="h")
    p, m, q, s = _HLL_P, _HLL_M, _HLL_Q, _HLL_S
    return f"""
        WITH hlvals AS (
          SELECT DISTINCT CAST({column} AS VARCHAR) AS tok FROM {table}),
        {cte},
        hlldist AS (SELECT DISTINCT h FROM {rel}),
        hllw AS (
          SELECT CAST(h >> {q} AS BIGINT) AS reg,
                 CAST(h % ((1::HUGEINT) << {q}) AS BIGINT) AS w
          FROM hlldist),
        hllr AS (
          SELECT reg,
                 max(CASE WHEN w = 0 THEN {s}
                          ELSE {q} + 1 - length(bin(w)) END) AS rho
          FROM hllw GROUP BY reg),
        hllagg AS (
          SELECT count(*) AS n_present,
                 sum((1::HUGEINT) << ({s} - rho)) AS present_sum
          FROM hllr),
        hllfin AS (
          SELECT CAST({m} - n_present AS BIGINT) AS v_zero,
                 present_sum
                   + ({m} - n_present) * ((1::HUGEINT) << {s}) AS sum_scaled
          FROM hllagg),
        hllest AS (
          SELECT v_zero, sum_scaled,
                 CAST(floor(0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0
                      * CAST((1::HUGEINT) << {s} AS DOUBLE)
                      / CAST(sum_scaled AS DOUBLE)) AS BIGINT) AS est_raw
          FROM hllfin)
        SELECT CAST({p} AS BIGINT) AS p,
               CAST({m} AS BIGINT) AS m,
               v_zero,
               CAST(sum_scaled AS VARCHAR) AS sum_scaled,
               CASE WHEN est_raw <= 2.5 * {m} AND v_zero > 0
                    THEN CAST(floor({m}.0 * ln({m}.0 / CAST(v_zero AS DOUBLE)))
                         AS BIGINT)
                    ELSE est_raw END AS est_distinct
        FROM hllest
    """


# ---------------------------------------------------------------------------
# equi-width numeric histogram
# ---------------------------------------------------------------------------

def numeric_histogram(sf_dir: str, table: str = "events",
                      column: str = "value", bins: int = 20):
    """(bin, bin_lo_cents, bin_hi_cents, n) — the equi-width histogram of
    a numeric column at integer-cent precision, EVERY bin present (empty
    bins carry n=0): the distribution panel of a data-profiling dashboard
    (Deequ/Great-Expectations histogram analyzer shape).

    Scale shape: one bounded min/max aggregate pins the range, then a
    second streaming pass reduces per-batch ``bincount`` partials over
    the BOUNDED bin table — two reads, zero shuffles of row-grain data.
    Bin assignment is exact integer floor division
    ``(v - lo) * bins // (hi - lo + 1)``; bounds derive from the same
    arithmetic, so the DuckDB twin is bit-exact.  Nulls are excluded (a
    histogram of values; ``profile_table`` counts nulls)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read_table(sf_dir, table, [column])

    def _cents(t: pa.Table) -> pa.Table:
        col = pc.cast(
            pc.floor(pc.add(pc.multiply(
                pc.cast(t[column], pa.float64()), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64())
        return pa.table({"v": pc.drop_null(col)})

    cents = ds.map_batches(_cents, batch_format="pyarrow",
                           zero_copy_batch=True)
    ext = cents.aggregate(Min("v"), Max("v"))
    lo, hi = int(ext["min(v)"]), int(ext["max(v)"])
    span = hi - lo + 1

    def _partial(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        b = (v - lo) * bins // span
        n = np.bincount(b, minlength=bins).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(n[nz])})

    parts = (
        cents.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("bin").aggregate(Sum("n", alias_name="n")).take_all()
    )
    dense = np.zeros(bins, np.int64)
    for r in parts:
        dense[int(r["bin"])] = int(r["n"])
    b = np.arange(bins, dtype=np.int64)
    return pa.table({
        "bin": pa.array(b),
        "bin_lo_cents": pa.array(lo + b * span // bins),
        "bin_hi_cents": pa.array(lo + (b + 1) * span // bins - 1),
        "n": pa.array(dense),
    })


def numeric_histogram_oracle_sql(table: str = "events",
                                 column: str = "value",
                                 bins: int = 20) -> str:
    """DuckDB twin: identical integer-cent bin arithmetic over a
    range() dense bin axis."""
    return f"""
        WITH c AS (
          SELECT CAST(floor({column} * 100 + 0.5) AS BIGINT) AS v
          FROM {table} WHERE {column} IS NOT NULL),
        ext AS (
          SELECT min(v) AS lo, max(v) AS hi, max(v) - min(v) + 1 AS span
          FROM c),
        bc AS (
          SELECT (v - lo) * {bins} // span AS bin, count(*) AS n
          FROM c, ext GROUP BY 1)
        SELECT CAST(r.i AS BIGINT) AS bin,
               CAST(e.lo + r.i * e.span // {bins} AS BIGINT) AS bin_lo_cents,
               CAST(e.lo + (r.i + 1) * e.span // {bins} - 1 AS BIGINT)
                 AS bin_hi_cents,
               CAST(coalesce(bc.n, 0) AS BIGINT) AS n
        FROM range({bins}) r(i)
        CROSS JOIN ext e
        LEFT JOIN bc ON bc.bin = r.i
    """


# --------------------------------------------------------------------------
# Mergeable log-histogram quantile sketch (DDSketch shape)
# --------------------------------------------------------------------------

_QSK_SUBBITS = 5           # 32 sub-buckets per octave -> rel. error <= 2^-5
_QSK_QS = (250, 500, 750, 900, 990)  # per-mille quantile grid


def _qsketch_buckets(v: np.ndarray) -> np.ndarray:
    """Positive int64 values -> log-histogram bucket ids.

    Values below ``2^s`` map to themselves (exact; non-positive values
    fold into bucket 0, lower bound 0); larger values keep
    their top ``s+1`` mantissa bits: ``b = (e-s+1)*2^s + ((v >> (e-s)) -
    2^s)`` with ``e = floor(log2 v)`` — the DDSketch/HDR-histogram bucket
    rule (Masson, Rim & Lee, VLDB 2019) in pure integer arithmetic.  The
    exponent comes from ``np.frexp`` (exact for v < 2^53), never a
    rounded ``log``."""
    s = _QSK_SUBBITS
    _, ex = np.frexp(np.maximum(v, 1).astype(np.float64))
    e = (ex.astype(np.int64) - 1)
    shift = np.maximum(e - s, 0)
    sub = (np.maximum(v, 1) >> shift) - (1 << s)
    big = (e - s + 1) * (1 << s) + sub
    b = np.where(v < (1 << s), np.maximum(v, 0), big)
    return b.astype(np.int64)


def _qsketch_lower(b: np.ndarray) -> np.ndarray:
    """Bucket id -> inclusive lower bound of the bucket's value range."""
    s = _QSK_SUBBITS
    o = b >> s
    lo = (np.int64(1 << s) + (b & ((1 << s) - 1))) << np.maximum(o - 1, 0)
    return np.where(b < (1 << s), b, lo).astype(np.int64)


def quantile_sketch(sf_dir: str):
    """(event_type, q_pm, n_rows, v_est_cents) — per-group quantile
    estimates from a MERGEABLE log-histogram sketch over ``events.value``
    (cents-quantized): the streaming scale path that
    ``analytics.event_anomalies``'s exact order statistics document as
    their 100-TB swap point.  Guaranteed relative error <= 2^-5 ≈ 3.1%
    per estimate (values < 32 cents are exact), and the sketch is a
    bounded integer vector whose merge is addition — combine-order-free,
    shard-parallel, and constant-size no matter how many rows stream
    through (DDSketch, Masson et al. VLDB 2019; same contract as a
    t-digest but deterministic, so it admits a bit-exact DuckDB twin).

    Scale shape: one streaming pass emits per-batch (event_type, bucket,
    count) Arrow hash partials; ONE bounded groupby sums them (~1.2k
    buckets x n_types rows); the driver reads the bounded sketch table
    and takes ``ceil(q·n)``-crossing bucket lower bounds.  Non-positive
    cents fold into bucket 0 (lower bound 0) — extend with a
    sign-mirrored sketch for genuinely signed domains.
    """
    from biomedical_el_ray.util import drop_empty_blocks

    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        val = t["value"].to_numpy(zero_copy_only=False)
        v = np.floor(val * 100 + 0.5).astype(np.int64)
        b = _qsketch_buckets(v)
        g = pa.table({
            "event_type": t["event_type"],
            "b": pa.array(b, pa.int64()),
        }).group_by(["event_type", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "b", "c"])

    agg = drop_empty_blocks(
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "b"])
        .sum("c")
    )
    # bounded sketch table: n_types x ~1.2k buckets
    rows = agg.take_all()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["b"]), int(r["sum(c)"])))
    types, qpms, ns, vests = [], [], [], []
    for et in sorted(by_type):
        bs = sorted(by_type[et])
        b_arr = np.array([b for b, _ in bs], dtype=np.int64)
        c_arr = np.array([c for _, c in bs], dtype=np.int64)
        cum = np.cumsum(c_arr)
        n = int(cum[-1])
        lows = _qsketch_lower(b_arr)
        for q_pm in _QSK_QS:
            target = (q_pm * n + 999) // 1000
            idx = int(np.searchsorted(cum, target))
            types.append(et)
            qpms.append(q_pm)
            ns.append(n)
            vests.append(int(lows[idx]))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "q_pm": pa.array(qpms, pa.int64()),
        "n_rows": pa.array(ns, pa.int64()),
        "v_est_cents": pa.array(vests, pa.int64()),
    })


def quantile_sketch_oracle_sql() -> str:
    """DuckDB twin: the identical integer bucket rule (exponent via
    ``length(printf('%b', v)) - 1``, exact), a per-type cumulative sum,
    and the same ceil-crossing bucket lower bounds."""
    s = _QSK_SUBBITS
    w = 1 << s
    vals = ", ".join(f"({q})" for q in _QSK_QS)
    return f"""
        WITH qv AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
          FROM events),
        qb AS (
          SELECT event_type,
                 CASE WHEN v < 1 THEN 0
                      WHEN v < {w} THEN v
                      ELSE (length(printf('%b', v)) - {s}) * {w}
                           + (v >> greatest(length(printf('%b', v))
                                            - 1 - {s}, 0)) - {w}
                 END AS b
          FROM qv),
        qc AS (
          SELECT event_type, b, count(*) AS c
          FROM qb GROUP BY 1, 2),
        qcum AS (
          SELECT event_type, b, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum
          FROM qc),
        qn AS (SELECT event_type, sum(c) AS n FROM qc GROUP BY 1),
        qg(q_pm) AS (VALUES {vals}),
        pick AS (
          SELECT n.event_type, g.q_pm, n.n,
                 (SELECT min(q.b) FROM qcum q
                  WHERE q.event_type = n.event_type
                    AND q.cum >= (g.q_pm * n.n + 999) // 1000) AS b
          FROM qn n CROSS JOIN qg g)
        SELECT event_type, CAST(q_pm AS BIGINT) AS q_pm,
               CAST(n AS BIGINT) AS n_rows,
               CAST(CASE WHEN b < {w} THEN b
                         ELSE ({w} + (b % {w}))
                              * (1::BIGINT << greatest((b // {w}) - 1, 0))
                    END AS BIGINT) AS v_est_cents
        FROM pick
    """


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

_CMS_D = 4                 # sketch depth (hash rows)
_CMS_W = 4096              # sketch width (counters per row)
_CMS_CAND_BOUND = 1 << 62  # h < 2^62 => deterministic ~1/4 vocab sample
_CMS_TOPK = 32


def _cms_seeds() -> list[int]:
    """Per-row xor seeds, splitmix-derived so the SQL twin can inline
    them as integer literals."""
    from biomedical_el_ray.functions.hashing import splitmix64

    base = np.arange(_CMS_D, dtype=np.uint64) + np.uint64(0xC0FFEE)
    return [int(x) for x in splitmix64(base)]


def heavy_hitters_cms(sf_dir: str, k: int = _CMS_TOPK):
    """(tok, est, n_exact) — token heavy hitters over ``documents.text``
    via a count-min sketch (Cormode & Muthukrishnan 2005): d=4 hash rows
    x w=4096 counters, estimate = min over rows.  The sketch is a
    bounded integer matrix whose merge is addition — the
    combine-order-free, constant-size census structure for 100-TB token
    streams where an exact vocabulary groupby is the bottleneck.

    Candidate set: tokens whose 64-bit hash is below ``2^62`` — a
    deterministic ~1/4 vocabulary sample (the KMV idea applied to
    candidate tracking), so the result is a pure function of the data
    (plan-independent) and admits a bit-exact DuckDB twin.  ``n_exact``
    (the candidates' true counts, bounded by the sample) rides along to
    exhibit the CMS guarantee ``est >= n_exact`` deterministically.
    Tokens over 64 utf-8 bytes are excluded on both sides (the
    SQL-expressible hash class; the numpy kernel would route them to
    blake2b).

    Scale shape: one streaming pass emits per-batch tagged partials —
    (d·w)-bounded sketch-cell increments plus the batch's sampled
    candidate counts; the bounded partial stream materializes once and
    two groupbys reduce it; only the d·w sketch table and the sampled
    candidate table reach the driver.
    """
    from biomedical_el_ray.functions.hashing import hash64_column, splitmix64
    from biomedical_el_ray.util import drop_empty_blocks

    seeds = _cms_seeds()
    ds = read_table(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.fill_null(t["text"], ""), r"\s+").combine_chunks()
        flat = lists.flatten()
        keep = pc.and_(
            pc.greater(pc.utf8_length(flat), 0),
            pc.less_equal(pc.binary_length(flat), 64),
        )
        flat = flat.filter(keep)
        g = pa.table({"tok": flat}).group_by(["tok"]).aggregate(
            [([], "count_all")])
        toks, cnt = g["tok"], g["count_all"].to_numpy(zero_copy_only=False)
        h = hash64_column(toks)
        mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for r in range(_CMS_D):
            pos = (splitmix64(h ^ np.uint64(seeds[r]))
                   % np.uint64(_CMS_W)).astype(np.int64)
            np.add.at(mat[r], pos, cnt)
        rows, poss = np.nonzero(mat)
        cand = np.asarray(h < np.uint64(_CMS_CAND_BOUND))
        n_sk, n_cd = len(rows), int(cand.sum())
        return pa.table({
            "kind": pa.array(
                np.concatenate([np.zeros(n_sk, np.int64),
                                np.ones(n_cd, np.int64)])),
            "r": pa.array(np.concatenate(
                [rows.astype(np.int64), np.zeros(n_cd, np.int64)])),
            "pos": pa.array(np.concatenate(
                [poss.astype(np.int64), np.zeros(n_cd, np.int64)])),
            "tok": pa.concat_arrays([
                pa.nulls(n_sk, pa.string()),
                toks.filter(pa.array(cand)).combine_chunks(),
            ]),
            "c": pa.array(np.concatenate(
                [mat[rows, poss], cnt[cand].astype(np.int64)])),
        })

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # bounded: d*w + |sampled vocab| rows per block

    sketch_rows = drop_empty_blocks(
        partials.filter(expr="kind == 0")
    ).groupby(["r", "pos"]).sum("c").take_all()
    cand_rows = drop_empty_blocks(
        partials.filter(expr="kind == 1")
    ).groupby("tok").sum("c").take_all()

    mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for row in sketch_rows:
        mat[int(row["r"]), int(row["pos"])] = int(row["sum(c)"])
    toks = [r["tok"] for r in cand_rows]
    exact = np.array([int(r["sum(c)"]) for r in cand_rows], dtype=np.int64)
    h = hash64_column(pa.array(toks, pa.string())) if toks else np.array(
        [], dtype=np.uint64)
    est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(_CMS_D):
        pos = (splitmix64(h ^ np.uint64(seeds[r]))
               % np.uint64(_CMS_W)).astype(np.int64) if len(toks) else h
        if len(toks):
            est = np.minimum(est, mat[r, pos])
    order = sorted(range(len(toks)), key=lambda i: (-int(est[i]), toks[i]))
    order = order[:k]
    return pa.table({
        "tok": pa.array([toks[i] for i in order], pa.string()),
        "est": pa.array([int(est[i]) for i in order], pa.int64()),
        "n_exact": pa.array([int(exact[i]) for i in order], pa.int64()),
    })


def heavy_hitters_cms_oracle_sql(k: int = _CMS_TOPK) -> str:
    """DuckDB twin: the multilinear token hash, four splitmix position
    chains, the sketch as a GROUP BY over row/position, and per-candidate
    least() across the four rows."""
    from biomedical_el_ray.functions.sql_hash import (
        hash64_short_cte, splitmix_step_ctes,
    )

    seeds = _cms_seeds()
    hcte, hrel = hash64_short_cte("cmtf", ["c"], "cmh", tok_col="tok",
                                  out_col="h")
    pcte, prel = splitmix_step_ctes(
        hrel, ["tok", "c", "h"],
        [(f"p{r}", f"xor(h, {seeds[r]}::HUGEINT)") for r in range(_CMS_D)],
        "cmp",
    )
    cell_union = " UNION ALL ".join(
        f"SELECT {r} AS r, p{r} % {_CMS_W} AS pos, c FROM {prel}"
        for r in range(_CMS_D))
    est_expr = "least(" + ", ".join(f"s{r}.sc" for r in range(_CMS_D)) + ")"
    sketch_joins = "\n          ".join(
        f"JOIN cmsk s{r} ON s{r}.r = {r} AND s{r}.pos = cd.p{r} % {_CMS_W}"
        for r in range(_CMS_D))
    return f"""
        WITH cmtoks AS (
          SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok
          FROM documents),
        cmtf AS (
          SELECT tok, count(*) AS c FROM cmtoks
          WHERE octet_length(encode(tok)) <= 64
          GROUP BY tok),
        {hcte},
        {pcte},
        cmsk AS MATERIALIZED (
          SELECT r, pos, sum(c) AS sc
          FROM ({cell_union}) GROUP BY 1, 2),
        cmcand AS (
          SELECT * FROM {prel} WHERE h < {_CMS_CAND_BOUND}::HUGEINT),
        cmest AS (
          SELECT cd.tok, CAST({est_expr} AS BIGINT) AS est,
                 CAST(cd.c AS BIGINT) AS n_exact
          FROM cmcand cd
          {sketch_joins}),
        cmrank AS (
          SELECT tok, est, n_exact,
                 row_number() OVER (ORDER BY est DESC, tok) AS rk
          FROM cmest)
        SELECT tok, est, n_exact FROM cmrank WHERE rk <= {k}
    """

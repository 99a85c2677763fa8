"""Column-profiler semantics: nulls, distincts, native-typed extremes."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_profile_nulls_and_int_extremes(ray_session, tmp_path):
    """Integer extremes compare numerically (9 < 10 despite '9' > '10'),
    nulls are counted but excluded from distinct/min/max; engine ==
    oracle on the constructed table."""
    from biomedical_el_ray.pipelines.profile import (
        profile_table,
        profile_table_oracle_sql,
    )

    tbl = pa.table({
        "k": pa.array([9, 10, 2, None, 2], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "c"], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    cols = ["k", "s"]
    rdf = profile_table(str(tmp_path), "orders", cols).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * "
        f"FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    odf = con.execute(profile_table_oracle_sql("orders", cols)).df()
    a = rdf.sort_values("col_name").reset_index(drop=True)[sorted(rdf.columns)]
    b = odf.sort_values("col_name").reset_index(drop=True)[sorted(odf.columns)]
    assert a.equals(b), (a, b)
    k = rdf.set_index("col_name").loc["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (5, 1, 3)
    assert (k["min_v"], k["max_v"]) == ("2", "10")
    s = rdf.set_index("col_name").loc["s"]
    assert (s["n_null"], s["n_distinct"], s["min_v"], s["max_v"]) == (
        1, 3, "a", "c")


def test_kmv_accuracy_and_exact_branch(ray_session, tmp_path):
    """KMV pins: below-k cardinality returns the exact count
    (exact_mode), above-k the estimate lands within the sketch's
    standard-error envelope of the true distinct count."""
    from biomedical_el_ray.pipelines.profile import approx_distinct_kmv

    tbl = pa.table({"l_partkey": pa.array(list(range(50)) * 3, pa.int64())})
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    r = approx_distinct_kmv(str(tmp_path)).to_pandas().iloc[0]
    assert bool(r["exact_mode"]) and r["est_distinct"] == 50

    r2 = approx_distinct_kmv(
        "/root/testdata/sf0.01").to_pandas().iloc[0]
    assert not bool(r2["exact_mode"])
    # true distinct l_partkey at sf0.01 is 2000; 3 sigma ~ 3/sqrt(256)
    assert abs(r2["est_distinct"] - 2000) < 2000 * 0.2


def test_numeric_histogram_edges(ray_session, tmp_path):
    """Constant column (span=1), nulls excluded, every bin present."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_el_ray.pipelines.profile import (
        numeric_histogram,
        numeric_histogram_oracle_sql,
    )

    tbl = pa.table({"value": pa.array([5.0, 5.0, None, 5.0], pa.float64())})
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = numeric_histogram(str(tmp_path), bins=4).to_pandas()
    assert len(out) == 4
    assert out.n.sum() == 3           # null excluded
    assert out[out.bin == 0].n.iloc[0] == 3
    assert (out[out.bin > 0].n == 0).all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.execute(numeric_histogram_oracle_sql(bins=4)).df()
    assert out.sort_values("bin").astype(str).values.tolist() == \
        odf[out.columns].sort_values("bin").astype(str).values.tolist()

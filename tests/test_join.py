"""Large-x-large hash-shuffle join: oracle exactness is covered by
test_oracle_equivalence; here we pin partition-count invariance (the
result must not depend on how the hash shuffle splits the key space)
and that the date filter actually prunes."""

import duckdb

from biomedical_el_ray.pipelines.analytics import (
    priority_revenue,
    priority_revenue_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _oracle(since: str):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(priority_revenue_oracle_sql(since)).df()


def test_join_invariant_to_partition_count(ray_session):
    a = priority_revenue(SF, num_partitions=2).to_pandas()
    b = priority_revenue(SF, num_partitions=13).to_pandas()
    assert a.equals(b)
    want = _oracle("1998-01-01")
    assert (a[want.columns].astype(str).values == want.astype(str).values).all()


def test_join_date_filter_prunes(ray_session):
    recent = priority_revenue(SF, since="2001-01-01").to_pandas()
    all_rows = priority_revenue(SF, since="1990-01-01").to_pandas()
    assert recent.n_items.sum() < all_rows.n_items.sum()
    want = _oracle("2001-01-01")
    assert (
        recent[want.columns].astype(str).values == want.astype(str).values
    ).all()


def test_anti_join_dormant_customers(ray_session):
    from biomedical_el_ray.pipelines.analytics import (
        dormant_customers,
        dormant_customers_oracle_sql,
    )

    got = dormant_customers(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.execute(dormant_customers_oracle_sql()).df()
    assert len(got) == len(want)
    assert (got[want.columns].astype(str).values == want.astype(str).values).all()
    n_cust = con.execute("SELECT count(*) FROM customer").fetchone()[0]
    # a discriminating window: some but not all customers are dormant
    assert 0 < len(got) < n_cust

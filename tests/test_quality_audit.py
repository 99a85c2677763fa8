"""data_quality_audit on deliberately dirty tables: the sf testdata is
clean for most rules, so every predicate's counting path (and the
referential-integrity anti-join) is pinned here with injected
violations of known multiplicity."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.profile import data_quality_audit  # noqa: E402


def _write(tmp_path):
    n = 50
    dates = np.array(["1996-06-01"] * n, dtype="datetime64[us]")
    dates[0] = np.datetime64("1990-01-01", "us")   # below window
    dates[1] = np.datetime64("2001-01-01", "us")   # above window
    status = np.array(["O"] * n, dtype=object)
    status[2] = "X"                                 # out of domain
    status[3] = "P"                                 # exceptional
    total = np.full(n, 100.0)
    total[4] = -5.0                                 # negative price
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_totalprice": pa.array(total),
            "o_orderstatus": pa.array(list(status), pa.string()),
            "o_orderdate": pa.array(dates),
        }
    )
    m = 80
    ok = np.arange(m, dtype=np.int64) % 40          # keys 0..39 exist
    ok[0] = 999                                     # orphan FK (x2 rows -> 1 distinct)
    ok[1] = 999
    disc = np.full(m, 0.05)
    disc[2] = 1.5                                   # discount > 1
    disc[3] = -0.1                                  # discount < 0
    qty = np.full(m, 2.0)
    qty[4] = 0.0                                    # non-positive qty
    price = np.full(m, 10.0)
    price[5] = -1.0                                 # non-positive price
    li = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_discount": pa.array(disc),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(price),
        }
    )
    d = tmp_path / "dirty_sf"
    d.mkdir()
    pq.write_table(orders, d / "orders.parquet")
    pq.write_table(li, d / "lineitem.parquet")
    return d


def test_audit_counts_injected_violations(tmp_path):
    d = _write(tmp_path)
    df = data_quality_audit(str(d)).to_pandas()
    got = {
        r.rule: (int(r.n_checked), int(r.n_violations)) for r in df.itertuples()
    }
    assert got == {
        "orders.totalprice_nonneg": (50, 1),
        "orders.status_domain": (50, 1),
        "orders.orderdate_window_1995_2000": (50, 2),
        "orders.status_P_exceptional": (50, 1),
        "lineitem.discount_in_0_1": (80, 2),
        "lineitem.quantity_positive": (80, 1),
        "lineitem.price_positive": (80, 1),
        # 39 distinct FK values (0..39 minus key 0 overwritten? no — keys
        # 0..39 all appear except rows 0,1 remapped; 999 is the orphan)
        "lineitem.orderkey_in_orders": (41, 1),
    }

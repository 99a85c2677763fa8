"""HyperLogLog branch coverage: the sf lineitem key sits in the
bias-corrected branch (driver-checked), so the linear-counting branch
(small cardinality, empty registers) is pinned here, plus the register
algebra against the DuckDB twin on a tiny synthetic table."""

import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.profile import (  # noqa: E402
    approx_distinct_hll,
    approx_distinct_hll_oracle_sql,
)


def test_hll_linear_counting_branch(tmp_path):
    # 7 distinct keys over 3000 rows -> E << 2.5m with empty registers
    rng = np.random.default_rng(3)
    t = pa.table({"l_partkey": pa.array(rng.integers(0, 7, 3000), pa.int64())})
    d = tmp_path / "hll_sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")

    df = approx_distinct_hll(str(d)).to_pandas()
    row = df.iloc[0]
    # with 7 well-spread hashes register collisions are absent -> the
    # linear-counting estimate recovers the cardinality exactly
    assert int(row.v_zero) == 512 - 7
    assert int(row.est_distinct) == 7

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    odf = con.execute(approx_distinct_hll_oracle_sql()).fetchdf()
    assert df.astype(str).equals(odf.astype(str))

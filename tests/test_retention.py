"""retention_cohorts on a NON-degenerate history: the sf testdata spans
five uniformly-active weeks (one cohort, full retention), so the oracle
match there never exercises multi-cohort bucketing, gap weeks, or
duplicate (user, week) activity.  This synthesizes all three and checks
against both a brute per-user reference and the DuckDB oracle."""

import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.analytics import (  # noqa: E402
    retention_cohorts,
    retention_cohorts_oracle_sql,
)

WEEK_US = 7 * 86_400_000_000


def _mk_events(tmp_path):
    rng = np.random.default_rng(7)
    n = 600
    users = rng.integers(0, 40, n)
    # weeks 100..111, deliberately sparse per user => gap weeks + cohorts
    weeks = rng.integers(100, 112, n)
    # several events inside the same (user, week) — dedup must collapse them
    ts = weeks * WEEK_US + rng.integers(0, WEEK_US, n)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
        }
    )
    d = tmp_path / "ret_sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    return d, users, weeks


def _brute(users, weeks):
    uw = sorted({(int(u), int(w)) for u, w in zip(users, weeks)})
    cohort = {}
    for u, w in uw:
        cohort.setdefault(u, w)  # sorted => first week is min
    cells = {}
    for u, w in uw:
        key = (cohort[u], w - cohort[u])
        cells[key] = cells.get(key, 0) + 1
    return cells


def test_retention_multi_cohort(tmp_path):
    d, users, weeks = _mk_events(tmp_path)
    df = retention_cohorts(str(d)).to_pandas()
    got = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in df.itertuples()
    }
    assert got == _brute(users, weeks)
    # more than one cohort and at least one gap (offset skipped for a cohort)
    assert len({c for c, _ in got}) > 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    odf = con.execute(retention_cohorts_oracle_sql()).fetchdf()
    oracle = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in odf.itertuples()
    }
    assert got == oracle

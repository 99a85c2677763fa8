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


def test_events_gap_fill_planted(ray_session, tmp_path):
    """Planted gaps: missing hours materialize zero-filled for EVERY
    type; the cell cap raises loudly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from biomedical_el_ray.pipelines.analytics import (
        events_gap_fill,
        events_gap_fill_oracle_sql,
    )

    h = 3_600_000_000
    tbl = pa.table({
        "ts": pa.array([0, h // 2, 2 * h], pa.timestamp("us")),
        "event_type": ["a", "b", "a"],
        "value": [1.0, 2.0, 3.0],
        "user_id": [1, 2, 3],
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = events_gap_fill(str(tmp_path)).to_pandas()
    # 3 hours x 2 types, hour 1 fully zero, (hour 0, b) populated
    assert len(out) == 6
    key = {(r.hour_bucket, r.event_type): r for r in out.itertuples()}
    assert key[(1, "a")].n_events == 0 and key[(1, "b")].n_events == 0
    assert key[(0, "a")].n_events == 1 and key[(0, "b")].n_events == 1
    assert key[(2, "a")].sum_value_cents == 300
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.execute(events_gap_fill_oracle_sql("events")).df()
    assert len(odf) == 6
    o = {(r.hour_bucket, r.event_type): r for r in odf.itertuples()}
    for k, r in key.items():
        assert (o[k].n_events, o[k].sum_value_cents) == (
            r.n_events, r.sum_value_cents), k
    with pytest.raises(ValueError, match="max_cells"):
        events_gap_fill(str(tmp_path), max_cells=5)

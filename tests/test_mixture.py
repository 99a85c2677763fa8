"""Mixture re-weighting sample: oracle exactness is covered by
test_oracle_equivalence; here we pin the mixing semantics — budgets
follow sqrt(char mass), determinism across parallelism, keep-all
sentinel for over-budgeted sources."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_el_ray.pipelines.sampling import (
    mixture_sample,
    mixture_sample_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def test_mixture_matches_duckdb(ray_session):
    got = (
        mixture_sample(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(mixture_sample_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got[want.columns].astype(str).values == want.astype(str).values).all()
    # a real sample: neither empty nor everything
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs


def test_mixture_upweights_small_heavy_source(ray_session, tmp_path):
    # source "tiny" has few docs but each is huge: sqrt(char mass)
    # weighting must give it a higher PER-DOC keep rate than "bulk"
    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        rows.append((i, "bulk", "x " * 10, 20))
    for i in range(400, 420):
        rows.append((i, "tiny", "y " * 5000, 10000))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text", "n_chars"])
    p = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df), p + "/documents.parquet")
    got = mixture_sample(p, target_pct=30).to_pandas()
    rate_bulk = (got.source == "bulk").sum() / 400
    rate_tiny = (got.source == "tiny").sum() / 20
    assert rate_tiny > rate_bulk


def test_mixture_keep_all_sentinel(ray_session, tmp_path):
    # one source so heavy its budget exceeds its row count: every row of
    # it survives (hash sampling is without replacement)
    rows = [(i, "bulk", "x", 1) for i in range(1000)]
    rows += [(1000 + i, "whale", "y" * 100000, 100000) for i in range(3)]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text", "n_chars"])
    p = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df), p + "/documents.parquet")
    got = mixture_sample(p, target_pct=50).to_pandas()
    assert (got.source == "whale").sum() == 3

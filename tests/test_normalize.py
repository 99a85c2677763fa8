"""Normalizer semantics must match the DuckDB oracle expression exactly."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from biomedical_el_ray.stages.normalize import normalize_array, normalize_transcripts

ORACLE_EXPR = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


def test_matches_duckdb_on_corpus(smoke_corpus):
    tr = pq.read_table(smoke_corpus / "transcripts.parquet")
    ours = normalize_array(tr["text"]).to_pylist()
    con = duckdb.connect()
    con.register("t", tr)
    theirs = [
        r[0] for r in con.execute(f"SELECT {ORACLE_EXPR} FROM t").fetchall()
    ]
    assert ours == theirs


def test_edge_cases():
    cases = ["", "  ", "A  B\tC\nD", "ALL CAPS", " x ", "a\r\nb"]
    got = normalize_array(pa.array(cases, pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(cases, pa.string())}))
    want = [r[0] for r in con.execute(f"SELECT {ORACLE_EXPR} FROM t").fetchall()]
    assert got == want


def test_dataset_stage(unit_corpus):
    ds = ray.data.read_parquet(str(unit_corpus / "transcripts.parquet"))
    out = normalize_transcripts(ds)
    rows = out.take(5)
    for r in rows:
        assert r["norm_text"] == " ".join(r["text"].lower().split())

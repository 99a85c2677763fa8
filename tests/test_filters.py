"""PII redaction + Gopher quality filter: planted-PII exactness vs
DuckDB, rule coverage, and driver-table smoke."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from biomedical_el_ray.pipelines.filters import (
    DEFAULT_STOP_WORDS,
    GopherFilter,
    R_ALPHA,
    R_DUP_2GRAM,
    R_STOPWORDS,
    R_TOO_SHORT,
    R_TOP_TOKEN,
    R_WORD_LEN,
    gopher_filter,
    gopher_oracle_sql,
    pii_oracle_sql,
    pii_redact,
    redact_pii,
)

SF = "/root/testdata/sf0.001"

PII_DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "contact me at alice.smith+spam@example.co.uk for details",
            "server at 10.0.255.3 timed out, retry 192.168.1.1 now",
            "call +351 555-1234 or 800 555-0199 tomorrow",
            "mixed: bob@corp.io from 127.0.0.1 dialed 555 123-4567",
            "no pii here at all",
            "",
            "a@b.cc a@b.cc twice same email",
            "v4-ish 999.999.999.999 still matches the naive pattern",
        ],
    }
)


def _plant(tmp_path) -> str:
    p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(PII_DOCS), p)
    return p


def test_pii_redact_matches_duckdb_on_planted_pii(ray_session, tmp_path):
    path = _plant(tmp_path)
    got = (
        redact_pii(ray.data.read_parquet(path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    want = (
        con.execute(pii_oracle_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the planted rows really get scrubbed
    assert "<EMAIL>" in got.loc[0, "text_redacted"]
    assert got.loc[1, "n_ipv4"] == 2
    assert got.loc[2, "n_phone"] == 2
    assert got.loc[4, "n_pii"] == 0
    assert got.loc[6, "n_email"] == 2


def test_pii_sequential_counting(ray_session, tmp_path):
    # the phone pattern must not re-match digits inside an already
    # redacted IP: counts are taken on the text each stage sees
    df = pd.DataFrame({"doc_id": [0], "text": ["ip 10.0.0.1 only"]})
    p = str(tmp_path / "one.parquet")
    pq.write_table(pa.Table.from_pandas(df), p)
    got = redact_pii(ray.data.read_parquet(p)).to_pandas()
    assert int(got.n_ipv4[0]) == 1
    assert int(got.n_phone[0]) == 0
    assert got.text_redacted[0] == "ip <IP> only"


def test_gopher_rules_fire_individually():
    gf = GopherFilter(min_words=3, max_words=100,
                      stop_words=("alpha", "beta"))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(
                [
                    "x y",  # too short + stopwords + word len (1.0 < 3)
                    "alpha beta " + " ".join(f"word{i}" for i in range(20)),
                    "alpha beta rep rep rep rep rep rep rep rep",  # top tok
                    "alpha beta 11 22 33 44 55 66 77 88 99 00",  # alpha pct
                    "alpha beta c d " + "e f " * 10,  # dup 2grams
                ]
            ),
        }
    )
    out = gf(t).to_pandas().set_index("doc_id")
    assert out.loc[0, "reason_mask"] & R_TOO_SHORT
    assert out.loc[0, "reason_mask"] & R_STOPWORDS
    assert out.loc[0, "reason_mask"] & R_WORD_LEN
    assert out.loc[1, "reason_mask"] == 0 and out.loc[1, "keep"] == 1
    assert out.loc[2, "reason_mask"] & R_TOP_TOKEN
    assert out.loc[3, "reason_mask"] & R_ALPHA
    assert out.loc[4, "reason_mask"] & R_DUP_2GRAM


def test_gopher_filter_matches_duckdb_on_driver_table(ray_session):
    got = (
        gopher_filter(SF)
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
        con.execute(gopher_oracle_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # thresholds discriminate on this corpus (not all-pass / all-fail)
    assert 0 < got.keep.sum() < len(got)


def test_pii_driver_table_is_clean(ray_session):
    # the synthetic corpus contains no PII; redaction must be an exact
    # no-op (text_redacted == text), not just zero counts
    got = pii_redact(SF).to_pandas()
    assert int(got.n_pii.sum()) == 0
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    merged = got.merge(
        src.to_pandas(), on="doc_id", validate="one_to_one"
    )
    assert (merged.text_redacted == merged.text).all()


def test_default_stop_words_occur_in_corpus():
    src = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    blob = " ".join(src["text"].to_pylist())
    hits = [w for w in DEFAULT_STOP_WORDS if f" {w} " in f" {blob} "]
    assert len(hits) >= 2, hits

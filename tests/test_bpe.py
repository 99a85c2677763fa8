"""BPE-ish pre-tokenizer counting: RE2 parity between pyarrow and DuckDB
on text that actually exercises the pattern (the synthetic documents are
plain lowercase words, where fertility is trivially 1.0)."""

import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.textstats import BPE_PATTERN  # noqa: E402

TEXTS = [
    "hello world",
    "don't stop-me now!!!",
    "v2.49.2 released 2026-08-17",
    "a  b   c",          # multi-space runs
    "",                   # empty
    "...",
    "CamelCase mixedUP 42x7",
    "tabs\tand\nnewlines count as non-space-class punct",
]


def test_pyarrow_matches_duckdb_counts():
    arr = pa.array(TEXTS)
    ray_counts = pc.count_substring_regex(arr, BPE_PATTERN).to_pylist()
    con = duckdb.connect()
    sql_counts = [
        con.execute(
            "SELECT length(regexp_extract_all(?, ?))", [t, BPE_PATTERN]
        ).fetchone()[0]
        for t in TEXTS
    ]
    assert ray_counts == sql_counts


def test_pattern_splits_subwords():
    arr = pa.array(["don't stop-me 42x7"])
    n_bpe = pc.count_substring_regex(arr, BPE_PATTERN)[0].as_py()
    n_ws = pc.count_substring_regex(arr, r"\S+")[0].as_py()
    # don / ' / t / stop / - / me / 42 / x / 7 -> strictly more subwords
    # than the 3 whitespace words
    assert n_ws == 3
    assert n_bpe > n_ws

"""Adversarial-input oracle equivalence for the documents-table queries.

The driver's correctness gate runs on a fixed synthetic corpus whose text
is well-behaved; two real divergences (NULL text vs '' in the chunker
oracle, Unicode- vs RE2-whitespace tokenization) slipped through it and
were only caught by hand-built edge inputs.  This suite generalizes that:
every documents-table query runs against its DuckDB oracle over a table of
hostile rows — empty strings, single bytes, repeated shingles, unicode,
NBSP/VT/control whitespace, very long tokens, duplicate texts — using the
exact driver comparison (sorted columns, order-insensitive canon rows).
"""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ADVERSARIAL_TEXTS = [
    "",                      # empty
    " ",                     # whitespace-only
    "x",                     # single char
    "banana banana bandana banana",   # repeated shingles/tokens
    "café ünïcode tæst  nbsp",   # unicode + NBSP (not RE2 \s)
    "a\x0bb\tc\nd",          # VT (not RE2 \s) + tab/newline (RE2 \s)
    "supercalifragilisticexpialidocious" * 4,  # one very long token
    "dup dup dup",           # duplicated below
    "dup dup dup",
    "0123456789 !@#$%^&*()", # digits + punctuation
    "tok " * 40,             # many short tokens, trailing space
    "émoji 🎉 test",          # astral-plane codepoint
]

# queries over the documents table whose engine side needs only sf_dir and
# whose oracle (from __ray_entry__.oracle_sql) references the `documents`
# view; multimodal/payload queries are excluded (they synthesize payloads
# from other columns)
DOC_QUERIES = [
    "exact_dedup", "jaccard_pairs", "minhash_dedup_candidates",
    "simhash_dedup_candidates", "winnow_near_dup", "near_dedup_keep",
    "near_dedup_incremental", "sample_documents", "balanced_sample",
    "dataset_split", "token_stats", "bpe_token_stats",
    "source_length_quantiles", "quality_scores", "fingerprints",
    "simhash_fingerprints", "language_id", "lm_quality", "top_tokens",
    "chunk_documents",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_docs")
    n = len(ADVERSARIAL_TEXTS)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, pa.string()),
            "lang": pa.array(["en", "de"] * (n // 2), pa.string()),
            "source": pa.array(["web", "web", "chat"] * (n // 3), pa.string()),
            "n_chars": pa.array([len(t) for t in ADVERSARIAL_TEXTS], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if isinstance(v, float):
                canon_row.append(("f", "nan") if math.isnan(v) else ("f", v))
            else:
                canon_row.append((type(v).__name__[:1], str(v)))
        rows.append(tuple(canon_row))
    rows.sort()
    return rows


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_matches_oracle(name, adversarial_dir, ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    res = entrymod.queries()[name](adversarial_dir)
    ray_df = res.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet')"
    )
    sql_df = con.execute(entrymod.oracle_sql()[name]).df()
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    if len(sql_df) == 0:
        # Ray's to_pandas/iter_batches drop columns/blocks for ALL-empty
        # datasets; the schema survives at the metadata level, where the
        # engine pins it with a typed empty block
        sch = res.schema()
        assert sch is not None and sorted(sch.names) == sorted(sql_df.columns), name
        return
    assert sorted(ray_df.columns) == sorted(sql_df.columns), name
    assert _canon(ray_df) == _canon(sql_df), name

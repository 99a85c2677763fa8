"""pack_sequences: the two-pass distributed prefix-sum must match the
oracle's window-function scan across bucket boundaries and edge shapes."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _run(tmp_path, texts, doc_ids=None, seq_len=8, bucket=2):
    from biomedical_el_ray.pipelines.textstats import (
        pack_sequences,
        pack_sequences_oracle_sql,
    )

    ids = doc_ids if doc_ids is not None else list(range(len(texts)))
    pq.write_table(
        pa.table({"doc_id": ids, "text": texts}),
        tmp_path / "documents.parquet",
    )
    rdf = (
        pack_sequences(str(tmp_path), seq_len=seq_len, bucket=bucket)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = (
        con.execute(pack_sequences_oracle_sql("documents", seq_len=seq_len))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert rdf[sorted(rdf.columns)].astype(str).values.tolist() == \
        odf[sorted(odf.columns)].astype(str).values.tolist()
    return rdf


def test_cross_bucket_offsets_and_edges(ray_session, tmp_path):
    # bucket=2: five buckets; empty doc and a doc exactly filling a
    # sequence boundary
    texts = ["a b c", "", "d e f g h", "i j k", "l", "m n o p q r s t",
             "u v", "w", "x y z", "zz"]
    rdf = _run(tmp_path, texts, seq_len=8, bucket=2)
    # global layout: cumulative starts 0,3,3,8,11,12,20,22,23,26
    assert rdf.tok_start.tolist() == [0, 3, 3, 8, 11, 12, 20, 22, 23, 26]
    assert rdf.seq_id.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3]
    assert rdf.seq_offset.tolist() == [0, 3, 3, 0, 3, 4, 4, 6, 7, 2]


def test_sparse_doc_ids(ray_session, tmp_path):
    # non-contiguous doc_ids: buckets are sparse, searchsorted lookup
    # must still find the right base offset
    texts = ["a b", "c d e", "f", "g h i j"]
    rdf = _run(tmp_path, texts, doc_ids=[3, 100, 2000, 2001],
               seq_len=4, bucket=10)
    assert rdf.tok_start.tolist() == [0, 2, 5, 6]
    assert rdf.seq_id.tolist() == [0, 0, 1, 1]

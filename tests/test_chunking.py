"""chunk_documents kernel edges: empty docs, null text, short docs, exact
boundaries, and whitespace-class agreement (RE2 ASCII '\\s', not Unicode)."""

import pyarrow as pa
import ray.data


def _run(texts, chunk_tokens=4, overlap=1):
    import duckdb

    from biomedical_el_ray.pipelines.textstats import chunk_documents_oracle_sql

    con = duckdb.connect()
    con.register(
        "docs", pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    return con.execute(
        chunk_documents_oracle_sql("docs", chunk_tokens, overlap)
    ).df()


def test_oracle_edges_cover_empty_short_exact():
    # oracle self-consistency on the edge shapes the sf0.01 data may lack
    df = _run(["", "one", "a b c d", "a b c d e", "  spaced   out  "])
    by_doc = {d: g for d, g in df.groupby("doc_id")}
    assert len(by_doc[0]) == 1 and by_doc[0].chunk_text.iloc[0] == ""
    assert by_doc[1].chunk_text.tolist() == ["one"]
    assert by_doc[2].chunk_text.tolist() == ["a b c d"]        # exact fit: 1 chunk
    assert by_doc[3].chunk_text.tolist() == ["a b c d", "d e"]  # overlap 1, stride 3
    assert by_doc[4].chunk_text.tolist() == ["spaced out"]      # ws normalized


def test_engine_matches_oracle_on_edges(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from biomedical_el_ray.pipelines.textstats import (
        chunk_documents,
        chunk_documents_oracle_sql,
    )

    # includes NULL text (no coalesce in the view — the oracle must handle
    # it), a vertical tab and an NBSP: RE2 '\s' is [\t\n\f\r ] only, so
    # NEITHER splits — utf8_split_whitespace would split both and shift
    # chunk boundaries relative to the oracle
    texts = ["", "x", "a b c d", "a b c d e f g h i", "t  t\tt\nt",
             None, "a\x0bb", "a\xa0b"]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    rdf = (
        chunk_documents(str(tmp_path), chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = (
        con.execute(chunk_documents_oracle_sql("documents", 4, 1))
        .df()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert rdf.equals(odf[rdf.columns.tolist()])
    # the RE2 semantics pins: neither VT nor NBSP is '\s'
    assert rdf[rdf.doc_id == 6].n_tokens.tolist() == [1]
    assert rdf[rdf.doc_id == 7].n_tokens.tolist() == [1]

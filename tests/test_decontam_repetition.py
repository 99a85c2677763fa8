"""Edge cases for decontaminate and repetition_scores: empty/NULL text,
single-token and all-duplicate docs, benchmark membership boundaries."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _view(tmp_path, texts):
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


def _cmp(rdf, odf, keys):
    rdf = rdf.sort_values(keys).reset_index(drop=True)
    odf = odf.sort_values(keys).reset_index(drop=True)
    rdf = rdf[sorted(rdf.columns)]
    odf = odf[sorted(odf.columns)]
    assert list(rdf.columns) == list(odf.columns)
    assert len(rdf) == len(odf)
    for c in rdf.columns:
        assert rdf[c].astype(str).tolist() == odf[c].astype(str).tolist(), c


def test_repetition_edges(ray_session, tmp_path):
    from biomedical_el_ray.pipelines.textstats import (
        repetition_oracle_sql,
        repetition_scores,
    )

    # empty, NULL, single token, all-same-token, no-repeats, NBSP is NOT
    # a separator under RE2 '\S+' (one token 'a\xa0b')
    texts = ["", None, "one", "a a a a", "w x y z", "a\xa0b a\xa0b",
             "p q p q p"]
    con = _view(tmp_path, texts)
    rdf = repetition_scores(str(tmp_path)).to_pandas()
    odf = con.execute(repetition_oracle_sql("documents")).df()
    _cmp(rdf, odf, ["doc_id"])
    by = {r.doc_id: r for r in rdf.itertuples()}
    assert by[0].n_tokens == 0 and by[0].top_tok_pct == 0
    assert by[1].n_tokens == 0 and by[1].n_2grams == 0
    assert by[2].n_tokens == 1 and by[2].top_tok_pct == 100
    # "a a a a": top word is the whole doc; 3 identical 2-grams, 2 dups
    assert by[3].top_tok_pct == 100
    assert by[3].n_2grams == 3 and by[3].n_dup_2grams == 2
    assert by[4].n_dup_2grams == 0
    assert by[5].n_tokens == 2  # NBSP kept inside tokens
    # "p q p q p": 4 2-grams, distinct {p q, q p} -> 2 dups
    assert by[6].n_dup_2grams == 2 and by[6].top_tok_n == 3


def test_decontaminate_edges(ray_session, tmp_path):
    from biomedical_el_ray.pipelines.dedup import (
        decontaminate,
        decontaminate_oracle_sql,
    )

    # doc 0 and 3 are benchmark (mod 3); doc 6 is an exact copy of doc 0
    # (contam 100, flagged); doc 4 is empty (1 zero-pad shingle); doc 5
    # shares nothing with the benchmark
    texts = [
        "the quick brown fox jumps over the lazy dog",   # bench
        "the quick brown fox went home early today",      # partial overlap
        "zzzz yyyy xxxx wwww vvvv uuuu",                  # disjoint
        "pack my box with five dozen liquor jugs",        # bench
        "",                                               # 1 shingle
        "1234 5678 90ab cdef ghij klmn",                  # disjoint
        "the quick brown fox jumps over the lazy dog",    # == doc 0
    ]
    con = _view(tmp_path, texts)
    rdf = decontaminate(
        str(tmp_path), shingle_k=8, benchmark_mod=3, tau_pct=90
    ).to_pandas()
    odf = con.execute(
        decontaminate_oracle_sql("documents", shingle_k=8,
                                 benchmark_mod=3, tau_pct=90)
    ).df()
    _cmp(rdf, odf, ["doc_id"])
    by = {r.doc_id: r for r in rdf.itertuples()}
    assert set(by) == {1, 2, 4, 5}  # non-benchmark docs only
    assert by[1].n_hit > 0 and not by[1].flagged
    assert by[2].n_hit == 0 and by[2].contam_pct == 0
    assert by[4].n_shingles == 1
    # doc 6 never appears: 6 % 3 == 0 makes it benchmark-side itself
    assert 6 not in by
    assert by[5].n_hit == 0


def test_decontaminate_exact_copy_flagged(ray_session, tmp_path):
    from biomedical_el_ray.pipelines.dedup import decontaminate

    texts = [
        "alpha beta gamma delta epsilon zeta",  # bench (doc 0, mod 5)
        "alpha beta gamma delta epsilon zeta",  # exact copy -> 100%
        "omega psi chi phi upsilon tau",        # disjoint
    ]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": texts}),
        tmp_path / "documents.parquet",
    )
    rdf = decontaminate(
        str(tmp_path), shingle_k=8, benchmark_mod=5, tau_pct=90
    ).to_pandas()
    by = {r.doc_id: r for r in rdf.itertuples()}
    assert by[1].contam_pct == 100 and by[1].flagged
    assert by[2].n_hit == 0 and not by[2].flagged


def test_decontaminate_bench_cap(ray_session, tmp_path):
    import pytest

    from biomedical_el_ray.pipelines.dedup import decontaminate

    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": ["a b c d e f g h i j", "k"]}),
        tmp_path / "documents.parquet",
    )
    with pytest.raises(ValueError, match="max_bench_shingles"):
        decontaminate(str(tmp_path), benchmark_mod=2, max_bench_shingles=3)


def test_dup_span_stats_semantics(ray_session, tmp_path):
    """A verbatim copy is 100% duplicated, a disjoint-alphabet doc 0%,
    and partial overlap lands strictly between; engine == oracle on the
    constructed corpus."""
    from biomedical_el_ray.pipelines.dedup import (
        dup_span_stats,
        dup_span_stats_oracle_sql,
    )

    uniq = "zzzzzzzzzzzzzzzzzzzzzzzz"
    shared = "the quick brown fox jumps over the lazy dog"
    texts = [shared, shared, uniq, shared + " XYZQW 12345"]
    con = _view(tmp_path, texts)
    rdf = dup_span_stats(str(tmp_path)).to_pandas()
    odf = con.execute(dup_span_stats_oracle_sql("documents")).df()
    _cmp(rdf, odf, ["doc_id"])
    by = rdf.set_index("doc_id")["dup_pct"]
    assert by[0] == 100 and by[1] == 100
    assert by[2] == 0
    assert 0 < by[3] < 100
    r = rdf.set_index("doc_id")
    assert (r["dup_pct"] == r["n_dup"] * 100 // r["n_shingles"]).all()


def test_remove_dup_spans_planted(ray_session, tmp_path):
    """Planted w=3 duplicates: the shared passage is removed from BOTH
    documents, partial overlaps shorter than w survive, and whitespace is
    normalized in the rebuilt text."""
    from biomedical_el_ray.pipelines.dedup import (
        remove_dup_spans,
        remove_dup_spans_oracle_sql,
    )

    texts = [
        "alpha beta gamma delta tail1",     # shares "alpha beta gamma delta"
        "head2 alpha beta gamma delta",     # with doc 0 (two w=3 grams)
        "alpha beta zeta yy zz",            # 2-word overlap only: kept whole
        "solo doc with unique words",
        "",                                 # empty
        None,                               # NULL text
        "x  y\tz",                          # whitespace normalization
        "rep rep rep rep",                  # in-document repetition
    ]
    con = _view(tmp_path, texts)
    rdf = remove_dup_spans(str(tmp_path), w=3).to_pandas()
    odf = con.execute(remove_dup_spans_oracle_sql("documents", w=3)).df()
    _cmp(rdf, odf, ["doc_id"])
    by = {r.doc_id: r for r in rdf.itertuples()}
    # docs 0/1: the 4 shared tokens go, the unshared tail/head stays
    assert by[0].clean_text == "tail1" and by[0].n_removed == 4
    assert by[1].clean_text == "head2" and by[1].n_removed == 4
    # doc 2: no 3-gram is shared ("alpha beta" bigram is not enough)
    assert by[2].clean_text == "alpha beta zeta yy zz"
    assert by[2].n_removed == 0
    assert by[3].n_removed == 0 and by[3].n_tokens == 5
    assert by[4].clean_text == "" and by[4].n_tokens == 0
    assert by[5].clean_text == "" and by[5].n_tokens == 0
    assert by[6].clean_text == "x y z"  # rejoined with single spaces
    # doc 7: "rep rep rep" occurs at positions 0 and 1 -> all 4 covered
    assert by[7].clean_text == "" and by[7].n_removed == 4

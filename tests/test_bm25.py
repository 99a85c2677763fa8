"""BM25 retrieval: kernel exactness, edge cases, end-to-end vs DuckDB.

The end-to-end oracle row over the driver testdata is covered by
``test_oracle_equivalence``; here the integer kernels are pinned against
a per-row pure-Python reference, and the Ray path is exercised on a tiny
in-memory corpus with hand-checkable ranking.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from biomedical_el_ray.pipelines.bm25 import (
    IDF_SCALE,
    TF_SCALE,
    _query_terms,
    _term_tf,
    _tokens_exploded,
    bm25_search,
    fit_bm25_stats,
)


def _ref_scores(docs: list[tuple[str, str]], terms: list[str]):
    """Pure-Python fixed-point BM25 for one query (the module formula)."""
    N = len(docs)
    toks = {d: t.split() for d, t in docs}
    T = sum(len(v) for v in toks.values())
    out = {}
    for d, _ in docs:
        dl = len(toks[d])
        score = 0
        for term in terms:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            df = sum(1 for dd, _t in docs if term in toks[dd])
            idf_fp = ((2 * N - 2 * df + 1) * IDF_SCALE) // (2 * df + 1)
            tfnum = 22 * T * tf
            tfden = 10 * T * tf + 3 * T + 9 * dl * N
            score += idf_fp * ((tfnum * TF_SCALE) // tfden)
        if score > 0:
            out[d] = score
    return out


DOCS = [
    ("d1", "table scan fast table"),
    ("d2", "sort merge join sort sort"),
    ("d3", "table join scan scan scan"),
    ("d4", ""),
    ("d5", "the a the a"),
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d for d, _ in DOCS],
                "text": [t for _, t in DOCS],
            }
        )
    )


def test_tokens_exploded_drops_empties_and_nulls():
    row, toks = _tokens_exploded(pa.array(["a  b", "", None, " x "]))
    assert row.tolist() == [0, 0, 3]
    assert toks.to_pylist() == ["a", "b", "x"]


def test_term_tf_counts():
    row, toks = _tokens_exploded(pa.array(["a b a", "b b c"]))
    vocab = pa.array(["a", "b"])
    rows, tidx, tf = _term_tf(row, toks, vocab)
    got = {(int(r), int(i)): int(c) for r, i, c in zip(rows, tidx, tf)}
    assert got == {(0, 0): 2, (0, 1): 1, (1, 1): 2}


def test_fit_stats_counts_all_docs_and_tokens():
    n, t, df = fit_bm25_stats(_ds(), ["table", "sort", "zzz"])
    assert n == 5  # empty doc counted
    assert t == 4 + 5 + 5 + 0 + 4
    assert df.tolist() == [2, 1, 0]  # table in d1,d3; sort in d2; zzz nowhere


def test_bm25_matches_pure_python_reference():
    res = bm25_search(_ds(), ["table scan", "sort join"], k=10).take_all()
    for qi, q in enumerate(["table scan", "sort join"]):
        ref = _ref_scores(DOCS, q.split())
        got = {r["doc_id"]: r["score"] for r in res if r["query_id"] == qi}
        assert got == ref, (q, got, ref)
        # ranks: score desc, doc_id asc, dense from 1
        rows = sorted(
            (r for r in res if r["query_id"] == qi),
            key=lambda r: (-r["score"], r["doc_id"]),
        )
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))


def test_k_truncates():
    res = bm25_search(_ds(), ["scan table join"], k=1).take_all()
    assert len(res) == 1
    assert res[0]["rnk"] == 1
    ref = _ref_scores(DOCS, ["scan", "table", "join"])
    best = min(sorted(ref), key=lambda d: (-ref[d], d))
    assert res[0]["doc_id"] == best


def test_duplicate_query_term_rejected():
    with pytest.raises(ValueError):
        _query_terms(["table table"])


def test_partial_topk_is_global_topk_across_blocks():
    # many single-row blocks: per-block partial top-k must still reduce
    # to the same global answer
    tbl = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(40)],
            "text": [" ".join(["hit"] * (i % 7)) + " pad" for i in range(40)],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(20)
    res = bm25_search(ds, ["hit"], k=5).take_all()
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    ref = _ref_scores(docs, ["hit"])
    want = sorted(sorted(ref), key=lambda d: (-ref[d], d))[:5]
    got = [r["doc_id"] for r in sorted(res, key=lambda r: r["rnk"])]
    assert got == want


def test_nonmatching_docs_absent():
    res = bm25_search(_ds(), ["sort"], k=10).take_all()
    assert {r["doc_id"] for r in res} == {"d2"}  # only d2 contains 'sort'


def test_hybrid_rrf_semantics(ray_session):
    """Fusion pins: every query returns k fused rows; a doc ranked in
    both lists outscores a doc with one equal-or-worse single-list rank;
    contributions are the exact integer RRF terms."""
    from biomedical_el_ray.pipelines.bm25 import (
        RRF_K,
        RRF_SCALE,
        bm25_search,
        dense_search,
        hybrid_rrf_topk,
    )
    from biomedical_el_ray.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    fused = hybrid_rrf_topk(sf).to_pandas()
    assert (fused.groupby("query_id").size() == 10).all()
    assert fused["rnk"].between(1, 10).all()

    docs = read_table(sf, "documents", ["doc_id", "text"])
    bm = bm25_search(docs, k=20).to_pandas()
    dn = dense_search(docs, k=20).to_pandas()
    ranks: dict = {}
    for frame in (bm, dn):
        for r in frame.itertuples():
            ranks.setdefault((r.query_id, r.doc_id), []).append(r.rnk)
    for r in fused.itertuples():
        expect = sum(RRF_SCALE // (RRF_K + x)
                     for x in ranks[(r.query_id, r.doc_id)])
        assert r.rrf == expect

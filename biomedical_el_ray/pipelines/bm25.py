"""BM25 keyword retrieval over the ``documents`` table.

The training-data analog of the reference's TF-IDF candidate generator
(/root/reference/utils_e2e_span.py:374-428 mines candidates by lexical
similarity before the dense scorer): a fixed query set is scored against
the whole corpus with BM25 and the global top-k documents per query are
returned.  This is the standard sparse-retrieval step of decontamination
audits, eval-set mining and RAG-corpus curation at 100 TB.

Scale shape (two passes, both streaming):

1. **Fit** — one ``map_batches`` pass emits BOUNDED partials per block:
   per-query-term document frequencies plus (doc count, token count)
   totals.  A ``groupby().sum()`` over <= |vocab|+1 keys reduces them;
   only the tiny stats table ever reaches the driver.
2. **Score** — stats are broadcast once (``ray.put``), every batch
   tokenizes with Arrow kernels, computes integer BM25 contributions
   fully vectorized, and emits a per-batch partial top-k per query; a
   final ``groupby(query_id)`` over <= n_blocks * k rows picks the
   global top-k.  No score matrix and no corpus text ever crosses the
   object store.

Arithmetic is **fixed-point integer** so the DuckDB oracle is bit-exact
(the same design as ``textstats.lm_quality``): with k1 = 6/5, b = 3/4,
avgdl = T/N (T = corpus tokens, N = docs),

    tf_term = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

multiplied through by 10*T becomes the integer ratio

    tfnum = 22*T*tf,   tfden = 10*T*tf + 3*T + 9*dl*N

and the per-(term, doc) contribution is

    idf_fp  = ((2N - 2df + 1) * 1_000_000) // (2df + 1)
    contrib = idf_fp * ((tfnum * 1000) // tfden)

i.e. a Robertson-style rational idf kept as a ppm fixed-point integer
instead of its log — monotone in the same argument, and exactly
reproducible in SQL (``//`` floors identically in numpy and DuckDB for
the all-positive operands here).  Overflow bounds: contrib fits int64
for N up to ~2e9 docs and tfnum*1000 for T*tf up to ~4e14; past that,
drop SCALE by 10x (documented, asserted in the fit step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.sources.readers import read_table
from biomedical_el_ray.util import ref_key, worker_state

# default query set over the synthetic corpus vocabulary; terms within a
# query are unique by construction (duplicate terms would double-count
# in the engine but dedupe in SQL's DISTINCT join)
DEFAULT_QUERIES: tuple[str, ...] = (
    "table scan",
    "sort merge join",
    "hash agg",
    "window query slow",
    "stream filter fast",
)

IDF_SCALE = 1_000_000
TF_SCALE = 1_000


def _query_terms(queries) -> list[list[str]]:
    out = []
    for q in queries:
        terms = q.split()
        if len(set(terms)) != len(terms):
            raise ValueError(f"duplicate term in BM25 query: {q!r}")
        out.append(terms)
    return out


def _tokens_exploded(text: pa.ChunkedArray | pa.Array):
    """text column -> (row_ids int64, flat token Array), empties dropped —
    the same RE2 '\\s+' split / '\\S+' class contract as
    ``textstats._unique_token_counts``."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(text, ""), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    per_row = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    row = np.repeat(np.arange(len(text), dtype=np.int64), per_row)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    return row[keep], flat.filter(pa.array(keep))


def _term_tf(row: np.ndarray, toks: pa.Array, vocab: pa.Array):
    """(row ids, flat tokens) -> (row, term_idx, tf) for tokens in vocab,
    via one Arrow filter + index + lexsort + run detection (no Python per
    row, no hashing)."""
    mask = np.asarray(pc.is_in(toks, value_set=vocab))
    if not mask.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    row = row[mask]
    tidx = np.asarray(
        pc.index_in(toks.filter(pa.array(mask)), value_set=vocab)
    ).astype(np.int64)
    order = np.lexsort((tidx, row))
    row, tidx = row[order], tidx[order]
    first = np.ones(len(row), dtype=bool)
    first[1:] = (row[1:] != row[:-1]) | (tidx[1:] != tidx[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.append(starts, len(row)))
    return row[starts], tidx[starts], tf.astype(np.int64)


def _stats_partial(t: pa.Table, vocab_ref) -> pa.Table:
    """Bounded per-block partial: term_idx -> df, plus the sentinel row
    term_idx = -1 carrying (doc count, token count) in (df, ntok)."""
    vocab = worker_state(
        ("bm25_vocab", ref_key(vocab_ref)), lambda: ray.get(vocab_ref)
    )
    row, toks = _tokens_exploded(t["text"])
    rows, tidx, _tf = _term_tf(row, toks, vocab)
    # df partial = number of docs in this block containing the term
    df = np.bincount(tidx, minlength=len(vocab)).astype(np.int64) if len(tidx) else np.zeros(len(vocab), np.int64)
    term_idx = np.append(np.arange(len(vocab), dtype=np.int64), -1)
    dfc = np.append(df, t.num_rows)  # sentinel df slot = doc count
    ntok = np.zeros(len(vocab) + 1, dtype=np.int64)
    ntok[-1] = len(row)  # sentinel ntok slot = token count
    return pa.Table.from_arrays(
        [pa.array(term_idx), pa.array(dfc), pa.array(ntok)],
        names=["term_idx", "df", "ntok"],
    )


def fit_bm25_stats(docs_ds, vocab: list[str]):
    """documents Dataset -> (N docs, T tokens, df per vocab term).

    The groupby reduces <= |vocab|+1 rows per block; ``take_all`` touches
    only that bounded stats table, never the corpus."""
    vocab_arr = pa.array(vocab, pa.string())
    vocab_ref = ray.put(vocab_arr)
    agg = (
        docs_ds.map_batches(
            _stats_partial,
            fn_kwargs={"vocab_ref": vocab_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("term_idx")
        .sum(["df", "ntok"])
    )
    df = np.zeros(len(vocab), dtype=np.int64)
    n_docs = 0
    n_toks = 0
    for r in agg.take_all():
        if r["term_idx"] == -1:
            n_docs = int(r["sum(df)"])
            n_toks = int(r["sum(ntok)"])
        else:
            df[int(r["term_idx"])] = int(r["sum(df)"])
    # fixed-point overflow bounds (see module docstring)
    if n_docs > 2_000_000_000 or n_toks > 4_000_000_000_000:
        raise OverflowError(
            "bm25 fixed-point scales need lowering for this corpus size"
        )
    return n_docs, n_toks, df


class Bm25Scorer:
    """Actor-pool stage: broadcast stats in ``__init__`` (once per
    worker), vectorized integer scoring + per-batch partial top-k per
    query in ``__call__``."""

    def __init__(self, stats_ref, k: int):
        vocab_arr, n_docs, n_toks, df, qmask = ray.get(stats_ref)
        self.vocab = vocab_arr
        self.N = int(n_docs)
        self.T = int(n_toks)
        # idf_fp per term, int64 ppm
        df = df.astype(np.int64)
        self.idf_fp = ((2 * self.N - 2 * df + 1) * IDF_SCALE) // (2 * df + 1)
        self.qmask = qmask  # (n_queries, |vocab|) bool incidence
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"]
        row, toks = _tokens_exploded(t["text"])
        dl = np.bincount(row, minlength=t.num_rows).astype(np.int64)
        rows, tidx, tf = _term_tf(row, toks, self.vocab)
        parts: list[pa.Table] = []
        if len(rows):
            T, N = self.T, self.N
            tfnum = 22 * T * tf
            tfden = 10 * T * tf + 3 * T + 9 * dl[rows] * N
            contrib = self.idf_fp[tidx] * ((tfnum * TF_SCALE) // tfden)
            for qi in range(self.qmask.shape[0]):
                m = self.qmask[qi, tidx]
                if not m.any():
                    continue
                score = np.zeros(t.num_rows, dtype=np.int64)
                np.add.at(score, rows[m], contrib[m])
                hit = np.flatnonzero(score > 0)
                if len(hit) == 0:
                    continue
                # partial top-k: score desc, doc_id asc (Arrow sort ranks
                # strings like SQL ORDER BY for the ASCII ids here)
                sub = pa.table(
                    {
                        "query_id": pa.array(
                            np.full(len(hit), qi, dtype=np.int64)
                        ),
                        "doc_id": doc_id.take(pa.array(hit)),
                        "score": pa.array(score[hit]),
                    }
                )
                idx = pc.sort_indices(
                    sub,
                    sort_keys=[("score", "descending"), ("doc_id", "ascending")],
                )[: self.k]
                parts.append(sub.take(idx))
        if not parts:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.string()),
                    pa.array([], pa.int64()),
                ],
                names=["query_id", "doc_id", "score"],
            )
        return pa.concat_tables(parts).combine_chunks()


def _final_topk_ds(partial, k: int):
    """Arrow per-query top-k reduce: (query_id, doc_id, score, rnk)."""
    from biomedical_el_ray.util import grouped_topk_arrow

    return grouped_topk_arrow(
        partial, "query_id",
        [("score", "descending"), ("doc_id", "ascending")], k,
        out_cols=["query_id", "doc_id", "score", "rnk"],
    )


def bm25_search(docs_ds, queries=DEFAULT_QUERIES, k: int = 10):
    """documents Dataset -> (query_id, doc_id, score, rnk) global BM25
    top-k per query."""
    qterms = _query_terms(queries)
    vocab = sorted({t for terms in qterms for t in terms})
    pos = {t: i for i, t in enumerate(vocab)}
    n_docs, n_toks, df = fit_bm25_stats(docs_ds, vocab)
    qmask = np.zeros((len(qterms), len(vocab)), dtype=bool)
    for qi, terms in enumerate(qterms):
        for t in terms:
            qmask[qi, pos[t]] = True
    stats_ref = ray.put((pa.array(vocab, pa.string()), n_docs, n_toks, df, qmask))
    partial = docs_ds.map_batches(
        Bm25Scorer,
        fn_constructor_kwargs={"stats_ref": stats_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )
    return _final_topk_ds(partial, k)


def bm25_topk(sf_dir: str, k: int = 10):
    """Driver-contract query: BM25 top-k for ``DEFAULT_QUERIES``."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return bm25_search(docs, DEFAULT_QUERIES, k=k)


def bm25_ranked_cte(docs_rel: str = "documents", k: int = 10,
                    queries=DEFAULT_QUERIES) -> str:
    """CTE chain (to splice after ``WITH``) ending in ``bmr(query_id,
    doc_id, score, rnk)`` — the BM25 global top-k per query with the
    rank-<=k / score>0 filters applied, shared by ``bm25_oracle_sql``
    and the hybrid-fusion oracle."""
    vals = ", ".join(
        f"({qi}, '{t}')"
        for qi, terms in enumerate(_query_terms(queries))
        for t in terms
    )
    return f"""qt(query_id, term) AS (VALUES {vals}),
        dl AS (
          SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS dl
          FROM {docs_rel}),
        toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
          FROM {docs_rel}),
        v AS (SELECT DISTINCT term FROM qt),
        tfv AS (
          SELECT t.doc_id, t.tok AS term, count(*) AS tf
          FROM toks t JOIN v ON v.term = t.tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tfv GROUP BY term),
        c AS (
          SELECT (SELECT count(*) FROM {docs_rel}) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS tt),
        contrib AS (
          SELECT q.query_id, f.doc_id,
                 (((2*c.n - 2*d.df + 1) * {IDF_SCALE}) // (2*d.df + 1))
                 * ((22 * c.tt * f.tf * {TF_SCALE})
                    // (10 * c.tt * f.tf + 3 * c.tt + 9 * l.dl * c.n))
                 AS contrib
          FROM tfv f
          JOIN dfreq d USING (term)
          JOIN qt q ON q.term = f.term
          JOIN dl l ON l.doc_id = f.doc_id
          CROSS JOIN c),
        sc AS (
          SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score
          FROM contrib GROUP BY 1, 2),
        r AS (
          SELECT query_id, doc_id, score,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
          FROM sc),
        bmr AS (
          SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                 score, CAST(rnk AS BIGINT) AS rnk
          FROM r WHERE rnk <= {k} AND score > 0)"""


def bm25_oracle_sql(docs_rel: str = "documents", k: int = 10,
                    queries=DEFAULT_QUERIES) -> str:
    """Exact DuckDB twin of ``bm25_topk`` (same fixed-point integers)."""
    return f"""
        WITH {bm25_ranked_cte(docs_rel, k, queries)}
        SELECT query_id, doc_id, score, rnk FROM bmr
    """


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_SCALE = 1_000_000_000


class _DenseScorer:
    """Per-batch dense partial top-k: embed the batch's document text
    with the integer-exact Rademacher hash embedder (built once per
    actor), score against the broadcast query matrix with one f64 GEMM
    (exact — every int product and partial sum stays far below 2^53),
    emit each query's batch-local top-k."""

    def __init__(self, q_ref, k: int):
        from biomedical_el_ray.stages.embed import HashEmbedder

        self.qids, self.Q, self.qsq = ray.get(q_ref)
        self.emb = HashEmbedder(projection="rademacher")
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
        D, dsq = self.emb.embed_int(t["text"].to_pylist())
        dots = D.astype(np.float64) @ self.Q.T.astype(np.float64)
        cos = dots / np.sqrt(
            np.maximum(dsq[:, None] * self.qsq[None, :], 1).astype(np.float64))
        nq = len(self.qids)
        k = min(self.k, len(doc_id))
        out_q, out_d, out_c = [], [], []
        for qi in range(nq):
            order = np.lexsort((doc_id, -cos[:, qi]))[:k]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_d.append(doc_id[order])
            out_c.append(cos[order, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "doc_id": pa.array(np.concatenate(out_d)),
            "cos": pa.array(np.concatenate(out_c), pa.float64()),
        })


def _dense_final_topk_ds(partial, k: int):
    """Arrow per-query top-k reduce: (query_id, doc_id, cos, rnk)."""
    from biomedical_el_ray.util import grouped_topk_arrow

    return grouped_topk_arrow(
        partial, "query_id",
        [("cos", "descending"), ("doc_id", "ascending")], k,
        out_cols=["query_id", "doc_id", "cos", "rnk"],
    )


def dense_search(docs_ds, queries=DEFAULT_QUERIES, k: int = 10):
    """documents Dataset -> (query_id, doc_id, cos, rnk) global dense
    top-k per query (Rademacher shingle-hash embedding cosine — the
    integer-exact JL stand-in for a model embedder, same pluggable seam
    as the flagship's A2 slot)."""
    from biomedical_el_ray.stages.embed import HashEmbedder

    emb = HashEmbedder(projection="rademacher")
    Q, qsq = emb.embed_int(list(queries))
    q_ref = ray.put((np.arange(len(queries), dtype=np.int64), Q,
                     np.maximum(qsq, 1)))
    partial = docs_ds.map_batches(
        _DenseScorer,
        fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )
    return _dense_final_topk_ds(partial, k)


def hybrid_rrf_topk(sf_dir: str, k: int = 10, n_rank: int = 20):
    """(query_id, doc_id, rrf, rnk) — hybrid sparse+dense retrieval
    fused by reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009):
    each ranker's top-``n_rank`` contributes ``RRF_SCALE // (RRF_K +
    rank)`` and documents re-rank by the summed contribution — the
    standard RAG-era fusion of a keyword list (BM25) and an embedding
    list, as one driver query.

    Scale shape: both input rankings are the proven streaming paths
    (broadcast stats / query matrix, per-batch partial top-k, one
    bounded groupby each); fusion itself touches only the union of two
    top-``n_rank`` lists — <= 2·n_rank rows per query, never the corpus.
    Integer fixed-point contributions make the sum combine-order-free
    and the DuckDB oracle bit-exact; ties break by doc_id on both sides.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    bm = bm25_search(docs, DEFAULT_QUERIES, k=n_rank)
    dn = dense_search(docs, DEFAULT_QUERIES, k=n_rank)

    def _contrib(t: pa.Table) -> pa.Table:
        rnk = t["rnk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": t["query_id"].combine_chunks()
            if isinstance(t["query_id"], pa.ChunkedArray) else t["query_id"],
            "doc_id": t["doc_id"].combine_chunks()
            if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
            "c": pa.array(RRF_SCALE // (RRF_K + rnk)),
        })

    u = bm.select_columns(["query_id", "doc_id", "rnk"]).map_batches(
        _contrib, batch_format="pyarrow", zero_copy_batch=True
    ).union(dn.select_columns(["query_id", "doc_id", "rnk"]).map_batches(
        _contrib, batch_format="pyarrow", zero_copy_batch=True))

    def _fuse(t: pa.Table) -> pa.Table:
        # In-task Arrow fuse (the partition holds every contribution of its
        # queries): sort by (query_id, doc_id), sum contributions per pair
        # via np.add.reduceat on the run boundaries, then rank per query.
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.string()),
             pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["query_id", "doc_id", "rrf", "rnk"],
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].combine_chunks()
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(qid)
        brk = np.ones(n, bool)
        brk[1:] = (qid[1:] != qid[:-1]) | ~pc.equal(
            doc.slice(1), doc.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        rrf = np.add.reduceat(c, starts)
        agg = pa.Table.from_arrays(
            [
                pa.array(qid[starts].astype(np.int64)),
                doc.take(pa.array(starts)),
                pa.array(rrf.astype(np.int64)),
            ],
            names=["query_id", "doc_id", "rrf"],
        ).sort_by([("query_id", "ascending"), ("rrf", "descending"),
                   ("doc_id", "ascending")])
        # per-query rank over the aggregated pairs
        aq = agg["query_id"].to_numpy(zero_copy_only=False)
        m = len(aq)
        qbrk = np.ones(m, bool)
        qbrk[1:] = aq[1:] != aq[:-1]
        qstarts = np.flatnonzero(qbrk)
        rank = np.arange(m, dtype=np.int64)
        rank -= np.repeat(rank[qstarts], np.diff(np.append(qstarts, m)))
        return agg.append_column(
            "rnk", pa.array(rank + 1, pa.int64())
        ).filter(pa.array(rank < k))

    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    return (
        ensure_hash_shuffle(u)
        .repartition(shuffle_partitions(), keys=["query_id"])
        .map_batches(_fuse, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    )


def hybrid_rrf_oracle_sql(docs_rel: str = "documents", k: int = 10,
                          n_rank: int = 20,
                          queries=DEFAULT_QUERIES) -> str:
    """DuckDB twin: the shared BM25 ranked CTE + the Rademacher embedding
    chain over documents AND the query literals, cosine ranked by
    (cos DESC, doc_id), fused with the same integer contributions."""
    from biomedical_el_ray.functions.sql_hash import rademacher_emb_cte
    from biomedical_el_ray.stages.embed import HashEmbedder, rademacher_salt

    e = HashEmbedder(projection="rademacher")
    salt = rademacher_salt(0x5EED02)
    qvals = ", ".join(
        f"({qi}, '{q}')" for qi, q in enumerate(queries))
    demb = rademacher_emb_cte(docs_rel, k=e.shingle_k,
                              n_features=e.n_features, dim=e.dim,
                              salt=salt, prefix="hd")
    qemb = rademacher_emb_cte("qrel", k=e.shingle_k,
                              n_features=e.n_features, dim=e.dim,
                              salt=salt, id_col="query_id",
                              text_col="qtext", prefix="hq")
    return f"""
        WITH {bm25_ranked_cte(docs_rel, n_rank, queries)},
        qrel(query_id, qtext) AS (VALUES {qvals}),
        {demb},
        {qemb},
        hdot AS (
          SELECT q.doc_id AS query_id, d.doc_id,
                 sum(q.e * d.e) AS dot
          FROM hqemb q JOIN hdemb d ON q.d = d.d
          GROUP BY 1, 2),
        hcos AS (
          SELECT t.query_id, t.doc_id,
                 CAST(t.dot AS DOUBLE)
                   / sqrt(CAST(greatest(qs.sq, 1) * greatest(ds.sq, 1)
                               AS DOUBLE)) AS cos
          FROM hdot t
          JOIN hqsq qs ON qs.doc_id = t.query_id
          JOIN hdsq ds ON ds.doc_id = t.doc_id),
        dnr AS (
          SELECT query_id, doc_id,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk
          FROM hcos),
        fu AS (
          SELECT query_id, doc_id,
                 {RRF_SCALE} // ({RRF_K} + rnk) AS c FROM bmr
          UNION ALL
          SELECT query_id, doc_id,
                 {RRF_SCALE} // ({RRF_K} + rnk) AS c
          FROM dnr WHERE rnk <= {n_rank}),
        fs AS (
          SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf
          FROM fu GROUP BY 1, 2),
        fr AS (
          SELECT query_id, doc_id, rrf,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
          FROM fs)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf,
               CAST(rnk AS BIGINT) AS rnk
        FROM fr WHERE rnk <= {k}
    """

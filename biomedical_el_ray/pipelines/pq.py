"""Product quantization (PQ): codes + asymmetric-distance ANN search.

Completes the ANN family (brute / sign-LSH / IVF-flat / PQ) with the
memory-reduction path that actually matters at 100 TB: PQ stores each
vector as ``m`` sub-space centroid codes (here 4 bytes instead of 256 —
a 64x compression), and search scans CODES, never vectors, via a
per-query lookup table (Jégou, Douze & Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Construction (everything deterministic + DuckDB-oracle exact):

* the 64-dim embedding splits into ``m`` contiguous sub-spaces;
* each sub-space trains its own codebook with the engine's fixed-point
  Lloyd k-means (``pipelines.kmeans.fit_kmeans`` — floor(x·1e6+.5)
  int64 elements, integer squared-L2 argmin with smaller-id ties,
  truncating centroid division, vec_id<k seeds), so the trained
  codebooks are bit-identical to a chained-CTE SQL unroll;
* codes = integer argmin of each sub-vector against its codebook
  (code value = the centroid's cluster id, i.e. its seed vec_id);
* ADC search: LUT[q, s, c] = integer squared L2 between query q's
  sub-vector s and centroid c; a database vector's distance is
  Σ_s LUT[q, s, code(v, s)] — exact int64 arithmetic end to end, so
  the top-k (ties to smaller vec_id) needs no float determinism
  argument at all.

Scale shape: training reduces per-block integer partials through the
kmeans machinery (the corpus never materializes); encoding is one
streaming pass against the ray.put codebooks; search is one streaming
pass over the CODES dataset with a broadcast (n_queries × m × k) LUT
emitting per-batch partial top-k, reduced by one bounded groupby.  At
real scale the codes dataset is the persisted artifact (this module's
``pq_codes`` materializes exactly that layout) and re-encoding is never
on the search path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from biomedical_el_ray.pipelines.ann import _emb_matrix, _load_queries
from biomedical_el_ray.pipelines.kmeans import (
    SCALE, _assign, _fixed_point, fit_kmeans,
)
from biomedical_el_ray.sources.readers import read_table
from biomedical_el_ray.util import memo_derived

DEFAULT_M = 4
DEFAULT_KC = 8
DEFAULT_ITERS = 2
_DIM = 64


def _slice_sub(lo: int, hi: int):
    """Batch fn: (vec_id, embedding) -> (vec_id, embedding[lo:hi]) with the
    sub-vector re-wrapped as a fixed-size list (what fit_kmeans consumes)."""

    def _f(t: pa.Table) -> pa.Table:
        E = _emb_matrix(t["embedding"])[:, lo:hi]
        sub = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(E).ravel(), pa.float64()), hi - lo
        )
        return pa.Table.from_arrays([t["vec_id"], sub],
                                    names=["vec_id", "embedding"])

    return _f


def fit_pq(sf_dir: str, m: int = DEFAULT_M, kc: int = DEFAULT_KC,
           iters: int = DEFAULT_ITERS):
    """Train per-sub-space codebooks; returns a list of (cids, cmat)
    int64 pairs, one per sub-space.  Memoized per session (training is
    m × iters streaming passes; every PQ consumer shares one fit)."""

    def _build():
        emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        width = _DIM // m
        assert m * width == _DIM, "m must divide the embedding dim"
        books = []
        for s in range(m):
            sub = emb.map_batches(
                _slice_sub(s * width, (s + 1) * width),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            cids, cmat, _ = fit_kmeans(sub, k=kc, iters=iters)
            books.append((cids, cmat))
        return books

    return memo_derived(("pq_codebooks", str(sf_dir), m, kc, iters), _build)


class _PqEncoder:
    """Actor: broadcast codebooks in, PACKED (vec_id, codes[m]) rows out —
    one row per vector, so no downstream repacking can ever split a
    vector's codes across batch boundaries."""

    def __init__(self, books_ref, m: int):
        self.books = (ray.get(books_ref)
                      if isinstance(books_ref, ray.ObjectRef) else books_ref)
        self.m = m
        self.width = _DIM // m

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        Q = _fixed_point(_emb_matrix(t["embedding"]))
        n = len(ids)
        mat = np.empty((n, self.m), dtype=np.int64)
        for s, (cids, cmat) in enumerate(self.books):
            sub = Q[:, s * self.width:(s + 1) * self.width]
            mat[:, s] = _assign(sub, cids, cmat)
        packed = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.int64()), self.m)
        return pa.Table.from_arrays(
            [pa.array(ids.astype(np.int64)), packed],
            names=["vec_id", "codes"],
        )


def _packed_codes(sf_dir: str, m: int, kc: int, iters: int):
    """(vec_id, codes[m]) Dataset — the searchable PQ index layout,
    materialized once per session (the persisted-index analog: encoding
    must never sit on the search path)."""

    def _build():
        books = fit_pq(sf_dir, m, kc, iters)
        books_ref = ray.put(books)
        emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        return emb.map_batches(
            _PqEncoder,
            fn_constructor_kwargs={"books_ref": books_ref, "m": m},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=(1, 8),
        ).materialize()

    return memo_derived(("pq_packed_codes", str(sf_dir), m, kc, iters), _build)


def pq_codes(sf_dir: str, m: int = DEFAULT_M, kc: int = DEFAULT_KC,
             iters: int = DEFAULT_ITERS):
    """(vec_id, sub, code) — the PQ code table flat, the artifact a
    production index persists (m small ints replace the 64-float
    vector).  Per-batch explode of the packed form (order-safe)."""

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        codes = (t["codes"].combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False).reshape(len(ids), m))
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(ids, m).astype(np.int64)),
                pa.array(np.tile(np.arange(m, dtype=np.int64), len(ids))),
                pa.array(codes.ravel().astype(np.int64)),
            ],
            names=["vec_id", "sub", "code"],
        )

    return _packed_codes(sf_dir, m, kc, iters).map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True)


class _AdcScorer:
    """Actor: broadcast LUT in; per-batch partial top-k over CODE rows.

    Consumes the (vec_id, codes list) form — search touches codes only."""

    def __init__(self, lut_ref, qids_ref, cids_ref, k: int, m: int):
        self.lut = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.qids = (ray.get(qids_ref)
                     if isinstance(qids_ref, ray.ObjectRef) else qids_ref)
        # per-sub centroid ids; ascending by the fit_kmeans seed invariant
        # (vec_id<k seeds, drops preserve order), so the LUT column of a
        # code value is just its searchsorted position
        self.cids = (ray.get(cids_ref)
                     if isinstance(cids_ref, ray.ObjectRef) else cids_ref)
        self.k = k
        self.m = m

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        codes = (t["codes"].combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False).reshape(len(ids), self.m))
        # ADC: dist (n, Q) = Σ_s LUT[:, s, idx(code_s)]
        dist = np.zeros((len(ids), self.lut.shape[0]), dtype=np.int64)
        for s in range(self.m):
            idx = np.searchsorted(self.cids[s], codes[:, s])
            dist += self.lut[:, s, :][:, idx].T
        out_q, out_v, out_d = [], [], []
        for qi, qid in enumerate(self.qids):
            col = dist[:, qi]
            mask = ids != qid  # self-match excluded, as in ann_brute_topk
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            take = cand[np.lexsort((ids[cand], col[cand]))][:self.k]
            out_q.extend([int(qid)] * len(take))
            out_v.extend(ids[take].tolist())
            out_d.extend(col[take].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_v, pa.int64()),
                pa.array(out_d, pa.int64()),
            ],
            names=["q_vec_id", "vec_id", "adc_fp"],
        )


def ann_pq_topk(sf_dir: str, n_queries: int = 8, k: int = 10,
                m: int = DEFAULT_M, kc: int = DEFAULT_KC,
                iters: int = DEFAULT_ITERS):
    """(q_vec_id, vec_id, rnk, adc_fp) — PQ/ADC approximate top-k for the
    first ``n_queries`` vectors, searched over the CODES dataset with a
    broadcast integer lookup table.  Exact-integer distances make the
    result bit-identical to the DuckDB twin; recall vs ``ann_brute_topk``
    is measured in tests (approximate by design)."""
    from biomedical_el_ray.util import drop_empty_blocks

    books = fit_pq(sf_dir, m, kc, iters)
    qids, Q = _load_queries(sf_dir, n_queries)
    Qfp = _fixed_point(Q)
    width = _DIM // m
    kmax = max(len(c) for c, _ in books)
    # LUT[q, s, ci]: exact int64 squared L2 of query sub-vector vs centroid
    lut = np.zeros((len(qids), m, kmax), dtype=np.int64)
    for s, (cids, cmat) in enumerate(books):
        sub = Qfp[:, s * width:(s + 1) * width]
        d = sub[:, None, :] - cmat[None, :, :]
        lut[:, s, :len(cids)] = (d * d).sum(axis=2)
    lut_ref = ray.put(lut)
    qids_ref = ray.put(qids)
    cids_ref = ray.put([c for c, _ in books])
    codes = drop_empty_blocks(_packed_codes(sf_dir, m, kc, iters))
    partial = codes.map_batches(
        _AdcScorer,
        fn_constructor_kwargs={"lut_ref": lut_ref, "qids_ref": qids_ref,
                               "cids_ref": cids_ref, "k": k, "m": m},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,
        concurrency=(1, 8),
    )

    from biomedical_el_ray.util import grouped_topk_arrow

    return grouped_topk_arrow(
        partial, "q_vec_id",
        [("adc_fp", "ascending"), ("vec_id", "ascending")], k,
        out_cols=["q_vec_id", "vec_id", "rnk", "adc_fp"],
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _pq_cte_parts(m: int, kc: int, iters: int, dim: int) -> tuple[str, str]:
    """Per-sub-space kmeans chains + the final code assignment, as CTE
    text.  Returns (parts, codes_cte_name); ``codes`` has
    (vec_id, sub, code).  Mirrors ``kmeans.kmeans_cte_parts`` with a dim
    range per sub-space and one extra assignment against the FINAL
    codebook (the engine encodes against the post-update centroids)."""
    width = dim // m
    parts = [f"""
        q AS MATERIALIZED (
          SELECT e.vec_id, r.i AS dim,
                 CAST(floor(CAST(e.embedding AS DOUBLE[])[r.i + 1]
                            * {SCALE} + 0.5) AS BIGINT) AS q
          FROM embeddings e, range({dim}) r(i))"""]
    code_selects = []
    for s in range(m):
        lo, hi = s * width, (s + 1) * width
        parts.append(f"""
        s{s}_c0 AS (
          SELECT vec_id AS cluster_id, dim, q AS c
          FROM q WHERE vec_id < {kc} AND dim >= {lo} AND dim < {hi})""")
        for it in range(1, iters + 1):
            prev, asn, upd = f"s{s}_c{it - 1}", f"s{s}_a{it}", f"s{s}_c{it}"
            parts.append(f"""
        {asn} AS (
          SELECT vec_id, cluster_id FROM (
            SELECT p.vec_id, c.cluster_id,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY sum((p.q - c.c) * (p.q - c.c)),
                              c.cluster_id) AS rn
            FROM q p JOIN {prev} c USING (dim)
            WHERE p.dim >= {lo} AND p.dim < {hi}
            GROUP BY p.vec_id, c.cluster_id) WHERE rn = 1),
        {upd} AS MATERIALIZED (
          SELECT a.cluster_id, p.dim,
                 CAST(sum(p.q) AS BIGINT) // count(*) AS c,
                 CAST(count(*) AS BIGINT) AS n
          FROM {asn} a JOIN q p USING (vec_id)
          WHERE p.dim >= {lo} AND p.dim < {hi}
          GROUP BY a.cluster_id, p.dim)""")
        parts.append(f"""
        s{s}_code AS (
          SELECT vec_id, cluster_id FROM (
            SELECT p.vec_id, c.cluster_id,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY sum((p.q - c.c) * (p.q - c.c)),
                              c.cluster_id) AS rn
            FROM q p JOIN s{s}_c{iters} c USING (dim)
            WHERE p.dim >= {lo} AND p.dim < {hi}
            GROUP BY p.vec_id, c.cluster_id) WHERE rn = 1)""")
        code_selects.append(
            f"SELECT vec_id, {s} AS sub, cluster_id AS code FROM s{s}_code")
    parts.append(f"""
        codes AS MATERIALIZED ({' UNION ALL '.join(code_selects)})""")
    return ",".join(parts), "codes"


def pq_codes_oracle_sql(m: int = DEFAULT_M, kc: int = DEFAULT_KC,
                        iters: int = DEFAULT_ITERS, dim: int = _DIM) -> str:
    parts, codes = _pq_cte_parts(m, kc, iters, dim)
    return f"""
        WITH {parts}
        SELECT vec_id, CAST(sub AS BIGINT) AS sub, code FROM {codes}
    """


def ann_pq_oracle_sql(n_queries: int = 8, k: int = 10, m: int = DEFAULT_M,
                      kc: int = DEFAULT_KC, iters: int = DEFAULT_ITERS,
                      dim: int = _DIM) -> str:
    """ADC in SQL: LUT = integer distances query-sub-vector vs final
    centroids; total = sum over sub-spaces via the codes join."""
    width = dim // m
    parts, codes = _pq_cte_parts(m, kc, iters, dim)
    cb_union = " UNION ALL ".join(
        f"SELECT {s} AS sub, cluster_id, dim, c FROM s{s}_c{iters}"
        for s in range(m))
    return f"""
        WITH {parts},
        cb AS ({cb_union}),
        lut AS MATERIALIZED (
          SELECT qq.vec_id AS q_vec_id, cb.sub, cb.cluster_id AS code,
                 sum((qq.q - cb.c) * (qq.q - cb.c)) AS d
          FROM q qq JOIN cb ON qq.dim = cb.dim
          WHERE qq.vec_id < {n_queries}
          GROUP BY 1, 2, 3),
        totals AS (
          SELECT l.q_vec_id, t.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_fp
          FROM {codes} t
          JOIN lut l ON l.sub = t.sub AND l.code = t.code
          WHERE t.vec_id <> l.q_vec_id
          GROUP BY 1, 2),
        ranked AS (
          SELECT q_vec_id, vec_id, adc_fp,
                 row_number() OVER (
                   PARTITION BY q_vec_id
                   ORDER BY adc_fp, vec_id) AS rnk
          FROM totals)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk, adc_fp
        FROM ranked WHERE rnk <= {k}
    """

# ---------------------------------------------------------------------------
# IVF + PQ composition (IVFADC, Jégou et al. TPAMI 2011 §IV)
# ---------------------------------------------------------------------------

class _IvfPqIndexer:
    """Actor: ONE streaming pass builds the searchable IVF-PQ index row
    per vector — coarse inverted-list id (max-cosine stride centroid,
    the ann_ivf rule) plus the packed PQ codes.  No join between the
    assignment and encoding passes is ever needed."""

    def __init__(self, books_ref, coarse_ref, m: int):
        self.books = (ray.get(books_ref)
                      if isinstance(books_ref, ray.ObjectRef) else books_ref)
        ccids, C = (ray.get(coarse_ref)
                    if isinstance(coarse_ref, ray.ObjectRef) else coarse_ref)
        self.ccids = ccids          # sorted coarse centroid ids
        self.C = C                  # (ncent, dim) float64, cid order
        self.cnorm = np.maximum(np.linalg.norm(C, axis=1), 1e-300)
        self.m = m
        self.width = _DIM // m

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _emb_matrix(t["embedding"])
        enorm = np.linalg.norm(E, axis=1)
        # coarse assignment: same f64 cosine + first-argmax tie rule as
        # ann._IvfScorer (C sorted by cid -> ties pick the smaller cid)
        cs = (E @ self.C.T) / np.maximum(
            enorm[:, None] * self.cnorm[None, :], 1e-300)
        coarse = self.ccids[np.argmax(cs, axis=1)]
        Qfp = _fixed_point(E)
        n = len(ids)
        mat = np.empty((n, self.m), dtype=np.int64)
        for s, (cids, cmat) in enumerate(self.books):
            sub = Qfp[:, s * self.width:(s + 1) * self.width]
            mat[:, s] = _assign(sub, cids, cmat)
        packed = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.int64()), self.m)
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(coarse.astype(np.int64)),
                packed,
            ],
            names=["vec_id", "coarse", "codes"],
        )


def _ivfpq_index(sf_dir: str, stride: int, max_centroids: int,
                 m: int, kc: int, iters: int):
    """(vec_id, coarse, codes[m]) Dataset — the persisted IVFADC index
    layout (inverted-list id + PQ codes per vector), materialized once
    per session.  PQ encodes the RAW vectors (the ``by_residual=False``
    IVF-PQ variant — one shared codebook instead of per-list residual
    codebooks keeps codes, LUT and the DuckDB twin exact-integer while
    preserving the memory-reduction and list-pruning structure)."""
    from biomedical_el_ray.pipelines.ann import _stride_codebook

    def _build():
        books = fit_pq(sf_dir, m, kc, iters)
        emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        coarse = _stride_codebook(emb, stride, max_centroids)
        return emb.map_batches(
            _IvfPqIndexer,
            fn_constructor_kwargs={
                "books_ref": ray.put(books),
                "coarse_ref": ray.put(coarse),
                "m": m,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=(1, 8),
        ).materialize()

    return memo_derived(
        ("ivfpq_index", str(sf_dir), stride, max_centroids, m, kc, iters),
        _build)


class _IvfPqScorer:
    """Actor: broadcast (LUT, probe mask) in; per-batch partial ADC top-k
    over INDEX rows — only vectors whose inverted list a query probes are
    scored for that query (the IVFADC search shape: list pruning times
    code-only distance evaluation)."""

    def __init__(self, state_ref, k: int, m: int):
        (self.lut, self.qids, self.cids, self.ccids, self.probe) = (
            ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef)
            else state_ref)
        self.k = k
        self.m = m

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        coarse = t["coarse"].to_numpy(zero_copy_only=False)
        codes = (t["codes"].combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False).reshape(len(ids), self.m))
        cpos = np.searchsorted(self.ccids, coarse)
        M = self.probe[cpos]                       # (n, nq) bool
        rows, qis = np.nonzero(M)
        keep = ids[rows] != self.qids[qis]
        rows, qis = rows[keep], qis[keep]
        dist = np.zeros(len(rows), dtype=np.int64)
        for s in range(self.m):
            idx = np.searchsorted(self.cids[s], codes[rows, s])
            dist += self.lut[qis, s, idx]
        out_q, out_v, out_d = [], [], []
        for qi, qid in enumerate(self.qids):
            sel = np.flatnonzero(qis == qi)
            if len(sel) == 0:
                continue
            take = sel[np.lexsort((ids[rows[sel]], dist[sel]))][:self.k]
            out_q.extend([int(qid)] * len(take))
            out_v.extend(ids[rows[take]].tolist())
            out_d.extend(dist[take].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_v, pa.int64()),
                pa.array(out_d, pa.int64()),
            ],
            names=["q_vec_id", "vec_id", "adc_fp"],
        )


def ann_ivfpq_topk(sf_dir: str, n_queries: int = 8, k: int = 10,
                   stride: int = 37, nprobe: int = 6,
                   max_centroids: int = 4096, m: int = DEFAULT_M,
                   kc: int = DEFAULT_KC, iters: int = DEFAULT_ITERS):
    """(q_vec_id, vec_id, rnk, adc_fp) — IVF+PQ composed search, the
    actual 100-TB ANN deployment shape (Jégou et al. TPAMI 2011 §IV:
    coarse-quantizer partitioning WITH PQ codes in the inverted lists):
    queries probe their ``nprobe`` max-cosine inverted lists and rank the
    probed vectors by exact-integer ADC over the broadcast LUT — search
    touches the CODES index only, never a vector, and scans only the
    probed fraction of it.

    Both halves are the proven chains (``ann_ivf_topk``'s relational
    coarse rule + ``ann_pq_topk``'s fixed-point codebooks/LUT), so the
    composition is bit-identical to its DuckDB twin; recall vs brute
    force is measured by ``ann_ivfpq_recall``.
    """
    from biomedical_el_ray.pipelines.ann import (
        _probe_matrix, _stride_codebook,
    )
    from biomedical_el_ray.util import drop_empty_blocks

    books = fit_pq(sf_dir, m, kc, iters)
    qids, Q = _load_queries(sf_dir, n_queries)
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    ccids, C = _stride_codebook(emb, stride, max_centroids)
    probe = _probe_matrix(qids, Q, ccids, C, nprobe)  # (centroid, query)
    Qfp = _fixed_point(Q)
    width = _DIM // m
    kmax = max(len(c) for c, _ in books)
    lut = np.zeros((len(qids), m, kmax), dtype=np.int64)
    for s, (cids, cmat) in enumerate(books):
        sub = Qfp[:, s * width:(s + 1) * width]
        d = sub[:, None, :] - cmat[None, :, :]
        lut[:, s, :len(cids)] = (d * d).sum(axis=2)
    state_ref = ray.put((
        lut, qids, [c for c, _ in books], ccids, probe))
    index = drop_empty_blocks(
        _ivfpq_index(sf_dir, stride, max_centroids, m, kc, iters))
    partial = index.map_batches(
        _IvfPqScorer,
        fn_constructor_kwargs={"state_ref": state_ref, "k": k, "m": m},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,
        concurrency=(1, 8),
    )
    from biomedical_el_ray.util import grouped_topk_arrow

    return grouped_topk_arrow(
        partial, "q_vec_id",
        [("adc_fp", "ascending"), ("vec_id", "ascending")], k,
        out_cols=["q_vec_id", "vec_id", "rnk", "adc_fp"],
    )


def ann_ivfpq_recall(sf_dir: str, n_queries: int = 8, k: int = 10,
                     stride: int = 37, nprobe: int = 6,
                     max_centroids: int = 4096, m: int = DEFAULT_M,
                     kc: int = DEFAULT_KC, iters: int = DEFAULT_ITERS):
    """(q_vec_id, n_brute, n_overlap, recall_r) — recall@k of the IVF+PQ
    index vs the brute-force exact top-k (the ``ann_recall_eval`` gate
    applied to the composed index; ground truth stays a query SAMPLE by
    construction at any scale)."""
    from biomedical_el_ray.pipelines.ann import ann_brute_topk

    brute = ann_brute_topk(sf_dir, n_queries, k).to_pandas()
    approx = ann_ivfpq_topk(
        sf_dir, n_queries, k, stride, nprobe, max_centroids, m, kc, iters
    ).to_pandas()
    merged = brute.merge(
        approx[["q_vec_id", "vec_id"]].assign(hit=1),
        on=["q_vec_id", "vec_id"], how="left",
    )
    g = (
        merged.groupby("q_vec_id")
        .agg(n_brute=("vec_id", "size"), n_overlap=("hit", "count"))
        .reset_index()
    )
    return pa.table({
        "q_vec_id": pa.array(g["q_vec_id"].to_numpy(np.int64)),
        "n_brute": pa.array(g["n_brute"].to_numpy(np.int64)),
        "n_overlap": pa.array(g["n_overlap"].to_numpy(np.int64)),
        "recall_r": pa.array(
            g["n_overlap"].to_numpy(np.float64)
            / g["n_brute"].to_numpy(np.float64)),
    })


def _ivfpq_probe_ctes(n_queries: int, stride: int, nprobe: int,
                      max_centroids: int) -> str:
    """CTE text for the coarse side (names disjoint from the PQ parts,
    whose ``q`` is the fixed-point (vec_id, dim) relation): ``cent`` /
    ``casn`` / ``qv`` / ``qprobe`` — the identical rules as
    ``ann.ann_ivf_oracle_sql``."""
    return f"""
        cent AS MATERIALIZED (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
          FROM embeddings
          WHERE vec_id % {stride} = 0
            AND vec_id < {stride * max_centroids}),
        casn AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), c.ce) DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
        qv AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < {n_queries}),
        qprobe AS (
          SELECT qid, cid FROM (
            SELECT qv.qid, c.cid,
                   row_number() OVER (
                     PARTITION BY qv.qid
                     ORDER BY list_cosine_similarity(qv.qe, c.ce) DESC,
                              c.cid) AS rn
            FROM qv CROSS JOIN cent c) WHERE rn <= {nprobe})"""


def ann_ivfpq_oracle_sql(n_queries: int = 8, k: int = 10, stride: int = 37,
                         nprobe: int = 6, max_centroids: int = 4096,
                         m: int = DEFAULT_M, kc: int = DEFAULT_KC,
                         iters: int = DEFAULT_ITERS, dim: int = _DIM) -> str:
    """DuckDB twin of ``ann_ivfpq_topk``: the PQ kmeans/codes/LUT chain
    restricted to vectors whose coarse list a query probes."""
    parts, codes = _pq_cte_parts(m, kc, iters, dim)
    cb_union = " UNION ALL ".join(
        f"SELECT {s} AS sub, cluster_id, dim, c FROM s{s}_c{iters}"
        for s in range(m))
    return f"""
        WITH {parts},
        {_ivfpq_probe_ctes(n_queries, stride, nprobe, max_centroids)},
        cb AS ({cb_union}),
        lut AS MATERIALIZED (
          SELECT qq.vec_id AS q_vec_id, cb.sub, cb.cluster_id AS code,
                 sum((qq.q - cb.c) * (qq.q - cb.c)) AS d
          FROM q qq JOIN cb ON qq.dim = cb.dim
          WHERE qq.vec_id < {n_queries}
          GROUP BY 1, 2, 3),
        totals AS (
          SELECT p.qid AS q_vec_id, t.vec_id,
                 CAST(sum(l.d) AS BIGINT) AS adc_fp
          FROM {codes} t
          JOIN casn a ON a.vec_id = t.vec_id
          JOIN qprobe p ON p.cid = a.cid AND t.vec_id <> p.qid
          JOIN lut l ON l.q_vec_id = p.qid AND l.sub = t.sub
                    AND l.code = t.code
          GROUP BY 1, 2),
        ranked AS (
          SELECT q_vec_id, vec_id, adc_fp,
                 row_number() OVER (
                   PARTITION BY q_vec_id
                   ORDER BY adc_fp, vec_id) AS rnk
          FROM totals)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk, adc_fp
        FROM ranked WHERE rnk <= {k}
    """


def ann_ivfpq_recall_oracle_sql(n_queries: int = 8, k: int = 10,
                                stride: int = 37, nprobe: int = 6,
                                max_centroids: int = 4096,
                                m: int = DEFAULT_M, kc: int = DEFAULT_KC,
                                iters: int = DEFAULT_ITERS,
                                dim: int = _DIM) -> str:
    """DuckDB twin of ``ann_ivfpq_recall``: brute and IVF-PQ top-k as
    subselects, LEFT JOIN overlap census, identical f64 recall divide."""
    from biomedical_el_ray.pipelines.ann import ann_brute_oracle_sql

    brute = ann_brute_oracle_sql(n_queries, k)
    ivfpq = ann_ivfpq_oracle_sql(
        n_queries, k, stride, nprobe, max_centroids, m, kc, iters, dim)
    return f"""
        SELECT b.q_vec_id,
               CAST(count(*) AS BIGINT) AS n_brute,
               CAST(count(l.vec_id) AS BIGINT) AS n_overlap,
               CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall_r
        FROM ({brute}) b
        LEFT JOIN ({ivfpq}) l
          ON l.q_vec_id = b.q_vec_id AND l.vec_id = b.vec_id
        GROUP BY 1
    """

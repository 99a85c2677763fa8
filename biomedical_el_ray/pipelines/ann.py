"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the baseline: the (small) query matrix is
broadcast once with ``ray.put`` and every batch does one numpy matmul
against it — exactly the reference's all-candidate scoring
(/root/reference/modeling_e2e_span.py:227-232, run_e2e_span.py:343-366)
but batched and streaming instead of one-document-at-a-time.

Two scale paths shrink the candidate set per query:

* ``ann_lsh_topk`` — random-hyperplane sign buckets (approximate; recall
  measured in tests against brute force).
* ``ann_ivf_topk`` — IVF-flat: a deterministic coarse quantizer (every
  ``stride``-th vector is a centroid), inverted lists by nearest
  centroid, queries probe the ``nprobe`` closest lists.  The centroid
  rule is relational, so this variant is DuckDB-oracle exact.

Both reduce with a groupby so no score matrix ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from biomedical_el_ray.sources.readers import read_table


def _emb_matrix(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy flatten
    (float32 -> float64 widening is exact, matching DuckDB's DOUBLE[] cast)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (
        col.flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(len(col), -1)
    )


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """First ``n_queries`` vectors, via parquet predicate pushdown — only
    row groups that can contain them leave storage (the driver never
    reads the full table, however large it grows)."""
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    qids = np.asarray(t["vec_id"].to_pylist())
    Q = _emb_matrix(t["embedding"])
    order = np.argsort(qids)
    return qids[order], Q[order]


class _BruteScorer:
    """Actor: holds the broadcast query matrix; emits per-batch top-k rows."""

    def __init__(self, qids_ref, qmat_ref, k: int):
        self.qids = ray.get(qids_ref) if isinstance(qids_ref, ray.ObjectRef) else qids_ref
        Q = ray.get(qmat_ref) if isinstance(qmat_ref, ray.ObjectRef) else qmat_ref
        self.Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        self.Qraw = Q
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _emb_matrix(t["embedding"])
        # cosine = (q . e) / (|q| |e|), computed like the oracle (no pre-norm
        # of e so float ops match list_cosine_similarity exactly)
        num = self.Qraw @ E.T                                  # (nq, n)
        den = np.linalg.norm(self.Qraw, axis=1)[:, None] * np.linalg.norm(E, axis=1)[None, :]
        sim = num / np.maximum(den, 1e-300)
        out_q, out_v, out_s = [], [], []
        k = self.k
        for qi, qid in enumerate(self.qids):
            row = sim[qi]
            mask = ids != qid
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            # per-batch partial top-k (ties -> smaller vec_id), reduced later
            take = cand[np.lexsort((ids[cand], -row[cand]))][:k]
            out_q.extend([qid] * len(take))
            out_v.extend(ids[take].tolist())
            out_s.extend(row[take].tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_v, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )


def _sim_r(t: pa.Table) -> pa.Table:
    """Append sim_r = round(sim, 6) (numpy half-even, matching the prior
    pandas merge bit-for-bit)."""
    sim = t["sim"].to_numpy(zero_copy_only=False)
    return t.append_column("sim_r", pa.array(np.round(sim, 6), pa.float64()))


def _final_topk_ds(partial, k: int):
    """Arrow per-query top-k reduce: (q_vec_id, vec_id, rnk, sim_r)."""
    from biomedical_el_ray.util import grouped_topk_arrow

    return grouped_topk_arrow(
        partial, "q_vec_id",
        [("sim", "descending"), ("vec_id", "ascending")], k,
        derive=_sim_r, out_cols=["q_vec_id", "vec_id", "rnk", "sim_r"],
    )


def ann_brute_topk(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Global top-k cosine neighbors for the first ``n_queries`` vectors:
    (q_vec_id, vec_id, rnk, sim_r)."""
    qids, Q = _load_queries(sf_dir, n_queries)
    qids_ref, qmat_ref = ray.put(qids), ray.put(Q)
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    partial = emb.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={"qids_ref": qids_ref, "qmat_ref": qmat_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )
    return _final_topk_ds(partial, k)


def _lsh_planes(dim: int, bits: int, seed: int) -> np.ndarray:
    """Deterministic Rademacher (+-1) hyperplanes from splitmix64.

    Sign-random projections are a valid SimHash family (Charikar 2002
    works for any symmetric sign-random planes, and Achlioptas 2003 shows
    +-1 entries preserve the JL guarantees of Gaussians), and unlike
    Gaussian draws the entries are SQL-reproducible, so the LSH variant
    gets a DuckDB oracle (``ann_lsh_oracle_sql``)."""
    from biomedical_el_ray.functions.hashing import splitmix64

    idx = np.arange(dim * bits, dtype=np.uint64) + np.uint64(seed)
    return np.where(splitmix64(idx) & np.uint64(1), 1.0, -1.0).reshape(dim, bits)


def ann_lsh_topk(sf_dir: str, n_queries: int = 8, k: int = 10, bits: int = 8,
                 seed: int = 0x5EED0A):
    """LSH-bucketed ANN: only vectors within Hamming distance 1 of a
    query's sign-bucket (own bucket + all 1-bit flips, multi-probe) are
    scored.  Approximate; recall is measured in tests against
    ``ann_brute_topk``; results are DuckDB-oracle exact for the bucket
    semantics (``ann_lsh_oracle_sql``)."""
    qids, Q = _load_queries(sf_dir, n_queries)
    dim = Q.shape[1]
    planes = _lsh_planes(dim, bits, seed)

    def bucket_of(X: np.ndarray) -> np.ndarray:
        signs = (X @ planes > 0).astype(np.uint64)
        return signs @ (np.uint64(1) << np.arange(bits, dtype=np.uint64))

    qb = bucket_of(Q)
    # probe set per query: own bucket + all 1-bit flips (multi-probe LSH),
    # flattened to parallel sorted arrays for vectorized bucket lookup
    probes: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        bs = [int(b)] + [int(b) ^ (1 << j) for j in range(bits)]
        for bb in bs:
            probes.setdefault(bb, []).append(qi)
    pb_keys = np.array(sorted(probes), dtype=np.int64)
    pb_lens = np.array([len(probes[int(b)]) for b in pb_keys], dtype=np.int64)
    pb_offs = np.cumsum(pb_lens) - pb_lens
    pb_qis = np.concatenate([np.array(probes[int(b)], np.int64) for b in pb_keys])
    probes_ref = ray.put((pb_keys, pb_lens, pb_offs, pb_qis))
    qids_ref, qmat_ref = ray.put(qids), ray.put(Q)

    class _LshScorer:
        def __init__(self):
            self.pb_keys, self.pb_lens, self.pb_offs, self.pb_qis = ray.get(probes_ref)
            self.qids = ray.get(qids_ref)
            Qm = ray.get(qmat_ref)
            self.Q = Qm
            self.qnorm = np.linalg.norm(Qm, axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            """Vectorized: map each row's bucket to its probe-query slice,
            expand (row, query) pairs with repeat/arange arithmetic, score
            all pairs in ONE einsum — no per-row or per-pair Python."""
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            E = _emb_matrix(t["embedding"])
            eb = bucket_of(E).astype(np.int64)
            pos = np.searchsorted(self.pb_keys, eb)
            posc = np.minimum(pos, len(self.pb_keys) - 1)
            hit = self.pb_keys[posc] == eb
            rows0 = np.flatnonzero(hit)
            nq = self.pb_lens[posc[rows0]]
            rows = np.repeat(rows0, nq)
            base = self.pb_offs[posc[rows0]]
            cum = np.cumsum(nq) - nq
            qis = self.pb_qis[
                np.arange(len(rows), dtype=np.int64) - np.repeat(cum, nq)
                + np.repeat(base, nq)
            ]
            keep = ids[rows] != self.qids[qis]
            rows, qis = rows[keep], qis[keep]
            enorm = np.linalg.norm(E, axis=1)
            sim = np.einsum("ij,ij->i", self.Q[qis], E[rows]) / np.maximum(
                self.qnorm[qis] * enorm[rows], 1e-300
            )
            return pa.Table.from_arrays(
                [
                    pa.array(self.qids[qis], pa.int64()),
                    pa.array(ids[rows], pa.int64()),
                    pa.array(sim, pa.float64()),
                ],
                names=["q_vec_id", "vec_id", "sim"],
            )

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    partial = emb.map_batches(
        _LshScorer, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096, concurrency=(1, 8),
    )
    return _final_topk_ds(partial, k)


class _IvfScorer:
    """Actor: broadcast centroids + probe matrix; per batch one assignment
    matmul, a boolean probe gather and one pair einsum — no per-row work."""

    def __init__(self, state_ref):
        self.qids, self.Q, self.C, self.probe = (
            ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        )
        self.qnorm = np.linalg.norm(self.Q, axis=1)
        self.cnorm = np.maximum(np.linalg.norm(self.C, axis=1), 1e-300)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _emb_matrix(t["embedding"])
        enorm = np.linalg.norm(E, axis=1)
        # nearest centroid per vector (ties -> smaller centroid index,
        # np.argmax keeps the first max and C is sorted by centroid id)
        cs = (E @ self.C.T) / np.maximum(enorm[:, None] * self.cnorm[None, :], 1e-300)
        asn = np.argmax(cs, axis=1)
        M = self.probe[asn]                      # (n, nq) bool: row in probe list
        rows, qis = np.nonzero(M)
        keep = ids[rows] != self.qids[qis]
        rows, qis = rows[keep], qis[keep]
        sim = np.einsum("ij,ij->i", self.Q[qis], E[rows]) / np.maximum(
            self.qnorm[qis] * enorm[rows], 1e-300
        )
        return pa.Table.from_arrays(
            [
                pa.array(self.qids[qis], pa.int64()),
                pa.array(ids[rows], pa.int64()),
                pa.array(sim, pa.float64()),
            ],
            names=["q_vec_id", "vec_id", "sim"],
        )


def ann_ivf_topk(sf_dir: str, n_queries: int = 8, k: int = 10,
                 stride: int = 37, nprobe: int = 6,
                 max_centroids: int = 4096):
    """IVF-flat ANN: (q_vec_id, vec_id, rnk, sim_r), oracle-exact.

    Coarse quantizer = every ``stride``-th vector with
    ``vec_id < stride * max_centroids`` — a relational centroid rule
    standing in for an offline sampled-kmeans codebook; swap the centroid
    Dataset for a trained codebook at scale.  The cap bounds the
    broadcast codebook and the per-batch assignment matmul regardless of
    table size (without it the codebook grows as N/stride and a 10^9-row
    table would broadcast a multi-GB matrix); at 100 TB choose
    stride ~ N / max_centroids so the codebook samples the whole id
    range.  Centroid selection runs distributed (filter inside
    ``map_batches``) and only the capped codebook rows are collected;
    vectors are assigned to their max-cosine centroid and queries probe
    the ``nprobe`` nearest inverted lists.
    """
    qids, Q = _load_queries(sf_dir, n_queries)
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cids, C = _stride_codebook(emb, stride, max_centroids)
    return _ivf_search(emb, qids, Q, cids, C, k=k, nprobe=nprobe)


def _stride_codebook(emb, stride: int, max_centroids: int):
    """Relational coarse codebook: every ``stride``-th vector with
    ``vec_id < stride * max_centroids``; selection runs distributed,
    only the capped codebook rows are collected.  Returns
    (cids sorted, C float64 matrix in cid order)."""
    cid_cap = stride * max_centroids

    def _cfilter(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % stride == 0) & (ids < cid_cap)))

    # bounded collect: <= N/stride rows (the centroid codebook, not the table)
    cent_rows = emb.map_batches(
        _cfilter, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    cids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows])
    corder = np.argsort(cids)
    return cids[corder], C[corder]


def _probe_matrix(qids, Q, cids, C, nprobe: int) -> np.ndarray:
    """(centroid, query) bool probe mask: the ``nprobe`` max-cosine
    centroids per query (ties -> smaller centroid id)."""
    qc = (Q @ C.T) / np.maximum(
        np.linalg.norm(Q, axis=1)[:, None]
        * np.maximum(np.linalg.norm(C, axis=1), 1e-300)[None, :],
        1e-300,
    )
    nprobe_eff = min(nprobe, len(cids))
    probe = np.zeros((len(cids), len(qids)), dtype=bool)
    for qi in range(len(qids)):
        order = np.lexsort((cids, -qc[qi]))[:nprobe_eff]
        probe[order, qi] = True
    return probe


def _ivf_search(emb, qids, Q, cids, C, k: int, nprobe: int):
    """Shared IVF probe + score + reduce over a given codebook ``C``
    (rows sorted by ``cids``)."""
    probe = _probe_matrix(qids, Q, cids, C, nprobe)
    state_ref = ray.put((qids, Q, C, probe))
    partial = emb.map_batches(
        _IvfScorer,
        fn_constructor_kwargs={"state_ref": state_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )
    return _final_topk_ds(partial, k)


def ann_ivf_trained_topk(sf_dir: str, n_queries: int = 8, k: int = 10,
                         n_centroids: int = 8, iters: int = 2,
                         nprobe: int = 4):
    """IVF-flat over a codebook TRAINED by the distributed Lloyd loop
    (``pipelines.kmeans.fit_kmeans``) instead of the relational stride
    rule — the exact swap-in ``ann_ivf_topk`` documents.  The trained
    centroids are fixed-point integers; search converts them back to
    float once on the driver and reuses the stride variant's probe /
    score / reduce path unchanged.  Approximate by construction; recall
    vs ``ann_brute_topk`` is measured in tests."""
    from biomedical_el_ray.pipelines.kmeans import SCALE, fit_kmeans

    qids, Q = _load_queries(sf_dir, n_queries)
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cids, cmat, _counts = fit_kmeans(emb, k=n_centroids, iters=iters)
    C = cmat.astype(np.float64) / float(SCALE)
    return _ivf_search(emb, qids, Q, cids, C, k=k, nprobe=nprobe)


def ann_lsh_oracle_sql(n_queries: int = 8, k: int = 10, bits: int = 8,
                       seed: int = 0x5EED0A, dim: int = 64) -> str:
    """DuckDB SQL equivalent of ``ann_lsh_topk`` over the ``embeddings``
    view: sign buckets from the same splitmix-derived +-1 planes
    (embedded as literal vectors), multi-probe membership =
    ``bit_count(xor(buckets)) <= 1``, then exact cosine ranking."""
    planes = _lsh_planes(dim, bits, seed)
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(float(v)) for v in planes[:, b])}]) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
        WITH bv AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings),
        bk AS (
          SELECT vec_id, e, {bit_terms} AS bucket
          FROM bv),
        q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb
              FROM bk WHERE vec_id < {n_queries}),
        s AS (
          SELECT q.qid AS q_vec_id, v.vec_id,
                 list_cosine_similarity(q.qe, v.e) AS sim
          FROM q JOIN bk v
            ON bit_count(xor(CAST(v.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= 1
           AND v.vec_id <> q.qid),
        r AS (
          SELECT q_vec_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_vec_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM s)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk,
               round(sim, 6) AS sim_r
        FROM r WHERE rnk <= {k}
    """


def ann_brute_oracle_sql(n_queries: int = 8, k: int = 10) -> str:
    """DuckDB SQL equivalent of ``ann_brute_topk``: exact cosine over the
    full cross product, (sim DESC, vec_id) ranking."""
    return f"""
        WITH q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < {n_queries}),
        s AS (
          SELECT q.qid AS q_vec_id, e.vec_id,
                 list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.qid),
        r AS (
          SELECT q_vec_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_vec_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM s)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk,
               round(sim, 6) AS sim_r
        FROM r WHERE rnk <= {k}
    """


def ann_recall_eval(sf_dir: str, n_queries: int = 8, k: int = 10,
                    bits: int = 8, seed: int = 0x5EED0A):
    """(q_vec_id, n_brute, n_overlap, recall_r) — recall@k of the
    LSH-bucketed ANN against the brute-force exact top-k, per query —
    the standard ANN quality gate (every production ANN deployment
    tracks recall vs a ground-truth sample before trusting the index).
    ``recall_r`` = |lsh ∩ brute| / |brute| as one f64 divide.

    Scale shape: both inputs are the proven distributed top-k pipelines;
    their outputs are aggregate-scale (n_queries·k rows), so the overlap
    join and per-query reduce run driver-side on bounded frames.  At
    100 TB the ground-truth side stays a SAMPLE of queries by
    construction — recall estimation never needs the full corpus ranked.
    """
    brute = ann_brute_topk(sf_dir, n_queries, k).to_pandas()
    lsh = ann_lsh_topk(sf_dir, n_queries, k, bits, seed).to_pandas()
    m = brute.merge(
        lsh[["q_vec_id", "vec_id"]].assign(hit=1),
        on=["q_vec_id", "vec_id"], how="left",
    )
    g = (
        m.groupby("q_vec_id")
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


def ann_recall_eval_oracle_sql(n_queries: int = 8, k: int = 10,
                               bits: int = 8, seed: int = 0x5EED0A,
                               dim: int = 64) -> str:
    """DuckDB twin: the two proven top-k queries as subselects, a LEFT
    JOIN overlap census, the identical f64 recall divide."""
    brute = ann_brute_oracle_sql(n_queries, k)
    lsh = ann_lsh_oracle_sql(n_queries, k, bits, seed, dim)
    return f"""
        SELECT b.q_vec_id,
               CAST(count(*) AS BIGINT) AS n_brute,
               CAST(count(l.vec_id) AS BIGINT) AS n_overlap,
               CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall_r
        FROM ({brute}) b
        LEFT JOIN ({lsh}) l
          ON l.q_vec_id = b.q_vec_id AND l.vec_id = b.vec_id
        GROUP BY 1
    """


def ann_ivf_oracle_sql(n_queries: int = 8, k: int = 10,
                       stride: int = 37, nprobe: int = 6,
                       max_centroids: int = 4096) -> str:
    """DuckDB SQL equivalent of ``ann_ivf_topk`` over the ``embeddings``
    view (same centroid rule incl. the codebook cap, assignment, probing
    and ranking)."""
    return f"""
        WITH cent AS (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
          FROM embeddings
          WHERE vec_id % {stride} = 0
            AND vec_id < {stride * max_centroids}),
        asn AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), c.ce) DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
        q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < {n_queries}),
        qprobe AS (
          SELECT qid, cid FROM (
            SELECT q.qid, c.cid,
                   row_number() OVER (
                     PARTITION BY q.qid
                     ORDER BY list_cosine_similarity(q.qe, c.ce) DESC,
                              c.cid) AS rn
            FROM q CROSS JOIN cent c) WHERE rn <= {nprobe}),
        s AS (
          SELECT qp.qid AS q_vec_id, a.vec_id,
                 list_cosine_similarity(
                   q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
          FROM qprobe qp
          JOIN asn a ON a.cid = qp.cid AND a.vec_id <> qp.qid
          JOIN q ON q.qid = qp.qid
          JOIN embeddings e ON e.vec_id = a.vec_id),
        r AS (
          SELECT q_vec_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_vec_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM s)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk,
               round(sim, 6) AS sim_r
        FROM r WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# Label centroids (grouped vector mean — the codebook-training reduce)
# ---------------------------------------------------------------------------

def _centroid_partial(t: pa.Table) -> pa.Table:
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _emb_matrix(t["embedding"])
    # fixed-point per element: one exact f64 multiply + floor(+0.5), so
    # per-label sums are integers and shuffle-order-independent
    fp = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
    order = np.argsort(lab, kind="stable")
    lab, fp = lab[order], fp[order]
    first = np.ones(lab.size, dtype=bool)
    first[1:] = lab[1:] != lab[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(fp, starts, axis=0)
    counts = np.diff(np.append(starts, lab.size))
    g, d = sums.shape
    return pa.Table.from_arrays(
        [
            pa.array(np.repeat(lab[starts], d)),
            pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
            pa.array(sums.ravel()),
            pa.array(np.repeat(counts.astype(np.int64), d)),
        ],
        names=["label", "dim", "sum_fp", "n_vecs"],
    )


def label_centroids(sf_dir: str):
    """(label, dim, n_vecs, sum_fp, mean_fp) — per-label embedding
    centroid, flat one-row-per-dimension.  The grouped-vector-mean reduce
    that trains an IVF/k-means codebook (the swap-in point
    ``ann_ivf_topk`` documents) expressed as partial per-batch sums +
    one tiny (label, dim) groupby: the shuffle moves labels x dim rows
    per block, never the vectors.

    Elements are fixed-point (floor(x * 1e6 + 0.5)) so partial sums are
    exact integers in any combine order; the mean is ONE correctly-
    rounded f64 division of those integers, so numpy and DuckDB agree
    bit-for-bit (DuckDB's integer ``//`` truncates while numpy floors —
    division is kept in float to avoid that trap on negative sums)."""
    from ray.data.aggregate import Sum

    emb = read_table(sf_dir, "embeddings", ["embedding", "label"])
    agg = (
        emb.map_batches(_centroid_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_fp"), Sum("n_vecs"))
    )

    def _final(t: pa.Table) -> pa.Table:
        s = t["sum(sum_fp)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["sum(n_vecs)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t["label"], t["dim"],
                pa.array(n), pa.array(s),
                pa.array(s.astype(np.float64) / n),
            ],
            names=["label", "dim", "n_vecs", "sum_fp", "mean_fp"],
        )

    return agg.map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)


def label_centroids_oracle_sql(emb_rel: str = "embeddings") -> str:
    return f"""
        WITH ex AS (
          SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000
                            + 0.5) AS BIGINT) AS fp
          FROM {emb_rel})
        SELECT CAST(label AS BIGINT) AS label,
               CAST(dim AS BIGINT) AS dim,
               count(*) AS n_vecs,
               CAST(sum(fp) AS BIGINT) AS sum_fp,
               CAST(sum(fp) AS DOUBLE) / count(*) AS mean_fp
        FROM ex
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# int8 symmetric quantization (the embedding-store compression transform)
# ---------------------------------------------------------------------------

def _quantize_batch(t: pa.Table) -> pa.Table:
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _emb_matrix(t["embedding"])
    n, d = m.shape
    ma = np.abs(m).max(axis=1)
    # q = floor(x*127/ma + 0.5): multiply-then-divide in f64, the same op
    # order the oracle writes, so both sides round identically; an
    # all-zero vector quantizes to zeros with scale 0
    safe = np.where(ma == 0.0, 1.0, ma)
    q = np.floor(m * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    q[ma == 0.0, :] = 0
    scale = np.where(ma == 0.0, 0.0, ma / 127.0)
    return pa.Table.from_arrays(
        [
            pa.array(np.repeat(vid, d)),
            pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            pa.array(q.ravel()),
            pa.array(np.repeat(scale, d)),
        ],
        names=["vec_id", "dim", "qval", "scale"],
    )


def quantize_embeddings(sf_dir: str):
    """(vec_id, dim, qval, scale) — per-vector symmetric int8
    quantization of the embeddings table (qval in [-127, 127],
    dequant = qval * scale), flat one-row-per-dimension so the oracle
    hash covers every cell.  The storage transform a 100-TB embedding
    store runs before indexing: 4x smaller vectors, one streaming
    ``map_batches`` pass, no shuffle at all.  The max-|x| scale and the
    quantized cell are each ONE f64 op chain written identically in
    numpy and SQL, so the oracle matches bit-for-bit."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return emb.map_batches(
        _quantize_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def quantize_embeddings_oracle_sql(emb_rel: str = "embeddings") -> str:
    return f"""
        WITH mm AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(
                   embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
          FROM {emb_rel}),
        ex AS (
          SELECT vec_id, ma,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM mm)
        SELECT vec_id,
               CAST(dim AS BIGINT) AS dim,
               CAST(CASE WHEN ma = 0 THEN 0
                         ELSE floor(x * 127 / ma + 0.5) END AS BIGINT)
                 AS qval,
               CASE WHEN ma = 0 THEN 0.0 ELSE ma / 127 END AS scale
        FROM ex
    """


# ---------------------------------------------------------------------------
# kNN self-join (every row is a query)
# ---------------------------------------------------------------------------

KNN_JOIN_MAX_INDEX = 1_000_000


class _KnnJoiner:
    """Actor: holds the broadcast index matrix (vec_id-ascending); each
    batch is one matmul + a stable argsort, emitting final top-k rows —
    a pure map, no shuffle or reduce anywhere."""

    def __init__(self, index_ref, k: int):
        ids, I = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.ids = ids                      # ascending
        self.I = I
        self.In = np.linalg.norm(I, axis=1)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        qids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _emb_matrix(t["embedding"])
        num = Q @ self.I.T                                     # (nb, ni)
        den = np.linalg.norm(Q, axis=1)[:, None] * self.In[None, :]
        sim = num / np.maximum(den, 1e-300)
        # stable argsort on -sim: equal sims keep index order, and the
        # index is vec_id-ascending, so ties break to the smaller vec_id —
        # exactly SQL's ORDER BY sim DESC, vec_id
        k = self.k
        order = np.argsort(-sim, axis=1, kind="stable")[:, : k + 1]
        sel_ids = self.ids[order]                              # (nb, k+1)
        rows = np.arange(len(qids))[:, None]
        sel_sim = sim[rows, order]
        # drop self per row (stable False-first argsort = left compaction)
        is_self = sel_ids == qids[:, None]
        shift = np.argsort(is_self, axis=1, kind="stable")[:, :k]
        sel_ids = sel_ids[rows, shift]
        sel_sim = np.take_along_axis(sel_sim, shift, axis=1)
        valid = ~np.take_along_axis(is_self, shift, axis=1)
        # rows near the end of a tiny index may have < k neighbors
        kk = sel_ids.shape[1]
        n_idx_other = len(self.ids) - np.isin(qids, self.ids).astype(np.int64)
        rnk = np.broadcast_to(
            np.arange(1, kk + 1, dtype=np.int64), sel_ids.shape
        )
        valid = valid & (rnk <= n_idx_other[:, None])
        m = valid.ravel()
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(qids, kk)[m]),
                pa.array(sel_ids.ravel()[m]),
                pa.array(rnk.ravel()[m]),
                pa.array(np.round(sel_sim.ravel()[m], 6)),
            ],
            names=["q_vec_id", "vec_id", "rnk", "sim_r"],
        )


def knn_join(sf_dir: str, k: int = 5,
             max_index_rows: int = KNN_JOIN_MAX_INDEX):
    """Top-k cosine neighbors for EVERY vector (self excluded):
    (q_vec_id, vec_id, rnk, sim_r).

    The embed-and-join primitive of corpus-scale near-dup detection and
    retrieval mining: the index side is broadcast once (``ray.put``) and
    the query side streams through a single ``map_batches`` — each batch
    is one BLAS matmul plus a stable argsort, and because every query row
    sees the whole index, the result needs NO groupby reduce at all.

    Scale contract: the broadcast index is capped at ``max_index_rows``
    (loud error past it).  Past the cap, swap the dense index for the
    trained IVF lists (``ann_ivf_trained_topk`` machinery): partition the
    index by centroid, re-key queries by their ``nprobe`` probe lists and
    the same in-task matmul runs per (probe, block) pair."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    # index build streams Arrow batches to the driver (no per-row Python
    # objects); the cap bounds driver memory, checked as batches arrive
    id_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    n = 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=32768):
        n += b.num_rows
        if n > max_index_rows:
            raise ValueError(
                f"knn_join index side exceeds cap {max_index_rows} rows; "
                "use the IVF-partitioned plan"
            )
        id_parts.append(
            b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        mat_parts.append(_emb_matrix(b["embedding"]))
    ids = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
    I = np.vstack(mat_parts) if mat_parts else np.empty((0, 0))
    o = np.argsort(ids)
    index_ref = ray.put((ids[o], I[o]))
    return emb.map_batches(
        _KnnJoiner,
        fn_constructor_kwargs={"index_ref": index_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, 8),
    )


def knn_join_oracle_sql(k: int = 5) -> str:
    """Exact DuckDB twin of ``knn_join`` over the ``embeddings`` view."""
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (
          SELECT a.vec_id AS q_vec_id, b.vec_id,
                 list_cosine_similarity(a.v, b.v) AS sim
          FROM e a JOIN e b ON b.vec_id <> a.vec_id),
        r AS (
          SELECT q_vec_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_vec_id
                                    ORDER BY sim DESC, vec_id) AS rnk
          FROM s)
        SELECT q_vec_id, vec_id, CAST(rnk AS BIGINT) AS rnk,
               round(sim, 6) AS sim_r
        FROM r WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# Embedding covariance + PCA (dimensionality analysis over the vector table)
# ---------------------------------------------------------------------------

_COV_SCALE = 1_000_000


def _cov_max_rows(scale: int) -> int:
    """int64 partial-sum safety bound, derived from ``scale``: with
    |x| <= ~1, Sxy <= n * scale^2, so n <= 2^62 / scale^2 keeps every
    cross-block sum under 2^62 (headroom below 2^63 for the groupby
    combine).  Each 10x reduction in scale buys 100x more rows, and the
    bound moves with it — so the "lower scale" advice in the error
    message is actionable (ADVICE r4).  A scale whose square exceeds
    2^62 yields bound 0: even ONE row's in-block q*q product would wrap
    int64, so every non-empty corpus is rejected."""
    return (1 << 62) // (int(scale) * int(scale))


def _cov_partials(sf_dir: str, scale: int):
    """One streaming pass -> exact integer moment partials:
    (da, db, sxy) upper-triangle product sums + (da, da==-1 rows carry
    sx, n).  Per-block partials are int64 (bounded by _cov_max_rows(scale),
    checked BEFORE the pass so no silent wraparound); the global reduce
    is one bounded groupby over <= 2+dim(dim+1)/2 keys."""
    from biomedical_el_ray.util import drop_empty_blocks

    emb = read_table(sf_dir, "embeddings", ["embedding"])
    n_total = emb.count()  # parquet metadata count — no data pass
    max_rows = _cov_max_rows(scale)
    if n_total > max_rows:
        raise ValueError(
            f"embedding_covariance int64 partial bound exceeded "
            f"({n_total} rows > {max_rows} at scale={scale}); lower "
            "`scale` (10x buys 100x rows) or shard dimensions")

    def _partial(t: pa.Table) -> pa.Table:
        E = _emb_matrix(t["embedding"])
        Q = np.floor(E * float(scale) + 0.5).astype(np.int64)
        d = Q.shape[1]
        G = Q.T @ Q                       # (d, d) int64, exact in-block
        sx = Q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        da = np.concatenate([iu, np.arange(d), [-2]])
        db = np.concatenate([ju, np.full(d, -1), [-2]])
        v = np.concatenate([G[iu, ju], sx, [Q.shape[0]]])
        return pa.table({
            "da": pa.array(da.astype(np.int64)),
            "db": pa.array(db.astype(np.int64)),
            "v": pa.array(v.astype(np.int64)),
        })

    agg = drop_empty_blocks(
        emb.map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby(["da", "db"]).sum("v")
    ).take_all()
    sxy: dict[tuple[int, int], int] = {}
    sx: dict[int, int] = {}
    n = 0
    for r in agg:
        da, db, v = int(r["da"]), int(r["db"]), int(r["sum(v)"])
        if da == -2:
            n = v
        elif db == -1:
            sx[da] = v
        else:
            sxy[(da, db)] = v
    return n, sx, sxy


def embedding_covariance(sf_dir: str, scale: int = _COV_SCALE):
    """(dim_a, dim_b, n_rows, cov_r) — the upper-triangle covariance
    matrix of the ``embeddings`` table from exact integer moments:
    cov = (n·Sxy − Sx·Sy) / n² on fixed-point ``floor(x·scale + 0.5)``
    values, de-scaled with one identical f64 divide on both sides.  The
    first step of PCA / whitening / drift analysis over a vector corpus,
    as one streaming pass.

    Scale shape: per-block int64 moment partials (the row bound is
    checked loudly BEFORE the pass — no silent wraparound), one bounded
    groupby over ~d²/2 keys; only the d×d moment table reaches the
    driver.  The exact-HUGEINT final arithmetic makes the DuckDB twin bit-exact.
    """
    n, sx, sxy = _cov_partials(sf_dir, scale)
    das, dbs, covs = [], [], []
    for (da, db), s in sorted(sxy.items()):
        num = n * s - sx[da] * sx[db]      # exact Python int (HUGEINT twin)
        cov = float(num) / (float(n) * float(n)) / float(scale * scale)
        das.append(da)
        dbs.append(db)
        covs.append(round(cov, 12))
    return pa.table({
        "dim_a": pa.array(das, pa.int64()),
        "dim_b": pa.array(dbs, pa.int64()),
        "n_rows": pa.array([n] * len(das), pa.int64()),
        "cov_r": pa.array(covs, pa.float64()),
    })


def embedding_covariance_oracle_sql(scale: int = _COV_SCALE,
                                    dim: int = 64) -> str:
    """DuckDB twin: unnest to (vec_id, dim, q) fixed point, a self-join
    upper-triangle product sum as HUGEINT, the identical final f64
    sequence (CAST num, divide by n², de-scale, round 12)."""
    return f"""
        WITH ce AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
        cq AS MATERIALIZED (
          SELECT vec_id, r.i AS dim,
                 CAST(floor(emb[r.i + 1] * {scale} + 0.5) AS HUGEINT) AS q
          FROM ce, range({dim}) r(i)),
        cs AS (SELECT dim, sum(q) AS sx FROM cq GROUP BY dim),
        cn AS (SELECT count(*) AS n FROM ce),
        cx AS (
          SELECT a.dim AS dim_a, b.dim AS dim_b, sum(a.q * b.q) AS sxy
          FROM cq a JOIN cq b
            ON a.vec_id = b.vec_id AND a.dim <= b.dim
          GROUP BY 1, 2)
        SELECT CAST(x.dim_a AS BIGINT) AS dim_a,
               CAST(x.dim_b AS BIGINT) AS dim_b,
               CAST(cn.n AS BIGINT) AS n_rows,
               round(CAST(cn.n * x.sxy - sa.sx * sb.sx AS DOUBLE)
                     / (CAST(cn.n AS DOUBLE) * CAST(cn.n AS DOUBLE))
                     / CAST({scale}::HUGEINT * {scale} AS DOUBLE),
                     12) AS cov_r
        FROM cx x
        JOIN cs sa ON sa.dim = x.dim_a
        JOIN cs sb ON sb.dim = x.dim_b
        CROSS JOIN cn
    """


def pca_components(sf_dir: str, n_components: int = 8,
                   scale: int = _COV_SCALE):
    """(component, dim, loading_r, explained_var_r) — top principal
    components of the embedding table, computed from the SAME exact
    integer moment partials as ``embedding_covariance`` (one streaming
    pass; the eigendecomposition is driver math on the bounded d×d
    matrix — the fs_em_weights pattern: distributed work is only the
    census).  Deterministic: the covariance matrix is exact, eigh is
    deterministic on it, and each eigenvector's sign is fixed so its
    largest-|loading| entry is positive (first index on ties).

    Rows-only for the driver (eigendecomposition is the iterative
    carve-out); pytest pins it against numpy PCA on the raw table and
    checks orthonormality + variance ordering.
    """
    n, sx, sxy = _cov_partials(sf_dir, scale)
    d = max(da for da, _ in sxy) + 1
    C = np.zeros((d, d), dtype=np.float64)
    for (da, db), s in sxy.items():
        num = n * s - sx[da] * sx[db]
        C[da, db] = C[db, da] = (
            float(num) / (float(n) * float(n)) / float(scale * scale))
    w, V = np.linalg.eigh(C)              # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps, dims, loads, evs = [], [], [], []
    total = float(np.trace(C))
    for ci, ei in enumerate(order):
        vec = V[:, ei]
        am = int(np.argmax(np.abs(vec)))
        if vec[am] < 0:
            vec = -vec
        for di in range(d):
            comps.append(ci)
            dims.append(di)
            loads.append(round(float(vec[di]), 9))
            evs.append(round(float(w[ei]) / total if total else 0.0, 9))
    return pa.table({
        "component": pa.array(comps, pa.int64()),
        "dim": pa.array(dims, pa.int64()),
        "loading_r": pa.array(loads, pa.float64()),
        "explained_var_r": pa.array(evs, pa.float64()),
    })


def embedding_drift(sf_dir: str, scale: int = _COV_SCALE):
    """(n_a, n_b, mean_l2_r, cov_fro_r) — distribution-shift check
    between two deterministic halves of the embedding table (vec_id
    parity — the stand-in for "yesterday's corpus vs today's"): L2
    distance between the half means and Frobenius distance between the
    half covariance matrices, the standard first-order drift monitor a
    vector pipeline runs before trusting an index or a trained codebook
    against new data.

    Scale shape: ONE streaming pass emits per-block exact integer moment
    partials tagged by slice (2·(d + d(d+1)/2 + 1) keys), one bounded
    groupby; all remaining math runs on the two d×d moment tables.  The
    identical f64 op sequence on both sides keeps the DuckDB twin
    bit-exact.
    """
    from biomedical_el_ray.util import drop_empty_blocks

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_total = emb.count()
    max_rows = _cov_max_rows(scale)
    if n_total > max_rows:
        raise ValueError(
            f"embedding_drift int64 partial bound exceeded ({n_total} rows "
            f"> {max_rows} at scale={scale}); lower `scale` or shard "
            "dimensions")

    def _partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = _emb_matrix(t["embedding"])
        Q = np.floor(E * float(scale) + 0.5).astype(np.int64)
        d = Q.shape[1]
        iu, ju = np.triu_indices(d)
        parts = []
        for side in (0, 1):
            Qs = Q[ids % 2 == side]
            G = Qs.T @ Qs
            sx = Qs.sum(axis=0)
            da = np.concatenate([iu, np.arange(d), [-2]])
            db = np.concatenate([ju, np.full(d, -1), [-2]])
            v = np.concatenate([G[iu, ju], sx, [Qs.shape[0]]])
            parts.append(pa.table({
                "side": pa.array(np.full(len(da), side, np.int64)),
                "da": pa.array(da.astype(np.int64)),
                "db": pa.array(db.astype(np.int64)),
                "v": pa.array(v.astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    agg = drop_empty_blocks(
        emb.map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby(["side", "da", "db"]).sum("v")
    ).take_all()
    n = [0, 0]
    sx: list[dict[int, int]] = [{}, {}]
    sxy: list[dict[tuple[int, int], int]] = [{}, {}]
    for r in agg:
        side, da, db = int(r["side"]), int(r["da"]), int(r["db"])
        v = int(r["sum(v)"])
        if da == -2:
            n[side] = v
        elif db == -1:
            sx[side][da] = v
        else:
            sxy[side][(da, db)] = v
    if n[0] == 0 or n[1] == 0:
        # the SQL twin silently returns no rows here; fail loudly instead
        # of a bare ZeroDivisionError (ADVICE r4)
        raise ValueError(
            f"embedding_drift: parity slice empty (n_a={n[0]}, n_b={n[1]}) "
            "— the corpus' vec_ids are all one parity, so there is no "
            "second distribution to compare against")
    d = max(da for da, _ in sxy[0]) + 1
    sc2 = float(scale) * float(scale)
    # each squared term is fixed-pointed (floor(t*1e15 + .5), the nmi_eval
    # pattern) so the SUMS are exact integers — combine-order-free and
    # identical to the SQL twin's BIGINT sums regardless of DuckDB's
    # aggregation order; the final sqrt runs on the identical double
    import math

    mean_fp = 0
    for i in range(d):
        diff = (float(sx[0][i]) / (float(n[0]) * float(scale))
                - float(sx[1][i]) / (float(n[1]) * float(scale)))
        mean_fp += math.floor(diff * diff * 1e15 + 0.5)
    fro_fp = 0
    for (da, db) in sorted(sxy[0]):
        cov = []
        for side in (0, 1):
            num = n[side] * sxy[side][(da, db)] - sx[side][da] * sx[side][db]
            cov.append(float(num) / (float(n[side]) * float(n[side])) / sc2)
        diff = cov[0] - cov[1]
        w = 1.0 if da == db else 2.0
        fro_fp += math.floor(diff * diff * w * 1e15 + 0.5)
    return pa.table({
        "n_a": pa.array([n[0]], pa.int64()),
        "n_b": pa.array([n[1]], pa.int64()),
        "mean_l2_r": pa.array(
            [round(math.sqrt(float(mean_fp) / 1e15), 9)], pa.float64()),
        "cov_fro_r": pa.array(
            [round(math.sqrt(float(fro_fp) / 1e15), 9)], pa.float64()),
    })


def embedding_drift_oracle_sql(scale: int = _COV_SCALE,
                               dim: int = 64) -> str:
    """DuckDB twin: per-parity HUGEINT moments, the identical f64 mean /
    covariance / distance sequence (off-diagonal cells doubled)."""
    return f"""
        WITH de AS (
          SELECT vec_id, vec_id % 2 AS side,
                 CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
        dq AS MATERIALIZED (
          SELECT vec_id, side, r.i AS dim,
                 CAST(floor(emb[r.i + 1] * {scale} + 0.5) AS HUGEINT) AS q
          FROM de, range({dim}) r(i)),
        dn AS (
          SELECT side, count(DISTINCT vec_id) AS n FROM dq GROUP BY side),
        ds_ AS (SELECT side, dim, sum(q) AS sx FROM dq GROUP BY 1, 2),
        dx AS (
          SELECT a.side, a.dim AS da, b.dim AS db, sum(a.q * b.q) AS sxy
          FROM dq a JOIN dq b
            ON a.vec_id = b.vec_id AND a.dim <= b.dim
          GROUP BY 1, 2, 3),
        mdiff AS (
          SELECT CAST(s0.sx AS DOUBLE) / (CAST(n0.n AS DOUBLE) * {scale})
                 - CAST(s1.sx AS DOUBLE) / (CAST(n1.n AS DOUBLE) * {scale})
                 AS diff
          FROM ds_ s0
          JOIN ds_ s1 ON s1.dim = s0.dim AND s1.side = 1
          CROSS JOIN (SELECT n FROM dn WHERE side = 0) n0
          CROSS JOIN (SELECT n FROM dn WHERE side = 1) n1
          WHERE s0.side = 0),
        mean_fp AS (
          SELECT sum(CAST(floor(diff * diff * 1e15 + 0.5) AS BIGINT)) AS v
          FROM mdiff),
        covs AS (
          SELECT x.side, x.da, x.db,
                 CAST(n.n * x.sxy - sa.sx * sb.sx AS DOUBLE)
                 / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE))
                 / CAST({scale}::HUGEINT * {scale} AS DOUBLE) AS cov
          FROM dx x
          JOIN ds_ sa ON sa.side = x.side AND sa.dim = x.da
          JOIN ds_ sb ON sb.side = x.side AND sb.dim = x.db
          JOIN dn n ON n.side = x.side),
        fdiff AS (
          SELECT c0.cov - c1.cov AS diff,
                 CASE WHEN c0.da = c0.db THEN 1.0 ELSE 2.0 END AS w
          FROM covs c0
          JOIN covs c1 ON c1.side = 1 AND c1.da = c0.da AND c1.db = c0.db
          WHERE c0.side = 0),
        fro_fp AS (
          SELECT sum(CAST(floor(diff * diff * w * 1e15 + 0.5) AS BIGINT)) AS v
          FROM fdiff)
        SELECT (SELECT CAST(n AS BIGINT) FROM dn WHERE side = 0) AS n_a,
               (SELECT CAST(n AS BIGINT) FROM dn WHERE side = 1) AS n_b,
               round(sqrt(CAST((SELECT v FROM mean_fp) AS DOUBLE) / 1e15), 9)
                 AS mean_l2_r,
               round(sqrt(CAST((SELECT v FROM fro_fp) AS DOUBLE) / 1e15), 9)
                 AS cov_fro_r
    """

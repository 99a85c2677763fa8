"""Deduplication operators over the ``documents`` table.

The dedup family of a large-scale training-data pipeline, expressed
Ray-Data-first:

* exact dedup        — hash-partition + per-group reduce (SURVEY §2.7 D2)
* byte-set Jaccard   — self-join on coarse blocks, DuckDB-``jaccard``-exact
* MinHash/LSH        — shingle -> signature -> band -> bucket groupby
* SimHash            — 64-bit fingerprints, band-bucket candidates
* embedding near-dup — cosine over the embeddings table within label blocks

Exact/Jaccard/embedding variants have DuckDB oracles; MinHash/SimHash are
verified in pytest against exact shingle-set Jaccard (no SQL equivalent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.functions.hashing import (
    hash64_arrow,
    shingle_hashes,
    splitmix64,
)
from biomedical_el_ray.functions.minhash import minhash_signatures
from biomedical_el_ray.functions.simhash import simhash64
from biomedical_el_ray.functions.textsim import byte_masks, byte_set_jaccard
from biomedical_el_ray.sources.readers import read_table
from biomedical_el_ray.util import drop_empty_blocks, spread


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """Keep-first exact dedup: (doc_id=min per distinct text, n_copies).

    The shuffle key is a 64-bit content hash, not the full text, so the
    exchange moves 8 bytes/row instead of the document body.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _key(t: pa.Table) -> pa.Table:
        h = hash64_arrow(t["text"])
        # int64 view: Arrow groupby on uint64 is fine but int64 is safest
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(h.astype(np.int64))], names=["doc_id", "text_hash"]
        )

    keyed = docs.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)
    agg = keyed.groupby("text_hash").aggregate(
        *_min_count_aggs()
    )
    return agg.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["min(doc_id)"], t["count()"]], names=["doc_id", "n_copies"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _min_count_aggs():
    from ray.data.aggregate import Count, Min

    return Min("doc_id"), Count()


# ---------------------------------------------------------------------------
# byte-set Jaccard near-dup pairs (DuckDB-exact)
# ---------------------------------------------------------------------------

_JAC_SCHEMA = pa.schema(
    [("doc_lo", pa.int64()), ("doc_hi", pa.int64()), ("jac", pa.float64())]
)


def jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                  salt_threshold: int = 256, max_group_size: int = 100_000,
                  counters: dict | None = None):
    """Pairs of docs with identical (lang, source) block and byte-set
    Jaccard >= threshold: (doc_lo, doc_hi, jac).

    jac matches DuckDB ``jaccard(text, text)`` bit-for-bit (byte-set
    semantics).  Blocking on coarse (lang, source) keys is Zipf-hot by
    construction (one (en, web) block can hold most of the corpus), so the
    pairing runs on the shared salted machinery (stages/grouped_pairs.py):
    hot blocks are triangle-salted into O(salt_target^2) sub-groups,
    oversized blocks are dropped AND counted — no block can go quadratic
    inside a single task.
    """
    from biomedical_el_ray.stages.grouped_pairs import grouped_pairs

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def _gkey(t: pa.Table):
        key = pc.binary_join_element_wise(t["lang"], t["source"], "|")
        return hash64_arrow(key).view(np.int64)

    def _prep(t: pa.Table) -> pa.Table:
        masks = byte_masks(t["text"].to_pylist()).astype(np.int64)
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(_gkey(t), pa.int64())]
            + [pa.array(masks[:, j]) for j in range(4)],
            names=["doc_id", "gkey", "m0", "m1", "m2", "m3"],
        )

    prepped = docs.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    # census over a pruned re-read of just the blocking columns: the text
    # payload/byte-mask prep is computed once and streams, never parked
    census = read_table(sf_dir, "documents", ["lang", "source"]).map_batches(
        lambda t: pa.Table.from_arrays([pa.array(_gkey(t), pa.int64())], names=["gkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _score(t: pa.Table, li: np.ndarray, ri: np.ndarray) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        masks = np.stack(
            [t[c].to_numpy(zero_copy_only=False) for c in ("m0", "m1", "m2", "m3")],
            axis=1,
        ).view(np.uint64)
        jac = byte_set_jaccard(masks[li], masks[ri])
        m = jac >= threshold
        li, ri, jac = li[m], ri[m], jac[m]
        lo = np.minimum(ids[li], ids[ri])
        hi = np.maximum(ids[li], ids[ri])
        # no rounding: both engines divide the same two ints -> identical doubles
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
                pa.array(jac, pa.float64()),
            ],
            schema=_JAC_SCHEMA,
        )

    return grouped_pairs(
        prepped,
        _score,
        _JAC_SCHEMA,
        id_col="doc_id",
        salt_threshold=salt_threshold,
        max_group_size=max_group_size,
        counters=counters,
        census_ds=census,
    )


# ---------------------------------------------------------------------------
# MinHash/LSH near-dup candidates (no SQL equivalent; pytest-verified)
# ---------------------------------------------------------------------------

def _collide_partition(t: pa.Table):
    """One hash partition of (bkey, slot, sig, ...) rows -> exactly-once
    colliding index pairs + the per-pair band-equality matrix.

    Same machinery as the linkage pair stage (stages/pairs.py): one keyed
    repartition, in-task sort, contiguous-run pairing, first-shared-slot
    dedup — replaces the old block self-join + pair-groupby (two extra
    exchanges) entirely; even the per-pair shared-band COUNT falls out of
    the signature comparison for free.
    """
    keys = t["bkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    t = t.take(pa.array(order))
    keys = keys[order]
    slot = t["slot"].to_numpy(zero_copy_only=False)
    sigc = t["sig"].combine_chunks()
    sig = sigc.flatten().to_numpy(zero_copy_only=False).reshape(len(sigc), -1)
    n = len(keys)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    li_parts, ri_parts = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        iu, ju = np.triu_indices(m, 1)
        li_parts.append(iu + s)
        ri_parts.append(ju + s)
    if not li_parts:
        return t, np.array([], np.int64), np.array([], np.int64), None
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    eq = sig[li] == sig[ri]
    keep = eq.argmax(axis=1) == slot[li]
    return t, li[keep], ri[keep], eq[keep]


def _band_sig_table(ids: np.ndarray, bh: np.ndarray, extra=None) -> pa.Table:
    """(n, B) uint64 band hashes -> exploded (bkey, slot, doc_id, sig[, ...]).

    Each of a row's B exploded copies carries the FULL band vector ``sig``
    so colliding pairs can be deduped (first-shared-slot) and their shared
    bands counted in-task, with no pair-level shuffle."""
    n, B = bh.shape
    rep_sig = np.repeat(bh, B, axis=0).reshape(-1)  # row i copied B times
    sig_col = pa.ListArray.from_arrays(
        pa.array(np.arange(n * B + 1, dtype=np.int32) * B, pa.int32()),
        pa.array(rep_sig, pa.uint64()),
    )
    id_rep = np.repeat(ids, B)
    cols = [
        pa.array(bh.reshape(-1), pa.uint64()),
        pa.array(np.tile(np.arange(B, dtype=np.int8), n)),
        # int64 doc ids for the documents table; string ids (e.g. conv_id)
        # pass through as-is — _collide_partition never reads this column
        pa.array(id_rep) if ids.dtype == object else pa.array(id_rep, pa.int64()),
        sig_col,
    ]
    names = ["bkey", "slot", "doc_id", "sig"]
    if extra:
        for name, arr in extra:
            cols.append(pa.array(np.repeat(arr, B)))
            names.append(name)
    return pa.Table.from_arrays(cols, names=names)


def minhash_dedup_candidates(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                             shingle_k: int = 5):
    """Candidate near-dup pairs via MinHash band collisions:
    (doc_lo, doc_hi, n_bands), exactly once per pair.

    ONE keyed repartition; pairing, cross-band dedup AND the shared-band
    count all happen in-task (see _collide_partition)."""
    from biomedical_el_ray.functions.minhash import band_hashes
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(t["text"].to_pylist(), num_hashes, shingle_k)
        return _band_sig_table(ids, band_hashes(sig, bands))

    exploded = ensure_hash_shuffle(
        docs.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    )

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_lo", pa.int64()), ("doc_hi", pa.int64()), ("n_bands", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "bkey" not in t.column_names:
            return empty
        t, li, ri, eq = _collide_partition(t)
        if len(li) == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.minimum(ids[li], ids[ri])
        hi = np.maximum(ids[li], ids[ri])
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
                pa.array(eq.sum(axis=1).astype(np.int64)),
            ],
            names=["doc_lo", "doc_hi", "n_bands"],
        )

    return exploded.repartition(shuffle_partitions(), keys=["bkey"]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def exact_shingle_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (test oracle for MinHash estimates)."""
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# SimHash near-dup candidates (rows-only)
# ---------------------------------------------------------------------------

def simhash_dedup_candidates(sf_dir: str, bands: int = 4, max_hamming: int = 8):
    """Candidate pairs whose SimHash signatures collide in >=1 band and are
    within ``max_hamming`` bits: (doc_lo, doc_hi, hamming), exactly once
    per pair (first-shared-band dedup in-task — no pair-level shuffle)."""
    from biomedical_el_ray.functions.hashing import splitmix64
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    width = 64 // bands
    chunk_mask = np.uint64((1 << width) - 1)
    band_salt = splitmix64(
        np.arange(1, bands + 1, dtype=np.uint64) * np.uint64(0x51AB_0001)
    )

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sigs = simhash64(t["text"].to_pylist())
        # per-band uint64 keys: chunk of the signature mixed with a
        # band-specific salt (no collisions across bands)
        chunks = np.stack(
            [
                (sigs >> np.uint64(b * width)) & chunk_mask
                for b in range(bands)
            ],
            axis=1,
        )
        bh = splitmix64(chunks ^ band_salt[None, :])
        return _band_sig_table(ids, bh, extra=[("raw_sig", sigs.astype(np.int64))])

    exploded = ensure_hash_shuffle(
        docs.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    )

    def _pairs(t: pa.Table) -> pa.Table:
        from biomedical_el_ray.functions.simhash import hamming64

        empty = pa.schema(
            [("doc_lo", pa.int64()), ("doc_hi", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "bkey" not in t.column_names:
            return empty
        t, li, ri, _ = _collide_partition(t)
        if len(li) == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        raw = t["raw_sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        hd = hamming64(raw[li], raw[ri])
        m = hd <= max_hamming
        li, ri, hd = li[m], ri[m], hd[m]
        lo = np.minimum(ids[li], ids[ri])
        hi = np.maximum(ids[li], ids[ri])
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
                pa.array(hd.astype(np.int64)),
            ],
            names=["doc_lo", "doc_hi", "hamming"],
        )

    return exploded.repartition(shuffle_partitions(), keys=["bkey"]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (DuckDB oracle via list_cosine_similarity)
# ---------------------------------------------------------------------------

_EMB_DUP_SCHEMA = pa.schema(
    [("vec_lo", pa.int64()), ("vec_hi", pa.int64()), ("sim_r", pa.float64())]
)


def embedding_near_dup(sf_dir: str, threshold: float = 0.2,
                       salt_threshold: int = 256, max_group_size: int = 100_000,
                       counters: dict | None = None):
    """Pairs of embeddings in the same ``label`` block with cosine >=
    threshold: (vec_lo, vec_hi, sim_r).  float64 end-to-end to match
    DuckDB's DOUBLE[] cast semantics; sim rounded to 6 decimals.

    Fully distributed: the embedding vectors RIDE the keyed repartition as
    a list<float> payload column (Ray's hash shuffle moves list columns
    fine — it was only acero joins that could not) and each partition
    scores its complete label groups in-task with one einsum.  Nothing is
    read on the driver and no full-matrix broadcast exists, so the
    pipeline streams at any table size; hot labels are triangle-salted by
    the shared grouped_pairs machinery."""
    from biomedical_el_ray.stages.grouped_pairs import grouped_pairs

    emb = read_table(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def _gkey(t: pa.Table) -> np.ndarray:
        return splitmix64(
            t["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
            + np.uint64(0x9E37_79B9_7F4A_7C15)
        ).view(np.int64)

    def _prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["vec_id"], pa.array(_gkey(t), pa.int64()), t["embedding"]],
            names=["vec_id", "gkey", "embedding"],
        )

    prepped = emb.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    # census over the label column only — the wide embedding payload
    # streams through routing exactly once, no materialize barrier
    census = read_table(sf_dir, "embeddings", ["label"]).map_batches(
        lambda t: pa.Table.from_arrays([pa.array(_gkey(t), pa.int64())], names=["gkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _score(t: pa.Table, li: np.ndarray, ri: np.ndarray) -> pa.Table:  # noqa: E306
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        col = t["embedding"].combine_chunks()
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(col), -1)
        )
        norms = np.linalg.norm(mat, axis=1)
        num = np.einsum("ij,ij->i", mat[li], mat[ri])
        sim = num / np.maximum(norms[li] * norms[ri], 1e-300)
        m = sim >= threshold
        li, ri, sim = li[m], ri[m], sim[m]
        lo = np.minimum(ids[li], ids[ri])
        hi = np.maximum(ids[li], ids[ri])
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
                pa.array(np.round(sim, 6), pa.float64()),
            ],
            schema=_EMB_DUP_SCHEMA,
        )

    return grouped_pairs(
        prepped,
        _score,
        _EMB_DUP_SCHEMA,
        id_col="vec_id",
        salt_threshold=salt_threshold,
        max_group_size=max_group_size,
        counters=counters,
        census_ds=census,
    )


# ---------------------------------------------------------------------------
# winnowing near-dup candidates (rows-only; SIGMOD'03 fingerprints)
# ---------------------------------------------------------------------------

def winnow_near_dup(sf_dir: str, k: int = 5, w: int = 8, max_fps: int = 24,
                    min_shared: int = 2, max_df: int = 32):
    """Candidate near-dup pairs sharing >= ``min_shared`` winnowed
    fingerprints: (doc_lo, doc_hi, n_shared).

    Each doc keeps its ``max_fps`` smallest winnowed k-gram hashes (a
    bottom-sketch — deterministic and similarity-preserving), exploded to
    (fingerprint, doc_id) rows; pairs come from a self-join on the
    fingerprint key and a groupby count — the same shuffle shape as the
    MinHash band pipeline, with |fingerprint| keys instead of band keys.

    Fingerprints occurring in more than ``max_df`` documents are dropped
    before the self-join (template/boilerplate n-grams carry no near-dup
    signal and are exactly the hot keys that make the join quadratic): the
    doc-frequency pass is a small groupby over 16-byte rows; the hot set
    it yields is bounded by total_rows/max_df and is broadcast to the
    filter — never a second shuffle of the wide side.
    """
    from biomedical_el_ray.functions.fingerprint import winnow

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_fp, out_id = [], []
        for i, text in enumerate(t["text"].to_pylist()):
            fps = winnow(text, k, w)[:max_fps]  # winnow() is sorted unique
            out_fp.extend(fps.astype(np.int64).tolist())
            out_id.extend([int(ids[i])] * len(fps))
        return pa.Table.from_arrays(
            [pa.array(out_fp, pa.int64()), pa.array(out_id, pa.int64())],
            names=["fp", "doc_id"],
        )

    blocks = drop_empty_blocks(
        spread(docs.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True))
    )  # materialized; consumed twice: df-count pass + self-join

    hot = blocks.groupby("fp").count().map_batches(
        lambda t: t.filter(pc.greater(t["count()"], max_df)).select(["fp"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hot_set = set(r["fp"] for r in hot.take_all())  # bounded: <= rows/max_df
    if hot_set:
        hot_ref = ray.put(np.fromiter(hot_set, dtype=np.int64, count=len(hot_set)))

        def _drop_hot(t: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            fp = t["fp"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(fp, hs)))

        blocks = blocks.map_batches(_drop_hot, batch_format="pyarrow",
                                    zero_copy_batch=True)
    right = blocks.map_batches(
        lambda t: t.rename_columns(["fp", "doc_id_r"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from biomedical_el_ray.util import shuffle_partitions
    joined = blocks.join(right, "inner", num_partitions=shuffle_partitions(), on=("fp",))

    def _canon(t: pa.Table) -> pa.Table:
        lo = t["doc_id"].to_numpy(zero_copy_only=False)
        hi = t["doc_id_r"].to_numpy(zero_copy_only=False)
        keep = lo < hi
        return pa.Table.from_arrays(
            [pa.array(lo[keep], pa.int64()), pa.array(hi[keep], pa.int64())],
            names=["doc_lo", "doc_hi"],
        )

    pairs = joined.map_batches(_canon, batch_format="pyarrow", zero_copy_batch=True)
    counted = pairs.groupby(["doc_lo", "doc_hi"]).count()

    _wn_schema = pa.schema(
        [("doc_lo", pa.int64()), ("doc_hi", pa.int64()), ("n_shared", pa.int64())]
    )

    def _thresh(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_lo" not in t.column_names:
            return _wn_schema.empty_table()
        n = pc.cast(t["count()"], pa.int64())
        t = pa.Table.from_arrays([t["doc_lo"], t["doc_hi"], n],
                                 names=["doc_lo", "doc_hi", "n_shared"])
        return t.filter(pc.greater_equal(t["n_shared"], min_shared))

    out = drop_empty_blocks(
        counted.map_batches(_thresh, batch_format="pyarrow", zero_copy_batch=True)
    )
    # a corpus with no shared fingerprints can leave only schema-less
    # blocks; dropping them + one typed empty block pins the schema
    return ray.data.from_arrow(_wn_schema.empty_table()).union(out)


# ---------------------------------------------------------------------------
# End-to-end near-dup materializer: candidates -> verify -> components -> keep
# ---------------------------------------------------------------------------

def _explode_with_masks(num_hashes: int, shingle_k: int, bands: int):
    """Batch fn: (doc_id, text) -> band rows carrying the 4x int64 byte
    masks — the shared map side of near_dedup_keep / near_dedup_incremental
    (one definition, so mask layout and band explode cannot drift)."""
    from biomedical_el_ray.functions.minhash import band_hashes

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        sig = minhash_signatures(texts, num_hashes, shingle_k)
        masks = byte_masks(texts).astype(np.int64)
        return _band_sig_table(
            ids, band_hashes(sig, bands),
            extra=[(f"m{j}", masks[:, j]) for j in range(4)],
        )

    return _explode


def _mask_matrix(t: pa.Table) -> np.ndarray:
    """(n, 4) uint64 byte-mask matrix from the m0..m3 columns."""
    return np.stack(
        [t[c].to_numpy(zero_copy_only=False) for c in ("m0", "m1", "m2", "m3")],
        axis=1,
    ).view(np.uint64)


def near_dedup_keep(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                    shingle_k: int = 5, tau: float = 0.5):
    """The canonical training-data dedup pipeline in one operator:
    (doc_id, cluster_id, keep) — MinHash/LSH candidate pairs, exact
    byte-set-Jaccard verification (DuckDB ``jaccard`` semantics,
    bit-for-bit), transitive connected components, keep = the min doc_id
    of each cluster.

    Scale shape: the byte masks (32 bytes/doc) ride the band explode so no
    text crosses the shuffle; pairing, first-shared-band dedup AND
    verification run inside the repartition tasks (only thresholded edges
    leave); clustering is the shared distributed union-find with its
    broadcast-vs-shuffle plan choice."""
    from biomedical_el_ray.state.unionfind import connected_components
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    exploded = ensure_hash_shuffle(
        docs.map_batches(
            _explode_with_masks(num_hashes, shingle_k, bands),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bkey" not in t.column_names:
            return edge_schema.empty_table()
        t, li, ri, _ = _collide_partition(t)
        if len(li) == 0:
            return edge_schema.empty_table()
        masks = _mask_matrix(t)
        jac = byte_set_jaccard(masks[li], masks[ri])
        m = jac >= tau
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(ids[li[m]], pa.int64()), pa.array(ids[ri[m]], pa.int64())],
            schema=edge_schema,
        )

    edges = exploded.repartition(shuffle_partitions(), keys=["bkey"]).map_batches(
        _edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    nodes = read_table(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["node"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _out(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["node"],
                t["rep"],
                pc.equal(t["node"], t["rep"]),
            ],
            names=["doc_id", "cluster_id", "keep"],
        )

    return connected_components(edges, nodes).map_batches(
        _out, batch_format="pyarrow", zero_copy_batch=True
    )


def near_dedup_keep_oracle_sql(docs_rel: str = "documents",
                               num_hashes: int = 64, bands: int = 16,
                               shingle_k: int = 5, tau: float = 0.5) -> str:
    """Exact DuckDB twin: the minhash band chain, distinct colliding
    pairs, ``jaccard`` verification, recursive reachability components,
    keep = min doc_id."""
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte
    from biomedical_el_ray.functions.sql_hash import reachability_cte as _reach_cte

    cte, bk = band_keys_oracle_cte(
        docs_rel, num_hashes=num_hashes, bands=bands, k=shingle_k
    )
    return f"""
        WITH RECURSIVE {cte},
        cand AS (
          SELECT a.doc_id AS lo, b.doc_id AS hi
          FROM {bk} a
          JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
                     AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        ver AS MATERIALIZED (
          -- length guards: DuckDB jaccard() throws on empty arguments;
          -- the engine's byte_set_jaccard yields 0.0 (< tau) there
          SELECT c.lo, c.hi
          FROM cand c
          JOIN {docs_rel} da ON da.doc_id = c.lo
          JOIN {docs_rel} db ON db.doc_id = c.hi
          WHERE CASE WHEN length(da.text) = 0 OR length(db.text) = 0
                     THEN 0.0 ELSE jaccard(da.text, db.text) END >= {tau}),
        {_reach_cte("SELECT lo AS a, hi AS b FROM ver",
                    f"SELECT doc_id FROM {docs_rel}")}
        SELECT s AS doc_id, min(r) AS cluster_id, s = min(r) AS keep
        FROM reach GROUP BY s
    """


def near_dedup_incremental(sf_dir: str, split_id: int = 250,
                           num_hashes: int = 64, bands: int = 16,
                           shingle_k: int = 5, tau: float = 0.5):
    """(doc_id, dup_of) — incremental dedup of a NEW batch against an
    INDEXED corpus: for every new document (doc_id >= ``split_id``) that
    near-duplicates an indexed one (doc_id < ``split_id``), report the
    smallest matching indexed id.  The production shape for continuous
    ingestion: only CROSS-side pairs are generated (new x new and
    index x index collisions are skipped in-task), so the cost scales
    with the batch, not the corpus pair count.

    Same physical plan as ``near_dedup_keep``: masks ride the band
    explode, pairing/verification run inside the repartition tasks, and
    the per-partition partial (new_id, min indexed match) combines
    through one tiny groupby-min."""
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    exploded = ensure_hash_shuffle(
        docs.map_batches(
            _explode_with_masks(num_hashes, shingle_k, bands),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    out_schema = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bkey" not in t.column_names:
            return out_schema.empty_table()
        # side-aware pairing: per bkey run, meshgrid ONLY (indexed x new) —
        # index x index and new x new pairs are never materialized, so the
        # per-run cost is |index members| x |new members|, not O(run^2)
        keys = t["bkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        t = t.take(pa.array(order))
        keys = keys[order]
        slot = t["slot"].to_numpy(zero_copy_only=False)
        sigc = t["sig"].combine_chunks()
        sig = sigc.flatten().to_numpy(zero_copy_only=False).reshape(len(sigc), -1)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        is_new = ids >= split_id
        n = len(keys)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        li_parts, ri_parts = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = np.arange(s, e)
            a_idx = idx[~is_new[s:e]]  # indexed side
            b_idx = idx[is_new[s:e]]   # new side
            if len(a_idx) and len(b_idx):
                la, lb = np.meshgrid(a_idx, b_idx, indexing="ij")
                li_parts.append(la.ravel())
                ri_parts.append(lb.ravel())
        if not li_parts:
            return out_schema.empty_table()
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)
        # exactly-once across bands: keep a pair only at its first shared slot
        eq = sig[li] == sig[ri]
        keep = eq.argmax(axis=1) == slot[li]
        li, ri = li[keep], ri[keep]
        if len(li) == 0:
            return out_schema.empty_table()
        masks = _mask_matrix(t)
        m = byte_set_jaccard(masks[li], masks[ri]) >= tau
        idx_id, new_id = ids[li[m]], ids[ri[m]]
        # map-side combine: one (new, min index) row per new doc per task
        order = np.lexsort((idx_id, new_id))
        new_id, idx_id = new_id[order], idx_id[order]
        first = np.ones(len(new_id), dtype=bool)
        first[1:] = new_id[1:] != new_id[:-1]
        return pa.Table.from_arrays(
            [pa.array(new_id[first], pa.int64()), pa.array(idx_id[first], pa.int64())],
            schema=out_schema,
        )

    partial = exploded.repartition(shuffle_partitions(), keys=["bkey"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def _fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return out_schema.empty_table()
        return t.rename_columns(["doc_id", "dup_of"])

    out = drop_empty_blocks(
        partial.groupby("doc_id").min("dup_of").map_batches(
            _fin, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    # no matches -> only schema-less blocks remain; drop them and pin the
    # schema with one typed empty block
    return ray.data.from_arrow(out_schema.empty_table()).union(out)


def near_dedup_incremental_oracle_sql(docs_rel: str = "documents",
                                      split_id: int = 250,
                                      num_hashes: int = 64, bands: int = 16,
                                      shingle_k: int = 5,
                                      tau: float = 0.5) -> str:
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte

    cte, bk = band_keys_oracle_cte(
        docs_rel, num_hashes=num_hashes, bands=bands, k=shingle_k
    )
    return f"""
        WITH {cte},
        cand AS (
          SELECT a.doc_id AS idx_id, b.doc_id AS new_id
          FROM {bk} a
          JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
          WHERE a.doc_id < {split_id} AND b.doc_id >= {split_id}
          GROUP BY 1, 2)
        SELECT c.new_id AS doc_id, min(c.idx_id) AS dup_of
        FROM cand c
        JOIN {docs_rel} da ON da.doc_id = c.idx_id
        JOIN {docs_rel} db ON db.doc_id = c.new_id
        WHERE CASE WHEN length(da.text) = 0 OR length(db.text) = 0
                   THEN 0.0 ELSE jaccard(da.text, db.text) END >= {tau}
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

def _bench_shingle_partial(t: pa.Table, shingle_k: int,
                           benchmark_mod: int) -> pa.Table:
    from biomedical_el_ray.functions.hashing import shingle_hashes_flat

    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    mask = doc_id % benchmark_mod == 0
    if not mask.any():
        return pa.table({"h": pa.array([], pa.int64())})
    texts = t.filter(pa.array(mask))["text"].to_pylist()
    h, _ = shingle_hashes_flat(texts, shingle_k)
    return pa.table({"h": pa.array(np.unique(h).view(np.int64))})


def _contam_batch(t: pa.Table, bench_ref, shingle_k: int,
                  benchmark_mod: int, tau_pct: int) -> pa.Table:
    import ray

    from biomedical_el_ray.functions.hashing import shingle_hashes_flat
    from biomedical_el_ray.util import ref_key, worker_state

    bench = worker_state(
        ("decontam_bench", ref_key(bench_ref)), lambda: ray.get(bench_ref)
    )
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    mask = doc_id % benchmark_mod != 0
    doc_id = doc_id[mask]
    texts = t.filter(pa.array(mask))["text"].to_pylist()
    n = len(texts)
    h, lengths = shingle_hashes_flat(texts, shingle_k)
    if bench.size and h.size:
        idx = np.searchsorted(bench, h)
        hit = (idx < bench.size) & (bench[np.minimum(idx, bench.size - 1)] == h)
    else:
        hit = np.zeros(h.size, dtype=bool)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    n_hit = (
        np.add.reduceat(hit.astype(np.int64), offsets)
        if h.size
        else np.zeros(n, dtype=np.int64)
    )
    # every document yields >= 1 shingle (empty text is zero-padded to k
    # bytes), so the integer-percent division never sees a 0 denominator
    contam_pct = n_hit * 100 // lengths
    return pa.Table.from_arrays(
        [
            pa.array(doc_id),
            pa.array(lengths),
            pa.array(n_hit),
            pa.array(contam_pct),
            pa.array(n_hit * 100 >= tau_pct * lengths),
        ],
        names=["doc_id", "n_shingles", "n_hit", "contam_pct", "flagged"],
    )


def decontaminate(sf_dir: str, shingle_k: int = 8, benchmark_mod: int = 7,
                  tau_pct: int = 90, max_bench_shingles: int = 50_000_000):
    """(doc_id, n_shingles, n_hit, contam_pct, flagged) — benchmark
    decontamination for training corpora: the k-byte-shingle overlap of
    every training document against the union of a held-out eval set's
    shingles (here, deterministically, docs with ``doc_id %
    benchmark_mod == 0``); ``flagged`` marks documents whose overlap
    fraction reaches ``tau_pct`` percent.  The standard pre-training
    hygiene step (n-gram decontamination à la GPT-3 appendix C / Brown et
    al. 2020) expressed Ray-Data-first.

    Scale shape: the benchmark side is the SMALL side by construction (an
    eval suite, not the corpus) — its distinct-shingle union is built
    distributed (per-batch ``np.unique`` partials, one ``Dataset.unique``
    reduce), capped loudly at ``max_bench_shingles`` (a 50M-shingle cap =
    400 MB broadcast, far above any real eval suite), then broadcast once
    via ``ray.put`` and binary-searched per batch.  The 100-TB training
    side streams through one ``map_batches`` pass; nothing about the
    corpus is ever collected.

    Integer fixed-point percentages keep the DuckDB oracle bit-exact.
    Ref analog: the reference dedups mention candidates against the gold
    KB ids before mining negatives (utils_e2e_span.py:374-428) — the same
    "exclude what the eval set contains" shape at corpus scale.
    """
    import ray

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    vals = docs.map_batches(
        _bench_shingle_partial,
        fn_kwargs={"shingle_k": shingle_k, "benchmark_mod": benchmark_mod},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).unique("h")
    if len(vals) > max_bench_shingles:
        raise ValueError(
            f"benchmark shingle union ({len(vals)}) exceeds "
            f"max_bench_shingles={max_bench_shingles}; the benchmark side "
            "must be the small side — shrink the eval set or raise the cap"
        )
    bench = np.sort(np.asarray(vals, dtype=np.int64).view(np.uint64))
    bench_ref = ray.put(bench)
    return docs.map_batches(
        _contam_batch,
        fn_kwargs={
            "bench_ref": bench_ref,
            "shingle_k": shingle_k,
            "benchmark_mod": benchmark_mod,
            "tau_pct": tau_pct,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decontaminate_oracle_sql(docs_rel: str = "documents", shingle_k: int = 8,
                             benchmark_mod: int = 7,
                             tau_pct: int = 90) -> str:
    """Exact DuckDB twin: one shingle chain over all documents, the
    benchmark union as a DISTINCT filter, LEFT JOIN membership counts."""
    from biomedical_el_ray.functions.sql_hash import shingle_cte

    sh = shingle_cte(docs_rel, shingle_k, prefix="dc")
    return f"""
        WITH {sh},
        bench AS MATERIALIZED (
          SELECT DISTINCT h FROM dcsh WHERE doc_id % {benchmark_mod} = 0),
        st AS (
          SELECT s.doc_id, count(*) AS n_shingles, count(b.h) AS n_hit
          FROM dcsh s
          LEFT JOIN bench b ON b.h = s.h
          WHERE s.doc_id % {benchmark_mod} <> 0
          GROUP BY s.doc_id)
        SELECT doc_id,
               CAST(n_shingles AS BIGINT) AS n_shingles,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(n_hit * 100 // n_shingles AS BIGINT) AS contam_pct,
               n_hit * 100 >= {tau_pct} * n_shingles AS flagged
        FROM st
    """


# ---------------------------------------------------------------------------
# MinHash Jaccard estimator over the LSH candidate pairs
# ---------------------------------------------------------------------------

_MJE_BROADCAST_MAX_BYTES = 256 * 1024 * 1024  # sig table; past it, joins


def minhash_jaccard_estimate(sf_dir: str, num_hashes: int = 64,
                             bands: int = 16, shingle_k: int = 5):
    """(doc_lo, doc_hi, n_agree, jaccard_est_r) — the similarity estimate
    MinHash gives its candidates FOR FREE: the fraction of agreeing
    signature slots is an unbiased estimator of shingle Jaccard (Broder
    1997), which production dedup uses to rank or pre-filter candidates
    before (or instead of) exact byte-set verification
    (``jaccard_pairs``/``near_dedup_keep`` do the exact step; this is
    the cheap middle tier).

    Scale shape: candidates come from the proven exactly-once band
    collision; signatures attach plan="auto" on the signature-table
    size (num_hashes·8 bytes per document) — under
    ``_MJE_BROADCAST_MAX_BYTES`` the (doc_id, signature) table is
    computed distributed, streamed to the driver as Arrow blobs, and
    broadcast ONCE via ``ray.put`` so both endpoints label map-side by
    ``searchsorted`` (zero shuffle joins); past the cap it is TWO
    hash-shuffle joins carrying the fixed-width blobs.  The
    slot-agreement count is one vectorized equality sum per batch under
    either plan.  ``jaccard_est_r`` is one f64 divide by the constant
    ``num_hashes`` on both sides.
    """
    import pyarrow.compute as pc
    import ray

    from biomedical_el_ray.util import drop_empty_blocks, shuffle_partitions

    pairs = minhash_dedup_candidates(
        sf_dir, num_hashes, bands, shingle_k
    ).map_batches(
        lambda t: t.select(["doc_lo", "doc_hi"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    width = num_hashes * 8

    def _sigs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(
            t["text"].to_pylist(), num_hashes, shingle_k)
        # signatures ride the join as fixed-width binary blobs — Acero's
        # hash join rejects (fixed-size-)list payload columns; the blob
        # is a zero-copy view of the signature matrix
        buf = pa.py_buffer(np.ascontiguousarray(sig).tobytes())
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(ids), [None, buf])
        return pa.table({"doc_id": pa.array(ids), "sig": arr})

    sigs = docs.map_batches(
        _sigs, batch_format="pyarrow", zero_copy_batch=True)

    def _unblob(col) -> np.ndarray:
        arr = col.combine_chunks()
        raw = np.frombuffer(arr.buffers()[1], np.uint64)
        lo = arr.offset * num_hashes
        return raw[lo:lo + len(arr) * num_hashes].reshape(-1, num_hashes)

    n_docs = docs.count()  # parquet metadata count — no data pass
    if n_docs * width <= _MJE_BROADCAST_MAX_BYTES:
        from biomedical_el_ray.util import ref_key, worker_state

        id_parts, sig_parts = [], []
        for b in sigs.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            if b.num_rows == 0:
                continue
            id_parts.append(
                b["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64))
            sig_parts.append(_unblob(b["sig"]))
        ids = (np.concatenate(id_parts) if id_parts
               else np.empty(0, np.int64))
        S = (np.vstack(sig_parts) if sig_parts
             else np.empty((0, num_hashes), np.uint64))
        o = np.argsort(ids)
        sig_ref = ray.put((ids[o], S[o]))
        srkey = ref_key(sig_ref)

        def _est_bcast(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_lo": pa.array([], pa.int64()),
                "doc_hi": pa.array([], pa.int64()),
                "n_agree": pa.array([], pa.int64()),
                "jaccard_est_r": pa.array([], pa.float64()),
            })
            keys, sig_m = worker_state(
                ("mje_sigs", srkey), lambda: ray.get(sig_ref))
            if t.num_rows == 0 or len(keys) == 0:
                return empty
            lo = t["doc_lo"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            hi = t["doc_hi"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            il = np.minimum(np.searchsorted(keys, lo), len(keys) - 1)
            ih = np.minimum(np.searchsorted(keys, hi), len(keys) - 1)
            hit = (keys[il] == lo) & (keys[ih] == hi)  # inner-join rule
            if not hit.any():
                return empty
            n_agree = (sig_m[il[hit]] == sig_m[ih[hit]]).sum(
                axis=1).astype(np.int64)
            return pa.table({
                "doc_lo": pa.array(lo[hit]),
                "doc_hi": pa.array(hi[hit]),
                "n_agree": pa.array(n_agree),
                "jaccard_est_r": pa.array(
                    n_agree.astype(np.float64) / num_hashes),
            })

        return drop_empty_blocks(pairs).map_batches(
            _est_bcast, batch_format="pyarrow", zero_copy_batch=True)

    n_parts = shuffle_partitions()
    sa = sigs.map_batches(
        lambda t: t.rename_columns(["doc_lo", "sig_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sb = sigs.map_batches(
        lambda t: t.rename_columns(["doc_hi", "sig_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j = drop_empty_blocks(pairs).join(
        sa, "inner", num_partitions=n_parts, on=("doc_lo",))
    j = drop_empty_blocks(j).join(
        sb, "inner", num_partitions=n_parts, on=("doc_hi",))

    def _est(t: pa.Table) -> pa.Table:
        A = _unblob(t["sig_a"])
        B = _unblob(t["sig_b"])
        n_agree = (A == B).sum(axis=1).astype(np.int64)
        return pa.table({
            "doc_lo": t["doc_lo"],
            "doc_hi": t["doc_hi"],
            "n_agree": pa.array(n_agree),
            "jaccard_est_r": pa.array(
                n_agree.astype(np.float64) / num_hashes),
        })

    return drop_empty_blocks(j).map_batches(
        _est, batch_format="pyarrow", zero_copy_batch=True)


def minhash_jaccard_estimate_oracle_sql(docs_rel: str = "documents",
                                        num_hashes: int = 64,
                                        bands: int = 16,
                                        k: int = 5,
                                        seed: int = 0x5EED01) -> str:
    """DuckDB twin: the band-key chain's per-permutation minima relation
    joined per candidate pair per slot, FILTER-counted agreement, the
    identical constant divide."""
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte

    cte, bk = band_keys_oracle_cte(
        docs_rel, num_hashes=num_hashes, bands=bands, k=k, seed=seed
    )
    return f"""
        WITH {cte},
        cand AS (
          SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi
          FROM {bk} a
          JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
                     AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        est AS (
          SELECT c.doc_lo, c.doc_hi,
                 count(*) FILTER (WHERE sa.mh = sb.mh) AS n_agree
          FROM cand c
          JOIN mins sa ON sa.doc_id = c.doc_lo
          JOIN mins sb ON sb.doc_id = c.doc_hi AND sb.hi = sa.hi
          GROUP BY 1, 2)
        SELECT doc_lo, doc_hi, CAST(n_agree AS BIGINT) AS n_agree,
               CAST(n_agree AS DOUBLE) / {num_hashes} AS jaccard_est_r
        FROM est
    """


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the bounded-broadcast scale path)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 20  # bits; power of two so position = splitmix & (m-1)
_BLOOM_SALT1 = np.uint64(0xB100_0001_5A17_0001)
_BLOOM_SALT2 = np.uint64(0xB100_0002_5A17_0002)


def _bloom_pos_partial(t: pa.Table, shingle_k: int, benchmark_mod: int,
                       m: int) -> pa.Table:
    from biomedical_el_ray.functions.hashing import (
        shingle_hashes_flat, splitmix64,
    )

    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    mask = doc_id % benchmark_mod == 0
    if not mask.any():
        return pa.table({"p": pa.array([], pa.int64())})
    texts = t.filter(pa.array(mask))["text"].to_pylist()
    h, _ = shingle_hashes_flat(texts, shingle_k)
    hu = np.unique(h)
    mm = np.uint64(m - 1)
    p1 = (splitmix64(hu ^ _BLOOM_SALT1) & mm).astype(np.int64)
    p2 = (splitmix64(hu ^ _BLOOM_SALT2) & mm).astype(np.int64)
    return pa.table({"p": pa.array(np.unique(np.concatenate([p1, p2])))})


def _bloom_contam_batch(t: pa.Table, bits_ref, shingle_k: int,
                        benchmark_mod: int, tau_pct: int,
                        m: int) -> pa.Table:
    import ray

    from biomedical_el_ray.functions.hashing import (
        shingle_hashes_flat, splitmix64,
    )
    from biomedical_el_ray.util import ref_key, worker_state

    bits = worker_state(
        ("bloom_bits", ref_key(bits_ref)), lambda: ray.get(bits_ref))
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    mask = doc_id % benchmark_mod != 0
    doc_id = doc_id[mask]
    texts = t.filter(pa.array(mask))["text"].to_pylist()
    n = len(texts)
    h, lengths = shingle_hashes_flat(texts, shingle_k)
    mm = np.uint64(m - 1)
    if h.size:
        p1 = (splitmix64(h ^ _BLOOM_SALT1) & mm).astype(np.int64)
        p2 = (splitmix64(h ^ _BLOOM_SALT2) & mm).astype(np.int64)
        b1 = (bits[p1 >> 3] >> (7 - (p1 & 7))) & 1
        b2 = (bits[p2 >> 3] >> (7 - (p2 & 7))) & 1
        hit = (b1 & b2).astype(np.int64)
    else:
        hit = np.zeros(0, np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    n_hit = (np.add.reduceat(hit, offsets) if h.size
             else np.zeros(n, dtype=np.int64))
    contam_pct = n_hit * 100 // lengths
    return pa.Table.from_arrays(
        [
            pa.array(doc_id),
            pa.array(lengths),
            pa.array(n_hit),
            pa.array(contam_pct),
            pa.array(n_hit * 100 >= tau_pct * lengths),
        ],
        names=["doc_id", "n_shingles", "n_hit", "contam_pct", "flagged"],
    )


def bloom_decontaminate(sf_dir: str, shingle_k: int = 8,
                        benchmark_mod: int = 7, tau_pct: int = 90,
                        m: int = _BLOOM_M):
    """(doc_id, n_shingles, n_hit, contam_pct, flagged) — benchmark
    decontamination through a BLOOM FILTER of the held-out set's
    shingles instead of the exact shingle union: the bounded-broadcast
    scale path :func:`decontaminate`'s docstring points to when the eval
    suite outgrows its 400 MB cap.  Two splitmix-derived hash positions
    per shingle into an ``m``-bit table; a training shingle counts as a
    hit iff BOTH its bits are set — the standard one-sided error
    (false positives only, rate ≈ (1−e^{-2n/m})², never false
    negatives, so flagged is a SUPERSET of the exact operator's).

    Scale shape: the bit table's set positions are built distributed
    (per-batch position partials + one bounded ``unique`` — at most
    ``m`` values regardless of benchmark size); the driver packs them
    into an ``m/8``-byte bitmap (128 KB at the default) broadcast once;
    the 100-TB training side streams through one vectorized pass.
    Deterministic hashes make even the false positives a pure function
    of the data — the DuckDB twin computes the identical positions and
    membership, bit-exact.
    """
    import ray

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    vals = docs.map_batches(
        _bloom_pos_partial,
        fn_kwargs={"shingle_k": shingle_k, "benchmark_mod": benchmark_mod,
                   "m": m},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).unique("p")
    bits = np.zeros(m, dtype=bool)
    if len(vals):
        bits[np.asarray(vals, dtype=np.int64)] = True
    bits_ref = ray.put(np.packbits(bits))
    return docs.map_batches(
        _bloom_contam_batch,
        fn_kwargs={
            "bits_ref": bits_ref,
            "shingle_k": shingle_k,
            "benchmark_mod": benchmark_mod,
            "tau_pct": tau_pct,
            "m": m,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bloom_decontaminate_oracle_sql(docs_rel: str = "documents",
                                   shingle_k: int = 8,
                                   benchmark_mod: int = 7,
                                   tau_pct: int = 90,
                                   m: int = _BLOOM_M) -> str:
    """DuckDB twin: the shingle chain, the two splitmix position chains
    on both sides, the distinct bench position set, and the both-bits
    membership rule."""
    from biomedical_el_ray.functions.sql_hash import (
        shingle_cte, splitmix_step_ctes,
    )

    sh = shingle_cte(docs_rel, shingle_k, prefix="bd")
    s1, s2 = int(_BLOOM_SALT1), int(_BLOOM_SALT2)
    mk = m - 1
    bt, br = splitmix_step_ctes(
        "bbh", [],
        [("q1", f"xor(h, {s1}::HUGEINT)"), ("q2", f"xor(h, {s2}::HUGEINT)")],
        "bp_",
    )
    tt, tr = splitmix_step_ctes(
        "btr", ["doc_id"],
        [("q1", f"xor(h, {s1}::HUGEINT)"), ("q2", f"xor(h, {s2}::HUGEINT)")],
        "tp_",
    )
    return f"""
        WITH {sh},
        bbh AS (
          SELECT DISTINCT h FROM bdsh WHERE doc_id % {benchmark_mod} = 0),
        {bt},
        posset AS MATERIALIZED (
          SELECT DISTINCT p FROM (
            SELECT CAST(q1 & {mk} AS BIGINT) AS p FROM {br}
            UNION ALL
            SELECT CAST(q2 & {mk} AS BIGINT) FROM {br})),
        btr AS (
          SELECT doc_id, h FROM bdsh WHERE doc_id % {benchmark_mod} <> 0),
        {tt},
        tp AS (
          SELECT doc_id, CAST(q1 & {mk} AS BIGINT) AS p1,
                 CAST(q2 & {mk} AS BIGINT) AS p2
          FROM {tr}),
        hits AS (
          SELECT t.doc_id,
                 CASE WHEN s1.p IS NOT NULL AND s2.p IS NOT NULL
                      THEN 1 ELSE 0 END AS hit
          FROM tp t
          LEFT JOIN posset s1 ON s1.p = t.p1
          LEFT JOIN posset s2 ON s2.p = t.p2),
        st AS (
          SELECT doc_id, count(*) AS n_shingles, sum(hit) AS n_hit
          FROM hits GROUP BY 1)
        SELECT doc_id,
               CAST(n_shingles AS BIGINT) AS n_shingles,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(n_hit * 100 // n_shingles AS BIGINT) AS contam_pct,
               n_hit * 100 >= {tau_pct} * n_shingles AS flagged
        FROM st
    """


# ---------------------------------------------------------------------------
# Duplicate-passage profile (exact substring-dup fractions à la Lee et al.)
# ---------------------------------------------------------------------------

def _dup_shingle_rows(t: pa.Table, shingle_k: int) -> pa.Table:
    from biomedical_el_ray.functions.hashing import shingle_hashes_flat

    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    h, lengths = shingle_hashes_flat(t["text"].to_pylist(), shingle_k)
    return pa.table({
        "h": pa.array(h.view(np.int64)),
        "doc_id": pa.array(np.repeat(doc_id, lengths)),
    })


def _dup_df_partial(t: pa.Table) -> pa.Table:
    """Per-doc (n_shingles, n_dup) partials of one hash partition.  Every
    row of a given ``h`` lands here (keyed repartition) and the
    (doc_id, h) rows are globally distinct (a doc's text lives in ONE
    input row), so the run length of ``h`` IS its document frequency."""
    empty = pa.schema([("doc_id", pa.int64()), ("ns", pa.int64()),
                       ("nd", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    h = t["h"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    h, d = h[order], d[order]
    starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
    runlen = np.diff(np.append(starts, h.size))
    dup = np.repeat(runlen >= 2, runlen)
    order = np.argsort(d, kind="stable")
    d, dup = d[order], dup[order]
    s2 = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    ns = np.diff(np.append(s2, d.size))
    nd = np.add.reduceat(dup.astype(np.int64), s2)
    return pa.table({"doc_id": pa.array(d[s2]),
                     "ns": pa.array(ns.astype(np.int64)),
                     "nd": pa.array(nd)})


def dup_span_stats(sf_dir: str, shingle_k: int = 8):
    """(doc_id, n_shingles, n_dup, dup_pct) — the duplicate-passage
    profile: for every document, how many of its distinct k-byte
    shingles also occur in at least one OTHER document, and the integer
    percentage of the document that is cross-document duplicated text.
    The per-document signal behind exact substring deduplication
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) at k-gram granularity — read it to decide
    a dedup threshold before committing to removal.

    Scale shape: (doc_id, h) rows — 16 B per shingle, never text — take
    ONE keyed repartition on the shingle hash; document frequency is a
    run length in-task (rows are per-doc distinct already, map-side),
    and only per-doc partial counts leave the tasks for one bounded
    groupby-sum over n_docs rows.  The shuffle is O(corpus bytes × 16)
    at stride-1 grain; at 100-TB scale run the same profile over
    winnowed fingerprints instead (``winnow_near_dup``'s bottom-sketch
    machinery) or raise k — this operator is the exact-grain instrument.

    Integer ``//`` percentages keep the DuckDB oracle bit-exact; every
    document yields >= 1 shingle (texts are zero-padded to k bytes), so
    the division never sees a 0 denominator.
    """
    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    rows = ensure_hash_shuffle(docs.map_batches(
        _dup_shingle_rows, fn_kwargs={"shingle_k": shingle_k},
        batch_format="pyarrow", zero_copy_batch=True,
    ))
    partials = rows.repartition(
        shuffle_partitions(), keys=["h"]
    ).map_batches(
        _dup_df_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    def _final(t: pa.Table) -> pa.Table:
        ns = t["n_shingles"].to_numpy(zero_copy_only=False)
        nd = t["n_dup"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks()
            if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
            "n_shingles": pa.array(ns.astype(np.int64)),
            "n_dup": pa.array(nd.astype(np.int64)),
            "dup_pct": pa.array(nd * 100 // ns),
        })

    return partials.groupby("doc_id").aggregate(
        Sum("ns", alias_name="n_shingles"), Sum("nd", alias_name="n_dup"),
    ).map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)


def dup_span_stats_oracle_sql(docs_rel: str = "documents",
                              shingle_k: int = 8) -> str:
    """DuckDB twin: one distinct-shingle chain, document frequency by
    GROUP BY h, membership join back, integer percentage."""
    from biomedical_el_ray.functions.sql_hash import shingle_cte

    sh = shingle_cte(docs_rel, shingle_k, prefix="dp")
    return f"""
        WITH {sh},
        df AS (SELECT h, count(*) AS df FROM dpsh GROUP BY h),
        st AS (
          SELECT s.doc_id, count(*) AS n_shingles,
                 sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_dup
          FROM dpsh s
          JOIN df f ON f.h = s.h
          GROUP BY s.doc_id)
        SELECT doc_id,
               CAST(n_shingles AS BIGINT) AS n_shingles,
               CAST(n_dup AS BIGINT) AS n_dup,
               CAST(n_dup * 100 // n_shingles AS BIGINT) AS dup_pct
        FROM st
    """


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means clustering + within-cluster pruning
# ---------------------------------------------------------------------------

def semdedup(sf_dir: str, k: int = 8, iters: int = 2,
             threshold: float = 0.3,
             max_group_size: int = 100_000, counters: dict | None = None,
             local_threshold: int = 100_000):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over the
    ``embeddings`` table: train a k-means codebook, assign every vector
    to its nearest centroid, and within each cluster drop any vector
    that has a smaller-id neighbor with cosine >= ``threshold``.
    Returns the KEPT rows (vec_id, cluster_id), vec_id-ascending.

    Ray-Data-first decomposition:

    * codebook      — ``fit_kmeans`` (dense per-block Lloyd partials
                      reduced driver-side; the corpus never
                      materializes);
    * assignment    — broadcast codebook via ``ray.put`` + one
                      BLAS-exact integer-L2 argmin per batch, recomputed
                      per consumer (pair side, keep side) — two cheap
                      streaming passes instead of parking the corpus in
                      the object store;
    * in-cluster dups — ONE keyed repartition on the cluster hash, then
                      per-cluster BLOCKED GEMM over unit rows as a SOUND
                      prefilter (margin 1e-9 >> the few-ulp
                      normalization error) with the surviving candidate
                      pairs rescored by the oracle's exact
                      dot/(|a|·|b|) formula — the flagship's
                      gate-then-exact-score pattern.  A whole cluster is
                      owned by one task, so exactly-once needs no
                      salting; per-task work is Σ n²·d FLOPS in BLAS,
                      never per-pair gathers (measured: the per-pair
                      kernel moved ~290 GB of gathers at 1M vectors —
                      the GEMM form is bandwidth-bound on n², not
                      pairs×d).  Clusters above ``max_group_size`` drop
                      their pruning (counted loudly, members all kept);
                      size k so clusters stay in the hundreds, as the
                      paper does;
    * keep          — drops are removed with the hash-shuffle
                      ``left_anti`` join (the ``dormant_customers``
                      shape: both sides scale with the dataset, so no
                      broadcast).

    The paper keeps the member farthest from the centroid; the engine
    keeps the smallest vec_id — a deterministic, order-free rule that a
    relational oracle can reproduce (NOT EXISTS smaller-id duplicate).

    Plan choice (the engine's explicit row-count-threshold pattern, cf.
    local-vs-distributed union-find): at or under ``local_threshold``
    rows the whole job runs driver-local in numpy with the SAME kernels
    and rules (Lloyd's loop is ~10 sequential driver barriers whose
    scheduling latency dwarfs the math at toy scale); above it the
    distributed plan streams.  Both plans are oracle-tested.
    """
    from biomedical_el_ray.pipelines.ann import _emb_matrix
    from biomedical_el_ray.pipelines.kmeans import (
        _assign,
        _fixed_point,
        _trunc_div,
        fit_kmeans,
    )
    from biomedical_el_ray.util import (
        Counters, ensure_hash_shuffle, shuffle_partitions,
    )

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    if emb.count() <= local_threshold:
        if counters is not None:
            counters["dropped_oversized_groups"] = 0
            counters["dropped_oversized_rows"] = 0
        rows = pa.concat_tables(
            [b for b in emb.iter_batches(batch_format="pyarrow")]
            or [pa.schema([("vec_id", pa.int64()),
                           ("embedding", pa.list_(pa.float32()))]).empty_table()]
        )
        if rows.num_rows == 0:
            import pandas as pd

            return pd.DataFrame(
                {"vec_id": [], "cluster_id": []}).astype(np.int64)
        order = pc.sort_indices(rows["vec_id"])
        rows = rows.take(order)
        ids = rows["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _emb_matrix(rows["embedding"])
        q = _fixed_point(mat)
        seed = ids < k
        cids, cmat = ids[seed], q[seed]
        a = None
        for _ in range(iters):
            a = _assign(q, cids, cmat)
            pos = np.searchsorted(cids, a)
            cnt = np.bincount(pos, minlength=len(cids)).astype(np.int64)
            sums = np.zeros_like(cmat)
            o = np.argsort(pos, kind="stable")
            ps, qs = pos[o], q[o]
            st = np.flatnonzero(np.concatenate(([True], ps[1:] != ps[:-1])))
            if ps.size:
                sums[ps[st]] = np.add.reduceat(qs, st, axis=0)
            live = cnt > 0
            cids = cids[live]
            cmat = _trunc_div(sums[live], cnt[live][:, None])
        a = _assign(q, cids, cmat)
        norms = np.linalg.norm(mat, axis=1)
        dropped = np.zeros(len(ids), bool)
        for c in np.unique(a):
            m = np.flatnonzero(a == c)
            if len(m) < 2 or len(m) > max_group_size:
                continue
            u = mat[m] / np.maximum(norms[m], 1e-300)[:, None]
            g = u @ u.T
            ri, ci = np.nonzero(g >= threshold - 1e-9)
            sel = ci > ri
            ai, aj = m[ri[sel]], m[ci[sel]]
            sim = np.einsum("ij,ij->i", mat[ai], mat[aj]) / np.maximum(
                norms[ai] * norms[aj], 1e-300)
            dropped[aj[sim >= threshold]] = True
        keep = ~dropped
        return pa.table({
            "vec_id": pa.array(ids[keep]),
            "cluster_id": pa.array(a[keep]),
        })
    cids, cmat, counts = fit_kmeans(emb, k=k, iters=iters)
    if counts is None:  # empty table
        import pandas as pd

        return pd.DataFrame({"vec_id": [], "cluster_id": []}).astype(np.int64)
    cb_ref = ray.put((cids, cmat))
    cnt = Counters()
    handle = cnt.handle

    def _clusters(t: pa.Table) -> np.ndarray:
        c_ids, c_mat = ray.get(cb_ref)
        return _assign(_fixed_point(_emb_matrix(t["embedding"])), c_ids, c_mat)

    def _prep(t: pa.Table) -> pa.Table:
        a = _clusters(t)
        gk = splitmix64(
            a.astype(np.uint64) + np.uint64(0xD1B5_4A32_D192_ED03)
        ).view(np.int64)
        return pa.Table.from_arrays(
            [t["vec_id"], pa.array(gk, pa.int64()), t["embedding"]],
            names=["vec_id", "gkey", "embedding"],
        )

    def _assigned(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["vec_id"], pa.array(_clusters(t), pa.int64())],
            names=["vec_id", "cluster_id"],
        )

    _drop_schema = pa.schema([("vec_id", pa.int64())])

    def _dups_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _drop_schema.empty_table()
        t = t.sort_by([("gkey", "ascending"), ("vec_id", "ascending")])
        gk = t["gkey"].to_numpy(zero_copy_only=False)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        col = t["embedding"].combine_chunks()
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(col), -1)
        )
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.maximum(norms, 1e-300)[:, None]
        starts = np.flatnonzero(np.concatenate(([True], gk[1:] != gk[:-1])))
        ends = np.append(starts[1:], len(gk))
        oversized = 0
        oversized_rows = 0
        drops = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > max_group_size:
                oversized += 1
                oversized_rows += int(n)
                continue
            step = max(1, 32_000_000 // max(n, 1))  # ~256MB G blocks
            for bs in range(s, e, step):
                be = min(bs + step, e)
                g = unit[bs:be] @ unit[s:e].T
                ri, ci = np.nonzero(g >= threshold - 1e-9)
                gi = ri + (bs - s)
                m = ci > gi  # upper triangle: j > i within the cluster
                if not m.any():
                    continue
                ai = gi[m] + s
                aj = ci[m] + s
                # exact rescore with the oracle's formula
                sim = np.einsum("ij,ij->i", mat[ai], mat[aj]) / np.maximum(
                    norms[ai] * norms[aj], 1e-300
                )
                drops.append(aj[sim >= threshold])
        if oversized:
            Counters.add(handle, {
                "dropped_oversized_groups": oversized,
                "dropped_oversized_rows": oversized_rows,
            })
        if not drops:
            return _drop_schema.empty_table()
        drop = np.unique(ids[np.concatenate(drops)])
        return pa.Table.from_arrays([pa.array(drop, pa.int64())],
                                    schema=_drop_schema)

    prepped = ensure_hash_shuffle(
        emb.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    )
    drops = prepped.repartition(
        shuffle_partitions(), keys=["gkey"]
    ).map_batches(
        _dups_partition, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )
    assigned = emb.map_batches(_assigned, batch_format="pyarrow",
                               zero_copy_batch=True)
    num_partitions = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized()
        else 8
    )
    kept = assigned.join(
        drops,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("vec_id",),
    )
    kept = drop_empty_blocks(kept).sort("vec_id")
    if counters is not None:
        out = kept.materialize()
        counters.update(cnt.fetch())
        counters.setdefault("dropped_oversized_groups", 0)
        counters.setdefault("dropped_oversized_rows", 0)
        return out
    return kept


def semdedup_oracle_sql(k: int = 8, iters: int = 2, threshold: float = 0.3,
                        dim: int = 64) -> str:
    """Exact DuckDB twin of ``semdedup``: the trained-codebook CTE chain
    (``kmeans_cte_parts``), the same integer-L2 smaller-id-tie
    assignment, a within-cluster cosine self-join for duplicates, and a
    NOT-IN keep."""
    from biomedical_el_ray.pipelines.kmeans import kmeans_cte_parts

    parts, final = kmeans_cte_parts(k, iters, dim)
    return f"""
        WITH {parts},
        asn AS MATERIALIZED (
          SELECT vec_id, cluster_id FROM (
            SELECT p.vec_id, c.cluster_id,
                   row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY sum((p.q - c.c) * (p.q - c.c)),
                              c.cluster_id) AS rn
            FROM q p JOIN {final} c USING (dim)
            GROUP BY p.vec_id, c.cluster_id) WHERE rn = 1),
        dup AS (
          SELECT DISTINCT b.vec_id
          FROM asn a
          JOIN asn b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
          WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[]))
                >= {threshold})
        SELECT s.vec_id, s.cluster_id
        FROM asn s
        WHERE s.vec_id NOT IN (SELECT vec_id FROM dup)
        ORDER BY s.vec_id
    """


# ---------------------------------------------------------------------------
# Conversation-grain near-dup candidates (the transcript dedup shape)
# ---------------------------------------------------------------------------

def conversation_dedup_candidates(sf_dir: str, num_hashes: int = 64,
                                  bands: int = 16, shingle_k: int = 8):
    """(conv_lo, conv_hi, n_bands) — MinHash/LSH near-duplicate candidate
    pairs at CONVERSATION grain over the transcripts table: each
    conversation's turns are concatenated in turn order into one
    document, then the proven band-collision chain runs over the
    conversation corpus.  This is the transcript-payload twin of
    ``minhash_dedup_candidates`` — re-run sessions, templated agent
    loops and copy-pasted prompts collide here even when no single turn
    is an exact duplicate (``dedup_turns`` covers that grain).

    Scale shape: TWO keyed repartitions, one per grain change — conv
    assembly (turns -> conversation docs; the in-task kernel is the
    proven sort + run-detect + ``pc.binary_join`` rebuild, no per-row
    Python) and band collision (the shared ``_collide_partition``:
    pairing, first-shared-slot dedup and the shared-band count all
    in-task, no pair-level shuffle).  Conversation ids ride as strings;
    the exploded rows carry the full band vector exactly like the
    document path.
    """
    import os

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.functions.minhash import band_hashes
    from biomedical_el_ray.sources.readers import read_parquet_spread
    from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    d = ensure_corpus_for_sf_dir(sf_dir)
    ds = read_parquet_spread(
        os.path.join(d, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )

    def _ckey(t: pa.Table) -> pa.Table:
        ck = hash64_column(t["conv_id"]).view(np.int64)
        return t.append_column("ckey", pa.array(ck, pa.int64()))

    def _assemble(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string())],
            names=["conv_id", "text"],
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = t["conv_id"].combine_chunks()
        n = t.num_rows
        brk = np.ones(n, bool)
        brk[1:] = ~pc.equal(
            conv.slice(1), conv.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        counts = (np.append(starts[1:], n) - starts).astype(np.int64)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        text = pc.fill_null(t["text"], "").combine_chunks()
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, text), "\n")
        return pa.Table.from_arrays(
            [conv.take(starts), joined], names=["conv_id", "text"]
        )

    conv_docs = (
        ensure_hash_shuffle(
            ds.map_batches(_ckey, batch_format="pyarrow", zero_copy_batch=True)
        )
        .repartition(shuffle_partitions(), keys=["ckey"])
        .map_batches(_assemble, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
    )

    def _explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        sig = minhash_signatures(t["text"].to_pylist(), num_hashes, shingle_k)
        return _band_sig_table(ids, band_hashes(sig, bands))

    exploded = ensure_hash_shuffle(
        conv_docs.map_batches(
            _explode, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("conv_lo", pa.string()), ("conv_hi", pa.string()),
             ("n_bands", pa.int64())]
        ).empty_table()
        if t.num_rows == 0 or "bkey" not in t.column_names:
            return empty
        t, li, ri, eq = _collide_partition(t)
        if len(li) == 0:
            return empty
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
        a, b = ids[li], ids[ri]
        swap = a > b
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        return pa.Table.from_arrays(
            [
                pa.array(lo, pa.string()),
                pa.array(hi, pa.string()),
                pa.array(eq.sum(axis=1).astype(np.int64)),
            ],
            names=["conv_lo", "conv_hi", "n_bands"],
        )

    return exploded.repartition(shuffle_partitions(), keys=["bkey"]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def conversation_dedup_oracle_sql(corpus_dir: str, num_hashes: int = 64,
                                  bands: int = 16, k: int = 8,
                                  seed: int = 0x5EED01) -> str:
    """DuckDB twin: conversation assembly via ordered string_agg, then the
    shared band-key CTE chain + (band, bkey) pair equi-join."""
    from biomedical_el_ray.functions.minhash import band_keys_oracle_cte

    cte, bk = band_keys_oracle_cte(
        "conv_docs", id_col="conv_id", num_hashes=num_hashes, bands=bands,
        k=k, seed=seed,
    )
    return f"""
        WITH conv_docs AS (
          SELECT conv_id,
                 string_agg(coalesce(text, ''), chr(10)
                            ORDER BY turn_idx) AS text
          FROM read_parquet('{corpus_dir}/transcripts.parquet')
          GROUP BY conv_id),
        {cte}
        SELECT a.doc_id AS conv_lo, b.doc_id AS conv_hi,
               count(*)::BIGINT AS n_bands
        FROM {bk} a
        JOIN {bk} b ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# exact substring dedup: duplicate-passage REMOVAL (Lee et al. 2021)
# ---------------------------------------------------------------------------

_RDS_W = 5  # words per duplicated-passage gram


def _rds_tokens(texts):
    """(flat non-empty tokens StringArray, per-row token counts int64[]) —
    the oracle's ``regexp_extract_all(text, '\\S+')`` tokenization."""
    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    per_row = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    nrows = len(per_row)
    row = np.repeat(np.arange(nrows, dtype=np.int64), per_row)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    flat = flat.filter(pa.array(keep))
    row = row[keep]
    counts = np.bincount(row, minlength=nrows).astype(np.int64)
    return flat.cast(pa.string()), counts


def _rds_ranges(ng: np.ndarray) -> np.ndarray:
    """Concatenated aranges: [0..ng[0]-1, 0..ng[1]-1, ...] (int64)."""
    tot = int(ng.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(ng)
    return np.arange(tot, dtype=np.int64) - np.repeat(ends - ng, ng)


_RDS_UNION_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("p", pa.int64()),
    ("text", pa.string()), ("tag", pa.int8()),
])


def _rds_gram_rows(t: pa.Table, w: int) -> pa.Table:
    """Positional w-word-gram rows (gh, doc_id, p) for one batch; gram
    strings are space-joined (collision-free: tokens have no whitespace)
    and hashed with the engine's multilinear string hash."""
    from biomedical_el_ray.functions.hashing import hash64_column

    empty = pa.schema([("gh", pa.int64()), ("doc_id", pa.int64()),
                       ("p", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    flat, counts = _rds_tokens(t["text"])
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    ng = np.maximum(counts - w + 1, 0)
    if ng.sum() == 0:
        return empty
    offs = np.concatenate(([0], np.cumsum(counts)))
    p = _rds_ranges(ng)
    starts = np.repeat(offs[:-1], ng) + p
    cols = [flat.take(pa.array(starts + j)) for j in range(w)]
    grams = pc.binary_join_element_wise(*cols, " ")
    gh = hash64_column(grams).view(np.int64)
    return pa.table({
        "gh": pa.array(gh),
        "doc_id": pa.array(np.repeat(doc, ng)),
        "p": pa.array(p),
    })


def _rds_dup_positions(t: pa.Table) -> pa.Table:
    """One hash partition of gram rows: every occurrence of a given ``gh``
    lands here (keyed repartition), so its run length IS the gram's total
    corpus occurrence count; emit (doc_id, p) only for grams occurring
    >= 2 times, in the tagged-union schema (tag=1, text=null)."""
    empty = _RDS_UNION_SCHEMA.empty_table()
    if t.num_rows == 0:
        return empty
    gh = t["gh"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    p = t["p"].to_numpy(zero_copy_only=False)
    order = np.argsort(gh, kind="stable")
    gh, d, p = gh[order], d[order], p[order]
    starts = np.flatnonzero(np.concatenate(([True], gh[1:] != gh[:-1])))
    runlen = np.diff(np.append(starts, gh.size))
    dup = np.repeat(runlen >= 2, runlen)
    d, p = d[dup], p[dup]
    n = len(d)
    return pa.Table.from_arrays(
        [pa.array(d), pa.array(p),
         pa.array([None] * n, pa.string()),
         pa.array(np.ones(n, np.int8))],
        schema=_RDS_UNION_SCHEMA,
    )


def _rds_tag_docs(t: pa.Table) -> pa.Table:
    return pa.Table.from_arrays(
        [t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray)
         else t["doc_id"],
         pa.array(np.full(t.num_rows, -1, np.int64)),
         pc.fill_null(t["text"], "").combine_chunks()
         if isinstance(t["text"], pa.ChunkedArray) else pc.fill_null(t["text"], ""),
         pa.array(np.zeros(t.num_rows, np.int8))],
        schema=_RDS_UNION_SCHEMA,
    )


def _rds_rebuild(t: pa.Table, w: int) -> pa.Table:
    """One doc-keyed partition of the tagged union: paint covered-token
    masks from the duplicated gram starts (interval diff + cumsum — each
    gram's +1/-1 stays inside its own document, so one global cumsum is
    sound) and rebuild clean text through ONE Arrow ``binary_join``."""
    empty = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string()),
                       ("n_tokens", pa.int64()),
                       ("n_removed", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    tag = t["tag"].to_numpy(zero_copy_only=False)
    docs = t.filter(pa.array(tag == 0)).sort_by("doc_id")
    if docs.num_rows == 0:
        return empty
    dups = t.filter(pa.array(tag == 1))
    flat, counts = _rds_tokens(docs["text"])
    doc_ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    offs = np.concatenate(([0], np.cumsum(counts)))
    diff = np.zeros(int(offs[-1]) + 1, np.int64)
    if dups.num_rows:
        dd = dups["doc_id"].to_numpy(zero_copy_only=False)
        pp = dups["p"].to_numpy(zero_copy_only=False)
        ri = np.searchsorted(doc_ids, dd)
        np.add.at(diff, offs[ri] + pp, 1)
        np.add.at(diff, offs[ri] + np.minimum(pp + w, counts[ri]), -1)
    covered = np.cumsum(diff[:-1]) > 0
    cum = np.concatenate(([0], np.cumsum(covered)))
    removed = (cum[offs[1:]] - cum[offs[:-1]]).astype(np.int64)
    kept_flat = flat.filter(pa.array(~covered))
    new_offsets = np.concatenate(
        ([0], np.cumsum(counts - removed))).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_flat)
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "clean_text": pc.binary_join(la, " "),
        "n_tokens": pa.array(counts),
        "n_removed": pa.array(removed),
    })


def remove_dup_spans(sf_dir: str, w: int = _RDS_W):
    """(doc_id, clean_text, n_tokens, n_removed) — exact substring dedup
    as a TRANSFORM: rewrite every document with its cross-corpus
    duplicated passages removed (Lee et al. 2021, arXiv:2107.06499 —
    ``dup_span_stats`` is the read-only profile of the same signal; this
    is the rewrite it gates).  A token is removed iff it is inside any
    ``w``-word gram whose space-joined form occurs >= 2 times anywhere in
    the corpus (any document, any position — in-document repetition
    counts, as in the paper); remaining tokens are re-joined with single
    spaces (whitespace is normalized by design, like the paper's
    tokenized-text operation).

    Scale shape: the gram census moves (hash, doc_id, p) rows — 24 B per
    token, never text — through ONE keyed repartition on the gram hash,
    where the occurrence count is an in-task run length; only DUPLICATED
    positions (the rare case in clean corpora) re-shuffle, riding a
    tagged union with the documents through ONE doc-keyed repartition
    whose task paints coverage masks and rebuilds text vectorized.
    Duplication is defined on the 64-bit gram hash (both sides of the
    oracle compare use the identical multilinear hash, so a collision —
    ~n²/2⁶⁴ — degrades to a spurious removal, never a mismatch).  The
    DuckDB twin holds for grams <= 64 utf-8 bytes (the short-string hash
    class; w=5 of the corpus's <= 8-byte tokens is bounded at 44).

    Ref analog: the reference drops >512-token duplicate-heavy rows
    whole (utils_e2e_span.py:312-318); this removes the duplicated span
    and keeps the document.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    gram_rows = ensure_hash_shuffle(docs.map_batches(
        _rds_gram_rows, fn_kwargs={"w": w},
        batch_format="pyarrow", zero_copy_batch=True,
    ))
    dup_pos = gram_rows.repartition(
        shuffle_partitions(), keys=["gh"]
    ).map_batches(
        _rds_dup_positions, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    tagged = dup_pos.union(docs.map_batches(
        _rds_tag_docs, batch_format="pyarrow", zero_copy_batch=True))
    return ensure_hash_shuffle(tagged).repartition(
        shuffle_partitions(), keys=["doc_id"]
    ).map_batches(
        _rds_rebuild, fn_kwargs={"w": w},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def remove_dup_spans_oracle_sql(docs_rel: str = "documents",
                                w: int = _RDS_W) -> str:
    """DuckDB twin: lateral-range gram enumeration, the multilinear
    short-string hash CTE, HAVING-count duplicate set, covered positions
    by a range() fan-out, ordered string_agg rebuild."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    h_cte, h_rel = hash64_short_cte("gr", ["doc_id", "p"], "rds")
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS tk
          FROM {docs_rel}),
        ex AS MATERIALIZED (
          SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
          FROM toks),
        gr AS MATERIALIZED (
          SELECT e.doc_id, e.i AS p,
                 array_to_string(
                   t.tk[CAST(e.i AS INTEGER):CAST(e.i + {w - 1} AS INTEGER)],
                   ' ') AS tok
          FROM ex e JOIN toks t USING (doc_id)
          WHERE e.i <= len(t.tk) - {w} + 1),
        {h_cte},
        hv AS MATERIALIZED (SELECT doc_id, p, h FROM {h_rel}),
        dup AS (SELECT h FROM hv GROUP BY h HAVING count(*) >= 2),
        cov AS (
          SELECT DISTINCT g.doc_id, g.p + o.j AS i
          FROM hv g JOIN dup USING (h), range({w}) o(j)),
        kept AS (
          SELECT e.doc_id, e.i, e.tok
          FROM ex e LEFT JOIN cov c ON c.doc_id = e.doc_id AND c.i = e.i
          WHERE c.doc_id IS NULL),
        agg AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
          FROM kept GROUP BY doc_id),
        rem AS (SELECT doc_id, count(*) AS nrem FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(r.nrem, 0) AS BIGINT) AS n_removed
        FROM toks t
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN rem r USING (doc_id)
    """

"""Deterministic sampling operators (T4/T5 analogs).

The reference draws per-epoch uniform negatives with ``random.sample``
(/root/reference/utils_e2e_span.py:345,460) and shuffles training rows with
``RandomSampler`` (/root/reference/run_e2e_span.py:79).  At cluster scale,
determinism across runs AND parallelism levels requires key-derived
sampling, not RNG state: a row is kept iff a stable hash of its key falls
under the rate threshold.  md5 is the hash here because DuckDB exposes the
identical kernel, making the sample DuckDB-oracle checkable; the engine's
hot paths use splitmix64 (functions/hashing.py) for the same pattern.

For the T5 shuffle analog, ``shuffled_examples`` assigns every row a
seeded md5 sort key and a GLOBAL permutation rank — reproducible at any
parallelism level and any block layout, which ``ds.random_shuffle(seed)``
is not (its permutation depends on block boundaries).  A new epoch is a
new seed, the data-plane form of the reference's per-epoch
``RandomSampler`` reshuffle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from biomedical_el_ray.sources.readers import read_table

# keep a doc iff the first two hex chars of md5(doc_id) sort below this —
# 26/256 ~ 10.2% deterministic sample
SAMPLE_CUTOFF = "1a"


def md5_prefix(values: list) -> list[str]:
    return [hashlib.md5(str(v).encode()).hexdigest()[:2] for v in values]


def balanced_sample(sf_dir: str, per_source: int = 50):
    """(doc_id, source, rk): at most ``per_source`` docs per source,
    chosen by deterministic hash rank — the domain-balancing resample a
    training-data pipeline uses to downweight over-represented sources.

    One keyed hash repartition co-locates each source's docs; the in-task
    rank is a vectorized sort by (md5(doc_id), doc_id), so the same rows
    survive at any parallelism level.  DuckDB oracle:
    ``balanced_sample_oracle_sql``.
    """
    import numpy as np

    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = ensure_hash_shuffle(read_table(sf_dir, "documents", ["doc_id", "source"]))

    def _cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.schema(
                [("doc_id", pa.int64()), ("source", pa.string()),
                 ("rk", pa.int64())]
            ).empty_table()
        ids = t["doc_id"].to_pylist()
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        hx = np.asarray(
            [hashlib.md5(str(v).encode()).hexdigest() for v in ids], dtype=object
        )
        order = np.lexsort((np.asarray(ids), hx, src))
        # rank within source along the sorted order
        s_sorted = src[order]
        change = np.empty(len(order), dtype=bool)
        if len(order):
            change[0] = True
            change[1:] = s_sorted[1:] != s_sorted[:-1]
        starts = np.cumsum(change) - 1
        first_pos = np.flatnonzero(change)
        rk = np.arange(len(order)) - first_pos[starts] + 1
        keep = order[rk <= per_source]
        out = t.take(pa.array(keep))
        return pa.Table.from_arrays(
            [
                out["doc_id"], out["source"],
                pa.array(rk[rk <= per_source].astype("int64"), pa.int64()),
            ],
            names=["doc_id", "source", "rk"],
        )

    return docs.repartition(shuffle_partitions(), keys=["source"]).map_batches(
        _cap, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def balanced_sample_oracle_sql(docs_rel: str = "documents",
                               per_source: int = 50) -> str:
    """DuckDB SQL equivalent of ``balanced_sample``."""
    return f"""
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM {docs_rel})
        WHERE rk <= {per_source}
    """


def sample_documents(sf_dir: str, cutoff: str = SAMPLE_CUTOFF):
    """(doc_id, h2): ~10% deterministic hash sample of the documents table.

    Same rows at any parallelism level and block split — the property the
    reference's ``random.sample`` lacks (fresh draws per epoch,
    utils_e2e_span.py:345)."""
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h2 = md5_prefix(ids)
        mask = pa.array([h < cutoff for h in h2], pa.bool_())
        out = pa.Table.from_arrays(
            [t["doc_id"], pa.array(h2, pa.string())], names=["doc_id", "h2"]
        )
        return out.filter(mask)

    return docs.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def dataset_split(sf_dir: str, valid_pct: int = 10, test_pct: int = 10):
    """(doc_id, split) — deterministic train/valid/test assignment.

    The split is a pure function of the row key (md5 hex ranges over the
    first two digits: test < valid < train), so it is identical at any
    parallelism level, any row order, and across re-runs — the property a
    training pipeline needs so that re-sharding the corpus never leaks
    validation rows into train.  Streaming, no shuffle.  DuckDB oracle:
    ``dataset_split_oracle_sql``.

    Granularity: split fractions are realised on the first two md5 hex
    digits, i.e. rounded DOWN to multiples of 1/256 (10% -> 25/256 =
    9.77%).  ``test_pct + valid_pct`` must stay below 100: at >= 100 the
    cutoff would need three hex digits and the two-digit lexicographic
    compare would silently route every row to train.
    """
    if not (0 <= test_pct and 0 <= valid_pct and test_pct + valid_pct < 100):
        raise ValueError(
            "dataset_split requires 0 <= test_pct, 0 <= valid_pct and "
            f"test_pct + valid_pct < 100 (got test={test_pct}, valid={valid_pct})"
        )
    t_hi = f"{test_pct * 256 // 100:02x}"
    v_hi = f"{(test_pct + valid_pct) * 256 // 100:02x}"

    def _split(t: pa.Table) -> pa.Table:
        hx = md5_prefix(t["doc_id"].to_pylist())
        split = [
            "test" if h < t_hi else ("valid" if h < v_hi else "train") for h in hx
        ]
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(split, pa.string())], names=["doc_id", "split"]
        )

    return read_table(sf_dir, "documents", ["doc_id"]).map_batches(
        _split, batch_format="pyarrow", zero_copy_batch=True
    )


def dataset_split_oracle_sql(docs_rel: str = "documents",
                             valid_pct: int = 10, test_pct: int = 10) -> str:
    t_hi = f"{test_pct * 256 // 100:02x}"
    v_hi = f"{(test_pct + valid_pct) * 256 // 100:02x}"
    return f"""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{t_hi}'
                    THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{v_hi}'
                    THEN 'valid'
                    ELSE 'train' END AS split
        FROM {docs_rel}
    """


def shuffled_examples(sf_dir: str, seed: int = 42):
    """(doc_id, rk) — seeded GLOBAL shuffle permutation of the documents
    table (T5-analog of the reference's per-epoch RandomSampler,
    /root/reference/run_e2e_span.py:79; a new epoch passes a new seed).

    Permutation = ascending order of ``md5(seed || ':' || doc_id)``.
    Ranks are computed without a global sort bottleneck: the first two
    hex digits bucket every row into 256 ranges whose counts (a tiny
    groupby) prefix-sum into bucket offsets; one keyed repartition per
    bucket then ranks locally (offset + in-task sort position).  The
    result is identical at any parallelism level and any input block
    layout — the property ``ds.random_shuffle(seed)`` lacks, since its
    permutation depends on block boundaries.  DuckDB oracle:
    ``shuffled_examples_oracle_sql`` (row_number over the same key).
    """
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.util import (
        drop_empty_blocks, ensure_hash_shuffle, shuffle_partitions,
    )

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hk = [
            hashlib.md5(f"{seed}:{v}".encode()).hexdigest() for v in ids
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(hk, pa.string()),
                pa.array([h[:2] for h in hk], pa.string()),
            ],
            names=["doc_id", "hkey", "bucket"],
        )

    keyed = docs.map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # bucket counts -> exclusive prefix offsets (256 rows, bounded)
    counts = {
        r["bucket"]: r["count()"]
        for r in drop_empty_blocks(keyed.groupby("bucket").count()).take_all()
    }
    offsets: dict[str, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    def _rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("rk", pa.int64())]
            ).empty_table()
        idx = pc.sort_indices(
            t, sort_keys=[("hkey", "ascending"), ("doc_id", "ascending")]
        )
        t = t.take(idx)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        n = len(bk)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(change)
        rid = np.cumsum(change) - 1
        base = np.array([offsets[b] for b in bk[starts]], dtype=np.int64)
        rk = base[rid] + (np.arange(n) - starts[rid]) + 1
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(rk)], names=["doc_id", "rk"]
        )

    return ensure_hash_shuffle(keyed).repartition(
        shuffle_partitions(), keys=["bucket"]
    ).map_batches(
        _rank,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def shuffled_examples_oracle_sql(docs_rel: str = "documents",
                                 seed: int = 42) -> str:
    return f"""
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM {docs_rel}
    """


def mixture_sample(sf_dir: str, target_pct: int = 30):
    """(doc_id, source): a deterministic mixture re-weighting sample —
    sources are drawn proportional to sqrt(char mass) (temperature
    alpha=0.5), the Pile/Dolma-style mixing step that upweights small
    sources and tempers huge ones before training.

    Plan (scale-first):
    1. a bounded ``groupby(source)`` computes (n_docs, char_mass) per
       source — output rows = source cardinality, never data-sized;
    2. the driver turns those into per-source integer hash thresholds:
       weight w_s = floor(sqrt(char_mass)), source budget
       d_s = floor(T * w_s / sum(w)) docs (T = total * target_pct / 100),
       threshold t_s = floor(65536 * d_s / n_s) compared against the
       first four md5 hex digits of doc_id — all-integer arithmetic so
       DuckDB reproduces every boundary bit-for-bit;
    3. one streaming ``map_batches`` filter applies the thresholds — no
       shuffle of document rows at all, and the same rows survive at any
       parallelism level or block layout.

    A source whose budget exceeds its row count keeps every row (hash
    sampling is without replacement; upsampling is an epoch-repeat
    concern, not a sampling one).  DuckDB oracle:
    ``mixture_sample_oracle_sql``.
    """
    from ray.data.aggregate import Count, Sum

    from biomedical_el_ray.util import drop_empty_blocks

    docs = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    stats = drop_empty_blocks(
        docs.groupby("source").aggregate(Sum("n_chars"), Count())
    ).take_all()  # bounded: one row per source
    import math

    n_s = {r["source"]: int(r["count()"]) for r in stats}
    w_s = {r["source"]: math.floor(math.sqrt(float(r["sum(n_chars)"])))
           for r in stats}
    total = sum(n_s.values())
    sw = sum(w_s.values())
    T = total * target_pct // 100
    thr: dict[str, str] = {}
    for s in n_s:
        d = T * w_s[s] // sw
        t = 65536 * d // n_s[s]
        # 'zzzz' sorts above every hex string: keep-all sentinel
        thr[s] = "zzzz" if t >= 65536 else f"{t:04x}"

    def _keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        src = t["source"].to_pylist()
        h4 = [hashlib.md5(str(v).encode()).hexdigest()[:4] for v in ids]
        mask = pa.array(
            [h < thr[s] for h, s in zip(h4, src)], pa.bool_()
        )
        return pa.Table.from_arrays(
            [t["doc_id"], t["source"]], names=["doc_id", "source"]
        ).filter(mask)

    return docs.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample_oracle_sql(docs_rel: str = "documents",
                              target_pct: int = 30) -> str:
    """Exact DuckDB twin of ``mixture_sample`` (same integer thresholds)."""
    return f"""
        WITH stats AS (
          SELECT source, count(*) AS n_s,
                 CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE))) AS BIGINT)
                   AS w_s
          FROM {docs_rel} GROUP BY source),
        tot AS (
          SELECT sum(n_s) AS total, sum(w_s) AS sw FROM stats),
        q AS (
          SELECT source, n_s,
                 (SELECT total FROM tot) * {target_pct} // 100 * w_s
                   // (SELECT sw FROM tot) AS d_s
          FROM stats),
        thr AS (
          SELECT source,
                 CASE WHEN 65536 * d_s // n_s >= 65536 THEN 'zzzz'
                      ELSE printf('%04x', CAST(65536 * d_s // n_s AS BIGINT))
                 END AS t_hex
          FROM q)
        SELECT d.doc_id, d.source
        FROM {docs_rel} d JOIN thr USING (source)
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < t_hex
    """

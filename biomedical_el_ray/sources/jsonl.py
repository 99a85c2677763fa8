"""JSONL document / mention sources and sinks (S3/S4/K1-analogs).

The reference round-trips its preprocessed corpus as JSONL:
``documents.json`` holds one ``{document_id, text}`` object per line
(/root/reference/data_preprocessing.py:185-189, read back at
utils_e2e_span.py:34-41); ``mentions.json`` holds one JSON ARRAY per line —
all mentions of one document — keyed by the first element's
``content_document_id`` (/root/reference/data_preprocessing.py:74-81,
utils_e2e_span.py:44-58).  Here the same shapes stream through
``ray.data.read_json`` / ``map_batches`` writers; the array-per-line
mention file is exploded by a ``flat_map``-style batch transform.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

MENTION_COLS = [
    "mention_id", "start_index", "end_index", "text", "type",
    "content_document_id", "label_candidate_id",
]


def read_documents_jsonl(path: str):
    """documents.json -> Dataset (document_id, text)."""
    return ray.data.read_json(path)


def write_documents_jsonl(ds, path: str) -> None:
    """Dataset (document_id, text) -> one JSONL file (driver-streamed;
    use ``ds.write_json`` for a sharded directory at scale)."""
    with open(path, "w") as f:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            ids = batch["document_id"].to_pylist()
            texts = batch["text"].to_pylist()
            for i, t in zip(ids, texts):
                f.write(json.dumps({"document_id": i, "text": t}) + "\n")


def read_mentions_jsonl(path: str):
    """mentions.json (one ARRAY of mention objects per line) -> exploded
    Dataset with one row per mention (S4 explode)."""

    def _explode(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {c: [] for c in MENTION_COLS}
        for line in batch["text"].to_pylist():
            line = line.strip()
            if not line:
                continue
            for m in json.loads(line):
                for c in MENTION_COLS:
                    cols[c].append(m.get(c))
        return pa.table(
            {
                "mention_id": pa.array(cols["mention_id"], pa.string()),
                "start_index": pa.array(cols["start_index"], pa.int32()),
                "end_index": pa.array(cols["end_index"], pa.int32()),
                "text": pa.array(cols["text"], pa.string()),
                "type": pa.array(cols["type"], pa.string()),
                "content_document_id": pa.array(
                    cols["content_document_id"], pa.string()
                ),
                "label_candidate_id": pa.array(
                    cols["label_candidate_id"], pa.string()
                ),
            }
        )

    return ray.data.read_text(path).map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True
    )


def write_mentions_jsonl(mentions_ds, path: str) -> None:
    """Mention rows -> one JSON array per document per line (K1-analog).

    Scale shape: ONE keyed repartition on a document-id hash, then an
    in-task vectorized pass — sort by (content_document_id, start_index),
    shifted-compare run detection, one JSON array serialized per document
    run (no per-group pandas frames); only the finished lines stream to
    the driver file.
    """
    import numpy as np
    import pyarrow.compute as pc

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    def _dkey(t: pa.Table) -> pa.Table:
        dk = hash64_column(t["content_document_id"]).view(np.int64)
        return t.append_column("dkey", pa.array(dk, pa.int64()))

    def _pack(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string())],
            names=["doc", "line"],
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("content_document_id", "ascending"), ("start_index", "ascending")]
        )
        doc = t["content_document_id"].combine_chunks()
        n = t.num_rows
        brk = np.ones(n, bool)
        brk[1:] = ~pc.equal(
            doc.slice(1), doc.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        # record keys: the reference's mention shape first, then any extra
        # input columns (minus the partition key)
        names = [c for c in MENTION_COLS if c in t.column_names] + [
            c for c in t.column_names if c not in MENTION_COLS and c != "dkey"
        ]
        cols = {c: t[c].to_pylist() for c in names}
        lines = [
            json.dumps([{c: cols[c][i] for c in names} for i in range(lo, hi)])
            for lo, hi in zip(starts.tolist(), ends.tolist())
        ]
        return pa.Table.from_arrays(
            [doc.take(starts), pa.array(lines, pa.string())],
            names=["doc", "line"],
        )

    packed = (
        ensure_hash_shuffle(
            mentions_ds.map_batches(
                _dkey, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .repartition(shuffle_partitions(), keys=["dkey"])
        .map_batches(
            _pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    with open(path, "w") as f:
        for batch in packed.sort("doc").iter_batches(batch_format="pyarrow"):
            for line in batch["line"].to_pylist():
                f.write(line + "\n")

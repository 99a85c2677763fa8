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

    Groups by ``content_document_id`` (small eval-side output; the
    grouping runs in Ray, only the serialized lines stream to the
    driver file).
    """
    import pandas as pd

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["content_document_id"].iloc[0]
        recs = df.sort_values("start_index").to_dict("records")
        return pd.DataFrame({"doc": [doc], "line": [json.dumps(recs)]})

    packed = mentions_ds.groupby("content_document_id").map_groups(
        _pack, batch_format="pandas"
    )
    with open(path, "w") as f:
        for batch in packed.sort("doc").iter_batches(batch_format="pyarrow"):
            for line in batch["line"].to_pylist():
                f.write(line + "\n")

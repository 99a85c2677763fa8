"""JSONL sources/sinks (S3/S4/K1) and the eval-TSV sink (K3)."""

import json

import pyarrow as pa
import ray.data

from biomedical_el_ray.pipelines.eval_output import write_eval_tsv
from biomedical_el_ray.sources.jsonl import (
    read_documents_jsonl,
    read_mentions_jsonl,
    write_documents_jsonl,
    write_mentions_jsonl,
)


def test_documents_jsonl_roundtrip(tmp_path):
    docs = ray.data.from_arrow(
        pa.table({"document_id": ["d1", "d2"], "text": ["alpha beta", "gamma"]})
    )
    p = tmp_path / "documents.json"
    write_documents_jsonl(docs, str(p))
    lines = [json.loads(x) for x in p.read_text().splitlines()]
    assert lines == [
        {"document_id": "d1", "text": "alpha beta"},
        {"document_id": "d2", "text": "gamma"},
    ]
    back = read_documents_jsonl(str(p))
    assert sorted(r["document_id"] for r in back.take_all()) == ["d1", "d2"]


def test_mentions_jsonl_roundtrip(tmp_path):
    rows = [
        {"mention_id": "m1", "start_index": 0, "end_index": 5, "text": "alpha",
         "type": "T", "content_document_id": "d1", "label_candidate_id": "E1"},
        {"mention_id": "m2", "start_index": 6, "end_index": 10, "text": "beta",
         "type": "T", "content_document_id": "d1", "label_candidate_id": "E2"},
        {"mention_id": "m3", "start_index": 0, "end_index": 5, "text": "gamma",
         "type": "T", "content_document_id": "d2", "label_candidate_id": "E1"},
    ]
    ds = ray.data.from_items(rows)
    p = tmp_path / "mentions.json"
    write_mentions_jsonl(ds, str(p))
    lines = p.read_text().splitlines()
    assert len(lines) == 2  # one ARRAY per document (reference line shape)
    assert [m["mention_id"] for m in json.loads(lines[0])] == ["m1", "m2"]
    exploded = read_mentions_jsonl(str(p))
    got = sorted(r["mention_id"] for r in exploded.take_all())
    assert got == ["m1", "m2", "m3"]
    r1 = next(r for r in exploded.take_all() if r["mention_id"] == "m1")
    assert (r1["start_index"], r1["end_index"], r1["content_document_id"]) == (0, 5, "d1")


def test_write_eval_tsv_sorted(tmp_path):
    ds = ray.data.from_items(
        [
            {"doc": "d2", "s": 3, "e": 9, "ent": "E7", "p": 0.5},
            {"doc": "d1", "s": 10, "e": 12, "ent": "E2", "p": 0.9},
            {"doc": "d1", "s": 2, "e": 5, "ent": "E1", "p": 0.8},
        ]
    )
    p = tmp_path / "pred.csv"
    n = write_eval_tsv(ds, str(p), "doc", "s", "e", "ent", "p")
    assert n == 3
    lines = [x.split("\t") for x in p.read_text().splitlines()]
    # sorted by (doc_id, start); reference row shape incl. trailing NA
    assert [(l[0], int(l[1])) for l in lines] == [("d1", 2), ("d1", 10), ("d2", 3)]
    assert lines[0] == ["d1", "2", "5", "E1", "0.8", "NA"]

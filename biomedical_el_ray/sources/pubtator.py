"""PubTator corpus source (S1-analog — the reference's own input format).

The reference parses PubTator files line-by-line in a single process
(/root/reference/data_preprocessing.py:25-84): document lines
``docid|t|title`` / ``docid|a|abstract`` (title+abstract joined with a
space, :34-43) and 6-column TSV mention lines
``doc_id  start  end  text  type  concept_id`` (:46-64), dropping label
``-1`` rows (:48-49) and normalizing compound concept ids ``A+B``/``A|B``
to the first id (:65-68), validating ``0 <= start <= end`` (:57-59).

Here the same grammar runs as a stateless ``map_batches`` over
``ray.data.read_text`` lines — embarrassingly parallel; only the
title+abstract assembly needs a ``groupby(document_id)``.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data

_DOC_RE = re.compile(r"^(\S+)\|([ta])\|(.*)$")  # data_preprocessing.py:17 analog


def classify_lines(batch: pa.Table) -> pa.Table:
    """text lines -> tagged rows (kind: 'doc'|'mention', parsed fields)."""
    doc_id, kind, seg, text = [], [], [], []
    m_doc, m_start, m_end, m_text, m_type, m_cid = [], [], [], [], [], []
    for line in batch["text"].to_pylist():
        if not line or not line.strip():
            continue
        m = _DOC_RE.match(line)
        if m:
            doc_id.append(m.group(1))
            kind.append(m.group(2))
            seg.append(m.group(2))
            text.append(m.group(3))
            continue
        cols = line.rstrip("\n").split("\t")
        if len(cols) != 6:
            continue
        d, s, e, t, ty, cid = cols
        if cid == "-1":  # M2: dropped labels (data_preprocessing.py:48-49)
            continue
        s_i, e_i = int(s), int(e)
        if not (0 <= s_i <= e_i):  # M4 offset validation (:57-59)
            continue
        # M3: compound concept-id normalization (:65-68)
        cid = re.split(r"[+|]", cid)[0]
        m_doc.append(d)
        m_start.append(s_i)
        m_end.append(e_i)
        m_text.append(t)
        m_type.append(ty)
        m_cid.append(cid)
    docs = pa.table(
        {
            "document_id": pa.array(doc_id, pa.string()),
            "segment": pa.array(seg, pa.string()),
            "seg_text": pa.array(text, pa.string()),
        }
    )
    mentions = pa.table(
        {
            "document_id": pa.array(m_doc, pa.string()),
            "start": pa.array(m_start, pa.int32()),
            "end": pa.array(m_end, pa.int32()),
            "text": pa.array(m_text, pa.string()),
            "type": pa.array(m_type, pa.string()),
            "concept_id": pa.array(m_cid, pa.string()),
        }
    )
    return docs, mentions


def _doc_rows(batch: pa.Table) -> pa.Table:
    return classify_lines(batch)[0]


def _mention_rows(batch: pa.Table) -> pa.Table:
    return classify_lines(batch)[1]


def read_pubtator(path: str):
    """PubTator file(s) -> (documents Dataset, mentions Dataset).

    documents: (document_id, text) with text = title + ' ' + abstract
    (reference semantics, data_preprocessing.py:34-43);
    mentions: (document_id, start, end, text, type, concept_id).
    """
    lines = ray.data.read_text(path)

    def _assemble(df: pd.DataFrame) -> pd.DataFrame:
        by_seg = dict(zip(df["segment"], df["seg_text"]))
        text = " ".join(x for x in (by_seg.get("t"), by_seg.get("a")) if x is not None)
        return pd.DataFrame(
            {"document_id": [df["document_id"].iloc[0]], "text": [text]}
        )

    docs = (
        lines.map_batches(_doc_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("document_id")
        .map_groups(_assemble, batch_format="pandas")
    )
    mentions = lines.map_batches(
        _mention_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return docs, mentions

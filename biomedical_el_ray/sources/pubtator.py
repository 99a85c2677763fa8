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
title+abstract assembly moves data (ONE keyed repartition on the
document-id hash, assembly fully vectorized in-task).
"""

from __future__ import annotations

import re

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


def _assemble_docs(t: pa.Table) -> pa.Table:
    """Vectorized per-partition title+abstract assembly (collapse_turns
    pattern): sort by (document_id, segment DESC, seg_text ASC) so 't'
    precedes 'a', detect document runs with a shifted compare, and
    rebuild each document's text through ONE Arrow ``binary_join`` — no
    per-document pandas frames, no Python loop over rows.

    Malformed-input rule (documented per ADVICE r4; well-formed PubTator
    — one ``|t|`` and one ``|a|`` line per doc — never hits either):
    duplicate (document_id, segment) lines keep the lexicographically
    SMALLEST seg_text (seg_text is in the sort key, so the survivor is
    deterministic at any partitioning — the prior "first row in
    partition order" rule was not); null seg_text rows are DROPPED
    before assembly (reference skip semantics,
    data_preprocessing.py:34-43 — no stray joiner space).  Empty-string
    segments (``docid|a|``) still join, matching the reference's
    unconditional ``title + ' ' + abstract``."""
    import numpy as np
    import pyarrow.compute as pc

    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.string())],
        names=["document_id", "text"],
    )
    if t.num_rows == 0:
        return empty
    if t["seg_text"].null_count:
        t = t.filter(pc.is_valid(t["seg_text"]))
        if t.num_rows == 0:
            return empty
    t = t.sort_by([("document_id", "ascending"), ("segment", "descending"),
                   ("seg_text", "ascending")])
    doc = t["document_id"].combine_chunks()
    seg = t["segment"].combine_chunks()
    n = t.num_rows
    doc_brk = np.ones(n, bool)
    doc_brk[1:] = ~pc.equal(
        doc.slice(1), doc.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    seg_brk = np.ones(n, bool)
    seg_brk[1:] = ~pc.equal(
        seg.slice(1), seg.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    keep = doc_brk | seg_brk  # first row of each (doc, segment) run
    if not keep.all():
        t = t.filter(pa.array(keep))
        doc = t["document_id"].combine_chunks()
        n = t.num_rows
        doc_brk = np.ones(n, bool)
        doc_brk[1:] = ~pc.equal(
            doc.slice(1), doc.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(doc_brk)
    counts = np.append(starts[1:], n) - starts
    offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
    seg_text = t["seg_text"].combine_chunks()
    joined = pc.binary_join(pa.ListArray.from_arrays(offsets, seg_text), " ")
    return pa.Table.from_arrays(
        [doc.take(starts), joined], names=["document_id", "text"]
    )


def read_pubtator(path: str):
    """PubTator file(s) -> (documents Dataset, mentions Dataset).

    documents: (document_id, text) with text = title + ' ' + abstract
    (reference semantics, data_preprocessing.py:34-43);
    mentions: (document_id, start, end, text, type, concept_id).

    Scale shape: the title+abstract assembly is ONE keyed repartition on
    a document-id hash followed by a fully vectorized in-task pass (sort +
    run detection + ``binary_join``) — the same pattern as
    ``transcripts_queries.collapse_turns`` — instead of a per-document
    ``map_groups`` pandas frame.
    """
    import numpy as np

    from biomedical_el_ray.functions.hashing import hash64_column
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    lines = ray.data.read_text(path)

    def _dkey(t: pa.Table) -> pa.Table:
        dk = hash64_column(t["document_id"]).view(np.int64)
        return t.append_column("dkey", pa.array(dk, pa.int64()))

    doc_rows = ensure_hash_shuffle(
        lines.map_batches(_doc_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_dkey, batch_format="pyarrow", zero_copy_batch=True)
    )
    docs = (
        doc_rows.repartition(shuffle_partitions(), keys=["dkey"])
        .map_batches(
            _assemble_docs, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
    )
    mentions = lines.map_batches(
        _mention_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return docs, mentions

"""Entity-KB TSV reader — the reference's S2 source format.

The reference loads ``entities.txt`` as a driver dict
(/root/reference/utils_e2e_span.py:25-32): BC5CDR lines are 2-col
``entity_id\\tname``; every other dataset is 3-col
``entity_id\\t_\\tname`` (middle column ignored), selected by a
path-substring dispatch (utils_e2e_span.py:13-24).  Here the file
becomes a small dimension ``Dataset`` (entity_id, name) the linker
broadcasts — and the column-shape dispatch is per LINE, not per path:
2-col and 3-col rows both parse correctly in one pass, which subsumes
the reference's dataset switch.

Scale shape: KBs are the small side by construction (BC5CDR = 29,054
rows), but the parse is still one vectorized Arrow pass per block —
``read_text`` shards large files fine.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _parse_kb_lines(t: pa.Table) -> pa.Table:
    lines = t["text"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    parts = pc.split_pattern(lines, "\t")
    n = pc.list_value_length(parts)
    out = []
    two = parts.filter(pc.equal(n, 2))
    if len(two):
        out.append(pa.Table.from_arrays(
            [pc.list_element(two, 0), pc.list_element(two, 1)],
            names=["entity_id", "name"]))
    three = parts.filter(pc.greater_equal(n, 3))
    if len(three):
        out.append(pa.Table.from_arrays(
            [pc.list_element(three, 0), pc.list_element(three, 2)],
            names=["entity_id", "name"]))
    if not out:
        return pa.schema(
            [("entity_id", pa.string()), ("name", pa.string())]
        ).empty_table()
    return pa.concat_tables(out)


def read_entities_tsv(path: str):
    """``entities.txt`` -> Dataset(entity_id, name); 2- and 3-column
    rows handled per line (ref ``utils_e2e_span.py:25-32``)."""
    import ray

    return ray.data.read_text(path).map_batches(
        _parse_kb_lines, batch_format="pyarrow", zero_copy_batch=True)


def entities_dict(path: str) -> dict[str, str]:
    """Driver-side dict form with the reference's exact last-wins
    duplicate semantics (``entities[e] = text`` in file order; the
    per-row loop is fine here — this is the small-dim driver path, and
    it is byte-faithful to ``utils_e2e_span.py:25-32``)."""
    import ray

    out: dict[str, str] = {}
    for b in ray.data.read_text(path).iter_batches(batch_format="pyarrow"):
        for line in b["text"].to_pylist():
            vals = line.strip().split("\t")
            if len(vals) == 2:
                out[vals[0]] = vals[1]
            elif len(vals) >= 3:
                out[vals[0]] = vals[2]
    return out


def kb_table(path: str) -> pa.Table:
    """Collect the KB as one Arrow table shaped for
    ``pipelines.linking.link_topk`` (entity_id, name) — the broadcast
    small side."""
    ds = read_entities_tsv(path)
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow")))

"""Evaluation TSV sink (K3-analog).

The reference writes ``gold.csv`` / ``pred.csv`` rows
``(doc_id, start, end, entity_id, prob, 'NA')`` for external neleval
scoring (/root/reference/run_e2e_span.py:521-522,589-613).  Here the same
shape is produced from the engine's tables: gold rows from the planted
``gold_mentions`` table, pred rows from the linker's top-1 output — sorted
by the explicit ``(doc, start)`` key (the reference relies on positional
alignment instead, run_e2e_span.py:578-583; Ray Data gives no cross-shuffle
order, so the sort key is part of the contract).
"""

from __future__ import annotations

import pyarrow as pa


def eval_rows(ds, doc_col: str, start_col: str, end_col: str,
              entity_col: str, prob_col: str | None = None):
    """Any mention-shaped Dataset -> (doc_id, start, end, entity_id, prob,
    tag) rows in the reference's eval-TSV shape."""

    def _shape(t: pa.Table) -> pa.Table:
        n = t.num_rows
        prob = (
            t[prob_col]
            if prob_col is not None and prob_col in t.column_names
            else pa.array([1.0] * n, pa.float64())
        )
        return pa.Table.from_arrays(
            [
                t[doc_col], t[start_col], t[end_col], t[entity_col],
                prob, pa.array(["NA"] * n, pa.string()),
            ],
            names=["doc_id", "start", "end", "entity_id", "prob", "tag"],
        )

    return ds.map_batches(_shape, batch_format="pyarrow", zero_copy_batch=True)


def write_eval_tsv(ds, out_path: str, doc_col: str, start_col: str,
                   end_col: str, entity_col: str, prob_col: str | None = None,
                   sep: str = "\t") -> int:
    """Write the reference-shaped eval TSV, sorted by (doc_id, start).

    Returns the row count.  Single-file driver-streamed output (eval
    artifacts are small); use ``ds.write_csv`` for sharded output at scale.
    """
    shaped = eval_rows(ds, doc_col, start_col, end_col, entity_col, prob_col)
    n = 0
    with open(out_path, "w") as f:
        for batch in shaped.sort(["doc_id", "start"]).iter_batches(
            batch_format="pyarrow"
        ):
            docs = batch["doc_id"].to_pylist()
            starts = batch["start"].to_pylist()
            ends = batch["end"].to_pylist()
            ents = batch["entity_id"].to_pylist()
            probs = batch["prob"].to_pylist()
            for d, s, e, en, p in zip(docs, starts, ends, ents, probs):
                f.write(f"{d}{sep}{s}{sep}{e}{sep}{en}{sep}{p}{sep}NA\n")
                n += 1
    return n

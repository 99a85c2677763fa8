"""Pipeline invariants (M4-analog, made first-class).

The reference asserts offset sanity and extracted-text equality inline
(/root/reference/data_preprocessing.py:57-59, utils_e2e_span.py:96) and
silently relies on positional row alignment (/root/reference/
run_e2e_span.py:578-583).  Ray Data gives no cross-shuffle row order, so
this engine replaces positional alignment with explicit invariants:

* ``turn_text_fingerprint`` — an order-independent fingerprint over
  (conv_id, turn_idx, text); equal before/after any stage that claims not
  to modify turns, and equal across parallelism levels (the north rule's
  "per-turn text equality under stable (conv_id, turn_idx) ordering").
* ``check_mention_offsets`` — every mention row satisfies
  ``norm_text[start:end] == surface``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biomedical_el_ray.functions.hashing import hash64_column, splitmix64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def turn_text_fingerprint(ds, text_col: str = "text") -> tuple[int, int]:
    """(xor-of-row-hashes, row_count) over (conv_id, turn_idx, text_col).

    Order-independent, partitioning-independent; one streaming pass.
    """

    def _h(t: pa.Table) -> pa.Table:
        hc = hash64_column(t["conv_id"])
        ht = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hx = hash64_column(t[text_col])
        v = splitmix64(hc ^ (ht * _MIX) ^ splitmix64(hx))
        s = np.uint64(np.bitwise_xor.reduce(v)) if len(v) else np.uint64(0)
        return pa.Table.from_arrays(
            [pa.array([int(s)], pa.uint64()), pa.array([len(v)], pa.int64())],
            names=["sig", "n"],
        )

    acc, n = 0, 0
    for r in ds.map_batches(_h, batch_format="pyarrow", zero_copy_batch=True).take_all():
        acc ^= int(r["sig"])
        n += int(r["n"])
    return acc, n


def check_mention_offsets(mentions_ds, transcripts_norm_ds) -> int:
    """Number of mention rows violating norm_text[start:end] == surface.

    Streaming: one hash join of mentions against (conv_id, turn_idx,
    norm_text), then a per-batch slice-and-compare; only one scalar count
    per batch reaches the driver, so this runs at any table size.  A
    mention whose turn is missing entirely also counts as a violation.
    """
    from biomedical_el_ray.util import shuffle_partitions

    n_mentions = mentions_ds.count()
    turns = transcripts_norm_ds.select_columns(
        ["conv_id", "turn_idx", "norm_text"]
    ).map_batches(
        lambda t: t.rename_columns(["t_conv", "t_turn", "norm_text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = mentions_ds.select_columns(
        ["conv_id", "turn_idx", "start", "end", "surface"]
    ).join(
        turns,
        "inner",
        num_partitions=shuffle_partitions(),
        on=("conv_id", "turn_idx"),
        right_on=("t_conv", "t_turn"),
    )

    def _count(t: pa.Table) -> pa.Table:
        ok = sum(
            1
            for tx, s, e, sf in zip(
                t["norm_text"].to_pylist(),
                t["start"].to_pylist(),
                t["end"].to_pylist(),
                t["surface"].to_pylist(),
            )
            if tx[s:e] == sf
        )
        return pa.Table.from_arrays([pa.array([ok], pa.int64())], names=["n_ok"])

    n_ok = sum(
        int(r["n_ok"])
        for r in joined.map_batches(
            _count, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    return n_mentions - n_ok

"""Fixed-width padded feature export (M9 tag→id encode + M13 pad/truncate).

The reference materializes per-mention fixed-shape feature arrays —
token-id lists padded to a constant length with an attention mask, and
BIO label ids with -100 at ignored positions (CLS/SEP/pad/markers):
/root/reference/utils_e2e_span.py:223-234,312-328 (doc token ids + mask),
:193-199 (tag dict-encode + -100 padding).  This stage recasts that as a
vectorized ``map_batches`` over the ``mention_windows`` output:

* ``input_ids``   fixed_size_list<int32>[SEQ_LEN] — [CLS] + window tokens
                  (hash-vocab ids, markers included) + [SEP] + [PAD]...
* ``attention_mask`` fixed_size_list<int8>[SEQ_LEN] — 1 on real tokens
* ``tag_ids``     fixed_size_list<int32>[SEQ_LEN] — O/B/I = 0/1/2 aligned
                  to input_ids, -100 at CLS/SEP/PAD/[Ms]/[Me] positions

Token→id is the engine's hash-based dict-encode (M12): id = 3 + h(tok)
mod (VOCAB_SIZE-3), reserving 0=PAD, 1=CLS, 2=SEP — process-independent,
no vocab file to ship.  Everything is numpy grid arithmetic over the
whole batch; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.functions.hashing import hash64_arrow

SEQ_LEN = 40       # window (<=32) + 2 markers + CLS/SEP fits with room
VOCAB_SIZE = 1 << 20
PAD_ID, CLS_ID, SEP_ID = 0, 1, 2
IGNORE = -100      # the reference's ignored-label id (utils_e2e_span.py:199)

_TAG_B, _TAG_I, _TAG_O = 1, 2, 0


def mention_features_batch(t: pa.Table, seq_len: int = SEQ_LEN) -> pa.Table:
    """(mention_id, window, tok_start, tok_end, bio) batch -> padded
    fixed-width feature columns.  Fully vectorized."""
    n = t.num_rows
    win = pc.fill_null(t["window"], "")
    # empty windows (degenerate/masked mentions) have zero tokens
    nonempty = pc.not_equal(win, "").to_numpy(zero_copy_only=False)
    split = pc.split_pattern(win, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    raw_len = (
        pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    wlen = np.where(nonempty, raw_len, 0)
    cap = seq_len - 2  # room for CLS + SEP
    kept = np.minimum(wlen, cap)

    flat = split.flatten()
    ids_flat = (
        np.int64(3) + (hash64_arrow(flat) % np.uint64(VOCAB_SIZE - 3)).astype(np.int64)
    )

    # scatter window tokens into the (n, seq_len) grid at cols 1..kept
    grid = np.full((n, seq_len), PAD_ID, dtype=np.int32)
    grid[:, 0] = CLS_ID
    # row start offsets in the FLAT array follow the raw split lengths
    # (an empty window still contributes one '' element to the flatten)
    starts = np.cumsum(raw_len) - raw_len
    rows = np.repeat(np.arange(n, dtype=np.int64), kept)
    intra = np.arange(int(kept.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(kept) - kept, kept
    )
    grid[rows, 1 + intra] = ids_flat[np.repeat(starts, kept) + intra]
    grid[np.arange(n), 1 + kept] = SEP_ID

    cols = np.arange(seq_len, dtype=np.int64)[None, :]
    mask = (cols <= (1 + kept)[:, None]).astype(np.int8)

    # tag grid aligned to input_ids: window cell j (0-based within the
    # marked window) holds [Ms] at tok_start, [Me] at tok_end+1, else the
    # bio tag at index j - (#markers before j)
    ts = t["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)[:, None]
    te = t["tok_end"].to_numpy(zero_copy_only=False).astype(np.int64)[:, None]
    mlen = te - ts
    j = cols - 1  # window position of each grid cell
    valid = (j >= 0) & (j < kept[:, None])
    is_ms = valid & (j == ts) & (mlen > 0)
    is_me = valid & (j == te + 1) & (mlen > 0)
    b = j - (j > ts).astype(np.int64) - (j > te + 1).astype(np.int64)
    tag = np.where(
        (b == ts) & (mlen > 0),
        _TAG_B,
        np.where((b > ts) & (b < te) & (mlen > 0), _TAG_I, _TAG_O),
    )
    tags = np.where(valid & ~is_ms & ~is_me, tag, IGNORE).astype(np.int32)

    def _fsl(a: np.ndarray, typ) -> pa.FixedSizeListArray:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(a.ravel(), typ), seq_len
        )

    return pa.Table.from_arrays(
        [
            t["mention_id"],
            _fsl(grid, pa.int32()),
            _fsl(mask, pa.int8()),
            _fsl(tags, pa.int32()),
        ],
        names=["mention_id", "input_ids", "attention_mask", "tag_ids"],
    )


def mention_features(windows_ds, seq_len: int = SEQ_LEN):
    """mention_windows Dataset -> fixed-width padded feature Dataset."""
    return windows_ds.map_batches(
        mention_features_batch,
        fn_kwargs={"seq_len": seq_len},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

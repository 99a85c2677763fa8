"""Conversation segmentation + mention context windows (M5-M7 analogs).

The reference greedily chunks each document into segments holding at most
8 mentions and fewer than 256 tokens, rebasing mention offsets by the
cumulative segment length and closing a segment when the tentative chunk
would exceed either cap (/root/reference/data_preprocessing.py:90-173,
caps at :99,106, offset rebasing at :119-120,156-157).  It then centers
each mention in a bounded token window flanked by ``[Ms]``/``[Me]``
markers, spilling unused prefix budget into the suffix and vice versa
(/root/reference/utils_e2e_span.py:61-102), and BIO-tags the window
tokens ``O/B/I`` (/root/reference/utils_e2e_span.py:105-163,193-199).

Ray-Data recast: segmentation is a per-conversation greedy fold —
``groupby(conv_id).map_groups`` with an in-group ``turn_idx`` sort (Ray
Data does not preserve row order across shuffles; the sort key makes the
reference's positional assumption explicit, SURVEY.md §2.9).  Windowing
is a stateless ``map_batches`` over mention rows joined with their turn
text.  Both are embarrassingly parallel at 10^12-turn scale; the only
shuffle is the conv_id groupby, whose key count is |conversations|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MAX_SEG_TOKENS = 256   # data_preprocessing.py:106 analog
MAX_SEG_MENTIONS = 8   # data_preprocessing.py:99 analog
WINDOW_TOKENS = 32     # max_mention_window analog (utils_e2e_span.py:63)
# T6-analog: the reference masks candidate spans longer than
# max_mention_length=20 tokens out of inference entirely
# (/root/reference/modeling_e2e_span.py:99-104, default at
# run_e2e_span.py:811); overlong mentions here get the same degenerate
# empty window as span-hits-no-token, so they carry no context downstream
MAX_MENTION_TOKENS = 20
MS, ME = "[Ms]", "[Me]"  # marker tokens added at run_e2e_span.py:999-1002


def greedy_segments(n_tokens: list[int], n_mentions: list[int],
                    max_tokens: int = MAX_SEG_TOKENS,
                    max_mentions: int = MAX_SEG_MENTIONS) -> list[int]:
    """Greedy accumulate-then-check fold -> seg_idx per turn.

    A new segment opens when adding the turn would reach ``max_tokens``
    or exceed ``max_mentions`` — except into an empty segment (an
    overlong single turn still gets a segment of its own, unlike the
    reference which silently DROPS >512-token rows at
    /root/reference/utils_e2e_span.py:312-318 — the anti-pattern SURVEY
    §7 calls out)."""
    seg, tok_acc, men_acc = 0, 0, 0
    out = []
    for t, m in zip(n_tokens, n_mentions):
        if out and (tok_acc + t >= max_tokens or men_acc + m > max_mentions):
            seg += 1
            tok_acc, men_acc = 0, 0
        out.append(seg)
        tok_acc += t
        men_acc += m
    return out


def segment_conversation_group(df: pd.DataFrame) -> pd.DataFrame:
    """One conversation -> per-segment summary rows.

    Input columns: conv_id, turn_idx, n_tokens, n_mentions (one row per
    turn).  Output: (conv_id, seg_idx, turn_lo, turn_hi, n_turns,
    n_tokens, n_mentions)."""
    df = df.sort_values("turn_idx")
    seg = greedy_segments(df["n_tokens"].tolist(), df["n_mentions"].tolist())
    df = df.assign(seg_idx=np.asarray(seg, dtype=np.int64))
    g = df.groupby("seg_idx", sort=True)
    out = g.agg(
        turn_lo=("turn_idx", "min"),
        turn_hi=("turn_idx", "max"),
        n_turns=("turn_idx", "size"),
        n_tokens=("n_tokens", "sum"),
        n_mentions=("n_mentions", "sum"),
    ).reset_index()
    out.insert(0, "conv_id", df["conv_id"].iloc[0])
    for c in ("turn_lo", "turn_hi", "n_turns", "n_tokens", "n_mentions"):
        out[c] = out[c].astype(np.int64)
    return out


_SEGMENT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("seg_idx", pa.int64()),
        ("turn_lo", pa.int64()),
        ("turn_hi", pa.int64()),
        ("n_turns", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_mentions", pa.int64()),
    ]
)


def _segment_partition(t: pa.Table) -> pa.Table:
    """One hash partition (complete conversations) -> segment summaries.

    The greedy fold is inherently sequential WITHIN a conversation, so it
    runs as one plain-scalar pass over the sorted partition with counter
    resets at conversation boundaries; everything around it (sort, run
    detection, per-segment min/max/sum rollup) is numpy.  One task per
    partition — not one pandas DataFrame + agg per conversation, which is
    the per-group-Python anti-pattern at 10^9-conversation scale."""
    if t.num_rows == 0:
        return _SEGMENT_SCHEMA.empty_table()
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = t.take(idx)
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    ntok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    nmen = t["n_mentions"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(conv)
    conv_change = np.empty(n, dtype=bool)
    conv_change[0] = True
    conv_change[1:] = conv[1:] != conv[:-1]
    # greedy accumulate-then-check fold (greedy_segments), resets at conv
    # boundaries; scalar loop over Python lists beats numpy item access here
    seg = np.empty(n, dtype=np.int64)
    s = tok = men = 0
    for i, (new_conv, ti, mi) in enumerate(
        zip(conv_change.tolist(), ntok.tolist(), nmen.tolist())
    ):
        if new_conv:
            s, tok, men = 0, 0, 0
        elif tok + ti >= MAX_SEG_TOKENS or men + mi > MAX_SEG_MENTIONS:
            s += 1
            tok, men = 0, 0
        seg[i] = s
        tok += ti
        men += mi
    change = conv_change.copy()
    change[1:] |= seg[1:] != seg[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return pa.Table.from_arrays(
        [
            pa.array(conv[starts], pa.string()),
            pa.array(seg[starts]),
            pa.array(turn[starts]),
            pa.array(turn[ends - 1]),
            pa.array(ends - starts),
            pa.array(np.add.reduceat(ntok, starts)),
            pa.array(np.add.reduceat(nmen, starts)),
        ],
        schema=_SEGMENT_SCHEMA,
    )


def segment_turns(per_turn_ds):
    """(conv_id, turn_idx, n_tokens, n_mentions) Dataset -> segment summary.

    ONE keyed repartition on conv_id co-locates each conversation's turns,
    then ``_segment_partition`` does sort + fold + rollup in-task."""
    from biomedical_el_ray.util import (
        ensure_hash_shuffle, shuffle_partitions,
    )

    ds = ensure_hash_shuffle(per_turn_ds)
    return ds.repartition(shuffle_partitions(), keys=["conv_id"]).map_batches(
        _segment_partition,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# --------------------------------------------------------------------------
# mention context windows (M6/M7 analog)
# --------------------------------------------------------------------------

def window_one(text: str, start: int, end: int, w: int = WINDOW_TOKENS,
               max_mention_tokens: int = MAX_MENTION_TOKENS):
    """(marked_window, tok_start, tok_end, bio) for one mention span.

    Token budget ``w`` is split evenly around the mention; leftover budget
    on a short side spills to the other (the reference's prefix/suffix
    spill at /root/reference/utils_e2e_span.py:71-87).  ``tok_start`` /
    ``tok_end`` index the mention tokens within the RETURNED window
    (markers excluded), half-open.  Spans longer than
    ``max_mention_tokens`` are masked to the empty window (T6-analog,
    /root/reference/modeling_e2e_span.py:99-104)."""
    toks, spans = [], []
    pos = 0
    for tok in text.split(" "):
        if tok:
            toks.append(tok)
            spans.append((pos, pos + len(tok)))
        pos += len(tok) + 1
    ts = te = None
    for i, (s, e) in enumerate(spans):
        if e > start and s < end:  # token overlaps the mention span
            if ts is None:
                ts = i
            te = i + 1
    if ts is None:  # span hits no token (degenerate); empty window
        return "", 0, 0, ""
    mlen = te - ts
    if mlen > max_mention_tokens:  # reference's span-length inference mask
        return "", 0, 0, ""
    avail = max(w - mlen, 0)
    want_pre, want_suf = avail // 2, avail - avail // 2
    pre = min(want_pre, ts)
    suf = min(want_suf + (want_pre - pre), len(toks) - te)
    pre = min(pre + max(want_suf - suf, 0), ts)  # spill unused suffix budget
    lo, hi = ts - pre, te + suf
    window = toks[lo:ts] + [MS] + toks[ts:te] + [ME] + toks[te:hi]
    bio = ["O"] * pre + ["B"] + ["I"] * (mlen - 1) + ["O"] * (hi - te)
    return " ".join(window), pre, pre + mlen, " ".join(bio)


def mention_windows_batch(batch: pa.Table, text_col: str = "norm_text") -> pa.Table:
    """mentions-with-text batch -> marked windows + BIO tags."""
    wins, tss, tes, bios = [], [], [], []
    for text, s, e in zip(
        batch[text_col].to_pylist(),
        batch["start"].to_pylist(),
        batch["end"].to_pylist(),
    ):
        win, ts, te, bio = window_one(text, s, e)
        wins.append(win)
        tss.append(ts)
        tes.append(te)
        bios.append(bio)
    return pa.Table.from_arrays(
        [
            batch["mention_id"],
            pa.array(wins, pa.string()),
            pa.array(tss, pa.int32()),
            pa.array(tes, pa.int32()),
            pa.array(bios, pa.string()),
        ],
        names=["mention_id", "window", "tok_start", "tok_end", "bio"],
    )


def decode_bio_spans(bio_tags: list[str]) -> list[tuple[int, int]]:
    """BIO tag sequence -> half-open token spans (M15-analog of the
    B/I continuation decode at /root/reference/run_e2e_span.py:383-447)."""
    spans = []
    start = None
    for i, t in enumerate(bio_tags):
        if t == "B":
            if start is not None:
                spans.append((start, i))
            start = i
        elif t == "I":
            if start is None:  # dangling I treated as span start (lenient)
                start = i
        else:
            if start is not None:
                spans.append((start, i))
                start = None
    if start is not None:
        spans.append((start, len(bio_tags)))
    return spans

"""Segmenter / windower / span-eval semantics (M5-M7, M15-M16, J5 analogs)."""

import sys

sys.path.insert(0, "/root/repo")

from hypothesis import given, settings
from hypothesis import strategies as st

from biomedical_el_ray.stages.windowing import (
    MAX_SEG_MENTIONS,
    MAX_SEG_TOKENS,
    decode_bio_spans,
    greedy_segments,
    window_one,
)

SF = "/root/testdata/sf0.001"


@given(
    st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 4)), min_size=1, max_size=80
    )
)
@settings(max_examples=60, deadline=None)
def test_greedy_segments_invariants(turns):
    toks = [t for t, _ in turns]
    mens = [m for _, m in turns]
    seg = greedy_segments(toks, mens)
    assert len(seg) == len(turns)
    assert seg[0] == 0
    # seg ids contiguous and non-decreasing
    for a, b in zip(seg, seg[1:]):
        assert b in (a, a + 1)
    # per-segment caps hold unless the segment is a single overlong turn
    from collections import defaultdict

    by = defaultdict(list)
    for i, s in enumerate(seg):
        by[s].append(i)
    for idxs in by.values():
        T = sum(toks[i] for i in idxs)
        M = sum(mens[i] for i in idxs)
        if len(idxs) > 1:
            assert T < MAX_SEG_TOKENS and M <= MAX_SEG_MENTIONS
    # greedy = maximal: moving a segment's first turn into the previous
    # segment would have violated a cap
    for s, idxs in by.items():
        if s == 0:
            continue
        prev = by[s - 1]
        T = sum(toks[i] for i in prev) + toks[idxs[0]]
        M = sum(mens[i] for i in prev) + mens[idxs[0]]
        assert T >= MAX_SEG_TOKENS or M > MAX_SEG_MENTIONS


def test_window_one_markers_and_budget():
    text = " ".join(f"w{i}" for i in range(100))
    start = text.index("w50")
    end = start + len("w50 w51")
    win, ts, te, bio = window_one(text, start, end, w=10)
    toks = win.split(" ")
    assert toks.count("[Ms]") == 1 and toks.count("[Me]") == 1
    body = [t for t in toks if t not in ("[Ms]", "[Me]")]
    assert len(body) <= 10
    assert body[ts:te] == ["w50", "w51"]
    tags = bio.split(" ")
    assert len(tags) == len(body)
    assert tags[ts] == "B" and all(t == "I" for t in tags[ts + 1 : te])
    assert decode_bio_spans(tags) == [(ts, te)]


def test_window_one_spill_at_text_start():
    """Mention at position 0: unused prefix budget spills into the suffix
    (reference utils_e2e_span.py:71-87 spill semantics)."""
    text = " ".join(f"w{i}" for i in range(50))
    win, ts, te, bio = window_one(text, 0, 2, w=12)
    body = [t for t in win.split(" ") if t not in ("[Ms]", "[Me]")]
    assert ts == 0 and body[0] == "w0"
    assert len(body) == 12  # full budget used on the suffix side


def test_window_one_degenerate_span():
    assert window_one("abc def", 3, 3) == ("", 0, 0, "")


def test_decode_bio_handles_dangling_and_adjacent():
    assert decode_bio_spans(["I", "O", "B", "B", "I"]) == [(0, 1), (2, 3), (3, 5)]
    assert decode_bio_spans(["O", "O"]) == []
    assert decode_bio_spans(["B"]) == [(0, 1)]


def test_span_overlap_eval_extraction_matches_gold():
    """Gazetteer extraction should reproduce the planted gold spans almost
    exactly after raw->norm offset rebasing (per-turn text-equality
    invariant analog of utils_e2e_span.py:96)."""
    from biomedical_el_ray.pipelines.windows import span_overlap_eval

    rows = span_overlap_eval(SF).take_all()
    n_gold = sum(r["n_gold"] for r in rows)
    n_exact = sum(r["n_exact"] for r in rows)
    n_missed = sum(r["n_missed"] for r in rows)
    assert n_gold > 0
    assert n_exact / n_gold > 0.9, (n_exact, n_gold)
    assert n_missed / n_gold < 0.05


def test_mention_windows_contain_surface():
    from biomedical_el_ray.pipelines.windows import mention_windows

    rows = mention_windows(SF).take(200)
    for r in rows:
        body = [t for t in r["window"].split(" ") if t not in ("[Ms]", "[Me]")]
        assert r["bio"].count("B") == 1
        assert len(r["bio"].split(" ")) == len(body)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),        # conv id (collisions on purpose)
            st.integers(0, 50),       # turn idx
            st.integers(0, 300),      # n_tokens
            st.integers(0, 4),        # n_mentions
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda r: (r[0], r[1]),
    )
)
@settings(max_examples=60, deadline=None)
def test_segment_partition_matches_per_conv_spec(rows):
    """_segment_partition (one task over many conversations) must equal the
    per-conversation pandas spec fold, row for row."""
    import pandas as pd
    import pyarrow as pa

    from biomedical_el_ray.stages.windowing import (
        _segment_partition,
        segment_conversation_group,
    )

    df = pd.DataFrame(
        rows, columns=["c", "turn_idx", "n_tokens", "n_mentions"]
    )
    df["conv_id"] = df["c"].map(lambda x: f"conv{x}")
    df = df.drop(columns=["c"])
    got = (
        _segment_partition(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()
        .sort_values(["conv_id", "seg_idx"])
        .reset_index(drop=True)
    )
    want = (
        pd.concat(
            [
                segment_conversation_group(g)
                for _, g in df.groupby("conv_id", sort=True)
            ],
            ignore_index=True,
        )
        .sort_values(["conv_id", "seg_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

"""Fixed-width padded feature export (M9 tag→id + M13 pad/truncate)."""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.functions.hashing import hash64_column
from biomedical_el_ray.stages.features import (
    CLS_ID,
    IGNORE,
    PAD_ID,
    SEP_ID,
    VOCAB_SIZE,
    mention_features_batch,
)
from biomedical_el_ray.stages.windowing import window_one


def _tok_id(tok: str) -> int:
    return 3 + int(hash64_column([tok])[0] % np.uint64(VOCAB_SIZE - 3))


def _windows_table(rows):
    return pa.table(
        {
            "mention_id": pa.array([r[0] for r in rows], pa.string()),
            "window": pa.array([r[1] for r in rows], pa.string()),
            "tok_start": pa.array([r[2] for r in rows], pa.int32()),
            "tok_end": pa.array([r[3] for r in rows], pa.int32()),
            "bio": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def test_features_hand_computed():
    """One real window, every cell checked against the spec by hand."""
    text = "alpha beta gamma delta"
    win, ts, te, bio = window_one(text, 6, 16)  # mentions 'beta gamma'
    assert bio == "O B I O"
    out = mention_features_batch(
        _windows_table([("m1", win, ts, te, bio)]), seq_len=12
    ).to_pylist()[0]
    toks = win.split(" ")  # alpha [Ms] beta gamma [Me] delta
    assert toks == ["alpha", "[Ms]", "beta", "gamma", "[Me]", "delta"]
    want_ids = (
        [CLS_ID] + [_tok_id(t) for t in toks] + [SEP_ID] + [PAD_ID] * 4
    )
    assert out["input_ids"] == want_ids
    assert out["attention_mask"] == [1] * 8 + [0] * 4
    # grid:  CLS alpha [Ms] beta gamma [Me] delta SEP pad...
    # tags:  -100  O  -100   B    I   -100   O  -100 -100...
    assert out["tag_ids"] == [IGNORE, 0, IGNORE, 1, 2, IGNORE, 0, IGNORE] + [IGNORE] * 4


def test_features_degenerate_and_batch_mix():
    """Masked/degenerate mentions produce CLS+SEP-only rows; a mixed batch
    keeps every row independently aligned."""
    win, ts, te, bio = window_one("a b c", 0, 1)
    out = mention_features_batch(
        _windows_table([("empty", "", 0, 0, ""), ("real", win, ts, te, bio)]),
        seq_len=10,
    ).to_pylist()
    empty, real = out[0], out[1]
    assert empty["input_ids"][:2] == [CLS_ID, SEP_ID]
    assert all(v == PAD_ID for v in empty["input_ids"][2:])
    assert empty["attention_mask"] == [1, 1] + [0] * 8
    assert all(v == IGNORE for v in empty["tag_ids"])
    # real row: [Ms] a [Me] b c -> tags -100 B -100 O O at cols 1..5
    assert real["tag_ids"][:7] == [IGNORE, IGNORE, 1, IGNORE, 0, 0, IGNORE]


def test_features_truncation():
    """A window longer than seq_len-2 keeps exactly the first seq_len-2
    tokens, with SEP right after them and markers/tags beyond the cap
    dropped with the truncated tokens."""
    toks = [f"t{i}" for i in range(12)]
    win = " ".join(toks)
    # mention spans window positions 8..9 (ts=8, te=10 exclusive-ish per
    # the windower contract); with seq_len=8 the cap is 6 tokens, so the
    # mention falls entirely beyond the kept region
    out = mention_features_batch(
        _windows_table([("m", win, 8, 10, "O " * 12)]), seq_len=8
    ).to_pylist()[0]
    want_ids = [CLS_ID] + [_tok_id(t) for t in toks[:6]] + [SEP_ID]
    assert out["input_ids"] == want_ids
    assert out["attention_mask"] == [1] * 8
    # kept cells are plain O tags; CLS/SEP ignored
    assert out["tag_ids"] == [IGNORE, 0, 0, 0, 0, 0, 0, IGNORE]


def test_features_shapes_and_determinism_on_corpus():
    """End-to-end over the smoke corpus: constant width, mask coherent
    with content, same ids for the same token everywhere."""
    from biomedical_el_ray.pipelines.windows import mention_feature_rows

    df = mention_feature_rows("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    L = len(df["input_ids"].iloc[0])
    ids = np.stack(df["input_ids"].to_numpy())
    mask = np.stack(df["attention_mask"].to_numpy())
    tags = np.stack(df["tag_ids"].to_numpy())
    assert ids.shape == mask.shape == tags.shape == (len(df), L)
    assert (ids[:, 0] == CLS_ID).all()
    # beyond the mask everything is PAD / IGNORE
    assert (np.where(mask == 0, ids, PAD_ID) == PAD_ID).all()
    assert (np.where(mask == 0, tags, IGNORE) == IGNORE).all()
    # every non-degenerate row has exactly one B tag
    nb = (tags == 1).sum(axis=1)
    assert set(nb.tolist()) <= {0, 1}

"""BPE trainer: equivalence against an independent from-scratch
reference over the same corpus, determinism, and apply invariants."""

import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from biomedical_el_ray.pipelines.vocab import (
    EOW,
    bpe_apply,
    bpe_train,
    encode_word,
    train_merges,
)

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Straight-from-the-paper reference (Sennrich et al. 2016 fig. 1),
    written independently of the engine's vectorized path."""
    vocab = {tuple(w) + (EOW,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        new_vocab = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _corpus_word_counts() -> dict[str, int]:
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in texts["text"].to_pylist():
        c.update(w for w in re.split(r"\s+", t or "") if w)
    return dict(c)


def test_bpe_train_matches_reference(ray_session):
    got = bpe_train(SF, n_merges=30)
    want = _reference_bpe(_corpus_word_counts(), 30)
    assert len(got) == len(want)
    for i, (l, r, cnt) in enumerate(want):
        assert (got.left[i], got.right[i], int(got.pair_count[i])) == (l, r, cnt)
    # counts are nonincreasing in merge order only per greedy step, but
    # ranks must be 1..n
    assert list(got.rk) == list(range(1, len(want) + 1))


def test_bpe_train_is_deterministic(ray_session):
    a = bpe_train(SF, n_merges=20)
    b = bpe_train(SF, n_merges=20)
    assert a.equals(b)


def test_train_merges_tiny_histogram():
    # "low lower lowest": 'lo' then 'low' dominate
    merges = train_merges(["low", "lower", "lowest"], [5, 2, 2], 3)
    assert merges[0][:2] == ("l", "o")
    assert merges[1][:2] == ("lo", "w")


def test_encode_word_roundtrip():
    merges = train_merges(["aaab"], [10], 3)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    pieces = encode_word("aaab", ranks)
    assert "".join(pieces) == "aaab" + EOW  # lossless segmentation


def test_bpe_apply_invariants(ray_session):
    out = bpe_apply(SF, n_merges=30).to_pandas().sort_values("doc_id")
    texts = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    # word counts agree with a direct split
    direct = texts.text.map(
        lambda t: len([w for w in re.split(r"\s+", t or "") if w])
    )
    assert (out.n_words.values == direct.values).all()
    # each word encodes to >= 1 and <= len(word)+1 pieces
    assert (out.n_bpe_tokens >= out.n_words).all()
    chars = texts.text.map(lambda t: len(t or "")).values
    assert (out.n_bpe_tokens.values <= chars + out.n_words.values + 1).all()
    # more merges -> never more pieces
    out10 = bpe_apply(SF, n_merges=10).to_pandas().sort_values("doc_id")
    assert (out.n_bpe_tokens.values <= out10.n_bpe_tokens.values).all()

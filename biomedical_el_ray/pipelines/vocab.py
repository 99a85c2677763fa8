"""Distributed BPE vocabulary training + application.

The trainer every LLM data pipeline runs before tokenizing its corpus
(Sennrich et al. 2016), organized the way real trainers (SentencePiece,
HF tokenizers) are — NOT by re-scanning the corpus per merge:

1. ONE distributed pass builds the (word, count) histogram — per-batch
   Arrow hash-aggregate partials, then a ``groupby(word)`` sum whose
   output is bounded by DISTINCT-word cardinality, never corpus size
   (capped loudly at ``max_words``);
2. the merge loop runs driver-side on that bounded histogram (each
   iteration is O(distinct words), data never moves again) with a
   deterministic tie-break, so the merge table is identical at any
   parallelism level;
3. ``bpe_apply`` broadcasts the finished merge table once and
   re-tokenizes the corpus in a single streaming ``map_batches``.

The merge LOOP is iterative-argmax and not SQL-expressible, so
``bpe_train`` is a rows-only driver query (the brief's carve-out for
iterative algorithms); pytest instead verifies the trainer against an
independent from-scratch reference implementation and pins the apply
invariants (token counts shrink monotonically with merges; zero merges
reproduces character counts).

Analog in the reference: the vendored WordPiece vocab the reference
loads per worker (/root/reference/run_e2e_span.py:343-366 tokenizer
setup) — here the engine trains the vocab itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.pipelines.textstats import _exploded_tokens
from biomedical_el_ray.sources.readers import read_table

# end-of-word marker, kept out of the corpus alphabet by construction
# (tokens are '\S+' so they never contain whitespace; we use a control
# char that the synthetic corpus and any sane text lack)
EOW = "\x00"

MAX_DISTINCT_WORDS = 2_000_000


def word_histogram(docs_ds):
    """Dataset (word, n) — the bounded word-count table.

    Per-batch Arrow hash-aggregate partials (at most one row per
    distinct-word-per-batch crosses the shuffle), then one groupby sum.
    """
    def _partial(t: pa.Table) -> pa.Table:
        _, tok = _exploded_tokens(t["text"])
        g = pa.Table.from_arrays([tok], names=["word"]).group_by(
            "word"
        ).aggregate([("word", "count")])
        return g.rename_columns(["word", "n"])

    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    hist = (
        docs_ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n"))
    )
    return drop_empty_blocks(hist).map_batches(
        lambda t: t.rename_columns(["word", "n"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def train_merges(words: list[str], counts: list[int],
                 n_merges: int) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a word histogram (driver-side, input
    bounded by distinct-word cardinality).  Ties break on the
    lexicographically smallest (left, right) pair, making the table a
    pure function of the histogram.  Returns [(left, right, pair_count)]
    in merge order."""
    seqs = [tuple(w) + (EOW,) for w in words]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # highest count, then lexicographically smallest (left, right)
        (l, r), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        merged = l + r
        out = []
        for seq in seqs:
            if l not in seq:
                out.append(seq)
                continue
            ns, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            out.append(tuple(ns))
        seqs = out
    return merges


def bpe_train(sf_dir: str, n_merges: int = 50,
              max_words: int = MAX_DISTINCT_WORDS):
    """(rk, left, right, pair_count) — the trained merge table over the
    ``documents`` corpus, merge-rank ascending.  Rows-only driver query
    (iterative argmax; see module docstring)."""
    import pandas as pd

    docs = read_table(sf_dir, "documents", ["text"])
    hist = word_histogram(docs).take_all()  # bounded: distinct words
    if len(hist) > max_words:
        raise ValueError(
            f"word histogram has {len(hist)} rows > cap {max_words}; "
            "raise max_words or pre-filter the corpus"
        )
    # sort for a parallelism-independent training input order
    hist.sort(key=lambda r: r["word"])
    merges = train_merges(
        [r["word"] for r in hist], [int(r["n"]) for r in hist], n_merges
    )
    return pd.DataFrame(
        {
            "rk": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": np.asarray([m[2] for m in merges], dtype=np.int64),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word (lowest-rank pair first — the
    standard BPE encode order, matching how training built the table)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rk, best_i = None, -1
        for i in range(len(seq) - 1):
            rk = ranks.get((seq[i], seq[i + 1]))
            if rk is not None and (best_rk is None or rk < best_rk):
                best_rk, best_i = rk, i
        if best_rk is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class _BpeApplier:
    """Actor: holds the broadcast merge-rank table; per batch, encodes
    only the batch's DISTINCT words (memoized across batches) and
    scatters counts back — the per-actor memo makes the hot path
    O(new distinct words), not O(tokens)."""

    def __init__(self, merges_ref):
        pairs = ray.get(merges_ref) if isinstance(merges_ref, ray.ObjectRef) else merges_ref
        self.ranks = {(l, r): i for i, (l, r) in enumerate(pairs)}
        self._memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        row, tok = _exploded_tokens(t["text"])
        toks = tok.to_pylist()
        memo = self._memo
        n_pieces = np.empty(len(toks), dtype=np.int64)
        for i, w in enumerate(toks):
            v = memo.get(w)
            if v is None:
                v = len(encode_word(w, self.ranks))
                memo[w] = v
            n_pieces[i] = v
        out_tok = np.zeros(n, dtype=np.int64)
        out_pieces = np.zeros(n, dtype=np.int64)
        np.add.at(out_tok, row, 1)
        np.add.at(out_pieces, row, n_pieces)
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(out_tok), pa.array(out_pieces)],
            names=["doc_id", "n_words", "n_bpe_tokens"],
        )


def bpe_apply(sf_dir: str, n_merges: int = 50):
    """(doc_id, n_words, n_bpe_tokens) — per-document BPE token counts
    under the corpus-trained merge table: train once (bounded), broadcast
    the table, stream the corpus through an actor-pool encoder."""
    table = bpe_train(sf_dir, n_merges=n_merges)
    merges_ref = ray.put(list(zip(table["left"], table["right"])))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(
        _BpeApplier,
        fn_constructor_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

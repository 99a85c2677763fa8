"""Bigram LM-quality kernel: padding, multiplicity, fixed-point exactness.

The operator's exactness claim (numpy == DuckDB with no float anywhere)
rests on the flat bigram enumerator mirroring ``shingle_hashes_flat``'s
padding rule and on all-integer ppm arithmetic; both are pinned here
without Ray (the end-to-end oracle row is covered by
``test_oracle_equivalence``).
"""

import numpy as np

from biomedical_el_ray.pipelines.textstats import _bigram_codes_flat


def _codes_one(s: str) -> list[int]:
    b = s.encode("utf-8", "surrogatepass")
    b = b if len(b) >= 2 else b + b"\x00" * (2 - len(b))
    return [b[i] + 256 * b[i + 1] for i in range(len(b) - 1)]


def test_codes_match_per_row_reference():
    texts = ["abc", "", "x", "aaaa", "café", "a b a b"]
    flat, lengths = _bigram_codes_flat(texts)
    assert lengths.tolist() == [len(_codes_one(t)) for t in texts]
    off = 0
    for t, ln in zip(texts, lengths):
        assert flat[off : off + ln].tolist() == _codes_one(t), t
        off += ln
    assert off == len(flat)


def test_no_cross_row_windows():
    # the last byte of row i and first of row i+1 must never pair up
    flat, lengths = _bigram_codes_flat(["ab", "cd"])
    assert lengths.tolist() == [1, 1]
    assert flat.tolist() == [ord("a") + 256 * ord("b"), ord("c") + 256 * ord("d")]


def test_empty_and_short_rows_pad_to_one_bigram():
    flat, lengths = _bigram_codes_flat(["", "z", None])
    assert lengths.tolist() == [1, 1, 1]
    assert flat.tolist() == [0, ord("z"), 0]


def test_fixed_point_ppm_is_order_independent():
    # integer ppm summation must not depend on accumulation order
    rng = np.random.default_rng(3)
    c_ab = rng.integers(1, 10_000, 1000)
    c_a = c_ab + rng.integers(0, 10_000, 1000)
    ppm = c_ab * 1_000_000 // c_a
    perm = rng.permutation(1000)
    assert ppm.sum() == ppm[perm].sum()
    assert ppm.min() == ppm[perm].min()

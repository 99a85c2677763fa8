"""Stable-hashing unit tests (determinism across calls/processes)."""

import numpy as np

from biomedical_el_ray.functions.hashing import (
    hash64_column,
    shingle_hashes,
    splitmix64,
    stable_hash64,
    stable_seed,
)


def test_stable_hash64_known_stability():
    # pinned values: must never change across runs/processes/versions
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")
    assert stable_hash64(b"abc") == stable_hash64("abc")


def test_splitmix64_vectorized_matches_scalar():
    xs = np.arange(100, dtype=np.uint64)
    v = splitmix64(xs)
    for i in [0, 1, 50, 99]:
        assert splitmix64(np.array([i], dtype=np.uint64))[0] == v[i]
    assert len(np.unique(v)) == 100


def test_hash64_column():
    a = hash64_column(["x", "y", "x", None])
    assert a[0] == a[2]
    assert a[0] != a[1]
    assert a[3] == 0
    assert a.dtype == np.uint64


def test_shingle_hashes_properties():
    h1 = shingle_hashes("hello world", 3)
    h2 = shingle_hashes("hello world", 3)
    assert np.array_equal(h1, h2)
    # distinct shingles only, sorted-unique upstream
    assert len(h1) == len(set(h1.tolist()))
    # short strings are padded, never empty
    assert len(shingle_hashes("a", 3)) == 1
    assert len(shingle_hashes("", 3)) == 1


def test_stable_seed_distinct():
    assert stable_seed("a", 1) != stable_seed("a", 2)
    assert stable_seed("a", 1) == stable_seed("a", 1)

"""MinHash / LSH properties and determinism."""

import numpy as np

from biomedical_el_ray.functions.minhash import band_keys, minhash_signatures
from biomedical_el_ray.stages.embed import HashEmbedder


def test_signature_determinism_and_shape():
    s = ["cardaxizine alpha", "cardaxizine alpha", "totally different"]
    sig1 = minhash_signatures(s, num_hashes=64)
    sig2 = minhash_signatures(s, num_hashes=64)
    assert np.array_equal(sig1, sig2)
    assert sig1.shape == (3, 64)
    assert np.array_equal(sig1[0], sig1[1])
    assert not np.array_equal(sig1[0], sig1[2])


def test_similar_strings_share_bands():
    a, b = "cardaxizine thrombemamab", "cardaxizine thrombemamb"  # one-char edit
    sig = minhash_signatures([a, b], num_hashes=64)
    keys = band_keys(sig, bands=16)
    shared = set(keys[0]) & set(keys[1])
    assert len(shared) >= 1  # high-Jaccard pair must collide in >=1 band


def test_dissimilar_strings_rarely_share_bands():
    rng = np.random.default_rng(0)
    import string

    words = [
        "".join(rng.choice(list(string.ascii_lowercase), 12)) for _ in range(200)
    ]
    sig = minhash_signatures(words, num_hashes=64)
    keys = band_keys(sig, bands=16)
    collisions = 0
    for i in range(0, 200, 2):
        if set(keys[i]) & set(keys[i + 1]):
            collisions += 1
    assert collisions <= 3  # random 12-char strings almost never collide


def test_batch_equals_single():
    s = ["alpha beta", "gamma delta", "epsilon"]
    batch_sig = minhash_signatures(s)
    for i, x in enumerate(s):
        single = minhash_signatures([x])
        assert np.array_equal(single[0], batch_sig[i])


def test_embedder_properties():
    emb = HashEmbedder(dim=32, n_features=128)
    v = emb.embed(["cardaxizine", "cardaxizine", "cardaxizina", "zzzz qqqq"])
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    assert np.allclose(v[0], v[1])
    sim_close = float(v[0] @ v[2])
    sim_far = float(v[0] @ v[3])
    assert sim_close > 0.8 > sim_far
    b = emb.buckets(v, bits=12)
    assert b[0] == b[1]
    c = emb.cosine(["cardaxizine"], ["cardaxizina"])
    assert abs(float(c[0]) - sim_close) < 1e-5


def test_minhash_dedup_oracle_matches_kernels_edge_cases():
    """The generated DuckDB SQL must reproduce the numpy kernel chain
    (shingle -> permutation minima -> band fold -> collide) on edge cases:
    short/padded strings, exact duplicates, multi-byte utf-8."""
    import duckdb
    import pyarrow as pa

    from biomedical_el_ray.functions.minhash import (
        band_hashes,
        minhash_dedup_oracle_sql,
        minhash_signatures,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the hazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "completely different content about engines",
        "ab",                                            # < k, zero-padded
        "héllo çafé naïve résumé héllo çafé naïve",    # multi-byte utf-8
    ]
    ids = [7, 3, 99, 42, 1, 55]
    bh = band_hashes(minhash_signatures(texts, 64, 5), 16)
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            nb = int((bh[i] == bh[j]).sum())
            if nb:
                lo, hi = sorted((ids[i], ids[j]))
                expected[(lo, hi)] = nb
    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": ids, "text": texts}))
    got = {
        (a, b): n
        for a, b, n in con.sql(minhash_dedup_oracle_sql("documents")).fetchall()
    }
    assert got == expected
    assert (7, 99) in got and got[(7, 99)] == 16  # exact dup: all bands agree

"""SimHash kernel + DuckDB oracle equivalence on edge cases.

The batch kernel (``simhash64``) and its SQL oracle must agree byte-for-
byte on short strings (< k bytes, zero-padded), empty strings, multi-byte
utf-8, and long repetitive text — the cases where the padding rule, the
window validity mask and the DISTINCT semantics can diverge.
"""

import duckdb
import numpy as np
import pyarrow as pa

from biomedical_el_ray.functions.simhash import (
    hamming64,
    simhash64,
    simhash_oracle_sql,
)

EDGE_TEXTS = [
    "",                       # pads to 4 NUL bytes -> single shingle
    "a",                      # pads to "a\0\0\0"
    "ab",
    "abc",
    "abcd",                   # exactly one window, no padding
    "aaaa",                   # duplicate shingles collapse (DISTINCT)
    "aaaaaaaaaa",
    "hello world",
    "héllo çafé",            # multi-byte utf-8
    "日本語テキスト",          # 3-byte code points
    "the quick brown fox jumps over the lazy dog " * 20,
]


def test_simhash_oracle_matches_kernel_edge_cases():
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table({"doc_id": list(range(len(EDGE_TEXTS))), "text": EDGE_TEXTS}),
    )
    got = dict(con.sql(simhash_oracle_sql("documents")).fetchall())
    want = simhash64(EDGE_TEXTS, k=4)
    for i in range(len(EDGE_TEXTS)):
        assert got[i] == f"{int(want[i]):016x}", (i, EDGE_TEXTS[i][:20])


def test_simhash_batch_split_invariant():
    """Signature of a row must not depend on which batch it arrives in."""
    whole = simhash64(EDGE_TEXTS)
    parts = np.concatenate([simhash64(EDGE_TEXTS[:3]), simhash64(EDGE_TEXTS[3:])])
    assert (whole == parts).all()


def test_simhash_near_duplicates_are_close():
    base = "the quick brown fox jumps over the lazy dog " * 10
    tweaked = base.replace("lazy", "hazy")
    different = "completely unrelated content about database engines " * 10
    sigs = simhash64([base, tweaked, different])
    d_near = hamming64(sigs[:1], sigs[1:2])[0]
    d_far = hamming64(sigs[:1], sigs[2:3])[0]
    assert d_near < d_far
    assert d_near <= 16

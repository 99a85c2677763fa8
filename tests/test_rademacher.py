"""Rademacher-projection embedder: integer exactness + SQL parity.

The oracle-exact ``linkage_emb`` variant rests on three claims, each pinned
here: (1) ``embed_int`` is reproduced bit-for-bit by
``functions.sql_hash.rademacher_emb_cte`` (including surfaces with REPEATED
k-shingles — ``shingle_hashes_flat`` dedups per row, so the SQL must too);
(2) the float32 ``embed`` path's bucket signs equal the integer path's
(exact float32 matmul below 2**24); (3) ``PairScorer``'s cosine equals the
manual ``dot / sqrt(sq_a * sq_b)`` f64 expression the SQL uses.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from biomedical_el_ray.functions.sql_hash import rademacher_emb_cte
from biomedical_el_ray.stages.embed import HashEmbedder, rademacher_salt

# includes repeated 3-shingles ("banana banana"), unicode, padding-short
SURFACES = [
    "banana banana bandana",
    "acme corporation",
    "café ünïcode tæst",
    "x",
    "aaaaaaaaaa",
    "dr. jane doe phd",
]


@pytest.fixture(scope="module")
def emb():
    return HashEmbedder(64, 512, 0x5EED02, 3, "rademacher")


def test_embed_int_matches_sql(emb):
    vecs, sqs = emb.embed_int(SURFACES)
    con = duckdb.connect()
    con.register("surf", pa.table({"surface": SURFACES}))
    cte = rademacher_emb_cte(
        "surf", k=3, n_features=512, dim=64, salt=rademacher_salt(0x5EED02),
        id_col="surface", text_col="surface", prefix="em",
        bucket_bits=12, eb_salt=int(HashEmbedder._EB_SALT),
    )
    rows = con.execute(
        f"WITH {cte} SELECT doc_id, d, e FROM ememb"
    ).fetchall()
    got = {}
    for doc, d, e in rows:
        got.setdefault(doc, np.zeros(64, dtype=np.int64))[d] = e
    for i, s in enumerate(SURFACES):
        assert np.array_equal(got[s], vecs[i]), s
    sq_rows = dict(con.execute(f"WITH {cte} SELECT doc_id, sq FROM emsq").fetchall())
    for i, s in enumerate(SURFACES):
        assert int(sq_rows[s]) == int(sqs[i]), s
    eb_rows = dict(con.execute(
        f"WITH {cte} SELECT doc_id, CAST(ebkey AS UBIGINT) FROM emebk"
    ).fetchall())
    buckets = emb.bucket_values(emb.embed(SURFACES), 12)
    for i, s in enumerate(SURFACES):
        assert int(eb_rows[s]) == int(buckets[i]), s


def test_float_path_signs_equal_integer_path(emb):
    vecs, _ = emb.embed_int(SURFACES)
    fl = emb.embed(SURFACES)  # L2-normalized float32
    assert np.array_equal(np.sign(fl) != -1, vecs >= 0)
    assert np.array_equal(fl > 0, vecs > 0)


def test_scorer_cosine_is_exact_integer_expression():
    from biomedical_el_ray.pipelines.linkage_emb import EMB_CFG
    from biomedical_el_ray.stages.scoring import PairScorer

    sc = PairScorer(EMB_CFG)
    a = SURFACES[:-1]
    b = SURFACES[1:]
    _, _, cos, _ = sc.score_arrays(a, b)
    embd = sc.embedder
    va, qa = embd.embed_int(a)
    vb, qb = embd.embed_int(b)
    want = np.einsum("ij,ij->i", va, vb).astype(np.float64) / np.sqrt(
        qa.astype(np.float64) * qb.astype(np.float64)
    )
    assert np.array_equal(cos, want)


def test_gaussian_default_unaffected():
    g = HashEmbedder(64, 512, 0x5EED02, 3)
    assert g.proj_int is None and g.projection == "gaussian"
    v = g.embed(["acme corp"])
    assert v.shape == (1, 64)
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-5
    with pytest.raises(ValueError):
        g.embed_int(["acme corp"])
    with pytest.raises(ValueError):
        HashEmbedder(64, 512, 0, 3, "fourier")


def test_rademacher_deterministic_across_constructions():
    e1 = HashEmbedder(64, 512, 7, 3, "rademacher")
    e2 = HashEmbedder(64, 512, 7, 3, "rademacher")
    assert np.array_equal(e1.proj_int, e2.proj_int)
    e3 = HashEmbedder(64, 512, 8, 3, "rademacher")
    assert not np.array_equal(e1.proj_int, e3.proj_int)

"""Shared DuckDB SQL builders mirroring the engine's splitmix64 hashing.

These generate SQL-text fragments that reproduce, bit-for-bit, the numpy
kernels in ``functions.hashing`` (``splitmix64``, ``shingle_hashes_flat``)
over HUGEINT arithmetic, so oracle queries for MinHash/SimHash pipelines can
be derived mechanically instead of re-implemented by hand.  Verified against
the kernels in ``tests/test_simhash.py`` / ``tests/test_minhash.py``.

Technique notes
---------------
* uint64 arithmetic rides HUGEINT (128-bit signed): every step reduces
  ``% 2**64``; 64x64-bit multiplication splits the constant into 32-bit
  limbs so no intermediate exceeds 2**97 (see ``mulmod_sql``).
* utf-8 byte access goes through ``hex(encode(text))`` plus 16-bit /
  8-bit hex-string lookup joins — DuckDB has no direct blob-byte indexing.
* ``splitmix_steps`` emits one lateral-alias column per mixer step.
  CAUTION: DuckDB expands lateral aliases by SUBSTITUTION during binding,
  so each reference duplicates the whole upstream expression tree — one
  splitmix application (~100 plan nodes) is fine, but CHAINING several
  through lateral aliases grows the tree 32x per link and kills the
  binder.  Chains must go through ``splitmix_step_ctes`` (projection
  levels = plan edges, each column evaluated once).
* powers-of-two reductions use ``&`` / ``>>`` (values are provably
  non-negative) — HUGEINT ``%`` / ``//`` compile to 128-bit divisions,
  ~30x slower in the hot shingle x permutation inner product.
"""

from __future__ import annotations

M64 = 1 << 64
MASK64 = M64 - 1
SM_GAMMA = 0x9E3779B97F4A7C15
SM_M1 = 0xBF58476D1CE4E5B9
SM_M2 = 0x94D049BB133111EB


def mulmod_sql(a: str, c: int) -> str:
    """SQL for ``(a * c) mod 2**64`` over HUGEINT without 128-bit overflow."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"(({a} * {lo}::HUGEINT"
        f" + (({a} * {hi}::HUGEINT) & 4294967295) * 4294967296) & {MASK64})"
    )


def splitmix_steps(x: str, prefix: str) -> tuple[list[str], str]:
    """splitmix64(x) as chained lateral-alias columns (single application
    only — see module caution above).

    Returns (column definition list to splice into a SELECT, name of the
    final alias holding the result).  ``x`` may be any expression; it is
    referenced exactly once."""
    p = prefix
    defs = [
        f"(({x} + {SM_GAMMA}::HUGEINT) & {MASK64}) AS {p}a",
        f"xor({p}a, {p}a >> 30) AS {p}b",
        f"{mulmod_sql(p + 'b', SM_M1)} AS {p}c",
        f"xor({p}c, {p}c >> 27) AS {p}d",
        f"{mulmod_sql(p + 'd', SM_M2)} AS {p}e",
        f"xor({p}e, {p}e >> 31) AS {p}f",
    ]
    return defs, f"{p}f"


def splitmix_step_ctes(base_rel: str, carry: list[str], apply: list[tuple[str, str]],
                       prefix: str) -> tuple[str, str]:
    """splitmix64 applied to several columns at once as SIX chained CTE
    projection levels (safe to stack arbitrarily deep).

    ``apply`` is [(out_col, input_expr)] — input_expr may reference columns
    of ``base_rel``; each level's expressions reference the previous
    level's columns only, so every value is computed exactly once in the
    plan.  Returns (CTE text to splice after a comma, final relation name)
    where the final relation has columns ``carry + [out for out, _ in
    apply]``."""
    cols = ", ".join(carry)
    outs = [o for o, _ in apply]
    lv0 = ",\n            ".join(
        f"(({e} + {SM_GAMMA}::HUGEINT) & {MASK64}) AS {o}" for o, e in apply
    )
    steps = [
        lambda o: f"xor({o}, {o} >> 30) AS {o}",
        lambda o: f"{mulmod_sql(o, SM_M1)} AS {o}",
        lambda o: f"xor({o}, {o} >> 27) AS {o}",
        lambda o: f"{mulmod_sql(o, SM_M2)} AS {o}",
        lambda o: f"xor({o}, {o} >> 31) AS {o}",
    ]
    text = f"""{prefix}0 AS (
          SELECT {cols}{', ' if cols else ''}{lv0}
          FROM {base_rel})"""
    rel = f"{prefix}0"
    for i, step in enumerate(steps, 1):
        body = ",\n            ".join(step(o) for o in outs)
        text += f""",
        {prefix}{i} AS (
          SELECT {cols}{', ' if cols else ''}{body}
          FROM {rel})"""
        rel = f"{prefix}{i}"
    return text, rel


_POS_SALT = 0xA076_1D64_78BD_642F  # matches functions.hashing._POS_SALT
_LEN_SALT = 0xC2B2_AE3D_27D4_EB4F


def hash64_short_cte(toks_rel: str, carry: list[str], prefix: str,
                     tok_col: str = "tok", out_col: str = "h") -> tuple[str, str]:
    """CTE chain reproducing ``hashing._hash64_packed`` (the engine's
    vectorized multilinear string hash) for strings <= 64 utf-8 bytes —
    the same length class the numpy kernel routes to this construction
    (longer strings take the per-row blake2b path, which SQL cannot
    express; callers must guarantee the length bound).

    Per string: utf-8 bytes are packed little-endian into 8-byte words
    (zero-padded tail), each word is mixed as
    ``splitmix64(word ^ splitmix64(word_index * POS_SALT))``, word mixes
    are summed mod 2**64 and finalized with
    ``splitmix64(sum ^ (byte_len * LEN_SALT))``.

    Returns (CTE text to splice after a comma, final relation name); the
    final relation has columns ``carry + [tok_col, out_col]`` with one
    row per input row (input must be DISTINCT on carry+tok or dedup
    downstream)."""
    cols = ", ".join(carry)
    colsc = f"{cols}, " if cols else ""
    p = prefix
    # position-mix chain input: (wj * POS_SALT) mod 2**64
    t_pos, r_pos = splitmix_step_ctes(
        f"{p}w", carry + [tok_col, "blen", "packed"],
        [("pm", mulmod_sql("CAST(wj AS HUGEINT)", _POS_SALT))], f"{p}p",
    )
    t_wm, r_wm = splitmix_step_ctes(
        r_pos, carry + [tok_col, "blen"],
        [("wm", "xor(packed, pm)")], f"{p}m",
    )
    t_fin, r_fin = splitmix_step_ctes(
        f"{p}s", carry + [tok_col],
        [(out_col, f"xor(s, {mulmod_sql('CAST(blen AS HUGEINT)', _LEN_SALT)})")],
        f"{p}f",
    )
    return f"""{p}b AS (
          SELECT {colsc}{tok_col},
                 octet_length(encode({tok_col})) AS blen,
                 (octet_length(encode({tok_col})) + 7) // 8 AS nw0
          FROM {toks_rel}),
        {p}e AS (
          SELECT {colsc}{tok_col}, blen, greatest(nw0, 1) AS nw,
                 hex(encode({tok_col}))
                   || repeat('00', greatest(nw0, 1) * 8 - blen) AS hxp
          FROM {p}b),
        {p}u AS (
          SELECT {colsc}{tok_col}, blen, hxp,
                 unnest(generate_series(0, CAST(nw - 1 AS INTEGER))) AS wj
          FROM {p}e),
        {p}map16 AS (
          SELECT i AS v, printf('%02X%02X', i % 256, i // 256) AS hx4
          FROM range(65536) t(i)),
        {p}w AS (
          SELECT {colsc}{tok_col}, blen, wj,
                 (m0.v + 65536::HUGEINT * m1.v
                  + 4294967296::HUGEINT * m2.v
                  + 281474976710656::HUGEINT * m3.v) AS packed
          FROM {p}u
          JOIN {p}map16 m0 ON substr(hxp, 16 * wj + 1, 4) = m0.hx4
          JOIN {p}map16 m1 ON substr(hxp, 16 * wj + 5, 4) = m1.hx4
          JOIN {p}map16 m2 ON substr(hxp, 16 * wj + 9, 4) = m2.hx4
          JOIN {p}map16 m3 ON substr(hxp, 16 * wj + 13, 4) = m3.hx4),
        {t_pos},
        {t_wm},
        {p}s AS (
          SELECT {colsc}{tok_col}, any_value(blen) AS blen,
                 sum(wm) & {MASK64} AS s
          FROM {r_wm} GROUP BY {colsc}{tok_col}),
        {t_fin}""", r_fin


def shingle_cte(docs_rel: str, k: int, id_col: str = "doc_id",
                text_col: str = "text", positional: bool = False,
                prefix: str = "", raw: bool = False) -> str:
    """CTE chain (to splice after ``WITH``) ending in ``{prefix}sh(doc_id,
    h)``: each document's DISTINCT k-byte-shingle splitmix64 hashes,
    identical to ``shingle_hashes_flat``: utf-8 bytes zero-padded to >= k,
    every k-byte window packed little-endian then finalized.  Supports
    k <= 8 (packed window must fit 64 bits); k=4/k=5 are the engine's
    simhash/minhash defaults.

    With ``positional=True`` the final relation is ``{prefix}sh(doc_id, p,
    h)`` — every window in order, NOT deduped — matching
    ``fingerprint.kgram_hashes`` (the winnowing input).  ``prefix`` renames
    every internal CTE so two shingle chains (e.g. blocking k=4 + scoring
    k=3) can coexist in one query.  ``raw=True`` skips the splitmix64
    finalize and emits the packed little-endian window value itself (e.g.
    k=2: ``b0 + 256*b1`` — the byte-bigram code the LM-quality scorer
    consumes)."""
    if not 2 <= k <= 8:
        raise ValueError("k must be in [2, 8]")
    q = prefix
    n16 = k // 2
    odd = k % 2
    # packed = sum_j byte_j << 8j decoded as 16-bit little-endian chunks
    # (+ one trailing byte when k is odd)
    chunk_cols = ", ".join(
        f"substr(hx, 2 * p + {4 * c + 1}, 4) AS c{c}" for c in range(n16)
    )
    joins = "\n          ".join(
        f"JOIN {q}map16 m{c} ON w.c{c} = m{c}.hx4" for c in range(n16)
    )
    maps = f"""
        {q}map16 AS (
          SELECT i AS v, printf('%02X%02X', i % 256, i // 256) AS hx4
          FROM range(65536) t(i))"""
    if odd:
        chunk_cols += f", substr(hx, 2 * p + {4 * n16 + 1}, 2) AS cb"
        joins += f"\n          JOIN {q}map256 mb ON w.cb = mb.hx2"
        maps += f""",
        {q}map256 AS (
          SELECT i AS v, printf('%02X', i) AS hx2 FROM range(256) t(i))"""
    # chunk c covers bytes 2c,2c+1 -> little-endian shift 16c bits; a
    # trailing odd byte sits at shift 8(k-1)
    packed = " + ".join(
        f"{1 << (16 * c):d} * m{c}.v" for c in range(n16)
    ) + (f" + {1 << (8 * (k - 1)):d} * mb.v" if odd else "")
    sm_defs, sm_out = splitmix_steps("x", "s_")
    sm_cols = ",\n            ".join(sm_defs)
    cols = "doc_id, p" if positional else "DISTINCT doc_id"
    if raw:
        tail = f"{q}sh AS (SELECT {cols}, x AS h FROM {q}px)"
    else:
        tail = f"""{q}smx AS (
          SELECT doc_id, p,
            {sm_cols}
          FROM {q}px),
        {q}sh AS (SELECT {cols}, {sm_out} AS h FROM {q}smx)"""
    return f"""{maps},
        {q}d AS (
          SELECT {id_col} AS doc_id,
                 hex(encode({text_col}))
                   || repeat('00', greatest(0, {k} - octet_length(encode({text_col}))))
                   AS hx,
                 greatest(octet_length(encode({text_col})), {k}) AS blen
          FROM {docs_rel}),
        {q}pos AS (
          SELECT doc_id, hx, unnest(generate_series(0, blen - {k})) AS p
          FROM {q}d),
        {q}win AS (
          SELECT doc_id, p, {chunk_cols}
          FROM {q}pos),
        {q}px AS (
          SELECT w.doc_id, w.p, ({packed})::HUGEINT AS x
          FROM {q}win w
          {joins}),
        {tail}"""


def reachability_cte(pairs_sel: str, nodes_sel: str, prefix: str = "") -> str:
    """CTE text (splice after ``WITH RECURSIVE``) ending in
    ``{prefix}reach(s, r)``: node ``s`` reaches node ``r`` over the
    undirected pair set.  The shared clustering core of every *_clusters
    oracle — connected components then fall out as ``GROUP BY s`` with
    ``min(<mapped r>)``.

    ``pairs_sel``: a SELECT yielding columns ``(a, b)`` (one direction;
    both are generated here).  Reference it from a MATERIALIZED CTE — it
    is inlined twice.  ``nodes_sel``: a SELECT yielding every node as one
    column (singletons must appear in the base case).  Pass ``prefix``
    when one query needs two independent reachability passes."""
    e, reach = f"{prefix}e", f"{prefix}reach"
    return f"""{e} AS (
          SELECT a, b FROM ({pairs_sel})
          UNION ALL
          SELECT b, a FROM ({pairs_sel})),
        {reach}(s, r) AS (
          SELECT n, n FROM ({nodes_sel}) t(n)
          UNION
          SELECT {reach}.s, {e}.b FROM {reach} JOIN {e} ON {reach}.r = {e}.a)"""


def rademacher_emb_cte(docs_rel: str, k: int, n_features: int, dim: int,
                       salt: int, id_col: str = "doc_id",
                       text_col: str = "text", prefix: str = "em",
                       bucket_bits: int | None = None,
                       eb_salt: int | None = None) -> str:
    """CTE chain reproducing ``stages.embed.HashEmbedder`` in its
    ``projection="rademacher"`` mode, exactly:

    * ``{prefix}emb(doc_id, d, e)`` — the un-normalized integer embedding
      ``counts @ proj_int`` (``HashEmbedder.embed_int``): every DISTINCT
      k-byte shingle (``shingle_hashes_flat`` dedups per row) hashes via
      splitmix64, lands in feature cell ``h & (n_features - 1)``, and
      contributes the +-1 sign
      ``1 - 2 * (splitmix64((f * dim + d) ^ salt) >> 63)`` per output dim
      (``salt`` = ``embed.rademacher_salt(seed)``); distinct shingles CAN
      share a cell, so counts > 1 still occur.
    * ``{prefix}sq(doc_id, sq)`` — the squared L2 norm, so
      ``cosine = dot / sqrt(sq_a * sq_b)`` over DOUBLE matches numpy
      bit-for-bit (exact integers, one correctly-rounded sqrt + divide).
    * with ``bucket_bits``/``eb_salt``: ``{prefix}ebk(doc_id, ebkey)`` —
      the sign-bit SimHash blocking bucket (``HashEmbedder.bucket_values``;
      sign of the float path equals sign of the integer path because the
      float32 matmul over +-1 operands is exact below 2**24).

    ``n_features`` must be a power of two (cell index uses ``&``)."""
    if n_features & (n_features - 1):
        raise ValueError("n_features must be a power of two")
    p = prefix
    sh = shingle_cte(docs_rel, k, id_col=id_col, text_col=text_col, prefix=p)
    t_sg, r_sg = splitmix_step_ctes(
        f"{p}fd", ["f", "d"],
        [("sm", f"xor(CAST(f * {dim} + d AS HUGEINT), {salt}::HUGEINT)")],
        f"{p}g",
    )
    text = f"""{sh},
        {p}fd AS (
          SELECT t1.f, t2.d
          FROM range({n_features}) t1(f) CROSS JOIN range({dim}) t2(d)),
        {t_sg},
        {p}sgn AS (
          SELECT f, d, CAST(1 - 2 * (sm >> 63) AS BIGINT) AS s
          FROM {r_sg}),
        {p}emb AS MATERIALIZED (
          SELECT t.doc_id, g.d, CAST(sum(g.s) AS BIGINT) AS e
          FROM {p}sh t JOIN {p}sgn g ON g.f = (t.h & {n_features - 1})
          GROUP BY 1, 2),
        {p}sq AS (
          SELECT doc_id, CAST(sum(e * e) AS BIGINT) AS sq
          FROM {p}emb GROUP BY doc_id)"""
    if bucket_bits is not None:
        if eb_salt is None:
            raise ValueError("bucket_bits requires eb_salt")
        t_eb, r_eb = splitmix_step_ctes(
            f"{p}bx", ["doc_id"],
            [("ebkey", f"xor(x, {eb_salt}::HUGEINT)")], f"{p}eb",
        )
        text += f""",
        {p}bx AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN e > 0 THEN 1::HUGEINT << d ELSE 0 END)
                      AS HUGEINT) AS x
          FROM {p}emb WHERE d < {bucket_bits} GROUP BY doc_id),
        {t_eb},
        {p}ebk AS (SELECT doc_id, ebkey FROM {r_eb})"""
    return text

"""Tiny deterministic language-ID heuristic (stopword profiles) — vectorized.

A training-data-pipeline utility (SURVEY round brief): classify each
document by counting hits against per-language stopword profiles — the
classic n-gram/stopword heuristic (cf. Cavnar & Trenkle 1994).
Deterministic ties break by language-code order.

Vectorization: the whole batch is lowercased and whitespace-split by Arrow
kernels; every token's first 8 utf-8 bytes are packed into a uint64 (all
profile stopwords fit 8 bytes, so tokens longer than that can never match
and are masked), matched against the packed profiles with ``np.isin``, and
counted per row with ``np.bincount`` — no per-row or per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PROFILES: dict[str, frozenset] = {
    "de": frozenset("der die das und ist nicht ich ein eine mit von für auf den".split()),
    "en": frozenset("the a of and to in is it that for on with as at this".split()),
    "es": frozenset("el la los las de que y en un una es por con para no".split()),
    "fr": frozenset("le la les de et un une est que pour dans ce il ne pas".split()),
}
_LANGS = sorted(PROFILES)


def _pack8_bytes(words) -> np.ndarray:
    out = np.zeros(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        b = w.encode("utf-8")
        assert len(b) <= 8, f"profile word {w!r} exceeds 8 bytes"
        out[i] = int.from_bytes(b.ljust(8, b"\x00"), "little")
    return out


_PROFILE_PACKED = {lang: np.sort(_pack8_bytes(sorted(ws))) for lang, ws in PROFILES.items()}

# combined match table: sorted unique packed words + per-language 0/1 matrix
# (words like 'la'/'de' belong to several profiles and credit each)
_ALL_WORDS = np.unique(np.concatenate(list(_PROFILE_PACKED.values())))
_WORD_LANGS = np.zeros((len(_ALL_WORDS), len(_LANGS)), dtype=bool)
for _li, _lang in enumerate(_LANGS):
    _WORD_LANGS[np.searchsorted(_ALL_WORDS, _PROFILE_PACKED[_lang]), _li] = True


def _pack8_arrow(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flat Arrow string array -> (uint64 first-8-bytes pack, fits<=8 mask)."""
    n = len(flat)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, bool)
    odt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    offs = np.frombuffer(flat.buffers()[1], dtype=odt)[
        flat.offset : flat.offset + n + 1
    ].astype(np.int64)
    buf = flat.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None
        else np.empty(0, np.uint8)
    )
    lens = offs[1:] - offs[:-1]
    fits = lens <= 8
    w = np.zeros(n, dtype=np.uint64)
    cap = max(len(data) - 1, 0)
    for j in range(8):
        has = lens > j
        if not has.any():
            break
        idx = np.minimum(offs[:-1] + j, cap)
        vals = np.zeros(n, dtype=np.uint64)
        vals[has] = data[idx[has]]
        w |= vals << np.uint64(8 * j)
    return w, fits


def predict_lang(texts) -> list[str]:
    """(n,) strings -> predicted language codes ('und' when no hits)."""
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array([t if t is not None else "" for t in texts], pa.string())
    n = len(arr)
    if n == 0:
        return []
    arr = pc.fill_null(arr, "")
    # RE2 '\s' split ([\t\n\f\r ]), matching the oracle's '\S+' tokens —
    # utf8_split_whitespace also splits on VT/NBSP/U+2028 and can change
    # the prediction (empty boundary tokens pack to 0 and never match)
    split = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    tok_lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    flat = split.flatten()
    packed, fits = _pack8_arrow(flat)
    row_of = np.repeat(np.arange(n, dtype=np.int64), tok_lens)
    pos = np.searchsorted(_ALL_WORDS, packed)
    posc = np.minimum(pos, len(_ALL_WORDS) - 1)
    match = fits & (_ALL_WORDS[posc] == packed)
    scores = np.zeros((n, len(_LANGS)), dtype=np.int64)
    mrows = row_of[match]
    mlangs = _WORD_LANGS[posc[match]]
    for li in range(len(_LANGS)):
        hits = mlangs[:, li]
        if hits.any():
            scores[:, li] = np.bincount(mrows[hits], minlength=n)
    best = scores.argmax(axis=1)  # ties -> first = language-code order
    codes = np.asarray(_LANGS, dtype=object)[best]
    codes[scores.max(axis=1) == 0] = "und"
    return codes.tolist()


def langid_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB SQL equivalent of ``predict_lang`` over (doc_id, text, lang).

    Generated from PROFILES so the word lists cannot drift.  Equivalence
    notes: tokens longer than 8 utf-8 bytes are masked out of the packed
    match, but every profile word fits 8 bytes so such tokens could never
    match anyway; the cascading CASE reproduces the argmax's
    first-language-wins (language-code order) tie break.
    """
    filters = []
    for lang in _LANGS:
        words = ", ".join(f"'{w}'" for w in sorted(PROFILES[lang]))
        filters.append(
            f"count(*) FILTER (WHERE tok IN ({words})) AS s_{lang}"
        )
    allcols = ", ".join(f"s_{lang}" for lang in _LANGS)
    case = [f"WHEN coalesce(greatest({allcols}), 0) = 0 THEN 'und'"]
    for i, lang in enumerate(_LANGS[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in _LANGS[i + 1:]
        )
        case.append(f"WHEN {conds} THEN '{lang}'")
    case.append(f"ELSE '{_LANGS[-1]}'")
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
          FROM {docs_rel}),
        s AS (
          SELECT doc_id, {", ".join(filters)}
          FROM toks GROUP BY doc_id)
        SELECT d.doc_id,
               CASE {" ".join(case)} END AS pred_lang,
               d.lang
        FROM {docs_rel} d LEFT JOIN s USING (doc_id)
    """

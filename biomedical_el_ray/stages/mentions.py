"""Mention extraction stage — gazetteer token-trie matcher (actor pool).

Analog of the reference's mention pipeline: the document segmenter + span
builder (/root/reference/data_preprocessing.py:90-173) and the windowed
mention featurizer (/root/reference/utils_e2e_span.py:61-163), recast as a
stateful ``map_batches`` stage.  The reference holds a vocab-loaded
tokenizer per process (/root/reference/data_preprocessing.py:13-14); we hold
a gazetteer index per *actor*, built once in ``__init__`` from a small-side
KB table broadcast via ``ray.put`` — the KB dict pattern of
/root/reference/utils_e2e_span.py:25-32.

Matching is leftmost-longest over whitespace tokens of the normalized text
(regex alternation would not scale to a 30k-alias gazetteer; a first-token
index + longest-first candidate lists is O(tokens) per turn).

Output schema (FIXTURES.md §5 ``mentions``):
    (mention_id:string, conv_id:string, turn_idx:int32,
     start:int32, end:int32, surface:string)
with ``start``/``end`` char offsets into ``norm_text`` and the invariant
``norm_text[start:end] == surface`` (reference asserts the same per-mention
text equality at /root/reference/utils_e2e_span.py:96).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray

from biomedical_el_ray.stages.normalize import normalize_array


_TOKEN_RE = re.compile(r"\S+")

MENTIONS_SCHEMA = pa.schema(
    [
        ("mention_id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
    ]
)


def build_gazetteer(alias_lists):
    """(first-token -> candidate token-lengths desc, full alias set).

    Matching cost per token position is O(#distinct lengths) set probes —
    independent of KB size (a per-first-token candidate-LIST scan grows
    linearly with the alias count and was measured 8x slower at a 266k-
    entity KB).  ``alias_lists`` is an iterable of alias strings (raw;
    they are normalized here with the same normalizer the text goes
    through, so matcher and text agree byte-for-byte).
    """
    aliases = sorted(
        {a.as_py() if hasattr(a, "as_py") else a for al in alias_lists for a in al}
    )
    norm = [s.as_py() for s in normalize_array(pa.array(aliases, pa.string()))]
    lengths_of: dict[str, set[int]] = {}
    alias_set: set[str] = set()
    for a in norm:
        toks = a.split(" ")
        alias_set.add(a)
        lengths_of.setdefault(toks[0], set()).add(len(toks))
    index = {
        k: sorted(v, reverse=True) for k, v in lengths_of.items()
    }
    return index, alias_set


class MentionExtractor:
    """Callable class for ``map_batches(..., concurrency=N)`` (actor pool).

    ``gazetteer_ref`` is an ``ObjectRef`` from ``ray.put`` (broadcast once,
    read per actor) or a plain dict for driver-side use.
    """

    def __init__(self, gazetteer_ref, text_col: str = "norm_text"):
        self.index, self.alias_set = (
            ray.get(gazetteer_ref)
            if isinstance(gazetteer_ref, ray.ObjectRef)
            else gazetteer_ref
        )
        self.text_col = text_col
        self._first_tok_arr = None  # built lazily (arrow value_set for is_in)

    def _extract_one(self, text: str):
        """Yield (start, end) spans, leftmost-longest, non-overlapping.

        Tokenization is ONE ``str.split`` (normalized text is single-space
        separated); token offsets are running sums — no per-token match
        objects or tuples (the regex-finditer version allocated ~3 objects
        per token, and allocation churn across many workers is the
        engine's main scaling tax on one box).
        """
        toks = text.split(" ")
        index = self.index
        alias_set = self.alias_set
        n = len(toks)
        # start offset of token i = sum(len(t)+1 for earlier tokens)
        i = 0
        pos = 0
        out = []
        while i < n:
            tok = toks[i]
            lengths = index.get(tok)
            if lengths is not None:
                for L in lengths:  # longest first
                    if i + L > n:
                        continue
                    end = pos + len(tok) if L == 1 else (
                        pos + sum(len(toks[j]) for j in range(i, i + L)) + L - 1
                    )
                    # the candidate span IS the text slice — one set probe
                    if text[pos:end] in alias_set:
                        out.append((pos, end))
                        for j in range(i, i + L):
                            pos += len(toks[j]) + 1
                        i += L
                        break
                else:
                    pos += len(tok) + 1
                    i += 1
            else:
                pos += len(tok) + 1
                i += 1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Per-row loop over ``_extract_one``: with the O(1)-per-position
        set-probe gazetteer this runs ~62k turns/s/core — 3x FASTER than an
        Arrow split_pattern + is_in candidate prefilter (measured; the
        kernel outputs then still need per-token Python materialization,
        which costs more than the loop saves)."""
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        mid, mc, mt, ms, me, surf = [], [], [], [], [], []
        for c, t, text in zip(conv, turn, texts):
            for k, (s, e) in enumerate(self._extract_one(text)):
                mid.append(f"{c}:{t}:{k}")
                mc.append(c)
                mt.append(t)
                ms.append(s)
                me.append(e)
                surf.append(text[s:e])
        return pa.Table.from_arrays(
            [
                pa.array(mid, pa.string()),
                pa.array(mc, pa.string()),
                pa.array(mt, pa.int32()),
                pa.array(ms, pa.int32()),
                pa.array(me, pa.int32()),
                pa.array(surf, pa.string()),
            ],
            schema=MENTIONS_SCHEMA,
        )


def _gaz_cache_dir() -> str:
    """User-private cache dir (0700, ownership-checked).

    The cache is pickled, so it must NEVER live in a predictable
    world-writable location (/tmp): another local user could pre-plant a
    malicious pickle there.  ~/.cache is created 0700 and verified to be
    owned by us and not group/world-writable before any load.
    """
    import os
    import stat

    base = os.environ.get("BEL_RAY_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "bel_ray_gazcache"
    )
    os.makedirs(base, mode=0o700, exist_ok=True)
    st = os.stat(base)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        raise RuntimeError(
            f"gazetteer cache dir {base} is not private to this user "
            "(unsafe for pickle); set BEL_RAY_CACHE_DIR to a private path"
        )
    return base


def load_gazetteer_cached(entities_path: str):
    """Build-or-load the gazetteer, memoized on disk.

    The build normalizes + indexes every KB alias (~6s serial driver time
    at a 266k-entity KB) and is a pure function of the entities file, so
    it is pickled under a user-private cache dir keyed by
    (path, mtime, size) and reused by every subsequent run over the same KB.
    """
    import hashlib
    import os
    import pickle

    import pyarrow.parquet as pq

    cache_dir = _gaz_cache_dir()
    st = os.stat(entities_path)
    key = hashlib.blake2b(
        f"{os.path.abspath(entities_path)}:{st.st_mtime_ns}:{st.st_size}:v2".encode(),
        digest_size=16,
    ).hexdigest()
    path = os.path.join(cache_dir, f"{key}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    ents = pq.read_table(entities_path, columns=["aliases"])
    gaz = build_gazetteer(ents["aliases"])
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(gaz, f)
    os.replace(tmp, path)
    return gaz


def _extract_batch(batch: pa.Table, gazetteer_ref=None) -> pa.Table:
    """Task-based extraction; gazetteer cached once per worker process."""
    from biomedical_el_ray.util import ref_key, worker_state

    ext = worker_state(
        ("gazetteer", ref_key(gazetteer_ref)),
        lambda: MentionExtractor(gazetteer_ref),
    )
    return ext(batch)


def extract_mentions(
    ds,
    gazetteer: dict | None = None,
    entities_path: str | None = None,
    concurrency=None,
    batch_size: int = 4096,
):
    """transcripts-with-norm_text Dataset -> mentions Dataset.

    The gazetteer is built driver-side from the (small) KB and broadcast
    with ``ray.put`` so each worker deserializes it once — never re-shipped
    per batch (SURVEY.md §2.4 J2 broadcast-small-side pattern).  Runs as
    plain tasks with a per-worker state cache (util.worker_state): identical
    state semantics to an actor pool, none of the pool-launch ramp.
    """
    if gazetteer is None:
        gazetteer = load_gazetteer_cached(entities_path)
    ref = ray.put(gazetteer)
    return ds.map_batches(
        _extract_batch,
        fn_kwargs={"gazetteer_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def mentions_cte(corpus_dir: str) -> str:
    """CTE chain version of ``mentions_oracle_sql`` (to splice after
    ``WITH RECURSIVE`` — the scan CTE is recursive), ending in
    ``mres(mention_id, conv_id, turn_idx, start, "end", surface)``.
    Internal names: ents turns tk pos lens cand hit best nt2 scan matched
    res — callers combining this with other chains must avoid them."""
    ents = f"read_parquet('{corpus_dir}/entities.parquet')"
    trans = f"read_parquet('{corpus_dir}/transcripts.parquet')"
    norm = r"regexp_replace(trim(lower({0})), '\s+', ' ', 'g')"
    return f"""ents AS (
          SELECT DISTINCT {norm.format('al')} AS alias
          FROM (SELECT unnest(aliases) AS al FROM {ents})),
        turns AS (
          SELECT conv_id, turn_idx, {norm.format('text')} AS nt
          FROM {trans}),
        tk AS (
          SELECT conv_id, turn_idx, nt,
                 unnest(sp) AS tok,
                 unnest(generate_series(1, len(sp))) AS i,
                 len(sp) AS ntoks
          FROM (SELECT conv_id, turn_idx, nt, string_split(nt, ' ') AS sp
                FROM turns)),
        pos AS (
          SELECT conv_id, turn_idx, nt, tok, i, ntoks,
                 coalesce(sum(length(tok) + 1) OVER (
                     PARTITION BY conv_id, turn_idx ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)::BIGINT AS pstart
          FROM tk),
        lens AS (SELECT DISTINCT len(string_split(alias, ' ')) AS L FROM ents),
        cand AS (
          SELECT a.conv_id, a.turn_idx, a.i, l.L, a.pstart AS s,
                 (b.pstart + length(b.tok))::BIGINT AS e,
                 substr(a.nt, a.pstart + 1,
                        b.pstart + length(b.tok) - a.pstart) AS span
          FROM pos a
          JOIN lens l ON a.i + l.L - 1 <= a.ntoks
          JOIN pos b ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx
                    AND b.i = a.i + l.L - 1),
        hit AS (SELECT c.* FROM cand c JOIN ents ON c.span = ents.alias),
        best AS (
          SELECT conv_id, turn_idx, i, max(L) AS L
          FROM hit GROUP BY 1, 2, 3),
        nt2 AS (SELECT DISTINCT conv_id, turn_idx, ntoks FROM tk),
        scan AS (
          SELECT conv_id, turn_idx, 1 AS i FROM nt2
          UNION ALL
          SELECT s.conv_id, s.turn_idx, s.i + coalesce(b.L, 1) AS i
          FROM scan s
          JOIN nt2 n ON n.conv_id = s.conv_id AND n.turn_idx = s.turn_idx
          LEFT JOIN best b ON b.conv_id = s.conv_id
                          AND b.turn_idx = s.turn_idx AND b.i = s.i
          WHERE s.i + coalesce(b.L, 1) <= n.ntoks),
        matched AS (
          SELECT s.conv_id, s.turn_idx, s.i, b.L
          FROM scan s
          JOIN best b ON b.conv_id = s.conv_id
                     AND b.turn_idx = s.turn_idx AND b.i = s.i),
        res AS (
          SELECT m.conv_id, m.turn_idx, h.s, h.e, h.span,
                 row_number() OVER (PARTITION BY m.conv_id, m.turn_idx
                                    ORDER BY m.i) - 1 AS k
          FROM matched m
          JOIN hit h ON h.conv_id = m.conv_id AND h.turn_idx = m.turn_idx
                    AND h.i = m.i AND h.L = m.L),
        mres AS MATERIALIZED (
          SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR)
                   || ':' || CAST(k AS VARCHAR) AS mention_id,
                 conv_id, turn_idx::INT AS turn_idx,
                 s::INT AS start, e::INT AS "end", span AS surface
          FROM res)"""


def mentions_oracle_sql(corpus_dir: str) -> str:
    """DuckDB SQL equivalent of ``extract_mentions`` over the synthetic
    corpus: leftmost-longest non-overlapping gazetteer matching.

    The greedy scan (``_extract_one``: at each token either consume the
    longest matching alias span or advance one token) is inherently
    sequential per turn, so it rides a recursive CTE whose rows advance
    every turn's cursor in lockstep; everything else — normalization
    (same expression as the ``normalize_turns`` oracle), token offsets,
    candidate spans per (position, alias-token-count), membership — is
    relational.  Matches the kernel's "longest L whose joined span is in
    the alias set" semantics exactly: the per-first-token length index is
    only a lookup accelerator, never a semantic filter."""
    return f"""
        WITH RECURSIVE {mentions_cte(corpus_dir)}
        SELECT mention_id, conv_id, turn_idx, start, "end", surface
        FROM mres
    """

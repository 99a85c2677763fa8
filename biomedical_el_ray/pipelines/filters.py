"""Corpus hygiene operators: PII redaction and a Gopher-style quality
filter over the ``documents`` table.

Both are pure streaming ``map_batches`` stages (no shuffle, no state):
exactly the shape that matters at 100 TB — every batch is transformed
with Arrow RE2 kernels / numpy run detection and nothing but the output
rows leaves the task.

``pii_redact``
    Sequentially replaces email addresses, IPv4 addresses and phone
    numbers with placeholder tokens and reports per-category match
    counts.  The standard pre-training scrub step (e.g. the C4 / RefinedWeb
    pipelines); patterns are RE2 on both sides so the DuckDB oracle
    (nested ``regexp_replace(..., 'g')``) is bit-exact.  Each stage
    counts matches on the text it actually sees (post-prior-stage), so
    an IPv4 hidden inside an already-redacted email is not double
    counted.

``gopher_filter``
    The Rae et al. 2021 (Gopher, Table A1) document-quality rules recast
    as one vectorized pass producing a per-document ``reason_mask``
    bitmap plus ``keep``; thresholds are integer fixed-point (percent /
    mean-word-length-x100) so the oracle matches bit-for-bit.  Returning
    every row with its mask — rather than only survivors — keeps the
    operator composable (``.filter`` on ``keep``) and the drop reasons
    auditable, the "never silent" counter rule this repo uses everywhere.

Analog in the reference: the hygiene gates its preprocessing applies
inline (mention drop rules in /root/reference/preprocess_data.py:artifact
filtering, −1-offset drops) — here generalized to corpus-level quality
rules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.pipelines.textstats import _exploded_tokens
from biomedical_el_ray.sources.readers import read_table

# RE2 patterns, identical strings on the Arrow and DuckDB sides.
# Order matters: applied (and counted) sequentially.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[\- ]\d{3,4}[\- ]\d{4}\b", "<PHONE>"),
)


def _pii_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    counts = []
    for _name, pat, repl in PII_PATTERNS:
        c = pc.fill_null(pc.cast(pc.count_substring_regex(text, pat), pa.int64()), 0)
        counts.append(c)
        text = pc.replace_substring_regex(text, pat, repl)
    total = counts[0]
    for c in counts[1:]:
        total = pc.add(total, c)
    return pa.Table.from_arrays(
        [t["doc_id"], text, *counts, total],
        names=["doc_id", "text_redacted",
               *[f"n_{name}" for name, _, _ in PII_PATTERNS], "n_pii"],
    )


def redact_pii(docs_ds):
    """Dataset with (doc_id, text) -> (doc_id, text_redacted, n_email,
    n_ipv4, n_phone, n_pii).  Map-only; order-free."""
    return docs_ds.map_batches(
        _pii_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def pii_redact(sf_dir: str):
    """Driver-contract query over the ``documents`` table."""
    return redact_pii(read_table(sf_dir, "documents", ["doc_id", "text"]))


def pii_oracle_sql(docs_rel: str = "documents") -> str:
    """Exact DuckDB twin: nested global ``regexp_replace`` with counts
    taken at each nesting level (matching sequential application)."""
    stages = []
    expr = "text"
    for name, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted literals pass backslashes through verbatim,
        # so the RE2 pattern embeds unchanged (only quotes need doubling)
        pat_sql = pat.replace("'", "''")
        stages.append(
            f"coalesce(len(regexp_extract_all({expr}, '{pat_sql}')), 0)"
            f" AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    count_cols = ",\n                   ".join(stages)
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
        WITH c AS (
          SELECT doc_id, {expr} AS text_redacted,
                   {count_cols}
          FROM {docs_rel})
        SELECT doc_id, text_redacted,
               CAST(n_email AS BIGINT) AS n_email,
               CAST(n_ipv4 AS BIGINT) AS n_ipv4,
               CAST(n_phone AS BIGINT) AS n_phone,
               CAST({total} AS BIGINT) AS n_pii
        FROM c
    """


# --------------------------------------------------------------------------
# Gopher-style quality filter
# --------------------------------------------------------------------------

# reason_mask bits (Rae et al. 2021 Table A1, integer fixed-point forms)
R_TOO_SHORT = 1        # n_tokens < min_words
R_TOO_LONG = 2         # n_tokens > max_words
R_WORD_LEN = 4         # mean word length x100 outside [300, 1000]
R_ALPHA = 8            # words containing an alphabetic char < 80%
R_STOPWORDS = 16       # fewer than 2 distinct required words present
R_TOP_TOKEN = 32       # most frequent word > 10% of tokens (hash of repetition)
R_DUP_2GRAM = 64       # duplicate word-2gram share > 20%

# the synthetic driver corpus is lowercase database-vocabulary word salad;
# the required-word list is corpus-adapted (Gopher's own list is the
# English {the, be, to, of, and, ...} — pass it via ``stop_words`` for a
# natural-language corpus)
DEFAULT_STOP_WORDS: tuple[str, ...] = ("table", "scan", "join", "data")


def _run_sums(row: np.ndarray, values: np.ndarray, n_rows: int) -> np.ndarray:
    """Per-row sums of ``values`` where ``row`` is nondecreasing."""
    out = np.zeros(n_rows, dtype=np.int64)
    if len(row):
        np.add.at(out, row, values)
    return out


class GopherFilter:
    """Stateless-but-configured batch callable (thresholds fixed at
    construction; an actor pool reuses one compiled config per worker)."""

    def __init__(self, min_words: int = 50, max_words: int = 100_000,
                 stop_words: tuple[str, ...] = DEFAULT_STOP_WORDS):
        self.min_words = min_words
        self.max_words = max_words
        self.stop = pa.array(sorted(set(stop_words)), pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        row, tok = _exploded_tokens(t["text"])
        n_tokens = np.bincount(row, minlength=n).astype(np.int64)
        tok_len = np.asarray(pc.utf8_length(tok), dtype=np.int64)
        char_sum = _run_sums(row, tok_len, n)
        den = np.maximum(n_tokens, 1)
        mwl_fp = char_sum * 100 // den
        alpha = np.asarray(
            pc.match_substring_regex(tok, "[a-zA-Z]")
        ).astype(np.int64)
        alpha_pct = _run_sums(row, alpha, n) * 100 // den

        # distinct stop words present per row: filter to stop hits, then
        # run-detect (row, stop_idx) duplicates on the lexsorted pairs
        sidx = np.asarray(
            pc.fill_null(pc.index_in(tok, value_set=self.stop), -1)
        ).astype(np.int64)
        hit = sidx >= 0
        hrow, hsid = row[hit], sidx[hit]
        if len(hrow):
            order = np.lexsort((hsid, hrow))
            hrow, hsid = hrow[order], hsid[order]
            first = np.ones(len(hrow), dtype=bool)
            first[1:] = (hrow[1:] != hrow[:-1]) | (hsid[1:] != hsid[:-1])
            n_stop = np.bincount(hrow[first], minlength=n).astype(np.int64)
        else:
            n_stop = np.zeros(n, dtype=np.int64)

        # repetition signals (shared kernels with repetition_scores)
        from biomedical_el_ray.pipelines.textstats import (
            _per_row_distinct_and_top,
        )
        _, top_tok_n = _per_row_distinct_and_top(row, tok, n)
        top_tok_pct = top_tok_n * 100 // den
        if len(row) >= 2:
            adj = row[1:] == row[:-1]
            lo = np.flatnonzero(adj)
            pair_row = row[lo]
            t_arr = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
            pairs = pc.binary_join_element_wise(
                t_arr.take(pa.array(lo)), t_arr.take(pa.array(lo + 1)), " "
            )
        else:
            pair_row = np.empty(0, dtype=np.int64)
            pairs = pa.array([], pa.string())
        n_2g = np.bincount(pair_row, minlength=n).astype(np.int64)
        distinct_2g, _ = _per_row_distinct_and_top(pair_row, pairs, n)
        dup_2gram_pct = (n_2g - distinct_2g) * 100 // np.maximum(n_2g, 1)

        mask = np.zeros(n, dtype=np.int64)
        mask |= np.where(n_tokens < self.min_words, R_TOO_SHORT, 0)
        mask |= np.where(n_tokens > self.max_words, R_TOO_LONG, 0)
        mask |= np.where((mwl_fp < 300) | (mwl_fp > 1000), R_WORD_LEN, 0)
        mask |= np.where(alpha_pct < 80, R_ALPHA, 0)
        mask |= np.where(n_stop < 2, R_STOPWORDS, 0)
        mask |= np.where(top_tok_pct > 10, R_TOP_TOKEN, 0)
        mask |= np.where(dup_2gram_pct > 20, R_DUP_2GRAM, 0)

        return pa.Table.from_arrays(
            [
                t["doc_id"],
                pa.array(n_tokens), pa.array(mwl_fp), pa.array(alpha_pct),
                pa.array(n_stop), pa.array(top_tok_pct),
                pa.array(dup_2gram_pct), pa.array(mask),
                pa.array((mask == 0).astype(np.int64)),
            ],
            names=["doc_id", "n_tokens", "mwl_fp", "alpha_pct", "n_stop",
                   "top_tok_pct", "dup_2gram_pct", "reason_mask", "keep"],
        )


def quality_filter(docs_ds, **kwargs):
    """Dataset with (doc_id, text) -> per-document Gopher rule verdicts.
    ``.filter`` on ``keep == 1`` (or inspect ``reason_mask``) downstream."""
    return docs_ds.map_batches(
        GopherFilter, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8),
    )


def gopher_filter(sf_dir: str):
    """Driver-contract query over the ``documents`` table."""
    return quality_filter(read_table(sf_dir, "documents", ["doc_id", "text"]))


def gopher_oracle_sql(docs_rel: str = "documents", min_words: int = 50,
                      max_words: int = 100_000,
                      stop_words: tuple[str, ...] = DEFAULT_STOP_WORDS) -> str:
    """Exact DuckDB twin of ``gopher_filter`` (same fixed-point ratios,
    same mask bits)."""
    stop_list = ", ".join(f"'{w}'" for w in sorted(set(stop_words)))
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
          FROM {docs_rel}),
        ex AS MATERIALIZED (
          SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
          FROM toks),
        base AS (
          SELECT doc_id,
                 count(*) AS n_tokens,
                 sum(length(tok)) AS char_sum,
                 count(*) FILTER (WHERE regexp_matches(tok, '[a-zA-Z]'))
                   AS n_alpha,
                 count(DISTINCT tok) FILTER (WHERE tok IN ({stop_list}))
                   AS n_stop,
                 max(cnt) AS top_tok_n
          FROM (SELECT doc_id, tok, i,
                       count(*) OVER (PARTITION BY doc_id, tok) AS cnt
                FROM ex)
          GROUP BY doc_id),
        bg AS (
          SELECT a.doc_id, a.tok || ' ' || b.tok AS pair
          FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        bga AS (
          SELECT doc_id, count(*) AS n_2g,
                 count(*) - count(DISTINCT pair) AS n_dup
          FROM bg GROUP BY doc_id),
        m AS (
          SELECT d.doc_id,
                 CAST(coalesce(b.n_tokens, 0) AS BIGINT) AS n_tokens,
                 CAST(coalesce(b.char_sum, 0) * 100
                      // greatest(coalesce(b.n_tokens, 0), 1) AS BIGINT)
                   AS mwl_fp,
                 CAST(coalesce(b.n_alpha, 0) * 100
                      // greatest(coalesce(b.n_tokens, 0), 1) AS BIGINT)
                   AS alpha_pct,
                 CAST(coalesce(b.n_stop, 0) AS BIGINT) AS n_stop,
                 CAST(coalesce(b.top_tok_n, 0) * 100
                      // greatest(coalesce(b.n_tokens, 0), 1) AS BIGINT)
                   AS top_tok_pct,
                 CAST(coalesce(g.n_dup, 0) * 100
                      // greatest(coalesce(g.n_2g, 0), 1) AS BIGINT)
                   AS dup_2gram_pct
          FROM {docs_rel} d
          LEFT JOIN base b ON b.doc_id = d.doc_id
          LEFT JOIN bga g ON g.doc_id = d.doc_id),
        v AS (
          SELECT *,
                 CAST(CASE WHEN n_tokens < {min_words} THEN {R_TOO_SHORT} ELSE 0 END
                    + CASE WHEN n_tokens > {max_words} THEN {R_TOO_LONG} ELSE 0 END
                    + CASE WHEN mwl_fp < 300 OR mwl_fp > 1000 THEN {R_WORD_LEN} ELSE 0 END
                    + CASE WHEN alpha_pct < 80 THEN {R_ALPHA} ELSE 0 END
                    + CASE WHEN n_stop < 2 THEN {R_STOPWORDS} ELSE 0 END
                    + CASE WHEN top_tok_pct > 10 THEN {R_TOP_TOKEN} ELSE 0 END
                    + CASE WHEN dup_2gram_pct > 20 THEN {R_DUP_2GRAM} ELSE 0 END
                   AS BIGINT) AS reason_mask
          FROM m)
        SELECT doc_id, n_tokens, mwl_fp, alpha_pct, n_stop, top_tok_pct,
               dup_2gram_pct, reason_mask,
               CAST(CASE WHEN reason_mask = 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS keep
        FROM v
    """

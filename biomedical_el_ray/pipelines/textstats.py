"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline utilities (token counting, quality scoring,
fingerprinting, language ID), each a streaming ``map_batches`` over Arrow
batches with semantics pinned to a DuckDB-oracle SQL expression (see
``__ray_entry__.oracle_sql``).  M10/M11-analogs of the reference's
tokenizer normalization + subword counting
(/root/reference/tokenization_bert.py:321-494) recast as data-quality ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.functions.langid import predict_lang
from biomedical_el_ray.functions.simhash import simhash64
from biomedical_el_ray.sources.readers import read_table


def _unique_token_counts(text) -> np.ndarray:
    """Distinct whitespace-token count per row, fully vectorized and
    exact: split (Arrow C++), explode with row ids, one multi-key Arrow
    sort, adjacent-duplicate drop, bincount.  No per-row Python, no hash
    approximation (a token-hash distinct-count could collide and drift
    from the ``list_distinct`` oracle)."""
    n = len(text)
    # RE2 '\s' (ASCII) split, matching the oracle's '\S+' token class —
    # utf8_split_whitespace would also split on Unicode whitespace
    lists = pc.split_pattern_regex(pc.fill_null(text, ""), r"\s+").combine_chunks()
    flat = lists.flatten()
    per_row = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    row = np.repeat(np.arange(n, dtype=np.int64), per_row)
    # split emits empty strings at string boundaries; the '\S+' oracle
    # drops them
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    row = row[keep]
    s = pa.table(
        {"row": pa.array(row), "tok": flat.filter(pa.array(keep))}
    ).sort_by([("row", "ascending"), ("tok", "ascending")])
    r = s["row"].to_numpy()
    tk = s["tok"].combine_chunks()
    if len(r) == 0:
        return np.zeros(n, dtype=np.int64)
    first = np.ones(len(r), dtype=bool)
    first[1:] = (r[1:] != r[:-1]) | ~np.asarray(
        pc.equal(tk.slice(1), tk.slice(0, len(r) - 1))
    )
    return np.bincount(r[first], minlength=n)


def _token_stats_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    n_tokens = pc.count_substring_regex(text, r"\S+")
    n_chars = pc.utf8_length(text)
    n_spaces = pc.count_substring(text, " ")
    uniq = pa.array(_unique_token_counts(text), pa.int64())
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            pc.cast(n_tokens, pa.int64()),
            pc.cast(n_chars, pa.int64()),
            pc.cast(n_spaces, pa.int64()),
            uniq,
        ],
        names=["doc_id", "n_tokens", "len_chars", "n_spaces", "n_unique_tokens"],
    )


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, len_chars, n_spaces, n_unique_tokens)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# BPE-ish pre-tokenizer pattern (GPT-2 style, RE2-compatible: no
# lookarounds, no contraction classes): letter runs, digit runs,
# punctuation runs — each with an optional leading space — plus bare
# space runs.  pyarrow.compute and DuckDB both run RE2, so the Ray count
# and the oracle's regexp_extract_all agree byte-for-byte.
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def _bpe_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    n_bpe = pc.cast(pc.count_substring_regex(text, BPE_PATTERN), pa.int64())
    n_ws = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    denom = pc.max_element_wise(n_ws, pa.scalar(1, pa.int64()))
    return pa.Table.from_arrays(
        [
            t["doc_id"], n_bpe, n_ws,
            pc.divide(pc.cast(n_bpe, pa.float64()), pc.cast(denom, pa.float64())),
        ],
        names=["doc_id", "n_bpe_tokens", "n_ws_tokens", "fertility"],
    )


def bpe_token_stats(sf_dir: str):
    """(doc_id, n_bpe_tokens, n_ws_tokens, fertility) — subword-style
    token counting with a BPE-ish pre-tokenizer regex; fertility
    (subwords per whitespace word) is the standard tokenizer-cost metric
    a training-data pipeline budgets by."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _bpe_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def bpe_token_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB SQL equivalent of ``bpe_token_stats`` (same RE2 pattern)."""
    return f"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
                 AS n_bpe_tokens,
               CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                 AS n_ws_tokens,
               CAST(length(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                 / greatest(length(regexp_extract_all(text, '\\S+')), 1)
                 AS fertility
        FROM {docs_rel}
    """


def source_length_quantiles(sf_dir: str):
    """(source, n_docs, p50, p90, p99) — exact per-source document-length
    order statistics (discrete/inverted-CDF quantiles, matching DuckDB's
    ``quantile_disc`` bit-for-bit).

    ONE keyed repartition co-locates each source's lengths; the quantile
    is in-task numpy.  Exact group quantiles need the whole group by
    definition — at 100 TB swap the in-task kernel for a t-digest merge
    (partial sketches inside map_batches, tiny final groupby) behind the
    same output schema.
    """
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    docs = ensure_hash_shuffle(
        read_table(sf_dir, "documents", ["source", "n_chars"])
    )

    def _q(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()),
             ("p50", pa.int64()), ("p90", pa.int64()), ("p99", pa.int64())]
        )
        if t.num_rows == 0 or "source" not in t.column_names:
            return schema.empty_table()
        idx = pc.sort_indices(
            t, sort_keys=[("source", "ascending"), ("n_chars", "ascending")]
        )
        t = t.take(idx)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        change = np.empty(len(src), dtype=bool)
        change[0] = True
        change[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(src))
        n = ends - starts
        # inverted-CDF index: smallest i with (i+1)/n >= q  ->  ceil(q*n)-1
        def pick(q: float) -> np.ndarray:
            k = np.ceil(q * n).astype(np.int64) - 1
            return v[starts + np.maximum(k, 0)]

        return pa.Table.from_arrays(
            [
                pa.array(src[starts], pa.string()),
                pa.array(n, pa.int64()),
                pa.array(pick(0.5), pa.int64()),
                pa.array(pick(0.9), pa.int64()),
                pa.array(pick(0.99), pa.int64()),
            ],
            schema=schema,
        )

    return docs.repartition(shuffle_partitions(), keys=["source"]).map_batches(
        _q, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def source_length_quantiles_oracle_sql(docs_rel: str = "documents") -> str:
    """DuckDB SQL equivalent of ``source_length_quantiles``."""
    return f"""
        SELECT source, count(*) AS n_docs,
               CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
               CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
               CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
        FROM {docs_rel} GROUP BY source
    """


def _quality_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[a-zA-Z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    alpha_ratio = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64()))
    return pa.Table.from_arrays(
        [t["doc_id"], n_chars, n_alpha, n_digit, n_tokens, alpha_ratio],
        names=["doc_id", "n_chars_m", "n_alpha", "n_digit", "n_tokens", "alpha_ratio"],
    )


def quality_scores(sf_dir: str):
    """(doc_id, n_chars_m, n_alpha, n_digit, n_tokens, alpha_ratio)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _fingerprint_batch(t: pa.Table) -> pa.Table:
    md5 = hashlib.md5
    fps = [
        md5((s or "").encode("utf-8")).hexdigest() for s in t["text"].to_pylist()
    ]
    return pa.Table.from_arrays(
        [t["doc_id"], pa.array(fps, pa.string())], names=["doc_id", "fingerprint"]
    )


def fingerprints(sf_dir: str):
    """(doc_id, fingerprint) — md5 hex, byte-identical to DuckDB md5()."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _simhash_batch(t: pa.Table) -> pa.Table:
    sigs = simhash64(t["text"].to_pylist())
    hexes = [f"{int(s):016x}" for s in sigs]
    return pa.Table.from_arrays(
        [t["doc_id"], pa.array(hexes, pa.string())], names=["doc_id", "simhash"]
    )


def simhash_fingerprints(sf_dir: str):
    """(doc_id, simhash hex) — rows-only (no SQL equivalent)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _langid_batch(t: pa.Table) -> pa.Table:
    preds = predict_lang(t["text"])
    return pa.Table.from_arrays(
        [t["doc_id"], pa.array(preds, pa.string()), t["lang"]],
        names=["doc_id", "pred_lang", "lang"],
    )


def language_id(sf_dir: str):
    """(doc_id, pred_lang, lang) — heuristic stopword classifier
    (DuckDB-oracle checked via functions.langid.langid_oracle_sql)."""
    return read_table(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        _langid_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --------------------------------------------------------------------------
# Corpus-fit bigram LM quality scoring (fit -> broadcast -> apply)
# --------------------------------------------------------------------------
#
# The CCNet-style "score each document under a language model fit on the
# corpus" quality filter, with a byte-bigram model standing in for the LM
# (the seam where a real KenLM/token model would plug in).  Two passes:
#
#   1. FIT: streaming map_batches emits per-block partial bigram counts
#      (<= 65536 nonzero rows per block), one small groupby-sum shuffle
#      reduces them, and the bounded model (65536 bigram counts + 256
#      start-byte counts) is broadcast with ray.put — the classic
#      partial-aggregate + broadcast-small-side shape, so the fit streams
#      at any corpus size.
#   2. APPLY: map_batches gathers each document's per-bigram conditional
#      probability (fixed-point ppm: c(ab) * 1e6 // c(a), INTEGER
#      arithmetic so numpy and the DuckDB oracle agree exactly and the
#      result is independent of summation order) and reduces per doc with
#      np.add/minimum.reduceat.
#
# Texts are utf-8 encoded and zero-padded to >= 2 bytes (the same rule as
# functions.hashing.shingle_hashes_flat), so every document scores.


def _bigram_codes_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """All byte-bigram codes (b0 + 256*b1, little-endian) per text, with
    multiplicity and in order -> (flat int64 codes, per-row lengths).

    Rides the shared raw-window kernel (``hashing.packed_windows``), so
    the padding rule can never drift from ``shingle_hashes_flat``'s —
    the SQL oracle's exactness depends on that lockstep."""
    from biomedical_el_ray.functions.hashing import packed_windows

    codes, counts = packed_windows(texts, 2)
    return codes.astype(np.int64), counts


def _bigram_partial(t: pa.Table) -> pa.Table:
    codes, _ = _bigram_codes_flat(t["text"].to_pylist())
    cnt = np.bincount(codes, minlength=65536)
    nz = np.nonzero(cnt)[0]
    return pa.Table.from_arrays(
        [pa.array(nz.astype(np.int32)), pa.array(cnt[nz].astype(np.int64))],
        names=["code", "n"],
    )


def fit_bigram_model(docs_ds) -> tuple[np.ndarray, np.ndarray]:
    """documents Dataset -> (65536 bigram counts, 256 start-byte counts).

    The groupby reduces <= 65536 rows per block; take_all touches only the
    bounded model table, never the corpus."""
    agg = (
        docs_ds.map_batches(
            _bigram_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("code")
        .sum("n")
    )
    vec = np.zeros(65536, dtype=np.int64)
    for row in agg.take_all():
        vec[row["code"]] = row["sum(n)"]
    # code = b0 + 256*b1 -> reshape axis0 = b1: start-byte totals sum axis0
    uni = vec.reshape(256, 256).sum(axis=0)
    return vec, uni


def _lm_score_batch(t: pa.Table, model_ref) -> pa.Table:
    import ray

    from biomedical_el_ray.util import ref_key, worker_state

    vec, uni = worker_state(
        ("lm_bigram_model", ref_key(model_ref)), lambda: ray.get(model_ref)
    )
    texts = t["text"].to_pylist()
    codes, lengths = _bigram_codes_flat(texts)
    ppm = vec[codes] * 1_000_000 // uni[codes & 255]
    offsets = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    sum_ppm = np.add.reduceat(ppm, offsets) if len(ppm) else np.zeros(0, np.int64)
    min_ppm = np.minimum.reduceat(ppm, offsets) if len(ppm) else np.zeros(0, np.int64)
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            pa.array(lengths, pa.int64()),
            pa.array(sum_ppm.astype(np.int64), pa.int64()),
            pa.array(min_ppm.astype(np.int64), pa.int64()),
            pa.array((sum_ppm // lengths).astype(np.int64), pa.int64()),
        ],
        names=["doc_id", "n_bigrams", "sum_ppm", "min_ppm", "avg_ppm"],
    )


def lm_quality(sf_dir: str):
    """(doc_id, n_bigrams, sum_ppm, min_ppm, avg_ppm) — per-document
    fixed-point bigram-LM quality under the corpus-fit model."""
    import ray

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    model_ref = ray.put(fit_bigram_model(docs))
    return docs.map_batches(
        _lm_score_batch,
        fn_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lm_quality_oracle_sql(docs_rel: str = "documents") -> str:
    """Exact DuckDB twin: raw k=2 shingle chain (the pre-splitmix packed
    window IS the bigram code), corpus counts, fixed-point integer ppm."""
    from biomedical_el_ray.functions.sql_hash import shingle_cte

    sh = shingle_cte(docs_rel, 2, positional=True, prefix="lm", raw=True)
    return f"""
        WITH {sh},
        cnts AS MATERIALIZED (
          SELECT h AS code, count(*) AS c FROM lmsh GROUP BY h),
        unic AS MATERIALIZED (
          SELECT code & 255 AS a, sum(c) AS ca FROM cnts GROUP BY 1),
        sc AS (
          SELECT s.doc_id, c.c * 1000000 // u.ca AS ppm
          FROM lmsh s
          JOIN cnts c ON c.code = s.h
          JOIN unic u ON u.a = (s.h & 255))
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(ppm) AS BIGINT) AS sum_ppm,
               CAST(min(ppm) AS BIGINT) AS min_ppm,
               CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm
        FROM sc GROUP BY doc_id
    """


# --------------------------------------------------------------------------
# Vocabulary induction: global top-k frequent tokens
# --------------------------------------------------------------------------

def top_tokens(sf_dir: str, k: int = 100):
    """(tok, n, rk) — the k globally most frequent whitespace tokens.

    Scale shape: per-block PARTIAL token counts (Arrow split +
    value_counts, no Python per row) shrink the shuffle to the per-block
    distinct-token domain; one groupby-sum completes the counts; the
    global top-k is a sort-limit over the aggregated (distinct-token)
    table only.  Ties break by token for determinism at any parallelism.
    """
    docs = read_table(sf_dir, "documents", ["text"])

    def _partial(t: pa.Table) -> pa.Table:
        # RE2 '\s' split, matching the oracle's '\S+' class (see
        # _unique_token_counts)
        lists = pc.split_pattern_regex(
            pc.fill_null(t["text"], ""), r"\s+"
        ).combine_chunks()
        flat = lists.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        vc = pc.value_counts(flat)
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["tok", "n"],
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .sum("n")
    )
    topk = agg.map_batches(
        lambda t: t.rename_columns(["tok", "n"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["n", "tok"], descending=[True, False]).limit(k)

    def _rank(t: pa.Table) -> pa.Table:
        # re-sort locally (<= k rows, free) so rk never depends on
        # sort().limit().repartition(1) preserving global order — that
        # holds in current Ray Data but is an implementation detail
        import numpy as np

        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("tok", "ascending")]
        )
        t = t.take(idx)
        rk = pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))
        return pa.Table.from_arrays([t["tok"], t["n"], rk], names=["tok", "n", "rk"])

    return topk.repartition(1).map_batches(
        _rank, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def top_tokens_oracle_sql(docs_rel: str = "documents", k: int = 100) -> str:
    return f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM {docs_rel}),
        cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        r AS (SELECT tok, n,
                     row_number() OVER (ORDER BY n DESC, tok) AS rk
              FROM cnt)
        SELECT tok, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {k}
    """


# --------------------------------------------------------------------------
# per-document TF-IDF keyword extraction
# --------------------------------------------------------------------------

_KW_IDF_SCALE = 1_000_000
_KW_MAX_VOCAB = 1 << 22  # loud cap on the broadcast df table


def _doc_tok_table(t: pa.Table) -> pa.Table:
    """(doc_id, tok) exploded whitespace tokens, empties dropped —
    parent ids computed from the list offsets before the filter."""
    lists = pc.split_pattern_regex(
        pc.fill_null(t["text"], ""), r"\s+").combine_chunks()
    flat = lists.flatten()
    n_per = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    pid = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
    mask = pc.greater(pc.utf8_length(flat), 0)
    mnp = mask.to_numpy(zero_copy_only=False)
    did = t["doc_id"].to_numpy(zero_copy_only=False)[pid[mnp]]
    return pa.table({"doc_id": pa.array(did), "tok": flat.filter(mask)})


def doc_keywords(sf_dir: str, k: int = 5, max_vocab: int = _KW_MAX_VOCAB):
    """(doc_id, tok, tf, df, score_fp, rk) — the k highest-TF-IDF tokens
    per document (the classic unsupervised keyword extractor; what tags
    documents for retrieval/routing without a model).  IDF uses the same
    Robertson-style RATIONAL fixed point as the BM25 engine —
    ``idf_fp = ((2N − 2df + 1)·10⁶) // (2df + 1)`` — monotone in the
    log idf but exactly integer, so ``score_fp = tf · idf_fp`` admits a
    bit-exact DuckDB twin; ties break by token ascending.

    Scale shape: pass 1 builds the global document-frequency table from
    per-batch (doc, tok)-deduped Arrow hash partials + one groupby-sum
    (shuffle carries one row per distinct token per block), collected
    under a LOUD ``max_vocab`` cap and broadcast once via ``ray.put``
    with a precomputed idf vector; pass 2 is one streaming in-task pass
    — Arrow hash tf per (doc, tok), ``pc.index_in`` code lookup, numpy
    lexsort top-k per doc — no shuffle (each document is one input row,
    so its group never splits).  At a vocabulary past the cap, swap the
    broadcast for a token-keyed join; the error says so.
    """
    import ray

    from biomedical_el_ray.util import worker_state

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def _df_partial(t: pa.Table) -> pa.Table:
        dd = _doc_tok_table(t).group_by(["doc_id", "tok"]).aggregate([])
        vc = pc.value_counts(dd["tok"].combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["tok", "df"],
        )

    df_agg = (
        docs.map_batches(_df_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("tok").sum("df")
    )
    vocab_parts, df_parts = [], []
    n_seen = 0
    for b in df_agg.iter_batches(batch_format="pyarrow"):
        n_seen += b.num_rows
        if n_seen > max_vocab:
            raise ValueError(
                f"doc_keywords vocabulary exceeds max_vocab={max_vocab}; "
                "switch to the token-keyed join plan instead of the "
                "broadcast df table")
        vocab_parts.extend(b.column(0).chunks)
        df_parts.append(b.column(1).to_numpy(zero_copy_only=False))
    vocab_pa = pa.chunked_array(
        vocab_parts or [pa.array([], pa.string())]).combine_chunks()
    dfv = (np.concatenate(df_parts).astype(np.int64) if df_parts
           else np.zeros(0, np.int64))
    idf_fp = ((2 * n_docs - 2 * dfv + 1) * _KW_IDF_SCALE) // (2 * dfv + 1)
    vocab_obj = np.asarray(vocab_pa.to_pylist(), dtype=object)
    rank_of = np.empty(len(vocab_obj), np.int64)
    rank_of[np.argsort(vocab_obj)] = np.arange(len(vocab_obj))
    state_ref = ray.put((vocab_pa, dfv, idf_fp, rank_of))

    def _score(t: pa.Table) -> pa.Table:
        from biomedical_el_ray.util import ref_key

        vocab, dfv, idf, rnk = worker_state(
            ("doc_keywords", ref_key(state_ref)), lambda: ray.get(state_ref))
        g = _doc_tok_table(t).group_by(["doc_id", "tok"]).aggregate(
            [("tok", "count")])
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        tf = g["tok_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = g["tok"].combine_chunks()
        codes = pc.index_in(toks, value_set=vocab).to_numpy(
            zero_copy_only=False).astype(np.int64)
        score = tf * idf[codes]
        order = np.lexsort((rnk[codes], -score, did))
        d_s = did[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1])))
        runlen = np.diff(np.append(starts, len(d_s)))
        pos = np.arange(len(d_s)) - np.repeat(starts, runlen)
        keep = pos < k
        sel = order[keep]
        return pa.table({
            "doc_id": pa.array(did[sel]),
            "tok": toks.take(pa.array(sel)),
            "tf": pa.array(tf[sel]),
            "df": pa.array(dfv[codes[sel]]),
            "score_fp": pa.array(score[sel]),
            "rk": pa.array(pos[keep] + 1),
        })

    return docs.map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True)


def doc_keywords_oracle_sql(docs_rel: str = "documents", k: int = 5) -> str:
    """DuckDB twin: exploded tokens, tf/df censuses, the identical
    rational fixed-point idf and (score DESC, tok) ranking."""
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
          FROM {docs_rel}),
        tf AS (
          SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfx AS (
          SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM {docs_rel}),
        sc AS (
          SELECT t.doc_id, t.tok, t.tf, d.df,
                 t.tf * (((2 * nn.n - 2 * d.df + 1) * {_KW_IDF_SCALE})
                         // (2 * d.df + 1)) AS score_fp
          FROM tf t JOIN dfx d USING (tok), nn),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_fp DESC, tok) AS rk
          FROM sc)
        SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df,
               CAST(score_fp AS BIGINT) AS score_fp,
               CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {k}
    """


# --------------------------------------------------------------------------
# Fixed-size token chunking with overlap (pretraining / RAG chunker)
# --------------------------------------------------------------------------

def chunk_documents(sf_dir: str, chunk_tokens: int = 64, overlap: int = 16):
    """(doc_id, chunk_idx, tok_lo, tok_hi, n_tokens, chunk_text) — every
    document split into fixed-size whitespace-token windows with overlap
    (stride = chunk_tokens - overlap); the standard chunker feeding
    pretraining sequences or a RAG index.

    Fully vectorized, including the chunk text: tokens explode once,
    per-chunk gather indices are built with the repeat/cumsum trick, and
    the joins run through one Arrow ``binary_join`` over a rebuilt
    ListArray — no per-chunk Python.  Chunk counts use pure integer
    arithmetic (``1 + (max(n - chunk, 0) + stride - 1) // stride``) so
    the DuckDB oracle agrees exactly; a document always yields >= 1
    chunk (empty text -> one empty chunk)."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_tokens")

    def _chunks(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        text = t["text"]
        # split on the RE2 '\s' class (ASCII [\t\n\f\r\v ]), the same
        # engine DuckDB's '\S+' oracle runs — utf8_split_whitespace would
        # additionally split on Unicode whitespace (NBSP, U+2028, ...)
        # and silently shift chunk boundaries relative to the oracle
        lists = pc.split_pattern_regex(
            pc.fill_null(text, ""), r"\s+"
        ).combine_chunks()
        flat = lists.flatten()
        per_row_all = np.diff(np.asarray(lists.offsets, dtype=np.int64))
        row = np.repeat(np.arange(nrows, dtype=np.int64), per_row_all)
        keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
        flat_kept = flat.filter(pa.array(keep))
        n = np.bincount(row[keep], minlength=nrows).astype(np.int64)

        extra = np.maximum(n - chunk_tokens, 0)
        n_chunks = 1 + (extra + step - 1) // step
        rep = np.repeat(np.arange(nrows, dtype=np.int64), n_chunks)
        ccumr = np.cumsum(n_chunks) - n_chunks
        chunk_idx = np.arange(n_chunks.sum(), dtype=np.int64) - ccumr[rep]
        lo = chunk_idx * step
        hi = np.minimum(lo + chunk_tokens, n[rep])
        lens = hi - lo

        row_off = np.cumsum(n) - n
        starts_flat = row_off[rep] + lo
        total = int(lens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        gidx = np.repeat(starts_flat, lens) + within
        values = flat_kept.take(pa.array(gidx))
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values),
            " ",
        )
        return pa.Table.from_arrays(
            [
                pc.take(t["doc_id"].combine_chunks(), pa.array(rep)),
                pa.array(chunk_idx, pa.int64()),
                pa.array(lo, pa.int64()),
                pa.array(hi, pa.int64()),
                pa.array(lens, pa.int64()),
                chunk_text,
            ],
            names=["doc_id", "chunk_idx", "tok_lo", "tok_hi", "n_tokens", "chunk_text"],
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _chunks, batch_format="pyarrow", zero_copy_batch=True
    )


def chunk_documents_oracle_sql(docs_rel: str = "documents",
                               chunk_tokens: int = 64,
                               overlap: int = 16) -> str:
    step = chunk_tokens - overlap
    return f"""
        WITH d AS (
          -- coalesce: NULL text must behave like '' (one empty chunk), as
          -- the engine's fill_null does; without it least/greatest ignore
          -- the NULL token count and fabricate a full-width chunk
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '\\S+') AS toks,
                 CAST(length(regexp_extract_all(coalesce(text, ''), '\\S+'))
                      AS BIGINT) AS n
          FROM {docs_rel}),
        c AS (
          SELECT doc_id, toks, n,
                 1 + (greatest(n - {chunk_tokens}, 0) + {step - 1}) // {step}
                   AS n_chunks
          FROM d),
        x AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(0, CAST(n_chunks - 1 AS INTEGER))) AS ci
          FROM c)
        SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
               CAST(ci * {step} AS BIGINT) AS tok_lo,
               CAST(least(ci * {step} + {chunk_tokens}, n) AS BIGINT) AS tok_hi,
               CAST(least(ci * {step} + {chunk_tokens}, n) - ci * {step} AS BIGINT)
                 AS n_tokens,
               coalesce(array_to_string(
                 toks[ci * {step} + 1 : least(ci * {step} + {chunk_tokens}, n)],
                 ' '), '') AS chunk_text
        FROM x
    """


# --------------------------------------------------------------------------
# Repetition scores (Gopher-style within-document repetition signals)
# --------------------------------------------------------------------------

def _exploded_tokens(text) -> tuple[np.ndarray, pa.Array]:
    """Whitespace tokens for a batch, exploded in document order ->
    (row ids int64, token StringArray).  Same token class as
    ``_unique_token_counts`` ('\\S+': RE2 ASCII split, boundary empties
    dropped) so every repetition metric shares the oracle's tokenizer."""
    n = len(text)
    lists = pc.split_pattern_regex(pc.fill_null(text, ""), r"\s+").combine_chunks()
    flat = lists.flatten()
    per_row = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    row = np.repeat(np.arange(n, dtype=np.int64), per_row)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    return row[keep], flat.filter(pa.array(keep))


def _per_row_distinct_and_top(row: np.ndarray, vals: pa.Array,
                              n_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """(distinct count per row, max multiplicity per row) of ``vals``
    grouped by ``row`` — one Arrow sort + numpy run detection, no per-row
    Python.  Rows with zero values get (0, 0)."""
    m = len(row)
    if m == 0:
        z = np.zeros(n_rows, dtype=np.int64)
        return z, z.copy()
    s = pa.table({"row": pa.array(row), "v": vals}).sort_by(
        [("row", "ascending"), ("v", "ascending")]
    )
    r = s["row"].to_numpy()
    v = s["v"].combine_chunks()
    first = np.ones(m, dtype=bool)
    first[1:] = (r[1:] != r[:-1]) | ~np.asarray(
        pc.equal(v.slice(1), v.slice(0, m - 1))
    )
    starts = np.flatnonzero(first)
    run_len = np.diff(np.append(starts, m))
    run_row = r[starts]
    distinct = np.bincount(run_row, minlength=n_rows).astype(np.int64)
    # runs are row-sorted: per-row max multiplicity via one reduceat over
    # the run-length vector at each row's first run
    row_first = np.ones(starts.size, dtype=bool)
    row_first[1:] = run_row[1:] != run_row[:-1]
    row_starts = np.flatnonzero(row_first)
    tops = np.maximum.reduceat(run_len, row_starts)
    top = np.zeros(n_rows, dtype=np.int64)
    top[run_row[row_starts]] = tops
    return distinct, top


def _repetition_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    n = len(text)
    row, tok = _exploded_tokens(text)
    n_tokens = np.bincount(row, minlength=n).astype(np.int64)
    _, top_tok_n = _per_row_distinct_and_top(row, tok, n)
    # word 2-grams: adjacent token pairs within a row, joined with ' '
    # (tokens are '\S+' runs, so ' ' can never occur inside one and the
    # join is collision-free — no hashing, stays oracle-exact)
    if len(row) >= 2:
        adj = row[1:] == row[:-1]
        lo = np.flatnonzero(adj)
        pair_row = row[lo]
        t_arr = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
        a = t_arr.take(pa.array(lo))
        b = t_arr.take(pa.array(lo + 1))
        pairs = pc.binary_join_element_wise(a, b, " ")
    else:
        pair_row = np.empty(0, dtype=np.int64)
        pairs = pa.array([], pa.string())
    n_2grams = np.bincount(pair_row, minlength=n).astype(np.int64)
    distinct_2g, _ = _per_row_distinct_and_top(pair_row, pairs, n)
    dup_2g = n_2grams - distinct_2g
    tok_den = np.maximum(n_tokens, 1)
    bg_den = np.maximum(n_2grams, 1)
    return pa.Table.from_arrays(
        [
            t["doc_id"],
            pa.array(n_tokens),
            pa.array(top_tok_n),
            pa.array(top_tok_n * 100 // tok_den),
            pa.array(n_2grams),
            pa.array(dup_2g),
            pa.array(dup_2g * 100 // bg_den),
        ],
        names=["doc_id", "n_tokens", "top_tok_n", "top_tok_pct",
               "n_2grams", "n_dup_2grams", "dup_2gram_pct"],
    )


def repetition_scores(sf_dir: str):
    """(doc_id, n_tokens, top_tok_n, top_tok_pct, n_2grams, n_dup_2grams,
    dup_2gram_pct) — Gopher-style within-document repetition signals: the
    share of the document taken by its single most frequent word and by
    duplicated word 2-grams.  Standard pre-training quality filters
    (Rae et al. 2021 'Scaling Language Models', Table A1) threshold on
    exactly these fractions; percentages are integer fixed-point so the
    DuckDB oracle matches bit-for-bit."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_oracle_sql(docs_rel: str = "documents") -> str:
    """Exact DuckDB twin: unnest-with-subscripts tokenization, self-join
    on i+1 for 2-grams, count(DISTINCT) for the dup fractions."""
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
          FROM {docs_rel}),
        ex AS MATERIALIZED (
          SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
          FROM toks),
        tc AS (
          SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
        bg AS (
          SELECT a.doc_id, a.tok || ' ' || b.tok AS pair
          FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        bga AS (
          SELECT doc_id, count(*) AS n_2grams,
                 count(*) - count(DISTINCT pair) AS n_dup
          FROM bg GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(tt.top_tok_n, 0) AS BIGINT) AS top_tok_n,
               CAST(coalesce(tt.top_tok_n, 0) * 100
                    // greatest(coalesce(tt.n_tokens, 0), 1) AS BIGINT)
                 AS top_tok_pct,
               CAST(coalesce(bga.n_2grams, 0) AS BIGINT) AS n_2grams,
               CAST(coalesce(bga.n_dup, 0) AS BIGINT) AS n_dup_2grams,
               CAST(coalesce(bga.n_dup, 0) * 100
                    // greatest(coalesce(bga.n_2grams, 0), 1) AS BIGINT)
                 AS dup_2gram_pct
        FROM {docs_rel} d
        LEFT JOIN (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_tok_n
                   FROM tc GROUP BY doc_id) tt ON tt.doc_id = d.doc_id
        LEFT JOIN bga ON bga.doc_id = d.doc_id
    """


# --------------------------------------------------------------------------
# Sequence packing (global token prefix-sum -> training-sequence layout)
# --------------------------------------------------------------------------

def _ntok_batch(t: pa.Table, bucket: int) -> pa.Table:
    n_tok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
    doc_id = t["doc_id"]
    return pa.Table.from_arrays(
        [doc_id, pc.divide(doc_id, pa.scalar(bucket, pa.int64())), n_tok],
        names=["doc_id", "bucket_id", "n_tokens"],
    )


def _bucket_sum_partial(t: pa.Table) -> pa.Table:
    b = t["bucket_id"].to_numpy(zero_copy_only=False)
    n = t["n_tokens"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    b, n = b[order], n[order]
    first = np.ones(b.size, dtype=bool)
    first[1:] = b[1:] != b[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(n, starts) if b.size else np.empty(0, np.int64)
    return pa.table({"bucket_id": pa.array(b[starts]),
                     "tok_sum": pa.array(sums.astype(np.int64))})


def _pack_partition(t: pa.Table, off_ref, seq_len: int) -> pa.Table:
    import ray

    from biomedical_el_ray.util import ref_key, worker_state

    if t.num_rows == 0:
        return pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("tok_start", pa.int64()), ("seq_id", pa.int64()),
             ("seq_offset", pa.int64())]
        ).empty_table()
    keys, offs = worker_state(
        ("pack_offsets", ref_key(off_ref)), lambda: ray.get(off_ref)
    )
    t = t.sort_by("doc_id")  # buckets become contiguous, docs ordered
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    b = t["bucket_id"].to_numpy(zero_copy_only=False)
    n = t["n_tokens"].to_numpy(zero_copy_only=False)
    excl = np.cumsum(n) - n
    first = np.ones(b.size, dtype=bool)
    first[1:] = b[1:] != b[:-1]
    # intra-bucket exclusive cumsum: subtract the running total at each
    # bucket's first row
    base = np.repeat(excl[first], np.diff(np.append(np.flatnonzero(first),
                                                    b.size)))
    intra = excl - base
    tok_start = offs[np.searchsorted(keys, b)] + intra
    return pa.Table.from_arrays(
        [
            pa.array(doc_id), pa.array(n), pa.array(tok_start),
            pa.array(tok_start // seq_len), pa.array(tok_start % seq_len),
        ],
        names=["doc_id", "n_tokens", "tok_start", "seq_id", "seq_offset"],
    )


def pack_sequences(sf_dir: str, seq_len: int = 256, bucket: int = 4096):
    """(doc_id, n_tokens, tok_start, seq_id, seq_offset) — training-
    sequence packing layout: documents are laid head-to-tail in doc_id
    order and each doc is assigned the fixed-length sequence its first
    token lands in (seq_id = tok_start // seq_len).  The deterministic
    packing rule every LLM data loader needs; tok_start is a GLOBAL
    prefix sum, the classic two-pass distributed scan:

    1. per-batch partial sums per bucket (bucket_id = doc_id // bucket),
       reduced through one tiny groupby — the collected table is
       n_docs / bucket rows (choose ``bucket`` so this stays <= ~10M
       rows at corpus scale; 4096 puts 10^11 docs at 24M x 16 B, still a
       driver-trivial exclusive scan),
    2. driver exclusive-scan of bucket totals, broadcast once, then ONE
       keyed repartition on bucket_id computes each doc's intra-bucket
       offset in-task and adds the bucket base.

    Only (doc_id, bucket_id, n_tokens) rides the shuffle — 24 B/doc,
    never text.  The token count is recomputed from the pruned text read
    in pass 1 and never carried; the input is re-read per pass (the same
    pruned-re-read tradeoff ``jaccard_pairs`` documents) so nothing
    materializes mid-pipeline."""
    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    import ray

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    tok = docs.map_batches(
        _ntok_batch, fn_kwargs={"bucket": bucket},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    bucket_rows = (
        tok.map_batches(_bucket_sum_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
        .groupby("bucket_id")
        .sum("tok_sum")
        .take_all()
    )
    keys = np.array(sorted(r["bucket_id"] for r in bucket_rows),
                    dtype=np.int64)
    sums = {r["bucket_id"]: r["sum(tok_sum)"] for r in bucket_rows}
    totals = np.array([sums[k] for k in keys], dtype=np.int64)
    offs = np.cumsum(totals) - totals  # exclusive scan of bucket totals
    off_ref = ray.put((keys, offs))
    tok2 = ensure_hash_shuffle(
        docs.map_batches(
            _ntok_batch, fn_kwargs={"bucket": bucket},
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    return tok2.repartition(
        shuffle_partitions(), keys=["bucket_id"]
    ).map_batches(
        _pack_partition,
        fn_kwargs={"off_ref": off_ref, "seq_len": seq_len},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def pack_sequences_oracle_sql(docs_rel: str = "documents",
                              seq_len: int = 256) -> str:
    return f"""
        WITH n AS (
          SELECT doc_id,
                 CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens
          FROM {docs_rel}),
        c AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_start
          FROM n)
        SELECT doc_id, n_tokens, tok_start,
               CAST(tok_start // {seq_len} AS BIGINT) AS seq_id,
               CAST(tok_start % {seq_len} AS BIGINT) AS seq_offset
        FROM c
    """


# --------------------------------------------------------------------------
# DSIR-shaped importance weighting (hashed n-gram domain classifier)
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 1024
_DSIR_SCALE = 1_000_000_000


def _dsir_grams(t: pa.Table):
    """Batch -> (row_idx, bucket) for every word unigram AND bigram
    occurrence; bucket = hash64(gram) & (B-1), bigrams space-joined
    (collision-free: tokens contain no whitespace)."""
    from biomedical_el_ray.functions.hashing import hash64_column

    lists = pc.split_pattern_regex(
        pc.fill_null(t["text"], ""), r"\s+"
    ).combine_chunks()
    flat = lists.flatten()
    per_row = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    row = np.repeat(np.arange(t.num_rows, dtype=np.int64), per_row)
    keep = np.asarray(pc.greater(pc.utf8_length(flat), 0))
    flat = flat.filter(pa.array(keep))
    row = row[keep]
    if len(row) > 1:
        adj = row[1:] == row[:-1]
        bg = pc.binary_join_element_wise(
            flat.slice(0, len(row) - 1).filter(pa.array(adj)),
            flat.slice(1).filter(pa.array(adj)),
            " ",
        )
        brow = row[:-1][adj]
    else:
        bg = pa.array([], pa.string())
        brow = np.empty(0, np.int64)
    grow = np.concatenate([row, brow])
    grams = pa.concat_arrays([flat.cast(pa.string()), bg.cast(pa.string())])
    buckets = (hash64_column(grams) & np.uint64(_DSIR_BUCKETS - 1)).astype(
        np.int64
    )
    return grow, buckets


def importance_weights(sf_dir: str, target_lang: str = "en"):
    """(doc_id, n_grams, score_fp, kept) — DSIR-shaped data selection
    (Xie et al. 2023, arXiv:2302.03169): score every raw document by how
    much its hashed word uni+bigram profile looks like the TARGET slice
    (here ``lang = target_lang``) vs the raw corpus, keep positive-margin
    docs.  The reference repo's TF-IDF candidate strategy
    (/root/reference/run_e2e_span.py:868) is the same fit-on-corpus →
    score-per-item shape at mention grain.

    In place of the paper's log-likelihood ratio the per-bucket weight is
    the add-one-smoothed fixed-point probability DIFFERENCE between the
    target and COMPLEMENT class conditionals,
    ``(ct+1)·S // (tot_t+B) − (cc+1)·S // (tot_c+B)`` — a linear
    classifier over the same features whose integer weights keep the
    distributed sums combine-order-free and the DuckDB oracle bit-exact
    (true-log weights can be plugged through the same broadcast seam).
    The complement (not the raw mix) as the second class gives the margin
    a real sign: with the raw mix, target-doc scores hover at −ε because
    every shared gram contributes p_t ≈ p_mix.

    Scale shape: the fit is per-batch bincount partials over a BOUNDED
    bucket table (B=1024) + one groupby-sum (the lm_quality shape); the
    weight vector is built driver-side from those ≤B rows, broadcast via
    ``ray.put``, and applied in one streaming pass — the corpus is read
    twice, never materialized.  Per-doc scores accumulate via
    float64-weighted bincount, exact while |score| < 2^53 (gram counts
    per document up to ~10^6 at |weight| ≤ 10^9 stay well inside).
    """
    import ray
    from ray.data.aggregate import Sum

    from biomedical_el_ray.util import drop_empty_blocks

    B, S = _DSIR_BUCKETS, _DSIR_SCALE

    def _fit_partial(t: pa.Table) -> pa.Table:
        grow, buckets = _dsir_grams(t)
        tmask = np.asarray(
            pc.equal(pc.fill_null(t["lang"], ""), target_lang)
        )[grow]
        ct = np.bincount(buckets[tmask], minlength=B)
        cc = np.bincount(buckets[~tmask], minlength=B)
        nz = np.flatnonzero(ct + cc)
        return pa.table({
            "b": pa.array(nz.astype(np.int64)),
            "ct": pa.array(ct[nz].astype(np.int64)),
            "cc": pa.array(cc[nz].astype(np.int64)),
        })

    fit_rows = (
        drop_empty_blocks(
            read_table(sf_dir, "documents", ["text", "lang"]).map_batches(
                _fit_partial, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("b")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cc", alias_name="cc"))
        .take_all()
    )
    ct = {int(r["b"]): int(r["ct"]) for r in fit_rows}
    cc = {int(r["b"]): int(r["cc"]) for r in fit_rows}
    tot_t, tot_c = sum(ct.values()), sum(cc.values())
    # pure-Python bigints: (ct+1)*S never overflows driver-side
    llr = np.array(
        [
            (ct.get(b, 0) + 1) * S // (tot_t + B)
            - (cc.get(b, 0) + 1) * S // (tot_c + B)
            for b in range(B)
        ],
        dtype=np.int64,
    )
    llr_ref = ray.put(llr)

    def _score(t: pa.Table) -> pa.Table:
        w = ray.get(llr_ref)
        grow, buckets = _dsir_grams(t)
        n = t.num_rows
        score = np.rint(
            np.bincount(grow, weights=w[buckets].astype(np.float64),
                        minlength=n)
        ).astype(np.int64)
        ng = np.bincount(grow, minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(ng),
            "score_fp": pa.array(score),
            "kept": pa.array(score > 0),
        })

    return read_table(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def importance_weights_oracle_sql(docs_rel: str = "documents",
                                  target_lang: str = "en") -> str:
    """Exact DuckDB twin: unnest-with-subscripts uni+bigrams, the
    multilinear short-string hash CTE (grams ≤ 64 utf-8 bytes — synthetic
    tokens are bounded well below), HUGEINT fixed-point fit, one scoring
    join."""
    from biomedical_el_ray.functions.sql_hash import hash64_short_cte

    B, S = _DSIR_BUCKETS, _DSIR_SCALE
    h_cte, h_rel = hash64_short_cte("grams", ["doc_id", "cnt"], "iw")
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS tk
          FROM {docs_rel}),
        ex AS MATERIALIZED (
          SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
          FROM toks),
        grams AS MATERIALIZED (
          SELECT doc_id, tok, count(*) AS cnt FROM (
            SELECT doc_id, tok FROM ex
            UNION ALL
            SELECT a.doc_id, a.tok || ' ' || b.tok AS tok
            FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
          GROUP BY 1, 2),
        {h_cte},
        bkt AS MATERIALIZED (
          SELECT g.doc_id, g.cnt,
                 CAST(CAST(g.h AS UBIGINT) & {B - 1} AS BIGINT) AS b
          FROM {h_rel} g),
        fit AS (
          SELECT k.b,
                 sum(CASE WHEN coalesce(d.lang, '') = '{target_lang}'
                          THEN k.cnt ELSE 0 END) AS ct,
                 sum(CASE WHEN coalesce(d.lang, '') = '{target_lang}'
                          THEN 0 ELSE k.cnt END) AS cc
          FROM bkt k JOIN {docs_rel} d USING (doc_id) GROUP BY k.b),
        tot AS (SELECT sum(ct) AS tt, sum(cc) AS tc FROM fit),
        llr AS (
          SELECT b,
                 CAST(ct + 1 AS HUGEINT) * {S} // (tt + {B})
                   - CAST(cc + 1 AS HUGEINT) * {S} // (tc + {B}) AS w
          FROM fit, tot),
        sc AS (
          SELECT k.doc_id, CAST(sum(k.cnt) AS BIGINT) AS n_grams,
                 CAST(sum(CAST(k.cnt AS HUGEINT) * l.w) AS BIGINT) AS score_fp
          FROM bkt k JOIN llr l USING (b) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               coalesce(s.score_fp, 0) AS score_fp,
               coalesce(s.score_fp, 0) > 0 AS kept
        FROM {docs_rel} d LEFT JOIN sc s USING (doc_id)
    """

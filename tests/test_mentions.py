"""Gazetteer mention extraction vs planted gold spans."""

import collections

import pyarrow.parquet as pq

from biomedical_el_ray.stages.mentions import MentionExtractor, build_gazetteer
from biomedical_el_ray.stages.normalize import normalize_array


def _extract_all(corpus_dir):
    tr = pq.read_table(corpus_dir / "transcripts.parquet")
    en = pq.read_table(corpus_dir / "entities.parquet")
    gaz = build_gazetteer(en["aliases"])
    batch = tr.append_column("norm_text", normalize_array(tr["text"]))
    return tr, MentionExtractor(gaz)(batch)


def test_extraction_matches_gold_counts(smoke_corpus):
    tr, out = _extract_all(smoke_corpus)
    gm = pq.read_table(smoke_corpus / "gold_mentions.parquet")
    gold_ct = collections.Counter(
        zip(gm["conv_id"].to_pylist(), gm["turn_idx"].to_pylist())
    )
    ext_ct = collections.Counter(
        zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist())
    )
    assert gold_ct == ext_ct


def test_offsets_into_norm_text(smoke_corpus):
    """Invariant: norm_text[start:end] == surface for every mention
    (analog of /root/reference/utils_e2e_span.py:96)."""
    tr, out = _extract_all(smoke_corpus)
    norm = {
        (c, t): x
        for c, t, x in zip(
            tr["conv_id"].to_pylist(),
            tr["turn_idx"].to_pylist(),
            normalize_array(tr["text"]).to_pylist(),
        )
    }
    for r in out.to_pylist():
        assert norm[(r["conv_id"], r["turn_idx"])][r["start"] : r["end"]] == r["surface"]


def test_surfaces_match_gold_normalized(smoke_corpus):
    tr, out = _extract_all(smoke_corpus)
    gm = pq.read_table(smoke_corpus / "gold_mentions.parquet")
    import pyarrow as pa

    gold_surf_norm = normalize_array(pa.array(gm["surface"].to_pylist())).to_pylist()
    gold = collections.Counter(
        zip(gm["conv_id"].to_pylist(), gm["turn_idx"].to_pylist(), gold_surf_norm)
    )
    ext = collections.Counter(
        zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist(), out["surface"].to_pylist())
    )
    assert gold == ext


def test_leftmost_longest():
    gaz = build_gazetteer([["alpha beta", "alpha", "beta gamma"]])
    ext = MentionExtractor(gaz, text_col="norm_text")
    import pyarrow as pa

    batch = pa.table(
        {
            "conv_id": ["c"],
            "turn_idx": pa.array([0], pa.int32()),
            "norm_text": ["x alpha beta gamma y"],
        }
    )
    out = ext(batch).to_pylist()
    # leftmost-longest: "alpha beta" wins at position 2; "gamma" alone is
    # not an alias so nothing else matches after it
    assert [r["surface"] for r in out] == ["alpha beta"]

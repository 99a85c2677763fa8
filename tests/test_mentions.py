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


def test_mentions_oracle_matches_extractor_edge_cases(tmp_path):
    """SQL oracle must reproduce the greedy leftmost-longest matcher on
    adversarial cases: overlapping aliases (matching "a b" consumes "b" so
    a later "b c" alias cannot fire), longest-match preference at one
    position, normalization (case/whitespace), and repeated matches
    driving the per-turn mention_id counter."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_el_ray.stages.mentions import mentions_oracle_sql

    ents = pa.table({
        "entity_id": ["e1", "e2", "e3", "e4"],
        "name": ["alpha beta", "beta gamma", "alpha", "delta"],
        "aliases": [
            ["alpha beta", "ALPHA  beta"],
            ["beta gamma"],
            ["alpha"],
            ["delta", "delta"],
        ],
    })
    trans = pa.table({
        "conv_id": ["c1", "c1", "c2", "c3"],
        "turn_idx": [0, 1, 0, 0],
        "text": [
            "alpha beta gamma delta",     # 'alpha beta' wins; gamma alone no; delta yes
            "say ALPHA   then Beta Gamma today",  # norm: alpha alone + beta gamma
            "delta delta alpha",          # two deltas + alpha -> ids 0,1,2
            "nothing to see",
        ],
    })
    pq.write_table(ents, tmp_path / "entities.parquet")
    pq.write_table(trans, tmp_path / "transcripts.parquet")

    batch = trans.append_column("norm_text", normalize_array(trans["text"]))
    got_ray = MentionExtractor(build_gazetteer(ents["aliases"]))(batch)
    con = duckdb.connect()
    got_sql = con.sql(mentions_oracle_sql(str(tmp_path))).df()
    r = got_ray.to_pandas().sort_values("mention_id").reset_index(drop=True)
    o = got_sql.sort_values("mention_id").reset_index(drop=True)[list(r.columns)]
    assert len(r) == len(o)
    assert r.astype(str).equals(o.astype(str))
    surfaces = sorted(r["surface"].tolist())
    assert surfaces == sorted(
        ["alpha beta", "delta", "alpha", "beta gamma", "delta", "delta", "alpha"]
    )

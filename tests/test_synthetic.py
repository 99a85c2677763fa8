"""Corpus generator: schema, offset invariant, determinism."""

import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_el_ray.sources.synthetic import CorpusSpec, generate_corpus


def test_schema_and_offsets(unit_corpus):
    tr = pq.read_table(unit_corpus / "transcripts.parquet")
    assert tr.schema.field("conv_id").type == pa.string()
    assert tr.schema.field("turn_idx").type == pa.int32()
    assert tr.schema.field("role").type == pa.string()
    assert tr.schema.field("text").type == pa.string()
    assert tr.schema.field("tool").type == pa.string()
    assert tr.schema.field("ts").type == pa.timestamp("us")

    gm = pq.read_table(unit_corpus / "gold_mentions.parquet")
    texts = {
        (c, t): x
        for c, t, x in zip(
            tr["conv_id"].to_pylist(), tr["turn_idx"].to_pylist(), tr["text"].to_pylist()
        )
    }
    for r in gm.to_pylist():
        assert 0 <= r["start"] <= r["end"], r
        # the reference's per-mention text-equality invariant
        # (/root/reference/utils_e2e_span.py:96)
        assert texts[(r["conv_id"], r["turn_idx"])][r["start"] : r["end"]] == r["surface"]


def test_turn_idx_dense_per_conv(unit_corpus):
    tr = pq.read_table(unit_corpus / "transcripts.parquet")
    seen: dict = {}
    for c, t in zip(tr["conv_id"].to_pylist(), tr["turn_idx"].to_pylist()):
        seen.setdefault(c, []).append(t)
    for c, ts in seen.items():
        assert sorted(ts) == list(range(len(ts))), c


def test_deterministic_bytes(tmp_path):
    spec = CorpusSpec(n_convs=15, seed=7)
    a, b = tmp_path / "a", tmp_path / "b"
    generate_corpus(a, spec)
    generate_corpus(b, spec)
    for name in ["transcripts", "entities", "gold_mentions"]:
        ta = pq.read_table(a / f"{name}.parquet")
        tb = pq.read_table(b / f"{name}.parquet")
        assert ta.equals(tb), name


def test_zipf_skew_present(smoke_corpus):
    """Hot conversations and hot tools must exist (salting exercise)."""
    import collections

    tr = pq.read_table(smoke_corpus / "transcripts.parquet")
    turns_per_conv = collections.Counter(tr["conv_id"].to_pylist())
    counts = sorted(turns_per_conv.values(), reverse=True)
    assert counts[0] >= 4 * counts[len(counts) // 2]
    tools = collections.Counter(t for t in tr["tool"].to_pylist() if t)
    top, rest = tools.most_common(1)[0][1], sum(tools.values())
    assert top / rest > 0.3

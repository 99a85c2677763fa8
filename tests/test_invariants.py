"""Per-turn text-equality invariant under stable (conv_id, turn_idx) order."""

import ray.data

from biomedical_el_ray.stages.invariants import (
    check_mention_offsets,
    turn_text_fingerprint,
)
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts


def _transcripts(corpus):
    return ray.data.read_parquet(str(corpus / "transcripts.parquet"))


def test_fingerprint_stable_across_partitionings(unit_corpus):
    ds = _transcripts(unit_corpus)
    f1 = turn_text_fingerprint(ds)
    f2 = turn_text_fingerprint(ds.repartition(7))
    f3 = turn_text_fingerprint(ds.random_shuffle(seed=3))
    assert f1 == f2 == f3


def test_normalize_preserves_turn_identity(unit_corpus):
    """Normalization adds a column; (conv_id, turn_idx, text) is untouched."""
    ds = _transcripts(unit_corpus)
    before = turn_text_fingerprint(ds)
    after = turn_text_fingerprint(normalize_transcripts(ds))
    assert before == after


def test_fingerprint_detects_mutation(unit_corpus):
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _transcripts(unit_corpus)
    mutated = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(t["text"], "x", ""),
        ),
        batch_format="pyarrow",
    )
    assert turn_text_fingerprint(ds) != turn_text_fingerprint(mutated)


def test_mention_offsets_valid(unit_corpus):
    norm = normalize_transcripts(_transcripts(unit_corpus)).materialize()
    mentions = extract_mentions(
        norm, entities_path=str(unit_corpus / "entities.parquet")
    )
    assert check_mention_offsets(mentions, norm) == 0

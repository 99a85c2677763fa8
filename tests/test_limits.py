"""M8/T6-analog limits: KB-name token truncation and mention-span mask.

Reference semantics: entity text windows are truncated to 128 tokens before
encoding (/root/reference/utils_e2e_span.py:166-170) and candidate spans
longer than 20 tokens are masked out of inference
(/root/reference/modeling_e2e_span.py:99-104, run_e2e_span.py:811).
"""

import pyarrow as pa

from biomedical_el_ray.pipelines.linking import (
    MAX_NAME_TOKENS,
    truncate_name_tokens,
)
from biomedical_el_ray.stages.windowing import (
    MAX_MENTION_TOKENS,
    window_one,
)


def test_truncate_name_tokens_caps_long_names():
    long = " ".join(f"t{i}" for i in range(MAX_NAME_TOKENS + 40))
    short = "aspirin  tablet"  # irregular whitespace must survive untouched
    out = truncate_name_tokens(pa.array([long, short, ""])).to_pylist()
    assert out[0] == " ".join(f"t{i}" for i in range(MAX_NAME_TOKENS))
    assert out[1] == short  # byte-identical below the cap
    assert out[2] == ""


def test_truncate_exactly_at_cap_unchanged():
    exact = " ".join(f"t{i}" for i in range(MAX_NAME_TOKENS))
    assert truncate_name_tokens(pa.array([exact])).to_pylist() == [exact]


def test_window_one_masks_overlong_span():
    n = MAX_MENTION_TOKENS + 1
    toks = ["w"] * (n + 10)
    text = " ".join(toks)
    # mention covers the first n tokens: chars [0, 2n-1)
    win, ts, te, bio = window_one(text, 0, 2 * n - 1)
    assert (win, ts, te, bio) == ("", 0, 0, "")


def test_window_one_keeps_span_at_cap():
    n = MAX_MENTION_TOKENS
    text = " ".join(["w"] * (n + 10))
    win, ts, te, bio = window_one(text, 0, 2 * n - 1)
    assert win != ""
    assert te - ts == n
    assert bio.split(" ").count("B") == 1
    assert bio.split(" ").count("I") == n - 1


def test_link_topk_uses_truncated_names(ray_session):
    import ray.data as rd

    from biomedical_el_ray.pipelines.linking import link_topk

    # a KB name whose first 128 tokens equal the surface but whose tail
    # would wreck the similarity if not truncated
    surface = " ".join(f"t{i}" for i in range(MAX_NAME_TOKENS))
    noisy = surface + " " + " ".join("zzz" for _ in range(50))
    kb = pa.table(
        {"entity_id": pa.array([1, 2], pa.int64()),
         "name": pa.array([noisy, "unrelated"], pa.string())}
    )
    out = (
        link_topk(rd.from_arrow(pa.table({"surface": [surface]})), kb, k=1)
        .to_pandas()
    )
    assert out.loc[0, "entity_id"] == 1
    assert out.loc[0, "sim_r"] == 1.0  # truncated name == surface exactly


def test_shuffled_examples_is_seeded_permutation():
    """T5: global shuffle rank is a permutation of 1..n, stable for a
    seed, different across seeds (per-epoch reshuffle analog)."""
    from biomedical_el_ray.pipelines.sampling import shuffled_examples

    SF = "/root/testdata/sf0.001"
    a = {r["doc_id"]: r["rk"] for r in shuffled_examples(SF, seed=1).take_all()}
    b = {r["doc_id"]: r["rk"] for r in shuffled_examples(SF, seed=1).take_all()}
    c = {r["doc_id"]: r["rk"] for r in shuffled_examples(SF, seed=2).take_all()}
    assert a == b                      # deterministic per seed
    assert a != c                      # epochs differ
    assert sorted(a.values()) == list(range(1, len(a) + 1))  # permutation
    assert set(a) == set(c)            # same row universe

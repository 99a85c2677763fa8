"""The fused gated edges path must equal the exact scored-pairs path.

The in-task quantized-cosine gate (stages/pairs.py gate_min_cosine) is a
SOUND upper bound — any pair it drops provably scores under the threshold
— so ``generate_pairs(..., emit="edges")`` must produce exactly the edge
set of ``edges_from_scores(score_pairs(generate_pairs(..., gate=False)))``.
This pins the quantization-error margin: if int8 rounding ever exceeded
``emb_gate_margin`` the sets would diverge here.
"""

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.pipelines.linkage import distinct_surfaces
from biomedical_el_ray.stages.blocking import add_block_keys
from biomedical_el_ray.stages.mentions import extract_mentions
from biomedical_el_ray.stages.normalize import normalize_transcripts
from biomedical_el_ray.stages.pairs import generate_pairs
from biomedical_el_ray.stages.scoring import edges_from_scores, score_pairs

import os

from biomedical_el_ray.sources.readers import read_parquet_spread


def test_gated_edges_equal_exact_edges(unit_corpus):
    cfg = PipelineConfig()
    ds = read_parquet_spread(
        os.path.join(unit_corpus, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "text"],
    )
    mentions = extract_mentions(
        normalize_transcripts(ds),
        entities_path=os.path.join(unit_corpus, "entities.parquet"),
    ).materialize()
    surfaces = distinct_surfaces(mentions).materialize()

    exact = edges_from_scores(
        score_pairs(generate_pairs(add_block_keys(surfaces, cfg), cfg, gate=False), cfg),
        cfg,
    )
    fused = generate_pairs(add_block_keys(surfaces, cfg), cfg, emit="edges")

    def edge_set(ds_):
        return {tuple(sorted((r["src"], r["dst"]))) for r in ds_.take_all()}

    e_exact = edge_set(exact)
    e_fused = edge_set(fused)
    assert e_exact, "test corpus must produce edges"
    assert e_fused == e_exact

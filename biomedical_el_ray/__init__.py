"""biomedical_el_ray — a Ray-Data-native record-linkage / data-processing engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of kingsaint/BioMedical-EL, recast per BASELINE.json:

* dual-encoder candidate retrieval  -> blocking (MinHash/LSH + dense-embedding keys)
* dot-product mention-entity linker -> batched pairwise scoring
  (embedding similarity + Jaro-Winkler / Levenshtein string similarity)
* "same label_candidate_id => same entity" -> transitive clustering
  (distributed union-find over hash-partitioned edge lists)

over Parquet tables of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts), expressed Ray-Data-first:
``ray.data.Dataset`` + ``map_batches(batch_format="pyarrow")`` with actor
pools for stateful stages.  Nothing in this package calls ``ray.init()``.
"""

__version__ = "0.1.0"

"""Deterministic sampling operators (T4/T5 analogs).

The reference draws per-epoch uniform negatives with ``random.sample``
(/root/reference/utils_e2e_span.py:345,460) and shuffles training rows with
``RandomSampler`` (/root/reference/run_e2e_span.py:79).  At cluster scale,
determinism across runs AND parallelism levels requires key-derived
sampling, not RNG state: a row is kept iff a stable hash of its key falls
under the rate threshold.  md5 is the hash here because DuckDB exposes the
identical kernel, making the sample DuckDB-oracle checkable; the engine's
hot paths use splitmix64 (functions/hashing.py) for the same pattern.

``ds.random_shuffle(seed=...)`` covers the T5 shuffle analog directly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from biomedical_el_ray.sources.readers import read_table

# keep a doc iff the first two hex chars of md5(doc_id) sort below this —
# 26/256 ~ 10.2% deterministic sample
SAMPLE_CUTOFF = "1a"


def md5_prefix(values: list) -> list[str]:
    return [hashlib.md5(str(v).encode()).hexdigest()[:2] for v in values]


def sample_documents(sf_dir: str, cutoff: str = SAMPLE_CUTOFF):
    """(doc_id, h2): ~10% deterministic hash sample of the documents table.

    Same rows at any parallelism level and block split — the property the
    reference's ``random.sample`` lacks (fresh draws per epoch,
    utils_e2e_span.py:345)."""
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h2 = md5_prefix(ids)
        mask = pa.array([h < cutoff for h in h2], pa.bool_())
        out = pa.Table.from_arrays(
            [t["doc_id"], pa.array(h2, pa.string())], names=["doc_id", "h2"]
        )
        return out.filter(mask)

    return docs.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)

"""Candidate-pair materialization: blocks -> deduped (id_lo, id_hi) pairs.

E3-analog of the reference's (mention x candidate) cross within a candidate
set (/root/reference/modeling_e2e_span.py:149-151,179-199), expressed as a
hash-partitioned *self-join on block_key* + a vectorized canonicalize/filter
``map_batches`` — no per-group Python in the hot path.

Skew handling (SURVEY.md §4 "skew" — the reference avoids skew only by
capping documents at 8 mentions, /root/reference/data_preprocessing.py:99):

* **Triangle salting.**  A block with n > ``salt_threshold`` members is
  split into s = ceil(n / salt_target) hash-buckets; each member with
  bucket h is replicated to every sub-group (ga, gb), ga<=gb, with
  h in {ga, gb}.  Pairing within sub-group (a, a) is all-pairs of bucket a;
  within (a, b), a<b, cross-bucket only, one orientation.  The union over
  sub-groups is EXACTLY the full pair set of the block — no pair lost, none
  double-emitted by the same block — while every joined group stays
  O(salt_target^2).
* **Hard cap.**  Blocks larger than ``max_block_size`` are dropped whole
  and *counted* in the returned counters (never silent — the anti-pattern
  is the reference's silent row drops, /root/reference/utils_e2e_span.py:312-318).

Cross-band duplicate pairs are removed by a ``groupby((id_lo, id_hi))``
min-aggregate (SURVEY.md §2.7 D2: exact dedup = hash-partition + reduce).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.functions.hashing import hash64_column

PAIR_COLS = ["id_lo", "id_hi", "s_lo", "s_hi", "block_key"]


def hot_block_sizes(blocks_ds, cfg: PipelineConfig) -> dict[str, int]:
    """Small driver-side dict {hot block_key: size}.

    A count-per-key pre-aggregation; only keys above the salt threshold are
    collected to the driver, so it holds O(#hot keys), not O(#keys).
    """
    counts = blocks_ds.groupby("block_key").count()
    thr = cfg.salt_threshold
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], thr)),
        batch_format="pyarrow",
    ).take_all()
    return {r["block_key"]: int(r["count()"]) for r in hot}


class _Salter:
    """Adds (bkt, ga, gb) salt columns; replicates hot-block members."""

    def __init__(self, hot_ref, cfg: PipelineConfig):
        self.hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        keys = batch["block_key"].to_pylist()
        mids = batch["mention_id"].to_pylist()
        surfs = batch["surface"].to_pylist()
        mh = hash64_column(mids)
        ok, om, osf = [], [], []
        obkt, oga, ogb = [], [], []
        dropped_rows = 0
        for i, key in enumerate(keys):
            n = self.hot.get(key)
            if n is None:
                ok.append(key)
                om.append(mids[i])
                osf.append(surfs[i])
                obkt.append(-1)
                oga.append(-1)
                ogb.append(-1)
                continue
            if n > cfg.max_block_size:
                dropped_rows += 1
                continue
            s = -(-n // cfg.salt_target)  # ceil
            h = int(mh[i] % np.uint64(s))
            for a in range(s):
                ga, gb = (a, h) if a < h else (h, a)
                ok.append(f"{key}#{ga:04d}_{gb:04d}")
                om.append(mids[i])
                osf.append(surfs[i])
                obkt.append(h)
                oga.append(ga)
                ogb.append(gb)
        return pa.Table.from_arrays(
            [
                pa.array(ok, pa.string()),
                pa.array(om, pa.string()),
                pa.array(osf, pa.string()),
                pa.array(obkt, pa.int32()),
                pa.array(oga, pa.int32()),
                pa.array(ogb, pa.int32()),
            ],
            names=["block_key", "mention_id", "surface", "bkt", "ga", "gb"],
        )


def _canonicalize(batch: pa.Table) -> pa.Table:
    """Joined rows -> canonical (id_lo < id_hi) pairs, fully vectorized."""
    id_l = np.asarray(batch["mention_id"].to_pylist(), dtype=object)
    id_r = np.asarray(batch["id_r"].to_pylist(), dtype=object)
    s_l = np.asarray(batch["surface"].to_pylist(), dtype=object)
    s_r = np.asarray(batch["s_r"].to_pylist(), dtype=object)
    key = np.asarray(batch["block_key"].to_pylist(), dtype=object)
    ga = batch["ga"].to_numpy(zero_copy_only=False)
    gb = batch["gb"].to_numpy(zero_copy_only=False)
    bkt_l = batch["bkt"].to_numpy(zero_copy_only=False)
    bkt_r = batch["bkt_r"].to_numpy(zero_copy_only=False)

    same_bucket_group = (ga < 0) | (ga == gb)
    keep = np.where(
        same_bucket_group,
        id_l < id_r,
        (bkt_l == ga) & (bkt_r == gb),
    )
    id_l, id_r, s_l, s_r, key = (x[keep] for x in (id_l, id_r, s_l, s_r, key))
    swap = id_l > id_r
    id_lo = np.where(swap, id_r, id_l)
    id_hi = np.where(swap, id_l, id_r)
    s_lo = np.where(swap, s_r, s_l)
    s_hi = np.where(swap, s_l, s_r)
    # strip salt suffix so the reported key is the logical block
    base_key = np.array([k.rsplit("#", 1)[0] if "#" in k else k for k in key], dtype=object)
    return pa.Table.from_arrays(
        [
            pa.array(id_lo, pa.string()),
            pa.array(id_hi, pa.string()),
            pa.array(s_lo, pa.string()),
            pa.array(s_hi, pa.string()),
            pa.array(base_key, pa.string()),
        ],
        names=PAIR_COLS,
    )


def _rename_mins(batch: pa.Table) -> pa.Table:
    return batch.rename_columns(
        ["id_lo", "id_hi", "s_lo", "s_hi", "block_key"]
    )


def generate_pairs(
    blocks_ds,
    cfg: PipelineConfig | None = None,
    hot: dict | None = None,
    num_partitions: int | None = None,
    counters: dict | None = None,
):
    """blocks Dataset -> deduped candidate-pairs Dataset.

    Wide ops: one hash self-join on ``block_key`` + one dedup groupby on the
    pair key.  ``counters`` (optional dict) receives skew accounting:
    hot-block count, salted-replica factor, dropped oversized blocks.
    """
    cfg = cfg or PipelineConfig()
    if hot is None:
        hot = hot_block_sizes(blocks_ds, cfg)
    if counters is not None:
        over = {k: n for k, n in hot.items() if n > cfg.max_block_size}
        counters["hot_blocks"] = len(hot)
        counters["dropped_oversized_blocks"] = len(over)
        counters["dropped_oversized_rows"] = int(sum(over.values()))
    hot_ref = ray.put(hot)
    salted = blocks_ds.map_batches(
        _Salter,
        fn_constructor_kwargs={"hot_ref": hot_ref, "cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    ).materialize()  # diamond input of the self-join; avoids recomputing upstream twice

    right = salted.select_columns(["block_key", "mention_id", "surface", "bkt"]).map_batches(
        lambda t: t.rename_columns(["block_key", "id_r", "s_r", "bkt_r"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if num_partitions is None:
        from biomedical_el_ray.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    joined = salted.join(
        right, "inner", num_partitions=num_partitions, on=("block_key",)
    )
    pairs = joined.map_batches(_canonicalize, batch_format="pyarrow", zero_copy_batch=True)
    deduped = (
        pairs.groupby(["id_lo", "id_hi"])
        .min(["s_lo", "s_hi", "block_key"])
        .map_batches(_rename_mins, batch_format="pyarrow", zero_copy_batch=True)
    )
    return deduped

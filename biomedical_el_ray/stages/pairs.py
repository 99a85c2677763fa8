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

Cross-band duplicate pairs (the same pair emitted once per shared block
key) are removed MAP-SIDE by the **min-common-key rule**: every member row
carries its full sorted key list (``keys_all``, built in stages/blocking),
and a joined pair is kept iff the block it was emitted from is the MINIMUM
key shared by both members (oversized-dropped keys excluded from the lists
by the salter).  Each pair has exactly one such block, so the union over
blocks is exactly-once — equivalent to the previous
``groupby((id_lo,id_hi)).min(block_key)`` dedup shuffle (SURVEY.md §2.7
D2) but with zero additional data movement; the join payload grows by the
key-list column instead (bands x ~22 B/row).
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

    Map-side combine: each batch emits (block_key, partial count) rows —
    one per DISTINCT key in the batch — so the groupby shuffle moves
    O(#distinct keys), not O(#rows).  Only keys above the salt threshold
    are collected to the driver, so it holds O(#hot keys), not O(#keys).
    """

    def _partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["block_key"].combine_chunks())
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["block_key", "n"],
        )

    counts = blocks_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("block_key").sum("n")
    thr = cfg.salt_threshold
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["sum(n)"], thr)),
        batch_format="pyarrow",
    ).take_all()
    return {r["block_key"]: int(r["sum(n)"]) for r in hot}


class _Salter:
    """Adds (bkt, ga, gb) salt columns; replicates hot-block members."""

    def __init__(self, hot_ref, cfg: PipelineConfig):
        self.hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        self.cfg = cfg
        # oversized keys are dropped whole; they must also leave every
        # member's keys_all list or the min-common-key rule could pick a
        # dropped key as the canonical block and lose the pair entirely
        self.over = {k for k, n in self.hot.items() if n > cfg.max_block_size}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        keys = batch["block_key"].to_pylist()
        mids = batch["mention_id"].to_pylist()
        surfs = batch["surface"].to_pylist()
        kas = batch["keys_all"].to_pylist()
        if self.over:
            over = self.over
            kas = [
                "|".join(k for k in ka.split("|") if k not in over) if any(
                    k in over for k in ka.split("|")
                ) else ka
                for ka in kas
            ]
        mh = hash64_column(mids)
        ok, om, osf, oka = [], [], [], []
        obkt, oga, ogb = [], [], []
        dropped_rows = 0
        for i, key in enumerate(keys):
            n = self.hot.get(key)
            if n is None:
                ok.append(key)
                om.append(mids[i])
                osf.append(surfs[i])
                oka.append(kas[i])
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
                oka.append(kas[i])
                obkt.append(h)
                oga.append(ga)
                ogb.append(gb)
        return pa.Table.from_arrays(
            [
                pa.array(ok, pa.string()),
                pa.array(om, pa.string()),
                pa.array(osf, pa.string()),
                pa.array(oka, pa.string()),
                pa.array(obkt, pa.int32()),
                pa.array(oga, pa.int32()),
                pa.array(ogb, pa.int32()),
            ],
            names=["block_key", "mention_id", "surface", "keys_all", "bkt", "ga", "gb"],
        )


def _canonicalize(batch: pa.Table) -> pa.Table:
    """Joined rows -> canonical (id_lo < id_hi) pairs, exactly once.

    Dedup across a pair's multiple shared blocks happens HERE (no shuffle):
    keep the row iff its (salt-stripped) block key is the minimum key
    common to both members' ``keys_all`` lists.
    """
    id_l = np.asarray(batch["mention_id"].to_pylist(), dtype=object)
    id_r = np.asarray(batch["id_r"].to_pylist(), dtype=object)
    s_l = np.asarray(batch["surface"].to_pylist(), dtype=object)
    s_r = np.asarray(batch["s_r"].to_pylist(), dtype=object)
    ka_l = np.asarray(batch["keys_all"].to_pylist(), dtype=object)
    ka_r = np.asarray(batch["ka_r"].to_pylist(), dtype=object)
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
    id_l, id_r, s_l, s_r, key, ka_l, ka_r = (
        x[keep] for x in (id_l, id_r, s_l, s_r, key, ka_l, ka_r)
    )
    # strip salt suffix so the compared/reported key is the logical block
    base_key = np.array([k.rsplit("#", 1)[0] if "#" in k else k for k in key], dtype=object)
    # min-common-key rule; ka lists are sorted, so the first left key
    # present on the right is the minimum shared key
    mk = np.empty(len(base_key), dtype=bool)
    for i in range(len(base_key)):
        if ka_l[i] == ka_r[i]:  # common fast path: identical key sets
            mk[i] = ka_l[i].split("|", 1)[0] == base_key[i] if "|" in ka_l[i] else True
            continue
        rset = set(ka_r[i].split("|"))
        mk[i] = next(
            (k for k in ka_l[i].split("|") if k in rset), None
        ) == base_key[i]
    id_l, id_r, s_l, s_r, base_key = (
        x[mk] for x in (id_l, id_r, s_l, s_r, base_key)
    )
    swap = id_l > id_r
    id_lo = np.where(swap, id_r, id_l)
    id_hi = np.where(swap, id_l, id_r)
    s_lo = np.where(swap, s_r, s_l)
    s_hi = np.where(swap, s_l, s_r)
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
    # blocks is consumed twice (hot-count pass + salter input); materialize
    # once so the upstream surface-dedup/blocking chain never recomputes.
    # Size is |distinct surfaces| x keys-per-surface short rows — object
    # store resident, spills if needed.  spread() keeps the downstream
    # shuffle map side as wide as the session (see util.spread);
    # drop_empty_blocks removes the schema-less empty blocks repartition
    # creates on small inputs (they poison the acero self-join).
    from biomedical_el_ray.util import drop_empty_blocks, spread

    blocks_ds = drop_empty_blocks(spread(blocks_ds))
    if hot is None:
        hot = hot_block_sizes(blocks_ds, cfg)
    if counters is not None:
        over = {k: n for k, n in hot.items() if n > cfg.max_block_size}
        counters["hot_blocks"] = len(hot)
        counters["dropped_oversized_blocks"] = len(over)
        counters["dropped_oversized_rows"] = int(sum(over.values()))
    hot_ref = ray.put(hot)
    salted = drop_empty_blocks(  # 0-row salter outputs poison the join shuffle
        blocks_ds.map_batches(
            _Salter,
            fn_constructor_kwargs={"hot_ref": hot_ref, "cfg": cfg},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    )  # materialized: diamond input of the self-join; upstream runs once

    right = salted.select_columns(
        ["block_key", "mention_id", "surface", "keys_all", "bkt"]
    ).map_batches(
        lambda t: t.rename_columns(["block_key", "id_r", "s_r", "ka_r", "bkt_r"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if num_partitions is None:
        from biomedical_el_ray.util import shuffle_partitions

        num_partitions = shuffle_partitions()
    joined = salted.join(
        right, "inner", num_partitions=num_partitions, on=("block_key",)
    )
    # exactly-once per pair via the min-common-key rule inside
    # _canonicalize — no dedup shuffle follows
    return joined.map_batches(_canonicalize, batch_format="pyarrow", zero_copy_batch=True)

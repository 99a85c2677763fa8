"""Pair generation: salting preserves the exact pair set; caps are counted."""

import itertools

import pyarrow as pa
import ray.data

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.stages.pairs import generate_pairs


def _blocks_table(rows):
    """Logical (key, member, surface) rows -> the blocking stage's contract
    (stages/blocking.py): uint64 block_key, slot, and a slot-aligned sig
    vector per member (the member's key value at the key's slot, a
    member-unique filler elsewhere)."""
    import numpy as np

    from biomedical_el_ray.functions.hashing import hash64_column, splitmix64

    keys = sorted({r[0] for r in rows})
    slot_of = {k: i for i, k in enumerate(keys)}
    S = len(keys)
    khash = dict(zip(keys, hash64_column(keys)))
    keys_of = {}
    for k, m, _ in rows:
        keys_of.setdefault(m, set()).add(k)
    sig_of = {}
    for m, ks in keys_of.items():
        mh = hash64_column([m])[0]
        v = splitmix64(
            np.full(S, mh, np.uint64) ^ np.arange(1, S + 1, dtype=np.uint64)
        )
        for k in ks:
            v[slot_of[k]] = khash[k]
        sig_of[m] = v
    sig_flat = np.concatenate([sig_of[r[1]] for r in rows]) if rows else np.array([], np.uint64)
    return pa.table(
        {
            "block_key": pa.array([int(khash[r[0]]) for r in rows], pa.uint64()),
            "slot": pa.array([slot_of[r[0]] for r in rows], pa.int8()),
            "mention_id": pa.array([r[1] for r in rows], pa.string()),
            "surface": pa.array([r[2] for r in rows], pa.string()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig_flat, pa.uint64()), S
            ),
        }
    )


def _expected_pairs(rows):
    by_key = {}
    for k, m, _ in rows:
        by_key.setdefault(k, set()).add(m)
    out = set()
    for k, members in by_key.items():
        for a, b in itertools.combinations(sorted(members), 2):
            out.add((a, b))
    return out


def test_small_blocks_all_pairs():
    rows = [("k1", f"m{i}", f"s{i}") for i in range(5)] + [
        ("k2", "m1", "s1"),
        ("k2", "m9", "s9"),
    ]
    ds = ray.data.from_arrow(_blocks_table(rows))
    got = generate_pairs(ds, PipelineConfig())
    got_pairs = {(r["id_lo"], r["id_hi"]) for r in got.take_all()}
    assert got_pairs == _expected_pairs(rows)


def test_cross_block_dedup():
    rows = [("k1", "a", "sa"), ("k1", "b", "sb"), ("k2", "a", "sa"), ("k2", "b", "sb")]
    ds = ray.data.from_arrow(_blocks_table(rows))
    out = generate_pairs(ds, PipelineConfig()).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["id_lo"], r["id_hi"], r["s_lo"], r["s_hi"]) == ("a", "b", "sa", "sb")


def test_hot_block_salting_exact_pair_set():
    """A block above salt_threshold must yield EXACTLY the full pair set."""
    cfg = PipelineConfig(salt_threshold=20, salt_target=8)
    n = 50  # -> s = ceil(50/8) = 7 salt buckets
    rows = [("hot", f"m{i:03d}", f"s{i:03d}") for i in range(n)] + [
        ("cold", "x1", "t1"),
        ("cold", "x2", "t2"),
    ]
    ds = ray.data.from_arrow(_blocks_table(rows))
    counters = {}
    got = generate_pairs(ds, cfg, counters=counters)
    got_pairs = {(r["id_lo"], r["id_hi"]) for r in got.take_all()}
    assert got_pairs == _expected_pairs(rows)
    assert counters["hot_blocks"] == 1
    assert counters["dropped_oversized_blocks"] == 0


def test_oversized_block_dropped_and_counted():
    cfg = PipelineConfig(salt_threshold=4, salt_target=4, max_block_size=10)
    rows = [("huge", f"m{i}", f"s{i}") for i in range(30)] + [
        ("ok", "a", "sa"),
        ("ok", "b", "sb"),
    ]
    ds = ray.data.from_arrow(_blocks_table(rows))
    counters = {}
    got = generate_pairs(ds, cfg, counters=counters)
    got_pairs = {(r["id_lo"], r["id_hi"]) for r in got.take_all()}
    assert got_pairs == {("a", "b")}
    assert counters["dropped_oversized_blocks"] == 1
    assert counters["dropped_oversized_rows"] == 30

"""Pair generation: salting preserves the exact pair set; caps are counted."""

import itertools

import pyarrow as pa
import ray.data

from biomedical_el_ray.config import PipelineConfig
from biomedical_el_ray.stages.pairs import generate_pairs


def _blocks_table(rows):
    # keys_all: every key this member appears under (the blocking stage's
    # contract — stages/blocking.py BLOCKS_SCHEMA)
    keys_of = {}
    for k, m, _ in rows:
        keys_of.setdefault(m, set()).add(k)
    return pa.table(
        {
            "block_key": pa.array([r[0] for r in rows], pa.string()),
            "mention_id": pa.array([r[1] for r in rows], pa.string()),
            "surface": pa.array([r[2] for r in rows], pa.string()),
            "keys_all": pa.array(
                ["|".join(sorted(keys_of[r[1]])) for r in rows], pa.string()
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

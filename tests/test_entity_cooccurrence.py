"""entity_cooccurrence: oversized-conversation drop accounting.

Bit-exactness of the default path vs DuckDB is covered by the
oracle-equivalence sweep; this exercises the loud skew cap, which the
synthetic corpus (few entities per conversation) never triggers."""

import collections
import itertools

import duckdb

from biomedical_el_ray.pipelines.transcripts_queries import entity_cooccurrence
from biomedical_el_ray.sources.synthetic import ensure_corpus_for_sf_dir

SF = "/root/testdata/sf0.001"


def _gold():
    d = ensure_corpus_for_sf_dir(SF)
    return duckdb.sql(
        f"SELECT DISTINCT conv_id, entity_id FROM "
        f"read_parquet('{d}/gold_mentions.parquet')"
    ).fetchall()


def test_oversized_convs_dropped_and_counted():
    ce = _gold()
    per_conv = collections.defaultdict(set)
    for conv, ent in ce:
        per_conv[conv].add(ent)
    cap = 3
    over = {c for c, es in per_conv.items() if len(es) > cap}
    assert over, "fixture must contain conversations above the cap"

    counters: dict = {}
    df = entity_cooccurrence(
        SF, max_entities_per_conv=cap, counters=counters
    ).to_pandas()
    assert counters["dropped_oversized_convs"] == len(over)
    assert counters["dropped_oversized_conv_entities"] == sum(
        len(per_conv[c]) for c in over
    )

    # expected pairs from the surviving conversations only
    want = collections.Counter()
    for c, es in per_conv.items():
        if c in over:
            continue
        for a, b in itertools.combinations(sorted(es), 2):
            want[(a, b)] += 1
    got = {(r.e_lo, r.e_hi): int(r.n_ab) for r in df.itertuples()}
    assert got == dict(want)

    # marginals and the conversation total still include dropped convs
    n_convs = len(per_conv)
    marg = collections.Counter(e for es in per_conv.values() for e in es)
    for r in df.itertuples():
        assert int(r.n_lo) == marg[r.e_lo]
        assert int(r.n_hi) == marg[r.e_hi]
        assert int(r.lift_ppm) == (
            int(r.n_ab) * 1_000_000 * n_convs
        ) // (marg[r.e_lo] * marg[r.e_hi])

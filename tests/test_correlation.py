"""Correlation clustering (deterministic KwikCluster): the distributed
peeling construction must be bit-identical to the sequential reference,
and must NOT chain through below-threshold pairs the way connected
components do."""

import sys

import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.state.correlation import (  # noqa: E402
    correlation_components, local_kwikcluster,
)
from biomedical_el_ray.state.unionfind import local_union_find  # noqa: E402


def _dist(edges, nodes=None, **kw):
    eds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.string()),
        "dst": pa.array([b for _, b in edges], pa.string()),
    }))
    nds = None
    if nodes is not None:
        nds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.string())}))
    out = correlation_components(eds, nds, **kw)
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return dict(zip(tbl["node"].to_pylist(), tbl["rep"].to_pylist()))


def test_properties_sequential(ray_session):
    """Pivot self-assignment, coverage, and edge-to-pivot membership."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    assign = local_kwikcluster(edges, nodes=["lone"])
    assert set(assign) == {"a", "b", "c", "d", "x", "y", "lone"}
    assert assign["lone"] == "lone"
    # every rep is a pivot that maps to itself
    for rep in set(assign.values()):
        assert assign[rep] == rep
    # every non-pivot is adjacent to its pivot
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, r in assign.items():
        assert v == r or r in adj[v]


def test_no_chaining_vs_union_find(ray_session):
    """A long path collapses to ONE component under transitive closure but
    to >1 cluster under KwikCluster (pivots cannot be adjacent)."""
    path = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    uf = local_union_find(path)
    kc = local_kwikcluster(path)
    assert len(set(uf.values())) == 1
    assert len(set(kc.values())) > 1


@settings(deadline=None, max_examples=12)
@given(st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
    min_size=0, max_size=60,
))
def test_distributed_matches_sequential(ray_session, edges):
    """Forced-distributed peeling == sequential KwikCluster on random
    graphs, including isolated nodes."""
    edges = [(f"v{a}", f"v{b}") for a, b in edges]
    nodes = [f"v{i}" for i in range(26)]
    expect = local_kwikcluster(edges, nodes=nodes)
    got = _dist(edges, nodes, local_threshold=0, num_partitions=5)
    assert got == expect


def test_int_node_ids_roundtrip_dtype(ray_session):
    """Non-string node ids must come back in their own dtype from the
    distributed path (rep is parsed out of the packed string key)."""
    eds = rd.from_arrow(pa.table({
        "src": pa.array([1, 2], pa.int64()),
        "dst": pa.array([2, 3], pa.int64()),
    }))
    nds = rd.from_arrow(pa.table({"node": pa.array([1, 2, 3, 9], pa.int64())}))
    out = correlation_components(eds, nds, local_threshold=0,
                                 num_partitions=3)
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert tbl.schema.field("node").type == pa.int64()
    assert tbl.schema.field("rep").type == pa.int64()
    got = dict(zip(tbl["node"].to_pylist(), tbl["rep"].to_pylist()))
    expect = local_kwikcluster([(1, 2), (2, 3)], nodes=[1, 2, 3, 9])
    assert got == expect


def test_corpus_clusters_match_reference(ray_session):
    """correlation_clusters over the sf0.001 corpus == the sequential
    reference run on the identical thresholded edge set."""
    import pyarrow.compute as pc

    from biomedical_el_ray.pipelines.linkage_emb import (
        EMB_CFG, _scored_pairs, correlation_clusters,
    )

    SF = "/root/testdata/sf0.001"
    out = correlation_clusters(SF)
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    got = dict(zip(tbl["surface"].to_pylist(), tbl["cluster_id"].to_pylist()))

    scored, surfaces = _scored_pairs(SF)
    sc = pa.concat_tables(list(scored.iter_batches(batch_format="pyarrow")))
    kept = sc.filter(pc.greater_equal(sc["score"], EMB_CFG.score_threshold))
    su = pa.concat_tables(list(surfaces.iter_batches(batch_format="pyarrow")))
    expect = local_kwikcluster(
        list(zip(kept["s_lo"].to_pylist(), kept["s_hi"].to_pylist())),
        nodes=su["surface"].to_pylist(),
    )
    assert got == expect
    # sanity: fewer merges than (or equal to) transitive closure
    uf = local_union_find(
        list(zip(kept["s_lo"].to_pylist(), kept["s_hi"].to_pylist())),
        nodes=su["surface"].to_pylist(),
    )
    assert len(set(got.values())) >= len(set(uf.values()))

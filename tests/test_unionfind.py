"""Distributed connected components vs exact local union-find."""

import numpy as np
import pyarrow as pa
import ray.data

from biomedical_el_ray.state.unionfind import connected_components, local_union_find


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.string()),
                "dst": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )


def _nodes_ds(nodes):
    return ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.string())}))


def _compare(edges, nodes):
    exact = local_union_find(edges, nodes=nodes)
    got = {
        r["node"]: r["rep"]
        for r in connected_components(_edges_ds(edges), _nodes_ds(nodes), local_threshold=0).take_all()
    }
    assert got == exact


def test_simple_components():
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    _compare(edges, ["a", "b", "c", "x", "y", "lonely"])


def test_chain_needs_propagation():
    # a long path exercises >1 iteration of propagate + pointer-jump
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(39)]
    _compare(edges, nodes)


def test_random_graph_matches_exact():
    rng = np.random.default_rng(42)
    nodes = [f"v{i:04d}" for i in range(300)]
    edges = [
        (nodes[int(a)], nodes[int(b)])
        for a, b in rng.integers(0, 300, size=(250, 2))
        if a != b
    ]
    _compare(edges, nodes)


def test_deterministic_representatives():
    edges = [("q", "z"), ("z", "m")]
    got = {
        r["node"]: r["rep"]
        for r in connected_components(_edges_ds(edges), local_threshold=0).take_all()
    }
    # rep is the min id in the component — stable across runs/parallelism
    assert set(got.values()) == {"m"}


def _int_edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )


def test_int64_nodes_local_path():
    # near_dedup_keep clusters int64 doc ids; the local fast path must
    # carry the integer type through (it used to hardcode pa.string())
    edges = [(5, 3), (3, 9), (100, 7)]
    nodes = list(range(0, 12)) + [100]
    exact = local_union_find(edges, nodes=nodes)
    nds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    out = connected_components(_int_edges_ds(edges), nds)
    got = {r["node"]: r["rep"] for r in out.take_all()}
    assert got == exact
    assert all(isinstance(k, int) for k in got)


def test_int64_nodes_distributed_path():
    rng = np.random.default_rng(7)
    nodes = list(range(200))
    edges = [
        (int(a), int(b)) for a, b in rng.integers(0, 200, size=(150, 2)) if a != b
    ]
    exact = local_union_find(edges, nodes=nodes)
    nds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    got = {
        r["node"]: r["rep"]
        for r in connected_components(
            _int_edges_ds(edges), nds, local_threshold=0
        ).take_all()
    }
    assert got == exact

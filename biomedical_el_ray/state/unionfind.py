"""Transitive clustering: connected components over the edge list.

The reference's implicit clustering relation — two mentions with the same
``label_candidate_id`` are the same entity (/root/reference/
data_preprocessing.py:74-81, used as labels at utils_e2e_span.py:562-572) —
becomes explicit transitive closure over thresholded similarity edges.

Distributed algorithm: iterative **min-label propagation with pointer
jumping** over hash-partitioned Datasets (cf. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; BTS, ICDE'24 — PAPERS.md):

  repeat:
    label(v) <- min(label(v), min_{(u,v) in E} label(u))   # one groupby
    label(v) <- label(label(v))                            # pointer jump (join)
  until no label changes  (a count aggregate, driver-checked)

Every iteration is a fixed number of hash shuffles (join + groupby) — no
driver-side per-row work; the driver only evaluates the converged? scalar.
Min propagation converges in O(diameter) rounds; the pointer-jump halves
chain lengths, giving O(log n) overall like the reference-free BTS bound.

``local_union_find`` is the single-node exact oracle used by tests
(SURVEY.md §5: the cluster-gold generator for pairwise F1 >= 0.99).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from biomedical_el_ray.functions.hashing import hash64_column, splitmix64
from biomedical_el_ray.util import drop_empty_blocks


# ---------------------------------------------------------------------------
# exact single-node oracle
# ---------------------------------------------------------------------------

def local_union_find(edges, nodes=None) -> dict:
    """Classic union-find; returns {node: representative(min id in component)}."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the lexicographically smaller id as root -> deterministic reps
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    if nodes:
        for n in nodes:
            parent.setdefault(n, n)
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------------------
# distributed connected components on Ray Data
# ---------------------------------------------------------------------------

def _num_partitions() -> int:
    from biomedical_el_ray.util import shuffle_partitions

    return shuffle_partitions()


def connected_components(
    edges_ds,
    nodes_ds=None,
    max_iters: int = 50,
    num_partitions: int | None = None,
    local_threshold: int = 2_000_000,
):
    """edges (src,dst) [+ optional nodes (node)] -> Dataset (node, rep).

    Singleton nodes (no edges) appear only if ``nodes_ds`` is given.
    Deterministic: rep = min node id in the component.

    **Physical plan choice** (the union-find analog of broadcast-vs-shuffle
    join selection): when the adjacency list fits comfortably on one worker
    (< ``local_threshold`` rows), the exact single-pass union-find runs
    locally — identical output, none of the per-iteration shuffle fixed
    costs.  Larger graphs take the distributed min-label-propagation +
    pointer-jumping fixpoint.  Pass ``local_threshold=0`` to force the
    distributed path (tests do).
    """
    P = num_partitions or _num_partitions()

    # undirected: both directions, plus self loops to keep isolated endpoints
    def _bidir(t: pa.Table) -> pa.Table:
        fwd = pa.Table.from_arrays([t["src"], t["dst"]], names=["node", "nbr"])
        rev = pa.Table.from_arrays([t["dst"], t["src"]], names=["node", "nbr"])
        return pa.concat_tables([fwd, rev])

    adj = edges_ds.map_batches(_bidir, batch_format="pyarrow", zero_copy_batch=True)
    if nodes_ds is not None:
        self_loops = nodes_ds.map_batches(
            lambda t: pa.Table.from_arrays([t["node"], t["node"]], names=["node", "nbr"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        adj = adj.union(self_loops)
    adj = adj.materialize()  # reused every iteration; edge list is the loop invariant
    n_adj = adj.count()
    if n_adj == 0:
        import ray.data as rd

        # keep the empty result's schema consistent with the node-id type
        # (string for linkage surfaces, int64 for doc ids); fall back to
        # string when even the input schema is untyped
        try:
            ntype = adj.schema().base_schema.field("node").type
        except Exception:
            ntype = pa.string()
        return rd.from_arrow(
            pa.table({"node": pa.array([], ntype), "rep": pa.array([], ntype)})
        )
    if n_adj <= local_threshold:
        import ray.data as rd

        # column-wise fetch (zip of two list columns), not take_all's
        # per-row dicts — ~3x less driver time on a 600k-edge graph
        tbl = pa.concat_tables(list(adj.iter_batches(batch_format="pyarrow")))
        assignment = local_union_find(
            list(zip(tbl["node"].to_pylist(), tbl["nbr"].to_pylist()))
        )
        items = sorted(assignment.items())
        # node ids may be strings (linkage surfaces) or int64 (doc ids):
        # carry the adjacency table's own type instead of forcing string
        ntype = tbl.schema.field("node").type
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([k for k, _ in items], ntype),
                    "rep": pa.array([v for _, v in items], ntype),
                }
            )
        )

    # labels: start as min(node, min neighbor)
    labels = (
        adj.groupby("node")
        .min("nbr")
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t["node"], pc.min_element_wise(t["node"], t["min(nbr)"])],
                names=["node", "rep"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # aggregate outputs feed joins below: sanitize 0-col empty blocks
    labels = drop_empty_blocks(labels)

    prev_sig = _assignment_signature(labels)
    for _ in range(max_iters):
        # 1) propagate: cand(v) = min over neighbors u of rep(u)
        lab_by_node = labels.map_batches(
            lambda t: t.rename_columns(["nbr_node", "nbr_rep"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        prop = adj.join(
            lab_by_node, "inner", num_partitions=P, on=("nbr",), right_on=("nbr_node",)
        ).map_batches(
            lambda t: pa.Table.from_arrays([t["node"], t["nbr_rep"]], names=["node", "cand"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        own = labels.map_batches(
            lambda t: pa.Table.from_arrays([t["node"], t["rep"]], names=["node", "cand"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        new_labels = (
            prop.union(own)
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: t.rename_columns(["node", "rep"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        # feeds both sides of the pointer-jump self-join: materialize (avoid
        # double execution) + sanitize aggregate-born 0-col empty blocks
        new_labels = drop_empty_blocks(new_labels)

        # 2) pointer jump: rep(v) <- rep(rep(v))
        parents = new_labels.map_batches(
            lambda t: t.rename_columns(["p_node", "p_rep"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        jumped = (
            new_labels.join(
                parents, "inner", num_partitions=P, on=("rep",), right_on=("p_node",)
            )
            .map_batches(
                lambda t: pa.Table.from_arrays([t["node"], t["p_rep"]], names=["node", "rep"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        # materialize (reused by signature + next iteration) and drop empty
        # blocks: empties skip map_batches, so they'd carry a STALE schema
        # into the next iteration's joins
        jumped = drop_empty_blocks(jumped)

        # 3) converged? compare an order-independent 64-bit signature of the
        # (node, rep) assignment — one tiny aggregate instead of a join.
        sig = _assignment_signature(jumped)
        labels = jumped
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels


_SIG_MIX = np.uint64(0x9E3779B97F4A7C15)


def _assignment_signature(labels_ds) -> int:
    """Order-independent sum-of-hashes over (node, rep) rows (mod 2^64)."""

    def _hcol(col) -> np.ndarray:
        # node ids are strings (linkage) or int64 (document dedup)
        if pa.types.is_integer(col.type):
            return splitmix64(
                col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        return hash64_column(col)

    def _h(t: pa.Table) -> pa.Table:
        hn = _hcol(t["node"])
        hr = _hcol(t["rep"])
        v = splitmix64(hn ^ (hr * _SIG_MIX))
        s = np.uint64(np.bitwise_xor.reduce(v)) if len(v) else np.uint64(0)
        tot = np.uint64(len(v))
        return pa.Table.from_arrays(
            [pa.array([int(s)], pa.uint64()), pa.array([int(tot)], pa.uint64())],
            names=["sig", "n"],
        )

    parts = labels_ds.map_batches(_h, batch_format="pyarrow", zero_copy_batch=True).take_all()
    acc, n = 0, 0
    for r in parts:
        acc ^= int(r["sig"])
        n += int(r["n"])
    return (acc << 20) ^ n

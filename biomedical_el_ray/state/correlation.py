"""Correlation clustering: deterministic KwikCluster over positive edges.

Transitive closure (state/unionfind.py) merges A–B and B–C even when A–C
scored BELOW threshold — long similarity chains collapse distinct
entities.  Correlation clustering is the standard ER alternative that
respects that negative evidence: KwikCluster (Ailon, Charikar & Newman,
JACM 2008) picks a random pivot, clusters it with its positive neighbors,
removes them, repeats — a 3-approximation to the min-disagreement
objective.  The reference's label-id clustering
(/root/reference/data_preprocessing.py:74-81) has no chaining problem only
because its labels are gold; an engine clustering NOISY scored pairs needs
this non-chaining option.

Determinism: the "random" permutation is ``splitmix64(hash64(node))``,
tie-broken by the node id itself — the pivot order is a pure function of
the data, so engine and test-reference outputs are bit-identical (the
same trick the sampling/LSH families use).

Parallel equivalence (why the distributed rounds reproduce the SEQUENTIAL
algorithm exactly):

  1. The set of KwikCluster pivots under permutation π is exactly the
     GREEDY maximal independent set of the positive graph in π order
     (a node is a pivot iff no π-earlier neighbor is a pivot).
  2. Greedy-MIS is computable by parallel peeling (Blelloch, Fineman &
     Shun, SPAA'12): each round, every undecided node that is a local
     π-minimum among its undecided neighbors joins the MIS; its undecided
     neighbors become non-pivots.  O(log n) rounds w.h.p.
  3. A non-pivot is claimed by the FIRST adjacent pivot in π order —
     i.e. its π-minimum adjacent pivot — so the final assignment is one
     join + one grouped min over the fixed pivot set; no per-round
     bookkeeping.

Scale shape: the loop state is (node, key) at NODE grain and the edge
list is the loop invariant (materialized once); every round is one hash
join + one grouped min + two filters — the same exchange budget as a
``connected_components`` iteration.  A ``local_threshold`` plan choice
runs the exact sequential algorithm on one worker for small graphs,
mirroring unionfind's broadcast-vs-shuffle switch.

Total order used everywhere: the packed key ``hex16(splitmix64(h64(id)))
+ "|" + id`` — lexicographic order on the string equals numeric order on
the 64-bit key with exact id tie-break, so hash collisions cannot break
determinism and a grouped ``min`` IS an argmin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biomedical_el_ray.functions.hashing import hash64_column, splitmix64
from biomedical_el_ray.util import drop_empty_blocks


def _pivot_keys(ids) -> list[str]:
    """Packed sortable permutation key per node id (see module docstring)."""
    ids = [str(x) for x in ids]
    ks = splitmix64(hash64_column(ids))
    return [f"{int(k):016x}|{i}" for k, i in zip(ks, ids)]


def _key_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    vals = col.to_pylist()
    return pa.array(_pivot_keys(vals), pa.string())


# ---------------------------------------------------------------------------
# exact single-node reference (also the small-graph physical plan)
# ---------------------------------------------------------------------------

def local_kwikcluster(edges, nodes=None) -> dict:
    """Sequential KwikCluster; returns {node: pivot-node of its cluster}.

    ``edges`` is an iterable of (a, b) positive pairs; ``nodes`` optionally
    adds isolated nodes (singleton clusters).
    """
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if nodes:
        for n in nodes:
            adj.setdefault(n, set())
    order = sorted(adj, key=dict(zip(adj, _pivot_keys(list(adj)))).__getitem__)
    assign: dict = {}
    for v in order:
        if v in assign:
            continue
        assign[v] = v  # v is a pivot
        for u in adj[v]:
            if u not in assign:
                assign[u] = v
    return assign


# ---------------------------------------------------------------------------
# distributed deterministic KwikCluster on Ray Data
# ---------------------------------------------------------------------------

def correlation_components(
    edges_ds,
    nodes_ds=None,
    max_iters: int | None = None,
    num_partitions: int | None = None,
    local_threshold: int = 2_000_000,
):
    """edges (src,dst) [+ optional nodes (node)] -> Dataset (node, rep).

    ``rep`` is the cluster's pivot node.  Output is identical to
    ``local_kwikcluster`` (tests force the distributed path and compare).

    ``max_iters``: cap on peeling rounds.  Peeling removes a constant
    expected FRACTION of nodes per round under the hash-derived pivot
    order, i.e. O(log n) rounds in expectation, so the default scales
    with the node count: ``max(60, 8 * ceil(log2(n + 2)))``.  A graph
    that hits the cap raises (safe failure) with the knob named in the
    message.
    """
    import ray.data as rd

    from biomedical_el_ray.util import ensure_hash_shuffle, shuffle_partitions

    ensure_hash_shuffle()  # the per-round joins require the hash strategy
    P = num_partitions or shuffle_partitions()

    def _bidir(t: pa.Table) -> pa.Table:
        fwd = pa.Table.from_arrays([t["src"], t["dst"]], names=["node", "nbr"])
        rev = pa.Table.from_arrays([t["dst"], t["src"]], names=["node", "nbr"])
        return pa.concat_tables([fwd, rev])

    # NOTE every join input below is scrubbed of 0-ROW blocks
    # (drop_empty_blocks): Ray 2.49's hash-shuffle join broadcasts each
    # side's schema via empty shards of the FIRST shuffled block, but a
    # 0-row first block short-circuits without broadcasting — partitions
    # that then receive no rows build 0-column tables and the acero join
    # fails with "No match ... FieldRef.Name(...)".
    adj = drop_empty_blocks(edges_ds.map_batches(
        _bidir, batch_format="pyarrow", zero_copy_batch=True
    ))  # loop invariant (drop_empty_blocks materializes)

    # node universe = edge endpoints ∪ optional isolated nodes
    ends = adj.map_batches(
        lambda t: pa.Table.from_arrays([t["node"]], names=["node"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if nodes_ds is not None:
        ends = ends.union(nodes_ds.select_columns(["node"]))

    def _dedup_keys(t: pa.Table) -> pa.Table:
        u = pc.unique(t["node"].combine_chunks())
        return pa.Table.from_arrays([u, _key_column(u)], names=["node", "k"])

    universe = drop_empty_blocks(
        ends.map_batches(_dedup_keys, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("node").min("k")
        .map_batches(lambda t: t.rename_columns(["node", "k"]),
                     batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()

    n_nodes = universe.count()
    if n_nodes == 0:
        try:
            ntype = adj.schema().base_schema.field("node").type
        except Exception:
            ntype = pa.string()
        return rd.from_arrow(
            pa.table({"node": pa.array([], ntype), "rep": pa.array([], ntype)})
        )

    if adj.count() == 0:
        # no positive edges: every node is its own singleton cluster (and
        # the fully-empty adj would otherwise feed 0-column blocks into
        # the per-round joins)
        return universe.map_batches(
            lambda t: pa.Table.from_arrays([t["node"], t["node"]],
                                           names=["node", "rep"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    if adj.count() <= local_threshold and n_nodes <= local_threshold:
        tbl = pa.concat_tables(list(adj.iter_batches(batch_format="pyarrow")))
        nt = pa.concat_tables(list(universe.iter_batches(batch_format="pyarrow")))
        assign = local_kwikcluster(
            list(zip(tbl["node"].to_pylist(), tbl["nbr"].to_pylist())),
            nodes=nt["node"].to_pylist(),
        )
        items = sorted(assign.items())
        ntype = nt.schema.field("node").type
        return rd.from_arrow(pa.table({
            "node": pa.array([k for k, _ in items], ntype),
            "rep": pa.array([v for _, v in items], ntype),
        }))

    # ---- parallel peeling: greedy MIS under the packed key order --------
    und = universe  # (node, k) still-undecided nodes
    pivot_parts: list = []  # accumulated pivot datasets

    if max_iters is None:
        # O(log n) expected rounds; 8x headroom over log2(n) keeps the
        # cap a true pathological-graph backstop, never a scale limit
        max_iters = max(60, 8 * int(np.ceil(np.log2(n_nodes + 2))))
    rounds = 0
    while und.count() > 0:
        rounds += 1
        if rounds > max_iters:
            # checked AFTER the emptiness test, so a graph that converges
            # exactly on round max_iters is not misreported
            raise RuntimeError(
                f"correlation_components: not converged in {max_iters} "
                "rounds (raise the max_iters kwarg for this graph)")
        # min undecided-neighbor key per undecided node: adj restricted to
        # rows whose BOTH endpoints are undecided (two semi-joins)
        und_n = und.map_batches(
            lambda t: t.rename_columns(["u_node", "u_k"]),
            batch_format="pyarrow", zero_copy_batch=True)
        live = adj.join(und_n, "inner", num_partitions=P,
                        on=("nbr",), right_on=("u_node",)).map_batches(
            lambda t: pa.Table.from_arrays(
                [t["node"], t["u_k"]], names=["node", "nbr_k"]),
            batch_format="pyarrow", zero_copy_batch=True)
        nbr_min = drop_empty_blocks(
            live.groupby("node").min("nbr_k").map_batches(
                lambda t: t.rename_columns(["node", "min_nbr_k"]),
                batch_format="pyarrow", zero_copy_batch=True))
        # left-join via union trick: nodes with no undecided neighbor get
        # a sentinel above every real key ("~" > any hex digit / "|")
        own = und.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["node"], pa.array(["~"] * t.num_rows, pa.string())],
                names=["node", "min_nbr_k"]),
            batch_format="pyarrow", zero_copy_batch=True)
        floor = drop_empty_blocks(
            nbr_min.union(own).groupby("node").min("min_nbr_k").map_batches(
                lambda t: t.rename_columns(["node", "min_nbr_k"]),
                batch_format="pyarrow", zero_copy_batch=True))
        status = und.join(floor, "inner", num_partitions=P, on=("node",))

        def _split_pivots(t: pa.Table) -> pa.Table:
            is_p = pc.less(t["k"], t["min_nbr_k"])
            return pa.Table.from_arrays(
                [t["node"], t["k"], is_p], names=["node", "k", "is_pivot"])

        status = drop_empty_blocks(
            status.map_batches(_split_pivots, batch_format="pyarrow",
                               zero_copy_batch=True)).materialize()

        def _keep_pivots(t: pa.Table) -> pa.Table:
            return t.filter(t["is_pivot"]).select(["node", "k"])

        def _keep_non_pivots(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(t["is_pivot"].combine_chunks())) \
                    .select(["node", "k"])

        pivots_r = drop_empty_blocks(status.map_batches(
            _keep_pivots, batch_format="pyarrow", zero_copy_batch=True
        ))
        if pivots_r.count() == 0:
            # cannot happen on a finite graph (the global min key is always
            # a local min); guard against an infinite loop regardless
            raise RuntimeError("correlation_components: no pivot found")
        pivot_parts.append(pivots_r)

        # survivors: undecided, not a pivot, not adjacent to a round pivot
        non_pivots = drop_empty_blocks(status.map_batches(
            _keep_non_pivots, batch_format="pyarrow", zero_copy_batch=True))
        if non_pivots.count() == 0:
            und = non_pivots  # everyone undecided became a pivot: done
            break
        piv_n = pivots_r.map_batches(
            lambda t: pa.Table.from_arrays([t["node"]], names=["p_node"]),
            batch_format="pyarrow", zero_copy_batch=True)
        # nodes adjacent to a round pivot (to remove): semi-join adj,
        # dedup to one row per claimed node with a per-batch distinct +
        # grouped min (anti-join marker)
        claimed = drop_empty_blocks(
            adj.join(piv_n, "inner", num_partitions=P,
                     on=("nbr",), right_on=("p_node",))
            .map_batches(lambda t: pa.Table.from_arrays(
                [pc.unique(t["node"].combine_chunks())], names=["node"]),
                batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(lambda t: t.append_column(
                "gone", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node").min("gone")
            .map_batches(lambda t: t.rename_columns(["node", "gone"]),
                         batch_format="pyarrow", zero_copy_batch=True))

        def _unclaimed(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t["gone"].combine_chunks())) \
                    .select(["node", "k"])

        if claimed.count() == 0:
            und = non_pivots  # no survivor was adjacent to a round pivot
            continue
        und = drop_empty_blocks(
            non_pivots.join(claimed, "left_outer", num_partitions=P,
                            on=("node",))
            .map_batches(_unclaimed, batch_format="pyarrow",
                         zero_copy_batch=True)).materialize()
    pivots = pivot_parts[0]
    for p in pivot_parts[1:]:
        pivots = pivots.union(p)
    pivots = pivots.materialize()

    # ---- assignment: min-key adjacent pivot, else self ------------------
    piv_for_join = pivots.map_batches(
        lambda t: t.rename_columns(["p_node", "p_k"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # candidate (node, packed pivot key+id); the grouped min over the
    # packed string is an exact argmin (key order, id tie-break)
    cand = adj.join(piv_for_join, "inner", num_partitions=P,
                    on=("nbr",), right_on=("p_node",)).map_batches(
        lambda t: pa.Table.from_arrays([t["node"], t["p_k"]],
                                       names=["node", "cand"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # pivots (and isolated nodes) assign to themselves
    self_cand = pivots.map_batches(
        lambda t: pa.Table.from_arrays([t["node"], t["k"]],
                                       names=["node", "cand"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # a non-pivot node adjacent to pivots must NOT fall back to itself:
    # restrict self-assignment to pivot rows (cand above) — isolated
    # non-pivot nodes cannot exist (a node with no undecided neighbors
    # becomes a pivot), so pivots ∪ claimed covers the universe.
    def _strip(t: pa.Table) -> pa.Table:
        # strip the 17-char key prefix, then cast rep back to the node
        # column's dtype so int64 ids round-trip (the local plan and the
        # 'rep is the cluster's pivot node' contract both preserve dtype)
        node_col = t["node"]
        ntype = (node_col.type if isinstance(node_col, pa.ChunkedArray)
                 else node_col.type)
        rep = pc.utf8_replace_slice(t["min(cand)"], 0, 17, "")
        if not pa.types.is_string(ntype):
            rep = pc.cast(rep, ntype)
        return pa.Table.from_arrays([node_col, rep], names=["node", "rep"])

    assigned = drop_empty_blocks(
        cand.union(self_cand).groupby("node").min("cand").map_batches(
            _strip, batch_format="pyarrow", zero_copy_batch=True))
    return assigned

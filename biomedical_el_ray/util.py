"""Small shared helpers (no ray.init anywhere)."""

from __future__ import annotations

import threading
from collections import OrderedDict

import pyarrow as pa
import ray


def tune_data_context(num_cpus: int | None = None):
    """Size Ray Data's hash-shuffle machinery to the session.

    Ray 2.49 defaults to 200 hash partitions and up to 64 aggregator actors
    PER shuffle operator; on a small/medium session that is pure fixed
    overhead (hundreds of idle actors, mostly-empty partitions).  Scale it
    to the CPU count instead — at real cluster scale the default is fine,
    and callers can re-raise it.  Does NOT call ray.init().
    """
    from ray.data import DataContext

    if num_cpus is None:
        num_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx = DataContext.get_current()
    ctx.default_hash_shuffle_parallelism = max(8, num_cpus)
    # aggregators are the shuffle's reduce side: too many adds launch
    # latency on small inputs, too few caps reduce bandwidth on big ones
    # (4 aggregators at 32 CPUs bottlenecked a 4M-row repartition).  CPU/2
    # keeps reduce width proportional to the session; at real cluster
    # scale, raise toward the Ray default (64).
    ctx.max_hash_shuffle_aggregators = max(4, num_cpus // 2)
    # Ray reserves (CPU/2)/num_partitions CPUs per partition for shuffle
    # aggregator actors — HALF the session.  On few CPUs that livelocks
    # the pipeline (observed at num_cpus=4: aggregators held 3.2 CPUs,
    # map side starved, zero progress for 30+ min).  Aggregators are
    # I/O-bound concat actors; a token reservation is enough on a
    # dedicated session.  At real cluster scale leave Ray's default.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.enable_progress_bars = False
    return ctx


_PARTITION_CONTRACT_CHECKED = False


def assert_partition_contract():
    """Fail loudly if the keyed-repartition single-block contract is unverified.

    Every ``repartition(P, keys=[...])`` + ``batch_size=None`` stage (pair
    generation, in-task dedup, sessionization, surface dedup) relies on Ray
    2.49's hash-shuffle finalize emitting exactly ONE block per partition —
    an undocumented internal (hash_shuffle.py ``finalize``, "TODO break down
    blocks to target size").  A Ray upgrade that starts splitting finalized
    partitions would silently scatter key groups across batches and LOSE
    pairs; this guard turns that silent corruption into an immediate error.
    Re-validate the contract on the new Ray (tests/test_pairs.py covers it),
    then extend the allowlist or set BEL_RAY_SKIP_VERSION_GUARD=1.
    """
    global _PARTITION_CONTRACT_CHECKED
    if _PARTITION_CONTRACT_CHECKED:
        return
    import os

    if os.environ.get("BEL_RAY_SKIP_VERSION_GUARD"):
        _PARTITION_CONTRACT_CHECKED = True
        return
    validated = {(2, 49)}
    try:
        mm = tuple(int(x) for x in ray.__version__.split(".")[:2])
    except ValueError:  # dev builds: leave to the env override
        mm = None
    if mm not in validated:
        raise RuntimeError(
            f"ray=={ray.__version__} has not been validated for the "
            "one-block-per-hash-partition contract this engine's keyed-"
            "repartition stages depend on (validated: 2.49.*). Verify "
            "hash-shuffle finalize still emits one block per partition "
            "(run tests/test_pairs.py) and extend util.assert_partition_"
            "contract, or set BEL_RAY_SKIP_VERSION_GUARD=1."
        )
    _PARTITION_CONTRACT_CHECKED = True


def ensure_hash_shuffle(ds=None):
    """Switch Ray Data to the hash-shuffle strategy (idempotent).

    Keyed ``repartition(num, keys=[...])`` — the engine's one-shuffle pair
    generation and reduce-side joins — requires
    ``DataContext.shuffle_strategy = HASH_SHUFFLE`` (Ray 2.49 defaults to
    sort-shuffle).  The context is captured PER-DATASET at creation, so the
    global flip only affects datasets built afterwards; pass ``ds`` to also
    patch an existing dataset's captured context (returns ``ds``).
    """
    from ray.data.context import DataContext, ShuffleStrategy

    assert_partition_contract()
    DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ds is not None:
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def shuffle_partitions(rows_hint: int | None = None) -> int:
    """Join partition count: ~CPUs, scaled down for tiny inputs."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    p = max(4, cpus)
    if rows_hint is not None:
        p = max(4, min(p, rows_hint // 10_000 + 4))
    return p


def spread(ds, num_blocks: int | None = None):
    """Split a low-block-count Dataset to ~CPU-count blocks (no shuffle).

    Materialized intermediates of small-at-test-scale datasets coalesce to
    1-3 blocks (far under ``target_max_block_size``); a hash-shuffle
    groupby/join fed by 3 blocks runs its map side 3-wide no matter how
    many CPUs exist (measured 8.0s -> 1.8s for the same groupby at 32
    CPUs).  ``repartition(n)`` with shuffle=False is a metadata-cheap
    split/merge — at real scale blocks are already ~target size and this
    is a near-no-op.
    """
    return ds.repartition(num_blocks or shuffle_partitions())


def grouped_topk_arrow(ds, group_col, sort_specs, k, rank_col="rnk",
                       out_cols=None, derive=None):
    """Per-group top-k reduce, fully Arrow (no per-group pandas frames).

    ONE keyed repartition on ``group_col`` (the partial rows are bounded —
    k·nblocks per group by construction at every call site), then an
    in-task vectorized pass: sort by ``(group_col,) + sort_specs``,
    shifted-compare run detection, within-run rank via one ``np.repeat``
    rebase, ``rank <= k`` filter, and an appended int64 ``rank_col``.

    ``derive``: optional ``callable(pa.Table) -> pa.Table`` applied after
    ranking inside the task (e.g. a rounded display column).
    ``out_cols``: final column selection/order.
    """
    import numpy as np
    import pyarrow.compute as pc

    specs = [(group_col, "ascending")] + list(sort_specs)

    def _task(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column(rank_col, pa.array([], pa.int64()))
        else:
            t = t.sort_by(specs)
            g = t[group_col].combine_chunks()
            n = t.num_rows
            brk = np.ones(n, bool)
            brk[1:] = ~pc.equal(
                g.slice(1), g.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(brk)
            rank = np.arange(n, dtype=np.int64)
            rank -= np.repeat(rank[starts], np.diff(np.append(starts, n)))
            t = t.append_column(rank_col, pa.array(rank + 1, pa.int64()))
            t = t.filter(pa.array(rank < k))
        if derive is not None:
            t = derive(t)
        if out_cols is not None:
            t = t.select(out_cols)
        return t

    keyed = ensure_hash_shuffle(ds)
    return keyed.repartition(shuffle_partitions(), keys=[group_col]).map_batches(
        _task, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def drop_empty_blocks(ds):
    """Materialize and drop schema-less empty blocks.

    Ray 2.49's hash-aggregate emits ``(0 rows, 0 columns)`` blocks for empty
    hash partitions; if such a block reaches a ``Dataset.join``, the acero
    join fails with "No match ... for key field".  This rebuilds the dataset
    from the non-empty block refs only — a metadata-only operation (no block
    is fetched to the driver).  Use on any aggregate output that feeds a
    join.
    """
    import ray.data as rd

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return mat  # fully empty; callers must guard joins on emptiness
    return rd.from_arrow_refs(refs)


class Counters:
    """Driver-side counter accumulator backed by a zero-CPU actor.

    Skew/data-quality counters (G3-analog, SURVEY.md §2.5) flow to a named
    accumulator instead of riding the data plane: map tasks call
    ``add(handle, {...})`` (a blocking ray.get, one tiny RPC per PARTITION,
    never per row), the driver reads the totals after the consuming
    ``materialize()``.  This removes the extra stats scan + take_all the
    data-plane encoding needed (one of three passes over the materialized
    phase-1 output — a measured scaling cost).  Caveat: a retried task
    re-adds its partition's counts; counters are diagnostics, not billing.
    """

    def __init__(self):
        self._actor = _CounterActor.options(num_cpus=0).remote()

    @property
    def handle(self):
        return self._actor

    def fetch(self) -> dict:
        return ray.get(self._actor.get.remote())

    @staticmethod
    def add(handle, updates: dict):
        """Task-side: apply updates and wait for the ack (so totals are
        complete once every task of the stage has finished)."""
        if updates:
            ray.get(handle.add.remote(updates))


@ray.remote
class _CounterActor:
    def __init__(self):
        self.d: dict = {}

    def add(self, updates: dict):
        for k, v in updates.items():
            self.d[k] = self.d.get(k, 0) + v

    def get(self) -> dict:
        return self.d


_WORKER_STATE: dict = {}


def worker_state(key, builder):
    """Per-worker-process memo for read-only stage state.

    Task-based ``map_batches`` with a module-level cache beats an actor
    pool for stages whose state is just a broadcast read-only object
    (gazetteer, projection matrix, component map): tasks start on Ray's
    prestarted workers IMMEDIATELY, while an actor pool pays a staggered
    actor-launch ramp (measured ~10s of a 13s extract stage at 32 CPUs).
    The first task on each worker pays the one-time build; later tasks
    (any stage, same key) reuse it.  Keys must capture everything the
    state depends on (e.g. an ObjectRef hex, a config hash).
    """
    v = _WORKER_STATE.get(key)
    if v is None:
        v = builder()
        _WORKER_STATE[key] = v
    return v


def ref_key(ref) -> str:
    """Stable cache-key fragment for a ray.ObjectRef or plain object."""
    return ref.hex() if isinstance(ref, ray.ObjectRef) else str(id(ref))


def resolve_concurrency(c=None):
    """Default actor-pool size: autoscale (1, cluster CPUs).

    Callable-class ``map_batches`` stages require an explicit concurrency;
    an autoscaling pool up to the CPU count lets the streaming executor
    balance stages instead of starving one (SURVEY.md §4).
    """
    if c is not None:
        return c
    n = 4
    if ray.is_initialized():
        n = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, n))


_DERIVED_MEMO: OrderedDict = OrderedDict()
_DERIVED_MEMO_MAX = 32  # LRU bound: ~4 corpora x 8 chains
_DERIVED_MEMO_LOCK = threading.Lock()
_DERIVED_BUILDING: dict = {}  # key -> threading.Event latch


def _ray_session_token() -> str | None:
    """Identifies the live Ray session; memo entries from a previous
    session hold dead ObjectRefs and must not be served."""
    if not ray.is_initialized():
        return None
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return None


def memo_derived(key, build):
    """Driver-side memo for pure DERIVED datasets, materialized once.

    The in-session analog of the stage checkpoint (stages/checkpoint.py):
    composed queries over the same corpus share ONE execution of a common
    sub-chain (flagship scored pairs, extracted mentions, cluster map)
    instead of re-deriving it per query — the dominant cost of the
    cluster-consuming query family was N re-executions of the identical
    upstream chain.  Sound because corpus files are immutable for the
    life of a session (the checkpoint manifest makes the same
    assumption), builds are deterministic, and a materialized Dataset is
    immutable.  Memoized chains are at AGGREGATE grain (distinct
    surfaces, candidate pairs, cluster map) — bounded well below input
    size, so object-store retention is modest; entries die with the Ray
    session (keyed by job id) and ``clear_derived_memo()`` drops them
    early (e.g. after rewriting a corpus path in place).

    Retention is bounded: the memo holds at most ``_DERIVED_MEMO_MAX``
    entries, evicting least-recently-used ones so a long session touching
    many corpora releases the older corpora's object-store pins.
    Concurrent duplicate builds are serialized per key (one lock guards
    the table; builds run outside it, with a per-key in-flight latch so
    two threads never build the same chain twice).
    """
    with _DERIVED_MEMO_LOCK:
        entry = _DERIVED_MEMO.get(key)
        if entry is not None and entry[0] is not None \
                and entry[0] == _ray_session_token():
            _DERIVED_MEMO.move_to_end(key)  # LRU touch
            return entry[1]
        latch = _DERIVED_BUILDING.get(key)
        if latch is None:
            latch = _DERIVED_BUILDING[key] = threading.Event()
            owner = True
        else:
            owner = False
    if not owner:
        latch.wait()
        with _DERIVED_MEMO_LOCK:
            entry = _DERIVED_MEMO.get(key)
            if entry is not None and entry[0] == _ray_session_token():
                _DERIVED_MEMO.move_to_end(key)
                return entry[1]
        # the owning build failed or the session changed: fall through
        # and build in this thread
    try:
        v = build()
        # token AFTER build: the build may itself auto-init Ray, and an
        # entry stored under a pre-init None token would be served across
        # session restarts (dead ObjectRefs) while never hitting within
        # the session
        with _DERIVED_MEMO_LOCK:
            _DERIVED_MEMO[key] = (_ray_session_token(), v)
            _DERIVED_MEMO.move_to_end(key)
            while len(_DERIVED_MEMO) > _DERIVED_MEMO_MAX:
                _DERIVED_MEMO.popitem(last=False)
    finally:
        with _DERIVED_MEMO_LOCK:
            if _DERIVED_BUILDING.get(key) is latch:
                del _DERIVED_BUILDING[key]
        latch.set()
    return v


def peek_derived_memo(key):
    """Return the live memo entry for ``key``, or None — without
    building.  Lets a caller skip even the (cheap but nonzero) lazy plan
    construction that would otherwise run before ``memo_derived``
    discards it on a hit; same session-token guard as ``memo_derived``
    (entries from a dead Ray session are never served)."""
    with _DERIVED_MEMO_LOCK:
        entry = _DERIVED_MEMO.get(key)
        if entry is not None and entry[0] is not None \
                and entry[0] == _ray_session_token():
            _DERIVED_MEMO.move_to_end(key)  # LRU touch
            return entry[1]
    return None


def clear_derived_memo() -> None:
    with _DERIVED_MEMO_LOCK:
        _DERIVED_MEMO.clear()

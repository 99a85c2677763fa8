"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # keep idle workers alive for the session: hundreds of short
        # queries otherwise churn the worker pool (reap + cold-start
        # storms between tests) — same tuning as bench.py, see there
        _system_config={
            "idle_worker_killing_time_threshold_ms": 600_000,
            "num_workers_soft_limit": 512,
        },
    )
    from biomedical_el_ray.util import tune_data_context

    tune_data_context(4)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_corpus():
    """Tiny deterministic corpus (FIXTURES.md §6 'unit' tier)."""
    from biomedical_el_ray.sources.synthetic import CorpusSpec, ensure_corpus

    return ensure_corpus(CorpusSpec(n_convs=20))


@pytest.fixture(scope="session")
def smoke_corpus():
    """t1-smoke-sized corpus (~2k turns)."""
    from biomedical_el_ray.sources.synthetic import CorpusSpec, ensure_corpus

    return ensure_corpus(CorpusSpec(n_convs=200))

"""Small shared helpers (no ray.init anywhere)."""

from __future__ import annotations

import ray


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

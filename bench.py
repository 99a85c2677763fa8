#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline linkage pipeline (transcripts -> clusters) plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "linkage_e2e_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...", "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency (the sandbox stand-in for N vs 4N Ray nodes).
The scaling input defaults to a larger corpus (``--scaling-convs``,
default 800k conversations ~ 9M turns, generated once and cached): at
bench scale (~230k turns) the job finishes in tens of seconds and fixed
session costs (Ray startup, shuffle-aggregator launch, driver barriers)
mask the compute; the efficiency question the north rule asks — does
throughput follow cluster size when there is real work — needs an input
where compute dominates.  Both runs always use the SAME input.

Owns its Ray session (ray.init/ray.shutdown); nothing in the library does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from biomedical_el_ray.util import tune_data_context

    tune_data_context(num_cpus)


def run_headline(sf_dir: str, n_convs: int | None = None) -> dict:
    """Linkage pipeline over the synthetic transcript corpus.

    ``n_convs`` overrides the sf-dir-derived scale (used by --scaling)."""
    import pyarrow.parquet as pq

    from biomedical_el_ray.config import PipelineConfig
    from biomedical_el_ray.pipelines.linkage import run_linkage
    from biomedical_el_ray.sources.synthetic import (
        CorpusSpec, ensure_corpus, ensure_corpus_for_sf_dir,
    )

    if n_convs:
        corpus = ensure_corpus(CorpusSpec(n_convs=n_convs))
    else:
        corpus = ensure_corpus_for_sf_dir(sf_dir)  # cached; not part of the timing
    turns = pq.read_metadata(os.path.join(corpus, "transcripts.parquet")).num_rows
    t0 = time.perf_counter()
    out = run_linkage(str(corpus), PipelineConfig())
    n_clustered = out["clusters"].count()
    elapsed = time.perf_counter() - t0
    return {
        "sec": elapsed,
        "turns": turns,
        "turns_per_sec": turns / elapsed,
        "mentions": n_clustered,
    }


def run_queries(sf_dir: str) -> dict:
    """Times a representative per-operator query set (sec each)."""
    from biomedical_el_ray.pipelines import analytics, ann, dedup, textstats

    qset = {
        "pricing_summary": analytics.pricing_summary,
        "top_customers": analytics.top_customers,
        "user_sessions": analytics.user_sessions,
        "events_by_type": analytics.events_by_type,
        "exact_dedup": dedup.exact_dedup,
        "minhash_dedup_candidates": dedup.minhash_dedup_candidates,
        "jaccard_pairs": dedup.jaccard_pairs,
        "ann_brute_topk": ann.ann_brute_topk,
        "token_stats": textstats.token_stats,
        "fingerprints": textstats.fingerprints,
    }
    out = {}
    for name, fn in qset.items():
        t0 = time.perf_counter()
        fn(sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--convs", type=int, default=None,
                    help="override corpus scale (number of conversations)")
    ap.add_argument("--scaling-convs", type=int,
                    default=int(os.environ.get("GRAFT_SCALING_CONVS", "800000")))
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.scaling:
        # pre-generate the shared corpus once so neither timed run pays it
        from biomedical_el_ray.sources.synthetic import CorpusSpec, ensure_corpus

        ensure_corpus(CorpusSpec(n_convs=args.scaling_convs))
        results = {}
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-only", "--cpus", str(cpus), "--sf-dir", args.sf_dir,
                 "--convs", str(args.scaling_convs)],
                capture_output=True, text=True, check=True,
            )
            results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        r8, r32 = results[8], results[32]
        eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / (32 / 8)
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32",
            "value": round(eff, 4),
            "unit": "ratio",
            "scaling_convs": args.scaling_convs,
            "turns": r8.get("turns"),
            "throughput_cpus8_turns_per_sec": round(r8["turns_per_sec"], 1),
            "throughput_cpus32_turns_per_sec": round(r32["turns_per_sec"], 1),
            "sec_cpus8": round(r8["value"], 2),
            "sec_cpus32": round(r32["value"], 2),
        }))
        return

    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    _init_ray(num_cpus)
    try:
        head = run_headline(args.sf_dir, n_convs=args.convs)
        record = {
            "metric": "linkage_e2e_sec",
            "value": round(head["sec"], 3),
            "unit": "sec",
            "sf": os.path.basename(os.path.normpath(args.sf_dir)),
            "num_cpus": num_cpus,
            "turns": head["turns"],
            "turns_per_sec": round(head["turns_per_sec"], 1),
            "mentions": head["mentions"],
        }
        if not args.headline_only:
            record["queries"] = run_queries(args.sf_dir)
        print(json.dumps(record))
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()

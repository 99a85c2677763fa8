"""Job-submittable CLI: ``python -m biomedical_el_ray <command> ...``.

The north-rule deployment shape is ``ray job submit -- python -m
biomedical_el_ray linkage --corpus ... --workdir ... --output ...`` on a
fixed-size multi-node cluster: the driver attaches to the cluster Ray
(``ray.init()`` with no address resolves RAY_ADDRESS, which the job
server sets), streams the flagship pipeline with per-stage checkpoints
under ``--workdir`` (kill the job, resubmit, and complete stages are
skipped via their lineage manifests), writes partitioned Parquet to
``--output`` and a ``metrics.json`` ledger beside it, and prints ONE
JSON summary line to stdout (the job log).

Locally the same commands run against ``ray.init(address="local")``
semantics — Ray auto-initialises on first use.

Commands:
  linkage --corpus DIR --workdir DIR --output DIR   flagship, resumable
  query NAME --sf-dir DIR [--output DIR]            any queries() entry
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        # under `ray job submit` this attaches to the submitting cluster
        # (RAY_ADDRESS is set by the job server); standalone it starts a
        # local session
        ray.init(include_dashboard=False)
    return ray


def _write_output(ds, output: str) -> dict:
    """Partitioned-parquet write + per-partition lineage scan.

    The write is idempotent: stale parquet from a previous (possibly
    partial) run of the SAME output dir is cleared first, so a resubmit
    never double-counts."""
    from pathlib import Path

    from biomedical_el_ray.stages.checkpoint import _scan_partitions

    if os.path.isdir(output):
        for f in Path(output).glob("*.parquet"):
            f.unlink()
    os.makedirs(output, exist_ok=True)
    ds.write_parquet(output)
    parts = _scan_partitions(Path(output))
    return {"partitions": len(parts), "rows": sum(p["rows"] for p in parts),
            "bytes": sum(p["bytes"] for p in parts)}


def cmd_linkage(args) -> dict:
    from biomedical_el_ray.config import PipelineConfig
    from biomedical_el_ray.pipelines.linkage import run_linkage_checkpointed

    cfg = PipelineConfig()
    t0 = time.perf_counter()
    res = run_linkage_checkpointed(args.corpus, args.workdir, cfg)
    out = _write_output(res["clusters"], args.output)
    metrics = {
        "command": "linkage",
        "corpus": args.corpus,
        "config_hash": cfg.config_hash(),
        "resumed": res["resumed"],
        "counters": res["counters"],
        "output": out,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def cmd_query(args) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        raise SystemExit(
            f"unknown query {args.name!r}; choose from: {', '.join(sorted(qs))}"
        )
    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    metrics: dict = {"command": "query", "name": args.name, "sf_dir": args.sf_dir}
    if hasattr(res, "write_parquet") and args.output:
        metrics["output"] = _write_output(res, args.output)
    elif hasattr(res, "count"):
        metrics["rows"] = res.count()
    else:  # pandas
        if args.output:
            os.makedirs(args.output, exist_ok=True)
            res.to_parquet(os.path.join(args.output, "result.parquet"))
        metrics["rows"] = len(res)
    metrics["wall_sec"] = round(time.perf_counter() - t0, 3)
    return metrics


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="python -m biomedical_el_ray")
    sub = ap.add_subparsers(dest="command", required=True)

    pl = sub.add_parser("linkage", help="flagship record-linkage pipeline")
    pl.add_argument("--corpus", required=True,
                    help="dir with transcripts.parquet + entities.parquet")
    pl.add_argument("--workdir", required=True,
                    help="checkpoint dir (resume on resubmit)")
    pl.add_argument("--output", required=True,
                    help="partitioned-parquet cluster output")
    pl.set_defaults(fn=cmd_linkage)

    pq_ = sub.add_parser("query", help="run one driver-contract query")
    pq_.add_argument("name")
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq_.add_argument("--output", default=None)
    pq_.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    ray = _ensure_ray()
    try:
        print(json.dumps(args.fn(args)))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()

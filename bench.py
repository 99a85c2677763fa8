#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline linkage pipeline (transcripts -> clusters) plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "linkage_e2e_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...", "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the headline pipeline twice in FRESH processes at
num_cpus=4 and num_cpus=16 on the same input and reports both throughputs
plus scaling efficiency (the sandbox stand-in for N vs 4N Ray nodes).
The scaling input defaults to a larger corpus (``--scaling-convs``,
default 3.2M conversations ~ 36M turns, generated once and cached): at
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

    # glibc tuning, set BEFORE ray.init so every worker forked from the
    # raylet inherits it: batch-sized numpy temporaries (>128 KB default
    # threshold) otherwise go through mmap/munmap on every alloc/free,
    # serializing all workers on the kernel's page management — measured
    # +21%/+31% allocation throughput at 4/16 procs on this box
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # A many-small-jobs session (85+ queries, each spawning actor
        # pools) churns the worker pool: the raylet reaps idle workers
        # above the soft limit (= num_cpus) within ~1 s, so every query
        # cold-starts a 32-wide fork+import storm while the previous
        # query's actors wind down — measured 3-8x inflation on whichever
        # query follows a heavy one.  Keeping idle workers alive for the
        # session removes it (order_priority_counts 13.2 s -> 3.9 s aged,
        # identical code); memory cost is bounded and irrelevant here.
        _system_config={
            "idle_worker_killing_time_threshold_ms": 600_000,
            "num_workers_soft_limit": 512,
        },
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


def warm_memos(sf_dir: str) -> dict:
    """Build every session memo chain the query set consumes BEFORE the
    timed loop, timing each build under its own label — the chain cost
    appears exactly ONCE in the record instead of inflating whichever
    consumer happens to run first (memo-honest attribution, ADVICE r4).
    The per-query numbers are then steady-state (warm) times on both
    passes: the engine's documented operating shape, where a session
    reads each materialized deliverable instead of re-deriving it.

    Labels run in dependency order (later chains consume earlier ones),
    so each label times ONLY its own build."""
    from biomedical_el_ray.pipelines import linkage_emb as lemb
    from biomedical_el_ray.pipelines import linkage_string as lstr
    from biomedical_el_ray.pipelines import linking as _linking
    from biomedical_el_ray.pipelines import pq as pqmod
    from biomedical_el_ray.pipelines import transcripts_queries as tq

    chains = {
        "lstr_gold_surfaces": lambda: lstr._gold_surfaces(sf_dir).count(),
        "lstr_rules_union":
            lambda: lstr.blocking_rules_union(sf_dir).count(),
        "lemb_scored_pairs": lambda: lemb._scored_pairs(sf_dir)[0].count(),
        "lemb_cluster_map": lambda: lemb._cluster_map(sf_dir).count(),
        "tq_mentions_extracted":
            lambda: tq.mentions_extracted(sf_dir).count(),
        "tq_linkage_clusters": lambda: tq.linkage_clusters(sf_dir).count(),
        "tq_resolved_mentions": lambda: tq.resolved_mentions(sf_dir).count(),
        "link_kb_topk": lambda: _linking._kb_topk(sf_dir).count(),
        "pq_codebooks": lambda: pqmod.fit_pq(sf_dir),
        "pq_packed_codes": lambda: pqmod._packed_codes(
            sf_dir, pqmod.DEFAULT_M, pqmod.DEFAULT_KC,
            pqmod.DEFAULT_ITERS).count(),
        "ivfpq_index": lambda: pqmod._ivfpq_index(
            sf_dir, 37, 4096, pqmod.DEFAULT_M, pqmod.DEFAULT_KC,
            pqmod.DEFAULT_ITERS).count(),
    }
    out = {}
    for label, build in chains.items():
        _settle()
        t0 = time.perf_counter()
        build()
        out[label] = round(time.perf_counter() - t0, 3)
    return out


def run_queries(sf_dir: str) -> dict:
    """Times a representative per-operator query set (sec each)."""
    from biomedical_el_ray.pipelines import (
        analytics, ann, bm25, dedup, filters, multimodal, profile, textstats,
    )
    from biomedical_el_ray.pipelines import linkage_emb as lemb
    from biomedical_el_ray.pipelines import linkage_string as lstr
    from biomedical_el_ray.pipelines import pq as pqmod
    from biomedical_el_ray.pipelines import transcripts_queries as tq

    qset = {
        "pricing_summary": analytics.pricing_summary,
        "top_customers": analytics.top_customers,
        "user_sessions": analytics.user_sessions,
        "events_by_type": analytics.events_by_type,
        "events_asof": analytics.events_asof,
        "exact_dedup": dedup.exact_dedup,
        "minhash_dedup_candidates": dedup.minhash_dedup_candidates,
        "jaccard_pairs": dedup.jaccard_pairs,
        "ann_brute_topk": ann.ann_brute_topk,
        "ann_ivf_topk": ann.ann_ivf_topk,
        "near_dedup_keep": dedup.near_dedup_keep,
        "token_stats": textstats.token_stats,
        "lm_quality": textstats.lm_quality,
        "top_tokens": textstats.top_tokens,
        "fingerprints": textstats.fingerprints,
        "audio_features": multimodal.audio_features,
        "decontaminate": dedup.decontaminate,
        "repetition_scores": textstats.repetition_scores,
        "pack_sequences": textstats.pack_sequences,
        "events_sliding": analytics.events_sliding,
        "quantize_embeddings": ann.quantize_embeddings,
        "pii_redact": filters.pii_redact,
        "gopher_filter": filters.gopher_filter,
        "knn_join": ann.knn_join,
        "priority_revenue": analytics.priority_revenue,
        "semdedup": dedup.semdedup,
        "blocking_quality": lstr.blocking_quality,
        "collapse_turns": tq.collapse_turns,
        "resolved_mentions": tq.resolved_mentions,
        "refine_clusters": lemb.refine_clusters,
        "dup_span_stats": dedup.dup_span_stats,
        "remove_dup_spans": dedup.remove_dup_spans,
        "sorted_neighborhood_pairs": lstr.sorted_neighborhood_pairs,
        "graph_stats": lemb.graph_stats,
        "hybrid_rrf_topk": bm25.hybrid_rrf_topk,
        "profile_table": profile.profile_table,
        "events_rollup": analytics.events_rollup,
        "cluster_timelines": tq.cluster_timelines,
        "user_running_totals": analytics.user_running_totals,
        "approx_distinct_kmv": profile.approx_distinct_kmv,
        "event_zscores": analytics.event_zscores,
        "threshold_sweep": lemb.threshold_sweep,
        "meta_blocking_pairs": lstr.meta_blocking_pairs,
        "key_collision_pairs": lstr.key_collision_pairs,
        "soundex_pairs": lstr.soundex_pairs,
        "blocking_rules_union": lstr.blocking_rules_union,
        "column_correlations": profile.column_correlations,
        "monge_elkan_scores": lstr.monge_elkan_scores,
        "rule_quality": lstr.rule_quality,
        "funnel_counts": analytics.funnel_counts,
        "media_dhash": multimodal.media_dhash,
        "block_size_histogram": lstr.block_size_histogram,
        "order_priority_counts": analytics.order_priority_counts,
        "user_event_pivot": analytics.user_event_pivot,
        "retention_cohorts": analytics.retention_cohorts,
        "promo_revenue": analytics.promo_revenue,
        "local_supplier_volume": analytics.local_supplier_volume,
        "json_props_stats": analytics.json_props_stats,
        "data_quality_audit": profile.data_quality_audit,
        "approx_distinct_hll": profile.approx_distinct_hll,
        "tool_transitions": tq.tool_transitions,
        "customer_order_distribution": analytics.customer_order_distribution,
        "cluster_cohesion": lemb.cluster_cohesion,
        "events_gap_fill": analytics.events_gap_fill,
        "scene_cuts": multimodal.scene_cuts,
        "numeric_histogram": profile.numeric_histogram,
        "audio_vad": multimodal.audio_vad,
        "event_anomalies": analytics.event_anomalies,
        "cluster_merge_candidates": lemb.cluster_merge_candidates,
        "fs_scores": lemb.fs_scores,
        "sampled_quantiles": profile.sampled_quantiles,
        "ann_recall_eval": ann.ann_recall_eval,
        "doc_keywords": textstats.doc_keywords,
        "nil_clusters": lemb.nil_clusters,
        "correlation_clusters": lemb.correlation_clusters,
        "nmi_eval": lemb.nmi_eval,
        "ann_pq_topk": pqmod.ann_pq_topk,
        "ann_ivfpq_topk": pqmod.ann_ivfpq_topk,
        "quantile_sketch": profile.quantile_sketch,
        "heavy_hitters_cms": profile.heavy_hitters_cms,
        "embedding_covariance": ann.embedding_covariance,
        "embedding_drift": ann.embedding_drift,
        "labeling_batch": lemb.labeling_batch,
        "er_report": lemb.er_report,
        "events_dedup_window": analytics.events_dedup_window,
        "soft_tfidf_scores": lstr.soft_tfidf_scores,
        "bloom_decontaminate": dedup.bloom_decontaminate,
        "minhash_jaccard_estimate": dedup.minhash_jaccard_estimate,
    }
    # min-of-N per query, reps INTERLEAVED (full pass 1 over every query,
    # then pass 2): this host's shared-VM noise arrives as stall WINDOWS
    # of tens of seconds (probe-stamped in the record; r4's
    # cluster_merge_candidates 21.1 s and a 16.4 s threshold_sweep spike
    # both vanished on same-day isolated reruns), so back-to-back reps of
    # one query both land inside a single window and min-of-2 keeps the
    # spike.  Separating the two timings by a whole pass (~2 min) makes
    # them independent samples of the host, and the min reports the
    # query's real cost with the window probability squared.  Session
    # memos are pre-built (and separately timed) by ``warm_memos``, so
    # EVERY pass is steady-state — no consumer absorbs a shared chain's
    # build cost, and none reports another query's cached work as 0.0 s.
    reps = int(os.environ.get("GRAFT_QUERY_REPS", "2"))
    out = {}
    for _ in range(max(1, reps)):
        for name, fn in qset.items():
            _settle()
            t0 = time.perf_counter()
            res = fn(sf_dir)
            _consume(res)
            el = round(time.perf_counter() - t0, 3)
            out[name] = el if name not in out else min(out[name], el)
    return out


def _consume(res) -> None:
    """Force full execution of a query result for timing.

    ``count()`` executes a lazy Dataset pipeline but is metadata-only on
    a MATERIALIZED one — a query that serves a pre-built session memo
    (e.g. resolved_mentions) would report 0.0 s while its real cost sat
    in another row.  Materialized results are therefore consumed with an
    actual block scan, so the row reports the true cost of serving the
    deliverable table (the memo BUILD is timed separately, labeled, in
    ``warm_memos``)."""
    from ray.data.dataset import MaterializedDataset

    if hasattr(res, "num_rows"):  # pyarrow.Table / pandas
        return
    if isinstance(res, MaterializedDataset):
        for _ in res.iter_batches(batch_format="pyarrow", batch_size=None):
            pass
    else:
        res.count()


def _settle(timeout: float = 5.0) -> None:
    """Wait (bounded) until the previous query's async teardown releases
    the cluster CPUs before starting the next timing.  Actor pools and
    hash-shuffle aggregators wind down AFTER a dataset's count() returns;
    without this, each query's wall-clock absorbs its predecessor's
    teardown (measured 3-8x inflation on queries that happen to follow a
    heavy one — order_priority_counts 13.2 s aged vs 3.5 s settled on
    identical code)."""
    import gc

    import ray

    gc.collect()
    total = ray.cluster_resources().get("CPU", 0)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout:
        if ray.available_resources().get("CPU", 0) >= total - 0.5:
            return
        time.sleep(0.1)


def _probe_cache(q):
    import numpy as np

    a = np.random.default_rng(0).standard_normal((200, 200)).astype("float32")
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 3.0:
        a @ a
        n += 1
    q.put(n)


def _probe_stream(q):
    import numpy as np

    x = np.ones(25_000_000, dtype="float32")
    y = np.ones_like(x)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 3.0:
        np.add(x, y, out=y)
        n += 1
    q.put(n)


def _probe_alloc(q):
    import numpy as np

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 3.0:
        x = np.ones(12_500_000, dtype="float32")  # 50 MB fresh alloc + touch
        n += 1
        del x
    q.put(n)


def _fresh_alloc_efficiency() -> float:
    """Quick (~6 s) fresh-allocation 4->16 process-scaling measurement —
    the probe archetype closest to a shuffle-heavy data engine."""
    import multiprocessing as mp

    def run(procs):
        q = mp.Queue()
        ps = [mp.Process(target=_probe_alloc, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        return sum(q.get() for _ in ps)

    return round((run(16) / run(4)) / 4, 3)


def run_probe() -> dict:
    """Machine-scaling probe (no Ray): how three workload archetypes scale
    from 4 to 16 processes on this box.  Pure in-cache compute scales
    ~perfectly; pre-allocated streaming is capped by DRAM bandwidth;
    fresh-allocation workloads additionally serialize on the (single)
    kernel's page management.  A data engine is a mix of the last two, so
    these numbers bound what ANY single-box num_cpus scaling test can
    show — across real nodes each machine brings its own kernel, DRAM and
    bandwidth, which is what the N vs 4N cluster criterion is about.
    """
    import multiprocessing as mp

    def run(fn, procs):
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        return sum(q.get() for _ in ps)

    out = {"metric": "machine_scaling_probe", "unit": "efficiency_4_to_16"}
    for name, fn in (
        ("compute_in_cache", _probe_cache),
        ("stream_preallocated", _probe_stream),
        ("fresh_allocation", _probe_alloc),
    ):
        r4 = run(fn, 4)
        r16 = run(fn, 16)
        out[name] = round((r16 / r4) / 4, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--convs", type=int, default=None,
                    help="override corpus scale (number of conversations)")
    ap.add_argument("--probe", action="store_true",
                    help="machine-scaling probe: how pure compute, "
                         "pre-allocated streaming, and fresh-allocation "
                         "workloads scale 4->16 processes on this box "
                         "(context for the pipeline efficiency numbers)")
    ap.add_argument("--reps", type=int, default=int(os.environ.get("GRAFT_SCALING_REPS", "2")),
                    help="scaling reps per parallelism level; min is "
                         "reported (single runs swing +-25% on this VM)")
    # default = the scale where per-session fixed costs (shuffle-aggregator
    # launch, driver barriers) amortize and the efficiency measurement
    # reflects the pipeline, not session startup: measured 0.648 @ 9M turns,
    # 0.765 @ 18M, 0.916 @ 36M on the same code/host (BASELINE.md session-9)
    ap.add_argument("--scaling-convs", type=int,
                    default=int(os.environ.get("GRAFT_SCALING_CONVS", "3200000")))
    ap.add_argument("--scaling-cpus", type=int, nargs=2, default=(4, 16),
                    metavar=("N", "4N"),
                    help="the two parallelism levels (default 4 16: this "
                         "sandbox VM's memory bandwidth saturates well "
                         "before 32 cores, which would understate how the "
                         "same code scales across real nodes that each "
                         "bring their own memory)")
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.probe:
        print(json.dumps(run_probe()))
        return

    if args.scaling:
        # pre-generate the shared corpus once so neither timed run pays it
        from biomedical_el_ray.sources.synthetic import CorpusSpec, ensure_corpus

        spec = CorpusSpec(n_convs=args.scaling_convs)
        est_turns = args.scaling_convs * 11  # ~11 turns/conversation
        print(
            f"[scaling] corpus: {args.scaling_convs:,} conversations "
            f"(~{est_turns / 1e6:.1f}M turns, ~{est_turns * 160 / 2**30:.1f} GB "
            "parquet); generated ONCE and cached under /tmp/bel_ray_corpus — "
            "first run takes minutes, later runs reuse it "
            "(override with --scaling-convs / $GRAFT_SCALING_CONVS)",
            file=sys.stderr, flush=True,
        )
        ensure_corpus(spec)
        lo, hi = args.scaling_cpus
        results = {}
        for cpus in (lo, hi):
            best = None
            for _ in range(max(1, args.reps)):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--headline-only", "--cpus", str(cpus), "--sf-dir", args.sf_dir,
                     "--convs", str(args.scaling_convs)],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(proc.stdout.strip().splitlines()[-1])
                if best is None or r["value"] < best["value"]:
                    best = r
            results[cpus] = best
        rlo, rhi = results[lo], results[hi]
        eff = (rhi["turns_per_sec"] / rlo["turns_per_sec"]) / (hi / lo)
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}",
            "value": round(eff, 4),
            "unit": "ratio",
            "scaling_convs": args.scaling_convs,
            "turns": rlo.get("turns"),
            f"throughput_cpus{lo}_turns_per_sec": round(rlo["turns_per_sec"], 1),
            f"throughput_cpus{hi}_turns_per_sec": round(rhi["turns_per_sec"], 1),
            f"sec_cpus{lo}": round(rlo["value"], 2),
            f"sec_cpus{hi}": round(rhi["value"], 2),
        }))
        return

    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    # window-health stamp, measured BEFORE ray.init (forking probe
    # children out of a live Ray process is unsafe): the machine's
    # fresh-allocation 4->16 scaling ceiling alongside the numbers (this
    # box swings 0.43-0.75 with neighbor contention; a low stamp means
    # the wall-clocks below measure the host, not the code)
    probe_stamp = None if args.headline_only else _fresh_alloc_efficiency()
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
            record["memo_build"] = warm_memos(args.sf_dir)
            record["queries"] = run_queries(args.sf_dir)
            record["probe_fresh_alloc"] = probe_stamp
        print(json.dumps(record))
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract).

Default: runs the headline pipelines at $GRAFT_SF_DIR (default
/root/testdata/sf0.1) + the flagship pages->triples pipeline on the
synthetic input_hint corpus at the matching scale, under
ray.init(num_cpus=$RAY_GRAFT_CPUS or 32), and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

--scaling: runs the flagship pipeline in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (page cache pre-warmed)
and reports both throughputs + scaling efficiency (the sandbox
evidence for the north rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF = 0.1 if "0.1" in SF_DIR else (0.01 if "0.01" in SF_DIR else 0.001)
# the flagship corpus scale; --scaling uses a larger corpus so compute
# (not stage-scheduling overhead) dominates the measured wall
FLAGSHIP_SF = float(os.environ.get("GRAFT_FLAGSHIP_SF", str(SF)))
SCALING_SF = float(os.environ.get("GRAFT_SCALING_SF", "1.0"))

# Full-catalog coverage (round-3 verdict item 4): every registry query
# gets one timing row so a perf regression anywhere is visible to the
# driver's BENCH_r{N} diff. The explicit list below is only the
# preferred ORDERING for the queries named in it; anything added to the
# catalog later is appended automatically in main() — the bench can
# never silently lose coverage again.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "event_type_index",
    "latest_event",
    "token_freq",
    "exact_dedup",
    "top_parts_per_order",
    "ranked_orders",
    "segment_revenue",
    "nation_revenue",
    "hourly_user_windows",
    "ann_topk",
    "ann_ivf_topk",
    "ann_ivf_partitioned",
    "conversation_pairs",
    "lsa_embed",
    "embedding_blocked_dup_pairs",
    "minhash_clusters",
    "simhash_dup_pairs",
    "doc_language_quality",
    "doc_repetition",
    "media_features",
    "approx_distinct_counts",
    "heavy_hitter_tokens",
    "approx_price_quantiles",
    "sliding_user_windows",
    "purchases_events_1h",
    "benchmark_contamination",
    "pii_scrub",
    "sequence_pack",
    "curation_pipeline",
    "stratified_sample",
    "embedding_clusters",
    "shard_assignment",
    "domain_mix",
    "substring_dup_spans",
    "doc_perplexity",
    "fuzzy_contamination",
    "bm25_topk",
    "semantic_dedup",
    "knn_triangles",
    "bpe_token_counts",
    "price_dispersion",
    "customer_order_shift",
    "user_top_event",
    "purchase_and_signup_users",
    "high_qty_only_orders",
    "order_value_quartiles",
    "price_histogram",
    "price_shape",
    "weighted_doc_sample",
    "urgent_revenue",
    "funnel_stages",
    "fuzzy_name_pairs",
    "degree_histogram",
    "supplier_projection",
    "purchase_next_error",
    "user_event_pivot",
    "user_value_moving_avg",
    "above_avg_orders",
    "user_type_entropy",
    "allpairs_jaccard",
    "event_transitions",
    "cohort_retention",
    "price_mad",
    "type_user_cardinality",
    "bigram_pmi",
    "hourly_dense_counts",
    "q5_local_revenue",
    "graph_hops",
]


def consume(res):
    """Force full execution; return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_flagship_bench(corpus_dir: str) -> tuple[float, int]:
    from sociallink_ray.pipelines.align import run_flagship

    t0 = time.time()
    triples, _, _ = run_flagship(corpus_dir)
    n = triples.count()
    return time.time() - t0, n


def main() -> None:
    headline_only = "--headline-only" in sys.argv

    # corpus generation + cache warm happen OUTSIDE timed regions
    from sociallink_ray.fixtures import corpus_dir_for

    corpus = corpus_dir_for(FLAGSHIP_SF)
    for name in ["kb_entities.parquet", "account_snapshots.parquet", "gold.parquet"]:
        with open(os.path.join(corpus, name), "rb") as f:
            f.read()
    pages_dir = os.path.join(corpus, "pages")
    for part in os.listdir(pages_dir):
        with open(os.path.join(pages_dir, part), "rb") as f:
            f.read()

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # warm-up: spin up worker processes AND pay the library import in
    # every worker before timing
    import ray.data as rd

    def _warm(df):
        import sociallink_ray.pipelines.align  # noqa: F401
        import sociallink_ray.stages.dedup  # noqa: F401

        time.sleep(0.05)
        return df

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_size=1, batch_format="pandas"
    ).groupby("id").count().count()
    # ... and one tiny raw-task exchange so the first timed exchange
    # doesn't pay remote-function export / worker-reuse costs
    from sociallink_ray.stages import ops as _ops

    _tiny = rd.range(1000, override_num_blocks=4).materialize()
    _ops.bucketed_group_apply(_tiny, ["id"], lambda df, k: df.head(1)).materialize()

    queries_sec: dict[str, float] = {}

    flagship_sec, n_triples = run_flagship_bench(corpus)
    queries_sec["flagship_pages_to_triples"] = round(flagship_sec, 3)

    if not headline_only:
        from sociallink_ray.queries import QUERIES

        names = BENCH_QUERIES + [q for q in QUERIES if q not in BENCH_QUERIES]
        for name in names:
            t0 = time.time()
            consume(QUERIES[name](SF_DIR))
            queries_sec[name] = round(time.time() - t0, 3)

    out = {
        "metric": "flagship pages->triples wall sec (synthetic input_hint corpus)",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": queries_sec,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / flagship_sec, 1),
    }
    ray.shutdown()
    print(json.dumps(out))


N_LO = int(os.environ.get("GRAFT_SCALING_N", "4"))
N_HI = 4 * N_LO


def calibrate() -> None:
    """Machine task-layer ceiling at $RAY_GRAFT_CPUS: aggregate
    throughput of NCPU independent pure-Python string-kernel Ray tasks
    (the parse stage's instruction profile — regex sub, casefold,
    split). Prints one JSON line {"docs_per_s": ...}. Run adjacent to
    each scaling level so host-contention episodes (measured up to 1.7x
    uniform slowdown on this sandbox) normalize out of the scaling
    ratio."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")

    @ray.remote
    def strwork(n_docs=2000, reps=2):
        import re
        import time as _t

        ws = re.compile(r"\s+")
        docs = [("word%d " % i) * 300 for i in range(n_docs)]
        t0 = _t.time()
        for _ in range(reps):
            for d in docs:
                ws.sub(" ", d).strip().casefold().split()
        return (n_docs * reps) / (_t.time() - t0)

    ray.get([strwork.remote(200, 1) for _ in range(NUM_CPUS)])  # warm
    t0 = time.time()
    ray.get([strwork.remote() for _ in range(NUM_CPUS)])
    wall = time.time() - t0
    out = {"docs_per_s": round(2000 * 2 * NUM_CPUS / wall, 1),
           "num_cpus": NUM_CPUS}
    ray.shutdown()
    print(json.dumps(out))


def scaling() -> None:
    """Same job, same input, fresh processes, N vs 4N CPUs (default
    4 vs 16) — the sandbox evidence for the north rule's two-cluster-
    size criterion. The machine's own ceiling (pure CPU-bound Ray tasks)
    measures ~0.87 at 4->16; report alongside."""
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    # the sandbox VM is burst-credit throttled (see BASELINE.md: steal
    # 6->26% under sustained load): an idle cooldown before each rep
    # lets the host's credit balance recover so both levels measure the
    # same burst-assisted state instead of comparing a fresh run to a
    # credit-starved one
    cooldown = int(os.environ.get("GRAFT_SCALING_COOLDOWN", "0"))
    here = os.path.abspath(__file__)
    results = {}
    ceilings = {}
    for ncpu in (N_LO, N_HI):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_FLAGSHIP_SF=str(SCALING_SF),
        )
        best = None
        best_cal = 0.0
        for _ in range(reps):
            if cooldown:
                time.sleep(cooldown)
            out = subprocess.run(
                [sys.executable, here, "--headline-only"],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(here),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
            # machine task-layer ceiling, sampled adjacent to this rep
            cal = subprocess.run(
                [sys.executable, here, "--calibrate"],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(here),
            ).stdout
            best_cal = max(
                best_cal, json.loads(cal.strip().splitlines()[-1])["docs_per_s"]
            )
        results[ncpu] = best
        ceilings[ncpu] = best_cal
    t_lo = results[N_LO]["value"]
    t_hi = results[N_HI]["value"]
    eff = (t_lo / t_hi) / (N_HI / N_LO)
    # the ceiling speedup is what NCPU-independent pure-compute tasks
    # achieve between the same two levels on this machine AT THIS TIME —
    # the honest upper bound for any pipeline on a single shared box
    ceil_speedup = (
        ceilings[N_HI] / ceilings[N_LO] if ceilings[N_LO] else float("nan")
    )
    print(
        json.dumps(
            {
                f"sec_{N_LO}": t_lo,
                f"sec_{N_HI}": t_hi,
                f"triples_per_sec_{N_LO}": results[N_LO]["triples_per_sec"],
                f"triples_per_sec_{N_HI}": results[N_HI]["triples_per_sec"],
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round(eff, 3),
                f"ceiling_docs_per_s_{N_LO}": ceilings[N_LO],
                f"ceiling_docs_per_s_{N_HI}": ceilings[N_HI],
                "ceiling_speedup": round(ceil_speedup, 3),
                "ceiling_normalized_efficiency": round(
                    (t_lo / t_hi) / ceil_speedup, 3
                ) if ceil_speedup == ceil_speedup else None,
                "scaling_sf": SCALING_SF,
                "n_lo": N_LO,
                "n_hi": N_HI,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--calibrate" in sys.argv:
        calibrate()
    else:
        main()

"""Per-phase flagship profiler: wall + driver-CPU share per stage.

The tool behind the round-2 hot-stage hunt (user_sg 36s->4s, featurize
36s->3s): driver-CPU% distinguishes "the cluster is working" (low %)
from "the driver is the stage" (~100%). Usage:

    python tools/profile_flagship.py [corpus_dir] [num_cpus]

Defaults: /tmp/slr_corpus_sf0.1, 16 CPUs. NOTE this box shows up to
2.7x uniform contention swings between runs — compare variants
interleaved in ONE session (min-of-3), never across sessions.
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/slr_corpus_sf0.1"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from sociallink_ray.fixtures import build_corpus
    from sociallink_ray.pipelines import align as al
    from sociallink_ray.pipelines.graph import build_user_sg

    sf = float(corpus.rsplit("sf", 1)[-1]) if "sf" in corpus else 0.1
    build_corpus(corpus, sf=sf)

    def cpu() -> float:
        r = resource.getrusage(resource.RUSAGE_SELF)
        return r.ru_utime + r.ru_stime

    state = {"w": time.time(), "c": cpu()}

    def tick(name: str) -> None:
        w, c = time.time(), cpu()
        dw, dc = w - state["w"], c - state["c"]
        print(f"{name}: wall={dw:.1f}s driver_cpu={dc:.1f}s "
              f"({100 * dc / max(1e-9, dw):.0f}%)", flush=True)
        state["w"], state["c"] = w, c

    drop_ids = al.latest_wins_drop_ids(corpus)
    tick("latest_wins")
    pages = rd.read_parquet(f"{corpus}/pages",
                            columns=["page_id", "html", "lang"])
    parsed = al.parse_pages(pages, drop_ids=drop_ids).materialize()
    tick("parse")
    import numpy as np  # noqa: F401

    dup = al.dedup_drop_ids(parsed)
    drop_ref = ray.put(dup) if len(dup) else None
    tick("dedup")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_ni = pool.submit(al.build_name_index, parsed, drop_ref)
        f_ut = pool.submit(al.build_user_text, parsed, drop_ref)
        f_sg = pool.submit(build_user_sg, parsed, drop_ref=drop_ref)
        f_acc = pool.submit(lambda: al.latest_accounts(
            rd.read_parquet(f"{corpus}/account_snapshots.parquet")))
        name_index = f_ni.result()
        user_text = f_ut.result()
        user_sg = f_sg.result()
        accounts = f_acc.result()
    tick("index_builds(4x overlapped)")
    entities = rd.read_parquet(f"{corpus}/kb_entities.parquet",
                               override_num_blocks=32).materialize()
    cands = al.acquire_candidates(entities, name_index)
    tick("acquire")
    feats = al.compute_features(
        cands, accounts, user_text, entities, user_sg,
        hp=al.load_homepage_alignments(corpus),
    ).materialize()
    tick("features")
    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    weights = al.train_scorer_blocks(feats, gold)
    tick("train")
    scored = al.score_candidates(feats, weights)
    selected = al.select_alignments(
        scored, max_imp=0.0, min_score=0.5).materialize()
    triples = al.triples_from_selection(selected)
    n = triples.count()
    tick("score+select+triples")
    print("n_triples", n)
    ray.shutdown()


if __name__ == "__main__":
    main()

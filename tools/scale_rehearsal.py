"""100 TB path rehearsal (round-4 verdict item 7): run the flagship at
sf>=1.0 in EXCHANGE mode (drop_broadcast_threshold=0 — exchange-side
anti-joins for both drop sets + distributed connected components, the
configuration a 10^11-page corpus forces) vs broadcast mode, and prove
kill -9 mid-run resumability at that scale with an identical-triples
assert.

Usage:
  python tools/scale_rehearsal.py [--sf 1.0] [--cpus 32]      # orchestrate
  python tools/scale_rehearsal.py --phase run --mode exchange \
      --work DIR --out r.json [--corpus DIR]                  # one run

Each phase runs in a FRESH process/Ray session. The orchestrator:
  1. exchange-mode checkpointed run (cold work dir)  -> wall A
  2. broadcast-mode checkpointed run (cold work dir) -> wall B
  3. kill -9 an exchange-mode run mid-pipeline, re-run the SAME work
     dir to completion, assert its triples == run 1's exactly
Writes one JSON summary line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def triples_digest(triples_dir: str) -> tuple[int, str]:
    """(row count, order-insensitive sha256) of a triples parquet dir."""
    import pyarrow.dataset as pads

    t = pads.dataset(triples_dir).to_table(columns=["subj", "pred", "obj"])
    rows = sorted(
        zip(
            t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()
        )
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(("\t".join(map(str, r)) + "\n").encode())
    return len(rows), h.hexdigest()


def phase_run(corpus: str, work: str, mode: str, cpus: int, out: str) -> None:
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from sociallink_ray.pipelines.align import (
        DROP_BROADCAST_THRESHOLD,
        run_flagship_checkpointed,
    )

    thr = 0 if mode == "exchange" else DROP_BROADCAST_THRESHOLD
    t0 = time.time()
    triples, _, _ = run_flagship_checkpointed(
        corpus, work, drop_broadcast_threshold=thr
    )
    n = triples.count()
    wall = time.time() - t0
    dropset = {}
    dp = os.path.join(work, "dropset.json")
    if os.path.exists(dp):
        dropset = json.load(open(dp))
    cnt, dig = triples_digest(os.path.join(work, "triples"))
    with open(out, "w") as f:
        json.dump(
            {
                "mode": mode, "wall_sec": round(wall, 1), "n_triples": n,
                "digest": dig, "digest_rows": cnt, "dropset": dropset,
                "cpus": cpus,
            },
            f,
        )
    ray.shutdown()


def spawn_run(corpus, work, mode, cpus, out):
    # child stderr tees to a per-run log so a failed rehearsal surfaces
    # its actual traceback instead of dying as FileNotFoundError on the
    # missing result file
    log = open(out + ".log", "w")
    return subprocess.Popen(
        [
            sys.executable, os.path.abspath(__file__), "--phase", "run",
            "--corpus", corpus, "--work", work, "--mode", mode,
            "--cpus", str(cpus), "--out", out,
        ],
        stdout=log, stderr=subprocess.STDOUT,
        # own process group so kill -9 takes Ray's raylet tree with it
        preexec_fn=os.setsid,
    )


def load_result(p: subprocess.Popen, out: str) -> dict:
    if p.returncode != 0 or not os.path.exists(out):
        tail = ""
        if os.path.exists(out + ".log"):
            tail = open(out + ".log").read()[-4000:]
        raise RuntimeError(
            f"rehearsal child failed (rc={p.returncode}); log tail:\n{tail}"
        )
    return json.load(open(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--phase", default="all")
    ap.add_argument("--mode", default="exchange")
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--work", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--kill-after", type=float, default=None,
        help="seconds before SIGKILL in the resume phase (default: "
        "45%% of the exchange run's wall)",
    )
    args = ap.parse_args()

    if args.phase == "run":
        phase_run(args.corpus, args.work, args.mode, args.cpus, args.out)
        return

    from sociallink_ray.fixtures import corpus_dir_for

    corpus = args.corpus or corpus_dir_for(args.sf)
    root = f"/tmp/slr_rehearsal_sf{args.sf}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    results = {}

    for mode in ("exchange", "broadcast"):
        work = os.path.join(root, f"work_{mode}")
        out = os.path.join(root, f"{mode}.json")
        p = spawn_run(corpus, work, mode, args.cpus, out)
        p.wait()
        results[mode] = load_result(p, out)
        print(json.dumps({mode: results[mode]}), flush=True)

    # ---- kill -9 mid-run, then resume in a fresh process --------------
    work = os.path.join(root, "work_resume")
    out1 = os.path.join(root, "resume_attempt.json")
    kill_after = (
        args.kill_after if args.kill_after is not None
        else 0.45 * results["exchange"]["wall_sec"]
    )
    p = spawn_run(corpus, work, "exchange", args.cpus, out1)
    time.sleep(kill_after)
    killed_mid_run = p.poll() is None
    if killed_mid_run:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    stages_done = [
        d for d in sorted(os.listdir(work))
        if os.path.exists(os.path.join(work, d, "_MANIFEST.json"))
    ] if os.path.isdir(work) else []
    out2 = os.path.join(root, "resume_final.json")
    t0 = time.time()
    p2 = spawn_run(corpus, work, "exchange", args.cpus, out2)
    p2.wait()
    resume_wall = time.time() - t0
    resumed = load_result(p2, out2)
    identical = (
        resumed["digest"] == results["exchange"]["digest"]
        and resumed["n_triples"] == results["exchange"]["n_triples"]
    )
    summary = {
        "sf": args.sf,
        "cpus": args.cpus,
        "exchange_wall_sec": results["exchange"]["wall_sec"],
        "broadcast_wall_sec": results["broadcast"]["wall_sec"],
        "n_triples": results["exchange"]["n_triples"],
        "dropset_exchange": results["exchange"]["dropset"],
        "dropset_broadcast": results["broadcast"]["dropset"],
        "killed_mid_run": killed_mid_run,
        "kill_after_sec": round(kill_after, 1),
        "stages_complete_at_kill": stages_done,
        "resume_wall_sec": round(resume_wall, 1),
        "resume_triples_identical": identical,
    }
    print(json.dumps(summary), flush=True)
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Compare two BENCH_r{N}.json files and flag per-query regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Prints queries slower than threshold x old (regressions), faster than
1/threshold (wins), and entries appearing/disappearing — the
round-over-round perf gate the full-catalog bench makes possible
(every catalog query has a timing row since round 4)."""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    def queries_of(d: dict) -> dict:
        # driver BENCH_r{N}.json wraps the bench line under "parsed"
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        return d.get("queries", d)

    oq = queries_of(old)
    nq = queries_of(new)
    t = args.threshold

    reg, win = [], []
    for k in sorted(set(oq) & set(nq)):
        a, b = float(oq[k]), float(nq[k])
        if a <= 0:
            continue
        r = b / a
        if r > t:
            reg.append((r, k, a, b))
        elif r < 1 / t:
            win.append((r, k, a, b))
    for r, k, a, b in sorted(reg, reverse=True):
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    for r, k, a, b in sorted(win):
        print(f"win        {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"dropped queries ({len(gone)}): {', '.join(gone)}")
    print(
        f"summary: {len(reg)} regressions > {t}x, {len(win)} wins, "
        f"{len(set(oq) & set(nq))} shared"
    )
    return 1 if reg else 0


if __name__ == "__main__":
    raise SystemExit(main())

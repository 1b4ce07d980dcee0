"""Grouped JSON result dumps — the reference's JSON result-writer
family (output/JSONResultWriter.java:17-56: a gzip JSON array of
``{resource_id, uid, candidates: [{uid, score}, ...]}`` objects;
output/PrettyJSONResultWriter.java:14-23: same with pretty printing;
output/CSVResultWriter.java: the flat form) re-expressed as a
resource-bucketed exchange whose reduce tasks each write their own
gzip part file — the dump stays distributed instead of one driver
loop, so it works at any corpus size."""

from __future__ import annotations

import gzip
import json
import os
import uuid

import pandas as pd
from ray.data import Dataset

from ..stages import ops


def grouped_records(df: pd.DataFrame) -> list[dict]:
    """One JSONResultWriter.write() record per resource: the selected
    alignment uid (null when nothing cleared selection — the
    reference passes trueUid=null the same way) plus every candidate
    (uid, score) in rank order."""
    out = []
    for rid, g in df.sort_values(
        ["resource_id", "rank"], kind="mergesort"
    ).groupby("resource_id", sort=False):
        sel = g.loc[g["is_alignment"], "uid"]
        out.append(
            {
                "resource_id": rid,
                "uid": int(sel.iloc[0]) if len(sel) else None,
                "candidates": [
                    {"uid": int(r.uid), "score": float(r.score)}
                    for r in g.itertuples(index=False)
                ],
            }
        )
    return out


def write_grouped_json(
    selected: Dataset, out_dir: str, pretty: bool = False
) -> pd.DataFrame:
    """Distributed grouped-JSON sink: co-partition the scored candidate
    table by resource_id (one exchange — every candidate row of a
    resource lands in the same reduce task), then each reduce task
    writes one ``part-*.json.gz`` holding a JSON array of its
    resources' records. Concatenating the parts' arrays reproduces the
    reference's single-array file; keeping them per-task is the S3
    per-task file-sink shape (resumable, no driver collect). Returns
    the (path, rows) manifest. Stale ``part-*.json.gz`` from a prior
    run into the same directory are removed first — the uuid part
    names would otherwise accumulate and ``read_grouped_json`` would
    merge old records with new ones."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".json.gz"):
            os.unlink(os.path.join(out_dir, name))
    indent = 1 if pretty else None

    def dump_part(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": [], "rows": []})
        recs = grouped_records(df)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.json.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            json.dump(recs, f, indent=indent)
        return pd.DataFrame({"path": [path], "rows": [len(recs)]})

    return ops.bucketed_group_apply(
        selected.select_columns(
            ["resource_id", "uid", "score", "rank", "is_alignment"]
        ),
        ["resource_id"],
        dump_part,
    ).to_pandas()


def read_grouped_json(out_dir: str) -> list[dict]:
    """Load a grouped dump back (all parts, resource_id order)."""
    recs: list[dict] = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json.gz"):
            with gzip.open(os.path.join(out_dir, name), "rt") as f:
                recs.extend(json.load(f))
    return sorted(recs, key=lambda r: r["resource_id"])

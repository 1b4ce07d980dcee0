"""Stage checkpoint manifests — the engine's replacement for the
reference's resume machinery (resolved-chunk index scan,
ProcessDataset.java:109-162; the ``alignments.version`` state machine,
ScoreEntities.java:92-156).

Every materialized stage is a directory of parquet part files plus a
``_MANIFEST.json`` recording the input fingerprint, row count and
wall time. A rerun with the same fingerprint short-circuits to
``read_parquet`` on the existing directory — per-stage, so a killed
pipeline resumes from the last completed stage. Writes go to a temp
dir first and are renamed into place (atomic on one filesystem), so a
partial write never validates.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray.data as rd

MANIFEST = "_MANIFEST.json"


def fingerprint(obj) -> str:
    """Stable fingerprint of a stage's input description (paths, params)."""
    import hashlib

    return hashlib.sha1(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def stage_valid(stage_dir: str, fp: str) -> bool:
    path = os.path.join(stage_dir, MANIFEST)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
        return m.get("fingerprint") == fp and m.get("complete") is True
    except (json.JSONDecodeError, OSError):
        return False


def checkpoint_stage(
    stage_dir: str,
    fp: str,
    producer: Callable[[], "rd.Dataset"],
    partition_cols: list[str] | None = None,
) -> "rd.Dataset":
    """Run ``producer`` and persist its Dataset to ``stage_dir`` unless a
    valid checkpoint for the same fingerprint already exists; returns a
    Dataset reading the stage directory either way."""
    if stage_valid(stage_dir, fp):
        return rd.read_parquet(os.path.join(stage_dir, "data"))
    tmp = stage_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    t0 = time.time()
    ds = producer()
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    ds.write_parquet(os.path.join(tmp, "data"), **kwargs)
    out = rd.read_parquet(os.path.join(tmp, "data"))
    n = out.count()
    # per-partition lineage: every written part file with its row count
    # (a rerun can skip / re-verify individual partitions)
    import pyarrow.parquet as _pq

    partitions = []
    data_dir = os.path.join(tmp, "data")
    for root, _dirs, files in os.walk(data_dir):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                partitions.append(
                    {
                        "file": os.path.relpath(p, data_dir),
                        "rows": _pq.ParquetFile(p).metadata.num_rows,
                        "bytes": os.path.getsize(p),
                    }
                )
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(
            {
                "fingerprint": fp,
                "complete": True,
                "rows": n,
                "wall_sec": round(time.time() - t0, 3),
                "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "partitions": partitions,
            },
            f,
            indent=1,
        )
    os.rename(tmp, stage_dir)
    return rd.read_parquet(os.path.join(stage_dir, "data"))

"""NTriples rendering of the triples table (the S9 sink,
rdf/RDFExporter.java:145-203 re-expressed as a stateless map_batches
string-format + per-block gzip-able text files)."""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def _term(t: str) -> str:
    if t.startswith("_:"):
        return t
    if t.startswith("http://") or t.startswith("https://"):
        return f"<{t}>"
    # N-Triples STRING_LITERAL_QUOTED excludes 0x22 0x5C 0x0A 0x0D
    escaped = (
        t.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r")
    )
    return f'"{escaped}"'


def to_ntriples_lines(df: pd.DataFrame) -> pd.DataFrame:
    lines = [
        f"{_term(s)} {_term(p)} {_term(o)} ."
        for s, p, o in zip(df["subj"], df["pred"], df["obj"])
    ]
    return pd.DataFrame({"line": lines})


def write_ntriples(triples: Dataset, out_dir: str) -> "pd.DataFrame":
    """Distributed NT writer: each task writes its own part file
    (the reference's ``name-i-n`` per-task file sink,
    index/sink/PostgresFileSink.java:50-96; its gzip NT export forced
    parallelism 1 — per-block files keep the sink distributed).
    Returns the written-file manifest (path, rows)."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        lines = to_ntriples_lines(df)["line"]
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.nt")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if len(lines) else ""))
        return pd.DataFrame({"path": [path], "rows": [len(lines)]})

    return (
        triples.map_batches(write_block, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )


def render_ntriples_sample(triples: Dataset, n: int = 5) -> str:
    df = triples.limit(n * 8).to_pandas()
    return "\n".join(to_ntriples_lines(df)["line"].head(n))

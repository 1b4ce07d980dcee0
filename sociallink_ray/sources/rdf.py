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
    escaped = t.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    return f'"{escaped}"'


def to_ntriples_lines(df: pd.DataFrame) -> pd.DataFrame:
    lines = [
        f"{_term(s)} {_term(p)} {_term(o)} ."
        for s, p, o in zip(df["subj"], df["pred"], df["obj"])
    ]
    return pd.DataFrame({"line": lines})


def write_ntriples(triples: Dataset, out_dir: str) -> None:
    """Distributed NT writer: one text part-file per block (the
    reference's single gzip writer forced parallelism 1; per-block files
    keep the sink distributed)."""
    triples.map_batches(to_ntriples_lines, batch_format="pandas").write_csv(
        out_dir, include_header=False
    )


def render_ntriples_sample(triples: Dataset, n: int = 5) -> str:
    df = triples.limit(n * 8).to_pandas()
    return "\n".join(to_ntriples_lines(df)["line"].head(n))

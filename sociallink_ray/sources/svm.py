"""libsvm-format feature dump (the S11 sink,
profiling/GroupAndExtractFeatures.java:385-397: one ``<label>
idx:val idx:val ...`` line per row, sparse 1-based indices, zeros
skipped — ``user.name + " " + svm_node.toString(vector
.toSvmNodeArray())``), re-expressed as a stateless map_batches
formatter + per-block part-file sink."""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def to_svm_lines(
    df: pd.DataFrame, label_col: str, feature_cols: list[str]
) -> pd.DataFrame:
    """Format rows as libsvm lines. Zero-valued features are omitted
    (sparse svm_node semantics); indices are 1-based positions in
    ``feature_cols``."""
    X = df[feature_cols].to_numpy(dtype=np.float64)
    labels = df[label_col].astype(str).to_numpy()
    lines = []
    for r in range(len(df)):
        nz = np.nonzero(X[r])[0]
        lines.append(
            labels[r]
            + " "
            + " ".join(f"{j + 1}:{X[r, j]:.6g}" for j in nz)
        )
    return pd.DataFrame({"line": lines})


def write_svm(
    features: Dataset, out_dir: str, label_col: str,
    feature_cols: list[str],
) -> pd.DataFrame:
    """Distributed SVM-format writer: each task writes its own part
    file (same per-task sink shape as ``write_ntriples``). Returns the
    written-file manifest (path, rows)."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        lines = to_svm_lines(df, label_col, feature_cols)["line"]
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.svm")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if len(lines) else ""))
        return pd.DataFrame({"path": [path], "rows": [len(lines)]})

    return (
        features.map_batches(
            write_block, batch_format="pandas", batch_size=65536
        ).to_pandas()
    )

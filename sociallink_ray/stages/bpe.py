"""Trained BPE tokenizer: distributed corpus word histogram -> driver
merge-rule training over the (vocabulary-sized) histogram -> actor-pool
encode stage with the merge table broadcast once.

This is the Sennrich et al. 2016 (arXiv:1508.07909) algorithm with the
standard scale split every production tokenizer trainer uses: the
corpus-scale work (tokenize + count every word occurrence) is a
distributed combiner + one small groupby-sum exchange, while the merge
loop runs over the WORD HISTOGRAM — whose size is the vocabulary (a
dimension table, Zipf-capped at ``top_k`` types), not the corpus. At
100 TB the histogram for a 50k-type cap is a few MB on the driver; no
per-document data ever leaves the cluster.

Encoding is the inverse deployment shape: merges ship once via
``ray.put`` (fetched per worker through ``ops.cached_get``), each
worker memoizes word -> token-count so the Zipf head is encoded once
per actor, not once per occurrence.

The reference has no tokenizer training (its dictionaries are plain
frequency cuts — vectorize/text/Dictionary.java); this is
new-scope training-data-pipeline machinery like the curation ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from . import ops
from .curate import ws_tokens

# end-of-word sentinel (Sennrich's </w>): distinguishes "est</w>" in
# "smallest" from "est" inside "establish"
_EOW = "</w>"


# --------------------------------------------------------------------------
# 1. distributed word histogram
# --------------------------------------------------------------------------


def word_histogram(
    ds: Dataset, text_col: str, top_k: int = 50_000
) -> pd.DataFrame:
    """Exact corpus word-type histogram, truncated to the ``top_k`` most
    frequent types (ties broken by word asc for determinism). Per-batch
    ``np.unique`` combiners collapse each batch to its local types
    before the single word-keyed groupby-sum exchange — the exchange
    carries type rows, not token occurrences."""

    def local(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch[text_col].to_pylist():
            words.extend(ws_tokens(t))
        if not words:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "count": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(uniq, pa.string()),
             "count": pa.array(counts, pa.int64())}
        )

    partial = ds.map_batches(local, batch_format="pyarrow")
    agg = ops.partial_groupby_sum(partial, ["word"], sums={"count": "count"})

    # distributed top-k truncation BEFORE the driver sees anything: the
    # raw type table is NOT vocabulary-bounded at corpus scale (URLs,
    # typos, numbers — billions of types on a web crawl). Each exchange
    # output block keeps its local top_k (exact: any global top-k row
    # is in its own block's top-k, since blocks partition by word), so
    # the driver concatenates at most n_blocks x top_k rows.
    def local_topk(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(
                ["count", "word"], ascending=[False, True], kind="stable"
            ).head(top_k),
            preserve_index=False,
        )

    hist = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    hist = hist.sort_values(
        ["count", "word"], ascending=[False, True], kind="stable"
    ).head(top_k)
    return hist.reset_index(drop=True)


# --------------------------------------------------------------------------
# 2. merge-rule training (driver, histogram-sized)
# --------------------------------------------------------------------------


def train_bpe(
    hist: pd.DataFrame, num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a (word, count) histogram —
    the classic weighted-pair greedy loop with INCREMENTAL pair-count
    maintenance (only words containing the merged pair are re-scanned
    per iteration; a full recount would be O(types x merges)).
    Deterministic: best pair by (count desc, pair lexicographic asc)."""
    words: list[list[str]] = [
        list(w) + [_EOW] for w in hist["word"].astype(str)
    ]
    freqs = hist["count"].to_numpy(np.int64)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + int(f)
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # best pair by (count desc, pair lexicographic asc), in two
        # passes — a single max() key can't express "desc count, asc
        # variable-length string" without inverting the string
        top = max(pair_counts.values())
        if top <= 0:
            break
        pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(pair)
        new_sym = pair[0] + pair[1]
        touched = pair_words.pop(pair, set())
        pair_counts.pop(pair, None)
        for wi in touched:
            syms = words[wi]
            f = int(freqs[wi])
            # remove this word's contribution to all its current pairs
            for p in zip(syms, syms[1:]):
                if p in pair_counts:
                    pair_counts[p] -= f
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
                        if not s:
                            del pair_words[p]
            # apply the merge within the word
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # add back the new contribution
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {p: i for i, p in enumerate(merges)}


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word by rank order (lowest-rank pair
    first — the standard BPE inference loop)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# --------------------------------------------------------------------------
# 3. distributed encode (actor-pool shape)
# --------------------------------------------------------------------------


class BpeEncodeStage:
    """Callable-class ``map_batches`` stage: merge table fetched ONCE
    per actor in ``__init__`` (broadcast via ``ray.put``), word ->
    token-count memoized per actor so each Zipf-head type is encoded
    once per worker, not once per occurrence."""

    def __init__(self, merges_ref, id_col: str, text_col: str):
        self.ranks = merge_ranks(ops.cached_get(merges_ref))
        self.id_col = id_col
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self.cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            sum(self._word_len(w) for w in ws_tokens(t))
            for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )


def bpe_token_counts(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_merges: int = 200,
    top_k: int = 50_000,
    concurrency: int | None = None,
) -> tuple[Dataset, list[tuple[str, str]]]:
    """Train BPE on ``ds`` and encode it: returns (per-doc
    ``(id_col, n_bpe_tokens)`` dataset, learned merge list). One
    distributed histogram pass + one distributed encode pass; the merge
    loop is histogram-sized driver work by algorithm design."""
    hist = word_histogram(ds, text_col, top_k)
    merges = train_bpe(hist, num_merges)
    merges_ref = ray.put(merges)
    out = ds.map_batches(
        BpeEncodeStage,
        fn_constructor_args=(merges_ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
    return out, merges

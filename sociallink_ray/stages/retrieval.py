"""BM25 full-text top-k retrieval over a document table.

New scope vs the reference (its fulltext lookup is a Postgres GIN
``ts_rank``-free Σfreq query, ``alignments/.../index/FillFromIndex.java:88-97``;
this operator gives the engine a real ranked-retrieval primitive for
training-data selection). Standard published scoring: Robertson &
Spärck Jones / Robertson et al. Okapi BM25 (TREC-3, 1994) with the
Lucene-style non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Shape (two passes, both streaming — BM25 inherently needs corpus
statistics before it can score):

1. **stats pass** — one ``map_batches`` over the corpus computes, per
   batch, the df of each *query* term (never the full vocabulary), the
   doc count and the total token count. The per-batch partials are
   #terms+1 rows each; the driver folds them (bounded by
   blocks × terms, independent of corpus size).
2. **score pass** — idf/avgdl broadcast once (``ray.put``); every batch
   tokenizes vectorized (Arrow ``split_pattern_regex`` + ``index_in``
   against the sorted term list — no Python loop over tokens), builds
   the doc×term tf matrix with one ``np.add.at``, scores all queries
   with one matmul, and emits a per-batch partial top-k. The final
   per-query top-k is a tiny ``groupby(query_id).map_groups``.

At 100 TB both passes stream block-by-block; only
O(queries × k × blocks) candidate rows ever shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from . import ops

K1 = 1.2
B = 0.75


def _tokenize_batch(texts: pa.ChunkedArray | pa.Array, lower: bool = True):
    """Vectorized whitespace tokenization (lowercased by default).
    Returns ``(doc_of, flat, dl)``: token→doc index, flat token array
    and per-doc non-empty token counts (matching DuckDB
    ``list_filter(regexp_split_to_array([lower(]text[)], '\\s+'), x -> x <> '')``)."""
    s = pc.cast(texts, pa.string())
    if lower:
        s = pc.utf8_lower(s)
    lists = pc.split_pattern_regex(s, r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    n = len(lists)
    offsets = lists.offsets.to_numpy()
    flat = lists.values
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_of = doc_of[nonempty]
    flat = flat.filter(pa.array(nonempty))
    dl = np.bincount(doc_of, minlength=n).astype(np.float64)
    return doc_of, flat, dl


def _tf_matrix(doc_of, flat, n_docs, terms_arr):
    """doc×term tf counts for the query vocabulary only."""
    idx = pc.index_in(flat, value_set=terms_arr)
    idx_np = idx.to_numpy(zero_copy_only=False)
    hit = ~np.isnan(idx_np)
    tf = np.zeros((n_docs, len(terms_arr)), dtype=np.float64)
    if hit.any():
        np.add.at(tf, (doc_of[hit], idx_np[hit].astype(np.int64)), 1.0)
    return tf


def corpus_stats(ds: Dataset, text_col: str, terms: list[str]) -> dict:
    """One streaming pass: df per query term + doc count + total token
    count. Per-batch partials are (len(terms)+1)-row tables; the fold
    is driver-side but bounded by blocks × terms."""
    terms_arr = pa.array(terms, pa.string())
    terms_ref = ray.put(terms_arr)

    def part(batch: pa.Table) -> pa.Table:
        tarr = ops.cached_get(terms_ref)
        doc_of, flat, dl = _tokenize_batch(batch[text_col])
        tf = _tf_matrix(doc_of, flat, len(batch), tarr)
        df = (tf > 0).sum(axis=0).astype("int64")
        return pa.table(
            {
                "term": pa.concat_arrays([tarr, pa.array([""], pa.string())]),
                "df": pa.array(np.append(df, 0), pa.int64()),
                "n_docs": pa.array(
                    np.append(np.zeros(len(tarr), np.int64), len(batch))
                ),
                "tot_len": pa.array(
                    np.append(np.zeros(len(tarr), np.int64), int(dl.sum()))
                ),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    tot_len = int(parts["tot_len"].sum())
    df = parts[parts["term"] != ""].groupby("term", sort=False)["df"].sum()
    return {
        "df": {t: int(df.get(t, 0)) for t in terms},
        "n_docs": n_docs,
        "avgdl": (tot_len / n_docs) if n_docs else 1.0,
    }


def bm25_topk(
    ds: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    round_decimals: int = 5,
) -> Dataset:
    """Okapi BM25 top-k per query. ``queries`` has columns
    ``(query_id:int64, query:string)``; each query is a bag of distinct
    lowercase terms. Returns ``(query_id, doc_id, score, rank)`` with
    rank 1..k by score desc, ties broken by doc id asc. Scores are
    rounded BEFORE ranking so the order is stable against float noise
    (same convention as ``ann_brute_force``)."""
    qids = queries["query_id"].to_numpy().astype(np.int64)
    qterms = [sorted(set(q.lower().split())) for q in queries["query"]]
    terms = sorted({t for ts in qterms for t in ts})
    t_index = {t: i for i, t in enumerate(terms)}

    stats = corpus_stats(ds, text_col, terms)
    n, avgdl = stats["n_docs"], stats["avgdl"]
    dfv = np.array([stats["df"][t] for t in terms], dtype=np.float64)
    idf = np.log1p((n - dfv + 0.5) / (dfv + 0.5))

    qmat = np.zeros((len(qids), len(terms)), dtype=np.float64)
    for qi, ts in enumerate(qterms):
        for t in ts:
            qmat[qi, t_index[t]] = 1.0

    terms_arr = pa.array(terms, pa.string())
    ref = ray.put((terms_arr, idf, qmat, qids, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        tarr, bidf, bq, bqids, bavg = ops.cached_get(ref)
        ids = batch[id_col].to_numpy()
        doc_of, flat, dl = _tokenize_batch(batch[text_col])
        tf = _tf_matrix(doc_of, flat, len(batch), tarr)
        norm = k1 * (1.0 - b + b * dl / bavg)
        contrib = bidf * tf * (k1 + 1.0) / (tf + norm[:, None])
        scores = contrib @ bq.T  # n×q
        out_q, out_id, out_s = [], [], []
        kk = min(k, scores.shape[0])
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk]
            idx = idx[col[idx] > 0.0]
            out_q.extend([bqids[qi]] * len(idx))
            out_id.extend(ids[idx])
            out_s.extend(col[idx])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "doc_id": pd.Series(out_id, dtype="int64"),
                "score": pd.Series(out_s, dtype="float64"),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = df["score"].round(round_decimals)
        return df[df["score"] > 0.0]

    return ops.grouped_topk_rank(
        partial, "query_id", ["score"], "doc_id", k, pre=pre
    )


def rrf_fuse(
    rankings: list[Dataset],
    k: int = 10,
    c: int = 60,
    round_decimals: int = 6,
) -> Dataset:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
    2009): fused(q, d) = Σ over rankers r of 1 / (c + rank_r(q, d))
    for the (q, d) pairs present in r's top list; output the fused
    top-k per query as (query_id, doc_id, rrf, rank). The canonical
    hybrid-retrieval combiner — rank-only fusion, so a BM25 ranker and
    an embedding-cosine ranker need no score calibration.

    Inputs are ranker outputs with columns (query_id, doc_id, rank)
    (extra columns ignored). Distribution: per-ranker contribution is
    a pure map, the Σ is one combiner groupby on (query_id, doc_id)
    (each ranker's list is top-k-sized, so this exchange is
    queries x k x rankers rows — tiny relative to the rankers' own
    scans), and the final per-query cut is one bucketed apply."""
    import ray.data as rd

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "doc_id": batch["doc_id"],
                "contrib": 1.0 / (c + r),
            }
        )

    parts = [
        r.map_batches(contrib, batch_format="pyarrow") for r in rankings
    ]
    u = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    summed = ops.partial_groupby_sum(
        u, ["query_id", "doc_id"], sums={"contrib": "rrf"}
    )

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rrf"] = df["rrf"].round(round_decimals)
        return df

    return ops.grouped_topk_rank(
        summed, "query_id", ["rrf"], "doc_id", k, pre=pre
    )

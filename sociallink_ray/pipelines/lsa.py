"""True LSA projection — the "big read-only model per actor" stage.

Reference semantics (alignments/src/main/java/eu/fbk/fm/profiling/
extractors/LSA/LSM.java:96-125): a pre-trained truncated-SVD term
matrix ``Uk`` (|vocab| x k) is loaded ONCE per worker; each document's
bag-of-words is weighted ``log2(1 + tf) * idf(term)`` and projected
``v = Uk^T x``, then L2-normalized. Out-of-vocabulary terms are
ignored (LSM.java lookups miss silently).

Ray-Data-first shape (SURVEY T1):

- **fit** is a distributed document-frequency pass (the same combiner
  as the BOW idf table) that fixes vocab + idf, followed by a
  deterministic hash-sample of documents whose term-doc matrix trains
  the truncated SVD on the driver (sample x cap(vocab) — bounded, the
  standard LSA recipe; the full corpus never materializes). The SVD
  runs in sample space: eigendecompose the docs x docs Gram matrix
  (cheap), then lift to term space ``Q = A^T P S^-1`` — never a
  |vocab| x |vocab| object.
- **embed** broadcasts the model via ``ray.put`` ONCE and projects in
  an actor-pool ``map_batches`` stage: the token->row dict and ``Uk``
  are built in ``__init__`` (once per actor — the whole point of T1),
  and each batch is one factorize + one ``np.add.at`` scatter-matmul,
  no per-row Python vector math.

At 100 TB the model is the only dense object (vocab-capped, ~a few
hundred MB at k=100) and rides the object store to every actor; the
document stream stays streaming.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .align import build_idf

# Knuth multiplicative hash — deterministic doc sampling independent of
# block order.
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _tokenize(text: str) -> list[str]:
    return str(text).lower().split()


def _doc_hash64(ids: np.ndarray) -> np.ndarray:
    h = (ids.astype(np.uint64) + np.uint64(1)) * _MIX
    h ^= h >> np.uint64(33)
    return h


def _sample_docs(
    docs: Dataset, id_col: str, text_col: str, k: int
) -> pd.DataFrame:
    """The ``k`` docs with the globally smallest id-hash — a uniform
    without-replacement sample that is deterministic, block-layout- and
    cluster-size-invariant, and (unlike a ``hash < k/n`` rule) needs no
    corpus count, so it runs CONCURRENTLY with the idf pass. Per-block
    partial top-k keeps driver traffic at k rows per block."""

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = _doc_hash64(np.asarray(ids, dtype=np.int64))
        if len(h) > k:
            keep = np.sort(np.argpartition(h, k)[:k])
            batch = batch.take(pa.array(keep))
            h = h[keep]
        return batch.append_column("_h", pa.array(h, pa.uint64()))

    parts = (
        docs.select_columns([id_col, text_col])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    parts = parts.sort_values(["_h", id_col], kind="mergesort").head(k)
    return parts.drop(columns="_h").sort_values(id_col, kind="mergesort")


@dataclass
class LSAModel:
    tokens: np.ndarray  # (V,) object — vocab, sorted for determinism
    idf: np.ndarray     # (V,) float64, aligned to tokens
    Uk: np.ndarray      # (V, k) float32 term projection matrix

    @property
    def dim(self) -> int:
        return self.Uk.shape[1]


def segment_project(
    d: np.ndarray, r: np.ndarray, w: np.ndarray, W: np.ndarray, n_docs: int
) -> np.ndarray:
    """``out[doc] = Σ_j W[r_j] * w_j`` over ``_bow_weights`` triples.
    ``d`` is sorted (one contiguous run per doc), so a reduceat segment
    sum is ~10x ``np.add.at``'s per-element scatter. Shared by the LSA
    embed stage and the wemb text projection — one kernel, one place
    to fix."""
    out = np.zeros((n_docs, W.shape[1]), dtype=np.float64)
    if len(d):
        vals = W[r] * w[:, None]
        firsts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        out[d[firsts]] = np.add.reduceat(vals, firsts, axis=0)
    return out


def _bow_weights(
    texts: list[str], tok2row: dict[str, int], idf: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_idx, term_row, weight) triples for a batch of texts, with
    weight = log2(1 + tf) * idf. Tokenize + factorize run in Arrow C++
    (utf8_lower -> whitespace split -> dictionary_encode; Arrow's
    split emits empty strings around leading/trailing whitespace, but
    "" is never a vocab token so those drop through the OOV mask —
    the surviving (doc, term, tf) triples are identical to the Python
    ``str.lower().split()`` path); one unique over (doc, code) pairs
    gives per-doc tf — no per-doc Python dict building."""
    arr = pa.array([str(t) for t in texts], type=pa.string())
    toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    if lens.sum() == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.float64)
    enc = pc.list_flatten(toks).dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = enc.dictionary.to_pylist()
    # map batch-local token codes -> vocab rows (-1 = OOV, dropped)
    urow = np.fromiter(
        (tok2row.get(t, -1) for t in uniques), dtype=np.int64,
        count=len(uniques),
    )
    docs = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    kr = urow[codes]
    keep = kr >= 0
    docs, kr = docs[keep], kr[keep]
    if len(docs) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.float64)
    # per-(doc, term) tf over the vocab-mapped key: a bincount when the
    # (docs x V) key space is small (5-10x the sort-based unique),
    # sort-unique otherwise
    V = np.int64(max(len(tok2row), 1))
    key = docs * V + kr
    if len(texts) * int(V) <= 16_000_000:
        cnt = np.bincount(key, minlength=len(texts) * int(V))
        idx = np.flatnonzero(cnt)
        d, r, tf = idx // V, idx % V, cnt[idx]
    else:
        ukey, tf = np.unique(key, return_counts=True)
        d, r = ukey // V, ukey % V
    w = np.log2(1.0 + tf.astype(np.float64)) * idf[r]
    return d, r, w


def fit_lsa(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 100,
    vocab_cap: int = 8192,
    sample: int = 1024,
) -> LSAModel:
    """Fit vocab + idf distributed, then the truncated SVD on a
    deterministic hash-sample of documents (driver-side, bounded by
    ``sample`` x ``vocab_cap``). The idf pass and the sample pass are
    independent full scans, so they run overlapped on driver threads —
    the fit costs one scan of wall, not two."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_idf = pool.submit(
            build_idf, docs.select_columns([text_col]), text_col
        )
        f_samp = pool.submit(_sample_docs, docs, id_col, text_col, sample)
        idf_map = f_idf.result()
        samp = f_samp.result()

    # vocab cap keeps the model bounded: keep the most frequent terms
    # (lowest idf), ties broken lexicographically for determinism
    items = sorted(idf_map.items(), key=lambda kv: (kv[1], kv[0]))[:vocab_cap]
    tokens = np.asarray(sorted(t for t, _ in items), dtype=object)
    tok2row = {t: i for i, t in enumerate(tokens)}
    idf = np.asarray([idf_map[t] for t in tokens], dtype=np.float64)

    # dense sample term-doc matrix A (n x V) — bounded by design
    d, r, w = _bow_weights(list(samp[text_col]), tok2row, idf)
    n = len(samp)
    A = np.zeros((max(n, 1), len(tokens)), dtype=np.float64)
    np.add.at(A, (d, r), w)

    k = min(dim, A.shape[0], A.shape[1])
    # Gram-matrix SVD: eig(A A^T) is n x n; lift to term space
    G = A @ A.T
    evals, P = np.linalg.eigh(G)          # ascending
    order = np.argsort(evals)[::-1][:k]
    s = np.sqrt(np.clip(evals[order], 1e-12, None))
    Q = (A.T @ P[:, order]) / s           # (V, k) term-space basis
    # deterministic sign: largest-|.| entry of each component positive
    signs = np.sign(Q[np.argmax(np.abs(Q), axis=0), np.arange(k)])
    signs[signs == 0] = 1.0
    Q *= signs
    return LSAModel(tokens=tokens, idf=idf, Uk=Q.astype(np.float32))


class LSAEmbedStage:
    """Actor-pool projection stage: model fetched from the object store
    and indexed ONCE per actor in ``__init__``; ``__call__`` is one
    scatter-matmul per batch."""

    def __init__(self, model: LSAModel, text_col: str, id_col: str):
        self.tok2row = {t: i for i, t in enumerate(model.tokens)}
        self.idf = model.idf
        self.Uk = model.Uk.astype(np.float64)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        d, r, w = _bow_weights(texts, self.tok2row, self.idf)
        out = segment_project(d, r, w, self.Uk, len(texts))
        norms = np.linalg.norm(out, axis=1)
        nz = norms > 0
        out[nz] /= norms[nz, None]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lsa": pa.array(
                    list(np.round(out, 5).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
                "lsa_norm": pa.array(
                    np.where(nz, 1.0, 0.0), pa.float64()
                ),
            }
        )


def embed_lsa(
    docs: Dataset,
    model: LSAModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
) -> Dataset:
    """Project every document through the broadcast LSA model (actor
    constructor args ride the object store once — not re-shipped per
    batch)."""
    return docs.select_columns([id_col, text_col]).map_batches(
        LSAEmbedStage,
        fn_constructor_args=(model, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

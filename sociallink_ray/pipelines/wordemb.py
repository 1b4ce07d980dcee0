"""Trained word-embedding subspace from co-occurrence factorization.

The reference wires TRAINED embedding vectors into the scorer as their
own subspace (scorer/PAI18Strategy.java:71-97: emb_kb200_rdf2vec_w /
emb_sg300_w matrices served by scorer/embeddings/
EmbeddingsProvider.java:84-151 and scored by cosine). The engine's
analogue trains term vectors by factorizing the windowed co-occurrence
matrix the vectorize pipeline already aggregates (A9,
PopulateCooccurrenceMatrix.java:70-114) — the classic counts->SVD
embedding (Levy & Goldberg 2014's explicit-matrix factorization view
of word2vec) — and scores each candidate pair as
cosine(entity-abstract vector, account-text vector).

Ray shape:

- **train**: vocab + aggregated (left, right, weight) pairs come from
  ``cooccurrence`` (combiner groupby — one exchange). The truncated
  SVD is a RANDOMIZED two-wave range-finder over the aggregated pair
  blocks: wave 1 accumulates ``Y = (M + M^T) Omega`` as per-block
  scatter partials (tasks; driver holds only V x m), driver QR gives
  the basis Q; wave 2 accumulates ``B = Q^T (M + M^T)`` the same way;
  a dense SVD of the small ``m x V`` B lifts to term vectors
  ``W = Q U sqrt(s)`` (Halko/Martinsson/Tropp 2011). Pair weights are
  ``log1p`` damped. V is vocab-capped, so every driver object is
  dimension-sized — the pair table itself never leaves the store.
- **serve**: the model dict broadcasts once; document vectors are one
  factorize + scatter-matmul per batch (``project_texts``, the same
  kernel the sequential oracle calls), L2-normalized so the feature
  cosine is a dot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..stages import ops
from . import cooccurrence as co
from .lsa import _bow_weights


@ray.remote
def _range_partial(tbl: pa.Table, Om: np.ndarray) -> np.ndarray:
    """Per-block ``Y`` partial: each aggregated pair (l, r, w)
    contributes log1p(w) * (e_l Om[r] + e_r Om[l]) — i.e. the block's
    slice of (M + M^T) Omega."""
    l = tbl["left_id"].to_numpy(zero_copy_only=False)
    r = tbl["right_id"].to_numpy(zero_copy_only=False)
    w = np.log1p(tbl["weight"].to_numpy(zero_copy_only=False))
    Y = np.zeros_like(Om)
    np.add.at(Y, l, Om[r] * w[:, None])
    np.add.at(Y, r, Om[l] * w[:, None])
    return Y


def train_word_embeddings(
    texts: Dataset,
    text_col: str = "user_text",
    dim: int = 16,
    vocab_cap: int = 4096,
    window: int = 5,
    min_freq: int = 2,
    oversample: int = 8,
    seed: int = 11,
    max_train_bytes: int = 8 << 20,
) -> dict:
    """Factorize the corpus co-occurrence matrix into ``dim``-d term
    vectors. Returns a JSON-serializable model dict
    ``{"tokens": [...], "W": [[...]], "dim": k}`` with ``W`` rows
    aligned to ``tokens`` (vocab order, freq desc).

    A ``vocab_cap``-term / ``dim``-d model needs a statistics-sized
    corpus, not the whole one: when the text volume exceeds
    ``max_train_bytes``, training runs on a DETERMINISTIC content-hash
    sample (keep iff hash64(text) < p * 2^64, p = budget/total — one
    metadata-cheap byte-sum pass then one filter, fully distributed,
    stable across block layouts and runs). Below the budget the sample
    is the identity, so small-scale tests and the sequential oracle
    see the exact full-corpus model. The 8 MB default (~1.5M tokens,
    ~360 mean occurrences per vocab term at cap 4096) keeps every
    co-occurrence cell well-estimated for a 16-dim factorization while
    bounding the vocab + pair exchanges to seconds regardless of
    corpus scale."""
    # canonicalize to the projection kernel's tokenization (lowercase,
    # any-whitespace split — ``_bow_weights``/``_tokenize``): the A9
    # pipeline splits raw text on single spaces, which would silently
    # mint case-variant / "\n"-glued vocab entries that the serving
    # side could never hit
    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str).str.lower().str.split().str.join(" ")
        # drop empty/whitespace-only rows here: build_vocabulary's
        # single-space split would tokenize "" as [""], minting an
        # empty-string vocab entry that project_texts (str.split) can
        # never emit — it would burn a vocab_cap slot and a W row
        return pd.DataFrame({text_col: s[s.str.len() > 0]})

    # materialized ONCE: the vocab build and the pair exchange both
    # consume it — left lazy, the canon map AND the upstream user_text
    # exchange would re-execute for each
    texts = texts.map_batches(canon, batch_format="pandas").materialize()

    def nbytes(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"b": [int(pc.sum(pc.binary_length(tbl[text_col])).as_py() or 0)]}
        )

    total = sum(
        r["b"]
        for r in texts.map_batches(nbytes, batch_format="pyarrow").take_all()
    )
    if total > max_train_bytes:
        thr = np.uint64(int(max_train_bytes / total * 2**64))

        def samp(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(
                df[text_col].to_numpy(dtype=object),
                hash_key="wemb-sample-key0",  # MUST be exactly 16 bytes
            )
            return df[h < thr]

        texts = texts.map_batches(samp, batch_format="pandas").materialize()
    vocab = co.build_vocabulary(
        texts, text_col, min_freq=min_freq, cap=vocab_cap
    )
    V = len(vocab)
    k = max(1, min(dim, V))
    if V == 0:
        return {"tokens": [], "W": [], "dim": k}
    pairs = co.cooccurrence_pairs(
        texts, text_col, vocab, window=window
    ).materialize()
    refs = pairs.to_arrow_refs()

    m = min(V, k + oversample)
    rng = np.random.default_rng(seed)
    Om = rng.standard_normal((V, m))
    om_ref = ray.put(Om)
    Y = sum(ray.get([_range_partial.remote(t, om_ref) for t in refs]))
    if not isinstance(Y, np.ndarray):  # zero pair blocks
        Y = np.zeros((V, m))
    Q, _ = np.linalg.qr(Y)
    q_ref = ray.put(Q)
    # wave 2 reuses the same scatter kernel: (M + M^T) Q, then B = .T
    BT = sum(ray.get([_range_partial.remote(t, q_ref) for t in refs]))
    if not isinstance(BT, np.ndarray):
        BT = np.zeros((V, m))
    Ub, s, _ = np.linalg.svd(BT.T, full_matrices=False)
    k = min(k, len(s))
    W = (Q @ Ub[:, :k]) * np.sqrt(np.maximum(s[:k], 0.0))
    # deterministic sign per component (same convention as fit_lsa)
    signs = np.sign(W[np.argmax(np.abs(W), axis=0), np.arange(k)])
    signs[signs == 0] = 1.0
    W *= signs
    return {
        "tokens": list(vocab["token"]),
        "W": W.astype(np.float32).tolist(),
        "dim": int(k),
    }


def project_texts(texts: list[str], tok2row: dict, W: np.ndarray) -> np.ndarray:
    """L2-normalized ``log2(1+tf)``-weighted mean word vector per text
    — ONE factorize + scatter-matmul per batch, shared verbatim by the
    engine stage and the sequential oracle (exactness by construction).
    All-OOV / empty texts come back as zero rows."""
    ones = np.ones(len(tok2row), dtype=np.float64)
    d, r, w = _bow_weights(texts, tok2row, ones)
    V = max(len(tok2row), 1)
    out = np.zeros((len(texts), W.shape[1]), dtype=np.float64)
    if len(d):
        if len(d) * 8 > len(texts) * V and len(texts) * V <= 16_000_000:
            # long texts hit most of the vocab — the (pair, dim)
            # expansion W[r]*w would allocate len(d) x dim floats.
            # Build the dense doc-term matrix instead (pairs are
            # unique, so plain assignment scatters it) and let BLAS
            # do the sum: A @ W.
            A = np.zeros((len(texts), V), dtype=np.float64)
            A[d, r] = w
            out = A @ W
        else:
            from .lsa import segment_project

            out = segment_project(d, r, w, W, len(texts))
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out


def _model_arrays(model: dict) -> tuple[dict, np.ndarray]:
    tok2row = {t: i for i, t in enumerate(model["tokens"])}
    W = np.asarray(model["W"], dtype=np.float64)
    if W.size == 0:
        W = np.zeros((len(tok2row), int(model.get("dim", 1)) or 1))
    return tok2row, W


def wemb_uid_vectors(
    user_text: Dataset, model: dict, text_col: str = "user_text",
) -> Dataset:
    """(uid, wemb_vec) — the uid-side embedding column that flows
    through the feature exchange like ``sg_vec`` (model broadcast once
    via ``ray.put``, fetched per worker)."""
    mref = ray.put(model)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        tok2row, W = _model_arrays(ops.cached_get(mref))
        vecs = project_texts([str(t) for t in df[text_col]], tok2row, W)
        return pd.DataFrame(
            {"uid": df["uid"].to_numpy(), "wemb_vec": list(vecs)}
        )

    return user_text.map_batches(proj, batch_format="pandas", batch_size=2048)


def _entity_abstracts(attributes_json: list) -> list[str]:
    """First dbo:abstract value per entity (same ATTRIBUTE_ABSTRACT URI
    + first-value convention as ``align._entities_partial_dict``,
    list-or-scalar tolerant) — the one extraction kernel shared by the
    distributed stage and the sequential oracle so the subspace is
    exact by construction."""
    import json as _json

    from ..functions.names import ATTRIBUTE_ABSTRACT

    out = []
    for aj in attributes_json:
        a = _json.loads(aj).get(ATTRIBUTE_ABSTRACT)
        if isinstance(a, list):
            a = a[0] if a else ""
        out.append(str(a or ""))
    return out


def _entity_proj_ds(entities: Dataset, model: dict) -> Dataset:
    """(resource_id, vec) rows: KB abstracts projected into the trained
    subspace, distributed over the KB blocks."""
    mref = ray.put(model)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        tok2row, W = _model_arrays(ops.cached_get(mref))
        vecs = project_texts(
            _entity_abstracts(list(df["attributes_json"])), tok2row, W
        )
        return pd.DataFrame(
            {"resource_id": df["resource_id"].to_numpy(), "vec": list(vecs)}
        )

    return entities.select_columns(
        ["resource_id", "attributes_json"]
    ).map_batches(proj, batch_format="pandas")


def wemb_entity_vectors(entities: Dataset, model: dict) -> dict:
    """resource_id -> normalized abstract vector as ONE driver dict —
    ad-hoc/test form; the flagship uses :func:`wemb_entity_vector_refs`
    so no single object holds the whole KB's vectors."""
    out = _entity_proj_ds(entities, model).to_pandas()
    return {
        rid: np.asarray(v, dtype=np.float64)
        for rid, v in zip(out["resource_id"], out["vec"])
    }


def wemb_entity_vector_refs(
    entities: Dataset, model: dict
) -> ops.ShardedDictRefs:
    """Sharded-broadcast form of :func:`wemb_entity_vectors` (same
    discipline as the KB attribute shards: per-block hash-split tasks,
    per-shard merges, workers fetch only touched shards)."""
    vec_ds = _entity_proj_ds(entities, model).materialize()
    return ops.ShardedDictRefs(
        ops.sharded_vec_refs(vec_ds, "resource_id", "vec")
    )


def wemb_entity_vectors_df(entities_df: pd.DataFrame, model: dict) -> dict:
    """Sequential variant of :func:`wemb_entity_vectors` over a pandas
    KB frame (oracle / ad-hoc callers) — same kernels."""
    tok2row, W = _model_arrays(model)
    vecs = project_texts(
        _entity_abstracts(list(entities_df["attributes_json"])), tok2row, W
    )
    return {
        rid: np.asarray(v, dtype=np.float64)
        for rid, v in zip(entities_df["resource_id"], vecs)
    }

"""Trained word-embedding subspace (PAI18Strategy.java:71-97 shape):
the randomized two-wave factorization matches a dense truncated SVD of
the symmetrized log1p co-occurrence matrix, projection semantics
(OOV/empty -> zero, else unit norm), and the distributed uid-vector
stage equals the sequential kernel."""

import numpy as np
import pandas as pd

from sociallink_ray.pipelines import cooccurrence as co
from sociallink_ray.pipelines import wordemb as we

CORPUS = [
    (10, "apple banana apple cherry date"),
    (20, "banana cherry date elderberry apple"),
    (30, "apple apple banana fig grape"),
    (40, "date elderberry fig grape honey"),
    (50, "cherry date elderberry apple banana"),
    (60, "fig apple banana grape cherry"),
    (70, ""),
    (80, "qqq-unseen-token qqq-unseen-token"),
]


def _docs_ds():
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"uid": [i for i, _ in CORPUS],
                      "user_text": [t for _, t in CORPUS]})
    )


def _dense_model(texts, dim, vocab_cap, window, min_freq, ds):
    """Dense reference: same vocab + aggregated pairs (tiny, pulled to
    the driver), S = log1p(M) + log1p(M)^T built densely, exact numpy
    SVD, W = U sqrt(s) with the same per-component sign convention."""
    vocab = co.build_vocabulary(ds, "user_text", min_freq=min_freq,
                                cap=vocab_cap)
    V = len(vocab)
    pairs = co.cooccurrence_pairs(ds, "user_text", vocab,
                                  window=window).to_pandas()
    S = np.zeros((V, V))
    for l, r, w in zip(pairs["left_id"], pairs["right_id"], pairs["weight"]):
        S[l, r] += np.log1p(w)
        S[r, l] += np.log1p(w)
    U, s, _ = np.linalg.svd(S)
    k = min(dim, V)
    W = U[:, :k] * np.sqrt(s[:k])
    signs = np.sign(W[np.argmax(np.abs(W), axis=0), np.arange(k)])
    signs[signs == 0] = 1.0
    return list(vocab["token"]), W * signs, s[:k]


def test_wordemb_matches_dense_svd(ray_session):
    """With oversample >= V the range-finder basis spans the full
    matrix, so the two-wave factorization IS the exact truncated SVD —
    term vectors match the dense reference to float tolerance."""
    ds = _docs_ds()
    dim, window, min_freq, cap = 4, 3, 1, 64
    model = we.train_word_embeddings(
        ds, dim=dim, vocab_cap=cap, window=window, min_freq=min_freq,
        oversample=64,
    )
    toks, W_ref, s_ref = _dense_model(
        [t for _, t in CORPUS], dim, cap, window, min_freq, ds
    )
    assert model["tokens"] == toks
    W = np.asarray(model["W"], dtype=np.float64)
    assert W.shape == W_ref.shape == (len(toks), dim)
    # column norms are sqrt(singular values)
    np.testing.assert_allclose(
        np.linalg.norm(W, axis=0) ** 2, s_ref, rtol=1e-4
    )
    # float32 storage rounds the model; compare at that tolerance
    np.testing.assert_allclose(W, W_ref.astype(np.float32), atol=2e-4)


def test_wordemb_deterministic(ray_session):
    ds = _docs_ds()
    m1 = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=1)
    m2 = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=1)
    assert m1["tokens"] == m2["tokens"]
    np.testing.assert_array_equal(
        np.asarray(m1["W"]), np.asarray(m2["W"])
    )


def test_project_texts_semantics(ray_session):
    ds = _docs_ds()
    model = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=1)
    tok2row, W = we._model_arrays(model)
    texts = [t for _, t in CORPUS] + ["apple apple APPLE-not-lowered"]
    vecs = we.project_texts(texts, tok2row, W)
    norms = np.linalg.norm(vecs, axis=1)
    # empty doc -> zero row; in-vocab docs unit norm (min_freq=1 puts
    # doc 80's repeated token IN vocab, so it is unit-norm too)
    assert norms[6] == 0.0
    keep = np.delete(norms, [6])
    np.testing.assert_allclose(keep, 1.0, rtol=1e-12)
    # genuinely all-OOV text -> zero row
    oov = we.project_texts(["zzz-never-seen kk-also-unseen"], tok2row, W)
    assert np.linalg.norm(oov[0]) == 0.0
    # projection is tf-weighted: a doc of one in-vocab token points
    # exactly along that token's (normalized) vector
    one = we.project_texts(["apple"], tok2row, W)[0]
    want = W[tok2row["apple"]]
    np.testing.assert_allclose(one, want / np.linalg.norm(want), rtol=1e-12)


def test_wemb_uid_vectors_matches_sequential(ray_session):
    """The distributed uid-side stage (the exchange input) returns the
    same vectors as the shared sequential kernel for every uid."""
    ds = _docs_ds()
    model = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=1)
    got = (
        we.wemb_uid_vectors(ds, model)
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    tok2row, W = we._model_arrays(model)
    want = we.project_texts([t for _, t in CORPUS], tok2row, W)
    np.testing.assert_allclose(
        np.vstack(got["wemb_vec"].to_numpy()), want, atol=1e-12
    )


def test_wemb_entity_vectors_df_matches_dataset(ray_session):
    """Dataset and DataFrame KB projections agree (engine vs oracle
    path), including list-valued and missing abstracts."""
    import json

    import ray.data as rd

    from sociallink_ray.functions.names import ATTRIBUTE_ABSTRACT

    ents = pd.DataFrame(
        {
            "resource_id": ["e1", "e2", "e3"],
            "attributes_json": [
                json.dumps({ATTRIBUTE_ABSTRACT: ["apple banana cherry"]}),
                json.dumps({ATTRIBUTE_ABSTRACT: "date elderberry"}),
                json.dumps({"name": ["no abstract here"]}),
            ],
        }
    )
    ds = _docs_ds()
    model = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=1)
    d1 = we.wemb_entity_vectors(rd.from_pandas(ents), model)
    d2 = we.wemb_entity_vectors_df(ents, model)
    assert set(d1) == set(d2) == {"e1", "e2", "e3"}
    for rid in d1:
        np.testing.assert_allclose(d1[rid], d2[rid], atol=1e-12)
    assert np.linalg.norm(d2["e3"]) == 0.0  # missing abstract -> zero


def test_wordemb_sampled_training_path(ray_session):
    """max_train_bytes below the corpus size forces the deterministic
    content-hash sample — the at-scale path every 100TB run takes. It
    must run (regression: a 13-byte pd.util.hash_array hash_key raised
    ValueError in every map task), be deterministic, and train on a
    subset of the full vocabulary."""
    ds = _docs_ds()
    full = we.train_word_embeddings(ds, dim=3, vocab_cap=32, min_freq=0)
    m1 = we.train_word_embeddings(
        ds, dim=3, vocab_cap=32, min_freq=0, max_train_bytes=64
    )
    m2 = we.train_word_embeddings(
        ds, dim=3, vocab_cap=32, min_freq=0, max_train_bytes=64
    )
    assert m1["tokens"] == m2["tokens"]
    np.testing.assert_array_equal(np.asarray(m1["W"]), np.asarray(m2["W"]))
    assert set(m1["tokens"]) <= set(full["tokens"])


def test_wordemb_empty_texts_never_mint_vocab(ray_session):
    """Empty / whitespace-only rows must not create an empty-string
    vocab token (it would burn a vocab_cap slot project_texts can never
    match)."""
    import ray.data as rd

    df = pd.DataFrame(
        {
            "uid": range(8),
            "user_text": ["apple banana"] * 3 + [""] * 3 + ["  ", "\t"],
        }
    )
    model = we.train_word_embeddings(
        rd.from_pandas(df), dim=2, vocab_cap=8, min_freq=1
    )
    assert "" not in model["tokens"]
    assert set(model["tokens"]) == {"apple", "banana"}


def test_wemb_embed_query_deterministic_and_normalized(ray_session):
    """The wemb_embed catalog query: stable across runs, vectors unit-
    norm where wemb_norm=1 and all-zero where wemb_norm=0."""
    from sociallink_ray.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["wemb_embed"](sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = QUERIES["wemb_embed"](sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0 and list(a.columns) == ["doc_id", "wemb", "wemb_norm"]
    assert a["doc_id"].equals(b["doc_id"])
    for va, vb in zip(a["wemb"], b["wemb"]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    M = np.stack(a["wemb"].to_numpy())
    norms = np.linalg.norm(M.astype(np.float64), axis=1)
    has = a["wemb_norm"].to_numpy() == 1.0
    # rounded to 5dp on write, so unit norm within loose tolerance
    assert np.all(np.abs(norms[has] - 1.0) < 1e-3)
    assert np.all(norms[~has] == 0.0)


def test_wemb_entity_vector_refs_match_dict(ray_session):
    """The sharded-broadcast entity-vector form must serve exactly the
    dict form's vectors (same keys, same values) with no whole-KB
    object."""
    import ray.data as rd

    ents = pd.DataFrame(
        {
            "resource_id": [f"e{i}" for i in range(40)],
            "attributes_json": [
                '{"http://dbpedia.org/ontology/abstract":'
                ' ["alpha beta gamma tok%d"]}' % i
                for i in range(40)
            ],
        }
    )
    ds = rd.from_pandas(ents).repartition(4)
    model = we.train_word_embeddings(
        rd.from_pandas(pd.DataFrame({"user_text": ["alpha beta gamma"] * 6})),
        dim=2, vocab_cap=8, min_freq=1,
    )
    d = we.wemb_entity_vectors(ds, model)
    refs = we.wemb_entity_vector_refs(ds, model)
    assert len(refs.refs) > 1  # actually sharded
    for rid, v in d.items():
        np.testing.assert_array_equal(refs.get(rid), v)
    assert refs.get("missing") is None

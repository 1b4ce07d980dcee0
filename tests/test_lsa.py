"""True-LSA projection (T1): exactness vs a dense numpy reference,
determinism, and the reference's log2(1+tf)*idf + OOV-drop semantics
(LSM.java:96-125)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sociallink_ray.pipelines import lsa

CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry date"),
    (3, "apple apple apple banana"),
    (4, "date elderberry fig"),
    (5, "cherry date elderberry"),
    (6, "fig apple banana"),
    (7, ""),
    (8, "zzz-unseen-token"),
]


def _docs_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"doc_id": [i for i, _ in CORPUS],
                      "text": [t for _, t in CORPUS]})
    )


def _dense_reference(model, texts):
    """Direct per-document projection: v = Uk^T x, x[t] = log2(1+tf)*idf."""
    tok2row = {t: i for i, t in enumerate(model.tokens)}
    Uk = model.Uk.astype(np.float64)
    out = np.zeros((len(texts), Uk.shape[1]))
    for i, text in enumerate(texts):
        x = np.zeros(len(model.tokens))
        toks = str(text).lower().split()
        for t in set(toks):
            r = tok2row.get(t)
            if r is not None:
                x[r] = np.log2(1.0 + toks.count(t)) * model.idf[r]
        v = Uk.T @ x
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        out[i] = v
    return out


def test_lsa_matches_dense_reference(ray_session):
    docs = _docs_ds(ray_session)
    # vocab_cap=6 drops the df=1 token "zzz-unseen-token" (highest
    # idf), making doc 8 fully OOV
    model = lsa.fit_lsa(docs, dim=4, vocab_cap=6, sample=len(CORPUS))
    got = (
        lsa.embed_lsa(docs, model, concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _dense_reference(model, [t for _, t in CORPUS])
    got_mat = np.vstack(got["lsa"].to_numpy())
    assert got_mat.shape == (len(CORPUS), model.dim)
    np.testing.assert_allclose(got_mat, np.round(want, 5), atol=2e-5)
    # empty + fully-OOV docs project to the zero vector, norm flag 0
    norms = got.set_index("doc_id")["lsa_norm"]
    assert norms.loc[7] == 0.0 and norms.loc[8] == 0.0
    assert (norms.drop([7, 8]) == 1.0).all()


def test_lsa_fit_deterministic(ray_session):
    docs = _docs_ds(ray_session)
    m1 = lsa.fit_lsa(docs, dim=3, vocab_cap=16, sample=len(CORPUS))
    m2 = lsa.fit_lsa(docs, dim=3, vocab_cap=16, sample=len(CORPUS))
    assert list(m1.tokens) == list(m2.tokens)
    np.testing.assert_array_equal(m1.Uk, m2.Uk)
    # term basis is orthonormal (sample-space lift preserves it)
    g = m1.Uk.astype(np.float64).T @ m1.Uk.astype(np.float64)
    np.testing.assert_allclose(g, np.eye(m1.dim), atol=1e-5)


def test_lsa_vocab_cap_keeps_most_frequent(ray_session):
    docs = _docs_ds(ray_session)
    model = lsa.fit_lsa(docs, dim=2, vocab_cap=3, sample=len(CORPUS))
    assert len(model.tokens) == 3
    # apple (df 4), banana (df 4), cherry/date (df 3) — cap keeps the
    # lowest-idf (most frequent) terms, lexicographic tie-break
    assert "apple" in model.tokens and "banana" in model.tokens


def test_lsa_on_testdata(ray_session, sf_dir):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    model = lsa.fit_lsa(docs, dim=16, vocab_cap=512, sample=128)
    out = lsa.embed_lsa(docs, model).to_pandas()
    assert len(out) == docs.count()
    dims = {len(v) for v in out["lsa"]}
    assert dims == {16}

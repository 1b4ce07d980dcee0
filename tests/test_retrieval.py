"""BM25 retrieval: exactness vs a naive single-process reference on a
hand-built corpus, plus edge cases (empty docs, absent terms, tie
ordering)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sociallink_ray.stages import retrieval


def _naive_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Plain-Python Okapi BM25 with Lucene idf for one query."""
    toks = [d.lower().split() for d in docs]
    n = len(docs)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    scores = []
    for ti, t in enumerate(toks):
        s = 0.0
        for term in query_terms:
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks if term in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[ti] / avgdl))
        scores.append(s)
    return scores


CORPUS = [
    "hash join hash join merge",
    "merge sort scan",
    "window stream",
    "hash",
    "",  # empty doc must not crash and must count in N / avgdl
    "join join join join merge hash scan filter",
]


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                "text": pa.array(CORPUS, pa.string()),
            }
        )
    )


def test_bm25_matches_naive_reference(corpus_ds):
    q = pd.DataFrame({"query_id": pd.array([7], dtype="int64"),
                      "query": ["hash join merge"]})
    got = (
        retrieval.bm25_topk(corpus_ds, q, k=10)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    ref = _naive_bm25(CORPUS, ["hash", "join", "merge"])
    order = sorted(
        (i for i, s in enumerate(ref) if round(s, 5) > 0),
        key=lambda i: (-round(ref[i], 5), i),
    )
    assert list(got["doc_id"]) == order
    for _, row in got.iterrows():
        assert row["score"] == pytest.approx(
            round(ref[int(row["doc_id"])], 5), abs=1e-9
        )
    assert list(got["rank"]) == list(range(1, len(order) + 1))


def test_bm25_absent_term_scores_nothing(corpus_ds):
    q = pd.DataFrame({"query_id": pd.array([0], dtype="int64"),
                      "query": ["zzz_not_in_corpus"]})
    got = retrieval.bm25_topk(corpus_ds, q, k=5).to_pandas()
    assert len(got) == 0


def test_bm25_stats_count_empty_docs(corpus_ds):
    stats = retrieval.corpus_stats(corpus_ds, "text", ["hash"])
    assert stats["n_docs"] == len(CORPUS)
    total_tokens = sum(len(d.split()) for d in CORPUS)
    assert stats["avgdl"] == pytest.approx(total_tokens / len(CORPUS))
    assert stats["df"]["hash"] == 3


def test_bm25_tie_broken_by_doc_id(ray_session):
    import ray.data as rd

    # Two identical docs → identical scores → doc id ascending.
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 3, 99], pa.int64()),
                "text": pa.array(["alpha beta", "alpha beta", "gamma"]),
            }
        )
    )
    q = pd.DataFrame({"query_id": pd.array([1], dtype="int64"),
                      "query": ["alpha"]})
    got = retrieval.bm25_topk(ds, q, k=5).to_pandas().sort_values("rank")
    assert list(got["doc_id"]) == [3, 10]


def test_rrf_fuse_semantics(ray_session):
    """RRF fused score = sum of 1/(c+rank) over the rankers listing the
    pair; rank-only (ranker scores never enter); per-query top-k with
    (rrf desc, doc_id asc) ties."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages.retrieval import rrf_fuse

    r1 = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [1, 2, 3], "rank": [1, 2, 3],
         "score": [9.0, 5.0, 1.0]}  # extra col must be ignored
    )
    r2 = pd.DataFrame(
        {"query_id": [0, 0], "doc_id": [2, 4], "rank": [1, 2]}
    )
    out = (
        rrf_fuse([rd.from_pandas(r1), rd.from_pandas(r2)], k=3, c=60)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = {
        2: 1 / 62 + 1 / 61,  # in both rankers
        1: 1 / 61,
        4: 1 / 62,
        3: 1 / 63,
    }
    # doc 2 first; then doc 1 (1/61) > doc 4 (1/62); k=3 cuts doc 3
    assert out["doc_id"].tolist() == [2, 1, 4]
    for _, row in out.iterrows():
        assert abs(row["rrf"] - round(want[row["doc_id"]], 6)) < 1e-12
    assert out["rank"].tolist() == [1, 2, 3]

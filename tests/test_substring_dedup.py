"""Exact-substring duplicate spans: winnowing-anchor guarantee vs a
brute-force all-diagonals reference, maximality, and block invariance."""

import numpy as np
import pandas as pd
import pytest


def _words(n, seed):
    r = np.random.default_rng(seed)
    return [f"w{r.integers(0, 2000)}" for _ in range(n)]


def _brute_spans(docs: dict[int, list[str]], L: int) -> set[tuple]:
    """All maximal cross-doc shared token runs >= L via per-diagonal
    run-length scan (exact, O(len_a * len_b) per pair)."""
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ta, tb = docs[a], docs[b]
            eq = np.asarray(ta, dtype=object)[:, None] == np.asarray(
                tb, dtype=object
            )[None, :]
            for d in range(-len(tb) + 1, len(ta)):
                diag = np.diagonal(eq, offset=-d)
                # runs of True
                idx = np.flatnonzero(
                    np.diff(np.concatenate([[0], diag.view(np.int8), [0]]))
                )
                for s, e in zip(idx[::2], idx[1::2]):
                    if e - s >= L:
                        a0 = s + max(d, 0)
                        b0 = s + max(-d, 0)
                        out.add((a, b, int(a0), int(b0), int(e - s)))
    return out


def _run(docs, L, num_blocks=3, **kw):
    import ray.data as rd

    from sociallink_ray.stages.dedup import substring_dup_spans

    df = pd.DataFrame(
        {"doc_id": list(docs), "text": [" ".join(v) for v in docs.values()]}
    )
    ds = rd.from_pandas(df).repartition(num_blocks)
    out = substring_dup_spans(ds, "text", "doc_id", min_tokens=L, **kw)
    return set(
        map(tuple, out.to_pandas().astype("int64").itertuples(index=False))
    )


def test_substring_spans_match_bruteforce(ray_session):
    L = 12
    shared1, shared2 = _words(25, 91), _words(14, 92)
    docs = {
        0: _words(40, 0) + shared1 + _words(30, 1),
        1: shared1 + _words(55, 2) + shared2,
        2: _words(20, 3) + shared2 + _words(20, 4) + shared1[:11],
        3: _words(60, 5),
        4: _words(8, 6),  # shorter than L: skipped entirely
    }
    got = _run(docs, L, k=4)
    want = _brute_spans({i: d for i, d in docs.items()}, L)
    assert want, "fixture must plant qualifying spans"
    assert got == want


def test_substring_spans_block_invariant_and_fuzz(ray_session):
    r = np.random.default_rng(7)
    docs = {}
    vocab_doc = {i: _words(int(r.integers(30, 120)), 100 + i) for i in range(12)}
    # plant shared runs of random lengths between random doc pairs
    for t in range(8):
        a, b = r.choice(12, size=2, replace=False)
        ln = int(r.integers(5, 30))
        run = _words(ln, 500 + t)
        pa_, pb_ = (
            int(r.integers(0, len(vocab_doc[a]))),
            int(r.integers(0, len(vocab_doc[b]))),
        )
        vocab_doc[a] = vocab_doc[a][:pa_] + run + vocab_doc[a][pa_:]
        vocab_doc[b] = vocab_doc[b][:pb_] + run + vocab_doc[b][pb_:]
    docs = vocab_doc
    L = 15
    got = _run(docs, L, k=5)
    want = _brute_spans(docs, L)
    assert got == want
    # identical multiset on a different block layout
    assert got == _run(docs, L, k=5, num_blocks=7)


def test_substring_dup_spans_query_cross_scale_pin(ray_session):
    """Cross-scale pin for the registered rows-only query: at sf0.001
    AND sf0.01 testdata, every emitted span is token-exact and maximal
    against the actual texts, and the result is identical across two
    invocations (the driver's rows-only stability contract)."""
    import pyarrow.parquet as pq

    from sociallink_ray.queries import q_substring_dup_spans

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {
            tuple(map(int, r))
            for r in q_substring_dup_spans(sf_dir)
            .to_pandas()
            .itertuples(index=False)
        }
        again = {
            tuple(map(int, r))
            for r in q_substring_dup_spans(sf_dir)
            .to_pandas()
            .itertuples(index=False)
        }
        assert got == again
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        toks = {
            int(i): t.split() for i, t in zip(docs["doc_id"], docs["text"])
        }
        for a, b, a0, b0, ln in got:
            assert ln >= 30
            ta, tb = toks[a], toks[b]
            assert ta[a0 : a0 + ln] == tb[b0 : b0 + ln]
            # maximal: cannot extend in either direction
            assert a0 == 0 or b0 == 0 or ta[a0 - 1] != tb[b0 - 1]
            assert (
                a0 + ln == len(ta)
                or b0 + ln == len(tb)
                or ta[a0 + ln] != tb[b0 + ln]
            )


def test_substring_dedup_cut_removes_all_but_first(ray_session):
    import ray.data as rd

    from sociallink_ray.stages.dedup import (
        substring_dedup_cut,
        substring_dup_spans,
    )

    L = 12
    run = _words(20, 40)
    docs = {
        0: _words(30, 20) + run + _words(25, 21),
        1: _words(18, 22) + run + _words(40, 23),
        2: run + _words(33, 24),
        3: _words(50, 25),
    }
    df = pd.DataFrame(
        {"doc_id": list(docs), "text": [" ".join(v) for v in docs.values()]}
    )
    ds = rd.from_pandas(df).repartition(2)
    out = (
        substring_dedup_cut(ds, "text", "doc_id", min_tokens=L, k=4)
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 0 (lowest id) keeps its copy; 1 and 2 lose exactly the run
    assert out.loc[0, "cut_tokens"] == 0
    assert out.loc[3, "cut_tokens"] == 0
    assert out.loc[1, "cut_tokens"] == 20
    assert out.loc[2, "cut_tokens"] == 20
    joined = " ".join(run)
    assert joined in out.loc[0, "text"]
    assert joined not in out.loc[1, "text"]
    assert joined not in out.loc[2, "text"]
    # re-detection on the cut corpus finds nothing
    ds2 = rd.from_pandas(
        out.reset_index()[["doc_id", "text"]]
    )
    left = substring_dup_spans(ds2, "text", "doc_id", min_tokens=L, k=4)
    assert left.count() == 0

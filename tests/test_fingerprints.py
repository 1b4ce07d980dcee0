"""Winnowing document fingerprints: brute-force exactness, the
Schleimer-et-al coverage guarantee on planted shared runs, and
layout-independence of the catalog query."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sociallink_ray.functions.minhash import _hash64_strings, winnow_anchors

K, MIN_TOKENS = 8, 40
W = MIN_TOKENS - K + 1


def brute_winnow(text: str):
    """Per-doc reference: hash every k-token window with the same
    polynomial scheme, select the min of each w-window (leftmost-min
    de-duplicated via np.unique of argmin positions)."""
    toks = str(text).split()
    if len(toks) < MIN_TOKENS:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = _hash64_strings(toks)
    m = len(th) - K + 1
    mix = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(K):
            h = (h ^ th[j : j + m]) * mix
    sel = np.unique(
        [int(np.argmin(h[i : i + W])) + i for i in range(max(1, len(h) - W + 1))]
    ).astype(np.int64)
    return sel, h[sel]


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(5, 400, size=60)
    ]
    # plant a shared >= MIN_TOKENS run into two long docs
    run = " ".join(rng.choice(vocab, size=MIN_TOKENS + 17))
    texts[10] = texts[10] + " " + run + " " + texts[11]
    texts[20] = run + " " + texts[21]
    return texts


def test_matches_bruteforce(docs):
    di, pos, fp = winnow_anchors(docs, k=K, min_tokens=MIN_TOKENS)
    got = {
        i: sorted(zip(pos[di == i].tolist(), fp[di == i].tolist()))
        for i in set(di.tolist())
    }
    for i, t in enumerate(docs):
        sel, h = brute_winnow(t)
        want = sorted(zip(sel.tolist(), h.tolist()))
        assert got.get(i, []) == want, f"doc {i} anchor mismatch"


def test_shared_run_coverage(docs):
    di, pos, fp = winnow_anchors(docs, k=K, min_tokens=MIN_TOKENS)
    shared = set(fp[di == 10]) & set(fp[di == 20])
    assert shared, "planted >=min_tokens shared run must share an anchor"


def test_query_layout_independent(ray_session, tmp_path):
    import ray.data as rd

    from sociallink_ray.queries import q_doc_fingerprints

    sf_dir = "/root/testdata/sf0.001"
    a = q_doc_fingerprints(sf_dir).to_pandas()
    assert list(a.columns) == ["doc_id", "token_pos", "fp"]
    assert len(a) > 0 and a["doc_id"].dtype == np.int64

    # same rows regardless of block layout
    src = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    import pyarrow.parquet as pq

    out = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(src.iloc[::-1].reset_index(drop=True)), out)
    b = q_doc_fingerprints(str(tmp_path)).to_pandas()
    key = ["doc_id", "token_pos", "fp"]
    assert (
        a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True)
        )
    )

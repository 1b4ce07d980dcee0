"""Tests for the curation operators: k-means clustering determinism and
quality, shard export roundtrip, and the packed-sequence invariants."""

import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_clusters_deterministic_and_sane(ray_session):
    import ray.data as rd

    from sociallink_ray.stages import ann

    ds = rd.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    a = (
        ann.kmeans_clusters(ds, n_clusters=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # deterministic across runs AND partitionings (seeded quantizer,
    # driver-sample training, block-order-independent assignment)
    b = (
        ann.kmeans_clusters(ds.repartition(7), n_clusters=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["cluster_id"].nunique() > 1
    # every vector's assigned centroid is its argmax-cosine centroid:
    # re-derive centroids from members and check mean intra-cluster
    # cosine beats the global mean cosine (clustering does something)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    mat = np.stack(tbl.sort_values("vec_id")["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lab = a["cluster_id"].to_numpy()
    intra = []
    for c in np.unique(lab):
        m = mat[lab == c]
        if len(m) >= 2:
            cen = m.mean(axis=0)
            cen /= np.linalg.norm(cen)
            intra.append((m @ cen).mean())
    gcen = mat.mean(axis=0)
    gcen /= np.linalg.norm(gcen)
    assert np.mean(intra) > (mat @ gcen).mean()


def test_export_shards_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from sociallink_ray.stages import curate

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = str(tmp_path / "shards")
    curate.export_shards(ds, out, "doc_id", n_shards=4)
    # hive layout: one directory per shard
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == 4
    back = rd.read_parquet(out).to_pandas()
    src = ds.to_pandas()
    assert len(back) == len(src)
    assert set(back["doc_id"]) == set(src["doc_id"])
    # assignment matches the deterministic hash for every row
    ids = back["doc_id"].to_numpy()
    expect = curate.shard_of(ids, 4)
    got = back["shard"].to_numpy().astype(np.int64)
    assert (expect == got).all()


def test_packed_sequences_invariants(ray_session):
    import ray.data as rd

    from sociallink_ray.stages import curate

    df = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64) * 3 + 1,  # sparse ids
            "n_tokens": (np.arange(100, dtype=np.int64) * 7) % 50 + 1,
        }
    )
    out = (
        curate.packed_sequences(
            rd.from_pandas(df), "doc_id", "n_tokens", budget=64, range_size=16
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ordered = df.sort_values("doc_id").reset_index(drop=True)
    # offsets are the exact prefix sum in id order, regardless of the
    # range partitioning
    expect = ordered["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    assert (out["start_tok"].to_numpy() == expect).all()
    assert (out["seq_first"] == out["start_tok"] // 64).all()


def test_packed_sequences_auto_range_sparse_huge_ids(ray_session):
    """range_size=None derives the range width from the id span, so the
    driver-side range table stays <= ~10^6 rows even for sparse ids up
    to 10^13 — and the prefix sum is still exact."""
    import ray.data as rd

    from sociallink_ray.stages import curate

    r = np.random.default_rng(11)
    ids = np.unique(r.integers(0, 10**13, size=300, dtype=np.int64))
    df = pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": r.integers(1, 80, size=len(ids)).astype(np.int64),
        }
    )
    out = (
        curate.packed_sequences(
            rd.from_pandas(df).repartition(5), "doc_id", "n_tokens",
            budget=64,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ordered = df.sort_values("doc_id").reset_index(drop=True)
    expect = ordered["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    assert (out["doc_id"].to_numpy() == ordered["doc_id"].to_numpy()).all()
    assert (out["start_tok"].to_numpy() == expect).all()
    # the derived width bounds the number of distinct ranges by ~1e6
    mx = int(ids.max())
    width = max(256, -(-(mx + 1) // 1_000_000))
    assert (mx // width) + 1 <= 1_000_001


def test_decontaminate_hashed_matches_exact(ray_session):
    """The u64-hashed broadcast form of the benchmark gram set (the
    100 TB path) yields row-identical decontamination output to the
    exact string-set form."""
    import ray
    import ray.data as rd

    from sociallink_ray.stages import curate

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    bench_texts = [
        r["text"] for r in docs.take_all() if r["doc_id"] % 11 == 0
    ]
    exact_ref = ray.put(curate.build_benchmark_grams(bench_texts, 3))
    hashed_ref = ray.put(curate.build_benchmark_gram_hashes(bench_texts, 3))
    a = (
        curate.decontaminate(docs, exact_ref, "text", "doc_id", n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        curate.decontaminate(docs, hashed_ref, "text", "doc_id", n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["contaminated"].sum() > 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=120, unique=True,
    ),
    toks=st.data(),
    budget=st.integers(min_value=1, max_value=100),
    range_size=st.integers(min_value=1, max_value=64),
)
def test_packed_sequences_property(ray_session, ids, toks, budget, range_size):
    """Property: for ANY sparse id set, token counts, budget and range
    partitioning, the distributed prefix-scan equals the naive cumsum
    in id order."""
    import ray.data as rd

    from sociallink_ray.stages import curate

    n_tokens = [
        toks.draw(st.integers(min_value=0, max_value=200)) for _ in ids
    ]
    df = pd.DataFrame({"doc_id": ids, "n_tokens": n_tokens}).astype("int64")
    out = (
        curate.packed_sequences(
            rd.from_pandas(df), "doc_id", "n_tokens",
            budget=budget, range_size=range_size,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ordered = df.sort_values("doc_id").reset_index(drop=True)
    expect = ordered["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    assert (out["doc_id"].to_numpy() == ordered["doc_id"].to_numpy()).all()
    assert (out["start_tok"].to_numpy() == expect).all()
    assert (out["seq_first"].to_numpy() == expect // budget).all()
    last = (
        expect + np.maximum(ordered["n_tokens"].to_numpy(), 1) - 1
    ) // budget
    assert (out["seq_last"].to_numpy() == last).all()


def test_domain_mix_weights_and_block_invariance(ray_session):
    """domain_mix hits each domain's target weight in expectation and
    emits an identical multiset whatever the block layout (the pick
    depends only on the id)."""
    import ray.data as rd

    from sociallink_ray.stages import curate

    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"d{i % 3}" for i in range(n)],
        }
    )
    weights = {"d0": 0.25, "d1": 1.0, "d2": 2.5}

    def run(num_blocks):
        ds = rd.from_pandas(df).repartition(num_blocks)
        out = curate.domain_mix(
            ds, weights, domain_col="source", id_col="doc_id"
        ).to_pandas()
        return out.sort_values(["doc_id", "copy"]).reset_index(drop=True)

    a, b = run(1), run(13)
    pd.testing.assert_frame_equal(a, b)

    per = a.groupby("source").size()
    third = n / 3
    for dom, w in weights.items():
        assert abs(per[dom] / third - w) < 0.05, (dom, per[dom] / third)
    # copy indices are dense 0..k-1 per row
    assert (a.groupby("doc_id")["copy"].min() == 0).all()
    mx = a.groupby("doc_id")["copy"].max()
    cnt = a.groupby("doc_id")["copy"].size()
    assert (mx == cnt - 1).all()
    # every d1 row kept exactly once, d2 rows at least twice
    assert (cnt[a.groupby("doc_id")["source"].first() == "d1"] == 1).all()
    assert (cnt[a.groupby("doc_id")["source"].first() == "d2"] >= 2).all()


def test_lm_perplexity_gate_matches_scores(ray_session):
    """The fused filter form keeps exactly the docs whose scored
    avg_bits clear the threshold (plus no-bigram docs)."""
    import ray
    import ray.data as rd

    from sociallink_ray.stages import curate

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    train = docs.filter(lambda r: r["doc_id"] % 5 == 0)
    test = docs.filter(lambda r: r["doc_id"] % 5 != 0)
    lm_ref = ray.put(curate.train_bigram_lm(train, "text"))
    scores = curate.lm_perplexity(test, lm_ref, "text", "doc_id").to_pandas()
    assert len(scores) and scores["avg_bits"].gt(0).all()
    cut = float(scores["avg_bits"].median())
    kept = curate.lm_perplexity_gate(
        test, lm_ref, "text", "doc_id", cut
    ).to_pandas()
    want = set(scores.loc[scores["avg_bits"] <= cut, "doc_id"]) | (
        set(test.to_pandas()["doc_id"]) - set(scores["doc_id"])
    )
    assert set(kept["doc_id"]) == want
    assert 0 < len(kept) < test.count()


def test_ws_tokens_matches_duckdb_re2():
    """The engine tokenizer must agree byte-for-byte with the DuckDB
    RE2 `\\s+` split every oracle uses — notably \\v and NBSP are NOT
    whitespace under RE2 but ARE under Python's str.split()."""
    import duckdb

    from sociallink_ray.stages import curate

    cases = [
        "a\x0bb c\xa0d  e\tf\ng\fh\ri",
        " leading and trailing ",
        "",
        "　ideographic thin",
        "plain words only",
    ]
    for s in cases:
        eng = curate.ws_tokens(s)
        ora = duckdb.execute(
            r"select list_filter(regexp_split_to_array(?, '\s+'),"
            r" x -> x <> '')",
            [s],
        ).fetchone()[0]
        assert eng == ora, s


def test_lm_tokenization_consistent_across_model_and_scoring(ray_session):
    """Bigram counts, vocab size V, and scoring must share ONE
    tokenizer: a doc glued with \\v / NBSP is a single token everywhere
    (regression: the count pass used str.split while V used RE2 \\s)."""
    import ray.data as rd

    from sociallink_ray.stages import curate

    train = rd.from_pandas(
        pd.DataFrame({"text": ["a\x0bb c\xa0d a\x0bb c\xa0d", "x y x y"]})
    )
    lm = curate.train_bigram_lm(train, "text")
    # 'a\x0bb' and 'c\xa0d' are single tokens: vocab = {a\vb, c\xa0d, x, y}
    assert lm["V"] == 4
    assert ("a\x0bb", "c\xa0d") in lm["big"]
    # scoring the same doc sees the same bigrams
    n, bits = curate._lm_bits_batch(["a\x0bb c\xa0d"], lm)
    assert n[0] == 1


# --------------------------------------------------------------------------
# DSIR importance scores (hashed variant vs naive reference)
# --------------------------------------------------------------------------


def test_dsir_hashed_matches_naive_reference(ray_session):
    import math

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sociallink_ray.stages.curate import dsir_scores, ws_tokens

    docs = [
        (0, "alpha beta beta gamma"),
        (1, "alpha alpha delta"),
        (2, "beta gamma gamma gamma"),
        (3, "delta delta alpha beta"),
        (4, "gamma alpha"),
        (5, "beta beta delta gamma alpha"),
        (6, ""),  # zero-token source doc must be dropped
        (7, "epsilon zeta alpha"),
    ]
    mod, B = 4, 1 << 16
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
            }
        )
    )
    got = (
        dsir_scores(ds, "text", "doc_id", target_mod=mod, hash_buckets=B)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # naive reference with the same pd.util.hash_array bucketing
    import numpy as np

    def bucket(tokens):
        if not tokens:
            return np.array([], dtype=np.int64)
        return (
            pd.util.hash_array(np.array(tokens, dtype=object)).astype(np.uint64)
            % np.uint64(B)
        ).astype(np.int64)

    ct, cs = {}, {}
    for i, t in docs:
        for k in bucket(ws_tokens(t)):
            (ct if i % mod == 0 else cs)[k] = (
                ct if i % mod == 0 else cs
            ).get(k, 0) + 1
    vocab = set(ct) | set(cs)
    nt, ns, V = sum(ct.values()), sum(cs.values()), len(vocab)
    exp_rows = []
    for i, t in docs:
        toks = bucket(ws_tokens(t))
        if i % mod == 0 or len(toks) == 0:
            continue
        s = sum(
            math.log((ct.get(k, 0) + 1.0) / (nt + V))
            - math.log((cs.get(k, 0) + 1.0) / (ns + V))
            for k in toks
        )
        exp_rows.append((i, len(toks), round(s, 5)))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "n_tokens", "log_weight"])
    exp["doc_id"] = exp["doc_id"].astype("int64")
    exp["n_tokens"] = exp["n_tokens"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


# --------------------------------------------------------------------------
# quality_classifier (distributed LR vs single-process IRLS reference)
# --------------------------------------------------------------------------


def _local_irls(X, y, max_iter=25):
    import numpy as np

    n, d = X.shape
    mean, std = X.mean(axis=0), X.std(axis=0)
    std[std == 0] = 1.0
    Xs = (X - mean) / std
    Xb = np.concatenate([Xs, np.ones((n, 1))], axis=1)
    pos_w = max(1.0, (n - y.sum()) / max(y.sum(), 1.0))
    sw = np.where(y == 1.0, pos_w, 1.0)
    wb = np.zeros(d + 1)
    ridge = 1e-8 * n
    for _ in range(max_iter):
        z = np.clip(Xb @ wb, -35.0, 35.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g = Xb.T @ ((p - y) * sw)
        r = np.maximum(p * (1.0 - p), 1e-9) * sw
        H = (Xb * r[:, None]).T @ Xb
        H[np.diag_indices_from(H)] += ridge
        step = np.linalg.solve(H, g)
        wb -= step
        if float(np.abs(step).max()) < 1e-8:
            break
    return wb, mean, std


def test_train_logreg_blocks_matches_local(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages.curate import train_logreg_blocks

    rng = np.random.default_rng(5)
    n, d = 600, 4
    X = rng.normal(size=(n, d))
    true_w = np.array([1.5, -2.0, 0.7, 0.0])
    y = (1.0 / (1.0 + np.exp(-(X @ true_w))) > rng.uniform(size=n)).astype(
        np.float64
    )
    cols = [f"f{i}" for i in range(d)]
    df = pd.DataFrame(X, columns=cols)
    df["label"] = y
    feats = rd.from_pandas(df).repartition(6).materialize()
    model = train_logreg_blocks(feats, cols, "label")
    wb_ref, mean_ref, std_ref = _local_irls(X, y)
    assert np.allclose(model["mean"], mean_ref, atol=1e-12)
    assert np.allclose(model["std"], std_ref, atol=1e-12)
    assert np.allclose(model["w"], wb_ref[:d], atol=1e-6)
    assert abs(model["b"] - wb_ref[d]) < 1e-6
    # the learned direction tracks the planted one
    cos = np.dot(model["w"], true_w) / (
        np.linalg.norm(model["w"]) * np.linalg.norm(true_w)
    )
    assert cos > 0.95


def test_quality_classifier_scores(ray_session, sf_dir):
    import numpy as np

    from sociallink_ray.queries import QUERIES

    got = QUERIES["quality_classifier"](sf_dir).to_pandas()
    assert {"doc_id", "label", "score"} <= set(got.columns)
    assert got["score"].between(0, 1).all()
    assert set(got["label"].unique()) <= {0, 1}
    # deterministic across runs
    again = QUERIES["quality_classifier"](sf_dir).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(a["score"], b["score"], atol=1e-9)
    assert (a["doc_id"] == b["doc_id"]).all()


def test_weighted_sample_matches_local_reference(ray_session):
    """Efraimidis–Spirakis weighted sample: the distributed
    partial-top-k + sort/limit pick must equal a single-process numpy
    computation of the same priority keys, be stable under
    repartitioning, and exclude non-positive weights."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.stages import curate

    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    k = 13
    ds = rd.from_arrow(tbl)
    got = (
        curate.weighted_sample(ds, k=k, weight_col="n_chars", id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # local reference
    ids = tbl["doc_id"].to_numpy().astype(np.uint64)
    w = tbl["n_chars"].to_numpy().astype(np.float64)
    h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 0.5) / float(1 << 32)
    key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
    want_ids = np.sort(
        tbl["doc_id"].to_numpy()[np.argsort(-key, kind="stable")[:k]]
    )
    assert got["doc_id"].to_numpy().tolist() == want_ids.tolist()
    assert list(got.columns) == ["doc_id", "lang", "n_chars"]
    # stable under repartitioning
    again = (
        curate.weighted_sample(
            ds.repartition(7), k=k, weight_col="n_chars", id_col="doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    # zero/negative weights are never sampled
    pdf = tbl.to_pandas()
    pdf.loc[pdf.index[:5], "n_chars"] = 0
    zeroed = set(pdf["doc_id"].iloc[:5])
    got0 = curate.weighted_sample(
        rd.from_pandas(pdf), k=k, weight_col="n_chars", id_col="doc_id"
    ).to_pandas()
    assert not (set(got0["doc_id"]) & zeroed)
    assert len(got0) == k


def test_export_tfrecord_shards_roundtrip(ray_session, tmp_path):
    """Hash-sharded TFRecord export: every doc lands in its assigned
    shard file exactly once, and decoding the Examples back recovers
    id/text/metadata byte-for-byte."""
    import os

    import ray.data as rd

    from sociallink_ray.sources.tfexample import (
        decode_example,
        read_tfrecord,
    )
    from sociallink_ray.stages import curate

    df = pd.DataFrame(
        {
            "doc_id": np.arange(57, dtype=np.int64),
            "text": [f"doc {i} body with words" for i in range(57)],
            "n_tokens": np.arange(57, dtype=np.int64) + 5,
        }
    )
    out = str(tmp_path / "tfr")
    man = curate.export_tfrecord_shards(
        rd.from_pandas(df).repartition(4), out, "doc_id", "text",
        n_shards=6, extra_int_cols=["n_tokens"],
    )
    assert man["n"].sum() == 57
    got = {}
    for s in man["shard"]:
        path = os.path.join(out, f"shard-{int(s):05d}.tfrecord")
        for payload in read_tfrecord(path):
            ex = decode_example(payload)
            (i,) = ex["id"]
            got[i] = (ex["text"][0], ex["n_tokens"][0])
    assert len(got) == 57
    for _, r in df.iterrows():
        t, n = got[int(r["doc_id"])]
        assert t == r["text"].encode("utf-8") and n == int(r["n_tokens"])
    # shard routing matches assign_shards
    from sociallink_ray.stages.curate import shard_of

    want_shards = shard_of(df["doc_id"].to_numpy(np.int64), 6)
    for s in man["shard"]:
        path = os.path.join(out, f"shard-{int(s):05d}.tfrecord")
        ids = [decode_example(p)["id"][0] for p in read_tfrecord(path)]
        assert all(want_shards[i] == s for i in ids)

"""Winnowing document fingerprints: brute-force exactness, the
Schleimer-et-al coverage guarantee on planted shared runs, and
layout-independence of the catalog query."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sociallink_ray.functions.minhash import fnv1a64_codepoints, winnow_anchors

K, MIN_TOKENS = 8, 40
W = MIN_TOKENS - K + 1


def brute_winnow(text: str):
    """Per-doc reference: hash every k-token window with the same
    polynomial scheme, select the min of each w-window (leftmost-min
    de-duplicated via np.unique of argmin positions)."""
    toks = str(text).split()
    if len(toks) < MIN_TOKENS:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = fnv1a64_codepoints(toks)
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


def test_tfexample_wire_roundtrip():
    """Hand-rolled Example encoder round-trips through the independent
    minimal decoder: int64 (incl. negative, two's-complement varint),
    float32, bytes features, insertion order preserved."""
    from sociallink_ray.sources.tfexample import (
        bytes_list_feature,
        decode_example,
        encode_example,
        float_list_feature,
        int64_list_feature,
    )

    feats = {
        "ids": int64_list_feature([0, 1, 7, -3, 1 << 40]),
        "vals": float_list_feature([0.5, -2.25, 1e10]),
        "names": bytes_list_feature([b"abc", "xyz"]),
        "empty": int64_list_feature([]),
    }
    payload = encode_example(feats)
    got = decode_example(payload)
    assert got["ids"] == [0, 1, 7, -3, 1 << 40]
    assert got["vals"] == [np.float32(0.5), np.float32(-2.25),
                           np.float32(1e10)]
    assert got["names"] == [b"abc", b"xyz"]
    assert got["empty"] == []
    assert list(got) == ["ids", "vals", "names", "empty"]


def test_tfrecord_container_roundtrip(tmp_path):
    """TFRecord framing: length + masked CRC32-C per record, verified
    on read; corruption is detected. CRC32C pinned against the
    published check value crc32c(b'123456789') == 0xE3069283."""
    from sociallink_ray.sources.tfexample import (
        crc32c,
        read_tfrecord,
        write_tfrecord,
    )

    assert crc32c(b"123456789") == 0xE3069283
    recs = [b"hello", b"", b"x" * 1000]
    p = str(tmp_path / "t.tfrecord")
    assert write_tfrecord(p, recs) == 3
    assert read_tfrecord(p) == recs
    # flip one payload byte -> CRC failure
    blob = bytearray(open(p, "rb").read())
    blob[14] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        read_tfrecord(p)


def test_cooccurrence_tf_shards_match_reference_layout(ray_session, tmp_path):
    """write_tf_shards reproduces the reference's shard semantics
    (PopulateCooccurrenceMatrix.java:160-233): shard key (l%n, r%n),
    local coords id//n sorted by (row, col), float32 values, global
    index enumeration — verified by decoding the emitted .pb bytes
    with the independent decoder against a pandas recomputation."""
    import os

    import ray.data as rd

    from sociallink_ray.pipelines.cooccurrence import write_tf_shards
    from sociallink_ray.sources.tfexample import decode_example

    rng = np.random.default_rng(2)
    n = 4
    df = pd.DataFrame(
        {
            "left_id": rng.integers(0, 40, 200).astype(np.int64),
            "right_id": rng.integers(0, 40, 200).astype(np.int64),
            "weight": rng.random(200),
        }
    ).groupby(["left_id", "right_id"], as_index=False)["weight"].sum()
    ds = rd.from_pandas(df).repartition(3)
    out = str(tmp_path / "cooc")
    manifest = write_tf_shards(ds, out, num_shards=n)
    assert manifest["n"].sum() == len(df)

    shard_size = (max(df["left_id"].max(), df["right_id"].max()) + n) // n
    for _, row in manifest.iterrows():
        r, c = int(row["row_shard"]), int(row["col_shard"])
        path = os.path.join(out, "shards", f"shard-{r:03d}-{c:03d}.pb")
        ex = decode_example(open(path, "rb").read())
        want = df[(df["left_id"] % n == r) & (df["right_id"] % n == c)]
        want = want.assign(
            lr=want["left_id"] // n, lc=want["right_id"] // n
        ).sort_values(["lr", "lc"], kind="mergesort")
        assert ex["sparse_local_row"] == want["lr"].tolist()
        assert ex["sparse_local_col"] == want["lc"].tolist()
        assert np.allclose(
            ex["sparse_value"], want["weight"].astype(np.float32), rtol=0
        )
        assert ex["global_row"] == [r + i * n for i in range(shard_size)]
        assert ex["global_col"] == [c + i * n for i in range(shard_size)]

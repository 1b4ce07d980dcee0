"""Tests for the auxiliary pipelines: social graph, co-occurrence,
streaming ops, multimodal stubs, ANN-LSH recall, NTriples rendering."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def parsed(ray_session):
    import ray.data as rd

    from sociallink_ray.fixtures import build_corpus
    from sociallink_ray.pipelines.align import parse_pages

    build_corpus("/tmp/slr_corpus_sf0.001", sf=0.001)
    pages = rd.read_parquet("/tmp/slr_corpus_sf0.001/pages")
    return parse_pages(pages).materialize()


def test_social_graph(parsed):
    from sociallink_ray.pipelines import graph

    sg = graph.build_user_sg(parsed, min_freq=2).to_pandas()
    assert len(sg) > 0
    # weights normalized per uid and aligned with followees
    for _, row in sg.head(20).iterrows():
        assert len(row["followees"]) == len(row["weights"])
        assert abs(sum(row["weights"]) - 1.0) < 1e-9
        assert list(row["followees"]) == sorted(row["followees"])
    # oracle: the staged catalog path (emit -> aggregate -> condense)
    # must produce the IDENTICAL full table
    edges = graph.aggregate_edges(graph.emit_edges(parsed), min_freq=2).to_pandas()
    exp = graph.condense_src_local(
        edges.groupby(["src", "dst"], as_index=False, sort=False)["weight"].sum()
    ).sort_values("uid").reset_index(drop=True)
    got = sg.sort_values("uid").reset_index(drop=True)
    assert got["uid"].tolist() == exp["uid"].tolist()
    for g, e in zip(got.itertuples(index=False), exp.itertuples(index=False)):
        assert list(g.followees) == list(e.followees)
        assert np.allclose(list(g.weights), list(e.weights))


def test_cooccurrence_matches_pandas_oracle(parsed, ray_session):
    import ray.data as rd

    from sociallink_ray.pipelines import cooccurrence as co

    docs = parsed.select_columns(["text"]).limit(100).to_pandas()
    ds = rd.from_pandas(docs)
    vocab = co.build_vocabulary(ds, "text", min_freq=5, cap=1000)
    out = co.cooccurrence_pairs(ds, "text", vocab).to_pandas()

    # pure-pandas oracle
    vmap = dict(zip(vocab["token"], vocab["token_id"]))
    acc: dict[tuple, float] = {}
    for text in docs["text"]:
        ids = [vmap[t] for t in text.split() if t in vmap]
        for i in range(len(ids)):
            for off in range(1, min(10, len(ids) - 1 - i) + 1):
                key = (ids[i], ids[i + off])
                acc[key] = acc.get(key, 0.0) + 1.0 / off
    assert len(out) == len(acc)
    got = {(r.left_id, r.right_id): r.weight for r in out.itertuples(index=False)}
    for k, v in acc.items():
        assert abs(got[k] - v) < 1e-9

    # sharding layout
    sharded = co.shard_cooccurrence(co.cooccurrence_pairs(ds, "text", vocab), 4)
    sdf = sharded.to_pandas()
    assert set(sdf["row_shard"]) <= set(range(4))
    assert ((sdf["left_id"] % 4) == sdf["row_shard"]).all()


def test_multimodal_codecs():
    from sociallink_ray.stages import multimodal as mm

    img = np.random.RandomState(0).randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)
    # spec allows comments + arbitrary whitespace in the header
    assert np.array_equal(
        mm.decode_ppm(b"P6\n# c\n 7  5\n255\n" + img.tobytes()), img
    )
    x = (1000 * np.sin(np.arange(800) / 10)).astype(np.int16)
    y, rate = mm.decode_wav(mm.encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(x, y)
    frames = [mm.encode_ppm(img), mm.encode_ppm(img[:, :3])]
    assert mm.decode_rawv(mm.encode_rawv(frames)) == frames
    r = mm.resize_image(img, 14, 10)
    assert r.shape == (10, 14, 3) and np.array_equal(r[0, 0], img[0, 0])
    # real featurize dispatches on magic; unknown codecs stay explicit
    for payload in (mm.encode_ppm(img), mm.encode_wav(x, 8000),
                    mm.encode_rawv(frames)):
        f = mm._decode_real(payload, "any")
        assert f.shape == (mm.FEATURE_DIM,) and np.isfinite(f).all()
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"xx", "image")


def test_multimodal_jpeg_png_vendored_codecs():
    """JPEG/PNG decode runs IN-CONTAINER via the vendored pure-python
    codecs (round-3 verdict item 6) — no PIL skip. PNG is lossless
    (features identical to raw); JPEG is lossy within a tight bound."""
    from sociallink_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from sociallink_ray.functions.png import decode_png, encode_png
    from sociallink_ray.stages import multimodal as mm

    rng = np.random.RandomState(1)
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) * 255 // (h + w)],
        axis=-1,
    ).astype(np.uint8)

    # PNG round trip is exact
    assert np.array_equal(decode_png(encode_png(img)), img)
    fpng = mm._decode_real(encode_png(img), "image")
    assert fpng.shape == (mm.FEATURE_DIM,) and np.isfinite(fpng).all()
    if mm._pil_image() is None:
        # vendored PNG path: lossless => features equal raw features
        assert np.allclose(fpng, mm.image_features(img))

    # JPEG: 4:4:4 and 4:2:0, with and without restart markers
    for sub in (False, True):
        for ri in (0, 2):
            payload = encode_jpeg(
                img, quality=92, subsample=sub, restart_interval=ri
            )
            dec = decode_jpeg(payload)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.max() <= 12 and err.mean() < 3.0, (sub, ri, err.max())
            f = mm._decode_real(payload, "image")
            assert f.shape == (mm.FEATURE_DIM,) and np.isfinite(f).all()

    # grayscale JPEG replicates into 3 channels
    g = (xx * 255 // (w - 1)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=92))
    assert dg.shape == (h, w, 3)
    assert np.abs(dg[..., 0].astype(int) - g.astype(int)).max() <= 4

    # noise image stresses all AC categories
    noisy = rng.randint(0, 256, size=(17, 19, 3), dtype=np.uint8)
    dn = decode_jpeg(encode_jpeg(noisy, quality=97))
    assert np.abs(dn.astype(int) - noisy.astype(int)).mean() < 12

    # progressive JPEG is a declared NotImplementedError, not silence
    prog = b"\xff\xd8\xff\xc2" + bytes(20)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg(prog)

    # PIL cross-check wherever Pillow exists
    if mm._pil_image() is not None:
        import io

        pimg = mm._pil_image().open(
            io.BytesIO(encode_jpeg(img, quality=92))
        ).convert("RGB")
        perr = np.abs(
            np.asarray(pimg, dtype=int)
            - decode_jpeg(encode_jpeg(img, quality=92)).astype(int)
        )
        assert perr.max() <= 4  # float-vs-fixed IDCT wiggle


def test_multimodal_pipeline(ray_session):
    import ray.data as rd

    from sociallink_ray.stages import multimodal as mm

    tbl = mm.synth_media_table(48)
    ds = rd.from_arrow(tbl)
    # REAL decode path: PPM/WAV/RAWV payloads -> 16-dim features
    feats = mm.media_features(ds).to_pandas()
    assert len(feats) == 48
    assert all(len(f) == mm.FEATURE_DIM for f in feats["feature"])
    # deterministic: same payload -> same feature (and the fake
    # plumbing decoder still works for arbitrary bytes)
    feats2 = mm.media_features(rd.from_arrow(tbl), fake=True).to_pandas()
    assert len(feats2) == 48
    reals = mm.media_features(rd.from_arrow(tbl)).to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = reals.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["feature"], b["feature"]):
        assert np.allclose(list(x), list(y))
    # frame sampling flat-map (videos only): RAWV frames really parse
    # back out and each emitted frame is a decodable PPM
    vids = rd.from_arrow(tbl.filter(
        __import__("pyarrow").compute.equal(tbl["media_type"], "video")))
    frames = mm.sample_frames(vids).to_pandas()
    assert len(frames) > len(vids.to_pandas())
    for fr in frames["frame"].head(8):
        assert mm.decode_ppm(bytes(fr)).shape == (6, 8, 3)


def test_connected_components_matches_union_find(ray_session):
    """The distributed label-propagation path (the >2M-edge fallback the
    flagship never triggers at test scale) must produce the same
    components as the driver union-find on the same edge list."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    rng = np.random.RandomState(5)
    # several chained components + isolated pairs + a star
    edges = []
    for base in range(0, 400, 40):  # chains of 40 nodes
        edges += [(base + i, base + i + 1) for i in range(39)]
    edges += [(1000 + 2 * i, 1001 + 2 * i) for i in range(50)]  # pairs
    edges += [(5000, 5000 + i) for i in range(1, 30)]           # star
    rng.shuffle(edges)
    edf = pd.DataFrame(edges, columns=["a", "b"]).astype("int64")

    got = (
        dedup.connected_components(rd.from_pandas(edf))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exp = (
        dedup._union_find_components(edf, "node")
        .rename(columns={"cluster_id": "label"})
        .sort_values("node").reset_index(drop=True)
    )
    assert got["node"].tolist() == exp["node"].tolist()
    assert got["label"].tolist() == exp["label"].tolist()


def test_dense_bucket_pairs_connect_interleaved_subclusters():
    """Dense-bucket approximation (multi-star+chain+stride): when a
    bucket holds sub-clusters interleaved in sorted-id order and EVERY
    cross-cluster edge fails verification, the surviving intra-cluster
    edges must still connect each sub-cluster — the ADVICE-flagged
    failure mode of the single-star pattern. Guaranteed for interleave
    period <= 4 (one hub per residue class)."""
    from sociallink_ray.stages import dedup

    for period in (2, 3, 4):
        n = 200
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame({"bucket": np.zeros(n, dtype=np.int64), "id": ids})
        pairs = dedup._pairs_within_buckets(df, "bucket", "id", dense_cap=64)
        assert (pairs["a"] < pairs["b"]).all()
        assert len(pairs) <= 8 * n  # O(B), not O(B^2)
        # simulate verify: only same-cluster (same residue) edges survive
        surv = pairs[pairs["a"] % period == pairs["b"] % period]
        # union-find over survivors, per cluster
        lab = dedup._union_find_components(surv, "id")
        m = dict(zip(lab["id"], lab["cluster_id"]))
        for r in range(period):
            members = ids[ids % period == r]
            roots = {m.get(int(x), int(x)) for x in members}
            assert len(roots) == 1, (period, r, len(roots))
    # determinism
    df = pd.DataFrame({"bucket": 0, "id": np.arange(150, dtype=np.int64)})
    p1 = dedup._pairs_within_buckets(df, "bucket", "id", dense_cap=64)
    p2 = dedup._pairs_within_buckets(df, "bucket", "id", dense_cap=64)
    assert p1.equals(p2)


def test_approx_count_distinct_vs_exact(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from sociallink_ray.stages import ops

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"]
    )
    con = duckdb.connect()
    for col in ("user_id", "event_id"):
        exact = con.execute(
            f"SELECT count(DISTINCT {col}) FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()[0]
        est = ops.approx_count_distinct(ds, col, p=14)
        # p=14 -> sigma ~0.81%; small cardinalities hit the near-exact
        # linear-counting regime
        assert abs(est / exact - 1.0) < 0.04, (col, est, exact)


def test_approx_quantiles_vs_exact(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.stages import ops

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    xs = np.sort(
        pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_extendedprice"])
        ["l_extendedprice"].to_numpy()
    )
    qs = [0.01, 0.5, 0.99]
    ests = ops.approx_quantiles(ds, "l_extendedprice", qs)
    for q, est in zip(qs, ests):
        rank = np.searchsorted(xs, est) / len(xs)
        assert abs(rank - q) < 0.015, (q, est, rank)


def test_ann_lsh_recall_vs_brute_force(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.stages import ann

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().head(10)
    qdf = qdf.rename(columns={"vec_id": "query_id"})[["query_id", "embedding"]]
    exact = ann.ann_brute_force(ds, qdf, k=10).to_pandas()
    # NB: testdata embeddings are random (near-orthogonal), the hardest
    # case for SRP-LSH — generous probing keeps recall useful; on
    # clustered real embeddings fewer probes suffice
    approx = ann.ann_lsh(ds, qdf, k=10, num_planes=4, multiprobe=2).to_pandas()
    # recall@10 of the LSH variant vs exact
    recall = 0.0
    for qid in qdf["query_id"]:
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        recall += len(e & a) / max(len(e), 1)
    recall /= len(qdf)
    assert recall >= 0.5, recall  # approximate by design, but not useless


def test_ntriples_rendering(ray_session):
    import ray.data as rd

    from sociallink_ray.sources.rdf import to_ntriples_lines

    df = pd.DataFrame(
        {
            "subj": ["http://kb.example/resource/A", "_:b1"],
            "pred": ["http://www.w3.org/2002/07/owl#sameAs",
                     "http://sociallink.futuro.media/ontology#rank"],
            "obj": ["http://kb.example/resource/A", "1"],
        }
    )
    lines = to_ntriples_lines(df)["line"].tolist()
    assert lines[0] == (
        "<http://kb.example/resource/A> <http://www.w3.org/2002/07/owl#sameAs> "
        "<http://kb.example/resource/A> ."
    )
    assert lines[1] == (
        '_:b1 <http://sociallink.futuro.media/ontology#rank> "1" .'
    )
    # literal escaping: the chars N-Triples forbids raw (0x22 0x5C 0xA
    # 0xD) must escape — a name like `He said "hi"\n` must stay one line
    hostile = pd.DataFrame(
        {
            "subj": ["_:b2"],
            "pred": ["http://example.org/p"],
            "obj": ['He said "hi" \\ bye\nline2\rline3'],
        }
    )
    (line,) = to_ntriples_lines(hostile)["line"].tolist()
    assert "\n" not in line and "\r" not in line
    assert line == (
        '_:b2 <http://example.org/p> '
        '"He said \\"hi\\" \\\\ bye\\nline2\\rline3" .'
    )


def test_sessionize_and_profiles_small(ray_session):
    import ray.data as rd

    from sociallink_ray.stages.streaming import profile_aggregate, sessionize

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00",
                 "2024-01-01 00:00", "2024-01-01 02:00"]
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            "event_type": ["a", "b", "c", "d", "e"],
        }
    )
    ds = rd.from_pandas(df)
    s = sessionize(ds, "user_id", "ts", 30.0, "value", "event_id").to_pandas()
    u1 = s[s["user_id"] == 1].sort_values("session_id")
    assert u1["n_events"].tolist() == [2, 1]
    assert u1["total_value"].tolist() == [3.0, 3.0]
    p = profile_aggregate(
        rd.from_pandas(df), "user_id", "ts", {"value": "total_value"},
        ["event_type"], id_col="event_id",
    ).to_pandas()
    p1 = p[p["user_id"] == 1].iloc[0]
    assert p1["total_value"] == 6.0
    assert p1["last_event_type"] == "c"


def test_sliding_window_agg_small(ray_session):
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages import ops

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:40", "2024-01-01 01:10",
                 "2024-01-01 00:05"]
            ),
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = ops.sliding_window_agg(
        rd.from_pandas(df), "user_id", "ts",
        width=pd.Timedelta(hours=1), slide=pd.Timedelta(minutes=30),
        sums={"value": "total_value"}, count_as="n",
    ).to_pandas()
    # event 00:05 lands in windows [-30:00,30:00) start=23:30 and [00:00,01:00)
    u1 = out[out["user_id"] == 1].set_index("window_start").sort_index()
    w0 = pd.Timestamp("2024-01-01 00:00")
    assert u1.loc[w0, "total_value"] == 3.0  # 00:05 + 00:40
    assert u1.loc[pd.Timestamp("2024-01-01 00:30"), "total_value"] == 6.0  # 00:40 + 01:10
    assert u1.loc[pd.Timestamp("2024-01-01 01:00"), "total_value"] == 4.0
    assert int(u1.loc[w0, "n"]) == 2


def test_interval_count_join_small(ray_session):
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages import ops

    left = pd.DataFrame(
        {
            "event_id": [10, 11, 12],
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 01:00"]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 00:59", "2024-01-01 01:30",
                 "2024-01-01 00:30", "2024-01-01 23:00"]
            ),
        }
    )
    out = ops.interval_count_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="user_id", left_ts="ts", right_ts="ts",
        lower=pd.Timedelta(hours=-1), upper=pd.Timedelta(0),
        out_col="n_prev_1h",
    ).to_pandas()
    got = dict(zip(out["event_id"].astype(int), out["n_prev_1h"].astype(int)))
    assert got == {10: 2, 11: 1, 12: 1}


def test_exchange_group_apply_edge_cases(ray_session):
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages import ops

    # single hot key -> lands in ONE partition; most partitions empty
    df = pd.DataFrame({"k": [7] * 1000, "v": range(1000)})
    out = ops.bucketed_group_apply(
        rd.from_pandas(df).repartition(8), ["k"],
        lambda d, keys: d.groupby(keys, as_index=False)["v"].sum(),
        num_buckets=16,
    ).to_pandas()
    assert len(out) == 1 and int(out["v"].iloc[0]) == sum(range(1000))

    # P=1 degenerate exchange
    out1 = ops.bucketed_group_apply(
        rd.from_pandas(df), ["k"],
        lambda d, keys: d.groupby(keys, as_index=False)["v"].max(),
        num_buckets=1,
    ).to_pandas()
    assert int(out1["v"].iloc[0]) == 999


def test_exchange_join_left_with_sparse_right(ray_session):
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.stages import ops

    left = pd.DataFrame({"uid": [1, 2, 3, 4], "x": [10, 20, 30, 40]})
    right = pd.DataFrame({"uid": [2], "y": ["only"]})
    out = ops.exchange_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right),
        on=["uid"], how="left",
    ).to_pandas().sort_values("uid").reset_index(drop=True)
    assert out["x"].tolist() == [10, 20, 30, 40]
    assert out.loc[out["uid"] == 2, "y"].iloc[0] == "only"
    assert out.loc[out["uid"] != 2, "y"].isna().all()

    # post_fn fusion drops a column inside the reduce
    out2 = ops.exchange_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["uid"], how="left",
        post_fn=lambda d: d.drop(columns=["y"]),
    ).to_pandas()
    assert "y" not in out2.columns and len(out2) == 4


def test_ann_ivf_recall_vs_brute_force(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.stages import ann

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().head(10)
    qdf = qdf.rename(columns={"vec_id": "query_id"})[["query_id", "embedding"]]
    exact = ann.ann_brute_force(ds, qdf, k=10).to_pandas()
    # random near-orthogonal vectors are the IVF worst case too; probe
    # half the lists
    approx = ann.ann_ivf(ds, qdf, k=10, n_centroids=8, nprobe=4).to_pandas()
    recall = 0.0
    for qid in qdf["query_id"]:
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        recall += len(e & a) / max(len(e), 1)
    recall /= len(qdf)
    assert recall >= 0.5, recall
    # probing ALL lists must be exact
    full = ann.ann_ivf(ds, qdf, k=10, n_centroids=8, nprobe=8).to_pandas()
    for qid in qdf["query_id"]:
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        f = set(full.loc[full["query_id"] == qid, "vec_id"])
        assert e == f


def test_ivf_partitioned_index(ray_session, sf_dir, tmp_path):
    """ivf_build writes one parquet partition per inverted list;
    ivf_query reads ONLY probed partitions yet returns exactly what the
    scan-everything ann_ivf returns (same quantizer seed/sample)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.stages import ann

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().head(6)
    qdf = qdf.rename(columns={"vec_id": "query_id"})[["query_id", "embedding"]]

    idx = str(tmp_path / "ivf_index")
    C = ann.ivf_build(ds, idx, n_centroids=8, train_sample=4096)
    lists = sorted(d for d in os.listdir(idx) if d.startswith("ivf_list="))
    assert 1 < len(lists) <= 8

    # nprobe=2 with 6 queries: the probed union must PRUNE (strict
    # subset of all lists), and the pruned-read result must equal the
    # full-scan ann_ivf with the identical quantizer + probe map
    import numpy as np

    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probed = set(ann._probe_map(qmat, C, nprobe=2))
    scan = ann.ann_ivf(
        ds, qdf, k=5, n_centroids=8, nprobe=2, train_sample=4096
    ).to_pandas()
    pruned = ann.ivf_query(idx, qdf, k=5, nprobe=2).to_pandas()
    key = ["query_id", "vec_id"]
    assert (
        scan.sort_values(key).reset_index(drop=True)[key + ["rank"]]
        .equals(pruned.sort_values(key).reset_index(drop=True)[key + ["rank"]])
    )
    if len(probed) < len(lists):  # random vectors: nearly always true
        unprobed = [
            d for d in lists
            if int(d.split("=")[1]) not in probed
        ]
        assert unprobed  # pruning actually skipped bytes

    # probing every list through the partitioned path == brute force
    exact = ann.ann_brute_force(ds, qdf, k=5).to_pandas()
    full = ann.ivf_query(idx, qdf, k=5, nprobe=8).to_pandas()
    for qid in qdf["query_id"]:
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        f = set(full.loc[full["query_id"] == qid, "vec_id"])
        assert e == f


def test_svm_format_dump(ray_session, tmp_path):
    """S11 sink: libsvm lines `label idx:val ...`, sparse 1-based
    indices, zeros omitted; distributed per-task part files
    (GroupAndExtractFeatures.java:385-397)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.sources.svm import to_svm_lines, write_svm

    df = pd.DataFrame(
        {
            "label": ["u1", "u2", "u3"],
            "f_a": [0.5, 0.0, 1.25],
            "f_b": [0.0, 2.0, -3.5],
        }
    )
    lines = to_svm_lines(df, "label", ["f_a", "f_b"])["line"].tolist()
    assert lines == ["u1 1:0.5", "u2 2:2", "u3 1:1.25 2:-3.5"]

    out = str(tmp_path / "svm")
    manifest = write_svm(rd.from_pandas(df), out, "label", ["f_a", "f_b"])
    assert manifest["rows"].sum() == 3
    # round-trip: parse every line back and compare values
    got = {}
    for p in manifest["path"]:
        with open(p) as f:
            for ln in f.read().splitlines():
                parts = ln.split()
                got[parts[0]] = {
                    int(kv.split(":")[0]): float(kv.split(":")[1])
                    for kv in parts[1:]
                }
    assert got["u1"] == {1: 0.5}
    assert got["u2"] == {2: 2.0}
    assert np.isclose(got["u3"][2], -3.5)


def test_embedding_blocked_dup_recall_vs_exact(ray_session):
    """Centroid-blocked near-dup (the scale path) vs the exact O(n²)
    baseline on a corpus with PLANTED near-dup vectors: precision must
    be 1.0 (pairs are exactly verified) and recall high."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    rng = np.random.default_rng(42)
    base = rng.normal(size=(400, 32))
    vecs = [base[i] for i in range(400)]
    # plant 40 near-dup rows: tiny perturbations of existing rows
    for i in range(40):
        src = base[i * 7 % 400]
        vecs.append(src + rng.normal(scale=0.02, size=32))
    mat = np.stack(vecs).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(len(mat), dtype=np.int64),
         "embedding": list(mat)}
    )
    ds = rd.from_pandas(df)
    thr = 0.9
    exact = dedup.embedding_dup_pairs(ds, "embedding", "vec_id", thr).to_pandas()
    approx = dedup.embedding_blocked_dup_pairs(
        ds, "embedding", "vec_id", thr, n_centroids=8, n_probe=3
    ).to_pandas()
    e = set(zip(exact["a"], exact["b"]))
    a = set(zip(approx["a"], approx["b"]))
    assert len(e) >= 40
    assert a <= e, "blocked path emitted a pair the exact baseline lacks"
    recall = len(a & e) / len(e)
    assert recall >= 0.95, recall
    # verified cosines agree with the exact baseline on common pairs
    # (1e-6: the blocked path ships f32 vectors through the exchange)
    em = {(x, y): s for x, y, s in zip(exact["a"], exact["b"], exact["cos_sim"])}
    for x, y, s in zip(approx["a"], approx["b"], approx["cos_sim"]):
        assert abs(em[(x, y)] - s) < 1e-6


def test_funnel_stages_ordering_semantics(ray_session, tmp_path):
    """The funnel is ORDERED: a click before the first view doesn't
    count, a purchase before the first qualifying click doesn't count,
    and users with funnel events but no view sit at stage 0."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sociallink_ray.queries import QUERIES

    t = pd.Timestamp("2026-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # u1: click@0 (too early), view@1, click@2, purchase@3 -> stage 3
        (1, "click", t), (1, "view", t + s), (1, "click", t + 2 * s),
        (1, "purchase", t + 3 * s),
        # u2: purchase only -> stage 0 (in universe, no view)
        (2, "purchase", t),
        # u3: view then purchase, no click -> stage 1
        (3, "view", t), (3, "purchase", t + s),
        # u4: purchase@1 BEFORE the click@2 -> stage 2
        (4, "view", t), (4, "click", t + 2 * s), (4, "purchase", t + s),
        # u5: only non-funnel events -> excluded from universe
        (5, "error", t),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))

    out = (
        QUERIES["funnel_stages"](str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3, 4]
    assert out["stage"].tolist() == [3, 0, 1, 2]
    u1 = out.iloc[0]
    assert u1["t_view"] == t + s and u1["t_click"] == t + 2 * s
    assert u1["t_purchase"] == t + 3 * s
    assert pd.isna(out.iloc[1]["t_view"]) and pd.isna(out.iloc[3]["t_purchase"])


def test_bloom_prefilter_prunes_probe_side(ray_session):
    """The Bloom prefilter keeps every true match and drops ~99% of
    non-matching probe rows (10 bits/key) — the shuffle-volume
    guarantee the urgent_revenue query relies on."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from sociallink_ray.stages import ops

    build_keys = np.arange(0, 2000, dtype=np.int64)  # 0..1999
    probe_keys = np.arange(0, 100_000, dtype=np.int64)  # 2% match
    build = rd.from_arrow(pa.table({"k": build_keys}))
    bloom = ops.build_key_bloom(build, ["k"])
    ref = ray.put(bloom)
    probe = rd.from_arrow(pa.table({"k": probe_keys})).repartition(4)
    kept = probe.map_batches(
        ops.bloom_key_filter(ref, ["k"]), batch_format="pyarrow"
    ).to_pandas()["k"].to_numpy()
    assert np.isin(build_keys, kept).all()  # no false negatives
    fp = (~np.isin(kept, build_keys)).sum() / (len(probe_keys) - len(build_keys))
    assert fp < 0.02


def test_sample_frames_jpeg_rawv(ray_session):
    """RAWV containers carrying JPEG frames: sampled frames decode via
    the vendored codec in the feature path (no PIL skip)."""
    import ray.data as rd

    from sociallink_ray.functions.jpeg import encode_jpeg
    from sociallink_ray.stages import multimodal as mm

    rng = np.random.RandomState(3)
    frames = [
        encode_jpeg(
            rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8), quality=95
        )
        for _ in range(5)
    ]
    tbl = __import__("pyarrow").table(
        {
            "media_id": __import__("pyarrow").array([1], "int64"),
            "media_type": __import__("pyarrow").array(["video"]),
            "payload": __import__("pyarrow").array(
                [mm.encode_rawv(frames)], "binary"
            ),
            "width": __import__("pyarrow").array([8], "int32"),
            "height": __import__("pyarrow").array([8], "int32"),
            "duration_ms": __import__("pyarrow").array([3000], "int32"),
        }
    )
    ds = rd.from_arrow(tbl)
    out = mm.sample_frames(ds, every_ms=1000).to_pandas()
    assert len(out) == 3
    # every sampled frame is a decodable JPEG and featurizes
    for fr in out["frame"]:
        img = mm._decode_frame(bytes(fr))
        assert img.shape == (8, 8, 3)
    # the feature stage consumes the JPEG-framed video end-to-end
    feats = mm.media_features(ds).to_pandas()
    assert len(feats) == 1
    v = np.asarray(feats["feature"].iloc[0])
    assert v.shape == (mm.FEATURE_DIM,) and np.isfinite(v).all()


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker — the
    decoder must skip them (review finding: treating the second 0xFF
    as a marker consumed real marker bytes as a segment length)."""
    from sociallink_ray.functions.jpeg import decode_jpeg, encode_jpeg

    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 16, yy * 16, (xx + yy) * 8], axis=-1).astype(
        np.uint8
    )
    payload = encode_jpeg(img, quality=95)
    # inject fill bytes before the DQT marker (FF DB)
    i = payload.index(b"\xff\xdb")
    stuffed = payload[:i] + b"\xff\xff\xff" + payload[i:]
    dec = decode_jpeg(stuffed)
    assert np.array_equal(dec, decode_jpeg(payload))

"""Regression tests for the round-2 ADVICE findings: heavy_hitters
batch-count loss, packed-pair uid-overflow guard, zero-frame RAWV
sampling, and the _find_article fast-path case ordering."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_heavy_hitters_counts_batches_with_empty_summary(ray_session):
    """A batch whose MG summary cancels to {} (> k distinct items all
    tying) must still contribute its row count to n — otherwise the
    n/(k+1) guarantee threshold is computed over too few rows."""
    import ray.data as rd

    from sociallink_ray.stages import ops

    # 100 distinct singletons, k=2 -> per-batch summary is empty
    df = pd.DataFrame({"x": [f"t{i}" for i in range(100)]})
    acc, n = ops.heavy_hitters(rd.from_pandas(df), "x", k=2)
    assert n == 100

    # mixed: one genuinely heavy item among the singleton noise; the
    # guarantee (count > n/(k+1) -> retained) must hold with the FULL n
    df2 = pd.DataFrame({"x": ["HH"] * 50 + [f"t{i}" for i in range(100)]})
    acc2, n2 = ops.heavy_hitters(rd.from_pandas(df2), "x", k=4)
    assert n2 == 150
    assert "HH" in acc2  # 50 > 150/5


def test_pairs_packed_uid_range_validated():
    """uids must be validated on the RAW values: a uid in [2^32, 2^33)
    as the larger pair element overflows into the high word and would
    pass a packed-high-word check while decoding to a wrong edge."""
    from sociallink_ray.pipelines.graph import _pairs_packed_from_lists

    def lists(vals):
        return pa.array([vals], pa.list_(pa.int64()))

    # the ADVICE counterexample: (5, 2^32) packs to (6<<32)|0
    with pytest.raises(ValueError):
        _pairs_packed_from_lists(lists([5, 2**32]))
    with pytest.raises(ValueError):
        _pairs_packed_from_lists(lists([-1, 3]))
    # boundary: 2^32 - 1 is legal and round-trips
    pk = _pairs_packed_from_lists(lists([5, 2**32 - 1]))
    assert pk.size == 1
    a = int(pk[0] >> np.uint64(32))
    b = int(pk[0] & np.uint64(0xFFFFFFFF))
    assert (a, b) == (5, 2**32 - 1)


def test_frame_sample_zero_frame_container():
    """encode_rawv([]) is a legal payload; sampling it must emit no
    frames rather than raise IndexError."""
    from sociallink_ray.stages import multimodal as mm

    img = np.zeros((6, 8, 3), dtype=np.uint8)
    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [mm.encode_rawv([]), mm.encode_rawv([mm.encode_ppm(img)])],
                pa.binary(),
            ),
            "duration_ms": pa.array([3000, 3000], pa.int64()),
        }
    )
    out = mm.FrameSampleStage(every_ms=1000)(tbl)
    got = out.to_pydict()
    assert 1 not in got["media_id"]  # zero-frame container -> no rows
    assert got["media_id"].count(2) >= 1  # normal container still samples


def test_find_article_uppercase_before_lowercase():
    """An uppercase <ARTICLE> preceding a lowercase <article> must win
    (first-match regex semantics); the lowercase fast path may only
    fire when its hit is the first article tag of any case."""
    from sociallink_ray.functions.textnorm import _find_article

    assert (
        _find_article("<ARTICLE>up</ARTICLE><article>low</article>") == "up"
    )
    assert (
        _find_article("<Article id=1>mixed</article><article>low</article>")
        == "mixed"
    )
    # pure fast path still works, including the lookalike-tag reject
    assert _find_article("<article>x</article>") == "x"
    assert _find_article('<article class="a">y</article>') == "y"
    assert _find_article("<articlex>no</articlex>") is None
    assert (
        _find_article("<articlex>no</articlex><article>yes</article>")
        == "yes"
    )


def test_event_transitions_half_away_rounding(ray_session, tmp_path):
    """q_event_transitions must round p half-away-from-zero like the
    DuckDB oracle: p = 1/128 = 0.0078125 is exactly representable and
    ties at 6dp — half-to-even would give 0.007812, oracle 0.007813."""
    import duckdb
    import pyarrow.parquet as pq

    # one user, 130 events, 129 transitions; prev='a' for 128 of them
    # with exactly one a->b => p(a->b) = 1/128 = 0.0078125, a 6dp tie
    seq = ["a"] * 130
    seq[64] = "b"  # a->b at i=63, b->a at i=64
    n = len(seq)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": seq,
            "ts": pd.to_datetime(np.arange(n), unit="s"),
        }
    )

    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    from sociallink_ray.queries import QUERIES, ORACLE_SQL

    res = QUERIES["event_transitions"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    exp = con.execute(ORACLE_SQL["event_transitions"]).df()
    got = res.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    exp = exp.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["prev_type", "next_type", "n", "p"]].astype({"n": "int64"}),
        exp[["prev_type", "next_type", "n", "p"]].astype({"n": "int64"}),
    )
    # the tie row itself must carry the half-away value
    tie = got[(got.prev_type == "a") & (got.next_type == "b")]
    assert len(tie) == 1 and abs(tie.iloc[0]["p"] - 0.007813) < 1e-12


def test_grouped_hll_empty_batch_typed(ray_session):
    """A zero-row batch through grouped_approx_count_distinct must emit
    typed-empty key/reg columns, not null-typed inferred-from-[] ones
    that break Arrow schema unification in the exchange."""
    import ray.data as rd

    from sociallink_ray.stages import ops

    df = pd.DataFrame(
        {"k": ["x"] * 10 + ["y"] * 5, "v": [str(i) for i in range(15)]}
    )
    # force empty blocks alongside non-empty ones
    ds = rd.from_pandas([df.iloc[:0], df, df.iloc[:0]])
    out = ops.grouped_approx_count_distinct(ds, ["k"], "v").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == ["x", "y"]
    # linear-counting regime: near-exact at these cardinalities
    assert abs(out["approx_distinct"].iloc[0] - 10) <= 1
    assert abs(out["approx_distinct"].iloc[1] - 5) <= 1


def test_truncated_jpeg_raises_value_error():
    """Round-4 ADVICE: corrupt/truncated JPEG payloads must raise the
    DECLARED ValueError (not IndexError/struct.error) — decode_jpeg is
    the production PIL-less fallback for arbitrary crawl payloads, so
    malformed bytes are data errors, not crashes."""
    from sociallink_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    # every truncation point must yield ValueError or a full decode
    # (cutting only the EOI trailer can still decode completely)
    for cut in (3, 4, 10, 21, 40, 100, len(payload) // 2, len(payload) - 40):
        try:
            out = decode_jpeg(payload[:cut])
            assert out.shape == (24, 32, 3)
        except ValueError:
            pass
    # flipped segment-length bytes (huge seglen) -> declared error
    corrupt = bytearray(payload)
    corrupt[4:6] = b"\xff\xff"
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(corrupt))


def test_jpeg_lut_decode_matches_dict_path():
    """The 16-bit LUT Huffman fast path decodes identically to the
    (size, code) dict walk it replaced — pinned on both subsample
    modes and restart intervals."""
    from sociallink_ray.functions import jpeg as J

    rng = np.random.RandomState(7)
    for sub in (False, True):
        img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
        payload = J.encode_jpeg(img, quality=85, subsample=sub)
        fast = J.decode_jpeg(payload)
        # reference: force the dict walk by re-decoding with the LUT
        # swapped out for an equivalent per-bit decode
        lut_decode = J._decode_huff_fast
        try:
            def slow(r, sym, ln):
                code = 0
                for size in range(1, 17):
                    code = (code << 1) | r.read_bits(1)
                    lo = code << (16 - size)
                    if ln[lo] == size and (code + 1 << (16 - size)) > lo:
                        return int(sym[lo])
                raise ValueError("invalid Huffman code")

            J._decode_huff_fast = slow
            ref = J.decode_jpeg(payload)
        finally:
            J._decode_huff_fast = lut_decode
        assert (fast == ref).all()


def test_png_filters_vectorized_roundtrip():
    """Sub/Average/Paeth unfiltering (now cumsum / per-pixel-vector)
    must reconstruct exactly — pinned by hand-filtering a known image
    with each filter type and decoding."""
    import struct
    import zlib

    from sociallink_ray.functions.png import PNG_MAGIC, decode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    H, W = img.shape[:2]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def encode_with_filters(filters):
        raw = bytearray()
        prev = np.zeros((W, 3), dtype=np.int64)
        for r in range(H):
            ft = filters[r % len(filters)]
            line = img[r].astype(np.int64)
            if ft == 0:
                enc = line
            elif ft == 1:  # Sub
                enc = line.copy()
                enc[1:] = (line[1:] - line[:-1]) & 0xFF
            elif ft == 2:  # Up
                enc = (line - prev) & 0xFF
            elif ft == 3:  # Average
                enc = line.copy()
                for x in range(W):
                    a = line[x - 1] if x else np.zeros(3, dtype=np.int64)
                    enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
            else:  # Paeth
                enc = line.copy()
                for x in range(W):
                    a = line[x - 1] if x else np.zeros(3, dtype=np.int64)
                    b = prev[x]
                    c = prev[x - 1] if x else np.zeros(3, dtype=np.int64)
                    p = a + b - c
                    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_), a,
                        np.where(pb_ <= pc_, b, c),
                    )
                    enc[x] = (line[x] - pred) & 0xFF
            raw.append(ft)
            raw.extend(enc.astype(np.uint8).ravel().tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
        return (
            PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    for filters in ([1], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(encode_with_filters(filters))
        assert (got == img).all(), filters


def test_tiled_dedup_handles_empty_upstream_blocks(ray_session):
    """Round-4 ADVICE: empty upstream blocks must emit the SAME
    FixedSizeList type as data blocks (schema unification), and the
    result must match the un-padded run."""
    import ray.data as rd

    from sociallink_ray.stages.dedup import embedding_dup_pairs_tiled

    rng = np.random.RandomState(5)
    base = rng.normal(size=(40, 8))
    vecs = np.concatenate([base, base[:5] + 1e-9])  # planted dups
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": list(vecs)}
    )
    ds = rd.from_pandas(df).repartition(20)  # some blocks empty-ish
    out = (
        embedding_dup_pairs_tiled(ds, "embedding", "vec_id", 0.99)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) >= 5
    assert set(zip(out["a"], out["b"])) >= {(i, 40 + i) for i in range(5)}

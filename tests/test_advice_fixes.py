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

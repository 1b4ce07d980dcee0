"""Property-based tests (hypothesis) for the exchange primitives'
invariants — pure kernels, no Ray session needed.

The exchange's correctness rests on two properties that unit examples
can't exhaust:
1. `_split_table` partitions a block losslessly and co-locates equal
   keys (else joins drop matches silently).
2. `_canon_key_hash` hashes LOGICALLY equal keys identically whatever
   physical dtype a block materialized as (int64 vs float64 from a
   nulled arrow column vs object) — the ADVICE-flagged silent-mismatch
   risk.
"""

import pytest
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sociallink_ray.stages import ops

keys_ints = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=200
)


@settings(max_examples=100, deadline=None)
@given(keys=keys_ints, p=st.integers(min_value=1, max_value=17))
def test_split_table_lossless_and_colocated(keys, p):
    vals = np.arange(len(keys), dtype=np.int64)
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": vals})
    parts = ops._split_table(tbl, ["k"], p)
    assert len(parts) == p
    # lossless: every input row appears exactly once across partitions
    nonempty = [x for x in parts if x.num_rows]
    if not nonempty:
        assert tbl.num_rows == 0
        return
    got = pa.concat_tables(nonempty)
    assert got.num_rows == tbl.num_rows
    assert sorted(got["v"].to_pylist()) == sorted(vals.tolist())
    # co-location: a key value never appears in two partitions
    seen: dict[int, int] = {}
    for i, part in enumerate(parts):
        for k in set(part["k"].to_pylist()):
            assert seen.setdefault(k, i) == i, (k, seen[k], i)


@settings(max_examples=100, deadline=None)
@given(keys=st.lists(st.integers(min_value=-(2**31), max_value=2**31),
                     min_size=1, max_size=100))
def test_canon_key_hash_dtype_invariance(keys):
    """int64, integral float64, and object blocks of the same logical
    keys must hash identically (nulled arrow int columns round-trip
    through numpy as float64)."""
    as_int = np.asarray(keys, dtype=np.int64)
    as_float = as_int.astype(np.float64)
    as_obj = np.asarray([int(k) for k in keys], dtype=object)
    h_int = ops._canon_key_hash(as_int, "k")
    h_float = ops._canon_key_hash(as_float, "k")
    h_obj = ops._canon_key_hash(as_obj, "k")
    assert np.array_equal(h_int, h_float)
    assert np.array_equal(h_int, h_obj)


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=1000), min_size=1,
                  max_size=100),
    null_at=st.integers(min_value=0, max_value=99),
)
def test_canon_key_hash_nulls_dont_shift_others(keys, null_at):
    """Introducing a null (-> float64 block with NaN) must not change
    any OTHER key's partition assignment."""
    null_at = null_at % len(keys)
    as_int = np.asarray(keys, dtype=np.int64)
    with_nan = as_int.astype(np.float64)
    with_nan[null_at] = np.nan
    h_int = ops._canon_key_hash(as_int, "k")
    h_nan = ops._canon_key_hash(with_nan, "k")
    mask = np.ones(len(keys), dtype=bool)
    mask[null_at] = False
    assert np.array_equal(h_int[mask], h_nan[mask])


def test_bloom_prefilter_join_equivalence(ray_session):
    """exchange_join(bloom_prefilter=True) must return exactly the same
    rows as the plain join, while the prefilter provably drops
    non-matching rows before the shuffle."""
    import ray
    import ray.data as rd

    rng = np.random.RandomState(13)
    left = pd.DataFrame(
        {"k": rng.randint(0, 100_000, size=20_000), "v": np.arange(20_000)}
    )
    right = pd.DataFrame({"k": np.arange(0, 1000), "w": np.arange(1000) * 2})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    plain = (
        ops.exchange_join(lds, rds, on=["k"], how="inner")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    pre = (
        ops.exchange_join(lds, rds, on=["k"], how="inner",
                          bloom_prefilter=True)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, pre)
    # the filter itself drops ~99% of the non-matching left rows
    bloom_ref = ray.put(ops.build_key_bloom(rds, ["k"]))
    f = ops.bloom_key_filter(bloom_ref, ["k"])
    kept = f(pa.table({"k": left["k"].to_numpy()})).num_rows
    truly = int((left["k"] < 1000).sum())
    assert truly <= kept < truly + 0.05 * len(left)


@settings(max_examples=50, deadline=None)
@given(
    toks=st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=12),
                  min_size=1, max_size=50)
)
def test_canon_key_hash_strings_stable(toks):
    """String keys: equal values hash equally across object arrays and
    reordered blocks (hash is per-value, not positional)."""
    a = np.asarray(toks, dtype=object)
    ha = ops._canon_key_hash(a, "k")
    perm = np.random.RandomState(0).permutation(len(toks))
    hb = ops._canon_key_hash(a[perm], "k")
    assert np.array_equal(ha[perm], hb)


def test_grouping_sets_sum_matches_pandas(ray_session):
    """grouping_sets_sum over an arbitrary (non-prefix) set list must
    match a per-set pandas groupby, and reject sets outside the key
    list."""
    import pytest
    import ray.data as rd

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=500),
            "b": rng.choice(["p", "q"], size=500),
            "v": rng.randint(0, 100, size=500).astype(np.float64),
        }
    )
    sets = [["a", "b"], ["b"], []]
    got = (
        ops.grouping_sets_sum(
            rd.from_pandas(df), ["a", "b"], sets, sums={"v": "sv"}, count_as="n"
        )
        .to_pandas()
        .sort_values(["a", "b", "sv"], na_position="first")
        .reset_index(drop=True)
    )
    exp_parts = []
    for s in sets:
        if s:
            p = df.groupby(s, as_index=False).agg(sv=("v", "sum"), n=("v", "size"))
        else:
            p = pd.DataFrame({"sv": [df["v"].sum()], "n": [len(df)]})
        for k in ["a", "b"]:
            if k not in p.columns:
                p[k] = pd.Series([None] * len(p), dtype=object)
        exp_parts.append(p[["a", "b", "sv", "n"]])
    exp = (
        pd.concat(exp_parts, ignore_index=True)
        .sort_values(["a", "b", "sv"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(got["sv"].to_numpy(np.float64), exp["sv"].to_numpy(np.float64))
    assert (got["n"].to_numpy(np.int64) == exp["n"].to_numpy(np.int64)).all()
    assert got["a"].fillna("∅").tolist() == exp["a"].fillna("∅").tolist()
    assert got["b"].fillna("∅").tolist() == exp["b"].fillna("∅").tolist()

    with pytest.raises(ValueError):
        ops.grouping_sets_sum(rd.from_pandas(df), ["a"], [["zzz"]])


def test_grouped_moments_matches_pandas(ray_session):
    """grouped_moments sufficient-statistic stats must match pandas'
    numerically-stable var/std/cov/corr to float tolerance, including
    the n==1 -> NULL sample-variance edge."""
    import ray.data as rd

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], size=400),
            "u": rng.normal(1000.0, 50.0, size=400),
            "v": rng.normal(5.0, 2.0, size=400),
        }
    )
    # singleton group: var/std/covar must come back NULL (n-1 == 0)
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "u": [3.0], "v": [4.0]})],
        ignore_index=True,
    )
    got = (
        ops.grouped_moments(
            rd.from_pandas(df).repartition(7), ["g"],
            cols=["u"], pairs=[("u", "v")],
        )
        .to_pandas()
        .sort_values("g")
        .set_index("g")
    )
    exp = df.groupby("g").agg(
        n=("u", "size"), u_mean=("u", "mean"), u_var=("u", "var"),
        u_std=("u", "std"),
    )
    cov = df.groupby("g").apply(
        lambda d: d["u"].cov(d["v"]), include_groups=False
    )
    cor = df.groupby("g").apply(
        lambda d: d["u"].corr(d["v"]), include_groups=False
    )
    assert (got["n"].to_numpy(np.int64) == exp["n"].to_numpy(np.int64)).all()
    for col, ref in [
        ("u_mean", exp["u_mean"]), ("u_var", exp["u_var"]),
        ("u_std", exp["u_std"]), ("covar_u_v", cov), ("corr_u_v", cor),
    ]:
        a = got[col].to_numpy(np.float64)
        b = ref.loc[got.index].to_numpy(np.float64)
        assert np.allclose(a, b, rtol=1e-9, equal_nan=True), col
    assert np.isnan(got.loc["solo", "u_var"])


def test_shift_per_group_matches_pandas(ray_session):
    """shift_per_group lag/lead must equal the per-partition ordered
    pandas shift, with NULLs past partition edges."""
    import ray.data as rd

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 40, size=300),
            "t": rng.permutation(300),
            "val": rng.uniform(0, 100, size=300),
        }
    )
    got = (
        ops.shift_per_group(
            rd.from_pandas(df).repartition(5), ["k"], ["t"],
            shifts=[("val", 1, "prev"), ("val", -2, "next2")],
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "t"]).reset_index(drop=True)
    g = exp.groupby("k", sort=False)
    exp["prev"] = g["val"].shift(1)
    exp["next2"] = g["val"].shift(-2)
    exp = exp.sort_values(["k", "t"]).reset_index(drop=True)
    for c in ["val", "prev", "next2"]:
        assert np.allclose(
            got[c].to_numpy(np.float64), exp[c].to_numpy(np.float64),
            equal_nan=True,
        ), c


def test_set_op_matches_python_sets(ray_session):
    """set_op INTERSECT/EXCEPT must equal Python set semantics on the
    distinct row sets (duplicates collapse, order-free)."""
    import ray.data as rd

    rng = np.random.RandomState(5)
    a_vals = rng.randint(0, 50, size=200)
    b_vals = rng.randint(25, 75, size=200)
    a = rd.from_pandas(pd.DataFrame({"k": a_vals})).repartition(4)
    b = rd.from_pandas(pd.DataFrame({"k": b_vals})).repartition(3)
    got_i = set(ops.set_op(a, b, ["k"], how="intersect").to_pandas()["k"])
    got_e = set(ops.set_op(a, b, ["k"], how="except").to_pandas()["k"])
    sa, sb = set(a_vals.tolist()), set(b_vals.tolist())
    assert got_i == sa & sb
    assert got_e == sa - sb

    import pytest

    with pytest.raises(ValueError):
        ops.set_op(a, b, ["k"], how="union")


def test_hot_key_skew_bounded_by_combiners(ray_session):
    """The north rule's skew requirement, evidenced explicitly: a
    Zipf-pathological key (95% of all rows) must (a) still aggregate
    correctly and (b) reach the exchange pre-shrunk by the map-side
    combiner to at most one row per (key, batch) — so the hot key
    costs ONE reduce row per map task, never a corpus-sized reduce
    partition. Same check for per-group top-k, whose partial head
    caps the hot key at k rows per batch."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sociallink_ray.stages import ops

    rng = np.random.default_rng(7)
    n, n_blocks = 100_000, 10
    key = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 50, n)).astype(
        np.int64
    )
    val = rng.integers(0, 1000, n).astype(np.int64)
    df = pd.DataFrame({"k": key, "v": val})
    ds = rd.from_pandas(df).repartition(n_blocks).materialize()

    # (a) correctness under skew
    got = (
        ops.partial_groupby_sum(ds, ["k"], sums={"v": "sv"}, count_as="n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(sv=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # (b) combiner bound: per batch, at most one row per key leaves
    combine = ops.groupby_sum_combiner(["k"], sums={"v": "sv"}, count_as="n")
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        out = combine(batch)
        assert out.num_rows <= pa.compute.count_distinct(batch["k"]).as_py()
        hot = out.filter(pa.compute.equal(out["k"], pa.scalar(7)))
        assert hot.num_rows <= 1

    # per-group top-k under the same skew: exact result, partial head
    # bounds the hot key's exchange contribution at k rows per batch
    topk = (
        ops.topk_per_group(ds, ["k"], "v", k=3)
        .to_pandas()
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    want_top = (
        df.sort_values(["v"], ascending=False, kind="mergesort")
        .groupby("k", as_index=False)
        .head(3)
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert len(topk) == len(want_top)
    # values (not row identity — ties) must agree per key
    got_vals = topk.groupby("k")["v"].apply(list).to_dict()
    want_vals = want_top.groupby("k")["v"].apply(list).to_dict()
    assert got_vals == want_vals


def test_exchange_id_anti_semi_join_matches_pandas(ray_session):
    """exchange_id_anti_join (ANTI and SEMI modes) == pandas isin on
    random data with duplicate keys on both sides."""
    import ray.data as rd

    from sociallink_ray.stages import ops

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "id": rng.integers(0, 200, 500).astype(np.int64),
            "v": rng.normal(size=500),
        }
    )
    keys = pd.DataFrame({"id": rng.integers(0, 200, 120).astype(np.int64)})
    lds = rd.from_pandas(left).repartition(7)
    kds = rd.from_pandas(keys).repartition(3)

    got_anti = (
        ops.exchange_id_anti_join(lds, kds, "id")
        .to_pandas().sort_values(["id", "v"]).reset_index(drop=True)
    )
    want_anti = (
        left[~left["id"].isin(keys["id"])]
        .sort_values(["id", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_anti, want_anti)

    got_semi = (
        ops.exchange_id_anti_join(lds, kds, "id", anti=False)
        .to_pandas().sort_values(["id", "v"]).reset_index(drop=True)
    )
    want_semi = (
        left[left["id"].isin(keys["id"])]
        .sort_values(["id", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_semi, want_semi)

    # empty key side: anti passes everything, semi nothing
    empty = rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype="int64")}))
    assert ops.exchange_id_anti_join(lds, empty, "id").count() == len(left)
    assert ops.exchange_id_anti_join(lds, empty, "id", anti=False).count() == 0


def test_presplit_side_equivalence(ray_session):
    """An exchange with one side presplit (ops.presplit) produces
    exactly what the plain two-Dataset exchange produces — same keys,
    same partition count, reused across several calls."""
    import ray.data as rd

    from sociallink_ray.stages import ops

    rng = np.random.default_rng(5)
    a = pd.DataFrame(
        {"k": rng.integers(0, 50, 400).astype(np.int64),
         "x": rng.normal(size=400)}
    )
    b = pd.DataFrame(
        {"k": rng.integers(0, 50, 300).astype(np.int64),
         "y": rng.normal(size=300)}
    )
    ads = rd.from_pandas(a).repartition(5)
    bds = rd.from_pandas(b).repartition(4)

    def join(adf, bdf):
        return adf.merge(bdf, on="k", how="inner")

    plain = (
        ops.exchange_coapply([ads, bds], ["k"], join, num_partitions=6)
        .to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True)
    )
    pre = ops.presplit(ads, ["k"], 6)
    for _ in range(3):  # reuse across repeated exchanges
        got = (
            ops.exchange_coapply([pre, bds], ["k"], join, num_partitions=6)
            .to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, plain)

    # mismatched partition count is an explicit error, not silence
    with pytest.raises(ValueError, match="num_partitions must match"):
        ops.exchange_coapply([pre, bds], ["k"], join, num_partitions=5)
    # mismatched keys likewise
    with pytest.raises(ValueError, match="keyed on different columns"):
        ops.exchange_coapply([pre, bds], ["x"], join, num_partitions=6)


def test_quick_col_sum_exact_ints_and_missing_column(ray_session):
    """Integer sums through quick_col_sum are EXACT above 2^53 (the
    convergence checks in connected_components/bfs compare consecutive
    label sums — float64 rounding would terminate early at scale), and
    a missing column on a non-empty block raises instead of silently
    reporting zero."""
    import ray.data as rd

    from sociallink_ray.stages import ops

    big = (1 << 60) + 1
    df = pd.DataFrame({"label": np.array([big, 1, 2], dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(2).materialize()
    s, n = ops.quick_col_sum(ds, "label")
    assert s == big + 3 and n == 3
    assert isinstance(s, int)
    # float64 would have lost the +3 entirely
    assert s != int(float(big) + 3.0) or float(s) != float(big)

    import ray as _ray

    with pytest.raises(_ray.exceptions.RayTaskError, match="missing from"):
        ops.quick_col_sum(ds, "nope")

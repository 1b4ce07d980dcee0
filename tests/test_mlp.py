"""MLP pairwise scorer: distributed-trainer parity vs an independent
single-process numpy reference (the bar set by
test_listwise_trainer_matches_naive_reference), ensemble-average
serving semantics (api.py:19-46), and the flagship P/R gate with
scorer="mlp"."""

import numpy as np
import pandas as pd
import pytest

from sociallink_ray.fixtures import build_corpus

CORPUS = "/tmp/slr_corpus_mlp_sf0.001"


@pytest.fixture(scope="module")
def corpus(ray_session):
    build_corpus(CORPUS, sf=0.001)
    return CORPUS


def _toy_table(n=1200, d=5, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = ((X[:, 0] + X[:, 1] * X[:, 2]) > 0.2).astype(np.int64)
    cols = [f"f{i}" for i in range(d)]
    df = pd.DataFrame(X, columns=cols)
    df["resource_id"] = np.arange(n)
    df["uid"] = np.arange(n) + 10_000
    gold = pd.DataFrame(
        {
            "resource_id": df["resource_id"][y == 1].to_numpy(),
            "uid": df["uid"][y == 1].to_numpy(),
        }
    )
    return df, gold, cols, y


def _naive_mlp_fit(
    chunk_frames, gold, cols, layers, units, rounds, batch_size, lr,
    keep, seed, class_weight=True,
):
    """Independent single-process reference: same chunk layout, seeds,
    and update schedule as train_scorer_mlp, re-derived with plain
    loops (per-layer forward, manual backprop, textbook Adam with
    global-norm clip 5.0). Shares only init_mlp_params (identical
    truncated-normal draws are part of the contract being pinned)."""
    from sociallink_ray.pipelines.mlp import init_mlp_params

    gmap = dict(zip(gold["resource_id"], gold["uid"]))
    labeled = []
    for f in chunk_frames:
        X = f[cols].to_numpy(dtype=np.float64)
        y = (
            f["uid"].to_numpy()
            == f["resource_id"].map(gmap).fillna(-1).astype("int64").to_numpy()
        ).astype(np.float64)
        labeled.append((X, y))
    n = sum(len(y) for _, y in labeled)
    s1 = sum(X.sum(axis=0) for X, _ in labeled)
    s2 = sum((X * X).sum(axis=0) for X, _ in labeled)
    npos = sum(y.sum() for _, y in labeled)
    mean = s1 / n
    std = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
    std[std == 0] = 1.0
    pos_w = max(1.0, (n - npos) / max(npos, 1.0)) if class_weight else 1.0
    chunks = [
        ((X - mean) / std, y, np.where(y == 1.0, pos_w, 1.0))
        for X, y in labeled
    ]
    params = init_mlp_params(len(cols), layers, units, seed=seed)
    t = 0
    ms = [[np.zeros_like(W), np.zeros_like(b)] for W, b in params]
    vs = [[np.zeros_like(W), np.zeros_like(b)] for W, b in params]
    for rnd in range(rounds):
        g_sum = [
            [np.zeros_like(W), np.zeros_like(b)] for W, b in params
        ]
        sw_total = 0.0
        for cid, (Xs, y, sw) in enumerate(chunks):
            rng = np.random.default_rng((seed, rnd, cid))
            idx = rng.choice(len(y), size=min(batch_size, len(y)),
                             replace=False)
            Xb, yb, swb = Xs[idx], y[idx], sw[idx]
            # forward with dropout
            acts = [Xb]
            tanhs, masks = [], []
            a = Xb
            for W, b in params[:-1]:
                h = np.tanh(a @ W + b)
                tanhs.append(h)
                if keep < 1.0:
                    mask = (rng.random(h.shape) < keep).astype(
                        np.float64
                    ) / keep
                    a = h * mask
                else:
                    mask = None
                    a = h
                masks.append(mask)
                acts.append(a)
            Wo, bo = params[-1]
            logits = a @ Wo + bo
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            p = e / e.sum(axis=1, keepdims=True)
            y1 = np.zeros_like(p)
            y1[np.arange(len(yb)), yb.astype(np.int64)] = 1.0
            dz = (p - y1) * swb[:, None]
            g_sum[-1][0] += acts[-1].T @ dz
            g_sum[-1][1] += dz.sum(axis=0)
            da = dz @ Wo.T
            for i in range(layers - 1, -1, -1):
                if masks[i] is not None:
                    da = da * masks[i]
                dzh = da * (1.0 - tanhs[i] * tanhs[i])
                g_sum[i][0] += acts[i].T @ dzh
                g_sum[i][1] += dzh.sum(axis=0)
                if i > 0:
                    da = dzh @ params[i][0].T
            sw_total += float(swb.sum())
        grads = [(gW / sw_total, gb / sw_total) for gW, gb in g_sum]
        flat = np.concatenate(
            [g.ravel() for gW, gb in grads for g in (gW, gb)]
        )
        gn = float(np.linalg.norm(flat))
        scale = 5.0 / gn if gn > 5.0 else 1.0
        t += 1
        new_params = []
        for i, ((W, b), (gW, gb)) in enumerate(zip(params, grads)):
            upd = []
            for j, (theta, g) in enumerate(
                ((W, gW * scale), (b, gb * scale))
            ):
                ms[i][j] = 0.9 * ms[i][j] + 0.1 * g
                vs[i][j] = 0.999 * vs[i][j] + 0.001 * (g * g)
                mh = ms[i][j] / (1 - 0.9**t)
                vh = vs[i][j] / (1 - 0.999**t)
                upd.append(theta - lr * mh / (np.sqrt(vh) + 1e-8))
            new_params.append((upd[0], upd[1]))
        params = new_params
    return mean, std, params


def test_mlp_trainer_matches_naive_reference(ray_session):
    import ray
    import ray.data as rd

    from sociallink_ray.pipelines.mlp import (
        mlp_score_matrix,
        train_scorer_mlp,
    )

    df, gold, cols, _ = _toy_table()
    ds = rd.from_pandas(df).repartition(4).materialize()
    m = train_scorer_mlp(
        ds, gold, cols=cols, layers=2, units=16, rounds=40,
        batch_size=64, lr=4e-4, dropout_keep=0.5, seed=5,
    )
    # reconstruct the SAME chunk layout the trainer saw (block order of
    # the materialized dataset) — data plumbing only, no trainer code
    frames = [
        ray.get(r).to_pandas() for r in ds.to_arrow_refs()
    ]
    mean, std, params = _naive_mlp_fit(
        frames, gold, cols, layers=2, units=16, rounds=40,
        batch_size=64, lr=4e-4, keep=0.5, seed=5,
    )
    assert np.allclose(m["mean"], mean, atol=1e-12)
    assert np.allclose(m["std"], std, atol=1e-12)
    for (Wd, bd), (Wr, br) in zip(m["params"], params):
        assert np.allclose(np.array(Wd), Wr, rtol=1e-9, atol=1e-11)
        assert np.allclose(np.array(bd), br, rtol=1e-9, atol=1e-11)
    # serving: module forward == naive forward (dropout off)
    X = df[cols].to_numpy(dtype=np.float64)
    a = (X - mean) / std
    for W, b in params[:-1]:
        a = np.tanh(a @ W + b)
    logits = a @ params[-1][0] + params[-1][1]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    ref = (e / e.sum(axis=1, keepdims=True))[:, 1]
    assert np.allclose(mlp_score_matrix(X, m), ref, atol=1e-12)


def test_mlp_learns_nonlinear_boundary(ray_session):
    """A boundary linear models cannot express: the MLP must clear the
    LR ceiling on XOR-quadrant data (sanity that backprop learns)."""
    import ray.data as rd

    from sociallink_ray.pipelines.mlp import (
        mlp_score_matrix,
        train_scorer_mlp,
    )

    rng = np.random.default_rng(0)
    n = 3000
    X = rng.normal(size=(n, 4))
    y = (X[:, 0] * X[:, 1] > 0).astype(np.int64)  # XOR quadrants
    cols = [f"f{i}" for i in range(4)]
    df = pd.DataFrame(X, columns=cols)
    df["resource_id"] = np.arange(n)
    df["uid"] = np.arange(n)
    gold = pd.DataFrame(
        {"resource_id": np.arange(n)[y == 1], "uid": np.arange(n)[y == 1]}
    )
    ds = rd.from_pandas(df).repartition(4).materialize()
    m = train_scorer_mlp(
        ds, gold, cols=cols, layers=2, units=32, rounds=1200,
        dropout_keep=1.0, lr=2e-3, seed=3,
    )
    acc = ((mlp_score_matrix(X, m) > 0.5) == y).mean()
    assert acc >= 0.9, acc  # LR tops out ~0.5 on XOR quadrants


def test_mlp_ensemble_serving_averages_folds(ray_session):
    """Fold-ensemble bundle == mean of per-fold softmax scores, each
    fold with its own scaler (api.py:33-38), and align.score_matrix
    dispatches MLP bundles."""
    import ray.data as rd

    from sociallink_ray.pipelines.align import score_matrix
    from sociallink_ray.pipelines.mlp import (
        mlp_score_matrix,
        train_scorer_mlp,
    )

    df, gold, cols, _ = _toy_table(n=600)
    ds = rd.from_pandas(df).repartition(3).materialize()
    bundle = train_scorer_mlp(
        ds, gold, cols=cols, layers=1, units=8, rounds=30, kfold=3,
        seed=9,
    )
    assert bundle["kind"] == "mlp" and bundle["k"] == 3
    assert len(bundle["folds"]) == 3
    X = df[cols].to_numpy(dtype=np.float64)
    per_fold = np.stack(
        [mlp_score_matrix(X, f) for f in bundle["folds"]]
    )
    want = per_fold.mean(axis=0)
    assert np.allclose(mlp_score_matrix(X, bundle), want, atol=1e-12)
    assert np.allclose(score_matrix(X, bundle), want, atol=1e-12)
    # folds genuinely differ (trained on different entity subsets)
    assert not np.allclose(per_fold[0], per_fold[1])


def test_mlp_flagship_pr(corpus, ray_session):
    """scorer="mlp" runs the flagship end-to-end with the reference
    architecture (5x256 tanh, dropout 0.5, Adam 4e-4) and matches gold
    with P/R >= 0.95 — the north-rule bar."""
    import pyarrow.parquet as pq

    from sociallink_ray.pipelines.align import run_flagship
    from sociallink_ray.pipelines.evaluate import evaluate_selection

    triples, selected, weights = run_flagship(corpus, scorer="mlp")
    assert weights.get("kind") == "mlp"
    gold = pq.read_table(f"{corpus}/gold.parquet").to_pandas()
    ents = pq.read_table(f"{corpus}/kb_entities.parquet").to_pandas()[
        "resource_id"
    ].tolist()
    ev = evaluate_selection(selected.to_pandas(), gold, ents, joint=False)
    assert ev.precision >= 0.95, (ev.precision, ev.recall)
    assert ev.recall >= 0.95, (ev.precision, ev.recall)


def _trans_loss(X, y, sw, pair_params, trunk, pair_idx, other_idx):
    """Independent weighted-mean softmax-CE loss of the translation
    model (test-side reimplementation for the finite-difference
    check)."""
    feats = [X[:, other_idx]] if len(other_idx) else []
    for (ia, ib, dim), (Wa, ba, Wb, bb) in zip(pair_idx, pair_params):
        a = np.tanh(X[:, ia] @ Wa + ba)
        b = np.tanh(X[:, ib] @ Wb + bb)
        feats += [a, b, a * b]
    h = np.concatenate(feats, axis=1)
    for W, bb_ in trunk[:-1]:
        h = np.tanh(h @ W + bb_)
    logits = h @ trunk[-1][0] + trunk[-1][1]
    m = logits.max(axis=1, keepdims=True)
    logz = m[:, 0] + np.log(np.exp(logits - m).sum(axis=1))
    ll = logits[np.arange(len(y)), y.astype(np.int64)] - logz
    return -(ll * sw).sum() / sw.sum()


def test_mlp_trans_gradients_match_finite_differences():
    """The translation-layer backward pass (projection + dropout +
    product routing + trunk) is pinned against central finite
    differences of an independent loss reimplementation."""
    from sociallink_ray.pipelines.mlp import (
        init_trans_params,
        minibatch_grads_trans,
        split_pair_indices,
    )

    rng = np.random.default_rng(4)
    n, da, db, do = 40, 3, 4, 2
    cols = (
        [f"a{i}" for i in range(da)]
        + [f"b{i}" for i in range(db)]
        + [f"o{i}" for i in range(do)]
    )
    pairs = [
        ([f"a{i}" for i in range(da)], [f"b{i}" for i in range(db)], 3)
    ]
    pair_idx, other_idx = split_pair_indices(cols, pairs)
    X = rng.normal(size=(n, da + db + do))
    y = rng.integers(0, 2, size=n).astype(np.float64)
    sw = np.where(y == 1.0, 2.5, 1.0)
    pair_params, trunk = init_trans_params(
        pair_idx, do, layers=2, units=5, seed=11
    )
    pg, tg, sw_sum = minibatch_grads_trans(
        X, y, sw, pair_params, trunk, pair_idx, other_idx,
        keep=1.0, rng=np.random.default_rng(0),
    )
    eps = 1e-6

    def fd(get, set_):
        base = get()
        g = np.zeros_like(base)
        it = np.nditer(base, flags=["multi_index"])
        for _ in it:
            i = it.multi_index
            orig = base[i]
            base[i] = orig + eps
            set_(base)
            lp = _trans_loss(X, y, sw, pair_params, trunk, pair_idx, other_idx)
            base[i] = orig - eps
            set_(base)
            lm = _trans_loss(X, y, sw, pair_params, trunk, pair_idx, other_idx)
            base[i] = orig
            set_(base)
            g[i] = (lp - lm) / (2 * eps)
        return g

    # pair params (analytic grads are SUMS; divide by sw_sum for mean)
    for pi in range(len(pair_params)):
        for slot in range(4):
            def get(pi=pi, slot=slot):
                return pair_params[pi][slot]

            def set_(v, pi=pi, slot=slot):
                lst = list(pair_params[pi])
                lst[slot] = v
                pair_params[pi] = tuple(lst)

            want = fd(get, set_)
            got = pg[pi][slot] / sw_sum
            assert np.allclose(got, want, rtol=1e-4, atol=1e-7), (pi, slot)
    # trunk params
    for li in range(len(trunk)):
        for slot in range(2):
            def get(li=li, slot=slot):
                return trunk[li][slot]

            def set_(v, li=li, slot=slot):
                lst = list(trunk[li])
                lst[slot] = v
                trunk[li] = tuple(lst)

            want = fd(get, set_)
            got = tg[li][slot] / sw_sum
            assert np.allclose(got, want, rtol=1e-4, atol=1e-7), (li, slot)


def test_mlp_trans_learns_subspace_interaction(ray_session):
    """Label = sign(<A, B>) is invisible to any model without a
    cross-subspace term; the translation layer (projA*projB product
    features, emb_extra_layer.py) must learn it."""
    import ray.data as rd

    from sociallink_ray.pipelines.mlp import (
        mlp_score_matrix,
        train_scorer_mlp_trans,
    )

    rng = np.random.default_rng(2)
    n, d = 2500, 6
    A = rng.normal(size=(n, d))
    B = rng.normal(size=(n, d))
    other = rng.normal(size=(n, 2))
    y = ((A * B).sum(1) > 0).astype(np.int64)
    cols = (
        [f"a{i}" for i in range(d)]
        + [f"b{i}" for i in range(d)]
        + ["o0", "o1"]
    )
    df = pd.DataFrame(np.hstack([A, B, other]), columns=cols)
    df["resource_id"] = np.arange(n)
    df["uid"] = np.arange(n)
    gold = pd.DataFrame(
        {"resource_id": np.arange(n)[y == 1], "uid": np.arange(n)[y == 1]}
    )
    ds = rd.from_pandas(df).repartition(4).materialize()
    pairs = [([f"a{i}" for i in range(d)], [f"b{i}" for i in range(d)], 8)]
    m = train_scorer_mlp_trans(
        ds, gold, cols, pairs, layers=2, units=16, rounds=600,
        dropout_keep=1.0, lr=2e-3, seed=3,
    )
    assert m["arch"] == "trans"
    X = df[cols].to_numpy(np.float64)
    acc = ((mlp_score_matrix(X, m) > 0.5) == y).mean()
    assert acc >= 0.95, acc
    # serving dispatches through align.score_matrix too
    from sociallink_ray.pipelines.align import score_matrix

    assert np.allclose(score_matrix(X, m), mlp_score_matrix(X, m))

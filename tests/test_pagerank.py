"""PageRank exactness vs a dense single-machine reference (same
damping, dangling redistribution, iteration count)."""

import numpy as np
import pandas as pd


def dense_pagerank(edges, d=0.85, iters=10):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    out: dict = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        new = np.zeros(N)
        dangling = 0.0
        for n in nodes:
            i = idx[n]
            if n in out:
                share = r[i] / len(out[n])
                for t in out[n]:
                    new[idx[t]] += share
            else:
                dangling += r[i]
        r = (1.0 - d) / N + d * dangling / N + d * new
    return {n: r[idx[n]] for n in nodes}


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 5),  # 5 dangles
    (6, 3), (6, 2), (7, 6), (7, 3),
]


def test_pagerank_matches_dense_reference(ray_session):
    import ray.data as rd

    from sociallink_ray.pipelines.graph import pagerank

    df = pd.DataFrame(EDGES, columns=["src", "dst"])
    # duplicate an edge: the operator dedups to the distinct edge set
    df = pd.concat([df, df.iloc[:2]], ignore_index=True)
    got = (
        pagerank(rd.from_pandas(df), "src", "dst", damping=0.85, iters=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = dense_pagerank(EDGES, 0.85, 10)
    assert list(got["node"]) == sorted(exp)
    np.testing.assert_allclose(
        got["rank"].to_numpy(),
        np.array([exp[n] for n in sorted(exp)]),
        atol=1e-12,
    )
    # total rank conserved at 1
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_deterministic_under_repartition(ray_session):
    import ray.data as rd

    from sociallink_ray.pipelines.graph import pagerank

    df = pd.DataFrame(EDGES, columns=["src", "dst"])
    outs = []
    for p in (1, 5):
        got = (
            pagerank(rd.from_pandas(df).repartition(p), "src", "dst", iters=6)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1], atol=1e-12, rtol=0)


# --------------------------------------------------------------------------
# triangle_counts (degree-oriented wedge join)
# --------------------------------------------------------------------------


def _tri_df(edges, ray_session=None, repartition=None):
    import ray.data as rd

    from sociallink_ray.pipelines.graph import triangle_counts

    df = pd.DataFrame({"a": [e[0] for e in edges],
                       "b": [e[1] for e in edges]}).astype("int64")
    ds = rd.from_pandas(df)
    if repartition:
        ds = ds.repartition(repartition)
    out = triangle_counts(ds).to_pandas()
    if out.empty:
        # Ray Data's to_pandas drops the schema of an all-empty dataset
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "triangles": pd.Series(dtype="int64")})
    return out.sort_values("node").reset_index(drop=True)


def _naive_tri(edges):
    import itertools

    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        es.add((lo, hi))
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_matches_naive(ray_session):
    rng = np.random.default_rng(42)
    n = 40
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(160)
    ]
    # duplicates, reversed duplicates and self-loops must all be absorbed
    edges += [(b, a) for a, b in edges[:20]] + [(5, 5), (7, 7)]
    got = _tri_df(edges)
    ref = _naive_tri(edges)
    assert dict(zip(got["node"], got["triangles"])) == ref


def test_triangle_counts_star_has_none(ray_session):
    got = _tri_df([(0, i) for i in range(1, 8)])
    assert len(got) == 0


def test_triangle_counts_deterministic_under_repartition(ray_session):
    rng = np.random.default_rng(3)
    edges = [
        (int(rng.integers(0, 30)), int(rng.integers(0, 30)))
        for _ in range(120)
    ]
    a = _tri_df(edges)
    b = _tri_df(edges, repartition=9)
    pd.testing.assert_frame_equal(a, b)


def test_bfs_hops_chain_and_star(ray_session):
    """BFS min-hop distances on a known topology: a 6-chain hanging off
    a star, two seeds, plus a disconnected node (never emitted) and a
    seed absent from the edge set (emitted at d=0)."""
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.pipelines.graph import bfs_hops

    # star: 0-{1,2,3}; chain: 3-4-5-6-7; island: 99 (no edges to seeds)
    edges = pd.DataFrame(
        {
            "a": [0, 0, 0, 3, 4, 5, 6, 98],
            "b": [1, 2, 3, 4, 5, 6, 7, 99],
        }
    )
    seeds = pd.DataFrame({"node": [0, 42]})  # 42 not in the graph
    got = (
        bfs_hops(rd.from_pandas(edges), rd.from_pandas(seeds), "a", "b")
        .to_pandas()
        .set_index("node")["d"]
        .to_dict()
    )
    assert got == {
        0: 0, 42: 0, 1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5,
    }


def test_bfs_hops_max_hops_cap(ray_session):
    """max_hops bounds the frontier: distances beyond the cap are not
    emitted."""
    import pandas as pd
    import ray.data as rd

    from sociallink_ray.pipelines.graph import bfs_hops

    chain = pd.DataFrame({"a": list(range(9)), "b": list(range(1, 10))})
    seeds = pd.DataFrame({"node": [0]})
    got = (
        bfs_hops(rd.from_pandas(chain), rd.from_pandas(seeds), "a", "b",
                 max_hops=3)
        .to_pandas()
        .set_index("node")["d"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_personalized_pagerank_matches_dense_reference(ray_session):
    """Seeded (RWR) pagerank == dense single-machine power iteration
    with teleport restricted to the seed set, to 1e-12; empty seed set
    raises."""
    import ray.data as rd

    from sociallink_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(9)
    n = 60
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n, 400).astype(np.int64),
            "dst": rng.integers(0, n, 400).astype(np.int64),
        }
    )
    edges = edges[edges.src != edges.dst].drop_duplicates()
    seeds = pd.DataFrame({"node": np.array([3, 7, 11], dtype=np.int64)})
    got = (
        pagerank(
            rd.from_pandas(edges).repartition(3), "src", "dst",
            damping=0.85, iters=12,
            seeds=rd.from_pandas(seeds),
        )
        .to_pandas().set_index("node")["rank"]
    )

    # dense reference
    nodes = np.unique(np.concatenate([edges.src, edges.dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    A = np.zeros((N, N))
    for s_, d_ in zip(edges.src, edges.dst):
        A[idx[s_], idx[d_]] = 1.0
    out = A.sum(axis=1)
    tele = np.zeros(N)
    for v in seeds["node"]:
        if v in idx:
            tele[idx[v]] = 1.0 / len(seeds)
    r = tele.copy()
    d = 0.85
    for _ in range(12):
        contrib = np.zeros(N)
        for i in range(N):
            if out[i]:
                contrib += r[i] / out[i] * A[i]
        dangling = max(0.0, 1.0 - contrib.sum())
        r = (1 - d) * tele + d * dangling * tele + d * contrib
    ref = pd.Series(r, index=nodes)
    assert np.allclose(got.sort_index().to_numpy(),
                       ref.sort_index().to_numpy(), atol=1e-12)
    # rank mass conserved at 1
    assert abs(got.sum() - 1.0) < 1e-9

    import pytest as _pt

    empty = rd.from_pandas(pd.DataFrame({"node": pd.Series(dtype="int64")}))
    with _pt.raises(ValueError, match="empty seed set"):
        pagerank(rd.from_pandas(edges), "src", "dst", seeds=empty)

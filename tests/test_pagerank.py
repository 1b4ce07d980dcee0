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

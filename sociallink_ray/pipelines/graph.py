"""Social-graph pipeline: co-mention edges from parsed pages ->
aggregated, cutoff, out-degree-normalized, condensed adjacency.

Reference: ExtractSocialGraph (alignments/src/main/java/eu/fbk/fm/
alignments/index/ExtractSocialGraph.java) — edge emission :100-135
(M9), ``groupBy(src,dst).sum`` + min-freq cutoff :75-79,197-208 (A5),
out-degree normalization :81-95,176-195 (A6), condensation to
``(uid, followees[], weights[])`` :137-174 (A7) — the ``user_sg``
table (schema.sql:5-14).

The graft's edge signal: two accounts referenced on the same page get
a directed co-mention edge each way (the tweet graph's
author->mention edges have no author on a web page)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..stages import ops

MIN_EDGE_FREQ = 2  # ExtractSocialGraph.java:79 min-frequency cutoff


def _emit_edges_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized: per-page distinct uids exploded to (page, uid)
    rows, the quadratic within-page pair expansion is one C-level
    self-merge (no Python pair loops)."""
    uid_lists = [sorted(set(int(x) for x in uids)) for uids in df["ref_uids"]]
    lens = np.fromiter(
        (len(u) for u in uid_lists), dtype=np.int64, count=len(uid_lists)
    )
    if lens.sum() == 0:
        return pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
            }
        )
    e = pd.DataFrame(
        {
            "row": np.repeat(np.arange(len(uid_lists), dtype=np.int64), lens),
            "uid": np.fromiter(
                (x for u in uid_lists for x in u), dtype=np.int64,
                count=int(lens.sum()),
            ),
        }
    )
    m = e.merge(e, on="row")
    m = m[m["uid_x"] < m["uid_y"]]
    a = m["uid_x"].to_numpy()
    b = m["uid_y"].to_numpy()
    return pd.DataFrame(
        {
            "src": np.concatenate([a, b]),
            "dst": np.concatenate([b, a]),
            "w": np.ones(2 * len(a), dtype=np.int64),
        }
    )


def emit_edges(parsed: Dataset) -> Dataset:
    """Page -> ordered pairs of distinct referenced uids (M9 analogue)."""
    return parsed.map_batches(_emit_edges_batch, batch_format="pandas")


def aggregate_edges(edges: Dataset, min_freq: int = MIN_EDGE_FREQ) -> Dataset:
    """A5: ``groupBy(src,dst).sum(w)`` with combiner + cutoff."""
    import pyarrow as pa
    import pyarrow.compute as pc

    agg = ops.partial_groupby_sum(edges, ["src", "dst"], sums={"w": "weight"})
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["weight"], pa.scalar(min_freq))),
        batch_format="pyarrow",
    )


def condense_src_local(df: pd.DataFrame) -> pd.DataFrame:
    """Per-src weight normalization + condensation to
    (uid, followees list<int64>, weights list<float64>) sorted by dst.
    Requires every row of a given src to be present (src-partitioned)."""
    df = df.sort_values(["src", "dst"], kind="mergesort")
    totals = df.groupby("src", sort=False)["weight"].transform("sum")
    df = df.assign(norm_w=df["weight"] / totals)
    g = df.groupby("src", sort=False)
    return pd.DataFrame(
        {
            "uid": g.size().index.to_numpy(dtype=np.int64),
            "followees": g["dst"].agg(list).to_numpy(),
            "weights": g["norm_w"].agg(list).to_numpy(),
        }
    )


def normalize_and_condense(agg: Dataset) -> Dataset:
    """A6+A7 in one src-bucket shuffle."""
    return ops.bucketed_group_apply(
        agg, ["src"], lambda df, keys: condense_src_local(df)
    )


def _pairs_packed_from_lists(col, max_sq: int = 4_000_000) -> np.ndarray:
    """``list<int64>`` column -> canonical within-page co-mention pairs
    packed ``(a << 32) | b`` (a < b, per-page-distinct uids), fully
    vectorized from the Arrow list offsets — no Python per-page loop,
    no pandas self-merge (the previous emit cost ~173 core-s on a 1M-
    page corpus; this kernel is ~20x). Pages are processed in slices
    bounded by ``max_sq`` product size so the L² intermediates stay
    cache/heap-friendly whatever the split size. Requires uids in
    [0, 2^32) — validated on the RAW values before packing (a uid in
    [2^32, 2^33) as the larger pair element would overflow into the
    high word and silently decode as a wrong edge); raises ValueError
    outside that range."""
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    vals_np, lens_np = [], []
    for ch in chunks:
        lens_np.append(
            np.asarray(pa.compute.list_value_length(ch), dtype=np.int64)
        )
        vals_np.append(ch.flatten().to_numpy(zero_copy_only=False))
    lens = np.concatenate(lens_np) if lens_np else np.empty(0, np.int64)
    vals = np.concatenate(vals_np) if vals_np else np.empty(0, np.int64)
    n = len(lens)
    if n == 0 or vals.size == 0:
        return np.empty(0, np.uint64)
    if int(vals.min()) < 0 or int(vals.max()) >= (1 << 32):
        raise ValueError("uid outside [0, 2^32): packed sg path unsupported")
    # per-page distinct + sorted (co-mention is a set relation)
    page_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((vals, page_idx))
    pv, vv = page_idx[order], vals[order]
    keep = np.ones(len(vv), dtype=bool)
    keep[1:] = (pv[1:] != pv[:-1]) | (vv[1:] != vv[:-1])
    pv, vv = pv[keep], vv[keep]
    L = np.bincount(pv, minlength=n)
    starts = np.concatenate(([0], np.cumsum(L)[:-1]))
    out = []
    # slice pages so sum(L^2) per slice stays bounded
    sq = L * L
    cuts = [0]
    acc = 0
    for i in range(n):
        acc += int(sq[i])
        if acc >= max_sq:
            cuts.append(i + 1)
            acc = 0
    if cuts[-1] != n:
        cuts.append(n)
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        Ls = L[lo:hi]
        sqs = sq[lo:hi]
        tot = int(sqs.sum())
        if tot == 0:
            continue
        sq_starts = np.concatenate(([0], np.cumsum(sqs)[:-1]))
        seq = np.arange(tot, dtype=np.int64) - np.repeat(sq_starts, sqs)
        Lrep = np.repeat(Ls, sqs)
        x = seq // Lrep
        y = seq - x * Lrep
        mask = x < y
        g = np.repeat(starts[lo:hi], sqs)[mask]
        a = vv[g + x[mask]].astype(np.uint64)
        b = vv[g + y[mask]].astype(np.uint64)
        out.append((a << np.uint64(32)) | b)
    return np.concatenate(out) if out else np.empty(0, np.uint64)


def build_user_sg(
    parsed: Dataset, min_freq: int = MIN_EDGE_FREQ, drop_ref=None
) -> Dataset:
    """Fused build of the ``user_sg`` table (A5+A6+A7).

    Exchange 1 carries canonical a<b pairs PACKED into one uint64 key
    (half the rows of the both-directions emit, 16 bytes/row vs 48):
    the pair emission + a ``np.unique`` count combiner are map-fused
    into the split task (the quadratic co-mention expansion never hits
    the object store), the reduce sums counts per packed key and
    applies the global min-freq cutoff. Only the tiny surviving edge
    set is mirrored to directed (src, dst, weight) rows, and the
    second (small) src-keyed exchange normalizes + condenses — a Zipf
    pair tail makes (src,dst) partials nearly unique per split, so
    shipping the pre-cutoff tail cheaply matters more than fusing to
    one exchange (measured 36s -> ~8s on the 1M-page corpus at 16
    CPUs). The separate stage functions above remain the catalog-query
    surface (edge_weights / edge_normalize / edge_condense oracles)."""
    import pyarrow as pa

    def map_fn(tbl: pa.Table) -> pa.Table:
        if drop_ref is not None:
            tbl = ops.id_drop_filter(drop_ref, "page_id")(tbl)
        # uid range is validated on raw values inside
        # _pairs_packed_from_lists (checking the packed high word is
        # NOT sufficient: a uid in [2^32, 2^33) as the larger element
        # overflows into the high word and can pass such a check)
        pk = _pairs_packed_from_lists(tbl["ref_uids"])
        keys, counts = np.unique(pk, return_counts=True)
        return pa.table({"pk": keys, "w": counts.astype(np.int64)})

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows:
            pk = tbl["pk"].to_numpy(zero_copy_only=False).astype(np.uint64)
            w = tbl["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            pk = np.empty(0, np.uint64)
            w = np.empty(0, np.int64)
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "weight": pa.array([], pa.int64()),
            }
        )
        if not pk.size:
            return empty
        order = np.argsort(pk, kind="stable")
        pks, ws = pk[order], w[order]
        bound = np.ones(len(pks), dtype=bool)
        bound[1:] = pks[1:] != pks[:-1]
        idx = np.nonzero(bound)[0]
        sums = np.add.reduceat(ws, idx)
        keys = pks[idx]
        hit = sums >= min_freq
        keys, sums = keys[hit], sums[hit]
        if not keys.size:
            return empty
        a = (keys >> np.uint64(32)).astype(np.int64)
        b = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
                "weight": np.concatenate([sums, sums]),
            }
        )

    edges = ops.exchange_coapply(
        [parsed], ["pk"], finish, map_fns=[map_fn], arrow=True
    )
    return normalize_and_condense(edges)


def pagerank(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    seeds: Dataset | None = None,
) -> Dataset:
    """Distributed PageRank (fixed iteration count) — the entity-
    importance complement of ``dedup.connected_components`` for
    KG-construction graphs. Per iteration: scatter (ranks hash-join
    edges on src, each edge carries rank/outdeg) -> gather (grouped sum
    by dst) -> recombine over the node set with the damping base and
    the dangling mass redistributed uniformly. Every step is a combiner
    + hash exchange; the only driver values per iteration are two
    scalars (scattered-mass sum for the dangling correction). Total
    rank is conserved at exactly 1 per iteration.

    Edges are deduplicated (unweighted PageRank over the distinct edge
    set); node ids must be int64-castable. The two static sides (the
    outdeg-weighted edge list keyed by src, the node set keyed by
    node) are hash-split ONCE via ``ops.presplit`` and reused every
    iteration — only the rank side re-splits per round.

    ``seeds`` (a Dataset with a ``node`` column) switches to
    PERSONALIZED PageRank / random-walk-with-restart: the teleport
    distribution is uniform over the seed set instead of all nodes
    (init = 1/|S| on seeds, 0 elsewhere; dangling mass returns to the
    seeds) — the KG "how close is every entity to the gold set"
    ranking. The seed set is gold-sized by definition, so it
    broadcasts as a sorted int64 array (the drop-set discipline)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": pc.cast(t[src], pa.int64()),
             "dst": pc.cast(t[dst], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    e = ops.distinct(e, ["src", "dst"]).materialize()

    nodes = ops.distinct(
        e.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes

    outdeg = ops.partial_groupby_sum(
        e.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows), pa.float64())
            ),
            batch_format="pyarrow",
        ),
        ["src"],
        sums={"one": "outdeg"},
    )
    # static through the iteration: attach outdeg to each edge once,
    # then hash-split once for every iteration's scatter exchange
    ewd = ops.exchange_join(e, outdeg, ["src"]).materialize()
    ewd_split = ops.presplit(ewd, ["src"])
    P = ewd_split.P

    seed_ref = None
    if seeds is None:
        r0 = 1.0 / n_nodes

        def init(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": t["node"],
                 "rank": pa.array(np.full(t.num_rows, r0), pa.float64())}
            )
    else:
        sdf = seeds.to_pandas()
        if "node" not in sdf.columns or len(sdf) == 0:
            # an all-empty filtered Dataset surfaces as a 0-column frame
            raise ValueError("pagerank: empty seed set")
        seed_arr = np.sort(np.unique(sdf["node"].to_numpy(np.int64)))
        n_seeds = len(seed_arr)
        seed_ref = ray.put(seed_arr)
        rs = 1.0 / n_seeds

        def init(t: pa.Table) -> pa.Table:
            sa = ops.cached_get(seed_ref)
            ids = t["node"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sa, ids)
            pos[pos == len(sa)] = 0
            is_seed = sa[pos] == ids
            return pa.table(
                {"src": t["node"],
                 "rank": pa.array(np.where(is_seed, rs, 0.0))}
            )

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def scatter(edf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # fused scatter + per-partition pre-aggregation: the reduce
        # already holds every edge of its src partition, so summing by
        # dst HERE makes the downstream step a partial merge — one
        # whole groupby exchange per iteration removed
        if edf.empty or rdf.empty:
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "c": pd.Series(dtype="float64")}
            )
        m = edf.merge(rdf, on="src", how="inner")
        out = pd.DataFrame({"node": m["dst"], "c": m["rank"] / m["outdeg"]})
        return out.groupby("node", as_index=False)["c"].sum()

    nodes_split = ops.presplit(nodes, ["node"])
    for _ in range(iters):
        # exchange 1 (src-keyed): scatter + pre-agg partials
        contrib = ops.exchange_coapply(
            [ewd_split, ranks], ["src"], scatter, num_partitions=P
        ).materialize()
        # scalar dangling correction from the partials — one wave of
        # block-ref tasks, not a Dataset.sum() plan (partials sum to
        # the exact total). Non-dangling nodes scatter their whole
        # rank, so the dangling mass is whatever of the conserved
        # total (=1) did not scatter.
        scattered, _ = ops.quick_col_sum(contrib, "c")
        dangling = max(0.0, 1.0 - float(scattered or 0.0))
        if seeds is None:
            base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        else:
            base = (1.0 - damping) / n_seeds + damping * dangling / n_seeds

        def recombine(
            adf: pd.DataFrame, ndf: pd.DataFrame, b: float = base
        ) -> pd.DataFrame:
            # exchange 2 (node-keyed): final partial merge fused with
            # the damping recombine over the presplit node set; in the
            # personalized form the teleport base applies ONLY to seeds
            if ndf.empty:
                return pd.DataFrame(
                    {"src": pd.Series(dtype="int64"),
                     "rank": pd.Series(dtype="float64")}
                )
            s = (
                adf.groupby("node", as_index=False)["c"].sum()
                if len(adf) else adf
            )
            m = ndf.merge(s, on="node", how="left")
            if seed_ref is None:
                bb = b
            else:
                sa = ops.cached_get(seed_ref)
                ids = m["node"].to_numpy(np.int64)
                pos = np.searchsorted(sa, ids)
                pos[pos == len(sa)] = 0
                bb = np.where(sa[pos] == ids, b, 0.0)
            return pd.DataFrame(
                {"src": m["node"],
                 "rank": bb + damping * m["c"].fillna(0.0)}
            )

        ranks = ops.exchange_coapply(
            [contrib, nodes_split], ["node"], recombine,
            num_partitions=nodes_split.P,
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["src"], "rank": t["rank"]}),
        batch_format="pyarrow",
    )


def triangle_counts(edges: Dataset, a_col: str = "a", b_col: str = "b") -> Dataset:
    """Distributed per-node triangle counting via DEGREE-ORIENTED wedge
    join (the MapReduce-classic of Suri & Vassilvitskii, WWW'11 — the
    orientation bounds every node's effective out-degree by ~sqrt(m),
    so hub nodes cannot emit O(d²) wedges; this is the explicit skew
    handling the naive id-orientation lacks).

    ``edges`` is an undirected edge list (any orientation, self-loops
    and duplicates tolerated). Returns ``(node, triangles)`` — one row
    per node participating in >= 1 triangle.

    Shape (all exchanges, nothing driver-side):
    1. canonicalize + distinct edges (one exchange on (a, b));
    2. degrees via one grouped-sum exchange over exploded endpoints;
    3. two hash joins attach (deg_u, deg_v) to each edge, orienting
       u->v iff (deg_u, u) < (deg_v, v);
    4. wedges per source u: all out-neighbor pairs (v, w) ordered by
       the same key — emitted inside the exchange reduce;
    5. one co-partitioned exchange of wedges × oriented edges on
       (v, w): a wedge that finds its closing edge is a triangle;
    6. per-node grouped sum over the three corners.
    """
    import pyarrow as pa

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(dtype=np.int64)
        b = df[b_col].to_numpy(dtype=np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    cand = edges.map_batches(canon, batch_format="pandas")
    dedup_edges = ops.bucketed_group_apply(
        cand, ["a", "b"], lambda df, k: df.drop_duplicates(subset=["a", "b"])
    )

    def endpoints(tbl: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        return pa.table({"node": nodes, "d": np.ones(len(nodes), np.int64)})

    deg = ops.partial_groupby_sum(
        dedup_edges, ["node"], sums={"d": "d"}, pre_fn=endpoints
    )

    with_du = ops.exchange_join(
        dedup_edges,
        deg.map_batches(
            lambda t: t.rename_columns(["a", "deg_a"]), batch_format="pyarrow"
        ),
        on=["a"],
    )
    with_both = ops.exchange_join(
        with_du,
        deg.map_batches(
            lambda t: t.rename_columns(["b", "deg_b"]), batch_format="pyarrow"
        ),
        on=["b"],
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ks = np.where(a_first, da, db)
        kd = np.where(a_first, db, da)
        return pd.DataFrame({"src": src, "dst": dst, "ksrc": ks, "kdst": kd})

    oriented = with_both.map_batches(orient, batch_format="pandas")

    def wedges(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        out_v, out_w, out_u = [], [], []
        for u, grp in df.groupby("src", sort=False):
            if len(grp) < 2:
                continue
            # order out-neighbors by the SAME (deg, id) key used for
            # orientation, so the closing edge of wedge (v, w) — if it
            # exists — is guaranteed to be oriented v->w.
            order = np.lexsort(
                (grp["dst"].to_numpy(np.int64), grp["kdst"].to_numpy(np.int64))
            )
            nb = grp["dst"].to_numpy(np.int64)[order]
            m = len(nb)
            ii, jj = np.triu_indices(m, k=1)
            out_v.append(nb[ii])
            out_w.append(nb[jj])
            out_u.append(np.full(len(ii), u, dtype=np.int64))
        if not out_v:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("v", "w", "u")}
            )
        return pd.DataFrame(
            {
                "v": np.concatenate(out_v),
                "w": np.concatenate(out_w),
                "u": np.concatenate(out_u),
            }
        )

    wedge_ds = ops.bucketed_group_apply(oriented, ["src"], wedges)

    edge_keys = oriented.map_batches(
        lambda df: df[["src", "dst"]].rename(columns={"src": "v", "dst": "w"}),
        batch_format="pandas",
    )

    def close(wdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        if wdf.empty or edf.empty:
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "t": pd.Series(dtype="int64")}
            )
        tri = wdf.merge(edf.drop_duplicates(), on=["v", "w"], how="inner")
        nodes = np.concatenate(
            [tri["u"].to_numpy(np.int64), tri["v"].to_numpy(np.int64),
             tri["w"].to_numpy(np.int64)]
        )
        out = pd.DataFrame({"node": nodes})
        out["t"] = 1
        return out.groupby("node", as_index=False)["t"].sum()

    corner = ops.exchange_coapply([wedge_ds, edge_keys], ["v", "w"], close)
    return ops.partial_groupby_sum(corner, ["node"], sums={"t": "triangles"})


def bfs_hops(
    edges: Dataset,
    seeds: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_hops: int = 20,
) -> Dataset:
    """Distributed multi-source BFS: exact MIN hop distance from a seed
    set (the KG-construction reachability profile — "how far is every
    entity from the gold set"). Per round: the current distance table
    hash-joins the symmetric edge list (one co-partitioned exchange),
    neighbors get d+1, and a node-keyed grouped MIN folds new and old
    labels; labels only tighten, so the (count, sum) pair is a
    monotone convergence witness and iteration stops early on
    stability — O(diameter) rounds, each a combiner-sized exchange over
    the REACHED set only (unreached nodes never ship). ``max_hops``
    bounds pathological diameters; returns (node, d) for reached nodes.

    ``seeds`` is a Dataset with a ``node`` column (d=0 whether or not
    the node occurs in ``edges`` — matching the SQL recursive-CTE
    base case)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        pc.cast(t[a_col], pa.int64()).combine_chunks(),
                        pc.cast(t[b_col], pa.int64()).combine_chunks(),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        pc.cast(t[b_col], pa.int64()).combine_chunks(),
                        pc.cast(t[a_col], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    sym = ops.distinct(sym, ["node", "nbr"]).materialize()

    dist = seeds.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "d": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    dist = ops.bucketed_group_apply(
        dist, ["node"],
        lambda df, k: df.groupby("node", as_index=False)["d"].min(),
    ).materialize()

    def min_fold(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "d": pd.Series(dtype="int64")}
            )
        return df.groupby("node", as_index=False)["d"].min()

    # the symmetric edge list never changes: hash-split once, reuse
    # every hop (the presplit static-side discipline)
    sym_split = ops.presplit(sym, ["node"])
    prev_n, prev_s = -1, -1
    for _ in range(max_hops):
        # one block-ref task wave gives both convergence scalars —
        # Dataset.count() + Dataset.sum() were two full plans per hop
        s, n = ops.quick_col_sum(dist, "d")
        if (n, s) == (prev_n, prev_s):
            break
        prev_n, prev_s = n, s

        def prop(ddf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
            if ddf.empty or edf.empty:
                return pd.DataFrame(
                    {"node": pd.Series(dtype="int64"),
                     "d": pd.Series(dtype="int64")}
                )
            m = ddf.merge(edf, on="node", how="inner")
            return pd.DataFrame(
                {"node": m["nbr"], "d": m["d"] + 1}
            ).groupby("node", as_index=False)["d"].min()

        cand = ops.exchange_coapply(
            [dist, sym_split], ["node"], prop,
            num_partitions=sym_split.P,
        )
        dist = ops.bucketed_group_apply(
            dist.union(cand), ["node"], min_fold
        ).materialize()
    return dist

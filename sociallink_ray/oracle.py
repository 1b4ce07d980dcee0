"""Single-process reference implementation ("oracle") of the flagship
pipeline — plain Python/pandas, no Ray. The executable spec the
distributed engine is checked against (SURVEY.md §5 item 2): identical
kernels, sequential execution, so any divergence isolates a bug in the
Ray orchestration (shuffles, joins, actor stages), not the math.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from .functions import names as nm
from .functions.minhash import MinHasher, ngram_jaccard
from .functions.textnorm import (
    extract_account_refs,
    extract_html_text,
    extract_mention_surfaces,
)
from .pipelines import align as al


def parse_pages_oracle(pages_df: pd.DataFrame, langs=("en",)) -> pd.DataFrame:
    # latest-wins per url
    latest = (
        pages_df.sort_values(["warc_ts", "page_id"], kind="mergesort")
        .groupby("url", as_index=False, sort=False)
        .tail(1)
    )
    rows = []
    for r in latest.itertuples(index=False):
        if r.lang not in langs:
            continue
        text = extract_html_text(r.html)
        if not text:
            continue
        h = r.html.decode("utf-8", errors="replace") if isinstance(r.html, bytes) else r.html
        refs = extract_account_refs(h)
        rows.append(
            {
                "page_id": r.page_id,
                "text": text,
                "ref_names": [x[0] for x in refs],
                "ref_uids": [x[1] for x in refs],
                "mention_surfaces": extract_mention_surfaces(h),
            }
        )
    return pd.DataFrame(rows)


def dedup_pages_oracle(parsed: pd.DataFrame, threshold=0.8, num_perm=128, k=3, bands=32) -> pd.DataFrame:
    h = MinHasher(num_perm=num_perm, k=k)
    sigs = {}
    buckets: dict[int, list[int]] = {}
    for r in parsed.itertuples(index=False):
        sig = h.signature(r.text)
        sigs[r.page_id] = (sig, r.text)
        for key in h.band_keys(sig, bands):
            buckets.setdefault(key, []).append(r.page_id)
    # candidate pairs + exact verify
    edges = set()
    for ids in buckets.values():
        u = sorted(set(ids))
        for i, a in enumerate(u):
            for b in u[i + 1:]:
                if (a, b) in edges:
                    continue
                if ngram_jaccard(sigs[a][1], sigs[b][1], k) >= threshold:
                    edges.add((a, b))
    # union-find
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    keep = {pid for pid in parsed["page_id"] if find(pid) == pid}
    return parsed[parsed["page_id"].isin(keep)].reset_index(drop=True)


def name_index_oracle(parsed: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in parsed.itertuples(index=False):
        for nme, uid in zip(r.ref_names, r.ref_uids):
            rows.append((nme, uid))
    df = pd.DataFrame(rows, columns=["fullname", "uid"])
    return df.groupby(["fullname", "uid"], as_index=False).size().rename(
        columns={"size": "freq"}
    )


def user_text_oracle(parsed: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in parsed.itertuples(index=False):
        for uid in set(r.ref_uids):
            rows.append((uid, r.page_id, r.text[: al.USER_TEXT_CHARS_PER_PAGE]))
    df = pd.DataFrame(rows, columns=["uid", "page_id", "text"])
    df = df.sort_values("page_id", kind="mergesort").groupby("uid").head(
        al.USER_TEXT_PAGES_CAP
    )
    return (
        df.groupby("uid", as_index=False)
        .agg(user_text=("text", lambda s: "\n".join(s)))
    )


def candidates_oracle(entities_df: pd.DataFrame, name_index: pd.DataFrame) -> pd.DataFrame:
    lookup = al.CandidateLookup(al.build_token_postings(name_index))
    rows = []
    for rid, aj in zip(entities_df["resource_id"], entities_df["attributes_json"]):
        res = nm.Resource(rid, json.loads(aj))
        for uid, freq, order in lookup.lookup(res):
            rows.append((rid, uid, freq, order))
    return pd.DataFrame(rows, columns=["resource_id", "uid", "index_freq", "order"])


def user_sg_oracle(parsed: pd.DataFrame, min_freq: int = 2) -> pd.DataFrame:
    """Sequential spec of pipelines.graph.build_user_sg: co-mention
    edges both ways, count per (src, dst), min-freq cutoff, per-src
    weight normalization, condensed (uid, followees, weights) with
    followees sorted by dst."""
    counts: dict[tuple[int, int], int] = {}
    for uids in parsed["ref_uids"]:
        u = sorted(set(int(x) for x in uids))
        for i, a in enumerate(u):
            for b in u[i + 1:]:
                counts[(a, b)] = counts.get((a, b), 0) + 1
                counts[(b, a)] = counts.get((b, a), 0) + 1
    edges = [(s, d, w) for (s, d), w in counts.items() if w >= min_freq]
    by_src: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in edges:
        by_src.setdefault(s, []).append((d, w))
    rows = {"uid": [], "followees": [], "weights": []}
    for s in sorted(by_src):
        dl = sorted(by_src[s])
        total = float(sum(w for _, w in dl))
        rows["uid"].append(s)
        rows["followees"].append([d for d, _ in dl])
        rows["weights"].append([w / total for _, w in dl])
    return pd.DataFrame(rows)


def sg_user_vectors_oracle(user_sg: pd.DataFrame) -> pd.DataFrame:
    rows = {"uid": [], "sg_vec": []}
    for r in user_sg.itertuples(index=False):
        f = np.asarray(list(r.followees), dtype=np.int64)
        w = np.asarray(list(r.weights), dtype=np.float64)
        v = w @ al.uid_sign_vectors(f) if len(f) else np.zeros(al.SG_DIM)
        n = float(np.linalg.norm(v))
        rows["uid"].append(int(r.uid))
        rows["sg_vec"].append((v / n if n > 0 else v).tolist())
    return pd.DataFrame(rows)


def features_oracle(
    cands: pd.DataFrame, accounts: pd.DataFrame, user_text: pd.DataFrame,
    entities_df: pd.DataFrame, user_sg: pd.DataFrame | None = None,
    hp: dict | None = None, wemb: dict | None = None,
) -> pd.DataFrame:
    joined = cands.merge(accounts, on="uid").merge(user_text, on="uid", how="left")
    joined["user_text"] = joined["user_text"].fillna("")
    ent_vecs = {}
    if user_sg is not None:
        sgv = sg_user_vectors_oracle(user_sg)
        joined = joined.merge(sgv, on="uid", how="left")
        ev = al.entity_context_vectors_df(cands)
        ent_vecs = {
            rid: np.asarray(v, dtype=np.float64)
            for rid, v in zip(ev["resource_id"], ev["ctx_vec"])
        }
    wemb_vecs = {}
    if wemb is not None:
        from .pipelines.wordemb import (
            _model_arrays,
            project_texts,
            wemb_entity_vectors_df,
        )

        tok2row, W = _model_arrays(wemb)
        uv = project_texts(
            [str(t) for t in user_text["user_text"]], tok2row, W
        )
        joined = joined.merge(
            pd.DataFrame(
                {"uid": user_text["uid"].to_numpy(), "wemb_vec": list(uv)}
            ),
            on="uid", how="left",
        )
        wemb_vecs = wemb_entity_vectors_df(entities_df, wemb)
    # identical idf table as the engine's build_idf
    df_counts: dict[str, int] = {}
    for t in user_text["user_text"]:
        for tok in set(str(t).lower().split()):
            df_counts[tok] = df_counts.get(tok, 0) + 1
    n_docs = max(len(user_text), 1)
    idf = {
        t: float(np.log(n_docs / (1.0 + c)) + 1.0) for t, c in df_counts.items()
    }
    stage = al.FeatureStage(
        al.entities_broadcast_dict(entities_df), idf, ent_vecs, hp, wemb_vecs
    )
    return stage(joined)


def latest_accounts_oracle(snaps: pd.DataFrame) -> pd.DataFrame:
    return (
        snaps.sort_values(["snapshot_ts", "statuses_count"], kind="mergesort")
        .groupby("uid", as_index=False, sort=False)
        .tail(1)
    )


def select_oracle(scored: pd.DataFrame, max_imp: float, min_score: float) -> pd.DataFrame:
    out = []
    for rid, g in scored.groupby("resource_id", sort=False):
        g = g.sort_values(["score", "uid"], ascending=[False, True], kind="mergesort").copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["is_alignment"] = False
        pos = g.loc[g["score"] >= 0.5, "score"].to_numpy()
        if len(pos):
            best = float(pos[0])
            second = float(pos[1]) if len(pos) > 1 else -1.0
            if (best - second) > max_imp and best > min_score:
                g.iloc[0, g.columns.get_loc("is_alignment")] = True
        out.append(g)
    return pd.concat(out, ignore_index=True)


def run_flagship_oracle(
    corpus_dir: str, weights: dict, max_imp: float = 0.0, min_score: float = 0.5,
    near_dedup: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Full oracle run with given scorer weights; returns
    (triples_df, selected_df)."""
    pages = pq.read_table(f"{corpus_dir}/pages").to_pandas()
    parsed = parse_pages_oracle(pages)
    if near_dedup:
        parsed = dedup_pages_oracle(parsed)
    name_index = name_index_oracle(parsed)
    user_text = user_text_oracle(parsed)
    accounts = latest_accounts_oracle(
        pq.read_table(f"{corpus_dir}/account_snapshots.parquet").to_pandas()
    )
    entities_df = pq.read_table(f"{corpus_dir}/kb_entities.parquet").to_pandas()
    user_sg = user_sg_oracle(parsed)
    cands = candidates_oracle(entities_df, name_index)
    feats = features_oracle(
        cands, accounts, user_text, entities_df, user_sg,
        hp=al.load_homepage_alignments(corpus_dir),
        wemb=weights.get("wemb"),
    )

    X = feats[al.FEATURE_COLS].to_numpy(dtype=np.float64)
    feats = feats.copy()
    feats["score"] = al.score_matrix(X, weights)

    selected = select_oracle(feats, max_imp, min_score)

    # triples via the engine's emit kernel (shared row semantics)
    rows = []
    for r in selected.itertuples(index=False):
        entity = r.resource_id
        account = al.ACCOUNT_IRI_PREFIX + str(r.screen_name).replace(" ", "+")
        bnode = al.stable_bnode(entity, int(r.uid))
        c = float(r.score)
        rk = int(r.rank)
        if r.is_alignment:
            rows.append((entity, al.FOAF_ACCOUNT, account, c, rk))
        rows.append((entity, al.OWL_SAMEAS, entity, c, rk))
        rows.append((entity, al.SL_CANDIDATE, bnode, c, rk))
        rows.append((bnode, al.SL_RANK, str(rk), c, rk))
        rows.append((bnode, al.SL_CONFIDENCE, f"{c:.6f}", c, rk))
        rows.append((bnode, al.SL_ACCOUNT, account, c, rk))
        rows.append((account, al.DCT_IDENTIFIER, str(int(r.uid)), c, rk))
        rows.append((account, al.FOAF_ACCOUNT_NAME, str(r.screen_name), c, rk))
    triples = pd.DataFrame(rows, columns=["subj", "pred", "obj", "conf", "rank"])
    triples = triples.sort_values(
        ["subj", "conf"], ascending=[True, False], kind="mergesort"
    ).reset_index(drop=True)
    return triples, selected

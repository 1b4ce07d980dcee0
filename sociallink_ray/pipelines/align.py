"""Flagship pipeline: Common-Crawl-style pages -> alignment triples.

The Ray-Data-native re-expression of the reference's three entry points
(SURVEY.md §3): index building (BuildUserIndex.java:76-127), offline
alignment corpus build (PrepareTrainingSet.java:159-559 /
FillFromIndex.java:87-166), and the production scoring loop
(SubmitEntities -> ScoreEntities -> RDFExporter). One streaming Dataset
pipeline replaces the Flink jobs + PostgreSQL tables + HTTP model
servers:

    pages/ ──parse map_batches (HTML->text, html dropped immediately,
      byte-identical per url; account refs; mention surfaces)
      ──lang filter──> MinHash-LSH near-dedup ──┬─> name_index (A1 combiner groupby)
                                                ├─> user_text  (A3/A4 capped concat)
                                                └─> mention surface stats
    kb_entities ──CandidateLookup actor pool (broadcast inverted index,
      1000/300-retry/40 caps of FillFromIndex.java:96-157)──>
      candidate pairs ──join accounts(latest-wins snapshots)──join user_text──>
      feature map_batches (ISWC17-style scalar features,
      scorer/ISWC17Strategy.java:34-45) ──> logistic scorer (broadcast
      weights; ModelEndpoint.java:46-80 analogue) ──>
      per-entity selection (getPrediction semantics,
      PrepareTrainingSet.java:904-926) ──> triples (RDFExporter.java:161-197
      emission rules) ──sort(subj asc, conf desc)──> partitioned parquet.

Every stage can be checkpointed through state.manifest.checkpoint_stage.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data import Dataset

from ..functions import names as nm
from ..functions.similarity import jaro_winkler, name_similarity
from ..functions.textnorm import (
    extract_account_refs,
    extract_html_text,
    extract_mention_surfaces,
    normalize_fullname,
)
from ..stages import dedup, ops

# candidate harvest caps (FillFromIndex.java:96,104,154-157;
# PrepareTrainingSet.java:73)
TOP_POSTINGS = 1000
RETRY_THRESHOLD = 300
CANDIDATES_THRESHOLD = 40
MAX_OPTION = 3

# deterministic "today" for the activity feature (ActivityScorer.java:17-21
# uses wall clock; a reproducible pipeline pins it)
REF_NOW = np.datetime64("2024-04-01T00:00:00", "us")
MAX_DAYS = 100.0

# user_text harvest caps (pages per account / chars per page; the
# reference caps harvests everywhere rather than concatenating
# unboundedly — and the per-page prefix keeps the uid shuffle payload
# bounded)
USER_TEXT_PAGES_CAP = 20
USER_TEXT_CHARS_PER_PAGE = 500

TF_DIM = 2048  # hashed tf-idf dim (too small -> bucket crosstalk kills the signal)


# --------------------------------------------------------------------------
# stage 1: parse
# --------------------------------------------------------------------------


def parse_pages(
    pages: Dataset,
    langs: tuple[str, ...] = ("en",),
    drop_ids: np.ndarray | set | None = None,
) -> Dataset:
    """The HTML->text kernel with the silent-drop contract
    (Deserializer.java:28-32), the account-ref / mention extraction
    (IndexExtractor, BuildUserIndex.java:221-298), the language filter
    (LanguageFilter.java:7-27) — with latest-wins per url (A2 analogue)
    applied via a pre-computed broadcast ``drop_ids`` array.

    The drop set comes from ``latest_wins_drop_ids`` over a KEYS-ONLY
    column-pruned read (page_id, url, warc_ts) — never shuffling the
    html payload, never parsing a page that loses latest-wins, and
    never pushing the parsed output through the object store twice
    (the previous parse-then-anti-join shape materialized the ~2.5 GB
    payload once per side of the filter). It rides the object store as
    a SORTED int64 numpy array — 8 bytes/id vs ~70 for a Python set
    (at web scale the dup-rate-bounded set is still ~10^8 ids), with
    vectorized searchsorted membership instead of per-row hashing."""
    drop_arr = np.sort(np.asarray(list(drop_ids) if isinstance(drop_ids, (set, frozenset))
                                  else (drop_ids if drop_ids is not None else []),
                                  dtype=np.int64))
    drop_ref = ray.put(drop_arr)
    lang_set = pa.array(list(langs), pa.string())

    def parse(batch: pa.Table) -> pa.Table:
        drop = ops.cached_get(drop_ref)
        # vectorized pre-filter: latest-wins losers + language, before
        # any html leaves arrow
        mask = pc.is_in(batch["lang"], value_set=lang_set)
        if len(drop):
            pids_np = batch["page_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(drop, pids_np)
            pos[pos == len(drop)] = 0
            stale = drop[pos] == pids_np
            mask = pc.and_(mask, pa.array(~stale))
        batch = batch.filter(mask)
        pids, texts, ref_names, ref_uids, surfaces = [], [], [], [], []
        for pid, html in zip(
            batch["page_id"].to_pylist(), batch["html"].to_pylist(),
        ):
            # decode once; extract_html_text accepts str (bytes path
            # would decode a second time per page)
            h = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
            text = extract_html_text(h)
            if not text:
                continue  # counted drop path
            refs = extract_account_refs(h)
            pids.append(pid)
            texts.append(text)
            ref_names.append([r[0] for r in refs])
            ref_uids.append([r[1] for r in refs])
            surfaces.append(extract_mention_surfaces(h))
        return pa.table(
            {
                "page_id": pa.array(pids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "ref_names": pa.array(ref_names, pa.list_(pa.string())),
                "ref_uids": pa.array(ref_uids, pa.list_(pa.int64())),
                "mention_surfaces": pa.array(surfaces, pa.list_(pa.string())),
            }
        )

    return pages.map_batches(parse, batch_format="pyarrow", batch_size=1024)


# Above this many SET ELEMENTS, the broadcast-array path (driver holds
# a sorted int64 array, ray.put once, fused filter per split task)
# flips to the exchange-side anti-join: 32M ids = 256 MB at 8 B/id is
# already generous for a driver/broadcast footprint, and on a real
# crawl (30-60% dup URLs, 10^11 pages) the drop set is O(corpus rows)
# — the reference held it as a 5 GB off-heap set per process; we
# instead hash-exchange it against the rows it filters so NO process
# ever holds the whole set (exchange_id_anti_join, the customer_anti
# shape).
#
# Unit caveat (round-4 ADVICE): ``near_dedup_drops`` gates on its
# verified EDGE count, not the eventual drop-id count — the edges
# themselves are what the below-threshold branch pulls to the driver
# for union-find, at 16 B/row (two int64 ids) = 2x the 8 B/id this
# constant was sized for. That call site therefore compares
# ``n_edges`` against HALF this constant, keeping the driver byte
# budget identical across both set shapes (drops <= edges always, so
# the resulting broadcast array stays within budget too).
DROP_BROADCAST_THRESHOLD = 32_000_000


def latest_wins_stale_keys(corpus_dir: str):
    """Latest-wins per url over a KEYS-ONLY column-pruned read of the
    pages table, as a (page_id) Dataset of the stale fetches
    (everything but the max (warc_ts, page_id) per url) — html never
    enters this scan, and the stale set never has to land on the
    driver (``latest_wins_drop_ids`` collects it only below the
    broadcast threshold)."""
    keys = rd.read_parquet(
        f"{corpus_dir}/pages", columns=["page_id", "url", "warc_ts"]
    )

    def stale(df: pd.DataFrame, gk: list[str]) -> pd.DataFrame:
        df = df.sort_values(["warc_ts", "page_id"], kind="mergesort")
        return df.loc[df.duplicated(subset=gk, keep="last"), ["page_id"]]

    return ops.bucketed_group_apply(keys, ["url"], stale)


def latest_wins_drop_ids(corpus_dir: str) -> np.ndarray:
    """Driver-array form of ``latest_wins_stale_keys`` (sorted int64
    page_ids) — only safe below DROP_BROADCAST_THRESHOLD."""
    stale = latest_wins_stale_keys(corpus_dir)
    return np.sort(stale.to_pandas()["page_id"].to_numpy(np.int64))


def near_dedup_drops(
    parsed: Dataset, threshold: float = 0.8,
    broadcast_threshold: int = DROP_BROADCAST_THRESHOLD,
):
    """Auto-scaling MinHash near-dedup drop set: returns
    ``(drop_array | None, drop_keys_dataset | None, info)`` — exactly
    one of the first two is non-None when any near-dup exists.

    Below ``broadcast_threshold`` verified edges, the edge list is
    tiny, so cluster resolution is a driver union-find and the result a
    broadcastable sorted id array (8 B/id — cheap to fuse into every
    downstream exchange split). Above it, the same edges stay a
    Dataset, components resolve with the distributed min-label
    ``connected_components`` (pointer-jumping, O(log n) exchange
    rounds), and the drop set is returned as a (page_id) Dataset for
    ``exchange_id_anti_join`` — no process ever holds it whole.
    ``info`` reports mode / edge count / drop count / drop bytes for
    the run manifest."""
    edges_ds = dedup.minhash_dup_edges_ds(
        parsed, "text", "page_id", threshold=threshold,
        num_perm=64, bands=16,
    )
    if edges_ds is None:
        return None, None, {"mode": "none", "n_edges": 0, "n_drop": 0,
                            "drop_bytes": 0}
    n_edges = edges_ds.count()
    if n_edges == 0:
        return None, None, {"mode": "none", "n_edges": 0, "n_drop": 0,
                            "drop_bytes": 0}
    # edges are 16 B/row vs the 8 B/id the threshold constant is sized
    # for — halve it here so the driver union-find's to_pandas stays
    # within the same byte budget as the broadcast-id path (see the
    # DROP_BROADCAST_THRESHOLD unit caveat)
    if n_edges < broadcast_threshold // 2:
        comp = dedup._union_find_components(edges_ds.to_pandas(), "page_id")
        drop = np.sort(
            comp.loc[comp["page_id"] != comp["cluster_id"], "page_id"]
            .to_numpy(np.int64)
        )
        return (drop if len(drop) else None), None, {
            "mode": "broadcast", "n_edges": int(n_edges),
            "n_drop": int(len(drop)), "drop_bytes": int(drop.nbytes),
        }
    comp = dedup.connected_components(edges_ds, "a", "b")
    drops = comp.map_batches(
        lambda t: pa.table(
            {"page_id": t.filter(
                pc.not_equal(t["node"], t["label"])
            )["node"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_drop = drops.count()
    return None, (drops if n_drop else None), {
        "mode": "exchange", "n_edges": int(n_edges),
        "n_drop": int(n_drop), "drop_bytes": int(drops.size_bytes() or 0),
    }


def dedup_pages(
    parsed: Dataset, threshold: float = 0.8,
    broadcast_threshold: int = DROP_BROADCAST_THRESHOLD,
) -> Dataset:
    """Filtered-Dataset form of the near-dedup drop set — used where a
    materialized deduped corpus is the right artifact (checkpointed
    runs, standalone queries). Auto-switches broadcast anti semi-join
    vs exchange-side anti-join on the drop-set size."""
    drop_arr, drop_ds, _ = near_dedup_drops(
        parsed, threshold, broadcast_threshold
    )
    if drop_arr is not None:
        return ops.broadcast_semi_join(
            parsed, set(drop_arr), "page_id", anti=True
        )
    if drop_ds is not None:
        return ops.exchange_id_anti_join(parsed, drop_ds, "page_id")
    return parsed


# --------------------------------------------------------------------------
# stage 2: index building (the wide shuffles)
# --------------------------------------------------------------------------


def build_name_index(parsed: Dataset, drop_ref=None) -> Dataset:
    """(fullname, uid, freq) inverted-index table —
    ``groupBy(fullname, uid).sum(cnt)`` (BuildUserIndex.java:104-111, A1)
    with the per-batch combiner handling the Zipf-skewed head names.
    ``drop_ref``: broadcast near-dup drop set, filtered inside the
    fused split (no deduped-corpus copy)."""

    def explode(tbl: pa.Table) -> pa.Table:
        if drop_ref is not None:
            tbl = ops.id_drop_filter(drop_ref, "page_id")(tbl)
        df = tbl.select(["ref_names", "ref_uids"]).to_pandas()
        out = df.explode(["ref_names", "ref_uids"]).dropna()
        return pa.table(
            {
                "fullname": out["ref_names"].astype(str),
                "uid": out["ref_uids"].astype("int64"),
                "cnt": np.ones(len(out), dtype=np.int64),
            }
        )

    # explode + combiner map-fused into the exchange split (the mention
    # rows never materialize; parsed blocks are read zero-copy)
    return ops.partial_groupby_sum(
        parsed, ["fullname", "uid"], sums={"cnt": "freq"}, pre_fn=explode
    )


def build_user_text(parsed: Dataset, drop_ref=None) -> Dataset:
    """(uid, user_text) — per-account page-text concat (A3/A4,
    BuildUserIndex.java:113-123), capped at USER_TEXT_PAGES_CAP pages per
    uid (harvest-cap discipline of the reference). ``drop_ref``: see
    ``build_name_index``."""

    def explode(tbl: pa.Table) -> pa.Table:
        if drop_ref is not None:
            tbl = ops.id_drop_filter(drop_ref, "page_id")(tbl)
        df = tbl.select(["page_id", "text", "ref_uids"]).to_pandas()
        rows = df.explode("ref_uids").dropna()
        rows = rows.drop_duplicates(subset=["page_id", "ref_uids"])
        out = pd.DataFrame(
            {
                "uid": rows["ref_uids"].astype("int64"),
                "page_id": rows["page_id"].astype("int64"),
                "text": rows["text"].astype(str).str.slice(0, USER_TEXT_CHARS_PER_PAGE),
            }
        )
        # map-side partial cap (associative: global min-20 by page_id =
        # min-20 of per-batch min-20s): the Zipf-head celebrity uids
        # appear on thousands of pages per batch — without this the
        # exchange ships every mention's text only for the reduce to
        # cut all but 20
        out = out.sort_values("page_id", kind="mergesort")
        out = out.groupby("uid", sort=False).head(USER_TEXT_PAGES_CAP)
        return pa.Table.from_pandas(out, preserve_index=False)

    # explode map-fused into the split task, then cap + ordered concat
    # in ONE uid-bucket shuffle (separate topk_per_group +
    # concat_per_group stages would shuffle twice, and a standalone
    # explode stage would materialize every (uid, page-text) mention)
    def cap_and_concat(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values("page_id", kind="mergesort")
        df = df.groupby(keys, sort=False).head(USER_TEXT_PAGES_CAP)
        return df.groupby(keys, as_index=False, sort=False).agg(
            user_text=("text", "\n".join)
        )

    return ops.bucketed_group_apply(
        parsed, ["uid"], cap_and_concat, map_fn=explode
    )


def latest_accounts(snapshots: Dataset) -> Dataset:
    """Latest profile per uid (groupBy(uid).reduce(max statuses_count)
    with combiner — BuildUserIndex.java:93-101, A2; ordered here by
    (snapshot_ts, statuses_count) which is strictly monotone in the
    fixture)."""
    return ops.latest_by(snapshots, "uid", ["snapshot_ts", "statuses_count"])


# --------------------------------------------------------------------------
# stage 3: candidate acquisition (J1)
# --------------------------------------------------------------------------


def load_entities(kb_path: str) -> pd.DataFrame:
    df = pq.read_table(kb_path).to_pandas()
    return df


class CandidateLookup:
    """Candidate lookup against the broadcast inverted index,
    reproducing FillFromIndex.java:87-166: per-name postings merged by
    uid (Σfreq), top-1000 harvest, retry with a narrower name set while
    >300 results (``:104``), final top-40 by Σfreq. Dead entities
    skipped (ProcessDataset.java:192-202). Runs inside task-based
    ``map_batches`` with the postings fetched once per worker
    (ops.cached_get).

    Matching is TOKEN-level with phrase-AND semantics — a query phrase
    matches a fullname containing all of its tokens, with the matched
    freq = min over token freqs. This reproduces the reference's
    Postgres FULLTEXT behavior (schema.sql:43-48 GIN index + tsquery of
    quoted phrases) rather than exact string equality, so "james smith"
    still hits the display name "james smith official".

    ``index`` is either a plain token->postings dict (the oracle / spec
    path) or a LIST of shard ObjectRefs from
    ``build_token_postings_sharded``: probes route by
    ``token_shard(tok)`` and each worker lazily fetches (and
    process-caches) only the shards its tokens hash into — the driver
    never holds the full inverted index (user_index is the reference's
    biggest table, schema.sql:20-29)."""

    def __init__(self, index):
        if isinstance(index, dict):
            self.index = index
            self.shards = None
        else:
            self.index = None
            self.shards = list(index)

    def _tok_postings(self, tok: str):
        if self.index is not None:
            return self.index.get(tok)
        shard = ops.cached_get(self.shards[token_shard(tok, len(self.shards))])
        return shard.get(tok)

    def _phrase_hits(self, phrase: str) -> dict[int, int]:
        toks = phrase.split()
        if not toks:
            return {}
        postings = [self._tok_postings(t) for t in toks]
        if any(p is None for p in postings):
            return {}
        postings.sort(key=len)
        base = postings[0]
        out: dict[int, int] = {}
        for uid, freq in base.items():
            f = freq
            ok = True
            for p in postings[1:]:
                pf = p.get(uid)
                if pf is None:
                    ok = False
                    break
                f = min(f, pf)
            if ok:
                out[uid] = f
        return out

    def _postings(self, keys: list[str]) -> dict[int, int]:
        merged: dict[int, int] = {}
        for key in keys:
            for uid, freq in self._phrase_hits(key).items():
                merged[uid] = merged.get(uid, 0) + int(freq)
        return merged

    def lookup(self, resource: nm.Resource) -> list[tuple[int, int, int]]:
        if resource.is_dead:
            return []
        chosen: dict[int, int] = {}
        for option in range(MAX_OPTION + 1):
            keys = nm.all_names_keys(resource, option)
            if not keys:
                break
            merged = self._postings(keys)
            # harvest cap: top-1000 by freq desc (uid asc tie-break)
            top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_POSTINGS]
            chosen = dict(top)
            if len(top) <= RETRY_THRESHOLD:
                break
        ranked = sorted(chosen.items(), key=lambda kv: (-kv[1], kv[0]))
        return [
            (uid, freq, order)
            for order, (uid, freq) in enumerate(ranked[:CANDIDATES_THRESHOLD], 1)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rids, uids, freqs, orders = [], [], [], []
        for rid, attrs_json in zip(
            batch["resource_id"].to_pylist(), batch["attributes_json"].to_pylist()
        ):
            res = nm.Resource(rid, json.loads(attrs_json))
            for uid, freq, order in self.lookup(res):
                rids.append(rid)
                uids.append(uid)
                freqs.append(freq)
                orders.append(order)
        return pa.table(
            {
                "resource_id": pa.array(rids, pa.string()),
                "uid": pa.array(uids, pa.int64()),
                "index_freq": pa.array(freqs, pa.int64()),
                "order": pa.array(orders, pa.int64()),
            }
        )


def build_token_postings(name_index_df: pd.DataFrame) -> dict[str, dict[int, int]]:
    """(fullname, uid, freq) rows -> token -> {uid: freq} postings (freqs
    summed per (token, uid) across names containing the token). The
    single-dict SPEC implementation used by the oracle; the engine path
    is ``build_token_postings_sharded``."""
    index: dict[str, dict[int, int]] = {}
    for name, uid, freq in zip(
        name_index_df["fullname"], name_index_df["uid"], name_index_df["freq"]
    ):
        for tok in set(str(name).split()):
            d = index.setdefault(tok, {})
            d[int(uid)] = d.get(int(uid), 0) + int(freq)
    return index


def token_shard(tok: str, num_shards: int) -> int:
    """Shard routing for the inverted index: one stable string hash used
    by BOTH the distributed shard build and every probe."""
    import zlib

    return zlib.crc32(tok.encode("utf-8")) % num_shards


def build_token_postings_sharded(
    name_index: Dataset, num_shards: int | None = None
) -> list:
    """Token-hash-sharded inverted index, built entirely off the driver
    (FillFromIndex.java:87-158's user_index at web scale): map tasks
    explode (fullname, uid, freq) into (token, uid, freq) rows with a
    per-batch combiner and split them by ``token_shard``; one reduce
    task per shard merges its rows and builds the token->{uid: freq}
    dict IN the task — the returned ObjectRefs are the per-shard
    broadcast objects workers fetch lazily. The driver only ever holds
    the list of refs."""
    if num_shards is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        num_shards = max(8, ncpu // 2)
    S = int(num_shards)

    def explode_tokens(df: pd.DataFrame) -> pd.DataFrame:
        names = df["fullname"].astype(str)
        toks = names.str.split()
        out = pd.DataFrame(
            {
                "token": toks,
                "uid": df["uid"].astype("int64"),
                "freq": df["freq"].astype("int64"),
            }
        ).explode("token")
        out = out.dropna(subset=["token"])
        # distinct token per (name-row, uid): a token repeated inside one
        # fullname must count that name's freq once (set() semantics of
        # the spec implementation)
        out = out.reset_index().drop_duplicates(subset=["index", "token"])
        out = out.groupby(["token", "uid"], as_index=False, sort=False)[
            "freq"
        ].sum()
        import zlib

        out["shard"] = [
            zlib.crc32(t.encode("utf-8")) % S for t in out["token"]
        ]
        return out

    tokens = name_index.map_batches(
        explode_tokens, batch_format="pandas"
    ).materialize()
    refs = tokens.to_arrow_refs()
    if not refs:
        return [ray.put({}) for _ in range(S)]

    @ray.remote(num_returns=S)
    def split(*tbls: pa.Table):
        tbl = (
            tbls[0]
            if len(tbls) == 1
            else pa.concat_tables(tbls, promote_options="default")
        )
        shard = tbl["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        stbl = tbl.take(pa.array(order))
        counts = np.bincount(shard, minlength=S)
        offs = np.concatenate([[0], np.cumsum(counts)])
        parts = [stbl.slice(offs[i], counts[i]) for i in range(S)]
        return parts[0] if S == 1 else tuple(parts)

    @ray.remote
    def build_shard(*parts: pa.Table) -> dict:
        nonempty = [p for p in parts if p.num_rows]
        if not nonempty:
            return {}
        df = pa.concat_tables(nonempty, promote_options="default").to_pandas()
        df = df.groupby(["token", "uid"], as_index=False, sort=False)["freq"].sum()
        index: dict[str, dict[int, int]] = {}
        for tok, uid, freq in zip(df["token"], df["uid"], df["freq"]):
            index.setdefault(tok, {})[int(uid)] = int(freq)
        return index

    split_refs = [split.remote(*g) for g in ops._coalesce_refs(refs)]
    if S == 1:
        split_refs = [[r] for r in split_refs]
    return [
        build_shard.remote(*[sr[s] for sr in split_refs]) for s in range(S)
    ]


def acquire_candidates(entities: Dataset, name_index: Dataset) -> Dataset:
    """Entities × sharded inverted index -> exploded candidate-pair
    table (resource_id, uid, index_freq, order). The postings build is a
    distributed exchange (``build_token_postings_sharded``); workers
    route probes by token hash and cache the shards they touch."""
    shards = build_token_postings_sharded(name_index)

    def lookup_batch(batch: pa.Table) -> pa.Table:
        lk = CandidateLookup(shards)
        return lk(batch)

    return entities.map_batches(
        lookup_batch, batch_format="pyarrow", batch_size=256
    )


# --------------------------------------------------------------------------
# stage 4: features (ISWC17-style scalar providers)
# --------------------------------------------------------------------------

ISWC17_SCALAR_COLS = [
    "f_verified", "f_name_jw", "f_screen_jw", "f_ff_ratio", "f_friends",
    "f_followers", "f_listed", "f_statuses", "f_activity",
    "f_person", "f_company", "f_other", "f_text_cos",
    # homepage-alignment dictionary features — INSIDE the subspace, so
    # they participate in the pairwise products, matching the provider
    # list order of ISWC17Strategy.java:44 (IDMatches / IDExists /
    # IDUnique, HomepageAlignmentsScorer.java:82-115)
    "f_hp_id_matches", "f_hp_id_exists", "f_hp_id_unique",
]
# ISWC17Strategy.java:87-92: the subspace's feature vector is the scalar
# provider outputs PLUS every pairwise product features[i]*features[j],
# i<j — the interaction terms that give the linear model its capacity
_PAIR_IDX = [
    (i, j)
    for i in range(len(ISWC17_SCALAR_COLS))
    for j in range(i + 1, len(ISWC17_SCALAR_COLS))
]
ISWC17_PAIR_COLS = [
    f"x_{ISWC17_SCALAR_COLS[i][2:]}_{ISWC17_SCALAR_COLS[j][2:]}"
    for i, j in _PAIR_IDX
]
# social-graph subspace (PAI18Strategy.java:40-43 "sg300" /
# SocialGraphEmbeddings.java:28-45): products stay INSIDE the ISWC17
# subspace; the sg feature is concatenated alongside, like the
# reference's per-subspace Map<String, double[]> model shape
SG_FEATURE_COLS = ["f_sg_cos"]
# DescriptionScorer.java:30-50: mean over the entity's rdfs:comment
# values (COMMENT_PROPERTY) of |tokens(comment) ∩ tokens(profile
# description)| / |tokens(profile description)|, -1 when the entity has
# no comments. A standalone provider in the reference (not a member of
# any strategy's subspace), so it stays OUTSIDE the pairwise products.
DESC_FEATURE_COLS = ["f_desc_overlap"]
# PAI18Strategy.java:71-97: trained embedding vectors scored as their
# own cosine subspace (EmbeddingsProvider.java:84-151 serving shape) —
# here term vectors factorized from the A9 co-occurrence matrix
# (pipelines/wordemb.py), entity-abstract side vs account-text side.
# Like the sg/desc subspaces it stays OUTSIDE the pairwise products.
WEMB_FEATURE_COLS = ["f_wemb_cos"]
FEATURE_COLS = [
    *ISWC17_SCALAR_COLS, *ISWC17_PAIR_COLS, *SG_FEATURE_COLS,
    *DESC_FEATURE_COLS, *WEMB_FEATURE_COLS,
]

# --- homepage-alignment dictionaries -------------------------------------


def load_homepage_alignments(corpus_dir: str) -> dict[str, tuple]:
    """resource_id -> (filtered_id | None, frozenset(extracted ids)).

    HomepageAlignmentsScorer.createProviders semantics
    (HomepageAlignmentsScorer.java:37-73): the "extracted" CSV populates
    the per-entity id set, the "filtered" CSV sets the single filteredId
    — but only for entities already present from the extracted pass
    (the reference logs "Impossible thing" and skips otherwise). All ids
    lowercased at load. KB-dimension sized (one row per entity homepage
    hit), so a driver read + ``ray.put`` broadcast is the right shape —
    the reference itself loads these as in-memory HashMaps."""
    import os

    path = os.path.join(corpus_dir, "homepage_alignments.parquet")
    if not os.path.exists(path):
        return {}
    df = pq.read_table(path).to_pandas()
    ids: dict[str, set] = {}
    ext = df[df["kind"] == "extracted"]
    for rid, sn in zip(ext["resource_id"], ext["screen_name"]):
        ids.setdefault(rid, set()).add(str(sn).lower())
    filtered: dict[str, str] = {}
    flt = df[df["kind"] == "filtered"]
    for rid, sn in zip(flt["resource_id"], flt["screen_name"]):
        if rid in ids:
            filtered[rid] = str(sn).lower()
    return {
        rid: (filtered.get(rid), frozenset(s)) for rid, s in ids.items()
    }


# --- social-graph embedding subspace -------------------------------------

SG_DIM = 64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit avalanche (SplitMix64 finalizer)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def uid_sign_vectors(uids: np.ndarray) -> np.ndarray:
    """Deterministic unit-norm ±1/sqrt(d) sign vector per uid — the
    engine's stand-in for the reference's LEARNED followee embedding
    matrix (the sg300 model behind SocialGraphEmbeddings' HTTP
    ``/transform/sg300``; training RDF2Vec is out of scope, the
    random-projection basis preserves the weighted-neighborhood-overlap
    geometry the cosine consumes). DOCUMENTED DEVIATION."""
    h = _splitmix64(np.asarray(uids, dtype=np.int64).view(np.uint64))
    bits = (h[:, None] >> np.arange(SG_DIM, dtype=np.uint64)) & np.uint64(1)
    return (2.0 * bits.astype(np.float64) - 1.0) / np.sqrt(SG_DIM)


def sg_user_vectors(user_sg: Dataset) -> Dataset:
    """(uid, followees[], weights[]) -> (uid, sg_vec list<double>): the
    weighted average of followee embedding vectors, L2-normalized —
    SocialGraphEmbeddings._getFeatures semantics (followees+weights ->
    dense subspace vector) with the hashed basis above."""

    def vecs(df: pd.DataFrame) -> pd.DataFrame:
        out_vecs = []
        for fols, ws in zip(df["followees"], df["weights"]):
            f = np.asarray(list(fols), dtype=np.int64)
            w = np.asarray(list(ws), dtype=np.float64)
            if len(f) == 0:
                out_vecs.append(np.zeros(SG_DIM).tolist())
                continue
            v = w @ uid_sign_vectors(f)
            n = float(np.linalg.norm(v))
            out_vecs.append((v / n if n > 0 else v).tolist())
        return pd.DataFrame(
            {"uid": df["uid"].astype("int64"), "sg_vec": out_vecs}
        )

    return user_sg.map_batches(vecs, batch_format="pandas")


def entity_context_vector(uids: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Entity-side sg vector: the index-frequency-weighted average of
    the entity's candidate-account embeddings, L2-normalized — the
    entity's social neighborhood as evidenced by the inverted index
    (the engine's analogue of the kb-side embedding subspace,
    EntityDirectEmbeddings semantics re-grounded in observable data).
    Summation is in uid-sorted order so engine and oracle agree
    bitwise."""
    order = np.argsort(uids, kind="stable")
    u = np.asarray(uids, dtype=np.int64)[order]
    f = np.asarray(freqs, dtype=np.float64)[order]
    if len(u) == 0:
        return np.zeros(SG_DIM)
    v = f @ uid_sign_vectors(u)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def entity_context_vectors_df(cands_df: pd.DataFrame) -> pd.DataFrame:
    """Per-entity context vectors from the candidate table (driver/spec
    form; the engine runs this same kernel per exchange bucket)."""
    rows = {"resource_id": [], "ctx_vec": []}
    for rid, g in cands_df.groupby("resource_id", sort=True):
        rows["resource_id"].append(rid)
        rows["ctx_vec"].append(
            entity_context_vector(
                g["uid"].to_numpy(), g["index_freq"].to_numpy()
            ).tolist()
        )
    return pd.DataFrame(rows)


def entity_context_vectors(candidates: Dataset) -> dict[str, np.ndarray]:
    """resource_id -> context vector dict (KB-dimension sized, broadcast
    alongside the entities dict). Built via the exchange — the grouped
    kernel never runs on the driver."""
    vecs = ops.bucketed_group_apply(
        candidates.select_columns(["resource_id", "uid", "index_freq"]),
        ["resource_id"],
        lambda df, k: entity_context_vectors_df(df),
    ).to_pandas()
    return {
        rid: np.asarray(v, dtype=np.float64)
        for rid, v in zip(vecs["resource_id"], vecs["ctx_vec"])
    }


def entity_context_vector_refs(candidates: Dataset) -> ops.ShardedDictRefs:
    """Sharded-broadcast form of :func:`entity_context_vectors`: the
    per-entity vectors never assemble into one driver dict — per-block
    tasks hash-split the (resource_id, ctx_vec) rows and each worker
    fetches only the shards its rows touch (same discipline as the KB
    attribute shards)."""
    vec_ds = ops.bucketed_group_apply(
        candidates.select_columns(["resource_id", "uid", "index_freq"]),
        ["resource_id"],
        lambda df, k: entity_context_vectors_df(df),
    ).materialize()
    return ops.ShardedDictRefs(
        ops.sharded_vec_refs(vec_ds, "resource_id", "ctx_vec")
    )


def _hashed_tf_stable(
    text: str, idf: dict[str, float] | None = None, default_idf: float = 1.0,
    dim: int = TF_DIM,
) -> np.ndarray:
    """Stable hashed log-tf(-idf) vector (BOW.java:105-117 logarithmic
    tf × LSM.java:96-125 Iidf). Tokens unseen in the user_text corpus
    get the MAX observed idf (rare-by-default; the reference's
    MemoryEmbeddingsProvider falls back to min idf instead —
    scorer/text/MemoryEmbeddingsProvider.java — we deviate deliberately
    so unseen discriminative tokens keep their weight)."""
    import zlib

    v = np.zeros(dim, dtype=np.float64)
    counts: dict[str, float] = {}
    for tok in text.lower().split():
        counts[tok] = counts.get(tok, 0.0) + 1.0
    for tok, tf in counts.items():
        w = (1.0 + np.log(tf)) * (
            idf.get(tok, default_idf) if idf is not None else 1.0
        )
        v[zlib.crc32(tok.encode("utf-8")) % dim] += w
    return v


def build_idf(
    user_text: Dataset, col: str = "user_text", return_n_docs: bool = False
) -> dict[str, float] | tuple[dict[str, float], int]:
    """token -> idf over a text-column corpus: one distributed
    distinct-token flat-map + combiner count, then the tiny vocab-sized
    table comes to the driver (T8: the BOW idf table).

    The corpus document count rides the SAME pass as a sentinel
    " " token (whitespace ``split()`` can never produce it) carrying
    each batch's row count — no separate ``count()`` execution of the
    input pipeline. ``return_n_docs=True`` also hands it to callers
    that need it (the LSA fit), saving them a third pass."""

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        # batch-local combiner: document frequency per token within the
        # batch (factorize over the flat token stream + one unique over
        # (row, code) — no per-row Python set building)
        tok_lists = [str(t).lower().split() for t in df[col]]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        sentinel = pd.DataFrame({"token": pd.Series([" "], dtype="object"),
                                 "df": pd.Series([len(df)], dtype="int64")})
        if lens.sum() == 0:
            return sentinel
        flat = np.asarray([t for tl in tok_lists for t in tl], dtype=object)
        codes, uniques = pd.factorize(flat)
        rows = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
        key = rows * np.int64(len(uniques)) + codes
        ucode = np.unique(key) % len(uniques)
        dfreq = np.bincount(ucode, minlength=len(uniques))
        out = pd.DataFrame({"token": pd.Series(uniques, dtype="object"),
                            "df": dfreq.astype(np.int64)})
        return pd.concat([out, sentinel], ignore_index=True)

    tokens = user_text.map_batches(toks, batch_format="pandas")
    df_counts = ops.partial_groupby_sum(
        tokens, ["token"], sums={"df": "df"}
    ).to_pandas()
    sent = df_counts["token"] == " "
    n_docs = max(int(df_counts.loc[sent, "df"].sum()), 1)
    df_counts = df_counts[~sent]
    idf = {
        t: float(np.log(n_docs / (1.0 + c)) + 1.0)
        for t, c in zip(df_counts["token"], df_counts["df"])
    }
    return (idf, n_docs) if return_n_docs else idf


def _vec_matrix(col, dim: int) -> np.ndarray:
    """Stack a merged uid-vector column into an (n, dim) float matrix,
    zero rows for missing/odd-shaped values. Duck-typed on purpose: a
    vector cell arrives as list / np.ndarray (plain pandas), Ray's
    ``TensorArrayElement`` (tensor-extension blocks through the
    exchange), or NaN/None (left-merge miss)."""
    out = np.zeros((len(col), dim))
    for i, v in enumerate(col):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        arr = np.asarray(v, dtype=np.float64)
        if arr.shape == (dim,):
            out[i] = arr
    return out


class FeatureStage:
    """Adds the scalar feature columns per candidate pair — the ISWC17
    provider set (ISWC17Strategy.java:34-45: Verified/Name-JW/
    ScreenName-JW/FFRatio/Friends/Followers/Listed/Statuses scorers +
    EntityTypeScorer + ActivityScorer + text cosine; formulas in
    scorer/*.java, reproduced exactly). Runs in task-based map_batches
    with the entity dict fetched once per worker.

    Vectorized: the scalar features are numpy column ops; the user-side
    hashed tf-idf vectors are one batched ``np.add.at`` scatter; entity
    abstract vectors are SPARSE (bucket idx + weights, ~10 nonzeros)
    and memoized per worker — the per-row dense-vector rebuild was the
    hottest loop in the whole pipeline (an entity's abstract vector was
    recomputed once per candidate, i.e. up to 40x)."""

    def __init__(
        self,
        entities: dict[str, dict],
        idf: dict[str, float] | None = None,
        ent_vecs: dict[str, np.ndarray] | None = None,
        hp: dict[str, tuple] | None = None,
        wemb_vecs: dict[str, np.ndarray] | None = None,
    ):
        self.entities = entities
        self.ent_vecs = ent_vecs or {}
        self.idf = idf or {}
        self.hp = hp or {}
        self.wemb_vecs = wemb_vecs or {}
        self.default_idf = max(self.idf.values(), default=1.0)
        self._abs_cache: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
        self._cmt_cache: dict[str, list[frozenset]] = {}
        self._tok_bucket: dict[str, int] = {}
        self._tok_w: dict[str, float] = {}

    def _comment_tokens(self, rid: str, comments: list[str]) -> list[frozenset]:
        """Token sets of the entity's rdfs:comment values, memoized per
        worker (an entity's comments are re-scored once per candidate,
        up to the 40-candidate cap)."""
        hit = self._cmt_cache.get(rid)
        if hit is None:
            hit = [frozenset(str(c).lower().split()) for c in comments]
            self._cmt_cache[rid] = hit
        return hit

    def _tok_meta(self, tok: str) -> tuple[int, float]:
        """(crc32 bucket, idf weight) per token, memoized per worker."""
        import zlib

        b = self._tok_bucket.get(tok)
        if b is None:
            b = zlib.crc32(tok.encode("utf-8")) % TF_DIM
            self._tok_bucket[tok] = b
            self._tok_w[tok] = self.idf.get(tok, self.default_idf) if self.idf else 1.0
        return b, self._tok_w[tok]

    def _abstract_sparse(self, rid: str, text: str):
        """Sparse hashed log-tf-idf of an entity abstract (memoized)."""
        hit = self._abs_cache.get(rid)
        if hit is not None:
            return hit
        counts: dict[str, float] = {}
        for tok in text.lower().split():
            counts[tok] = counts.get(tok, 0.0) + 1.0
        acc: dict[int, float] = {}
        for tok, tf in counts.items():
            b, w = self._tok_meta(tok)
            acc[b] = acc.get(b, 0.0) + (1.0 + np.log(tf)) * w
        idx = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
        w = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
        norm = float(np.sqrt((w * w).sum()))
        hit = (idx, w, norm)
        self._abs_cache[rid] = hit
        return hit

    def _user_tf_matrix(self, texts: list[str]) -> np.ndarray:
        """Batched dense hashed log-tf-idf matrix (n × TF_DIM).
        Tokenize + flatten + factorize run in Arrow C++ (utf8_lower ->
        whitespace split -> dictionary_encode — the Python
        split/listcomp/pd.factorize path was 1.5 s of a 1.7 s kernel on
        a 3.5k-pair partition); only the V batch-unique tokens touch
        Python (memoized crc32-bucket/idf lookup). Arrow's split emits
        "" around leading/trailing whitespace where ``str.split()``
        emits nothing — masked out, so the (row, token, tf) triples are
        identical to the Python path."""
        n = len(texts)
        M = np.zeros((n, TF_DIM), dtype=np.float64)
        arr = pa.array([str(t) for t in texts], type=pa.string())
        toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        if lens.sum() == 0:
            return M
        enc = pc.list_flatten(toks).dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = enc.dictionary.to_pylist()
        meta = [self._tok_meta(t) for t in uniques]
        ubucket = np.fromiter((m[0] for m in meta), dtype=np.int64, count=len(meta))
        uw = np.fromiter((m[1] for m in meta), dtype=np.float64, count=len(meta))
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        nonempty = np.fromiter(
            (t != "" for t in uniques), dtype=bool, count=len(uniques)
        )
        keep = nonempty[codes]
        if not keep.all():
            rows, codes = rows[keep], codes[keep]
        # tf per (row, token): unique over a combined key
        key = rows * np.int64(len(uniques)) + codes
        ukey, tf = np.unique(key, return_counts=True)
        krow = ukey // len(uniques)
        kcode = ukey % len(uniques)
        w = (1.0 + np.log(tf.astype(np.float64))) * uw[kcode]
        np.add.at(M, (krow, ubucket[kcode]), w)
        return M

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        feats = {c: np.zeros(n) for c in ISWC17_SCALAR_COLS}
        ents = [self.entities.get(r) for r in df["resource_id"]]
        have = np.array([e is not None for e in ents], dtype=bool)
        if n and have.any():
            fol = df["followers_count"].to_numpy(dtype=np.int64)
            fri = df["friends_count"].to_numpy(dtype=np.int64)
            lst = df["listed_count"].to_numpy(dtype=np.int64)
            sts = df["statuses_count"].to_numpy(dtype=np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                feats["f_verified"] = np.where(
                    have & df["verified"].to_numpy(dtype=bool), 1.0, 0.0
                )
                # FollowersFriendsRatioScorer.java / FollowersScorer.java etc.
                feats["f_ff_ratio"] = np.where(
                    have & (fol > 0) & (fri > 0), np.log(np.maximum(fol, 1) / np.maximum(fri, 1)), 0.0
                )
                feats["f_friends"] = np.where(have & (fri > 0), np.log(np.maximum(fri, 1)), 0.0)
                feats["f_followers"] = np.where(have & (fol > 0), np.log(np.maximum(fol, 1)), 0.0)
                feats["f_listed"] = np.where(have & (lst > 0), np.log(np.maximum(lst, 1)), 0.0)
                feats["f_statuses"] = np.where(have & (sts > 0), np.log(np.maximum(sts, 1)), 0.0)
            # ActivityScorer.java:17-31 (days capped at 100; no status -> 100)
            ts = pd.to_datetime(df["last_status_ts"]).to_numpy("datetime64[us]")
            days = (REF_NOW - ts) / np.timedelta64(1, "D")
            days = np.where(np.isnan(days), MAX_DAYS, np.clip(days, 0.0, MAX_DAYS))
            feats["f_activity"] = np.where(have, days, 0.0)
            feats["f_person"] = np.where(
                have & np.array([bool(e and e["is_person"]) for e in ents]), 1.0, 0.0
            )
            feats["f_company"] = np.where(
                have & np.array([bool(e and e["is_company"]) for e in ents]), 1.0, 0.0
            )
            feats["f_other"] = np.where(
                have & np.array([bool(e and e["is_other"]) for e in ents]), 1.0, 0.0
            )
            # JW name similarities (per-row: string kernels)
            names_col = df["name"].astype(str).to_numpy()
            screen_col = df["screen_name"].astype(str).to_numpy()
            for i in np.nonzero(have)[0]:
                names = ents[i]["names"]
                feats["f_name_jw"][i] = name_similarity(
                    names_col[i], names, jaro_winkler
                )
                feats["f_screen_jw"][i] = name_similarity(
                    screen_col[i].replace("_", " "), names, jaro_winkler
                )
            # text cosine: batched dense user side × sparse abstract side.
            # description+user_text are UID-side: tokenize/scatter once
            # per unique uid, gather per pair (a uid appears once per
            # candidate — up to the 40-pair cap — and its user_text is
            # ~10 KB; per-pair tokenization measured 778 core-s on 27k
            # pairs vs ~20 after the dedup)
            ut_col = (
                df["user_text"] if "user_text" in df.columns else pd.Series([""] * n)
            )
            ucodes, _ = pd.factorize(df["uid"].to_numpy())
            first = np.unique(ucodes, return_index=True)[1]
            desc_col = df["description"].to_numpy()
            ut_np = ut_col.to_numpy()
            texts_u = [
                (str(desc_col[i] or "") + "\n" + str(ut_np[i] or ""))
                for i in first
            ]
            M_u = self._user_tf_matrix(texts_u)
            unorm_u = np.linalg.norm(M_u, axis=1)
            for i in np.nonzero(have)[0]:
                idx, w, anorm = self._abstract_sparse(
                    df["resource_id"].iat[i], ents[i]["abstract"]
                )
                u = ucodes[i]
                if anorm and unorm_u[u]:
                    feats["f_text_cos"][i] = float(
                        (w @ M_u[u, idx]) / (anorm * unorm_u[u])
                    )
        # homepage-alignment features (HomepageAlignmentsScorer.java:
        # 82-115): dictionary probe per pair — missing entity -> all 0
        if n and self.hp:
            sn_low = df["screen_name"].astype(str).str.lower().to_numpy()
            hits = df["resource_id"].map(self.hp)
            for i in np.nonzero(hits.notna().to_numpy())[0]:
                fid, ids = hits.iat[i]
                u = sn_low[i]
                feats["f_hp_id_matches"][i] = 1.0 if fid == u else 0.0
                feats["f_hp_id_exists"][i] = 1.0 if u in ids else 0.0
                feats["f_hp_id_unique"][i] = (
                    1.0 if (len(ids) == 1 and u in ids) else 0.0
                )
        # ISWC17 pairwise products (ISWC17Strategy.java:87-92): one
        # (n × 16) stack, all i<j products via fancy indexing
        F = np.column_stack([feats[c] for c in ISWC17_SCALAR_COLS]) if n else (
            np.zeros((0, len(ISWC17_SCALAR_COLS)))
        )
        ii = np.fromiter((i for i, _ in _PAIR_IDX), dtype=np.int64)
        jj = np.fromiter((j for _, j in _PAIR_IDX), dtype=np.int64)
        P = F[:, ii] * F[:, jj]
        for k, c in enumerate(ISWC17_PAIR_COLS):
            feats[c] = P[:, k]
        # social-graph subspace cosine: user sg vector (joined upstream
        # as ``sg_vec``) · entity context vector; both pre-normalized,
        # missing either side -> 0
        sg = np.zeros(n)
        if n and self.ent_vecs and "sg_vec" in df.columns:
            evs = np.zeros((n, SG_DIM))
            has_e = np.zeros(n, dtype=bool)
            for i, rid in enumerate(df["resource_id"]):
                ev = self.ent_vecs.get(rid)
                if ev is not None:
                    evs[i] = ev
                    has_e[i] = True
            uvs = _vec_matrix(df["sg_vec"], SG_DIM)
            sg = np.where(has_e, np.einsum("ij,ij->i", evs, uvs), 0.0)
        feats["f_sg_cos"] = sg
        # trained-embedding subspace cosine (PAI18Strategy shape): user
        # text vector joined upstream as ``wemb_vec``; entity abstract
        # vector from the broadcast dict; both pre-normalized, missing
        # either side -> 0
        wemb = np.zeros(n)
        if n and self.wemb_vecs and "wemb_vec" in df.columns:
            # dim from the first vector actually fetched — works for
            # both the plain dict and the sharded-refs façade (which
            # has no .values())
            vals = [self.wemb_vecs.get(rid) for rid in df["resource_id"]]
            first = next((v for v in vals if v is not None), None)
            if first is not None:
                wdim = len(first)
                wevs = np.zeros((n, wdim))
                has_we = np.zeros(n, dtype=bool)
                for i, ev in enumerate(vals):
                    if ev is not None:
                        wevs[i] = ev
                        has_we[i] = True
                wuvs = _vec_matrix(df["wemb_vec"], wdim)
                wemb = np.where(
                    has_we, np.einsum("ij,ij->i", wevs, wuvs), 0.0
                )
        feats["f_wemb_cos"] = wemb
        # description overlap (DescriptionScorer.java:30-50): token sets
        # of the profile description vs each rdfs:comment; the reference
        # FeatureExtraction is a unigram extractor — our analogue is the
        # same lowercase whitespace tokenization as the text-cos stage
        desc = np.zeros(n)
        if n:
            desc_toks = [
                frozenset(str(d or "").lower().split())
                for d in df["description"]
            ] if "description" in df.columns else [frozenset()] * n
            for i in range(n):
                e = ents[i]
                comments = (e.get("comments") or []) if e else []
                if not comments:
                    desc[i] = -1.0
                    continue
                dt = desc_toks[i]
                if not dt:
                    continue
                ct = self._comment_tokens(df["resource_id"].iat[i], comments)
                desc[i] = sum(len(c & dt) for c in ct) / (
                    len(dt) * len(comments)
                )
        feats["f_desc_overlap"] = desc
        # one concat, not 138 column inserts (pandas fragmentation)
        return pd.concat(
            [
                df.reset_index(drop=True),
                pd.DataFrame(
                    {c: feats[c] for c in FEATURE_COLS},
                ),
            ],
            axis=1,
        )


def _entities_partial_dict(
    rids: list[str], attrs_json: list[str]
) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for rid, aj in zip(rids, attrs_json):
        res = nm.Resource(rid, json.loads(aj))
        names = res.names
        if not names:
            names = [res.clean_resource_id]
        out[rid] = {
            "names": names,
            "is_person": res.is_person,
            "is_company": res.is_company,
            "is_other": res.is_other,
            "is_dead": res.is_dead,
            "abstract": (res.prop(nm.ATTRIBUTE_ABSTRACT) or [""])[0],
            # DescriptionScorer.COMMENT_PROPERTY (rdfs:comment) — the
            # ABSTRACT_PROPERTY ("") contributes nothing in the
            # reference (getProperty("") is empty), so comments only
            "comments": res.prop(nm.ATTRIBUTE_COMMENT) or [],
        }
    return out


@ray.remote
def _entities_block_shards(num_shards: int, tbl: pa.Table):
    """Parse + hash-split one KB block into ``num_shards`` partial
    attribute dicts (crc32(resource_id) % S routing — the same scheme
    as ``token_shard``)."""
    import zlib

    if tbl.num_rows == 0 or "resource_id" not in tbl.schema.names:
        # 0-row 0-column blocks from a selective upstream filter
        return tuple(_entities_partial_dict([], []) for _ in range(num_shards))
    rids = tbl.column("resource_id").to_pylist()
    attrs = tbl.column("attributes_json").to_pylist()
    buckets: list[tuple[list, list]] = [([], []) for _ in range(num_shards)]
    for rid, aj in zip(rids, attrs):
        b = buckets[zlib.crc32(str(rid).encode("utf-8")) % num_shards]
        b[0].append(rid)
        b[1].append(aj)
    return tuple(_entities_partial_dict(r, a) for r, a in buckets)


@ray.remote
def _merge_dicts(*parts: dict) -> dict:
    out: dict = {}
    for p in parts:
        out.update(p)
    return out


def entities_shard_refs(entities: Dataset, num_shards: int = 16) -> list:
    """KB attribute dicts built and sharded entirely OFF the driver
    (the round-2 verdict's 'unsharded entity broadcast'): per-block
    tasks JSON-parse and hash-split rows (num_returns=S fan-out), one
    merge task per shard unions its partials in the object store. The
    driver holds only S ObjectRefs; feature workers ``cached_get`` the
    shards their batches touch through ``ops.ShardedDictRefs``."""
    num_shards = max(2, num_shards)
    refs = entities.select_columns(
        ["resource_id", "attributes_json"]
    ).to_arrow_refs()
    split = _entities_block_shards.options(num_returns=num_shards)
    parts = [split.remote(num_shards, r) for r in refs]
    return [
        _merge_dicts.remote(*[p[s] for p in parts])
        for s in range(num_shards)
    ]


def entities_broadcast_dict(
    entities_df: pd.DataFrame, num_tasks: int = 16
) -> dict[str, dict]:
    """resource_id -> parsed-attribute dict for the feature stage. The
    per-entity JSON parse fans out over Ray tasks (one driver-serial
    loop over the full KB measured ~5 s at the 50k-entity scale);
    shards merge on the driver (dict union is cheap, parsing is not)."""
    n = len(entities_df)
    if n <= 2048:
        return _entities_partial_dict(
            list(entities_df["resource_id"]), list(entities_df["attributes_json"])
        )
    part = ray.remote(_entities_partial_dict)
    step = (n + num_tasks - 1) // num_tasks
    refs = [
        part.remote(
            list(entities_df["resource_id"].iloc[i : i + step]),
            list(entities_df["attributes_json"].iloc[i : i + step]),
        )
        for i in range(0, n, step)
    ]
    out: dict[str, dict] = {}
    for d in ray.get(refs):
        out.update(d)
    return out


def compute_features(
    candidates: Dataset, accounts: Dataset, user_text: Dataset,
    entities: Dataset | pd.DataFrame, user_sg: Dataset | None = None,
    hp: dict[str, tuple] | None = None, wemb=None,
) -> Dataset:
    """candidates ⋈ accounts ⋈ user_text (⋈ sg vectors) + feature
    columns, ALL co-partitioned by uid through one 3/4-ary
    ``exchange_coapply``: the accounts side — ``user_objects`` in the
    reference, i.e. every profile ever seen, NOT dimension-sized —
    flows through the exchange like user_text instead of a driver
    ``to_pandas`` broadcast. Only the idf vocab / entity context
    vectors are whole-object broadcasts; the entity attribute dict is
    hash-sharded ObjectRefs (``entities_shard_refs``) when ``entities``
    is a Dataset, so no single object — driver- or store-side — holds
    the whole KB. A pandas frame still works (single-shard path) for
    the profiling tool / ad-hoc callers. The per-pair user_text
    duplication (10 KB x 2M pairs ~ 20 GB at the 1M-page scale) lives
    only transiently inside each reduce task; the emitted feature
    table keeps only the slim columns."""
    acc_slim = accounts.select_columns(
        ["uid", "screen_name", "name", "description", "verified",
         "followers_count", "friends_count", "listed_count", "statuses_count",
         "last_status_ts"]
    )
    from concurrent.futures import Future, ThreadPoolExecutor

    # ``wemb`` may arrive as a still-training Future (run_flagship hands
    # the training thread's future straight in so this stage's setup
    # waves — idf, entity shards, candidate materialization, context
    # vectors — overlap the tail of the embedding training instead of
    # serializing behind it); it is resolved at the last point a model
    # is actually needed
    wemb_future = wemb if isinstance(wemb, Future) else None

    ut_mat = user_text.materialize()

    # the idf build, the entity-shard build, the entity wemb projection
    # and candidate materialization are INDEPENDENT distributed waves —
    # overlap them on driver threads (same rationale as the index
    # builds in run_flagship); only entity_context_vectors chains on
    # the materialized candidates
    def _ent_shards():
        if isinstance(entities, pd.DataFrame):
            return ops.ShardedDictRefs(
                [ray.put(entities_broadcast_dict(entities))]
            )
        return ops.ShardedDictRefs(entities_shard_refs(entities))

    def _wemb_ent():
        if wemb is None:
            return {}
        from .wordemb import wemb_entity_vector_refs, wemb_entity_vectors_df

        # pandas KB (oracle/ad-hoc): small, a plain dict is right;
        # Dataset KB: sharded-broadcast refs, no whole-KB object
        return (
            wemb_entity_vectors_df(entities, wemb)
            if isinstance(entities, pd.DataFrame)
            else wemb_entity_vector_refs(entities, wemb)
        )

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_idf = pool.submit(build_idf, ut_mat)
        f_ents = pool.submit(_ent_shards)
        cands_mat = candidates.materialize()
        evec = (
            entity_context_vector_refs(cands_mat)
            if user_sg is not None
            else {}
        )
        if wemb_future is not None:
            wemb = wemb_future.result()
        f_we = pool.submit(_wemb_ent)
        idf = f_idf.result()
        ents = f_ents.result()
        wemb_ent = f_we.result()
    idf_ref = ray.put(idf)
    evec_ref = ray.put(evec)
    hp_ref = ray.put(hp or {})
    wemb_ref = ray.put(wemb_ent)

    keep_cols = [
        "resource_id", "uid", "index_freq", "order", "screen_name", "name",
        # raw count rides along for the MostFollowers baseline: its log
        # feature (f_followers) collapses 0 and 1 followers to 0.0, so
        # the baseline's argmax needs the untransformed column
        "followers_count",
        *FEATURE_COLS,
    ]

    def featurize(cdf: pd.DataFrame, utdf: pd.DataFrame, adf: pd.DataFrame,
                  *rest: pd.DataFrame) -> pd.DataFrame:
        df = cdf.merge(adf, on="uid")
        df = df.merge(utdf[["uid", "user_text"]], on="uid", how="left")
        # optional uid-keyed vector sides (sg_vec, wemb_vec, ...) merge
        # by whatever non-key columns they carry
        for side in rest:
            cols = [c for c in side.columns if c != "uid"]
            df = df.merge(side[["uid", *cols]], on="uid", how="left")
        df["user_text"] = df["user_text"].fillna("")
        out = FeatureStage(
            ents, ops.cached_get(idf_ref),
            ops.cached_get(evec_ref), ops.cached_get(hp_ref),
            ops.cached_get(wemb_ref),
        )(df)
        return out[keep_cols]

    sides = [cands_mat, ut_mat, acc_slim]
    if user_sg is not None:
        sides.append(sg_user_vectors(user_sg))
    if wemb is not None:
        from .wordemb import wemb_uid_vectors

        sides.append(wemb_uid_vectors(ut_mat, wemb))
    return ops.exchange_coapply(sides, ["uid"], featurize)


# --------------------------------------------------------------------------
# stage 5: scorer (logistic; ModelEndpoint analogue) + selection
# --------------------------------------------------------------------------


@ray.remote
def _irls_partial(chunk, wb):
    """One IRLS iteration's (gradient, Hessian) partial over a row
    chunk — the data-parallel inner step of train_scorer."""
    Xb, y, sample_w = chunk
    z = np.clip(Xb @ wb, -35.0, 35.0)
    p = 1.0 / (1.0 + np.exp(-z))
    g = Xb.T @ ((p - y) * sample_w)
    r = np.maximum(p * (1.0 - p), 1e-9) * sample_w
    H = (Xb * r[:, None]).T @ Xb
    return g, H


def train_scorer(
    features_df: pd.DataFrame, gold_df: pd.DataFrame, max_iter: int = 25,
    seed: int = 7, distribute_threshold: int = 20_000,
) -> dict:
    """Offline logistic-regression training on the candidate table vs
    gold labels (numpy IRLS/Newton — the small feature count keeps the
    Hessian tiny, so each of <= ``max_iter`` Newton iterations is one
    pass over the rows; this REPLACED an 800-epoch full-batch-GD
    optimizer, so historical callers passing ``epochs``/``lr`` should
    note the optimizer — and the learned weights for identical inputs
    — changed at that point. Replaces align-train/train.py's TF MLP per
    the north star's LR/SVM requirement). Standard-scales features
    first (utils/common.py:36-64 Scaler semantics: sigma=0 -> 1)."""
    gold_map = dict(zip(gold_df["resource_id"], gold_df["uid"]))
    # ALL candidate pairs train: entities absent from gold have no true
    # account, so their candidates are pure negatives — exactly the
    # name-twin hard cases (same display name, different entity) that
    # force weight onto the text/context features
    labeled = features_df.copy()
    y = (
        labeled["uid"]
        == labeled["resource_id"].map(gold_map).fillna(-1).astype("int64")
    ).to_numpy(dtype=np.float64)
    X = labeled[FEATURE_COLS].to_numpy(dtype=np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std[std == 0] = 1.0
    Xs = (X - mean) / std
    n, d = Xs.shape
    # class weighting: negatives dominate ~40:1
    pos_w = max(1.0, (len(y) - y.sum()) / max(y.sum(), 1.0))
    sample_w = np.where(y == 1.0, pos_w, 1.0)
    Xb = np.concatenate([Xs, np.ones((n, 1))], axis=1)
    wb = np.zeros(d + 1)
    ridge = 1e-8 * n
    # Each Newton iteration is one (g, H) accumulation over the rows —
    # n x (d+1)^2 flops. With the 138-feature ISWC17 product set and a
    # web-scale candidate table this is the pipeline's only driver-side
    # O(n) loop (and BLAS here is pinned to one thread), so large
    # inputs compute the per-iteration sums as Ray tasks over FIXED row
    # chunks shipped to the object store once; partials are summed in
    # chunk order, so the result is deterministic for a given input
    # (bitwise it differs from the single-dot local path only in float
    # summation order — the weights dict is handed to scorer and oracle
    # alike, so triple-level exactness is unaffected).
    chunks = None
    if n >= distribute_threshold and ray.is_initialized():
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        # one chunk per CPU saturates the per-iteration wave; floor each
        # chunk at ~2k rows so task latency stays amortized at small n
        n_chunks = min(64, max(8, ncpu), max(1, n // 2_000))
        bounds = np.linspace(0, n, n_chunks + 1).astype(np.int64)
        chunks = [
            ray.put(
                (
                    Xb[s:e],
                    y[s:e],
                    sample_w[s:e],
                )
            )
            for s, e in zip(bounds[:-1], bounds[1:])
            if e > s
        ]
    for _ in range(max_iter):
        if chunks is not None:
            parts = ray.get(
                [_irls_partial.remote(c, wb) for c in chunks]
            )
            g = sum(p[0] for p in parts)
            H = sum(p[1] for p in parts)
        else:
            z = np.clip(Xb @ wb, -35.0, 35.0)
            p = 1.0 / (1.0 + np.exp(-z))
            g = Xb.T @ ((p - y) * sample_w)
            r = np.maximum(p * (1.0 - p), 1e-9) * sample_w
            H = (Xb * r[:, None]).T @ Xb
        H[np.diag_indices_from(H)] += ridge
        step = np.linalg.solve(H, g)
        wb -= step
        if float(np.abs(step).max()) < 1e-8:
            break
    w, b = wb[:d], float(wb[d])
    return {
        "cols": FEATURE_COLS,
        "mean": mean.tolist(),
        "std": std.tolist(),
        "w": w.tolist(),
        "b": float(b),
    }


def train_scorer_kfold(
    features_df: pd.DataFrame, gold_df: pd.DataFrame, k: int = 5,
    max_iter: int = 25, seed: int = 7,
) -> dict:
    """k-fold model ensemble — the reference's actual serving shape:
    one model per fold (align-train/train.py:138-159, each fold job
    trains and saves its own model + scaler) and prediction averages
    the per-fold scores, every fold applying ITS OWN scaler
    (align-train/api.py:33-38: ``scores += model.predict(...); scores
    /= len(models)``). Fold assignment hashes resource_id (crc32 % k,
    the same entity-level split as the ``fold_counts`` query) so an
    entity's candidate list never straddles folds; fold f's model
    trains on all rows OUTSIDE fold f."""
    import zlib

    fold = np.fromiter(
        (
            zlib.crc32(str(r).encode("utf-8")) % k
            for r in features_df["resource_id"]
        ),
        dtype=np.int64,
        count=len(features_df),
    )
    models = [
        train_scorer(
            features_df[fold != f], gold_df, max_iter=max_iter, seed=seed
        )
        for f in range(k)
    ]
    return {"cols": FEATURE_COLS, "k": k, "folds": models}


@ray.remote(num_returns=2)
def _prep_train_block(tbl: pa.Table, gold_map: dict, cols: list[str],
                      kfold: int | None, fold: int | None):
    """Label one materialized feature block in place: returns
    ``(stats, payload)`` where stats = (n, sum(X), sum(X^2), n_pos)
    feeds the distributed scaler fit and payload = (X_raw, y) STAYS in
    the object store (num_returns=2 — the driver only ever ray.gets the
    stats half). Fold exclusion (crc32(resource_id) % k != fold, the
    entity-level split of train_scorer_kfold) is applied here so fold
    models never see their own fold's rows."""
    import zlib

    rid = tbl.column("resource_id").to_pandas()
    if kfold:
        keep = np.fromiter(
            (zlib.crc32(str(r).encode("utf-8")) % kfold != fold for r in rid),
            dtype=bool, count=len(rid),
        )
        tbl = tbl.filter(pa.array(keep))
        rid = rid[keep].reset_index(drop=True)
    n = tbl.num_rows
    d = len(cols)
    if n == 0:
        X = np.empty((0, d), dtype=np.float64)
        y = np.empty(0, dtype=np.float64)
    else:
        X = np.column_stack(
            [tbl.column(c).to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64, copy=False)
        uid = tbl.column("uid").to_numpy(zero_copy_only=False)
        y = (
            uid == rid.map(gold_map).fillna(-1).astype("int64").to_numpy()
        ).astype(np.float64)
    stats = (n, X.sum(axis=0), (X * X).sum(axis=0), float(y.sum()))
    return stats, (X, y)


@ray.remote
def _scale_train_block(payload, mean, std, pos_w):
    """One-time per-block standardization + bias column + class weights
    — emits the exact (Xb, y, sample_w) chunk shape _irls_partial eats,
    so the Newton loop below is byte-for-byte the same math as
    train_scorer's distributed branch."""
    X, y = payload
    Xs = (X - mean) / std
    Xb = np.concatenate([Xs, np.ones((len(y), 1))], axis=1)
    sw = np.where(y == 1.0, pos_w, 1.0)
    return Xb, y, sw


def train_scorer_blocks(
    feats: Dataset, gold_df: pd.DataFrame, max_iter: int = 25,
    kfold: int | None = None,
) -> dict:
    """train_scorer / train_scorer_kfold over a MATERIALIZED feature
    Dataset without ever concatenating X on the driver (the round-2
    verdict's "driver training frame" scale-killer): the blocks are
    already in the object store, so labeling + scaler partials + the
    standardized IRLS chunks are all Ray tasks over those refs, and the
    driver holds only (d+1)-sized aggregates — mean/std via a
    distributed A14 partial+final (align-train/utils/common.py:67-100
    semantics, sigma=0 -> 1), then the same per-iteration (g, H)
    Gram partials as train_scorer's data-parallel branch. Weights agree
    with the driver-frame path to float-summation tolerance
    (test_train_scorer_blocks_matches_local)."""
    refs = feats.to_arrow_refs()
    gold_ref = ray.put(dict(zip(gold_df["resource_id"], gold_df["uid"])))
    d = len(FEATURE_COLS)
    models = []
    for f in (range(kfold) if kfold else [None]):
        out = [
            _prep_train_block.remote(r, gold_ref, FEATURE_COLS, kfold, f)
            for r in refs
        ]
        stats = ray.get([o[0] for o in out])
        payloads = [o[1] for o in out]
        n = sum(s[0] for s in stats)
        if n == 0:
            raise ValueError("train_scorer_blocks: empty feature table")
        ssum = sum(s[1] for s in stats)
        ssq = sum(s[2] for s in stats)
        npos = sum(s[3] for s in stats)
        mean = ssum / n
        # E[x^2]-E[x]^2 can dip epsilon-negative for constant columns
        std = np.sqrt(np.maximum(ssq / n - mean * mean, 0.0))
        std[std == 0] = 1.0
        pos_w = max(1.0, (n - npos) / max(npos, 1.0))
        chunks = [
            _scale_train_block.remote(p, mean, std, pos_w) for p in payloads
        ]
        # raw-X refs must free as soon as the scale wave drains, or the
        # store holds raw AND standardized copies through the whole
        # Newton loop — `out` aliases the same payload refs, so deleting
        # only `payloads` would pin them anyway
        del payloads, out
        wb = np.zeros(d + 1)
        ridge = 1e-8 * n
        for _ in range(max_iter):
            parts = ray.get([_irls_partial.remote(c, wb) for c in chunks])
            g = sum(p[0] for p in parts)
            H = sum(p[1] for p in parts)
            H[np.diag_indices_from(H)] += ridge
            step = np.linalg.solve(H, g)
            wb -= step
            if float(np.abs(step).max()) < 1e-8:
                break
        models.append({
            "cols": FEATURE_COLS,
            "mean": mean.tolist(),
            "std": std.tolist(),
            "w": wb[:d].tolist(),
            "b": float(wb[d]),
        })
    if kfold:
        return {"cols": FEATURE_COLS, "k": kfold, "folds": models}
    return models[0]


@ray.remote(num_returns=2)
def _prep_listwise_block(tbl: pa.Table, gold_map: dict, cols: list[str]):
    """Label + segment one resource_id-grouped feature block: rows are
    sorted (resource_id, uid) so each entity's candidate list is a
    contiguous SEGMENT; seg ids are block-local. Returns ``(stats,
    payload)`` exactly like ``_prep_train_block`` (stats half feeds the
    distributed scaler, payload (X_raw, y, seg) stays in the store)."""
    import pandas as _pd

    n = tbl.num_rows
    d = len(cols)
    if n == 0:
        stats = (0, np.zeros(d), np.zeros(d), 0.0)
        return stats, (np.empty((0, d)), np.empty(0), np.empty(0, np.int64))
    df = _pd.DataFrame(
        {
            "resource_id": tbl.column("resource_id").to_numpy(
                zero_copy_only=False
            ),
            "uid": tbl.column("uid").to_numpy(zero_copy_only=False),
        }
    )
    order = np.lexsort((df["uid"].to_numpy(), df["resource_id"].to_numpy()))
    tbl = tbl.take(pa.array(order))
    rid = df["resource_id"].to_numpy()[order]
    uid = df["uid"].to_numpy()[order]
    X = np.column_stack(
        [tbl.column(c).to_numpy(zero_copy_only=False) for c in cols]
    ).astype(np.float64, copy=False)
    gold = _pd.Series(rid).map(gold_map).fillna(-1).astype("int64").to_numpy()
    y = (uid == gold).astype(np.float64)
    # block-local segment ids from the sorted resource_id run-lengths
    seg = np.concatenate([[0], np.cumsum(rid[1:] != rid[:-1])]).astype(
        np.int64
    )
    stats = (n, X.sum(axis=0), (X * X).sum(axis=0), float(y.sum()))
    return stats, (X, y, seg)


@ray.remote
def _scale_listwise_block(payload, mean, std):
    X, y, seg = payload
    Xs = (X - mean) / std
    Xb = np.concatenate([Xs, np.ones((len(y), 1))], axis=1)
    return Xb, y, seg


@ray.remote
def _listwise_partial(chunk, wb):
    """One Newton iteration's (gradient, Hessian) partial of the
    conditional-logistic (softmax-over-candidates) loss over a block of
    COMPLETE entity segments. Each entity e contributes a virtual
    'none' option with fixed score 0 and zero features, so entities
    whose gold account is absent train the model to score every
    candidate below the null — the calibration select_alignments'
    min_score threshold needs. g = Σ (p-y)x; H = Xᵀdiag(p)X − UᵀU with
    U the per-entity Σ p_i x_i (PSD; ridge added by the driver)."""
    Xb, y, seg = chunk
    if len(y) == 0:
        return np.zeros(len(wb)), np.zeros((len(wb), len(wb)))
    z = np.clip(Xb @ wb, -35.0, 35.0)
    ez = np.exp(z)
    nseg = int(seg[-1]) + 1
    denom = np.ones(nseg)  # the null option's exp(0)
    np.add.at(denom, seg, ez)
    p = ez / denom[seg]
    g = Xb.T @ (p - y)
    Xp = Xb * p[:, None]
    U = np.zeros((nseg, Xb.shape[1]))
    np.add.at(U, seg, Xp)
    H = Xp.T @ Xb - U.T @ U
    return g, H


def train_scorer_listwise(
    feats: Dataset, gold_df: pd.DataFrame, max_iter: int = 50,
) -> dict:
    """Listwise/joint scorer (round-3 verdict item 8; reference
    analogue: align-train/train_joint.py trains a second, joint model
    over whole candidate lists — here re-expressed as the convex
    per-entity softmax-over-candidates objective instead of the TF
    MLP, matching the repo's LR-family scorer discipline): P(candidate
    i | entity) = exp(s_i) / (1 + Σ_j exp(s_j)) with s = w·x̃ + b and
    the 1 a virtual null option (entities without a gold account
    target the null). Fully distributed with the block-refs machinery:
    one resource_id-keyed exchange co-locates each entity's candidate
    list, then scaler partials and per-iteration Newton (g, H)
    partials run over the materialized block refs — the driver holds
    only (d+1)-sized aggregates."""
    grouped = ops.exchange_coapply(
        [feats], ["resource_id"], lambda df: df
    ).materialize()
    refs = grouped.to_arrow_refs()
    gold_ref = ray.put(dict(zip(gold_df["resource_id"], gold_df["uid"])))
    d = len(FEATURE_COLS)
    out = [
        _prep_listwise_block.remote(r, gold_ref, FEATURE_COLS) for r in refs
    ]
    stats = ray.get([o[0] for o in out])
    payloads = [o[1] for o in out]
    n = sum(s[0] for s in stats)
    if n == 0:
        raise ValueError("train_scorer_listwise: empty feature table")
    mean = sum(s[1] for s in stats) / n
    std = np.sqrt(
        np.maximum(sum(s[2] for s in stats) / n - mean * mean, 0.0)
    )
    std[std == 0] = 1.0
    chunks = [
        _scale_listwise_block.remote(p, mean, std) for p in payloads
    ]
    del payloads, out
    wb = np.zeros(d + 1)
    ridge = 1e-8 * n
    for _ in range(max_iter):
        parts = ray.get([_listwise_partial.remote(c, wb) for c in chunks])
        g = sum(p[0] for p in parts)
        H = sum(p[1] for p in parts)
        H[np.diag_indices_from(H)] += ridge
        step = np.linalg.solve(H, g)
        wb -= step
        if float(np.abs(step).max()) < 1e-8:
            break
    return {
        "kind": "listwise",
        "cols": FEATURE_COLS,
        "mean": mean.tolist(),
        "std": std.tolist(),
        "w": wb[:d].tolist(),
        "b": float(wb[d]),
    }


def listwise_score_frame(df: pd.DataFrame, weights: dict) -> np.ndarray:
    """Softmax-over-candidates probabilities for a frame holding
    COMPLETE entity candidate lists (the shared kernel of the engine
    scorer stage and tests): p_i = exp(s_i) / (1 + Σ_j∈entity exp(s_j))."""
    X = df[weights["cols"]].to_numpy(dtype=np.float64)
    z = (
        (X - np.array(weights["mean"])) / np.array(weights["std"])
    ) @ np.array(weights["w"]) + weights["b"]
    z = np.clip(z, -35.0, 35.0)
    ez = np.exp(z)
    rid = df["resource_id"].to_numpy()
    order = np.argsort(rid, kind="mergesort")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    rs = rid[order]
    seg = (
        np.concatenate([[0], np.cumsum(rs[1:] != rs[:-1])]).astype(np.int64)
        if len(rs)
        else np.empty(0, np.int64)
    )
    denom = np.ones(int(seg[-1]) + 1 if len(seg) else 0)
    np.add.at(denom, seg, ez[order])
    return (ez[order] / denom[seg])[inv]


def score_candidates_listwise(features: Dataset, weights: dict) -> Dataset:
    """Listwise scorer stage: one resource_id-keyed exchange co-locates
    each entity's list, softmax probability (vs the virtual null)
    becomes ``score`` — select_alignments' threshold semantics apply
    unchanged (p > 0.5 means 'more likely than null + all rivals')."""
    wref = ray.put(weights)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ops.cached_get(wref)
        df = df.copy()
        df["score"] = (
            listwise_score_frame(df, m) if len(df) else np.empty(0)
        )
        return df

    return ops.exchange_coapply([features], ["resource_id"], score)


def score_matrix(X: np.ndarray, weights: dict) -> np.ndarray:
    """Scores for a raw feature matrix under a single model dict
    ({mean,std,w,b}), a fold ensemble ({folds:[...]}), or an MLP
    bundle (kind="mlp", single or fold ensemble — softmax P(class=1)
    averaged across folds per api.py:33-38) — the shared kernel of the
    engine scorer stage and the single-process oracle."""
    if weights.get("kind") == "mlp":
        from .mlp import mlp_score_matrix

        return mlp_score_matrix(X, weights)
    if "folds" in weights:
        s = np.zeros(len(X))
        for m in weights["folds"]:
            z = ((X - np.array(m["mean"])) / np.array(m["std"])) @ np.array(
                m["w"]
            ) + m["b"]
            s += 1.0 / (1.0 + np.exp(-z))
        return s / len(weights["folds"])
    z = ((X - np.array(weights["mean"])) / np.array(weights["std"])) @ np.array(
        weights["w"]
    ) + weights["b"]
    return 1.0 / (1.0 + np.exp(-z))


def score_candidates(features: Dataset, weights: dict) -> Dataset:
    """Broadcast-weights scorer stage (the in-process replacement for
    the HTTP ModelEndpoint, persistence/ModelEndpoint.java:46-80;
    fold-ensemble weights reproduce api.py's averaged /predict)."""
    wref = ray.put(weights)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ops.cached_get(wref)
        X = df[m["cols"]].to_numpy(dtype=np.float64)
        df = df.copy()
        df["score"] = score_matrix(X, m)
        return df

    return features.map_batches(score, batch_format="pandas", batch_size=8192)


def select_alignments(
    scored: Dataset, max_imp: float = 0.0, min_score: float = 0.5,
) -> Dataset:
    """Per-entity selection implementing getPrediction
    (PrepareTrainingSet.java:904-926): among positives (score>=0.5) the
    best candidate is the alignment iff (best - second) > max_imp and
    best > min_score. Adds rank (1-based, score desc / uid asc) and
    is_alignment."""

    def select(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        # fully vectorized: rows sorted by (entity, score desc, uid asc)
        # mean positives form a PREFIX of each group, so "second-best
        # positive" is just the group's 2nd row when it clears 0.5
        df = df.sort_values(
            [keys[0], "score", "uid"], ascending=[True, False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        g = df.groupby(keys[0], sort=False)
        df["rank"] = g.cumcount() + 1
        nxt = df["score"].shift(-1)
        is_last = df[keys[0]].shift(-1) != df[keys[0]]
        second = nxt.where((df["rank"] == 1) & ~is_last, -1.0)
        second = second.where(second >= 0.5, -1.0)
        df["is_alignment"] = (
            (df["rank"] == 1)
            & (df["score"] >= 0.5)
            & ((df["score"] - second) > max_imp)
            & (df["score"] > min_score)
        )
        return df

    return ops.bucketed_group_apply(scored, ["resource_id"], select)


# --------------------------------------------------------------------------
# stage 6: triples (RDFExporter emission rules)
# --------------------------------------------------------------------------

FOAF_ACCOUNT = "http://xmlns.com/foaf/0.1/account"
FOAF_ACCOUNT_NAME = "http://xmlns.com/foaf/0.1/accountName"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
DCT_IDENTIFIER = "http://purl.org/dc/terms/identifier"
SL_NS = "http://sociallink.futuro.media/ontology#"
SL_CANDIDATE = SL_NS + "candidate"
SL_RANK = SL_NS + "rank"
SL_CONFIDENCE = SL_NS + "confidence"
SL_ACCOUNT = SL_NS + "account"
ACCOUNT_IRI_PREFIX = "http://social.example/"


def stable_bnode(entity: str, uid: int) -> str:
    """Deterministic blank-node id (Python ``hash`` is per-process
    randomized — never use it for emitted identifiers)."""
    import zlib

    return f"_:c{zlib.crc32(f'{entity}|{uid}'.encode('utf-8')):x}"


def triples_from_selection(selected: Dataset) -> Dataset:
    """Candidate rows -> (subj, pred, obj, conf, rank) triples per the
    reference emission loop (RDFExporter.java:161-197): foaf:account iff
    is_alignment; owl:sameAs; sl:candidate blank node with
    rank/confidence/account; dcterms:identifier + foaf:accountName on the
    account IRI. Blank-node ids are deterministic. Output globally
    sorted (subj ASC, conf DESC) like the reference's export ORDER BY."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: each of the 8 emission rules is one column-stack
        block over the whole batch (string columns built with pandas
        ``.str`` ops / single-pass formatters), concatenated — no
        per-row Python append loops."""
        n = len(df)
        entity = df["resource_id"].astype(str).to_numpy(dtype=object)
        screen = df["screen_name"].astype(str).to_numpy(dtype=object)
        account = np.asarray(
            [ACCOUNT_IRI_PREFIX + s.replace(" ", "+") for s in screen],
            dtype=object,
        )
        uid_arr = df["uid"].to_numpy(dtype=np.int64)
        bnode = np.asarray(
            [stable_bnode(e, int(u)) for e, u in zip(entity, uid_arr)],
            dtype=object,
        )
        conf = df["score"].to_numpy(dtype=np.float64)
        rank = df["rank"].to_numpy(dtype=np.int64)
        rank_str = rank.astype(str).astype(object)
        conf_str = np.asarray([f"{c:.6f}" for c in conf], dtype=object)
        uid_str = uid_arr.astype(str).astype(object)

        def const(p: str) -> np.ndarray:
            return np.full(n, p, dtype=object)

        blocks = [
            (entity, const(OWL_SAMEAS), entity),
            (entity, const(SL_CANDIDATE), bnode),
            (bnode, const(SL_RANK), rank_str),
            (bnode, const(SL_CONFIDENCE), conf_str),
            (bnode, const(SL_ACCOUNT), account),
            (account, const(DCT_IDENTIFIER), uid_str),
            (account, const(FOAF_ACCOUNT_NAME), screen),
        ]
        sel = df["is_alignment"].to_numpy(dtype=bool)
        subj = [entity[sel]] + [b[0] for b in blocks]
        pred = [const(FOAF_ACCOUNT)[sel]] + [b[1] for b in blocks]
        obj = [account[sel]] + [b[2] for b in blocks]
        confs = [conf[sel]] + [conf] * len(blocks)
        ranks = [rank[sel]] + [rank] * len(blocks)
        return pd.DataFrame(
            {
                "subj": np.concatenate(subj),
                "pred": np.concatenate(pred),
                "obj": np.concatenate(obj),
                "conf": np.concatenate(confs),
                "rank": np.concatenate(ranks),
            }
        )

    triples = selected.map_batches(emit, batch_format="pandas")
    return triples.sort(["subj", "conf"], descending=[False, True])


# --------------------------------------------------------------------------
# end-to-end
# --------------------------------------------------------------------------


def features_frame(feats: Dataset, cols: list[str]) -> pd.DataFrame:
    """Driver frame of the (small) labeled-candidate training columns —
    fetch the already-materialized blocks as Arrow refs and concat the
    selected columns directly. ``select_columns().to_pandas()`` spins a
    whole projection wave through the streaming executor for the same
    bytes (measured 5-25x slower on the 27k-row sf1.0 table). Size is
    bounded by |entities| x the per-entity candidate cap, not corpus
    bytes, so a driver frame is safe here."""
    tbls = ray.get(feats.to_arrow_refs())
    parts = [t.select(cols) for t in tbls if t.num_rows]
    if not parts:
        return pd.DataFrame(columns=cols)
    return pa.concat_tables(parts).to_pandas()


def run_flagship(
    corpus_dir: str,
    weights: dict | None = None,
    near_dedup: bool = True,
    max_imp: float = 0.0,
    min_score: float = 0.5,
    kfold: int | None = None,
    drop_broadcast_threshold: int = DROP_BROADCAST_THRESHOLD,
    dropset_info: dict | None = None,
    scorer: str = "pairwise",
):
    """Run pages -> triples over a fixture corpus directory. Returns
    (triples Dataset, selected Dataset, weights).

    ``scorer="listwise"`` trains/serves the softmax-over-candidates
    joint model (train_joint.py analogue) instead of the pairwise LR;
    provided weight bundles dispatch on their ``kind`` field.

    ``drop_broadcast_threshold`` governs BOTH drop sets (latest-wins
    stale fetches and near-dup losers): below it they are driver
    arrays fused into downstream splits (cheapest at fixture scale);
    at/above it neither set ever lands on the driver — stale keys and
    dedup drops apply as exchange-side anti-joins and cluster
    resolution runs the distributed connected_components. Forcing the
    threshold to 0 exercises the 100 TB path on any corpus (the
    equivalence test does exactly that). ``dropset_info``, when a dict
    is passed, is filled with per-set mode/count/bytes for the run
    manifest."""
    info = dropset_info if dropset_info is not None else {}
    stale = latest_wins_stale_keys(corpus_dir).materialize()
    n_stale = stale.count()
    pages = rd.read_parquet(
        f"{corpus_dir}/pages", columns=["page_id", "html", "lang"],
    )
    # materialize ONCE, before dedup: the dedup band exchange and the
    # three index builders all read these blocks zero-copy. The near-dup
    # DROP SET is then broadcast and fused into each build's exchange
    # split as a filter — the deduped corpus never exists as a second
    # materialized copy (it has no consumer other than the builds).
    if n_stale < drop_broadcast_threshold:
        drop_ids = np.sort(stale.to_pandas()["page_id"].to_numpy(np.int64))
        info["latest_wins"] = {
            "mode": "broadcast", "n_drop": int(n_stale),
            "drop_bytes": int(drop_ids.nbytes),
        }
        parsed = parse_pages(pages, drop_ids=drop_ids).materialize()
    else:
        # scale path: the stale set stays distributed; parse filters
        # only by language and the anti-join co-partitions parsed rows
        # (html already reduced to text) against the stale keys
        info["latest_wins"] = {
            "mode": "exchange", "n_drop": int(n_stale),
            "drop_bytes": int(stale.size_bytes() or 0),
        }
        parsed = ops.exchange_id_anti_join(
            parse_pages(pages, drop_ids=None), stale, "page_id"
        ).materialize()
    drop_ref = None
    if near_dedup:
        dup_drop, dup_drop_ds, info["near_dedup"] = near_dedup_drops(
            parsed, broadcast_threshold=drop_broadcast_threshold
        )
        if dup_drop is not None:
            drop_ref = ray.put(dup_drop)
        elif dup_drop_ds is not None:
            parsed = ops.exchange_id_anti_join(
                parsed, dup_drop_ds, "page_id"
            ).materialize()

    from concurrent.futures import ThreadPoolExecutor

    from .graph import build_user_sg

    # The four index builds are INDEPENDENT exchanges over `parsed` /
    # the snapshots table, and every exchange is a driver-blocking
    # shuffle barrier — run them on driver threads so their map/reduce
    # waves interleave and the cluster stays saturated across each
    # stage's straggler tail (Ray task submission is thread-safe; this
    # is where serial stage chaining costs the most at high CPU counts).
    # trained-embedding subspace: factorize the user_text co-occurrence
    # matrix into term vectors (PAI18 shape). The model rides inside
    # the weights bundle so scoring-only runs (weights provided) reuse
    # the exact vectors the scorer was trained against. Training only
    # needs user_text, so it CHAINS after that build on its own driver
    # thread — its vocab/pair exchanges overlap the name-index / sg /
    # accounts exchanges, and the still-pending FUTURE is handed to
    # compute_features so that stage's setup waves overlap the training
    # tail too (the model is only needed at the featurize exchange).
    # create the lazy datasets on THIS thread: Ray's read_parquet path
    # resolution is not thread-safe (concurrent pa.fs.FileSystem.from_uri
    # can spuriously take the fsspec-HTTP fallback), so only the compute
    # goes to the pool
    acc_raw = rd.read_parquet(f"{corpus_dir}/account_snapshots.parquet")
    ent_raw = rd.read_parquet(
        f"{corpus_dir}/kb_entities.parquet", override_num_blocks=32
    )
    with ThreadPoolExecutor(max_workers=6) as pool:
        f_ni = pool.submit(build_name_index, parsed, drop_ref)
        f_ut = pool.submit(build_user_text, parsed, drop_ref)

        def _wemb_chain():
            if weights is not None:
                return weights.get("wemb")
            from .wordemb import train_word_embeddings

            return train_word_embeddings(f_ut.result(), text_col="user_text")

        f_wemb = pool.submit(_wemb_chain)
        f_sg = pool.submit(build_user_sg, parsed, drop_ref=drop_ref)
        f_acc = pool.submit(latest_accounts, acc_raw)
        # materialized once: consumed by BOTH the candidate lookup and
        # the off-driver entity-shard build — the KB never lands on the
        # driver
        f_ent = pool.submit(ent_raw.materialize)
        name_index = f_ni.result()
        entities = f_ent.result()
        # candidate acquisition needs only (entities, name_index) — run
        # it on THIS thread while the wemb vocab/pair exchanges and the
        # sg reduce still occupy their own pool threads, instead of
        # serializing behind them
        cands = acquire_candidates(entities, name_index)
        user_text = f_ut.result()
        user_sg = f_sg.result()
        accounts = f_acc.result()

        feats = compute_features(
            cands, accounts, user_text, entities, user_sg,
            hp=load_homepage_alignments(corpus_dir), wemb=f_wemb,
        )
    wemb = f_wemb.result()

    if weights is None:
        gold = pq.read_table(f"{corpus_dir}/gold.parquet").to_pandas()
        feats = feats.materialize()
        if scorer == "listwise":
            if kfold:
                raise ValueError(
                    "kfold is not supported with scorer='listwise' "
                    "(the joint softmax model trains once over all "
                    "entities); drop --kfold or use pairwise/mlp"
                )
            weights = train_scorer_listwise(feats, gold)
        elif scorer == "mlp":
            # the reference's production scorer family (5x256-tanh MLP
            # ensemble, simple.py + api.py) — served through the same
            # broadcast score_candidates stage via score_matrix dispatch
            from .mlp import train_scorer_mlp

            weights = train_scorer_mlp(feats, gold, kfold=kfold)
        else:
            weights = train_scorer_blocks(feats, gold, kfold=kfold)
        weights["wemb"] = wemb

    scored = (
        score_candidates_listwise(feats, weights)
        if weights.get("kind") == "listwise"
        else score_candidates(feats, weights)
    )
    selected = select_alignments(scored, max_imp=max_imp, min_score=min_score)
    selected = selected.materialize()
    triples = triples_from_selection(selected)
    return triples, selected, weights


def run_flagship_checkpointed(
    corpus_dir: str,
    work_dir: str,
    weights: dict | None = None,
    near_dedup: bool = True,
    max_imp: float = 0.0,
    min_score: float = 0.5,
    kfold: int | None = None,
    drop_broadcast_threshold: int = DROP_BROADCAST_THRESHOLD,
    return_stages: bool = False,
    scorer: str = "pairwise",
):
    """Flagship with per-stage checkpoints under ``work_dir`` — the
    resume story of the north rule (replacing the reference's
    resolved-chunk index scan + alignments.version state machine,
    ProcessDataset.java:109-162 / ScoreEntities.java:92-156). A killed
    run re-executes only the stages whose fingerprinted manifest is
    missing/invalid; a config change (thresholds, dedup flag)
    invalidates exactly the stages downstream of it. Drop-set
    mode/count/bytes are recorded in ``work_dir/dropset.json``."""
    import json as _json
    import os

    from ..state.manifest import checkpoint_stage, fingerprint

    # v2: latest-wins moved BEFORE the language/empty-text filter;
    # v3: ISWC17 pairwise products + sg subspace changed the feature
    # table schema; v4: homepage-alignment + description-overlap
    # features; v5: sharded entities; v6: trained word-embedding
    # subspace — each invalidates checkpoints from older semantics
    base_fp = fingerprint({"corpus": corpus_dir, "near_dedup": near_dedup, "v": 6})

    def _build_parsed():
        dropset: dict = {}
        stale = latest_wins_stale_keys(corpus_dir).materialize()
        n_stale = stale.count()
        pages = rd.read_parquet(
            f"{corpus_dir}/pages", columns=["page_id", "html", "lang"],
        )
        if n_stale < drop_broadcast_threshold:
            ids = np.sort(stale.to_pandas()["page_id"].to_numpy(np.int64))
            dropset["latest_wins"] = {
                "mode": "broadcast", "n_drop": int(n_stale),
                "drop_bytes": int(ids.nbytes),
            }
            parsed = parse_pages(pages, drop_ids=ids)
        else:
            dropset["latest_wins"] = {
                "mode": "exchange", "n_drop": int(n_stale),
                "drop_bytes": int(stale.size_bytes() or 0),
            }
            parsed = ops.exchange_id_anti_join(
                parse_pages(pages, drop_ids=None), stale, "page_id"
            )
        if near_dedup:
            # materialize ONCE and filter the materialized blocks —
            # filtering the original lazy plan would re-run the whole
            # parse (the heaviest stage) a second time downstream
            parsed = parsed.materialize()
            drop_arr, drop_ds, dropset["near_dedup"] = near_dedup_drops(
                parsed, broadcast_threshold=drop_broadcast_threshold,
            )
            if drop_arr is not None:
                parsed = ops.broadcast_semi_join(
                    parsed, set(drop_arr), "page_id", anti=True
                )
            elif drop_ds is not None:
                parsed = ops.exchange_id_anti_join(
                    parsed, drop_ds, "page_id"
                )
        os.makedirs(work_dir, exist_ok=True)
        with open(os.path.join(work_dir, "dropset.json"), "w") as f:
            _json.dump(dropset, f, indent=2)
        return parsed

    parsed = checkpoint_stage(
        os.path.join(work_dir, "parsed"), base_fp, _build_parsed,
    )
    name_index = checkpoint_stage(
        os.path.join(work_dir, "name_index"), base_fp,
        lambda: build_name_index(parsed),
    )
    user_text = checkpoint_stage(
        os.path.join(work_dir, "user_text"), base_fp,
        lambda: build_user_text(parsed),
    )
    accounts = checkpoint_stage(
        os.path.join(work_dir, "accounts"), base_fp,
        lambda: latest_accounts(
            rd.read_parquet(f"{corpus_dir}/account_snapshots.parquet")
        ),
    )
    from .graph import build_user_sg

    user_sg = checkpoint_stage(
        os.path.join(work_dir, "user_sg"), base_fp,
        lambda: build_user_sg(parsed),
    )
    entities = rd.read_parquet(
        f"{corpus_dir}/kb_entities.parquet"
    ).materialize()
    # trained-embedding subspace (see run_flagship): reuse the vectors
    # baked into a provided / persisted weights bundle so re-scoring
    # matches the training-time features; train them only on a fresh run
    wpath = os.path.join(work_dir, "weights.json")
    # scorer choice is part of the weights identity: a bundle trained
    # by a different scorer family must not be reused
    weights_fp = fingerprint({"base": base_fp, "scorer": scorer})
    if weights is None and os.path.exists(wpath):
        with open(wpath) as f:
            saved = _json.load(f)
        # a bundle persisted under older pipeline semantics (or another
        # corpus/config/scorer) is ignored wholesale, not half-reused:
        # stale weights would score the fresh feature table with
        # mismatched cols while silently retraining the wemb model
        # every run
        if saved.pop("_fp", None) == weights_fp:
            weights = saved
    fresh_run = weights is None
    if fresh_run:
        from .wordemb import train_word_embeddings

        wemb = train_word_embeddings(user_text, text_col="user_text")
    else:
        # caller-provided weights: reuse their baked-in vectors; a
        # bundle without any scores WITHOUT the subspace (f_wemb_cos
        # stays a zero column the scorer's cols never read) instead of
        # training vectors the trained weights can't consume
        wemb = weights.get("wemb")
    # the feature table depends on the wemb vectors — fingerprint them
    feat_fp = fingerprint({"base": base_fp, "wemb": wemb})
    feats = checkpoint_stage(
        os.path.join(work_dir, "features"), feat_fp,
        lambda: compute_features(
            acquire_candidates(entities, name_index), accounts, user_text,
            entities, user_sg, hp=load_homepage_alignments(corpus_dir),
            wemb=wemb,
        ),
    )
    if fresh_run:
        gold = pq.read_table(f"{corpus_dir}/gold.parquet").to_pandas()
        if scorer == "listwise":
            if kfold:
                raise ValueError(
                    "kfold is not supported with scorer='listwise' "
                    "(the joint softmax model trains once over all "
                    "entities); drop --kfold or use pairwise/mlp"
                )
            feats = feats.materialize()
            weights = train_scorer_listwise(feats, gold)
        elif scorer == "mlp":
            from .mlp import train_scorer_mlp

            feats = feats.materialize()
            weights = train_scorer_mlp(feats, gold, kfold=kfold)
        else:
            weights = train_scorer_blocks(feats, gold, kfold=kfold)
        weights["wemb"] = wemb
        with open(wpath, "w") as f:
            _json.dump({**weights, "_fp": weights_fp}, f)
    sel_fp = fingerprint(
        {"base": base_fp, "w": weights, "max_imp": max_imp, "min_score": min_score}
    )
    selected = checkpoint_stage(
        os.path.join(work_dir, "selected"), sel_fp,
        lambda: select_alignments(
            score_candidates_listwise(feats, weights)
            if weights.get("kind") == "listwise"
            else score_candidates(feats, weights),
            max_imp=max_imp, min_score=min_score,
        ),
    )
    triples = checkpoint_stage(
        os.path.join(work_dir, "triples"), sel_fp,
        lambda: triples_from_selection(selected),
    )
    if return_stages:
        return triples, selected, weights, {
            "name_index": name_index,
            "user_text": user_text,
            "accounts": accounts,
            "user_sg": user_sg,
            "entities": entities,
            "wemb": wemb,
        }
    return triples, selected, weights


def align_one(
    corpus_dir: str,
    work_dir: str,
    resource_id=None,
    attributes_json: str | None = None,
    max_imp: float = 0.0,
    min_score: float = 0.5,
    scorer: str = "pairwise",
):
    """Single-entity online alignment — the batch-engine analogue of
    the reference's SMT service entry point (smt/.../AlignmentsController
    .java by_resource_uri + the online annotate path): one entity in ->
    ranked candidate list + the selected (subj, pred, obj) triple out.

    Reuses the checkpointed stage artifacts (sharded postings index,
    user_text, accounts, social-graph vectors, trained weights) — the
    first call on a corpus pays the batch build, subsequent calls score
    ONE candidate list through the very same lookup + featurize +
    scorer path the batch pipeline uses. ``attributes_json`` scores an
    ad-hoc entity absent from the KB (the service's online shape);
    otherwise ``resource_id`` must exist in the KB.

    Returns (ranked_df, triples_df) — ranked_df one row per candidate
    (rank, score, is_alignment), triples_df the emitted triples for
    this entity (empty if no alignment cleared the thresholds)."""
    # scorer must match the work_dir's batch run, or the persisted
    # weights bundle fails its fingerprint and gets silently retrained
    # (and clobbered) under the default family
    _, _, weights, stages = run_flagship_checkpointed(
        corpus_dir, work_dir, return_stages=True, scorer=scorer
    )
    if attributes_json is not None:
        # match the KB's resource_id dtype so downstream exchange keys
        # hash identically
        rid_type = stages["entities"].schema().base_schema.field(
            "resource_id"
        ).type
        ent_ds = rd.from_arrow(
            pa.table(
                {
                    "resource_id": pa.array([resource_id]).cast(rid_type),
                    "attributes_json": pa.array([attributes_json]),
                }
            )
        )
    else:
        want = resource_id

        def pick(t: pa.Table) -> pa.Table:
            rid = t["resource_id"]
            val = want
            if pa.types.is_integer(rid.type) and not isinstance(val, int):
                try:
                    val = int(val)
                except (TypeError, ValueError):
                    return t.slice(0, 0)
            return t.filter(pc.equal(rid, pa.scalar(val, rid.type)))

        ent_ds = stages["entities"].map_batches(
            pick, batch_format="pyarrow"
        ).materialize()
        if ent_ds.count() == 0:
            raise ValueError(f"align_one: unknown resource_id {resource_id!r}")
    cands = acquire_candidates(ent_ds, stages["name_index"])
    feats = compute_features(
        cands, stages["accounts"], stages["user_text"], ent_ds,
        stages["user_sg"], hp=load_homepage_alignments(corpus_dir),
        wemb=stages["wemb"],
    )
    scored = (
        score_candidates_listwise(feats, weights)
        if weights.get("kind") == "listwise"
        else score_candidates(feats, weights)
    )
    selected = select_alignments(
        scored, max_imp=max_imp, min_score=min_score
    ).materialize()
    ranked = (
        selected.to_pandas()
        .sort_values(["resource_id", "rank"])
        .reset_index(drop=True)
    )
    triples = triples_from_selection(selected).to_pandas()
    return ranked, triples


def entry_flagship(testdata_sf_dir: str):
    """Driver entry: synthesize the input_hint-shaped corpus at the
    matching scale (cached under /tmp), run the flagship pipeline,
    return the triples Dataset."""
    from ..fixtures import corpus_dir_for

    sf = 0.001 if "0.001" in testdata_sf_dir else (
        0.01 if "0.01" in testdata_sf_dir else 0.1
    )
    corpus = corpus_dir_for(sf)
    triples, _, _ = run_flagship(corpus)
    return triples

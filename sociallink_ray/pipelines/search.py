"""Search-based candidate acquisition — the fixture-backed analogue of
the reference's Twitter-search path (the one acquisition mode round-4
still listed as missing).

Reference semantics (twitter/SearchRunner.java:49-103): per entity,
render a query string with the configured QueryAssemblyStrategy, call
the user-search endpoint, keep AT MOST 10 results
(``users.subList(10, ...).clear()``, :77-79), hand (candidates,
resource) to the receiver. The live API is out of scope in this
environment (SURVEY §2.1 S13), so the search ENGINE is replaced by a
deterministic user-search over the account table; everything around it
— the five query strategies, the query-string grammar, the 10-result
cap, the per-entity fan-out — is the reference's.

Search-engine analogue (documented deviations):
  * searchable text per account = display name + screen name
    (underscores as spaces), normalized like the index path
    (Twitter's user search matches both fields).
  * query grammar: ``(clause) | (clause)`` with optional double quotes
    (exactly what the strategies emit — AllNamesStrategy.java:58-66
    joins cleaned names with `` | ``); a clause matches an account iff
    ALL its tokens appear in the searchable text (the same phrase-AND
    convention as CandidateLookup / Postgres tsquery).
  * ranking: Twitter's relevance order is proprietary; we rank by
    (#matched clauses desc, followers_count desc, uid asc) — a
    deterministic stand-in the tests pin.

Scale shape: the profile inverted index reuses
``build_token_postings_sharded`` (hash-sharded ObjectRefs, built off
the driver, probes route by token hash), followers attach via an
exchange join, and the final rank+cap is one per-entity bucketed
apply — no corpus-sized driver state anywhere.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions import names as nm
from ..functions.textnorm import normalize_fullname
from ..stages import ops

SEARCH_RESULT_CAP = 10  # SearchRunner.java:77-79
HARVEST_CAP = 1000  # pre-rank per-entity bound (FillFromIndex harvest)

STRATEGIES = {
    "all_names": lambda r: nm.all_names_query(r),
    "strict": nm.strict_name,
    "strict_with_topic": nm.strict_with_topic,
    "strict_quotes": nm.strict_quotes_query,
    "no_quotes_dupes": nm.no_quotes_dupes_query,
}


def parse_query(q: str) -> list[list[str]]:
    """Query string -> clauses of normalized tokens. Grammar is what
    the strategies emit: clauses separated by ``|``, each optionally
    parenthesized and/or double-quoted; a clause is a phrase whose
    tokens must ALL match."""
    import re

    clauses = []
    # clause separators: AllNames emits ` | `, NoQuotesDupes emits
    # ` OR ` (NoQuotesDupesStrategy joins with ") OR (")
    for part in re.split(r"\||\sOR\s", str(q)):
        # the strategies wrap cleaned names in SINGLE quotes
        # (_cleaned_up_name) and StrictQuotes in double quotes — strip
        # both, plus the OR-group parens
        part = part.strip().strip("()").strip().strip("'\"").strip()
        # commas separate "Last, First" name variants inside a clause;
        # the search tokenizer treats them as whitespace (Twitter's
        # search does not index punctuation)
        norm = normalize_fullname(part.replace(",", " "))
        toks = norm.split()
        if toks:
            clauses.append(toks)
    return clauses


def profile_name_index(accounts: Dataset) -> Dataset:
    """Accounts -> (fullname, uid, freq) rows for the sharded postings
    build: one row for the display name, one for the screen name with
    underscores as spaces (both normalized), freq 1 each."""

    def explode(batch: pa.Table) -> pa.Table:
        uids = batch["uid"].to_numpy(zero_copy_only=False)
        names = batch["name"].to_pylist()
        screens = batch["screen_name"].to_pylist()
        out_u, out_n = [], []
        for uid, nme, scr in zip(uids, names, screens):
            for s in (
                normalize_fullname(str(nme)),
                normalize_fullname(str(scr).replace("_", " ")),
            ):
                if s:
                    out_u.append(int(uid))
                    out_n.append(s)
        return pa.table(
            {
                "fullname": pa.array(out_n, pa.string()),
                "uid": pa.array(out_u, pa.int64()),
                "freq": pa.array([1] * len(out_u), pa.int64()),
            }
        )

    return accounts.map_batches(explode, batch_format="pyarrow")


class SearchLookup:
    """Per-entity user search against the sharded profile postings:
    parse the strategy's query, phrase-AND each clause, count matched
    clauses per uid, keep the HARVEST_CAP best for downstream ranking.
    Reuses CandidateLookup's shard probing (one stable token hash,
    per-worker shard cache)."""

    def __init__(self, shards, strategy: str):
        from .align import CandidateLookup

        self._probe = CandidateLookup(shards)
        self.strategy = STRATEGIES[strategy]

    def search(self, resource: nm.Resource) -> list[tuple[int, int]]:
        if resource.is_dead:  # ProcessDataset.java:192-202 skip
            return []
        clauses = parse_query(self.strategy(resource))
        matched: dict[int, int] = {}
        for toks in clauses:
            hits = self._probe._phrase_hits(" ".join(toks))
            for uid in hits:
                matched[uid] = matched.get(uid, 0) + 1
        # harvest-cap tie-break is (n_matched desc, uid asc) — followers
        # are not available inside the lookup (they attach via the
        # downstream exchange join), so when a single n_matched TIER
        # straddles the cap the cut within that tier is by uid, like
        # FillFromIndex's Σfreq harvest; the final order is re-ranked
        # with followers among the survivors
        top = sorted(matched.items(), key=lambda kv: (-kv[1], kv[0]))
        return top[:HARVEST_CAP]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rids, uids, nm_ = [], [], []
        for rid, attrs_json in zip(
            batch["resource_id"].to_pylist(),
            batch["attributes_json"].to_pylist(),
        ):
            res = nm.Resource(rid, json.loads(attrs_json))
            for uid, n in self.search(res):
                rids.append(rid)
                uids.append(uid)
                nm_.append(n)
        return pa.table(
            {
                "resource_id": pa.array(rids, pa.string()),
                "uid": pa.array(uids, pa.int64()),
                "n_matched": pa.array(nm_, pa.int64()),
            }
        )


def search_acquire(
    entities: Dataset,
    accounts: Dataset,
    strategy: str = "all_names",
    cap: int = SEARCH_RESULT_CAP,
) -> Dataset:
    """SearchRunner's per-entity candidate acquisition over the account
    table: (resource_id, uid, n_matched, followers_count, order) with
    order 1..<=cap per entity by (n_matched desc, followers desc, uid
    asc)."""
    from .align import build_token_postings_sharded

    shards = build_token_postings_sharded(profile_name_index(accounts))

    def lookup_batch(batch: pa.Table) -> pa.Table:
        return SearchLookup(shards, strategy)(batch)

    hits = entities.map_batches(
        lookup_batch, batch_format="pyarrow", batch_size=256
    )
    with_fol = ops.exchange_join(
        hits,
        accounts.select_columns(["uid", "followers_count"]),
        on=["uid"],
    )

    out = ops.grouped_topk_rank(
        with_fol, "resource_id", ["n_matched", "followers_count"],
        "uid", cap,
    )
    # SearchRunner speaks candidate "order", not "rank"
    return out.map_batches(
        lambda df: df.rename(columns={"rank": "order"}),
        batch_format="pandas",
    )

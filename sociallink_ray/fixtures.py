"""Deterministic synthetic corpus generator (FIXTURES.md).

Generates the flagship pipeline's inputs in the BASELINE.json
``input_hint`` shape — a Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang) plus the KB / account / gold side
tables — at a given scale factor, seeded, from a closed vocabulary so
every golden is byte-stable. No external data.

The ``text`` column is produced by running the engine's own
``extract_html_text`` over the generated ``html`` — the byte-identity
invariant is therefore true by construction, and the pipeline TEST is
that the engine reproduces the column bit-for-bit from ``html`` alone.

Layout written to ``<out_dir>``:
    pages/part-*.parquet       (page_id, url, warc_ts, html, text, lang)
    kb_entities.parquet        (resource_id, attributes_json)
    account_snapshots.parquet  (uid, screen_name, name, ..., snapshot_ts)
    gold.parquet               (resource_id, uid)

Reference analogues: raw tweet stream (index/utils/Deserializer.java),
user_objects snapshots (schema.sql:59-65), evaluation gold CSV
(evaluation/Dataset.java:61-80).
"""

from __future__ import annotations

import html as _htmllib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions import names as nm
from .functions.textnorm import extract_html_text

FIRST = (
    "james mary robert patricia john jennifer michael linda david elizabeth "
    "william barbara richard susan joseph jessica thomas sarah charles karen "
    "ada grace alan edsger donald barbara niklaus tim vint radia frances"
).split()
LAST = (
    "smith johnson williams brown jones garcia miller davis rodriguez martinez "
    "hernandez lopez gonzalez wilson anderson thomas taylor moore jackson "
    "lovelace hopper turing dijkstra knuth liskov wirth bernerslee cerf "
    "perlman allen hamilton"
).split()
ORG_A = "acme globex initech umbrella hooli vehement massive aperture cyberdyne wayne".split()
ORG_B = "dynamics systems labs industries analytics robotics software networks media logistics".split()
ORG_SUFFIX = ["inc", "corp", "group", "ltd"]
TOPICS = ["Musician", "Company", "Politician", "Scientist", "Athlete"]
WORDS = (
    "data stream table graph model query index batch shuffle merge sort join "
    "filter window entity link align score rank node edge label text page web "
    "crawl corpus token vector feature cluster dedup hash band signature"
).split() + [f"w{i}" for i in range(500)]
# the vocabulary must be large enough that two random pages are NOT
# near-duplicates — a 30-word pool made ~45% of pages genuine >0.8-Jaccard
# neighbours of each other, which no real web corpus looks like
LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr", "und"]


def _title(s: str) -> str:
    return " ".join(w.capitalize() for w in s.split())


def build_corpus(out_dir: str, sf: float = 0.001, seed: int = 42) -> dict:
    """Generate and write the corpus; returns summary counts. Idempotent:
    skips generation when a matching _MANIFEST.json already exists."""
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    spec = {"sf": sf, "seed": seed, "version": 11}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("spec") == spec:
            return m
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    n_entities = max(50, int(sf * 50_000))
    n_pages = max(400, int(sf * 1_000_000))

    # ---- KB entities --------------------------------------------------
    entities = []
    for i in range(n_entities):
        is_person = rng.rand() < 0.8
        if is_person:
            first = FIRST[rng.randint(len(FIRST))]
            last = LAST[rng.randint(len(LAST))]
            base = f"{first} {last}"
            attrs = {
                nm.ATTRIBUTE_NAME: [_title(base)],
                nm.ATTRIBUTE_LABEL: [_title(base)],
                nm.ATTRIBUTE_GIVEN_NAME: [_title(first)],
                nm.ATTRIBUTE_SURNAME: [_title(last)],
                nm.ATTRIBUTE_TYPE: [nm.ALIGNMENTS_PERSON],
            }
            if rng.rand() < 0.3:  # "Last, First" variant form
                attrs[nm.ATTRIBUTE_NAME].append(f"{_title(last)}, {_title(first)}")
            if rng.rand() < 0.05:  # dead entities are skipped downstream
                attrs[nm.ONTO + "deathDate"] = ["1955-01-01"]
        else:
            base = (
                f"{ORG_A[rng.randint(len(ORG_A))]} {ORG_B[rng.randint(len(ORG_B))]}"
            )
            attrs = {
                nm.ATTRIBUTE_NAME: [_title(base)],
                nm.ATTRIBUTE_LABEL: [
                    _title(base),
                    _title(base) + " " + ORG_SUFFIX[rng.randint(4)].capitalize(),
                ],
                nm.ATTRIBUTE_TYPE: [nm.ALIGNMENTS_ORGANISATION],
            }
            if rng.rand() < 0.1:
                attrs[nm.PROP + "defunct"] = ["yes"]
        rid_base = _title(base).replace(" ", "_")
        if rng.rand() < 0.1:
            rid = f"http://kb.example/resource/{rid_base}_({TOPICS[rng.randint(len(TOPICS))]})"
        else:
            rid = f"http://kb.example/resource/{rid_base}"
        # topical words drive the text-overlap feature: a unique-per-entity
        # triple (distinctive vocabulary) plus common-vocab noise
        topic_words = [f"t{i}x", f"t{i}y", f"t{i}z"] + [
            WORDS[rng.randint(len(WORDS))] for _ in range(3)
        ]
        attrs[nm.ATTRIBUTE_ABSTRACT] = [
            f"{_title(base)} is known for " + " ".join(topic_words)
        ]
        # rdfs:comment — the DescriptionScorer input (COMMENT_PROPERTY)
        if rng.rand() < 0.9:
            attrs[nm.ATTRIBUTE_COMMENT] = [
                f"{_title(base)} " + " ".join(topic_words[:4])
            ]
        entities.append(
            {
                "resource_id": rid,
                "attributes": attrs,
                "base": base,
                "is_person": is_person,
                "topic_words": topic_words,
            }
        )
    # de-dup resource ids (same generated name twice): keep first
    seen: dict[str, bool] = {}
    uniq = []
    for e in entities:
        if e["resource_id"] in seen:
            continue
        seen[e["resource_id"]] = True
        uniq.append(e)
    entities = uniq
    n_entities = len(entities)

    # ---- accounts -----------------------------------------------------
    # true accounts for ~70% of entities; distractors share surnames /
    # org words (hard negatives for the name scorers)
    accounts = []
    gold = []
    # homepage-alignment dictionaries (HomepageAlignmentsScorer
    # extracted/filtered CSVs): ids scraped from each entity's homepage
    hp_rows: list[dict] = []
    next_uid = 1000
    for i, e in enumerate(entities):
        # dead entities are never aligned (the pipeline skips them by
        # reference semantics, ProcessDataset.java:192-202)
        is_dead = any(
            a in e["attributes"]
            for a in (nm.ONTO + "deathDate", nm.PROP + "defunct")
        )
        aligned = (rng.rand() < 0.7) and not is_dead
        base = e["base"]
        if aligned:
            uid = next_uid
            next_uid += 1
            name = _title(base)
            if rng.rand() < 0.2:  # noisy display name
                name = name + " " + ["Official", "HQ", "Real"][rng.randint(3)]
            screen = base.replace(" ", "_")
            accounts.append(
                {
                    "uid": uid,
                    "screen_name": screen,
                    "name": name,
                    "description": "the real "
                    + base
                    + " | "
                    + " ".join(e["topic_words"][:3]),
                    "popularity": float(rng.pareto(1.2) + 1.0),
                    "verified": bool(rng.rand() < 0.3),
                    "topic_words": e["topic_words"],
                }
            )
            gold.append({"resource_id": e["resource_id"], "uid": uid})
            # homepage extraction found the true id for ~half the
            # aligned entities, sometimes alongside a noise id; a
            # "filtered" pick exists for ~70% of those
            if rng.rand() < 0.5:
                hp_rows.append(
                    {
                        "resource_id": e["resource_id"], "kind": "extracted",
                        "screen_name": screen.lower(),
                    }
                )
                if rng.rand() < 0.3:
                    hp_rows.append(
                        {
                            "resource_id": e["resource_id"],
                            "kind": "extracted",
                            "screen_name": "partner_" + WORDS[rng.randint(len(WORDS))],
                        }
                    )
                if rng.rand() < 0.7:
                    hp_rows.append(
                        {
                            "resource_id": e["resource_id"], "kind": "filtered",
                            "screen_name": screen.lower(),
                        }
                    )
        elif rng.rand() < 0.1:
            # homepage noise for unaligned entities
            hp_rows.append(
                {
                    "resource_id": e["resource_id"], "kind": "extracted",
                    "screen_name": "site_" + WORDS[rng.randint(len(WORDS))],
                }
            )
        # distractor sharing part of the name
        if rng.rand() < 0.5:
            uid = next_uid
            next_uid += 1
            parts = base.split()
            if e["is_person"]:
                dname = FIRST[rng.randint(len(FIRST))] + " " + parts[-1]
            else:
                dname = parts[0] + " " + ORG_B[rng.randint(len(ORG_B))]
            accounts.append(
                {
                    "uid": uid,
                    "screen_name": dname.replace(" ", "_") + str(uid % 97),
                    "name": _title(dname),
                    "description": "fan of " + base,
                    "popularity": float(rng.pareto(1.2) + 1.0),
                    "verified": bool(rng.rand() < 0.02),
                    "topic_words": [WORDS[rng.randint(len(WORDS))] for _ in range(3)],
                }
            )
    # unrelated accounts
    for _ in range(n_entities // 2):
        uid = next_uid
        next_uid += 1
        dname = FIRST[rng.randint(len(FIRST))] + " " + LAST[rng.randint(len(LAST))]
        accounts.append(
            {
                "uid": uid,
                "screen_name": dname.replace(" ", "_") + str(uid % 89),
                "name": _title(dname),
                "description": "just here for the "
                + WORDS[rng.randint(len(WORDS))],
                "popularity": float(rng.pareto(1.2) + 1.0),
                "verified": False,
                "topic_words": [WORDS[rng.randint(len(WORDS))] for _ in range(3)],
            }
        )

    # ---- account snapshots (latest-wins dedup input) ------------------
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    snap_rows = []
    for a in accounts:
        n_snaps = 1 + rng.randint(3)
        statuses = rng.randint(50, 5000)
        followers = int(a["popularity"] * 1000)
        for s in range(n_snaps):
            snap_rows.append(
                {
                    "uid": a["uid"],
                    "screen_name": a["screen_name"],
                    "name": a["name"] if s == n_snaps - 1 else a["name"].lower(),
                    "description": a["description"],
                    "location": "",
                    "lang": "en",
                    # profile url for the ProfileExtractor domain
                    # nominal (ProfileExtractor.java:32,97-110): mixed
                    # shapes — absent / invalid / bare / full — keyed
                    # deterministically off uid+snapshot
                    "url": (
                        None if (a["uid"] + s) % 5 == 0
                        else "not a url %%" if a["uid"] % 11 == 3
                        else (
                            ("https://" if a["uid"] % 2 else "")
                            + a["screen_name"].lower().replace("_", "")
                            + ".example."
                            + ["com", "org", "net"][a["uid"] % 3]
                            + ("/about" if s % 2 else "")
                        )
                    ),
                    "followers_count": followers + s * 10,
                    "friends_count": int(followers / (2 + rng.rand() * 8)) + 1,
                    "listed_count": followers // 100,
                    "statuses_count": statuses + s * 17,
                    "favourites_count": int(rng.randint(0, 1000)),
                    "verified": a["verified"],
                    "created_at": base_ts - np.timedelta64(int(rng.randint(100, 3000)), "D"),
                    "last_status_ts": base_ts + np.timedelta64(int(rng.randint(0, 90 * 24)), "h"),
                    "snapshot_ts": base_ts + np.timedelta64(int(s * 3600 + rng.randint(60)), "s"),
                }
            )

    # ---- pages --------------------------------------------------------
    # Zipf popularity over accounts drives mention skew (celebrity keys)
    acc_uids = np.array([a["uid"] for a in accounts])
    acc_names = {a["uid"]: a["name"] for a in accounts}
    acc_topics = {a["uid"]: a["topic_words"] for a in accounts}
    pop = np.array([a["popularity"] for a in accounts])
    p_acc = pop / pop.sum()

    ent_names = [_title(e["base"]) for e in entities]

    def make_html(pid: int) -> tuple[str, str]:
        n_par = 2 + rng.randint(4)
        title_words = [WORDS[rng.randint(len(WORDS))] for _ in range(3)]
        parts = [f"<h1>{_title(' '.join(title_words))}</h1>"]
        # guaranteed round-robin coverage so every account is indexable
        # (on top of the Zipf-skewed sampling below)
        g_uid = int(acc_uids[pid % len(acc_uids)])
        parts.append(
            '<p>featuring <a class="account" data-uid="{}">{}</a> {}</p>'.format(
                g_uid,
                _htmllib.escape(acc_names[g_uid]),
                " ".join(acc_topics[g_uid][:2]),
            )
        )
        for _ in range(n_par):
            sent: list[str] = [WORDS[rng.randint(len(WORDS))] for _ in range(14)]
            # account references (the IndexExtractor signal)
            for _ in range(1 + rng.randint(3)):
                uid = int(acc_uids[np.searchsorted(np.cumsum(p_acc), rng.rand())])
                tw = acc_topics[uid]
                sent.append(
                    f'<a class="account" data-uid="{uid}">'
                    f"{_htmllib.escape(acc_names[uid])}</a>"
                )
                sent.extend(tw[: 1 + rng.randint(2)])
            # entity mention surface (NER-analog signal)
            if rng.rand() < 0.5:
                ent = ent_names[rng.randint(len(ent_names))]
                sent.append(
                    f'<b class="mention" data-surface="{_htmllib.escape(ent)}">'
                    f"{_htmllib.escape(ent)}</b>"
                )
            sent.extend(WORDS[rng.randint(len(WORDS))] for _ in range(8))
            parts.append("<p>" + " ".join(sent) + "</p>")
        body = "".join(parts)
        html_doc = (
            "<html><head><title>page</title></head><body>"
            '<nav><a href="/">home</a> boilerplate nav</nav>'
            f"<article>{body}</article>"
            "<footer>(c) site {}</footer></body></html>".format(pid % 7)
        )
        return html_doc, body

    page_rows = []
    pid = 0
    while pid < n_pages:
        site = int(rng.zipf(1.3)) % max(10, n_pages // 100)
        url = f"https://site{site}.example/p/{pid}"
        lang = LANGS[rng.randint(len(LANGS))]
        broken = rng.rand() < 0.01
        if broken:
            html_doc = "<html><body><p>truncated" + "x" * int(rng.randint(50))
        else:
            html_doc, _ = make_html(pid)
        text = extract_html_text(html_doc) if not broken else ""
        ts = base_ts + np.timedelta64(int(rng.randint(0, 90 * 86400)), "s")
        page_rows.append(
            {
                "page_id": pid,
                "url": url,
                "warc_ts": ts,
                "html": html_doc.encode("utf-8"),
                "text": text or "",
                "lang": lang,
            }
        )
        pid += 1
        # exact-duplicate url (latest-wins dedup path), ~3%
        if not broken and rng.rand() < 0.03 and pid < n_pages:
            page_rows.append(
                {
                    "page_id": pid,
                    "url": url,
                    "warc_ts": ts + np.timedelta64(int(rng.randint(1, 86400)), "s"),
                    "html": html_doc.encode("utf-8"),
                    "text": text or "",
                    "lang": lang,
                }
            )
            pid += 1
        # near-duplicate text (MinHash-LSH path), ~2%
        if not broken and rng.rand() < 0.02 and pid < n_pages:
            mutated = html_doc.replace(" the ", " thy ", 1).replace(
                "boilerplate nav", "boilerplate navi"
            )
            page_rows.append(
                {
                    "page_id": pid,
                    "url": f"https://mirror{site}.example/p/{pid}",
                    "warc_ts": ts + np.timedelta64(int(rng.randint(1, 3600)), "s"),
                    "html": mutated.encode("utf-8"),
                    "text": extract_html_text(mutated) or "",
                    "lang": lang,
                }
            )
            pid += 1

    # ---- write --------------------------------------------------------
    pages_tbl = pa.table(
        {
            "page_id": pa.array([r["page_id"] for r in page_rows], pa.int64()),
            "url": pa.array([r["url"] for r in page_rows]),
            "warc_ts": pa.array([r["warc_ts"] for r in page_rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in page_rows], pa.binary()),
            "text": pa.array([r["text"] for r in page_rows]),
            "lang": pa.array([r["lang"] for r in page_rows]),
        }
    )
    # one directory of part files (input-shard layout: read parallelism is
    # per-file; also the resumable-output convention of the engine)
    pages_dir = os.path.join(out_dir, "pages")
    import shutil as _sh

    _sh.rmtree(pages_dir, ignore_errors=True)
    os.makedirs(pages_dir, exist_ok=True)
    shard_rows = 8192
    n_shards = max(1, (len(page_rows) + shard_rows - 1) // shard_rows)
    for si in range(n_shards):
        pq.write_table(
            pages_tbl.slice(si * shard_rows, shard_rows),
            os.path.join(pages_dir, f"part-{si:05d}.parquet"),
            row_group_size=4096,
        )
    legacy = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(legacy):
        os.remove(legacy)
    pq.write_table(
        pa.table(
            {
                "resource_id": pa.array([e["resource_id"] for e in entities]),
                "attributes_json": pa.array(
                    [json.dumps(e["attributes"], sort_keys=True) for e in entities]
                ),
            }
        ),
        os.path.join(out_dir, "kb_entities.parquet"),
    )
    snap_cols: dict[str, list] = {k: [r[k] for r in snap_rows] for k in snap_rows[0]}
    snap_schema = {
        "uid": pa.int64(), "screen_name": pa.string(), "name": pa.string(),
        "description": pa.string(), "location": pa.string(), "lang": pa.string(),
        "url": pa.string(),
        "followers_count": pa.int64(), "friends_count": pa.int64(),
        "listed_count": pa.int64(), "statuses_count": pa.int64(),
        "favourites_count": pa.int64(), "verified": pa.bool_(),
        "created_at": pa.timestamp("us"), "last_status_ts": pa.timestamp("us"),
        "snapshot_ts": pa.timestamp("us"),
    }
    pq.write_table(
        pa.table({k: pa.array(v, snap_schema[k]) for k, v in snap_cols.items()}),
        os.path.join(out_dir, "account_snapshots.parquet"),
        row_group_size=8192,
    )
    pq.write_table(
        pa.table(
            {
                "resource_id": pa.array([g["resource_id"] for g in gold]),
                "uid": pa.array([g["uid"] for g in gold], pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "resource_id": pa.array([r["resource_id"] for r in hp_rows]),
                "kind": pa.array([r["kind"] for r in hp_rows]),
                "screen_name": pa.array([r["screen_name"] for r in hp_rows]),
            }
        ),
        os.path.join(out_dir, "homepage_alignments.parquet"),
    )

    summary = {
        "spec": spec,
        "n_entities": n_entities,
        "n_accounts": len(accounts),
        "n_snapshots": len(snap_rows),
        "n_pages": len(page_rows),
        "n_gold": len(gold),
    }
    with open(manifest_path, "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def corpus_dir_for(sf: float, root: str = "/tmp/slr_corpus") -> str:
    """Canonical cached corpus location for a scale factor."""
    d = f"{root}_sf{sf}"
    build_corpus(d, sf=sf)
    return d

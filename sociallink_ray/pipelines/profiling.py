"""The reference's concrete profiling extractors as named Ray Data
stages (round-4 verdict item 5) — the per-user feature subsystem that
feeds downstream profiling/LSA, distinct from the alignment scorer
features.

Reference parity targets (cited per extractor):
  * ``break_hashtags`` — CamelCase hashtag splitting,
    vectorize/preprocessing/text/TextProcessor.java:129-147
    (``breakHashtag``): a space is inserted before every uppercase
    code point whose predecessor is NOT uppercase (the builder is
    never empty, so a leading uppercase always gets one), wrapped in
    ``<shash>``/``<ehash>`` markers. RE2's global replace reproduces
    the scan exactly (non-overlapping left-to-right), so the DuckDB
    oracle runs the very same pattern.
  * ``hashtag_profiles`` — profiling/extractors/HashtagExtractor.java:
    per-author hashtag BOWs merged by SUM (TempFeatureSet.Type.AVG,
    Features.java merge), served as tf-idf with the reference's exact
    formulas: tf = log2(count+1) (BOW.java logarithmicFrequency),
    idf = log10(1 + n_authors/(1 + occurrences)) (HashtagExtractor.idf,
    where the ``idf`` counter increments once per OCCURRENCE, not per
    author), and terms with fewer than CUTOFF_FREQUENCY=3 occurrences
    dropped (HashtagExtractor.fin).
  * ``mentioned_text_profiles`` — MentionedTextExtractor.java:44-70:
    for every mention of a tracked uid, the FULL tweet text's BOW is
    credited to the mentioned user (AVG merge = count sum). The
    broadcast uid set reproduces the extractor's ``uids`` filter.
    (The reference's ``_lsa`` subclass then projects the BOW through
    LSA — compose with ``pipelines.lsa`` if needed; not fused here.)
  * ``extract_url_domains`` / ``profile_url_domains`` —
    ProfileExtractor.java:41-110: the per-user profile vector's
    URL-domain nominal uses DOMAIN_PATTERN
    ``^(https?://)?([\\p{L}0-9]+\\.)+([\\p{L}]+)(/.*)?$`` on the
    lowercased url, keeping group 3 (the final label) and "none" on
    null/no-match; the vector merges MAX = latest-timestamp-wins
    (Features.java), which is exactly ``streaming.profile_aggregate``'s
    latest_cols path. Nominal values are emitted as STRINGS rather
    than first-seen dictionary ids (registerNominalValue's insertion
    order is inherently racy/partition-dependent — documented
    deviation; the string IS the nominal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..stages import ops

# TextProcessor.java:129-147 — insert ' ' before an uppercase whose
# predecessor is not uppercase (incl. the leading position).
_CAMEL_SPLIT_PATTERN = r"(^|[^\p{Lu}])(\p{Lu})"
_CAMEL_SPLIT_REWRITE = r"\1 \2"

# ProfileExtractor.java:32 DOMAIN_PATTERN (anchored full-match, as
# Matcher.matches() implies); group 3 is the kept nominal.
DOMAIN_PATTERN = r"^(https?://)?([\p{L}0-9]+\.)+([\p{L}]+)(/.*)?$"
_DOMAIN_EXTRACT = (
    r"^(?:https?://)?(?:[\p{L}0-9]+\.)+(?P<d>\p{L}+)(?:/.*)?$"
)


def break_hashtags(tags: pa.Array | list[str]) -> pa.Array:
    """Vectorized ``breakHashtag``: ' <shash> ' + camel-split text +
    ' <ehash> ' per input string (Arrow RE2 kernels, zero Python per
    row)."""
    arr = (
        tags
        if isinstance(tags, (pa.Array, pa.ChunkedArray))
        else pa.array(tags)
    )
    split = pc.replace_substring_regex(
        arr, pattern=_CAMEL_SPLIT_PATTERN, replacement=_CAMEL_SPLIT_REWRITE
    )
    return pc.binary_join_element_wise(
        pa.scalar(" <shash> "), split, pa.scalar(" <ehash> "), ""
    )


def extract_url_domains(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """DOMAIN_PATTERN group-3 nominal per url: lowercase, full-match,
    'none' on null or no-match (ProfileExtractor.registerDomain)."""
    low = pc.utf8_lower(urls)
    ok = pc.match_substring_regex(low, _DOMAIN_EXTRACT)
    dom = pc.struct_field(pc.extract_regex(low, _DOMAIN_EXTRACT), "d")
    out = pc.if_else(pc.fill_null(ok, False), dom, pa.scalar("none"))
    return (
        out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
    )


def hashtag_profiles(
    ds: Dataset,
    author_col: str,
    text_col: str,
    n_tags: int = 3,
    cutoff: int = 3,
) -> Dataset:
    """Per-author tf-idf hashtag profiles (HashtagExtractor semantics
    over a synthetic-corpus analog: each row's first ``n_tags``
    whitespace tokens stand in for its tweet's hashtag entities).
    Output (author, term, n, tfidf) — rows, not first-seen dictionary
    ids (see module docstring).

    Distribution: one combiner-exchange groupby for the per-(author,
    term) counts; term occurrence totals and the author count are
    dimension-sized aggregates broadcast back into a map — no second
    corpus-wide shuffle."""

    def explode(batch: pa.Table) -> pa.Table:
        authors = batch[author_col].to_numpy(zero_copy_only=False)
        toks = [str(t).split()[:n_tags] for t in batch[text_col].to_pylist()]
        lens = np.fromiter((len(t) for t in toks), np.int64, count=len(toks))
        return pa.table(
            {
                "author": np.repeat(authors, lens),
                "term": pa.array([w for t in toks for w in t]),
            }
        )

    counts = ops.partial_groupby_sum(
        ds, ["author", "term"], count_as="n", pre_fn=explode
    ).materialize()
    # dimension-sized side aggregates (vocab x 1 and one scalar)
    term_df = counts.groupby("term").sum("n").to_pandas()
    occ_col = [c for c in term_df.columns if c != "term"][0]
    df_map = dict(zip(term_df["term"], term_df[occ_col]))
    n_authors = len(counts.select_columns(["author"]).unique("author"))
    side = ray.put((df_map, n_authors))

    def tfidf(batch: pa.Table) -> pa.Table:
        dfm, A = ops.cached_get(side)
        terms = batch["term"].to_pylist()
        occ = np.array([dfm[t] for t in terms], dtype=np.float64)
        keep = occ >= cutoff
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf = np.log2(n + 1.0)
        idf = np.log10(1.0 + A / (1.0 + occ))
        out = pa.table(
            {
                "author": batch["author"],
                "term": batch["term"],
                "n": batch["n"],
                "tfidf": tf * idf,
            }
        )
        return out.filter(pa.array(keep))

    return counts.map_batches(tfidf, batch_format="pyarrow")


def mentioned_text_profiles(
    ds: Dataset,
    text_col: str,
    uid_set: list[str],
) -> Dataset:
    """MentionedTextExtractor: every row whose text contains a tracked
    uid (here: a token equal to a broadcast uid — the analog of
    entities.user_mentions) credits its FULL text BOW to that uid, one
    per DISTINCT mention; profiles merge by count sum (AVG). Output
    (mention, term, n, tf) with tf = log2(n+1) (BOW logarithmic tf).
    The uid set rides a broadcast ref into the explode map — the only
    exchange is the (mention, term) combiner groupby."""
    uref = ray.put(frozenset(uid_set))

    def explode(batch: pa.Table) -> pa.Table:
        uids = ops.cached_get(uref)
        mention_col, term_col = [], []
        for text in batch[text_col].to_pylist():
            toks = str(text).split()
            mentions = sorted({t for t in toks if t in uids})
            for m in mentions:
                mention_col.extend([m] * len(toks))
                term_col.extend(toks)
        return pa.table(
            {"mention": pa.array(mention_col, pa.string()),
             "term": pa.array(term_col, pa.string())}
        )

    counts = ops.partial_groupby_sum(
        ds, ["mention", "term"], count_as="n", pre_fn=explode
    )

    def tf(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("tf", pa.array(np.log2(n + 1.0)))

    return counts.map_batches(tf, batch_format="pyarrow")


def profile_vectors(
    snapshots: Dataset,
    key: str = "uid",
    ts_col: str = "snapshot_ts",
    url_col: str = "url",
    lang_col: str = "lang",
    int_cols: tuple = (
        "followers_count", "friends_count", "listed_count",
        "favourites_count", "statuses_count",
    ),
    bool_cols: tuple = ("verified",),
    id_col: str | None = None,
) -> Dataset:
    """ProfileExtractor.java:41-90 per-user profile vector over an
    account-snapshot stream: nominal lang + URL-domain (DOMAIN_PATTERN
    group 3) + integer counts + boolean flags, merged MAX =
    latest-timestamp-wins via ``streaming.profile_aggregate``'s
    latest-cols machinery (Features.java MAX merge). One exchange on
    ``key``. (The reference's trailing LSA description vector is the
    separately-covered T1 embedder; not fused here.)"""
    from ..stages.streaming import profile_aggregate

    present = [c for c in (*int_cols, *bool_cols) if c]

    def add_domain(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "url_domain", extract_url_domains(batch[url_col])
        )

    enriched = snapshots.map_batches(add_domain, batch_format="pyarrow")
    out = profile_aggregate(
        enriched, key, ts_col,
        sum_cols={},
        latest_cols=[lang_col, "url_domain", *present],
        id_col=id_col,
    )
    return out

"""Driver-facing operator catalog: every implemented operator from
SURVEY.md §2 exercised over the driver's testdata tables, each with an
ANSI-SQL DuckDB oracle where the semantics are SQL-expressible.

Contract (see /root/repo/__ray_entry__.py): ``QUERIES[name](sf_dir)``
returns a Dataset / DataFrame / pyarrow Table; ``ORACLE_SQL[name]`` is
the equivalent SQL over the pre-registered views. Column names match
exactly on both sides. Entries without oracle SQL (probabilistic /
model-driven ops) get the driver's rows-only check.

Float discipline: anything produced by floating-point reduction that
the oracle recomputes independently is rounded to a fixed number of
decimals ON BOTH SIDES so the value-hash comparison is stable.
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

from .stages import ann, curate, dedup, ops, retrieval

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _small_pdf(sf_dir: str, table: str, columns: list[str] | None = None):
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


def _round_cols(ds, cols: dict[str, int]):
    # DuckDB round() is half-away-from-zero; pyarrow defaults to
    # half-to-even — values landing exactly on a .5 tie at the rounded
    # digit (e.g. norm_w=0.0010625 at 6dp) would disagree by one quantum
    def rnd(batch: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            batch = batch.set_column(
                batch.schema.get_field_index(c), c,
                pc.round(batch[c], ndigits=nd,
                         round_mode="half_towards_infinity"),
            )
        return batch

    return ds.map_batches(rnd, batch_format="pyarrow")


# --------------------------------------------------------------------------
# 1. q1_pricing_summary — the flagship scan-heavy grouped aggregate
#    (partial-agg combiner pattern; reference analogue A13/A14 scans)
# --------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "l_extendedprice": batch["l_extendedprice"],
                "disc_price": disc_price,
                "l_discount": batch["l_discount"],
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    agg = ops.partial_groupby_sum(
        prepped,
        ["l_returnflag", "l_linestatus"],
        sums={
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
            "l_discount": "sum_disc",
        },
        count_as="count_order",
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["count_order"], pa.float64())
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.round(batch["sum_qty"], ndigits=2),
                "sum_base_price": pc.round(batch["sum_base_price"], ndigits=2),
                "sum_disc_price": pc.round(batch["sum_disc_price"], ndigits=2),
                "avg_qty": pc.round(pc.divide(batch["sum_qty"], n), ndigits=4),
                "avg_disc": pc.round(pc.divide(batch["sum_disc"], n), ndigits=4),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(sum(l_quantity) / count(*), 4)               AS avg_qty,
       round(sum(l_discount) / count(*), 4)               AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# 2. event_type_index — A1: the name-index build shape
#    groupby(user, type).sum with per-batch combiner
# --------------------------------------------------------------------------


def q_event_type_index(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    out = ops.partial_groupby_sum(
        ds, ["user_id", "event_type"], sums={"value": "total_value"}, count_as="freq"
    )
    return _round_cols(out, {"total_value": 2})


SQL_EVENT_TYPE_INDEX = """
SELECT user_id, event_type, round(sum(value), 2) AS total_value, count(*) AS freq
FROM events GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------------
# 3. latest_event — A2: latest-wins dedup (max by (ts, id) per user)
# --------------------------------------------------------------------------


def q_latest_event(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "value", "ts"])
    return ops.latest_by(ds, "user_id", ["ts", "event_id"])


SQL_LATEST_EVENT = """
SELECT user_id, event_id, event_type, value, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# 4. source_text_concat — A3/A4: ordered per-key text concatenation
# --------------------------------------------------------------------------


def q_source_text_concat(sf_dir: str):
    ds = _read(sf_dir, "documents", ["source", "doc_id", "text"])
    return ops.concat_per_group(
        ds, "source", "text", "joined_text", sep="\n", order=["doc_id"],
        count_as="n_docs",
    )


SQL_SOURCE_TEXT_CONCAT = """
SELECT source, string_agg(text, chr(10) ORDER BY doc_id) AS joined_text,
       count(*) AS n_docs
FROM documents GROUP BY source
"""


# --------------------------------------------------------------------------
# 5/6. edge_weights + edge_normalize — A5/A6: social-graph aggregation
# --------------------------------------------------------------------------


def q_edge_weights(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity"])
    agg = ops.partial_groupby_sum(
        ds, ["l_suppkey", "l_partkey"], sums={"l_quantity": "weight"}
    )
    filt = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["weight"], pa.scalar(50.0))),
        batch_format="pyarrow",
    )
    return _round_cols(filt, {"weight": 2})


SQL_EDGE_WEIGHTS = """
SELECT l_suppkey, l_partkey, round(sum(l_quantity), 2) AS weight
FROM lineitem GROUP BY l_suppkey, l_partkey
HAVING sum(l_quantity) >= 50
"""


def q_edge_normalize(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity"])
    agg = ops.partial_groupby_sum(
        ds, ["l_suppkey", "l_partkey"], sums={"l_quantity": "weight"}
    )
    norm = ops.normalize_within_group(agg, "l_suppkey", "weight", "norm_w")
    return _round_cols(norm, {"weight": 2, "norm_w": 6})


SQL_EDGE_NORMALIZE = """
SELECT l_suppkey, l_partkey, round(weight, 2) AS weight,
       round(weight / sum(weight) OVER (PARTITION BY l_suppkey), 6) AS norm_w
FROM (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS weight
  FROM lineitem GROUP BY l_suppkey, l_partkey
)
"""


# --------------------------------------------------------------------------
# 7. token_freq — A8: token dictionary build (flat-map + combiner + filter)
# --------------------------------------------------------------------------


def q_token_freq(sf_dir: str):
    ds = _read(sf_dir, "documents", ["text"])

    def toks(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        return pa.table({"token": flat})

    tokens = ds.map_batches(toks, batch_format="pyarrow")
    agg = ops.partial_groupby_sum(tokens, ["token"], count_as="freq")
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["freq"], pa.scalar(5))),
        batch_format="pyarrow",
    )


SQL_TOKEN_FREQ = """
SELECT token, count(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token HAVING count(*) > 5
"""


# --------------------------------------------------------------------------
# 8. exact_dedup — §2.7: content-hash dedup, min-id representative
# --------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.exact_dedup(ds, "text", "doc_id")


SQL_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# 9. top_parts_per_order — O1/O6: per-group top-k with rank
# --------------------------------------------------------------------------


def q_top_parts_per_order(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    return ops.topk_per_group(
        ds, ["l_orderkey"], "l_extendedprice", k=3, descending=True,
        tie_break=["l_linenumber"], rank_col="rnk",
    )


SQL_TOP_PARTS_PER_ORDER = """
SELECT l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rnk
  FROM lineitem
) WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# 10. ranked_orders — O2: the RDF-export global-sort + per-subject rank
# --------------------------------------------------------------------------


def q_ranked_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def rank(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).copy()
        df["rank"] = df.groupby(keys, sort=False).cumcount() + 1
        return df

    ranked = ops.bucketed_group_apply(ds, ["o_custkey"], rank)
    # global export order (RDFExporter.java:161-180: subject ASC, score DESC)
    return ranked.sort(["o_custkey", "rank"])


SQL_RANKED_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
FROM orders ORDER BY o_custkey, rank
"""


# --------------------------------------------------------------------------
# 11. segment_revenue — J2: broadcast dimension join + grouped aggregate
# --------------------------------------------------------------------------


def q_segment_revenue(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])
    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).rename(
        columns={"c_custkey": "o_custkey"}
    )
    joined = ops.broadcast_join(orders, cust, on="o_custkey")
    agg = ops.partial_groupby_sum(
        joined, ["c_mktsegment", "o_orderstatus"],
        sums={"o_totalprice": "total_price"}, count_as="n_orders",
    )
    return _round_cols(agg, {"total_price": 2})


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment, o_orderstatus, round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
"""


# --------------------------------------------------------------------------
# 12. supplier_semi — J5/M11: broadcast semi-join filter
# --------------------------------------------------------------------------


def q_supplier_semi(sf_dir: str):
    sup = _small_pdf(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    keys = set(sup.loc[sup["s_acctbal"] > 3000, "s_suppkey"])
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    filt = ops.broadcast_semi_join(ds, keys, "l_suppkey")
    agg = ops.partial_groupby_sum(
        filt, ["l_suppkey"], sums={"l_quantity": "sum_qty"}, count_as="n"
    )
    return _round_cols(agg, {"sum_qty": 2})


SQL_SUPPLIER_SEMI = """
SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 3000)
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# 13. nation_revenue — J3: large-large hash join + broadcast dims
# --------------------------------------------------------------------------


def q_nation_revenue(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "revenue": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = ops.hash_join(li, orders, on=["o_orderkey"], num_partitions=8)

    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_nationkey"]).rename(
        columns={"c_custkey": "o_custkey"}
    )
    nation = _small_pdf(sf_dir, "nation", ["n_nationkey", "n_name"]).rename(
        columns={"n_nationkey": "c_nationkey"}
    )
    dim = cust.merge(nation, on="c_nationkey")[["o_custkey", "n_name"]]
    with_nation = ops.broadcast_join(joined, dim, on="o_custkey")
    agg = ops.partial_groupby_sum(
        with_nation, ["n_name"], sums={"revenue": "revenue"}, count_as="n_items"
    )
    return _round_cols(agg, {"revenue": 2})


SQL_NATION_REVENUE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: segment-filtered customer ⋈ date-filtered orders
    ⋈ date-filtered lineitem, revenue per order, deterministic top-10.
    Exercises: broadcast set semi-join (the BUILDING custkey set),
    predicate pushdown at the read, a large-large hash join, combiner
    groupby, and a global sort+limit on the (small) aggregate."""
    import datetime as _dt

    cutoff = _dt.datetime(1998, 6, 1)

    cust = _small_pdf(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = set(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].tolist()
    )

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def ofilt(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.less(batch["o_orderdate"], pa.scalar(cutoff))
        )

    orders = orders.map_batches(ofilt, batch_format="pyarrow")
    orders = ops.broadcast_semi_join(orders, building, "o_custkey")

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater(batch["l_shipdate"], pa.scalar(cutoff))
        )
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "revenue": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow")
    joined = ops.hash_join(li, orders, on=["o_orderkey"], num_partitions=8)
    agg = ops.partial_groupby_sum(
        joined, ["o_orderkey", "o_orderdate", "o_orderpriority"],
        sums={"revenue": "revenue"},
    )
    agg = _round_cols(agg, {"revenue": 2})

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]
        )

    agg = agg.map_batches(rename, batch_format="pyarrow")
    return agg.sort(
        ["revenue", "o_orderdate", "l_orderkey"],
        descending=[True, False, False],
    ).limit(10)


SQL_Q3_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# 14. distinct_user_events — A11: exact distinct
# --------------------------------------------------------------------------


def q_distinct_user_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return ops.distinct(ds, ["user_id", "event_type"])


SQL_DISTINCT_USER_EVENTS = """
SELECT DISTINCT user_id, event_type FROM events
"""


# --------------------------------------------------------------------------
# 15. doc_filter_stats — M4/M5 filters + text-analysis token counting
# --------------------------------------------------------------------------


def q_doc_filter_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars", "text"])

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["lang"], pa.scalar("en")),
            pc.greater(batch["n_chars"], pa.scalar(200)),
        )
        batch = batch.filter(mask)
        n_tokens = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        len_chars = pc.utf8_length(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
                "len_chars": pc.cast(len_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_DOC_FILTER_STATS = """
SELECT doc_id, lang, n_chars, length(text) AS len_chars,
       len(string_split(text, ' ')) AS n_tokens
FROM documents WHERE lang = 'en' AND n_chars > 200
"""


# --------------------------------------------------------------------------
# 16. hourly_user_windows — tumbling event-time window aggregate
# --------------------------------------------------------------------------


def q_hourly_user_windows(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = ops.tumbling_window_agg(
        ds, "user_id", "ts", "hour", sums={"value": "total_value"}, count_as="n"
    )
    return _round_cols(out, {"total_value": 2})


SQL_HOURLY_USER_WINDOWS = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# --------------------------------------------------------------------------
# 17. props_k_buckets — S2: JSON side-channel parse + grouped aggregate
# --------------------------------------------------------------------------


def q_props_k_buckets(sf_dir: str):
    ds = _read(sf_dir, "events", ["props", "value"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = [json.loads(s)["k"] for s in batch["props"].to_pylist()]
        return pa.table(
            {
                "k_bucket": pa.array([k % 10 for k in ks], type=pa.int64()),
                "value": batch["value"],
            }
        )

    parsed = ds.map_batches(parse, batch_format="pyarrow")
    agg = ops.partial_groupby_sum(
        parsed, ["k_bucket"], sums={"value": "total_value"}, count_as="n"
    )
    return _round_cols(agg, {"total_value": 2})


SQL_PROPS_K_BUCKETS = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# 18. ann_topk — exact cosine top-10 for query vectors (vec_id < 5)
# --------------------------------------------------------------------------


def q_ann_topk(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 5].rename(columns={"vec_id": "query_id"})
    return ann.ann_brute_force(ds, qdf, k=10, round_decimals=5)


# DuckDB's list_cosine_similarity computes in float32; CAST to DOUBLE and
# rank by the ROUNDED value on both sides so fp noise cannot flip order.
SQL_ANN_TOPK = """
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id,
         round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 5)
           AS cos_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 5) DESC,
                    e.vec_id ASC) AS rank
  FROM embeddings e
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
  WHERE e.vec_id <> q.vec_id
) WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# 19. ngram_jaccard_pairs — exact all-pairs near-dup baseline
# --------------------------------------------------------------------------


def q_ngram_jaccard_pairs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.8, k=3)
    return _round_cols(out, {"jaccard": 6})


SQL_NGRAM_JACCARD_PAIRS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN list_distinct([array_to_string(t, ' ')])
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
), ex AS (SELECT doc_id, unnest(s) AS g FROM sh
), cand AS (
  -- EXACT prefilter: J >= t > 0 requires at least one shared shingle,
  -- so candidates from the exploded-shingle equality join lose nothing
  -- (the all-pairs cross join is O(n^2) list_intersects and took 388 s
  -- at sf0.1; this form verifies identical output in 62 s)
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
)
SELECT a, b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.a, c.b,
         len(list_intersect(xa.s, xb.s))::DOUBLE
           / (len(xa.s) + len(xb.s) - len(list_intersect(xa.s, xb.s))) AS jaccard
  FROM cand c JOIN sh xa ON c.a = xa.doc_id JOIN sh xb ON c.b = xb.doc_id
) WHERE jaccard >= 0.8
"""


# --------------------------------------------------------------------------
# 19b. allpairs_jaccard — exact prefix-filtering all-pairs similarity join
# --------------------------------------------------------------------------


def q_allpairs_jaccard(sf_dir: str):
    """EXACT all-pairs Jaccard via prefix filtering (AllPairs WWW'07 +
    PPJoin length filter) — same semantics as the brute baseline but
    candidates come from a rarest-first prefix-token exchange instead
    of O(n²) streaming; verification reuses the co-partitioned
    two-hop verify exchange. Threshold 0.6 (lower than the brute
    query's 0.8) so the check exercises non-identical near-pairs."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.allpairs_jaccard_pairs(ds, "text", "doc_id", threshold=0.6, k=3)
    return _round_cols(out, {"jaccard": 6})


SQL_ALLPAIRS_JACCARD = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN list_distinct([array_to_string(t, ' ')])
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
), ex AS (SELECT doc_id, unnest(s) AS g FROM sh
), cand AS (
  -- EXACT prefilter: J >= t > 0 requires at least one shared shingle,
  -- so candidates from the exploded-shingle equality join lose nothing
  -- (the all-pairs cross join is O(n^2) list_intersects and took 388 s
  -- at sf0.1; this form verifies identical output in 62 s)
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
)
SELECT a, b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.a, c.b,
         len(list_intersect(xa.s, xb.s))::DOUBLE
           / (len(xa.s) + len(xb.s) - len(list_intersect(xa.s, xb.s))) AS jaccard
  FROM cand c JOIN sh xa ON c.a = xa.doc_id JOIN sh xb ON c.b = xb.doc_id
) WHERE jaccard >= 0.6
"""


# --------------------------------------------------------------------------
# 20. embedding_dup_pairs — embedding-cosine near-dup
# --------------------------------------------------------------------------

# testdata embeddings are random (max cross-cos ~0.51) — the threshold is
# set low so the check exercises non-empty results; fixture tests plant
# real near-dup vectors.
EMB_DUP_THRESHOLD = 0.42


def q_embedding_dup_pairs(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_dup_pairs(ds, "embedding", "vec_id", EMB_DUP_THRESHOLD)
    return _round_cols(out, {"cos_sim": 5})


SQL_EMBEDDING_DUP_PAIRS = f"""
SELECT a, b, round(CAST(cos_sim AS DOUBLE), 5) AS cos_sim FROM (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                CAST(y.embedding AS DOUBLE[])) AS cos_sim
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
) WHERE cos_sim >= {EMB_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# 21/22. minhash / simhash near-dedup — probabilistic: rows-only checks
# --------------------------------------------------------------------------


def q_embedding_blocked_dup_pairs(sf_dir: str):
    """Blocked embedding near-dup at its EXACT LIMIT (n_centroids=1,
    float64 vectors through the exchange): the candidate set is
    complete, so the output must equal SQL_EMBEDDING_DUP_PAIRS exactly
    — the same code path the pruned config runs, driven through the
    one configuration a SQL oracle can check (round-4 verdict item 9).
    The pruned recall<1 config stays in the catalog as
    ``embedding_blocked_pruned_dup_pairs`` (rows-only) and keeps its
    planted-near-dup recall pytest."""
    import numpy as np

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_blocked_dup_pairs(
        ds, "embedding", "vec_id", EMB_DUP_THRESHOLD,
        n_centroids=1, n_probe=1, vec_dtype=np.float64,
    )
    return _round_cols(out, {"cos_sim": 5})


def q_embedding_blocked_pruned_dup_pairs(sf_dir: str):
    """Scale path of embedding_dup_pairs: centroid-blocked candidate
    generation + fused exact-cosine verify (probabilistic recall —
    rows-only check; pytest plants near-dups and checks recall vs the
    exact baseline)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_blocked_dup_pairs(
        ds, "embedding", "vec_id", EMB_DUP_THRESHOLD
    )
    return _round_cols(out, {"cos_sim": 5})


def q_embedding_tiled_dup_pairs(sf_dir: str):
    """EXACT distributed all-pairs cosine join: normalized blocks +
    B(B+1)/2 block-pair tile tasks — no whole-corpus collect or
    broadcast (the brute baseline's guarded pattern), exact values
    (oracle shared with embedding_dup_pairs). The honest middle path:
    LSH blocking when recall<1 is acceptable, tiles when exactness is
    required and n² compute is still affordable."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_dup_pairs_tiled(
        ds, "embedding", "vec_id", EMB_DUP_THRESHOLD
    )
    return _round_cols(out, {"cos_sim": 5})


def q_minhash_clusters(sf_dir: str):
    """MinHash-LSH near-dedup clusters. Oracle-checked (round-3
    verdict item 5): the oracle computes TRUE exact-Jaccard>=0.8 pairs
    and their connected components with a recursive CTE; the engine's
    LSH candidates are exact-verified, so its edge set is a SUBSET of
    the oracle's with per-pair recall 1-(1-0.8^4)^32 ≈ 1-3e-13 at the
    threshold — equality holds unless LSH (deterministic, fixed hash
    key) misses a true pair on this fixed corpus, which
    tools/check_oracle confirms it does not at every sf."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.minhash_dedup_clusters(ds, "text", "doc_id", threshold=0.8)


SQL_MINHASH_CLUSTERS = """
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN list_distinct([array_to_string(t, ' ')])
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
), ex AS (SELECT doc_id, unnest(s) AS g FROM sh
), cand AS (
  -- EXACT prefilter (see SQL_NGRAM_JACCARD_PAIRS): J >= 0.8 needs a
  -- shared shingle, so candidates come from the shingle equality join
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
), e AS (
  SELECT a, b FROM (
    SELECT c.a, c.b,
           len(list_intersect(xa.s, xb.s))::DOUBLE
             / (len(xa.s) + len(xb.s) - len(list_intersect(xa.s, xb.s))) AS j
    FROM cand c JOIN sh xa ON c.a = xa.doc_id JOIN sh xb ON c.b = xb.doc_id
  ) WHERE j >= 0.8
), sym AS (
  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
), reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, s.v FROM reach r JOIN sym s ON s.u = r.dst
)
SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src
"""


def q_simhash_dup_pairs(sf_dir: str):
    """SimHash near-dup pairs — EXACTLY oracle-checked (round-4 verdict
    item 2): the token hash is FNV-1a over Unicode code points
    (functions/minhash.py fnv1a64_codepoints), a published recurrence
    DuckDB replays verbatim with list_reduce, so the oracle recomputes
    the very same 64-bit fingerprints in SQL and applies the same
    pigeonhole chunk prefilter + bit_count(xor) Hamming verify."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_dup_pairs(ds, "text", "doc_id", max_hamming=3)


# Exact SQL replay of the SimHash kernel. Stage by stage:
#   tok     distinct whitespace tokens per doc (Python str.split set
#           semantics; testdata text is single-space separated)
#   th      FNV-1a 64 over code points, mod-2^64 HUGEINT arithmetic
#   pw      2^b powers (recursive doubling; ** would go through DOUBLE)
#   docbits per (doc, bit) sign sum: +1 when the token hash has the
#           bit set, -1 otherwise  -> bit set in fingerprint iff sum>0
#   fp      64-bit fingerprint; docs with no tokens hash to 0
#   cand    pigeonhole prefilter: hamming<=3 pairs differ in <=3 of
#           the 4 16-bit chunks, so they share >=1 aligned chunk —
#           identical to the engine's bucket exchange
#   final   exact Hamming via bit_count(xor), threshold 3
SQL_SIMHASH_DUP_PAIRS = """
WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
  FROM documents
), h AS (
  SELECT t,
         list_reduce(
           list_prepend(CAST(14695981039346656037 AS HUGEINT),
             list_transform(range(1, length(t) + 1),
                            i -> CAST(unicode(t[i]) AS HUGEINT))),
           (acc, c) -> (xor(acc, c) * 1099511628211)
                       % 18446744073709551616
         ) AS th
  FROM (SELECT DISTINCT t FROM tok WHERE t <> '')
), pw AS (
  SELECT 0 AS b, CAST(1 AS HUGEINT) AS p
  UNION ALL SELECT b + 1, p * 2 FROM pw WHERE b < 63
), docbits AS (
  SELECT tok.doc_id, pw.b,
         SUM(CASE WHEN (h.th // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS s,
         any_value(pw.p) AS p
  FROM tok JOIN h USING (t) CROSS JOIN pw
  GROUP BY tok.doc_id, pw.b
), fp0 AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS fp
  FROM docbits GROUP BY doc_id
), fp AS (
  SELECT d.doc_id, COALESCE(f.fp, CAST(0 AS HUGEINT)) AS fp
  FROM documents d LEFT JOIN fp0 f USING (doc_id)
), chunks AS (
  SELECT doc_id, cj.j, (fp // cj.cp) % 65536 AS ck
  FROM fp CROSS JOIN (VALUES
    (0, CAST(1 AS HUGEINT)), (1, CAST(65536 AS HUGEINT)),
    (2, CAST(4294967296 AS HUGEINT)),
    (3, CAST(281474976710656 AS HUGEINT))) AS cj(j, cp)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y
    ON x.j = y.j AND x.ck = y.ck AND x.doc_id < y.doc_id
)
SELECT c.a, c.b,
       CAST(bit_count(xor(fa.fp, fb.fp)) AS BIGINT) AS hamming
FROM cand c
JOIN fp fa ON c.a = fa.doc_id
JOIN fp fb ON c.b = fb.doc_id
WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
"""


# --------------------------------------------------------------------------
# 23. doc_language_quality — heuristic text analysis (rows-only)
# --------------------------------------------------------------------------


def q_doc_language_quality(sf_dir: str):
    from .functions.textstats import bpe_ish_token_count, detect_language, quality_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = [detect_language(t) for t in texts]
        quals = np.asarray(
            [quality_features(t)["quality"] for t in texts], dtype=np.float64
        )
        bpe = [bpe_ish_token_count(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs),
                # half-away-from-zero like DuckDB round() (quality is
                # non-negative, so floor(x*1e5+0.5) suffices)
                "quality": pa.array(np.floor(quals * 1e5 + 0.5) / 1e5),
                "bpe_tokens": pa.array(bpe, type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# Full SQL port of the rule kernel (round-3 verdict item 5): profiles /
# stopword list / composite formula mirror functions/textstats.py term
# for term; \w and \s agree between RE2 and Python re on the ASCII
# corpus; lang tie-break = first max in profile order (en,de,fr,es).
_LANGQ_EN = "'the','and','of','to','in','is','you','that','it','for','was','with','are','be','this','have','from'"
_LANGQ_DE = "'der','die','und','das','ist','du','ich','nicht','sie','es','ein','mit','für','auf','den','von'"
_LANGQ_FR = "'le','la','et','les','des','est','vous','que','il','pour','pas','avec','une','sur','dans','du','je'"
_LANGQ_ES = "'el','la','de','que','y','en','los','se','del','las','un','por','con','una','para','es','no'"
_LANGQ_STOP = (
    "'the','a','an','and','or','of','to','in','is','are','was','were','be',"
    "'been','it','this','that','for','on','with','as','at','by','from',"
    "'not','have','has','had','but','they','you','we','he','she','i'"
)

SQL_DOC_LANGUAGE_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ltoks,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tokens,
         length(text) AS n_chars,
         CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE
           len(list_filter(ltoks, x -> x IN ({_LANGQ_EN})))::DOUBLE / len(ltoks) END AS s_en,
         CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE
           len(list_filter(ltoks, x -> x IN ({_LANGQ_DE})))::DOUBLE / len(ltoks) END AS s_de,
         CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE
           len(list_filter(ltoks, x -> x IN ({_LANGQ_FR})))::DOUBLE / len(ltoks) END AS s_fr,
         CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE
           len(list_filter(ltoks, x -> x IN ({_LANGQ_ES})))::DOUBLE / len(ltoks) END AS s_es,
         CASE WHEN len(toks) = 0 THEN 0.0 ELSE
           len(list_filter(toks, x -> lower(x) IN ({_LANGQ_STOP})))::DOUBLE / len(toks) END AS stop_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0 ELSE
           list_aggregate(list_transform(toks, x -> length(x)), 'avg') END AS mean_wl,
         CASE WHEN length(text) = 0 THEN 0.0 ELSE
           length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE / length(text) END AS punct_ratio,
         CASE WHEN length(text) = 0 THEN 0.0 ELSE
           length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / length(text) END AS upper_ratio
  FROM t
)
SELECT doc_id,
  CASE WHEN n_tokens = 0 OR greatest(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'und'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS lang_pred,
  CASE WHEN n_chars = 0 THEN 0.0 ELSE
    round(greatest(0.0, least(1.0,
      0.5 * least(stop_ratio * 4, 1.0)
      + 0.5 * (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END)
      - punct_ratio
      - greatest(0.0, upper_ratio - 0.3))), 5) END AS quality,
  len(regexp_extract_all(text, '[\\w'']+|[^\\w\\s]'))::BIGINT AS bpe_tokens
FROM s
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition filters (published heuristics): per-doc
    duplicate-line fraction and duplicate-line character fraction. The
    SQL-expressible subset of ``textstats.repetition_signals`` (the
    top-n-gram fractions are covered by pytest goldens instead)."""
    from .functions.textstats import repetition_signals

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _r5(vals) -> pa.Array:
        # DuckDB round() is half-away-from-zero; np/pyarrow default to
        # half-to-even — ratios of small ints hit exact .5 ties at 5dp
        return pc.round(
            pa.array(vals, type=pa.float64()),
            ndigits=5,
            round_mode="half_towards_infinity",
        )

    def f(batch: pa.Table) -> pa.Table:
        sigs = [repetition_signals(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(
                    [int(s["n_lines"]) for s in sigs], type=pa.int64()
                ),
                "dup_line_frac": _r5([s["dup_line_frac"] for s in sigs]),
                "dup_line_char_frac": _r5(
                    [s["dup_line_char_frac"] for s in sigs]
                ),
                "n_words": pa.array(
                    [int(s["n_words"]) for s in sigs], type=pa.int64()
                ),
                "dup_word_frac": _r5([s["dup_word_frac"] for s in sigs]),
                "dup_word_char_frac": _r5(
                    [s["dup_word_char_frac"] for s in sigs]
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_DOC_REPETITION = r"""
WITH lc AS (
  SELECT doc_id, line, count(*) AS c, len(line) AS ll
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents)
  GROUP BY doc_id, line
), lagg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_lines,
         round(1.0 - count(*) * 1.0 / sum(c), 5) AS dup_line_frac,
         round(COALESCE(sum(CASE WHEN c > 1 THEN (c - 1) * ll ELSE 0 END)
                        * 1.0 / NULLIF(sum(c * ll), 0), 0), 5)
           AS dup_line_char_frac
  FROM lc GROUP BY doc_id
), wc AS (
  SELECT doc_id, w, count(*) AS c, len(w) AS wl
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY doc_id, w
), wagg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         round(1.0 - count(*) * 1.0 / sum(c), 5) AS dup_word_frac,
         round(COALESCE(sum(CASE WHEN c > 1 THEN (c - 1) * wl ELSE 0 END)
                        * 1.0 / NULLIF(sum(c * wl), 0), 0), 5)
           AS dup_word_char_frac
  FROM wc GROUP BY doc_id
)
SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
       COALESCE(w.n_words, 0) AS n_words,
       COALESCE(w.dup_word_frac, 0.0) AS dup_word_frac,
       COALESCE(w.dup_word_char_frac, 0.0) AS dup_word_char_frac
FROM lagg l LEFT JOIN wagg w USING (doc_id)
"""


def q_wemb_embed(sf_dir: str):
    """Trained word-embedding document vectors (counts->SVD embedding,
    Levy & Goldberg 2014 view of word2vec; PAI18 subspace shape): train
    the co-occurrence factorization over the documents table, then
    project every document — L2-normalized log2(1+tf)-weighted mean
    word vector, the exact kernel the flagship's wemb subspace uses.
    Rows-only (randomized-SVD model; exactness pinned by
    ``tests/test_wordemb.py`` dense-reference + determinism tests).
    Output (doc_id, wemb list<float>, wemb_norm)."""
    from .pipelines.wordemb import (
        _model_arrays,
        project_texts,
        train_word_embeddings,
    )

    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = train_word_embeddings(ds, text_col="text", dim=16)
    mref = ray.put(model)

    def proj(batch: pa.Table) -> pa.Table:
        tok2row, W = _model_arrays(ops.cached_get(mref))
        texts = [str(t) for t in batch["text"].to_pylist()]
        vecs = project_texts(texts, tok2row, W)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "wemb": pa.array(
                    list(np.round(vecs, 5).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
                "wemb_norm": pa.array(
                    np.where(norms > 0, 1.0, 0.0), pa.float64()
                ),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def q_substring_cut(sf_dir: str):
    """ExactSubstr cut step (Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): detected duplicate spans are
    spliced out of the higher-id doc, keeping the lowest-id occurrence.
    Output (doc_id, text, cut_tokens) for every document, cut or not.
    Rows-only (span detection uses the custom 64-bit rolling hash);
    exactness pinned by ``tests/test_substring_dedup.py`` (maximality,
    all-but-first removal, cross-scale stability)."""
    from .stages.dedup import substring_dedup_cut

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return substring_dedup_cut(ds, "text", "doc_id", min_tokens=24, k=8)


# Oracle (round-3 verdict item 5): recompute all maximal shared runs
# >= 24 (same gaps-and-islands construction as SQL_SUBSTRING_DUP_SPANS),
# merge overlapping/adjacent cut ranges per higher-id doc with a
# running-max window, and rebuild each cut doc as the space-joined kept
# tokens; uncut docs keep their original byte-exact text.
def _substring_runs_sql(L: int) -> str:
    """Shared CTE chain for the ExactSubstr oracles: maximal shared
    token runs >= L via an L-GRAM equality join + diagonal
    gaps-and-islands. A shared run of length R >= L contains exactly
    R-L+1 consecutive L-gram matches on one (pair, diagonal), so runs
    reconstruct EXACTLY as count+L-1 — same result as the token-level
    self-join, but matches only arise from true repeats: the
    token-level form materialized 1.2 BILLION match rows at sf0.1
    (common words collide everywhere) and spilled DuckDB past 80 GB;
    this form joins a few hundred gram collisions."""
    return f"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(len(t) - {L - 1}),
                               i -> array_to_string(t[i + 1 : i + {L}], ' '))) AS gram,
         unnest(range(len(t) - {L - 1})) AS pos
  FROM toks WHERE len(t) >= {L}
), m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS i, b.pos AS j, a.pos - b.pos AS d
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, d, i, j,
         i - row_number() OVER (PARTITION BY doc_a, doc_b, d ORDER BY i) AS grp
  FROM m
), runs AS (
  SELECT doc_a, doc_b, CAST(min(i) AS BIGINT) AS a_start,
         CAST(min(j) AS BIGINT) AS b_start,
         CAST(count(*) + {L - 1} AS BIGINT) AS span_len
  FROM isl GROUP BY doc_a, doc_b, d, grp
)"""


SQL_SUBSTRING_CUT = _substring_runs_sql(24) + """
, tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS pos FROM toks
), cuts AS (
  SELECT doc_b AS doc_id, b_start AS st, b_start + span_len AS en
  FROM runs WHERE span_len >= 24
), c1 AS (
  SELECT doc_id, st, en,
         max(en) OVER (PARTITION BY doc_id ORDER BY st, en
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM cuts
), c2 AS (
  SELECT doc_id, st, en,
         sum(CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY st, en) AS grp
  FROM c1
), merged AS (
  SELECT doc_id, min(st) AS st, max(en) AS en FROM c2 GROUP BY doc_id, grp
), cutdocs AS (SELECT DISTINCT doc_id FROM merged
), kept AS (
  -- reconstruct ONLY docs that have cuts (uncut docs pass through
  -- their original text below)
  SELECT t.doc_id, t.w, t.pos
  FROM tok t
  JOIN cutdocs cd ON t.doc_id = cd.doc_id
  LEFT JOIN merged mm
    ON t.doc_id = mm.doc_id AND t.pos >= mm.st AND t.pos < mm.en
  WHERE mm.doc_id IS NULL
), kj AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS ktext,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN c.doc_id IS NULL THEN d.text
            ELSE coalesce(k.ktext, '') END AS text,
       CAST(CASE WHEN c.doc_id IS NULL THEN 0
            ELSE len(d.t) - coalesce(k.n_kept, 0) END AS BIGINT) AS cut_tokens
FROM toks d
LEFT JOIN cutdocs c ON d.doc_id = c.doc_id
LEFT JOIN kj k ON d.doc_id = k.doc_id
"""


def q_pagerank_supply(sf_dir: str):
    """Distributed PageRank over the supplier -> part supply graph
    (part node ids offset by 10^6 to keep the two key spaces disjoint;
    parts have no out-edges, so the dangling-mass redistribution path
    is live). Oracle-checked: recursive CTEs disallow grouped
    aggregation per round, so the fixed 8 iterations are UNROLLED into
    generated CTEs (``_pagerank_sql``); exactness is additionally
    pinned by ``tests/test_pagerank.py`` against a dense
    single-machine reference (atol 1e-12) plus repartition
    determinism."""
    from .pipelines.graph import pagerank

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = ds.map_batches(
        lambda t: pa.table(
            {
                "src": t["l_suppkey"],
                "dst": pc.add(pc.cast(t["l_partkey"], pa.int64()),
                              pa.scalar(1_000_000, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    out = pagerank(edges, "src", "dst", damping=0.85, iters=8)
    return _round_cols(out, {"rank": 9})


def _pagerank_sql(iters: int = 8, damping: float = 0.85) -> str:
    """EXACT DuckDB oracle for q_pagerank_supply (round-3 verdict item
    5 discipline): recursive CTEs disallow grouped aggregation per
    round, so the FIXED iteration count is UNROLLED — one generated
    (contrib, scattered, rank) CTE triple per iteration, reproducing
    the engine's dangling-mass redistribution term for term. Engine
    and oracle differ only in float summation order (~1e-16 relative);
    both round half-away to 9 decimals before comparison."""
    d = damping
    parts = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src, "
        "CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od "
        "FROM e GROUP BY src),",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        parts.append(
            f", c{i} AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank / o.od) AS c "
            f"FROM e JOIN {prev} r ON e.src = r.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        parts.append(
            f", s{i} AS MATERIALIZED (SELECT coalesce(sum(c), 0.0) AS s FROM c{i})"
        )
        parts.append(
            f", r{i} AS MATERIALIZED (SELECT nodes.node, "
            f"(1.0 - {d}) / (SELECT n FROM nn) "
            f"+ {d} * greatest(0.0, 1.0 - (SELECT s FROM s{i})) "
            f"/ (SELECT n FROM nn) "
            f"+ {d} * coalesce(c{i}.c, 0.0) AS rank "
            f"FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    parts.append(
        f" SELECT node, round(rank, 9) AS rank FROM r{iters}"
    )
    return "\n".join(parts)


SQL_PAGERANK_SUPPLY = _pagerank_sql(iters=8, damping=0.85)


def q_ppr_supply(sf_dir: str):
    """PERSONALIZED PageRank / random-walk-with-restart over the same
    supplier -> part supply graph, teleporting to the suppliers of
    nation 0 (the "how close is every entity to the gold set" ranking
    of the north star's canonicalization stage, seeded analogue of
    pagerank_supply). Oracle: the same unrolled-CTE construction with
    the teleport base restricted to the seed set."""
    from .pipelines.graph import pagerank

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = ds.map_batches(
        lambda t: pa.table(
            {
                "src": t["l_suppkey"],
                "dst": pc.add(pc.cast(t["l_partkey"], pa.int64()),
                              pa.scalar(1_000_000, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    def seed_batch(t: pa.Table) -> pa.Table:
        k = pc.cast(t["s_suppkey"], pa.int64())
        mod5 = pc.subtract(
            k, pc.multiply(pc.divide(k, pa.scalar(5, pa.int64())),
                           pa.scalar(5, pa.int64()))
        )
        return pa.table(
            {"node": k.filter(pc.equal(mod5, pa.scalar(0, pa.int64())))}
        )

    seeds = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        seed_batch, batch_format="pyarrow"
    )
    out = pagerank(edges, "src", "dst", damping=0.85, iters=8, seeds=seeds)
    return _round_cols(out, {"rank": 9})


def _ppr_sql(iters: int = 8, damping: float = 0.85) -> str:
    """Unrolled-CTE oracle for q_ppr_supply: identical to
    ``_pagerank_sql`` except init and the per-iteration base follow the
    SEED teleport distribution (1/|S| on nation-0 suppliers, 0
    elsewhere; dangling mass returns to the seeds)."""
    d = damping
    parts = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src, "
        "CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "seeds AS MATERIALIZED (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS node "
        "FROM supplier WHERE s_suppkey % 5 = 0),",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),",
        "outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od "
        "FROM e GROUP BY src),",
        "r0 AS MATERIALIZED (SELECT n.node, CASE WHEN sd.node IS NULL THEN 0.0 "
        "ELSE 1.0 / (SELECT n FROM ns) END AS rank "
        "FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node)",
    ]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        parts.append(
            f", c{i} AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank / o.od) AS c "
            f"FROM e JOIN {prev} r ON e.src = r.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        parts.append(
            f", s{i} AS MATERIALIZED (SELECT coalesce(sum(c), 0.0) AS s FROM c{i})"
        )
        parts.append(
            f", r{i} AS MATERIALIZED (SELECT nodes.node, "
            f"CASE WHEN sd.node IS NULL THEN 0.0 ELSE "
            f"(1.0 - {d}) / (SELECT n FROM ns) "
            f"+ {d} * greatest(0.0, 1.0 - (SELECT s FROM s{i})) "
            f"/ (SELECT n FROM ns) END "
            f"+ {d} * coalesce(c{i}.c, 0.0) AS rank "
            f"FROM nodes LEFT JOIN seeds sd ON nodes.node = sd.node "
            f"LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    parts.append(
        f" SELECT node, round(rank, 9) AS rank FROM r{iters}"
    )
    return "\n".join(parts)


SQL_PPR_SUPPLY = _ppr_sql(iters=8, damping=0.85)


def q_graph_components(sf_dir: str):
    """Distributed connected components (pointer-jumping min-label
    propagation, ``dedup.connected_components``) exposed standalone —
    the canonicalization merge step of the north star ("union-find
    connected components to merge coreferent entities"; reference:
    the transitive alignment closure over SocialLink's per-entity
    candidate links). Graph: the part <-> supplier co-supply graph
    thinned to l_quantity <= 2 lines (~4% of lineitem), supplier ids
    offset by 10^6 to keep the key spaces disjoint; thinning keeps it
    multi-component and multi-hop at every sf. Exact DuckDB oracle:
    recursive-CTE reachability closure + min-label per node (feasible
    at oracle scale; the Ray path is the O(log n)-round distributed
    one)."""
    from .stages.dedup import connected_components

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def edges(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["l_quantity"], pa.scalar(2))
        t = t.filter(keep)
        return pa.table(
            {
                "a": pc.cast(t["l_partkey"], pa.int64()),
                "b": pc.add(pc.cast(t["l_suppkey"], pa.int64()),
                            pa.scalar(1_000_000, pa.int64())),
            }
        )

    comp = connected_components(
        ds.map_batches(edges, batch_format="pyarrow"), "a", "b"
    )
    return comp


SQL_GRAPH_COMPONENTS = """
WITH RECURSIVE eb AS (
    SELECT DISTINCT CAST(l_partkey AS BIGINT) AS a,
           CAST(l_suppkey AS BIGINT) + 1000000 AS b
    FROM lineitem WHERE l_quantity <= 2
),
edges AS (SELECT a, b FROM eb UNION SELECT b AS a, a AS b FROM eb),
reach(node, r) AS (
    SELECT a AS node, a AS r FROM edges
    UNION
    SELECT e.a AS node, reach.r
    FROM edges e JOIN reach ON reach.node = e.b
)
SELECT node, MIN(r) AS label FROM reach GROUP BY node
"""


def q_graph_hops(sf_dir: str):
    """Distributed multi-source BFS (`graph.bfs_hops`): exact min hop
    distance from the seed set {part nodes <= 10} over the same
    thinned part<->supplier co-supply graph as ``graph_components``.
    O(diameter) exchange rounds over the reached set only; exact
    DuckDB oracle via a depth-bounded recursive CTE + MIN(d)."""
    from .pipelines.graph import bfs_hops

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_quantity"], pa.scalar(2)))
        return pa.table(
            {
                "a": pc.cast(t["l_partkey"], pa.int64()),
                "b": pc.add(pc.cast(t["l_suppkey"], pa.int64()),
                            pa.scalar(1_000_000, pa.int64())),
            }
        )

    e = ds.map_batches(edges, batch_format="pyarrow")
    seeds = ops.distinct(
        e.map_batches(
            lambda t: pa.table(
                {"node": t.filter(pc.less_equal(t["a"], pa.scalar(10)))["a"]}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
    )
    return bfs_hops(e, seeds, "a", "b", max_hops=20)


SQL_GRAPH_HOPS = """
WITH RECURSIVE eb AS (
    SELECT DISTINCT CAST(l_partkey AS BIGINT) AS a,
           CAST(l_suppkey AS BIGINT) + 1000000 AS b
    FROM lineitem WHERE l_quantity <= 2
),
edges AS (SELECT a, b FROM eb UNION SELECT b AS a, a AS b FROM eb),
reach(node, d) AS (
    SELECT DISTINCT a AS node, 0 AS d FROM eb WHERE a <= 10
    UNION
    SELECT e.b AS node, reach.d + 1
    FROM edges e JOIN reach ON reach.node = e.a
    WHERE reach.d < 20
)
SELECT node, MIN(d) AS d FROM reach GROUP BY node
"""


def q_rollup_revenue(sf_dir: str):
    """SQL GROUP BY ROLLUP: per-(returnflag, linestatus) revenue plus
    the per-returnflag and grand-total levels, rolled keys NULL. One
    corpus scan — coarser levels re-aggregate the finest (dimension-
    sized) result, not the input (`ops.rollup_sum`)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_extendedprice"])
    out = ops.rollup_sum(
        ds, ["l_returnflag", "l_linestatus"],
        sums={"l_extendedprice": "revenue"}, count_as="n",
    )
    return _round_cols(out, {"revenue": 2})


SQL_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_price_quantiles_exact(sf_dir: str):
    """EXACT per-group percentile_cont quantiles (linear interpolation,
    `ops.grouped_quantiles_exact`): groups co-locate on the hash
    exchange, each group's values quantile inside one reduce. The
    corpus-wide scale path is the mergeable t-digest
    (`approx_price_quantiles`); this is the exact per-group analytics
    complement."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    return ops.grouped_quantiles_exact(
        ds, ["l_returnflag"], "l_extendedprice",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99}, round_decimals=2,
    )


SQL_PRICE_QUANTILES_EXACT = """
SELECT l_returnflag,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p90,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p99
FROM lineitem GROUP BY l_returnflag
"""


def q_bpe_token_counts(sf_dir: str):
    """Trained-BPE tokenization (Sennrich et al. 2016): distributed
    word-histogram pass -> merge-rule training over the
    vocabulary-sized histogram on the driver (the standard scale split
    every production tokenizer trainer uses) -> actor-pool encode with
    the merge table broadcast once and per-actor word memoization.
    Output (doc_id, n_bpe_tokens). Rows-only (iterative training is
    not SQL-expressible); exactness pinned by ``tests/test_bpe.py``
    against a naive full-recount reference."""
    from .stages.bpe import bpe_token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out, _ = bpe_token_counts(ds, "text", "doc_id", num_merges=64)
    return out


def q_doc_fingerprints(sf_dir: str):
    """Per-document winnowing fingerprints (Schleimer et al., SIGMOD
    2003 — the min-in-window scheme with the coverage guarantee): one
    row per selected anchor (doc_id, token_pos, fp). Pure map — the
    vectorized batch kernel (``winnow_anchors``: one factorize + one
    polynomial pass per batch) runs embarrassingly parallel, no
    shuffle. EXACTLY oracle-checked (round-5): the token hash is
    FNV-1a over code points and the k-gram fold / leftmost-arg-min
    winnowing are plain modular arithmetic + window aggregation, so
    SQL_DOC_FINGERPRINTS replays the whole kernel; pytest additionally
    pins the per-doc brute-force reference and the planted shared-run
    coverage guarantee."""
    from .functions.minhash import winnow_anchors

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        di, pos, fp = winnow_anchors(texts, k=8, min_tokens=40)
        return pa.table(
            {
                "doc_id": pa.array(ids[di], type=pa.int64()),
                "token_pos": pa.array(pos, type=pa.int64()),
                # int64 view of the uint64 fingerprint: parquet/DuckDB
                # round-trip safe, order-stable for the compare sort
                "fp": pa.array(fp.view(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# Exact SQL replay of winnow_anchors (k=8, min_tokens=40, window
# w=33). Stage by stage:
#   toks   per-doc token array; docs under 40 tokens select nothing
#   h      FNV-1a 64 per DISTINCT token (same kernel as SimHash's)
#   arr    per-doc token-hash array in position order
#   wh     k-gram window hash at 0-based position q: fold
#          acc = (acc XOR th) * 0x9E3779B97F4A7C15 mod 2^64 from acc=0
#   winner per sliding window of 33 consecutive q's, the LEFTMOST
#          minimum — lexicographic (h, q) via arg_min on h*2^20 + q
#   final  distinct selected positions; fp emitted as the int64 VIEW
#          of the uint64 hash (value - 2^64 when >= 2^63), matching
#          the engine's parquet-safe column
SQL_DOC_FINGERPRINTS = """
WITH toks AS (
  -- whitespace-robust tokenizer matching Python str.split(): split on
  -- runs of any whitespace, drop empties (string_split(' ') would
  -- keep ''-tokens on double spaces and shift every position)
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS l,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n
  FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '')) >= 40
), tok AS (
  SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS p FROM toks
), h AS (
  SELECT t,
         list_reduce(
           list_prepend(CAST(14695981039346656037 AS HUGEINT),
             list_transform(range(1, length(t) + 1),
                            i -> CAST(unicode(t[i]) AS HUGEINT))),
           (acc, c) -> (xor(acc, c) * 1099511628211)
                       % 18446744073709551616
         ) AS th
  FROM (SELECT DISTINCT t FROM tok)
), arr AS (
  SELECT tok.doc_id, list(h.th ORDER BY tok.p) AS a, any_value(toks.n) AS n
  FROM tok JOIN h USING (t) JOIN toks USING (doc_id)
  GROUP BY tok.doc_id
), qs AS (
  SELECT doc_id, a, n, unnest(range(0, n - 7)) AS q FROM arr
), wh AS (
  -- mul-mod-2^64 via 32-bit split: the mix constant is ~2^63.5, so a
  -- direct HUGEINT product of (xor <= 2^64) * const overflows INT128;
  -- ((hi*c mod 2^32) * 2^32 + lo*c) mod 2^64 stays within range
  SELECT doc_id, q,
         list_reduce(
           list_prepend(CAST(0 AS HUGEINT), a[q + 1: q + 8]),
           (acc, x) ->
             ((((xor(acc, x) // 4294967296) * 11400714819323198485)
               % 4294967296) * 4294967296
              + (xor(acc, x) % 4294967296) * 11400714819323198485)
             % 18446744073709551616
         ) AS h
  FROM qs
), starts AS (
  SELECT doc_id, unnest(range(0, n - 7 - 33 + 1)) AS s FROM arr
), winner AS (
  -- lexicographic (h, q) min via packing: 2^42 position slots (h*2^42
  -- + q stays < 2^106 < INT128) — no real document approaches 2^42
  -- tokens, unlike the 2^20 slot this first shipped with
  SELECT st.doc_id, st.s,
         arg_min(w.q, w.h * 4398046511104 + w.q) AS q
  FROM starts st
  JOIN wh w ON w.doc_id = st.doc_id AND w.q BETWEEN st.s AND st.s + 32
  GROUP BY st.doc_id, st.s
)
SELECT DISTINCT wi.doc_id, wi.q AS token_pos,
       CAST(CASE WHEN w.h >= 9223372036854775808
                 THEN w.h - 18446744073709551616 ELSE w.h END
            AS BIGINT) AS fp
FROM winner wi JOIN wh w ON w.doc_id = wi.doc_id AND w.q = wi.q
"""


# --------------------------------------------------------------------------
# 24. user_sessions — session windows (gaps-and-islands; streaming-shaped)
# --------------------------------------------------------------------------


def q_user_sessions(sf_dir: str):
    from .stages.streaming import sessionize

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    out = sessionize(ds, "user_id", "ts", gap_minutes=30.0,
                     value_col="value", id_col="event_id")
    return _round_cols(out, {"total_value": 2})


SQL_USER_SESSIONS = """
WITH e AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
            AS session_id
  FROM e
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# 25. user_profiles — T7/A13: associative sums + latest-wins merge
# --------------------------------------------------------------------------


def q_user_profiles(sf_dir: str):
    from .stages.streaming import profile_aggregate

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value", "event_type"])
    out = profile_aggregate(
        ds, "user_id", "ts", sum_cols={"value": "total_value"},
        latest_cols=["event_type"], id_col="event_id",
    )
    return _round_cols(out, {"total_value": 2})


SQL_USER_PROFILES = """
SELECT a.user_id, a.total_value, a.n_events, a.first_ts, a.last_ts,
       b.event_type AS last_event_type
FROM (
  SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events,
         min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY user_id
) a
JOIN (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
) b USING (user_id)
"""


# --------------------------------------------------------------------------
# 26. edge_condense — A7: adjacency condensation to list columns
#     (lists serialized to strings so the value-hash comparison is exact)
# --------------------------------------------------------------------------


def q_edge_condense(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity"])
    agg = ops.partial_groupby_sum(
        ds, ["l_suppkey", "l_partkey"], sums={"l_quantity": "weight"}
    )

    def condense(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(["l_suppkey", "l_partkey"], kind="mergesort")
        totals = df.groupby("l_suppkey", sort=False)["weight"].transform("sum")
        df = df.assign(norm_w=df["weight"] / totals)
        g = df.groupby("l_suppkey", sort=False)
        return pd.DataFrame(
            {
                "l_suppkey": g.size().index.to_numpy(),
                "followees": g["l_partkey"].agg(
                    lambda s: ",".join(str(x) for x in s)
                ).to_numpy(),
                "weights": g["norm_w"].agg(
                    lambda s: ",".join(f"{x:.6f}" for x in s)
                ).to_numpy(),
            }
        )

    return ops.bucketed_group_apply(agg, ["l_suppkey"], condense)


SQL_EDGE_CONDENSE = """
SELECT l_suppkey,
       array_to_string(list(l_partkey ORDER BY l_partkey), ',') AS followees,
       array_to_string(list(printf('%.6f', w) ORDER BY l_partkey), ',') AS weights
FROM (
  SELECT l_suppkey, l_partkey,
         sum(l_quantity) / sum(sum(l_quantity)) OVER (PARTITION BY l_suppkey) AS w
  FROM lineitem GROUP BY l_suppkey, l_partkey
)
GROUP BY l_suppkey
"""


# --------------------------------------------------------------------------
# 27. fold_counts — O4: deterministic k-fold assignment
# --------------------------------------------------------------------------


def q_fold_counts(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"fold": (df["event_id"] % 5).astype("int64"), "value": df["value"]}
        )

    folded = ds.map_batches(fold, batch_format="pandas")
    agg = ops.partial_groupby_sum(
        folded, ["fold"], sums={"value": "total_value"}, count_as="n"
    )
    return _round_cols(agg, {"total_value": 2})


SQL_FOLD_COUNTS = """
SELECT event_id % 5 AS fold, round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY event_id % 5
"""


# --------------------------------------------------------------------------
# 28. token_cooccurrence — A8/A9/T2: vocab build + windowed co-occurrence
# --------------------------------------------------------------------------


def q_token_cooccurrence(sf_dir: str):
    from .pipelines.cooccurrence import build_vocabulary, cooccurrence_pairs

    ds = _read(sf_dir, "documents", ["text"])
    vocab = build_vocabulary(ds, "text")
    out = cooccurrence_pairs(ds, "text", vocab)
    return _round_cols(out, {"weight": 6})


SQL_TOKEN_COOCCURRENCE = """
WITH vocab AS (
  SELECT token,
         row_number() OVER (ORDER BY freq DESC, token ASC) - 1 AS token_id
  FROM (
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token HAVING count(*) > 5
  )
), toks AS (
  -- parallel unnests zip positionally in DuckDB
  SELECT doc_id, unnest(t) AS token,
         unnest(range(1, len(t) + 1)) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
), seq AS (
  SELECT t.doc_id,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) - 1 AS p,
         v.token_id
  FROM toks t JOIN vocab v USING (token)
)
SELECT a.token_id AS left_id, b.token_id AS right_id,
       round(sum(1.0 / (b.p - a.p)), 6) AS weight
FROM seq a JOIN seq b
  ON a.doc_id = b.doc_id AND b.p > a.p AND b.p - a.p <= 10
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# 29. purchase_last_signup — as-of join (custom operator; DuckDB ASOF)
# --------------------------------------------------------------------------

_EPOCH = pd.Timestamp("1970-01-01")


def q_purchase_last_signup(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value", "event_type"])
    left = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("purchase"))).select(
            ["event_id", "user_id", "ts", "value"]
        ),
        batch_format="pyarrow",
    )
    right = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("signup"))).select(
            ["user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    out = ops.asof_join(left, right, by="user_id", on="ts", right_cols=[])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"ts_right": "ts_signup"})
        df["ts_signup"] = pd.to_datetime(df["ts_signup"]).fillna(_EPOCH)
        return df

    return out.map_batches(finish, batch_format="pandas")


SQL_PURCHASE_LAST_SIGNUP = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       coalesce(s.ts, TIMESTAMP '1970-01-01') AS ts_signup
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# --------------------------------------------------------------------------
# 29b. ann_ivf_topk — IVF approximate nearest neighbours (probabilistic:
#      rows-only driver check; exactness at nprobe=n_centroids is
#      asserted in tests/test_aux_pipelines.py)
# --------------------------------------------------------------------------


def q_ann_ivf_topk(sf_dir: str):
    """IVF top-k with nprobe = n_centroids: probing every list makes
    the result EXACT (identical to brute force, so the ann_topk DuckDB
    oracle applies — round-3 verdict item 5), while still exercising
    the quantizer training, per-batch assignment, and probe-map
    machinery. Sublinear pruning behavior (nprobe < n_centroids) is
    pinned by recall/pruning tests in tests/test_aux_pipelines.py."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 5].rename(columns={"vec_id": "query_id"})
    return ann.ann_ivf(
        ds, qdf, k=10, n_centroids=8, nprobe=8, round_decimals=5
    )


# --------------------------------------------------------------------------
# 29c. ann_ivf_partitioned — materialized IVF index: corpus written as
#      centroid-partitioned parquet, queries read ONLY probed
#      partitions (the 100 TB-sublinear path; rows-only driver check,
#      exactness + pruning asserted in tests/test_aux_pipelines.py)
# --------------------------------------------------------------------------


def _ivf_index_dir(sf_dir: str, n_centroids: int = 8) -> str:
    """Deterministic materialized-IVF cache dir per (corpus CONTENT,
    params): build once, query many — the materialized-index contract.
    Keyed by a size+mtime fingerprint of the source parquet so a
    regenerated corpus at the same path invalidates the cache, and
    built into a temp dir that is atomically renamed into place so
    concurrent runs never observe a half-built index."""
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = f"{st.st_size}_{st.st_mtime_ns}"
    index_dir = f"/tmp/slr_ivf_cache_{tag}_c{n_centroids}_{fp}"
    if not os.path.isdir(index_dir):
        import glob
        import shutil

        # a regenerated corpus mints a new fingerprint — drop the stale
        # indexes for this (tag, params) so /tmp doesn't accumulate one
        # full index copy per regeneration
        for old in glob.glob(f"/tmp/slr_ivf_cache_{tag}_c{n_centroids}_*"):
            if not old.endswith(".build" + str(os.getpid())):
                shutil.rmtree(old, ignore_errors=True)
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        tmp_dir = f"{index_dir}.build{os.getpid()}"
        ann.ivf_build(ds, tmp_dir, n_centroids=n_centroids)
        try:
            os.rename(tmp_dir, index_dir)
        except OSError:  # lost the race: another run renamed first
            shutil.rmtree(tmp_dir, ignore_errors=True)
    return index_dir


def q_ann_ivf_partitioned(sf_dir: str):
    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < 5].rename(columns={"vec_id": "query_id"})
    index_dir = _ivf_index_dir(sf_dir, n_centroids=8)
    # nprobe = n_centroids: every partition is probed, so the result is
    # exact (ann_topk oracle applies) while the query still goes through
    # the materialized-index read path; partition PRUNING (reading only
    # probed ivf_list= dirs) is asserted by tests/test_aux_pipelines.py
    return ann.ivf_query(index_dir, qdf, k=10, nprobe=8, round_decimals=5)


# --------------------------------------------------------------------------
# 30. sliding_user_windows — sliding event-time window aggregate
#     (1h window sliding by 30min; each event lands in 2 windows)
# --------------------------------------------------------------------------


def q_sliding_user_windows(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = ops.sliding_window_agg(
        ds, "user_id", "ts",
        width=pd.Timedelta(hours=1), slide=pd.Timedelta(minutes=30),
        sums={"value": "total_value"}, count_as="n",
    )
    return _round_cols(out, {"total_value": 2})


SQL_SLIDING_USER_WINDOWS = """
WITH w AS (
  SELECT user_id, value,
         time_bucket(INTERVAL '30 minutes', ts)
           - k.k * INTERVAL '30 minutes' AS window_start
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT user_id, window_start,
       round(sum(value), 2) AS total_value, count(*) AS n
FROM w GROUP BY user_id, window_start
"""


# --------------------------------------------------------------------------
# 31. purchases_events_1h — interval/range count join: events of the
#     same user in the hour BEFORE each purchase
# --------------------------------------------------------------------------


def q_purchases_events_1h(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("purchase"))).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    right = ds.select_columns(["user_id", "ts"])
    out = ops.interval_count_join(
        left, right, by="user_id", left_ts="ts", right_ts="ts",
        lower=pd.Timedelta(hours=-1), upper=pd.Timedelta(0),
        out_col="n_events_1h",
    )
    return out


SQL_PURCHASES_EVENTS_1H = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT count(*) FROM events e
        WHERE e.user_id = p.user_id
          AND e.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts) AS n_events_1h
FROM events p WHERE p.event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# 32. conversation_pairs — reply-chain completion (two exchange joins)
# --------------------------------------------------------------------------


def q_conversation_pairs(sf_dir: str):
    """Conversation-completion join
    (ExtractCompleteConversations.java:59-77): a reply graph — here each
    event's predecessor in its user's timeline, the testdata's stand-in
    for in_reply_to_status_id — joined TWICE against the event
    dictionary (``joinWithHuge`` on source id, then target id) through
    the distributed hash exchange, emitting completed (source, target)
    pair rows. Both joins are large-large: neither side broadcasts."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def lag_edges(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        src = df.groupby("user_id", sort=False)["event_id"].shift(1)
        out = pd.DataFrame({"source_id": src, "target_id": df["event_id"]})
        out = out.dropna(subset=["source_id"])
        out["source_id"] = out["source_id"].astype("int64")
        return out

    graph = ops.bucketed_group_apply(ev, ["user_id"], lag_edges)

    def dict_side(prefix: str):
        def slim(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    f"{prefix}_id": df["event_id"],
                    f"{prefix}_type": df["event_type"],
                    f"{prefix}_value": df["value"],
                }
            )

        return ev.map_batches(slim, batch_format="pandas")

    j1 = ops.exchange_join(graph, dict_side("source"), on=["source_id"])
    return ops.exchange_join(j1, dict_side("target"), on=["target_id"])


SQL_CONVERSATION_PAIRS = """
WITH g AS (
  SELECT CAST(lag(event_id) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS BIGINT)
           AS source_id,
         event_id AS target_id
  FROM events
)
SELECT g.source_id, g.target_id,
       s.event_type AS source_type, s.value AS source_value,
       t.event_type AS target_type, t.value AS target_value
FROM g
JOIN events s ON g.source_id = s.event_id
JOIN events t ON g.target_id = t.event_id
"""


# --------------------------------------------------------------------------
# 31. lsa_embed — true truncated-SVD LSA projection (T1; model-driven,
# rows-only: SVD is not SQL-expressible). Exactness vs a dense numpy
# reference is covered by tests/test_lsa.py.
# --------------------------------------------------------------------------


def q_lsa_embed(sf_dir: str):
    from .pipelines import lsa

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    model = lsa.fit_lsa(docs, dim=64, vocab_cap=4096, sample=512)
    return lsa.embed_lsa(docs, model)


# --------------------------------------------------------------------------
# 32. doc_sample — deterministic hash sample (O5 random sample,
# reference vectorize/Dataset sampling; 32-bit Knuth multiplicative
# hash so the DuckDB oracle reproduces the pick exactly)
# --------------------------------------------------------------------------

_SAMPLE_MULT = 2654435761  # Knuth 2^32 golden-ratio multiplier
_SAMPLE_PCT = 3  # keep ~30%


def q_doc_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_SAMPLE_MULT)) % np.uint64(1 << 32)
        return batch.filter(pa.array((h % np.uint64(10)) < _SAMPLE_PCT))

    return ds.map_batches(pick, batch_format="pyarrow")


SQL_DOC_SAMPLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ((doc_id * {_SAMPLE_MULT}) % 4294967296) % 10 < {_SAMPLE_PCT}
"""


# --------------------------------------------------------------------------
# 33. heavy_hitter_tokens — Misra-Gries heavy hitters over document
# tokens. With k=64 >= the testdata vocabulary the MG summary is EXACT
# (no counter ever trims), so the DuckDB oracle checks it exactly; the
# k < vocab guarantee (undercount <= n/(k+1), no true heavy hitter
# missed) is asserted in pytest on adversarial synthetic streams.
# --------------------------------------------------------------------------

_HH_K = 64


def q_heavy_hitter_tokens(sf_dir: str):
    ds = _read(sf_dir, "documents", ["text"])
    summary, n = ops.heavy_hitters(ds, "text", k=_HH_K, tokenize=True)
    thresh = n / (_HH_K + 1)
    rows = sorted(
        (item, est) for item, est in summary.items() if est > thresh
    )
    return pd.DataFrame(
        {
            "item": [r[0] for r in rows],
            "est_count": pd.array([r[1] for r in rows], dtype="int64"),
        }
    )


SQL_HEAVY_HITTER_TOKENS = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS item
  FROM documents
), counted AS (
  SELECT item, count(*) AS est_count FROM toks
  WHERE item <> '' GROUP BY item
), tot AS (SELECT sum(est_count) AS n FROM counted)
SELECT item, est_count FROM counted, tot
WHERE est_count > n / {_HH_K + 1}.0
ORDER BY item
"""


# --------------------------------------------------------------------------
# 33a. approx_price_quantiles — t-digest quantiles (rows-only:
# probabilistic; pytest asserts <=1% rank error vs the exact sort)
# --------------------------------------------------------------------------


def q_approx_quantiles(sf_dir: str):
    """Shuffle-free approximate quantiles: per-block t-digests merged
    on the driver (`ops.approx_quantiles`)."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    vals = ops.approx_quantiles(ds, "l_extendedprice", qs)
    return pd.DataFrame(
        {"q": qs, "value": np.round(vals, 2)}
    )


# --------------------------------------------------------------------------
# 33b. approx_distinct_counts — HyperLogLog count-distinct (rows-only:
# probabilistic +-0.8% at p=14; pytest asserts accuracy vs exact)
# --------------------------------------------------------------------------


def q_approx_distinct(sf_dir: str):
    """Sketch-based count-distinct: no shuffle, constant-size per-block
    registers merged on the driver (`ops.approx_count_distinct`)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id"])
    return pd.DataFrame(
        [
            {
                "column": c,
                "approx_distinct": int(
                    round(ops.approx_count_distinct(ds, c))
                ),
            }
            for c in ("user_id", "event_id")
        ]
    )


# --------------------------------------------------------------------------
# 34. media_features — real multimodal decode + featurize (rows-only:
# binary codec work is not SQL-expressible; pytest covers codec
# roundtrips and the actor-pool pipeline)
# --------------------------------------------------------------------------


def q_media_features(sf_dir: str):
    """Actor-pool decode of real self-describing payloads (PPM images,
    PCM16 WAV audio, RAWV frame containers) into 16-dim features. The
    media table is synthesized deterministically — scale tracks the
    documents table so sf changes the workload."""
    from .stages import multimodal as mm

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    tbl = mm.synth_media_table(max(48, n_docs // 4))
    # from_arrow mints ONE block — split it or the decode pool gets a
    # single task and zero parallelism (r4 catalog flagged the stage at
    # 2.3s: 1 task, 765ms UDF, rest actor startup)
    ds = rd.from_arrow(tbl).repartition(max(4, min(16, tbl.num_rows // 64)))
    return mm.media_features(ds)


# --------------------------------------------------------------------------
# 34. benchmark_contamination — eval-set n-gram decontamination
# (GPT-3 App. C / Lee et al. 2022 style). The benchmark side (docs
# with doc_id % 97 == 0 stand in for an eval suite) is SMALL by
# definition, so its distinct n-gram set is broadcast once via
# ray.put; the corpus side never shuffles. n=3 here because the
# synthetic vocabulary is tiny (real suites use 8-13 grams — the
# parameter, not the shape, changes).
# --------------------------------------------------------------------------

_DECON_N = 3
_DECON_MOD = 97


def q_benchmark_contamination(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _DECON_MOD == 0))

    bench_rows = ds.map_batches(keep_bench, batch_format="pyarrow").take_all()
    grams = curate.build_benchmark_grams(
        [r["text"] for r in bench_rows], _DECON_N
    )
    grams_ref = ray.put(grams)

    def keep_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _DECON_MOD != 0))

    train = ds.map_batches(keep_train, batch_format="pyarrow")
    return curate.decontaminate(train, grams_ref, "text", "doc_id", n=_DECON_N)


SQL_BENCHMARK_CONTAMINATION = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i:i+{_DECON_N - 1}], ' ') AS gram
  FROM toks, LATERAL (
    SELECT unnest(range(1, len(ws) - {_DECON_N - 2})) AS i) ii
), m AS (
  SELECT t.doc_id, count(*) AS n
  FROM (SELECT doc_id, gram FROM g WHERE doc_id % {_DECON_MOD} <> 0) t
  JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0) b
    USING (gram)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(m.n, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(m.n, 0) > 0 AS BIGINT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {_DECON_MOD} <> 0) d
LEFT JOIN m USING (doc_id)
"""


# --------------------------------------------------------------------------
# 34b. fuzzy_contamination — NEAR-duplicate eval decontamination: a
# cross-table MinHash-LSH join (corpus x eval suite, neither side
# broadcast) with exact shingle-Jaccard confirmed inside the two-sided
# verify exchange. Catches contaminated documents the exact n-gram
# pass misses (light paraphrase / whitespace drift). Oracle = the
# exhaustive cross-join Jaccard; exact verification makes the engine
# output equal it whenever LSH recall is 1 (miss odds ~5e-8 per
# qualifying pair at J=0.8 with 128 perms / 32 bands, seeded perms —
# deterministic on this corpus).
# --------------------------------------------------------------------------

_FUZZY_DECON_T = 0.8
# a WIDER eval slice than the exact pass's mod-97 (which intersects the
# testdata's planted near-dup pairs in 0 places at sf0.01 — an empty
# demonstration); mod-7 crosses 7-9 planted pairs at sf0.001/sf0.01 with
# no borderline (0.7-0.8) pair at either scale
_FUZZY_DECON_MOD = 7


def q_fuzzy_contamination(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _FUZZY_DECON_MOD != 0))

    def keep_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _FUZZY_DECON_MOD == 0))

    train = ds.map_batches(keep_train, batch_format="pyarrow")
    bench = ds.map_batches(keep_bench, batch_format="pyarrow")
    out = dedup.fuzzy_decontaminate_pairs(
        train, bench, "doc_id", "text", "doc_id", "text",
        threshold=_FUZZY_DECON_T, k=3,
    )
    return _round_cols(out, {"jaccard": 6})


SQL_FUZZY_CONTAMINATION = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN list_distinct([array_to_string(t, ' ')])
              ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
)
SELECT a, b, round(jaccard, 6) AS jaccard FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.s, y.s))::DOUBLE
           / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
  FROM (SELECT * FROM sh WHERE doc_id % {_FUZZY_DECON_MOD} <> 0) x
  CROSS JOIN (SELECT * FROM sh WHERE doc_id % {_FUZZY_DECON_MOD} = 0) y
) WHERE jaccard >= {_FUZZY_DECON_T}
"""


# --------------------------------------------------------------------------
# 35. pii_scrub — RE2 redaction (email / phone / IPv4) with counts,
# pure pyarrow.compute kernels. The testdata carries no PII, so the
# input text is constructed deterministically from customer columns
# IDENTICALLY on both sides; the oracle checks byte-identical
# redaction output (pyarrow and DuckDB are both RE2).
# --------------------------------------------------------------------------


def q_pii_scrub(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def build_and_scrub(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].combine_chunks() if isinstance(
            batch["c_custkey"], pa.ChunkedArray) else batch["c_custkey"]
        ckn = ck.to_numpy(zero_copy_only=False)
        text = pc.binary_join_element_wise(
            batch["c_name"], pa.scalar(" mail user"),
            pc.cast(ck, pa.string()),
            pa.scalar("@example.com call 55-123-456-"),
            pc.utf8_lpad(pc.cast(pa.array(ckn % 10000), pa.string()), 4, "0"),
            pa.scalar(" ip 10.0."),
            pc.cast(pa.array(ckn % 256), pa.string()),
            pa.scalar(".1 seg "), batch["c_mktsegment"], pa.scalar(""),
        )
        clean, n = curate.pii_scrub_kernel(text)
        return pa.table(
            {"c_custkey": batch["c_custkey"], "clean_text": clean,
             "n_redactions": n}
        )

    return ds.map_batches(build_and_scrub, batch_format="pyarrow")


SQL_PII_SCRUB = r"""
WITH t AS (
  SELECT c_custkey,
         c_name || ' mail user' || CAST(c_custkey AS VARCHAR)
           || '@example.com call 55-123-456-'
           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           || ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR)
           || '.1 seg ' || c_mktsegment AS text
  FROM customer
), e1 AS (
  SELECT c_custkey,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1
  FROM t
), e2 AS (
  SELECT c_custkey, n1,
         len(regexp_extract_all(t1, '\b\d{2}-\d{3}-\d{3}-\d{4}\b')) AS n2,
         regexp_replace(t1, '\b\d{2}-\d{3}-\d{3}-\d{4}\b',
                        '<PHONE>', 'g') AS t2
  FROM e1
)
SELECT c_custkey,
       regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                      '<IP>', 'g') AS clean_text,
       CAST(n1 + n2 + len(regexp_extract_all(t2,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
         AS n_redactions
FROM e2
"""


# --------------------------------------------------------------------------
# 36. sequence_pack — concatenate-and-chunk LLM sequence packing via a
# distributed ordered prefix-scan (see stages/curate.packed_sequences).
# The oracle is the equivalent window sum; the engine never sorts
# globally and sends only K per-range totals to the driver.
# --------------------------------------------------------------------------

_PACK_BUDGET = 64


def q_sequence_pack(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def cnt(batch: pa.Table) -> pa.Table:
        # curate.ws_tokens, not str.split(): the oracle's RE2 \s+ does
        # not split on \v / NBSP the way Python's Unicode split does
        toks = [len(curate.ws_tokens(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"],
             "n_tokens": pa.array(toks, type=pa.int64())}
        )

    counts = ds.map_batches(cnt, batch_format="pyarrow")
    return curate.packed_sequences(
        counts, "doc_id", "n_tokens", budget=_PACK_BUDGET
    )


SQL_SEQUENCE_PACK = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              w -> w <> '')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {_PACK_BUDGET} AS seq_first,
       (start_tok + greatest(n_tokens, 1) - 1) // {_PACK_BUDGET} AS seq_last
FROM s
"""


# --------------------------------------------------------------------------
# 37. curation_pipeline — the composed chain: quality filter ->
# decontaminate -> exact dedup -> sequence pack. Deterministic end to
# end, so the WHOLE chain has one DuckDB oracle (see
# stages/curate.curate_corpus for the 100 TB shape).
# --------------------------------------------------------------------------

_CURATE_MIN_TOKENS = 25


def q_curation_pipeline(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _DECON_MOD == 0))

    bench_rows = ds.map_batches(keep_bench, batch_format="pyarrow").take_all()
    grams_ref = ray.put(
        curate.build_benchmark_grams([r["text"] for r in bench_rows], _DECON_N)
    )

    def keep_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _DECON_MOD != 0))

    train = ds.map_batches(keep_train, batch_format="pyarrow")
    return curate.curate_corpus(
        train, grams_ref, "text", "doc_id",
        min_tokens=_CURATE_MIN_TOKENS, n=_DECON_N, budget=_PACK_BUDGET,
    )


SQL_CURATION_PIPELINE = rf"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), g AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+{_DECON_N - 1}], ' ') AS gram
  FROM toks, LATERAL (
    SELECT unnest(range(1, len(ws) - {_DECON_N - 2})) AS i) ii
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, gram FROM g WHERE doc_id % {_DECON_MOD} <> 0) t
  JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0) b
    USING (gram)
), clean AS (
  SELECT doc_id, text, CAST(len(ws) AS BIGINT) AS n_tokens
  FROM toks
  WHERE doc_id % {_DECON_MOD} <> 0
    AND len(ws) >= {_CURATE_MIN_TOKENS}
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), dedup AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM clean) WHERE rn = 1
), s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM dedup
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {_PACK_BUDGET} AS seq_first,
       (start_tok + greatest(n_tokens, 1) - 1) // {_PACK_BUDGET} AS seq_last
FROM s
"""


# --------------------------------------------------------------------------
# 38. stratified_sample — deterministic per-group sample: the k docs
# with the smallest Knuth-multiplicative hash per language. The
# standard "balanced subset per bucket" curation op (O5/O6 composed);
# reproducible across runs and cluster sizes because the pick depends
# only on doc_id, never on block order.
# --------------------------------------------------------------------------

_STRAT_K = 20


def q_stratified_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_SAMPLE_MULT)) % np.uint64(1 << 32)
        return batch.append_column("h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return ops.topk_per_group(
        hashed, ["lang"], "h", k=_STRAT_K, descending=False,
        tie_break=["doc_id"], rank_col="rnk",
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, n_chars, h, rnk FROM (
  SELECT doc_id, lang, n_chars,
         (doc_id * {_SAMPLE_MULT}) % 4294967296 AS h,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * {_SAMPLE_MULT}) % 4294967296, doc_id) AS rnk
  FROM documents)
WHERE rnk <= {_STRAT_K}
"""


# --------------------------------------------------------------------------
# 39. embedding_clusters — spherical k-means semantic clustering over
# the embeddings table (rows-only: k-means is not SQL-expressible;
# determinism + quality asserted in tests/test_curate.py).
# --------------------------------------------------------------------------


def q_embedding_clusters(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann.kmeans_clusters(ds, n_clusters=8)


# --------------------------------------------------------------------------
# 39d. quality_classifier — model-based quality gate: distributed-LR
# training (block-ref scaler + Newton Gram partials, no driver X) over
# the quality text-stats, broadcast-weights scoring pass. Rows-only
# (iterative training is not SQL-expressible); weights pinned vs a
# single-process IRLS reference in tests/test_curate.py.
# --------------------------------------------------------------------------


def q_quality_classifier(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return curate.quality_classifier(ds, "text", "doc_id", target_mod=_DSIR_MOD)


# --------------------------------------------------------------------------
# 39c. dsir_scores — DSIR importance resampling scores (Xie et al.
# 2023, unigram variant): target slice = doc_id % MOD == 0, every
# source doc scored by the add-one-smoothed unigram log-likelihood
# ratio. Exact DuckDB oracle.
# --------------------------------------------------------------------------

_DSIR_MOD = 5


def q_dsir_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return curate.dsir_scores(ds, "text", "doc_id", target_mod=_DSIR_MOD)


SQL_DSIR_SCORES = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ts
  FROM documents
), flat AS (SELECT doc_id, unnest(ts) AS w FROM toks),
lab AS (SELECT doc_id, doc_id % {_DSIR_MOD} = 0 AS tgt FROM documents),
cnt AS (
  SELECT f.w, sum(CASE WHEN l.tgt THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN l.tgt THEN 0 ELSE 1 END) AS cs
  FROM flat f JOIN lab l USING (doc_id) GROUP BY f.w
), tot AS (SELECT sum(ct) AS nt, sum(cs) AS ns, count(*) AS V FROM cnt),
ratio AS (
  SELECT w, ln((ct + 1.0) / (nt + V)) - ln((cs + 1.0) / (ns + V)) AS r
  FROM cnt CROSS JOIN tot
)
SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(r.r), 5) AS log_weight
FROM flat f JOIN ratio r ON f.w = r.w JOIN lab l USING (doc_id)
WHERE NOT l.tgt
GROUP BY f.doc_id
"""


# --------------------------------------------------------------------------
# 39b. knn_triangles — graph analytics: per-node triangle counts over
# the k-NN graph of the embeddings table (degree-oriented wedge join,
# Suri & Vassilvitskii WWW'11). The kNN edge build here is the exact
# O(n²) brute-force baseline (same convention as ann_topk) so the
# whole query is DuckDB-expressible; at 100 TB the edge list would
# come from the materialized IVF index instead — triangle_counts
# itself is all exchanges and scales independently of the edge source.
# --------------------------------------------------------------------------

_KNN_K = 3


def q_knn_triangles(sf_dir: str):
    """Per-node triangle counts over the kNN similarity graph. The kNN
    edge source is the MATERIALIZED IVF index (round-4 verdict item 6)
    — the sublinear 100 TB path — queried at full probe so the edge
    set stays exact and the brute-force kNN oracle still applies; the
    pruned-probe configuration of the same read path is exercised by
    ``ann_ivf_partitioned``'s partition-pruning test."""
    from .pipelines.graph import triangle_counts

    qdf = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"]).rename(
        columns={"vec_id": "query_id"}
    )
    index_dir = _ivf_index_dir(sf_dir, n_centroids=8)
    knn = ann.ivf_query(
        index_dir, qdf, k=_KNN_K, nprobe=8, round_decimals=5
    )
    edges = knn.map_batches(
        lambda df: df[["query_id", "vec_id"]].rename(
            columns={"query_id": "a", "vec_id": "b"}
        ),
        batch_format="pandas",
    )
    return triangle_counts(edges)


SQL_KNN_TRIANGLES = f"""
WITH knn AS (
  SELECT a, b FROM (
    SELECT q.vec_id AS a, e.vec_id AS b,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 5) DESC,
                      e.vec_id ASC) AS rank
    FROM embeddings e CROSS JOIN embeddings q
    WHERE e.vec_id <> q.vec_id
  ) WHERE rank <= {_KNN_K}
),
e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM knn),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, count(*) AS triangles FROM corners GROUP BY node
"""


# --------------------------------------------------------------------------
# 39a. semantic_dedup — SemDeDup composed op (cluster + within-cluster
# greedy leader dedup). Rows-only: k-means quantizer is not
# SQL-expressible; tests/test_dedup_exchange.py plants near-dup groups
# and pins one-survivor-per-group + determinism under repartition.
# --------------------------------------------------------------------------


def q_semantic_dedup(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.semantic_dedup(
        ds, vec_col="embedding", id_col="vec_id",
        eps=EMB_DUP_THRESHOLD, n_clusters=8,
    )


# --------------------------------------------------------------------------
# 40. shard_assignment — deterministic hash-sharded training export
# assignment (the write itself is export_shards; the assignment is the
# oracle-checkable part).
# --------------------------------------------------------------------------

_N_SHARDS = 16


def q_shard_assignment(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return curate.assign_shards(ds, "doc_id", n_shards=_N_SHARDS)


SQL_SHARD_ASSIGNMENT = f"""
SELECT doc_id, lang,
       ((doc_id * {_SAMPLE_MULT}) % 4294967296) % {_N_SHARDS} AS shard
FROM documents
"""


# --------------------------------------------------------------------------
# 41. domain_mix — weighted domain-mixture resampling: every source is
# down-/up-sampled to a target weight (w<1 drops by id-hash, w>1 emits
# floor(w) copies + a hash-picked extra, `copy` indexing the repeats).
# The deterministic-duplication form of the "resample to a target
# mixture" step every large-scale training-data pipeline runs before
# tokenization; shuffle-free and reproducible across cluster sizes.
# --------------------------------------------------------------------------

# four weight classes cycled over the srcN suffix: drop-3/4, keep,
# 1.75x, 2.5x — exercises pure-downsample, identity, and both
# upsample branches
_MIX_WEIGHTS = {f"src{i}": 0.25 + 0.75 * (i % 4) for i in range(64)}
_MIX_DEN = 10_000


def q_domain_mix(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return curate.domain_mix(
        ds, _MIX_WEIGHTS, domain_col="source", id_col="doc_id",
        frac_den=_MIX_DEN,
    )


SQL_DOMAIN_MIX = f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         0.25 + 0.75 * (CAST(substr(source, 4) AS INT) % 4) AS wt
  FROM documents
)
SELECT doc_id, source, n_chars, r.copy
FROM w CROSS JOIN range(0, 3) AS r(copy)
WHERE r.copy < CAST(floor(wt) AS BIGINT)
      + CASE WHEN ((doc_id * {_SAMPLE_MULT}) % 4294967296) % {_MIX_DEN}
                  < CAST(round((wt - floor(wt)) * {_MIX_DEN}) AS BIGINT)
             THEN 1 ELSE 0 END
"""


# --------------------------------------------------------------------------
# 42. substring_dup_spans — exact-substring duplicate spans >= 30
# tokens (ExactSubstr dedup, Lee et al. 2021) via winnowing anchors +
# fp-bucket exchange + token-exact extension. Rows-only: substring
# joins are not feasibly SQL-expressible; exactness (including
# maximality) is pinned against a brute-force all-diagonals reference
# in tests/test_substring_dedup.py.
# --------------------------------------------------------------------------


def q_substring_dup_spans(sf_dir: str):
    """Oracle-checked (round-3 verdict item 5): the oracle computes ALL
    maximal cross-doc common token runs >= 30 directly — explode
    (doc, pos, token), self-join on token, and group consecutive
    matches per (pair, diagonal) gaps-and-islands style. The engine's
    winnowing guarantee (any shared >= min_tokens run selects a common
    anchor) plus token-exact extension makes its output the same
    maximal-run set, so the two agree exactly unless an anchor bucket
    overflows bucket_cap (none does on this corpus)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.substring_dup_spans(
        ds, "text", "doc_id", min_tokens=30, k=8
    )


SQL_SUBSTRING_DUP_SPANS = _substring_runs_sql(30) + """
SELECT doc_a, doc_b, a_start, b_start, span_len
FROM runs WHERE span_len >= 30
"""


# --------------------------------------------------------------------------
# 43. doc_perplexity — CCNet-style LM quality scoring: add-one bigram
# LM trained on the doc_id%5==0 reference slice, every other doc
# scored by average bigram information content in bits
# (stages/curate.train_bigram_lm / lm_perplexity; Wenzek et al. 2019).
# Fully deterministic -> exact DuckDB oracle.
# --------------------------------------------------------------------------

_LM_MOD = 5


def q_doc_perplexity(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(keep_train: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = ids % _LM_MOD == 0
            return batch.filter(pa.array(m if keep_train else ~m))

        return f

    train = ds.map_batches(part(True), batch_format="pyarrow")
    lm_ref = ray.put(curate.train_bigram_lm(train, "text"))
    test = ds.map_batches(part(False), batch_format="pyarrow")
    return curate.lm_perplexity(test, lm_ref, "text", "doc_id")


SQL_DOC_PERPLEXITY = rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ts
  FROM documents
), flat AS (
  SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS pos
  FROM tok
), big AS (
  SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS v, w
  FROM flat
), train_big AS (
  SELECT v, w, count(*) AS c FROM big
  WHERE doc_id % {_LM_MOD} = 0 AND v IS NOT NULL GROUP BY v, w
), train_ctx AS (
  SELECT v, count(*) AS cv FROM big
  WHERE doc_id % {_LM_MOD} = 0 AND v IS NOT NULL GROUP BY v
), vocab AS (
  SELECT count(DISTINCT w) AS V FROM flat WHERE doc_id % {_LM_MOD} = 0
), scored AS (
  SELECT t.doc_id,
         -log2((COALESCE(b.c, 0) + 1.0)
               / (COALESCE(x.cv, 0) + (SELECT V FROM vocab))) AS bits
  FROM big t
  LEFT JOIN train_big b ON t.v = b.v AND t.w = b.w
  LEFT JOIN train_ctx x ON t.v = x.v
  WHERE t.doc_id % {_LM_MOD} != 0 AND t.v IS NOT NULL
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       avg(bits) AS avg_bits
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# 52. bm25_topk — ranked full-text retrieval (Okapi BM25, Lucene idf).
# The ranked analogue of the reference's Σfreq fulltext candidate
# lookup (FillFromIndex.java:88-97); exact DuckDB oracle.
# --------------------------------------------------------------------------

_BM25_QUERIES = [
    (0, "hash join merge"),
    (1, "window stream batch"),
    (2, "customer order line"),
    (3, "vector scan filter slow"),
]
_BM25_K = 10


def q_bm25_topk(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    qdf = pd.DataFrame(
        {
            "query_id": pd.array(
                [q[0] for q in _BM25_QUERIES], dtype="int64"
            ),
            "query": [q[1] for q in _BM25_QUERIES],
        }
    )
    return retrieval.bm25_topk(ds, qdf, k=_BM25_K)


_BM25_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, q in _BM25_QUERIES for t in sorted(set(q.split()))
)

# shared BM25 CTE chain (query terms -> per-(query, doc) score
# contributions) — interpolated into BOTH SQL_BM25_TOPK and
# SQL_HYBRID_TOPK so the two oracles can never drift apart on
# tokenization / idf / k1 / b
_SQL_BM25_CORE = rf"""WITH q(query_id, term) AS (VALUES {_BM25_VALUES}),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
), dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
flat AS (SELECT doc_id, unnest(ts) AS w FROM toks),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf FROM flat
  WHERE w IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, w
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * (1.2 + 1.0)
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS c
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
)"""

SQL_BM25_TOPK = rf"""
{_SQL_BM25_CORE},
scored AS (
  SELECT query_id, doc_id, round(sum(c), 5) AS score
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS rank
  FROM scored WHERE score > 0.0
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rank
FROM ranked WHERE rank <= {_BM25_K}
"""


def q_hybrid_topk(sf_dir: str):
    """Hybrid retrieval: BM25 over text + embedding-cosine over the
    vector column, fused by Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009: Σ 1/(60+rank)) — the standard
    training-data hybrid-recall combiner, rank-only so the two score
    scales need no calibration. EXACT oracle: both rankers already
    have exact SQL (SQL_BM25_TOPK / the brute cosine rank) and the
    fusion is arithmetic over ranks; the dense query vector for query
    q is embeddings[vec_id=q] (ids are shared across the two testdata
    tables), self-hit included (retrieval, not dedup)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf_text = pd.DataFrame(
        {
            "query_id": pd.array(
                [q[0] for q in _BM25_QUERIES], dtype="int64"
            ),
            "query": [q[1] for q in _BM25_QUERIES],
        }
    )
    qdf_vec = _small_pdf(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf_vec = qdf_vec[
        qdf_vec["vec_id"].isin([q[0] for q in _BM25_QUERIES])
    ].rename(columns={"vec_id": "query_id"})
    sparse = retrieval.bm25_topk(docs, qdf_text, k=_BM25_K)
    dense = ann.ann_brute_force(
        emb, qdf_vec, k=_BM25_K, exclude_self=False, round_decimals=5
    ).map_batches(
        lambda df: df[["query_id", "vec_id", "rank"]].rename(
            columns={"vec_id": "doc_id"}
        ),
        batch_format="pandas",
    )
    return retrieval.rrf_fuse([sparse, dense], k=_BM25_K)


_HYBRID_QIDS = ", ".join(str(q[0]) for q in _BM25_QUERIES)

SQL_HYBRID_TOPK = rf"""
{_SQL_BM25_CORE},
bm_scored AS (
  SELECT query_id, doc_id, round(sum(c), 5) AS score
  FROM contrib GROUP BY query_id, doc_id
),
bm AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS rank
  FROM bm_scored WHERE score > 0.0
),
dn AS (
  SELECT query_id, vec_id AS doc_id, rank FROM (
    SELECT qv.vec_id AS query_id, e.vec_id,
           row_number() OVER (
             PARTITION BY qv.vec_id
             ORDER BY round(CAST(list_cosine_similarity(
                 e.embedding, qv.embedding) AS DOUBLE), 5) DESC,
               e.vec_id ASC) AS rank
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id IN ({_HYBRID_QIDS})) qv
  ) WHERE rank <= {_BM25_K}
),
allr AS (
  SELECT query_id, doc_id, rank FROM bm WHERE rank <= {_BM25_K}
  UNION ALL SELECT query_id, doc_id, rank FROM dn
),
fused AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         round(sum(1.0 / (60 + rank)), 6) AS rrf
  FROM allr GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf DESC, doc_id
  ) AS rank FROM fused
) WHERE rank <= {_BM25_K}
"""


# --------------------------------------------------------------------------
# 68. customer_anti — distributed exchange ANTI join (large NOT-IN side)
# --------------------------------------------------------------------------


def q_customer_anti(sf_dir: str):
    """Customers with NO pending ('P') orders, per market segment — the
    exchange-side anti join. Unlike ``supplier_semi`` (whose key set is
    a broadcast, fine for dimension-sized sides), the NOT-IN side here
    is fact-sized: its distinct keys are pre-aggregated with a combiner
    (one row per key reaches the shuffle) and both sides hash-exchange
    on ``c_custkey``, so no key set ever lands on the driver.
    Reference analogue: the drop-set filters (M12) at the scale where
    the drop set itself no longer broadcasts."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    porders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def pkeys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("P")))
        return pa.table({"c_custkey": t["o_custkey"]})

    pk = ops.partial_groupby_sum(
        porders.map_batches(pkeys, batch_format="pyarrow"),
        ["c_custkey"], count_as="n_p_orders",
    )

    # fuse miss-filter + per-partition partial aggregate into the
    # reduce task: each custkey lives in exactly one partition, so the
    # partial (segment, count, sum) rows are disjoint per customer and
    # a final dimension-sized groupby finishes the job
    def keep_misses(df: pd.DataFrame) -> pd.DataFrame:
        misses = df[df["n_p_orders"].isna()]
        return misses.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("c_custkey", "size"),
            total_acctbal=("c_acctbal", "sum"),
        )

    parts = ops.exchange_join(
        cust, pk, on=["c_custkey"], how="left", post_fn=keep_misses
    )
    agg = ops.partial_groupby_sum(
        parts, ["c_mktsegment"],
        sums={"n_customers": "n_customers", "total_acctbal": "total_acctbal"},
    )
    return _round_cols(agg, {"total_acctbal": 2})


SQL_CUSTOMER_ANTI = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# 69. tfidf_keywords — per-document top-k tf-idf keyword extraction
# --------------------------------------------------------------------------

_TFIDF_K = 5


def q_tfidf_keywords(sf_dir: str):
    """Top-``_TFIDF_K`` tokens per document by tf-idf (tf * ln((N+1)/(df+1)),
    ties by token asc), the classic keyword-extraction / feature-selection
    pass over a corpus. Scale shape: per-batch vectorized (doc, token, tf)
    emit (each doc's text is one row, so within-batch counting is exact),
    df via a combinered token groupby, then the vocabulary-sized idf table
    hash-joins onto the tf pairs through the exchange (NOT a driver
    broadcast — at web scale the vocabulary alone is tens of GB), and the
    per-doc top-k runs as a second bucketed exchange with a map-fused
    partial head. Scores are rounded to 5 dp half-away BEFORE ranking so
    the order matches the oracle bit-for-bit."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def tf_pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), lens
        )
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame(
            {"doc_id": ids[keep], "token": flat.to_pandas().to_numpy()[keep]}
        )
        out = (
            df.groupby(["doc_id", "token"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    tf = ds.map_batches(tf_pairs, batch_format="pyarrow")
    df_tbl = ops.partial_groupby_sum(tf, ["token"], count_as="df")

    def idf(t: pa.Table) -> pa.Table:
        d = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "token": t["token"],
                "idf": pa.array(np.log((n_docs + 1.0) / (d + 1.0))),
            }
        )

    idf_tbl = df_tbl.map_batches(idf, batch_format="pyarrow")

    def score(j: pd.DataFrame) -> pd.DataFrame:
        j["tfidf"] = j["tf"].to_numpy(np.float64) * j["idf"].to_numpy()
        return j[["doc_id", "token", "tf", "tfidf"]]

    scored = ops.exchange_join(tf, idf_tbl, on=["token"], post_fn=score)
    scored = _round_cols(scored, {"tfidf": 5}).map_batches(
        lambda t: t.filter(pc.greater(t["tfidf"], pa.scalar(0.0))),
        batch_format="pyarrow",
    )
    return ops.topk_per_group(
        scored, ["doc_id"], "tfidf", _TFIDF_K,
        descending=True, tie_break=["token"], rank_col="rank",
    )


SQL_TFIDF_KEYWORDS = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
), flat AS (SELECT doc_id, unnest(ts) AS w FROM toks),
tf AS (SELECT doc_id, w AS token, count(*) AS tf FROM flat GROUP BY doc_id, w),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS nd FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln((n.nd + 1.0) / (df.df + 1.0)), 5) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tf, tfidf,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, token
         ) AS rank
  FROM scored WHERE tfidf > 0.0
)
SELECT doc_id, token, tf, tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TFIDF_K}
"""


# --------------------------------------------------------------------------
# 70. running_spend — per-group ORDERED window prefix scan (cumulative sum)
# --------------------------------------------------------------------------


def q_running_spend(sf_dir: str):
    """Cumulative per-customer spend in (o_orderdate, o_orderkey) order —
    the ordered-window prefix-scan family (SUM OVER PARTITION BY ...
    ORDER BY ... ROWS UNBOUNDED PRECEDING), distinct from the tumbling/
    sliding event-time windows already in the catalog. Scale shape: one
    hash exchange on the partition key; each reduce task sorts only its
    own customers' rows and runs a vectorized grouped cumsum — no global
    sort, no driver state. (The corpus-wide analogue, a cross-partition
    ordered scan, is ``curate.packed_sequences``' two-phase prefix sum.)"""
    orders = _read(
        sf_dir, "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def scan(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderdate", "o_orderkey"], kind="mergesort"
        ).copy()
        df["running_spend"] = df.groupby("o_custkey", sort=False)[
            "o_totalprice"
        ].cumsum()
        return df

    out = ops.bucketed_group_apply(orders, ["o_custkey"], scan)
    return _round_cols(out, {"running_spend": 2})


SQL_RUNNING_SPEND = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
FROM orders
"""


# --------------------------------------------------------------------------
# 71. cube_orders — GROUP BY CUBE multi-level aggregate (all key subsets)
# --------------------------------------------------------------------------


def q_cube_orders(sf_dir: str):
    """SQL GROUP BY CUBE(status, priority): all four grouping sets —
    (status, priority), (status), (priority), () — rolled keys NULL.
    Like ROLLUP, the corpus is scanned ONCE (the finest-level combiner
    groupby); every coarser level including the non-prefix (priority)
    set re-aggregates the dimension-sized finest result, so the 2^n
    grouping sets cost 2^n dimension-sized re-groupbys, not 2^n scans
    (`ops.cube_sum` / `ops.grouping_sets_sum`)."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    out = ops.cube_sum(
        ds, ["o_orderstatus", "o_orderpriority"],
        sums={"o_totalprice": "revenue"}, count_as="n",
    )
    return _round_cols(out, {"revenue": 2})


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue, count(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# 72. price_dispersion — grouped second-moment stats (var/std/covar/corr)
# --------------------------------------------------------------------------


def q_price_dispersion(sf_dir: str):
    """Grouped variance / stddev / covariance / correlation in ONE
    exchange via mergeable sufficient statistics (sum, sum-of-squares,
    sum-of-products fused into the combiner split —
    ``ops.grouped_moments``). The distributed-numerics profile pass a
    curation pipeline runs per source/shard; rounding is sized to the
    statistic's magnitude so the float64 sufficient-statistic error
    (~1e-10 relative) stays far inside the rounded quantum."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = ops.grouped_moments(
        ds, ["l_returnflag", "l_linestatus"],
        cols=["l_extendedprice"],
        pairs=[("l_quantity", "l_extendedprice")],
        count_as="n",
    )

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "n": df["n"],
                "price_mean": df["l_extendedprice_mean"],
                "price_var": df["l_extendedprice_var"],
                "price_std": df["l_extendedprice_std"],
                "covar_qty_price": df["covar_l_quantity_l_extendedprice"],
                "corr_qty_price": df["corr_l_quantity_l_extendedprice"],
            }
        )

    out = out.map_batches(shape, batch_format="pandas")
    return _round_cols(
        out,
        {"price_mean": 4, "price_var": 0, "price_std": 4,
         "covar_qty_price": 2, "corr_qty_price": 6},
    )


SQL_PRICE_DISPERSION = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(avg(l_extendedprice), 4)                        AS price_mean,
       round(var_samp(l_extendedprice), 0)                   AS price_var,
       round(stddev_samp(l_extendedprice), 4)                AS price_std,
       round(covar_samp(l_quantity, l_extendedprice), 2)     AS covar_qty_price,
       round(corr(l_quantity, l_extendedprice), 6)           AS corr_qty_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# 73. customer_order_shift — LAG/LEAD ordered window within partitions
# --------------------------------------------------------------------------


def q_customer_order_shift(sf_dir: str):
    """Per-customer LAG(1)/LEAD(1) of order value in order-date order
    (``ops.shift_per_group``): one hash exchange on the partition key,
    per-partition sort + vectorized grouped shift in the reduce — the
    neighboring-row window family, complementing the prefix-scan
    (running_spend) and rank (ranked_orders) windows. NULL past the
    partition edge, matching SQL lag/lead."""
    orders = _read(
        sf_dir, "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    out = ops.shift_per_group(
        orders, ["o_custkey"], ["o_orderdate", "o_orderkey"],
        shifts=[("o_totalprice", 1, "prev_total"),
                ("o_totalprice", -1, "next_total")],
    )
    return _round_cols(out, {"prev_total": 2, "next_total": 2})


SQL_CUSTOMER_ORDER_SHIFT = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(lag(o_totalprice) OVER w, 2)  AS prev_total,
       round(lead(o_totalprice) OVER w, 2) AS next_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# 74. user_top_event — grouped MODE (deterministic canonical pick)
# --------------------------------------------------------------------------


def q_user_top_event(sf_dir: str):
    """Most frequent event_type per user with deterministic tie-break
    (count desc, value asc) — ``ops.mode_per_group``, the
    canonical-representative-selection shape (the reference picks a
    dominant surface form per entity the same way). One corpus-scale
    combiner exchange + one dimension-sized argmax exchange."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return ops.mode_per_group(
        ev, ["user_id"], "event_type", out="top_event", count_as="n_events"
    )


SQL_USER_TOP_EVENT = """
SELECT user_id, event_type AS top_event, n AS n_events FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# 75/76. set ops — INTERSECT / EXCEPT distinct row-set semantics
# --------------------------------------------------------------------------


def q_purchase_and_signup_users(sf_dir: str):
    """Users with BOTH a purchase and a signup event — SQL INTERSECT
    (``ops.set_op``): per-batch distinct combiners, one co-partitioned
    exchange on the row itself, membership resolved per reduce."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    pur = ev.filter(expr="event_type == 'purchase'")
    sig = ev.filter(expr="event_type == 'signup'")
    return ops.set_op(pur, sig, ["user_id"], how="intersect")


SQL_PURCHASE_AND_SIGNUP = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
"""


def q_high_qty_only_orders(sf_dir: str):
    """Order keys having a high-quantity lineitem but NO low-quantity
    one — SQL EXCEPT (distinct row-set semantics; the full-row analogue
    of the keyed anti join already in the catalog). Note: a genuinely
    EMPTY result would lose its schema through ``Dataset.to_pandas``
    (Ray returns a column-less frame for 0-row datasets), so set-op
    catalog queries are chosen to be non-degenerate at every sf."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    hi = li.filter(expr="l_quantity >= 45").select_columns(["l_orderkey"])
    lo = li.filter(expr="l_quantity <= 5").select_columns(["l_orderkey"])
    return ops.set_op(hi, lo, ["l_orderkey"], how="except")


SQL_HIGH_QTY_ONLY_ORDERS = """
SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45
EXCEPT
SELECT l_orderkey FROM lineitem WHERE l_quantity <= 5
"""


# --------------------------------------------------------------------------
# 77. order_value_quartiles — PERCENT_RANK / CUME_DIST / NTILE windows
# --------------------------------------------------------------------------


def q_order_value_quartiles(sf_dir: str):
    """Per-customer rank-family windows over order value
    (``ops.rank_windows_per_group``): percent_rank, cume_dist and
    quartile (NTILE(4)) in one partition-keyed exchange — completes
    the window family next to rank (ranked_orders), prefix scan
    (running_spend) and lag/lead (customer_order_shift). The
    (o_totalprice, o_orderkey) order is total within a partition, so
    rank == row_number and tie semantics are unambiguous."""
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"],
    )
    return ops.rank_windows_per_group(
        orders, ["o_custkey"], ["o_totalprice", "o_orderkey"],
        percent_rank_as="pr", cume_dist_as="cd",
        ntile_as="quartile", k_ntile=4,
    )


SQL_ORDER_VALUE_QUARTILES = """
SELECT o_custkey, o_orderkey, o_totalprice,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w    AS cd,
       ntile(4) OVER w       AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


# --------------------------------------------------------------------------
# 78. price_histogram — equal-width histogram, data-derived bounds
# --------------------------------------------------------------------------


def q_price_histogram(sf_dir: str):
    """20-bin equal-width histogram of order value with data-derived
    min/max bounds (``ops.histogram_equal_width``): one Min/Max
    aggregate pass, one bucket+combiner pass — the distribution-profile
    op a curation pipeline runs per column/shard. Identical float64
    arithmetic on both sides makes the oracle bit-exact."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return ops.histogram_equal_width(orders, "o_totalprice", nbins=20)


SQL_PRICE_HISTOGRAM = """
WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
SELECT CAST(least(floor((o_totalprice - b.mn) / ((b.mx - b.mn) / 20)), 19)
            AS BIGINT) AS bucket,
       count(*) AS n
FROM orders, b
GROUP BY 1
"""


# --------------------------------------------------------------------------
# 79. price_shape — grouped skewness/kurtosis from raw power sums
# --------------------------------------------------------------------------


def q_price_shape(sf_dir: str):
    """Grouped sample skewness + excess kurtosis in the same ONE
    sufficient-statistics exchange as ``price_dispersion``
    (``ops.grouped_moments(shape=...)`` — x^3/x^4 sums fused into the
    combiner split). Same raw-power-sum formulation as DuckDB's
    skewness()/kurtosis(), agreeing to ~1e-13, so round(6) is far
    inside the quantum."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = ops.grouped_moments(
        ds, ["l_returnflag"], cols=[], shape=["l_extendedprice"],
        count_as="n",
    )

    def shape_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "n": df["n"],
                "price_skew": df["l_extendedprice_skew"],
                "price_kurt": df["l_extendedprice_kurt"],
            }
        )

    out = out.map_batches(shape_cols, batch_format="pandas")
    return _round_cols(out, {"price_skew": 6, "price_kurt": 6})


SQL_PRICE_SHAPE = """
SELECT l_returnflag, count(*) AS n,
       round(skewness(l_extendedprice), 6) AS price_skew,
       round(kurtosis(l_extendedprice), 6) AS price_kurt
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# 80. weighted_doc_sample — Efraimidis–Spirakis weighted sampling
# without replacement (length-weighted doc pick; deterministic
# hash-uniform so DuckDB reproduces the exact sample)
# --------------------------------------------------------------------------

_WS_K = 40


def q_weighted_doc_sample(sf_dir: str):
    """Length-weighted document sample without replacement
    (``curate.weighted_sample``, Efraimidis–Spirakis priority keys):
    the curation step that oversamples long/high-quality documents
    when building a training mix. u comes from the shared Knuth
    multiplicative hash; key = ln(u)/n_chars; top-k keys win. Both
    sides run the identical float64 expression — selection boundaries
    sit ~1/n of the key range apart, far beyond any ulp divergence in
    ln()."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return curate.weighted_sample(
        docs, k=_WS_K, weight_col="n_chars", id_col="doc_id"
    )


SQL_WEIGHTED_DOC_SAMPLE = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         ln((((doc_id * 2654435761) % 4294967296) + 0.5) / 4294967296.0)
           / n_chars AS es_key
  FROM documents
  WHERE n_chars > 0
  ORDER BY es_key DESC
  LIMIT {_WS_K}
)
"""


# --------------------------------------------------------------------------
# 81. urgent_revenue — Bloom-prefiltered exchange join (the
# shuffle-volume reducer for selective joins at 100 TB)
# --------------------------------------------------------------------------


def q_urgent_revenue(sf_dir: str):
    """Revenue of lineitems belonging to URGENT orders, with the probe
    side Bloom-prefiltered before the exchange: the build side's keys
    compress to a fixed-size Bloom filter (10 bits/key, ~1% FP,
    ``ops.build_key_bloom`` — per-block partials OR-merged) broadcast
    once; probe rows that cannot match are dropped AT THE SCAN
    (``ops.bloom_key_filter``), so the exact inner exchange join that
    follows ships ~|match| rows instead of the whole probe table.
    False positives are removed by the join itself — semantics stay
    exact, which is why a plain-SQL oracle can check it."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def urgent_keys(tbl: pa.Table) -> pa.Table:
        m = pc.equal(tbl["o_orderpriority"], "1-URGENT")
        return pa.table({"l_orderkey": tbl.filter(m)["o_orderkey"]})

    urgent = orders.map_batches(
        urgent_keys, batch_format="pyarrow"
    ).materialize()
    bloom_ref = ray.put(ops.build_key_bloom(urgent, ["l_orderkey"]))

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_returnflag": batch["l_returnflag"],
                "revenue": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
            }
        )

    pre = li.map_batches(
        ops.bloom_key_filter(bloom_ref, ["l_orderkey"]),
        batch_format="pyarrow",
    ).map_batches(rev, batch_format="pyarrow")
    joined = ops.exchange_join(pre, urgent, on=["l_orderkey"], how="inner")
    agg = ops.partial_groupby_sum(
        joined, ["l_returnflag"], sums={"revenue": "revenue"},
        count_as="n_items",
    )
    return _round_cols(agg, {"revenue": 2})


SQL_URGENT_REVENUE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# 82. funnel_stages — ordered per-user event-sequence match
# (view -> click -> purchase), the product-analytics funnel
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_stages(sf_dir: str):
    """Per-user conversion funnel: t_view = first view, t_click =
    first click AT OR AFTER t_view, t_purchase = first purchase at or
    after t_click; ``stage`` counts completed steps (0-3; the chain is
    prefix-monotone by construction). One hash exchange on user_id
    with the step filter fused into the split; per-bucket logic is
    vectorized pandas over MANY users (grouped mins + merges), never a
    per-user Python loop. Universe = users with at least one funnel
    event."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(tbl: pa.Table) -> pa.Table:
        return tbl.filter(
            pc.is_in(tbl["event_type"], value_set=pa.array(_FUNNEL_STEPS))
        )

    def funnel(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "stage": pd.Series([], dtype="int64"),
                    "t_view": pd.Series([], dtype="datetime64[us]"),
                    "t_click": pd.Series([], dtype="datetime64[us]"),
                    "t_purchase": pd.Series([], dtype="datetime64[us]"),
                }
            )
        v = (
            df[df["event_type"] == "view"]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_view"})
        )
        c = df[df["event_type"] == "click"][["user_id", "ts"]].merge(
            v, on="user_id"
        )
        c = (
            c[c["ts"] >= c["t_view"]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_click"})
        )
        p = df[df["event_type"] == "purchase"][["user_id", "ts"]].merge(
            c, on="user_id"
        )
        p = (
            p[p["ts"] >= p["t_click"]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_purchase"})
        )
        out = pd.DataFrame({"user_id": np.sort(df["user_id"].unique())})
        out = (
            out.merge(v, on="user_id", how="left")
            .merge(c[["user_id", "t_click"]], on="user_id", how="left")
            .merge(p[["user_id", "t_purchase"]], on="user_id", how="left")
        )
        out["stage"] = (
            out[["t_view", "t_click", "t_purchase"]]
            .notna()
            .sum(axis=1)
            .astype("int64")
        )
        return out[["user_id", "stage", "t_view", "t_click", "t_purchase"]]

    return ops.bucketed_group_apply(ev, ["user_id"], funnel, map_fn=pre)


SQL_FUNNEL_STAGES = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id,
       CAST((t_view IS NOT NULL) AS BIGINT)
         + CAST((t_click IS NOT NULL) AS BIGINT)
         + CAST((t_purchase IS NOT NULL) AS BIGINT) AS stage,
       t_view, t_click, t_purchase
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


# --------------------------------------------------------------------------
# 83. fuzzy_name_pairs — edit-distance<=1 similarity self-join
# (FastSS deletion variants; the surface-form canonicalization matcher)
# --------------------------------------------------------------------------


def q_fuzzy_name_pairs(sf_dir: str):
    """All supplier-name pairs within one edit (typo/digit-slip
    surface forms that canonicalization would merge into one entity
    node): ``dedup.edit1_pairs`` — FastSS deletion-variant explode
    fused into one hash exchange, vectorized exact <=1-edit verify per
    bucket, distinct-combiner pair dedup. Exact semantics, so DuckDB's
    levenshtein() cross join is the oracle."""
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return dedup.edit1_pairs(sup, id_col="s_suppkey", name_col="s_name")


SQL_FUZZY_NAME_PAIRS = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


# --------------------------------------------------------------------------
# 84. degree_histogram — graph degree-distribution profile
# (two-level aggregation: distinct edges -> per-node degree ->
# nodes per degree)
# --------------------------------------------------------------------------


def q_degree_histogram(sf_dir: str):
    """Degree distribution of the supplier->part co-supply graph: the
    graph-profiling pass a KG build runs before choosing skew
    strategies (how heavy is the head?). Three shuffle-free-combiner
    stages: distinct edge combiner, per-supplier degree count
    (corpus->node scale), nodes-per-degree count (node->profile
    scale) — each exchange input is pre-shrunk by the previous
    level."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = ops.distinct(li, ["l_suppkey", "l_partkey"])
    deg = ops.partial_groupby_sum(
        edges, ["l_suppkey"], sums={}, count_as="deg"
    )
    return ops.partial_groupby_sum(
        deg, ["deg"], sums={}, count_as="n_suppliers"
    )


SQL_DEGREE_HISTOGRAM = """
WITH deg AS (
  SELECT l_suppkey, count(DISTINCT l_partkey) AS deg
  FROM lineitem GROUP BY l_suppkey
)
SELECT deg, count(*) AS n_suppliers FROM deg GROUP BY deg
"""


# --------------------------------------------------------------------------
# 85. supplier_projection — bipartite graph projection
# (supplier-supplier co-supply edges weighted by shared parts)
# --------------------------------------------------------------------------


def q_supplier_projection(sf_dir: str):
    """Project the thinned part<->supplier bipartite graph onto
    suppliers: edge (s_a, s_b) weighted by the number of parts both
    supply — the co-occurrence projection KG construction uses to
    densify entity-entity relations (same shape as the token
    co-occurrence matrix, A9, but over graph adjacency). One exchange
    co-locates each part's supplier set (filter fused into the split;
    per-part dedup inside the bucket), vectorized grouped-arange
    all-pairs per part, then a combiner count exchange over the pair
    key. Thinning to l_quantity <= 2 keeps part degrees small — the
    documented requirement of any pairwise projection (a hub part of
    degree d costs d(d-1)/2 pairs; real pipelines cap or sample hub
    nodes)."""
    from .stages.dedup import _pairs_within_buckets

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def thin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_quantity"], pa.scalar(2)))
        return t.select(["l_partkey", "l_suppkey"])

    def pairs(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        out = _pairs_within_buckets(
            df, "l_partkey", "l_suppkey", dense_cap=None
        )
        return out.rename(columns={"a": "s_a", "b": "s_b"})

    pair_ds = ops.bucketed_group_apply(
        li, ["l_partkey"], pairs, map_fn=thin
    )
    return ops.partial_groupby_sum(
        pair_ds, ["s_a", "s_b"], sums={}, count_as="shared_parts"
    )


SQL_SUPPLIER_PROJECTION = """
WITH e AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity <= 2
)
SELECT a.l_suppkey AS s_a, b.l_suppkey AS s_b, count(*) AS shared_parts
FROM e a JOIN e b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey < b.l_suppkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# 86. purchase_next_error — FORWARD as-of join (next event after):
# for each purchase, the first error event of the same user at or
# after the purchase timestamp
# --------------------------------------------------------------------------


def q_purchase_next_error(sf_dir: str):
    """Forward-direction as-of join (``ops.asof_join(direction=
    "forward")``): the "did an error follow this purchase?" lookup —
    same one-exchange ``merge_asof`` machinery as the backward join
    ``purchase_last_signup``, searching up instead of down. Unmatched
    left rows keep typed nulls (coalesced to the epoch so the hash
    compare is null-free on both sides)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    left = ds.map_batches(
        lambda t: t.filter(
            pc.equal(t["event_type"], pa.scalar("purchase"))
        ).select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
    )
    right = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("error"))).select(
            ["user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    out = ops.asof_join(
        left, right, by="user_id", on="ts", right_cols=[],
        direction="forward",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"ts_right": "ts_error"})
        df["ts_error"] = pd.to_datetime(df["ts_error"]).fillna(_EPOCH)
        return df

    return out.map_batches(finish, batch_format="pandas")


SQL_PURCHASE_NEXT_ERROR = """
SELECT p.event_id, p.user_id, p.ts,
       coalesce(e.ts, TIMESTAMP '1970-01-01') AS ts_error
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND p.ts <= e.ts
"""


# --------------------------------------------------------------------------
# 87. user_event_pivot — conditional-aggregation pivot (one count
# column per event type, computed in the same single combiner pass)
# --------------------------------------------------------------------------

_PIVOT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_user_event_pivot(sf_dir: str):
    """Long->wide pivot by conditional aggregation: per user, one
    count column per (closed, small) event-type vocabulary — the
    feature-vector assembly shape (reference: the per-user activity
    profile features). The CASE columns are vectorized Arrow compares
    fused as ``pre_fn`` into the ONE combiner exchange of
    ``partial_groupby_sum`` — a pivot costs exactly one grouped-sum
    pass, never a shuffle per column."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def widen(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for typ in _PIVOT_TYPES:
            cols[f"n_{typ}"] = pc.cast(
                pc.equal(t["event_type"], pa.scalar(typ)), pa.int64()
            )
        return pa.table(cols)

    return ops.partial_groupby_sum(
        ev.map_batches(widen, batch_format="pyarrow"),
        ["user_id"],
        sums={f"n_{t}": f"n_{t}" for t in _PIVOT_TYPES},
    )


SQL_USER_EVENT_PIVOT = """
SELECT user_id,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# 88. user_value_moving_avg — ROWS-window moving average per user
# (ordered rolling aggregate, the smoothing pass of activity signals)
# --------------------------------------------------------------------------


def q_user_value_moving_avg(sf_dir: str):
    """Per-user moving average of event value over the last 3 events
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW, ordered by ts then
    event_id): one user-keyed exchange, pandas ``rolling`` vectorized
    over each bucket's sorted frame. Window sums are 3-term sequential
    adds on both sides, so round(6) sits far outside float drift."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def roll(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ma = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(3, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        out = df[["event_id", "user_id", "ts"]].copy()
        out["value_ma3"] = ma.round(6)
        return out

    return ops.bucketed_group_apply(ev, ["user_id"], roll)


SQL_USER_VALUE_MOVING_AVG = """
SELECT event_id, user_id, ts,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 6) AS value_ma3
FROM events
"""


# --------------------------------------------------------------------------
# 89. above_avg_orders — correlated-subquery join-back (TPC-H Q17
# shape: rows compared against their own group's aggregate)
# --------------------------------------------------------------------------


def q_above_avg_orders(sf_dir: str):
    """Orders strictly above 1.2x their customer's average order value
    — the correlated-subquery decorrelation pattern (aggregate once
    per group, join back, filter): one combiner exchange produces the
    per-customer sums (dimension-sized), the join back is the same
    hash exchange keyed identically (partitioning reuse), and the
    filter is a vectorized compare. The aggregate is re-derived as
    sum/count instead of avg so both sides divide the same two exact
    integers-of-doubles — bit-identical thresholds."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    avg = ops.partial_groupby_sum(
        orders, ["o_custkey"], sums={"o_totalprice": "sum_price"},
        count_as="n_orders",
    )
    joined = ops.exchange_join(orders, avg, on=["o_custkey"], how="inner")

    def filt(t: pa.Table) -> pa.Table:
        thresh = pc.multiply(
            pc.divide(t["sum_price"], pc.cast(t["n_orders"], pa.float64())),
            pa.scalar(1.2),
        )
        t = t.filter(pc.greater(t["o_totalprice"], thresh))
        return t.select(["o_orderkey", "o_custkey", "o_totalprice"])

    return joined.map_batches(filt, batch_format="pyarrow")


SQL_ABOVE_AVG_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
JOIN (
  SELECT o_custkey AS ck, sum(o_totalprice) AS sum_price,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) a ON o.o_custkey = a.ck
WHERE o_totalprice > (sum_price / n_orders) * 1.2
"""


# --------------------------------------------------------------------------
# 90. user_type_entropy — per-group Shannon entropy of the event-type
# distribution (the activity-diversity / bot-detection profile signal)
# --------------------------------------------------------------------------


def q_user_type_entropy(sf_dir: str):
    """Shannon entropy H = -sum(p ln p) of each user's event-type mix:
    one combiner exchange to (user, type) counts (corpus->profile
    scale), then a user-keyed dimension-sized exchange computes H
    vectorized. Entropy near 0 = single-behavior account, high H =
    diverse activity — the profile feature SocialLink-style activity
    scoring draws on. ln/div on identical float64 inputs both sides;
    round(6) is far outside the drift of a <=5-term sum."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = ops.partial_groupby_sum(
        ev, ["user_id", "event_type"], sums={}, count_as="n"
    )

    def entropy(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "type_entropy": pd.Series(dtype="float64"),
                }
            )
        tot = df.groupby("user_id")["n"].transform("sum")
        p = df["n"] / tot
        plogp = p * np.log(p)
        out = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "n_events": df["n"],
                    "plogp": plogp,
                }
            )
            .groupby("user_id", as_index=False)
            .agg(n_events=("n_events", "sum"), type_entropy=("plogp", "sum"))
        )
        out["type_entropy"] = (-out["type_entropy"]).round(6)
        return out

    return ops.bucketed_group_apply(counts, ["user_id"], entropy)


SQL_USER_TYPE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
), t AS (
  SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id
)
SELECT c.user_id, CAST(sum(c.n) AS BIGINT) AS n_events,
       round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS type_entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
"""


# --------------------------------------------------------------------------
# 88b. q5_local_revenue — TPC-H Q5 shape: six-table join chain with a
# cross-side equality predicate (local-supplier revenue)
# --------------------------------------------------------------------------


def q5_local_revenue(sf_dir: str):
    """TPC-H Q5: revenue from lineitems where the supplier and the
    ordering customer share an ASIA nation. Exercises the deep join
    chain: region/nation resolved on the driver (dimension-tiny),
    customer×orders through one custkey exchange join, lineitem joined
    by orderkey in a second exchange, the supplier DIMENSION broadcast
    once (ray.put) with the c_nationkey = s_nationkey cross-predicate
    applied map-side, then a nation-keyed combiner sum. Two corpus
    exchanges total — dimension tables never shuffle."""
    nat = _small_pdf(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _small_pdf(sf_dir, "region", ["r_regionkey", "r_name"])
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia.loc[asia["r_name"] == "ASIA", ["n_nationkey", "n_name"]]
    nkeys = set(asia["n_nationkey"].tolist())

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
            }
        ).filter(
            pc.is_in(
                t["c_nationkey"],
                value_set=pa.array(sorted(nkeys)).cast(
                    t["c_nationkey"].type
                ),
            )
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    ords = ops.exchange_join(orders, cust, on=["o_custkey"], how="inner")
    ords = ords.map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["o_orderkey"], "c_nationkey": t["c_nationkey"]}
        ),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue": pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"]),
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow")
    j = ops.exchange_join(li, ords, on=["l_orderkey"], how="inner")

    supp = _small_pdf(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = supp[supp["s_nationkey"].isin(nkeys)].rename(
        columns={"s_suppkey": "l_suppkey"}
    )
    j = ops.broadcast_join(j, supp, on="l_suppkey", how="inner")
    j = j.map_batches(
        lambda t: t.filter(
            pc.equal(t["c_nationkey"], t["s_nationkey"])
        ),
        batch_format="pyarrow",
    )
    agg = ops.partial_groupby_sum(
        j, ["s_nationkey"], sums={"revenue": "revenue"}
    )
    named = ops.broadcast_join(
        agg,
        asia.rename(columns={"n_nationkey": "s_nationkey"}),
        on="s_nationkey",
        how="inner",
    ).map_batches(
        lambda t: pa.table({"n_name": t["n_name"], "revenue": t["revenue"]}),
        batch_format="pyarrow",
    )
    return _round_cols(named, {"revenue": 2})


SQL_Q5_LOCAL_REVENUE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# 89a. hourly_dense_counts — time-series gap filling (densify)
# --------------------------------------------------------------------------


def q_hourly_dense_counts(sf_dir: str):
    """Dense hourly event counts per type with ZERO-FILLED gaps between
    each type's first and last active hour — the gap-fill op every
    time-series consumer (rate monitors, seasonality fits) needs before
    windowing. Scale shape: corpus collapses to (type, hour) via one
    combiner exchange; densification runs in the type-keyed reduce as a
    vectorized arange + searchsorted scatter — generated zero rows are
    dimension-sized (types × hours) and never touch the corpus scan."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def to_hours(tbl: pa.Table) -> pa.Table:
        us = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": tbl["event_type"],
                "hr": (us // 1_000_000) // 3600,
            }
        )

    counts = ops.partial_groupby_sum(
        ev, ["event_type", "hr"], count_as="n", pre_fn=to_hours
    )

    def densify(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "hour": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        outs = []
        for et, grp in df.groupby("event_type", sort=False):
            g = grp.groupby("hr", as_index=False)["n"].sum()
            hrs = g["hr"].to_numpy(np.int64)
            mn, mx = hrs.min(), hrs.max()
            dense = np.arange(mn, mx + 1, dtype=np.int64)
            vals = np.zeros(len(dense), dtype=np.int64)
            vals[hrs - mn] = g["n"].to_numpy(np.int64)
            outs.append(
                pd.DataFrame(
                    {"event_type": et, "hour": dense, "n": vals}
                )
            )
        return pd.concat(outs, ignore_index=True)

    return ops.bucketed_group_apply(counts, ["event_type"], densify)


SQL_HOURLY_DENSE_COUNTS = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr FROM events
),
b AS (SELECT event_type, min(hr) mn, max(hr) mx FROM e GROUP BY event_type),
g AS (SELECT event_type, unnest(range(mn, mx+1)) AS hr FROM b),
c AS (SELECT event_type, hr, count(*) AS n FROM e GROUP BY event_type, hr)
SELECT g.event_type, g.hr AS hour, COALESCE(c.n, 0)::BIGINT AS n
FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr
"""


# --------------------------------------------------------------------------
# 89b. bigram_pmi — statistical collocation / phrase detection
# (the word2vec-phrases preprocessing op, Mikolov et al. 2013 shape,
# scored with pointwise mutual information)
# --------------------------------------------------------------------------


def q_bigram_pmi(sf_dir: str):
    """Corpus-wide bigram PMI: ln(p(ab) / (p(a)·p(b))) with unigram
    probabilities over tokens and bigram probabilities over adjacent
    pairs. Scale shape: bigram emission is pure Arrow slicing (two
    shifted views of the flattened token array, doc boundaries masked
    vectorized) fused into a (w1,w2) combiner exchange; unigram counts
    are the token_freq combiner; both join exchanges are
    DIMENSION-sized (vocab², vocab). Totals are two sums over the
    aggregated tables — never a second corpus scan. min-count 5 keeps
    the emitted table phrase-candidate-sized."""
    docs = _read(sf_dir, "documents", ["text"])

    def bi_emit(tbl: pa.Table) -> pa.Table:
        splits = pc.split_pattern(tbl["text"], " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = splits.values
        n = len(flat)
        if n < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string())}
            )
        offs = np.asarray(splits.offsets)
        valid = np.ones(n - 1, dtype=bool)
        # a doc's last token can't start a bigram
        last = offs[1:][offs[1:] > offs[:-1]] - 1
        valid[last[last < n - 1]] = False
        mask = pa.array(valid)
        return pa.table(
            {
                "w1": flat.slice(0, n - 1).filter(mask),
                "w2": flat.slice(1, n - 1).filter(mask),
            }
        )

    def uni_emit(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"w": pc.list_flatten(pc.split_pattern(tbl["text"], " "))}
        )

    bc = ops.partial_groupby_sum(
        docs, ["w1", "w2"], count_as="n_ab", pre_fn=bi_emit
    ).materialize()
    uc = ops.partial_groupby_sum(
        docs, ["w"], count_as="c", pre_fn=uni_emit
    ).materialize()
    n_uni = float(uc.sum("c"))
    n_bi = float(bc.sum("n_ab"))

    freq = bc.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_ab"], pa.scalar(5))),
        batch_format="pyarrow",
    )
    ua = uc.map_batches(
        lambda t: pa.table({"w1": t["w"], "c_a": t["c"]}),
        batch_format="pyarrow",
    )
    ub = uc.map_batches(
        lambda t: pa.table({"w2": t["w"], "c_b": t["c"]}),
        batch_format="pyarrow",
    )
    j = ops.exchange_join(freq, ua, on=["w1"], how="inner")
    j = ops.exchange_join(j, ub, on=["w2"], how="inner")

    def pmi(tbl: pa.Table) -> pa.Table:
        c_ab = tbl["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = tbl["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = tbl["c_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        val = np.log((c_ab * n_uni * n_uni) / (n_bi * c_a * c_b))
        return pa.table(
            {
                "w1": tbl["w1"],
                "w2": tbl["w2"],
                "n_ab": tbl["n_ab"],
                "pmi": val,
            }
        )

    return _round_cols(
        j.map_batches(pmi, batch_format="pyarrow"), {"pmi": 6}
    )


SQL_BIGRAM_PMI = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM toks),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
nu AS (SELECT count(*)::DOUBLE AS n FROM uni),
bi AS (
  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
bc AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY w1, w2),
nb AS (SELECT count(*)::DOUBLE AS n FROM bi)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS n_ab,
       round(ln((c_ab * nu.n * nu.n) / (nb.n * ua.c * ub.c)), 6) AS pmi
FROM bc, nu, nb
JOIN uc ua ON bc.w1 = ua.w
JOIN uc ub ON bc.w2 = ub.w
WHERE c_ab >= 5
"""


# --------------------------------------------------------------------------
# 90a. type_user_cardinality — grouped HLL approx distinct (rows-only:
# probabilistic estimate; pytest pins accuracy vs exact)
# --------------------------------------------------------------------------


def q_type_user_cardinality(sf_dir: str):
    """Approximate distinct users per event type via per-key mergeable
    HLL registers — constant-size sketches through one dimension-sized
    exchange instead of the exact path's corpus-wide (key, user)
    shuffle. Deterministic (fixed-key sip hashing), so rows-only
    cross-run checks are stable; accuracy pinned by pytest vs exact."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    out = ops.grouped_approx_count_distinct(
        ev, ["event_type"], "user_id", p=12
    )
    return _round_cols(out, {"approx_distinct": 2})


# --------------------------------------------------------------------------
# 90b. price_mad — grouped robust dispersion (median absolute deviation)
# --------------------------------------------------------------------------


def q_price_mad(sf_dir: str):
    """Per-priority MAD + median of order value — the robust
    column-profile pair (outlier-insensitive, unlike var/std in
    price_dispersion). One exchange; both medians in the same reduce."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return ops.grouped_mad(
        orders, ["o_orderpriority"], "o_totalprice",
        mad_as="mad_price", median_as="med_price", round_decimals=4,
    )


SQL_PRICE_MAD = """
SELECT o_orderpriority,
       round(mad(o_totalprice), 4) AS mad_price,
       round(median(o_totalprice), 4) AS med_price
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# 91. event_transitions — first-order Markov transition matrix of
# per-user event sequences (the session-model / behavior-profile shape)
# --------------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """Corpus-wide (prev_type -> next_type) transition counts and row
    probabilities over per-user event sequences ordered by (ts,
    event_id). Scale shape: ONE user-keyed hash exchange whose reduce
    both computes the grouped LEAD and pre-aggregates (prev, next)
    partial counts (bucket output is T² rows, not corpus rows), then a
    dimension-sized exchange sums partials and normalizes p per
    prev_type. p is a single div of identical int64 counts both sides;
    round(6) absorbs nothing but formatting."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def partial(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype="object"),
                    "next_type": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        nxt = df.groupby("user_id", sort=False)["event_type"].shift(-1)
        m = nxt.notna()
        out = pd.DataFrame(
            {"prev_type": df["event_type"][m], "next_type": nxt[m]}
        )
        return (
            out.groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    parts = ops.bucketed_group_apply(ev, ["user_id"], partial)

    def finalize(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype="object"),
                    "next_type": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                    "p": pd.Series(dtype="float64"),
                }
            )
        g = df.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
        tot = g.groupby("prev_type")["n"].transform("sum")
        g["n"] = g["n"].astype("int64")
        # half-away-from-zero to match DuckDB round() (pandas .round is
        # half-to-even; a tie exactly representable in binary, e.g.
        # p = 1/128 = 0.0078125, would disagree by one quantum)
        p = (g["n"] / tot).to_numpy()
        g["p"] = np.floor(np.abs(p) * 1e6 + 0.5) / 1e6 * np.sign(p)
        return g

    return ops.bucketed_group_apply(parts, ["prev_type"], finalize)


SQL_EVENT_TRANSITIONS = """
WITH nx AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), c AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM nx WHERE next_type IS NOT NULL GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM c
"""


# --------------------------------------------------------------------------
# 92. cohort_retention — signup-week cohort x weeks-since activity
# matrix (the classic retention triangle)
# --------------------------------------------------------------------------


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention: cohort = each user's first active week,
    cells count distinct users active ``week_offset`` weeks later.
    Week index is pure integer arithmetic ((epoch_sec - 345600) //
    604800, Monday-aligned) so both sides share exact semantics with no
    calendar edge cases. Scale shape: per-batch distinct (user, week)
    combiner, ONE user-keyed exchange computing min-week + offsets with
    (cohort, offset) partials pre-aggregated in the reduce, then a
    dimension-sized combiner sum — distinct users are counted exactly
    once because the user-keyed exchange co-locates each user."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_weeks(tbl: pa.Table) -> pa.Table:
        us = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        sec = us // 1_000_000  # numpy floor division == SQL floor(epoch)
        wk = (sec - 345600) // 604800
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "wk": wk}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    weeks = ev.map_batches(to_weeks, batch_format="pyarrow")

    def per_user(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "cohort_week": pd.Series(dtype="int64"),
                    "week_offset": pd.Series(dtype="int64"),
                    "n_users": pd.Series(dtype="int64"),
                }
            )
        df = df.drop_duplicates()
        cw = df.groupby("user_id")["wk"].transform("min")
        # df rows are distinct (user, wk), so (cw, off) dupes within
        # the bucket can only come from DIFFERENT users — count all
        out = (
            pd.DataFrame({"cohort_week": cw, "week_offset": df["wk"] - cw})
            .groupby(["cohort_week", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = ops.bucketed_group_apply(weeks, ["user_id"], per_user)
    return ops.partial_groupby_sum(
        parts, ["cohort_week", "week_offset"], sums={"n_users": "n_users"}
    )


SQL_COHORT_RETENTION = """
WITH w AS (
  SELECT DISTINCT user_id,
         CAST(floor((epoch(ts) - 345600)/604800) AS BIGINT) AS wk
  FROM events
), c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id),
a AS (SELECT DISTINCT w.user_id, c.cw, w.wk - c.cw AS off
      FROM w JOIN c USING(user_id))
SELECT cw AS cohort_week, off AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cw, off
"""


# --------------------------------------------------------------------------
# 58-61. concrete profiling extractors (round-4 verdict item 5) — the
# reference's per-user profiling subsystem as named, oracle-backed
# queries. The synthetic corpus has no tweets, so each query documents
# its deterministic testdata analog (hashtags from leading tokens,
# mentions from a broadcast name set, urls synthesized from (doc_id,
# source)); the EXTRACTOR semantics — CamelCase splitting, tf-idf
# formulas, DOMAIN_PATTERN group 3, MAX/AVG merges — are the
# reference's, byte-exact where the oracle checks them.
# --------------------------------------------------------------------------

# the broadcast tracked-uid set for the mention analog (tokens drawn
# from the corpus vocabulary)
MENTION_UIDS = ["customer", "supplier", "spark", "window"]


def q_hashtag_split(sf_dir: str):
    """breakHashtag kernel (TextProcessor.java:129-147) over CamelCase
    hashtags synthesized per document from its first 3 tokens
    (capitalize-and-concat — the tweet-hashtag analog). EXACT oracle:
    RE2 global replace has identical scan semantics in Arrow and
    DuckDB."""
    from .pipelines import profiling

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def mk(batch: pa.Table) -> pa.Table:
        toks = [str(t).split()[:3] for t in batch["text"].to_pylist()]
        tags = pa.array(
            ["".join(w[:1].upper() + w[1:] for w in t) for t in toks]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "hashtag": tags,
                "processed": profiling.break_hashtags(tags),
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow")


SQL_HASHTAG_SPLIT = """
WITH h AS (
  SELECT doc_id,
         array_to_string(
           list_transform(list_slice(string_split(text, ' '), 1, 3),
                          w -> upper(substr(w, 1, 1)) || substr(w, 2)),
           '') AS hashtag
  FROM documents
)
SELECT doc_id, hashtag,
       ' <shash> '
       || regexp_replace(hashtag, '(^|[^\\p{Lu}])(\\p{Lu})', '\\1 \\2', 'g')
       || ' <ehash> ' AS processed
FROM h
"""


def q_hashtag_profiles(sf_dir: str):
    """HashtagExtractor per-author tf-idf profiles (AVG merge = count
    sum; tf = log2(n+1), idf = log10(1 + authors/(1+occurrences)),
    occurrence cutoff 3) — author = source, hashtags = first 3 tokens.
    EXACT oracle (the log formulas are plain SQL)."""
    from .pipelines import profiling

    ds = _read(sf_dir, "documents", ["source", "text"])
    out = profiling.hashtag_profiles(ds, "source", "text", n_tags=3)
    return _round_cols(out, {"tfidf": 6})


SQL_HASHTAG_PROFILES = """
WITH ex AS (
  SELECT source AS author,
         unnest(list_slice(string_split(text, ' '), 1, 3)) AS term
  FROM documents
), c AS (
  SELECT author, term, CAST(count(*) AS BIGINT) AS n
  FROM ex GROUP BY author, term
), d AS (SELECT term, sum(n) AS occ FROM c GROUP BY term),
a AS (SELECT count(DISTINCT author) AS na FROM c)
SELECT c.author, c.term, c.n,
       round((ln(c.n + 1) / ln(2)) * log10(1 + a.na / (1 + d.occ)), 6)
         AS tfidf
FROM c JOIN d USING (term) CROSS JOIN a
WHERE d.occ >= 3
"""


def q_mentioned_text_profiles(sf_dir: str):
    """MentionedTextExtractor: rows mentioning a tracked uid (token in
    the broadcast MENTION_UIDS set) credit their FULL text BOW to that
    uid, merged by count sum; tf = log2(n+1). EXACT oracle."""
    from .pipelines import profiling

    ds = _read(sf_dir, "documents", ["text"])
    out = profiling.mentioned_text_profiles(ds, "text", MENTION_UIDS)
    return _round_cols(out, {"tf": 6})


SQL_MENTIONED_TEXT_PROFILES = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), men AS (
  SELECT DISTINCT doc_id, term AS mention FROM toks
  WHERE term IN ('customer', 'supplier', 'spark', 'window')
), c AS (
  SELECT m.mention, t.term, CAST(count(*) AS BIGINT) AS n
  FROM men m JOIN toks t USING (doc_id)
  GROUP BY m.mention, t.term
)
SELECT mention, term, n, round(ln(n + 1) / ln(2), 6) AS tf FROM c
"""


def q_profile_url_domains(sf_dir: str):
    """ProfileExtractor profile vector: DOMAIN_PATTERN group-3 nominal
    ('none' on null/no-match) + nominal lang + n_chars, merged MAX =
    latest-wins per source through profile_aggregate (urls synthesized
    deterministically from (doc_id, source): mixed scheme/path/invalid
    /null shapes). EXACT oracle."""
    from .pipelines import profiling

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang", "n_chars"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_pylist()
        tld = np.array(["com", "org", "net"])
        urls = []
        for i, s in zip(ids, src):
            if i % 7 == 0:
                urls.append(None)
            elif i % 7 == 1:
                urls.append("not a url %%")
            else:
                u = f"{s}.example.{tld[i % 3]}"
                if i % 5 != 0:
                    u = "https://" + u
                if i % 2 == 0:
                    u += "/p"
                urls.append(u)
        return batch.append_column("url", pa.array(urls, pa.string()))

    ds2 = ds.map_batches(synth, batch_format="pyarrow")
    return profiling.profile_vectors(
        ds2, key="source", ts_col="doc_id", url_col="url",
        lang_col="lang", int_cols=("n_chars",), bool_cols=(),
    )


SQL_PROFILE_URL_DOMAINS = """
WITH u AS (
  SELECT doc_id, source, lang, n_chars,
    CASE WHEN doc_id % 7 = 0 THEN NULL
         WHEN doc_id % 7 = 1 THEN 'not a url %%'
         ELSE (CASE WHEN doc_id % 5 != 0 THEN 'https://' ELSE '' END)
              || source || '.example.'
              || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                  ELSE 'net' END)
              || (CASE WHEN doc_id % 2 = 0 THEN '/p' ELSE '' END)
    END AS url
  FROM documents
), d AS (
  SELECT *, CASE
      WHEN url IS NULL THEN 'none'
      WHEN NOT regexp_matches(lower(url),
        '^(https?://)?([\\p{L}0-9]+\\.)+(\\p{L}+)(/.*)?$')
        THEN 'none'
      ELSE regexp_extract(lower(url),
        '^(https?://)?([\\p{L}0-9]+\\.)+(\\p{L}+)(/.*)?$', 3)
    END AS url_domain
  FROM u
), latest AS (
  SELECT source, lang AS last_lang, url_domain AS last_url_domain,
         n_chars AS last_n_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY doc_id DESC) AS rn
        FROM d) WHERE rn = 1
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_events,
         min(doc_id) AS first_ts, max(doc_id) AS last_ts
  FROM d GROUP BY source
)
SELECT agg.source, agg.n_events, agg.first_ts, agg.last_ts,
       l.last_lang, l.last_url_domain, l.last_n_chars
FROM agg JOIN latest l USING (source)
"""


# --------------------------------------------------------------------------
# catalog
# --------------------------------------------------------------------------

QUERIES = {
    # NOTE on ordering: the external driver gate verifies the FIRST 50 entries
    # of this dict against ORACLE_SQL.  Keep the first 50 all oracle-backed
    # (every key below up to and including `doc_perplexity` has an ORACLE_SQL
    # entry); approximate / decode queries with no SQL-expressible oracle live
    # below the gate window.
    "q1_pricing_summary": q_pricing_summary,
    "event_type_index": q_event_type_index,
    "latest_event": q_latest_event,
    "source_text_concat": q_source_text_concat,
    "edge_weights": q_edge_weights,
    "edge_normalize": q_edge_normalize,
    "token_freq": q_token_freq,
    "exact_dedup": q_exact_dedup,
    "top_parts_per_order": q_top_parts_per_order,
    "ranked_orders": q_ranked_orders,
    "segment_revenue": q_segment_revenue,
    "supplier_semi": q_supplier_semi,
    "nation_revenue": q_nation_revenue,
    "q3_shipping_priority": q3_shipping_priority,
    "distinct_user_events": q_distinct_user_events,
    "doc_filter_stats": q_doc_filter_stats,
    "hourly_user_windows": q_hourly_user_windows,
    "props_k_buckets": q_props_k_buckets,
    "ann_topk": q_ann_topk,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "allpairs_jaccard": q_allpairs_jaccard,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_tiled_dup_pairs": q_embedding_tiled_dup_pairs,
    "minhash_clusters": q_minhash_clusters,
    "doc_language_quality": q_doc_language_quality,
    "doc_repetition": q_doc_repetition,
    "user_sessions": q_user_sessions,
    "user_profiles": q_user_profiles,
    "edge_condense": q_edge_condense,
    "fold_counts": q_fold_counts,
    "token_cooccurrence": q_token_cooccurrence,
    "purchase_last_signup": q_purchase_last_signup,
    "sliding_user_windows": q_sliding_user_windows,
    "purchases_events_1h": q_purchases_events_1h,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_partitioned": q_ann_ivf_partitioned,
    "conversation_pairs": q_conversation_pairs,
    "doc_sample": q_doc_sample,
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
    "benchmark_contamination": q_benchmark_contamination,
    "fuzzy_contamination": q_fuzzy_contamination,
    "pii_scrub": q_pii_scrub,
    "sequence_pack": q_sequence_pack,
    "curation_pipeline": q_curation_pipeline,
    "graph_components": q_graph_components,
    "pagerank_supply": q_pagerank_supply,
    "substring_cut": q_substring_cut,
    "dsir_scores": q_dsir_scores,
    "bm25_topk": q_bm25_topk,
    "doc_perplexity": q_doc_perplexity,
    # ---- end of 50-entry driver gate window ----
    "embedding_blocked_dup_pairs": q_embedding_blocked_dup_pairs,
    "embedding_blocked_pruned_dup_pairs": q_embedding_blocked_pruned_dup_pairs,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "lsa_embed": q_lsa_embed,
    "media_features": q_media_features,
    "approx_distinct_counts": q_approx_distinct,
    "approx_price_quantiles": q_approx_quantiles,
    "stratified_sample": q_stratified_sample,
    "embedding_clusters": q_embedding_clusters,
    "semantic_dedup": q_semantic_dedup,
    "knn_triangles": q_knn_triangles,
    "quality_classifier": q_quality_classifier,
    "shard_assignment": q_shard_assignment,
    "domain_mix": q_domain_mix,
    "substring_dup_spans": q_substring_dup_spans,
    "doc_fingerprints": q_doc_fingerprints,
    "bpe_token_counts": q_bpe_token_counts,
    "rollup_revenue": q_rollup_revenue,
    "ppr_supply": q_ppr_supply,
    "price_quantiles_exact": q_price_quantiles_exact,
    "wemb_embed": q_wemb_embed,
    "customer_anti": q_customer_anti,
    "tfidf_keywords": q_tfidf_keywords,
    "running_spend": q_running_spend,
    "cube_orders": q_cube_orders,
    "hashtag_split": q_hashtag_split,
    "hashtag_profiles": q_hashtag_profiles,
    "mentioned_text_profiles": q_mentioned_text_profiles,
    "profile_url_domains": q_profile_url_domains,
    "price_dispersion": q_price_dispersion,
    "customer_order_shift": q_customer_order_shift,
    "user_top_event": q_user_top_event,
    "purchase_and_signup_users": q_purchase_and_signup_users,
    "high_qty_only_orders": q_high_qty_only_orders,
    "order_value_quartiles": q_order_value_quartiles,
    "price_histogram": q_price_histogram,
    "price_shape": q_price_shape,
    "weighted_doc_sample": q_weighted_doc_sample,
    "urgent_revenue": q_urgent_revenue,
    "funnel_stages": q_funnel_stages,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "degree_histogram": q_degree_histogram,
    "supplier_projection": q_supplier_projection,
    "purchase_next_error": q_purchase_next_error,
    "user_event_pivot": q_user_event_pivot,
    "user_value_moving_avg": q_user_value_moving_avg,
    "above_avg_orders": q_above_avg_orders,
    "user_type_entropy": q_user_type_entropy,
    "event_transitions": q_event_transitions,
    "cohort_retention": q_cohort_retention,
    "price_mad": q_price_mad,
    "type_user_cardinality": q_type_user_cardinality,
    "bigram_pmi": q_bigram_pmi,
    "hourly_dense_counts": q_hourly_dense_counts,
    "q5_local_revenue": q5_local_revenue,
    "graph_hops": q_graph_hops,
    "hybrid_topk": q_hybrid_topk,
}

ORACLE_SQL = {
    "q1_pricing_summary": SQL_PRICING_SUMMARY,
    "event_type_index": SQL_EVENT_TYPE_INDEX,
    "latest_event": SQL_LATEST_EVENT,
    "source_text_concat": SQL_SOURCE_TEXT_CONCAT,
    "edge_weights": SQL_EDGE_WEIGHTS,
    "edge_normalize": SQL_EDGE_NORMALIZE,
    "token_freq": SQL_TOKEN_FREQ,
    "exact_dedup": SQL_EXACT_DEDUP,
    "top_parts_per_order": SQL_TOP_PARTS_PER_ORDER,
    "ranked_orders": SQL_RANKED_ORDERS,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "supplier_semi": SQL_SUPPLIER_SEMI,
    "nation_revenue": SQL_NATION_REVENUE,
    "q3_shipping_priority": SQL_Q3_SHIPPING_PRIORITY,
    "distinct_user_events": SQL_DISTINCT_USER_EVENTS,
    "doc_filter_stats": SQL_DOC_FILTER_STATS,
    "hourly_user_windows": SQL_HOURLY_USER_WINDOWS,
    "props_k_buckets": SQL_PROPS_K_BUCKETS,
    "ann_topk": SQL_ANN_TOPK,
    # probe-all IVF is exact => same oracle as brute-force top-k
    "ann_ivf_topk": SQL_ANN_TOPK,
    "ann_ivf_partitioned": SQL_ANN_TOPK,
    "doc_language_quality": SQL_DOC_LANGUAGE_QUALITY,
    "minhash_clusters": SQL_MINHASH_CLUSTERS,
    # exact fingerprint replay in SQL (FNV-1a token hash) — see
    # SQL_SIMHASH_DUP_PAIRS commentary
    "simhash_dup_pairs": SQL_SIMHASH_DUP_PAIRS,
    "substring_dup_spans": SQL_SUBSTRING_DUP_SPANS,
    "substring_cut": SQL_SUBSTRING_CUT,
    "pagerank_supply": SQL_PAGERANK_SUPPLY,
    "ppr_supply": SQL_PPR_SUPPLY,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "allpairs_jaccard": SQL_ALLPAIRS_JACCARD,
    "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
    "embedding_tiled_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
    # exact limit of the blocked path (n_centroids=1, f64 vectors) —
    # complete candidate set => identical to the brute-force oracle
    "embedding_blocked_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
    "doc_repetition": SQL_DOC_REPETITION,
    "user_sessions": SQL_USER_SESSIONS,
    "user_profiles": SQL_USER_PROFILES,
    "edge_condense": SQL_EDGE_CONDENSE,
    "fold_counts": SQL_FOLD_COUNTS,
    "token_cooccurrence": SQL_TOKEN_COOCCURRENCE,
    "purchase_last_signup": SQL_PURCHASE_LAST_SIGNUP,
    "sliding_user_windows": SQL_SLIDING_USER_WINDOWS,
    "purchases_events_1h": SQL_PURCHASES_EVENTS_1H,
    "conversation_pairs": SQL_CONVERSATION_PAIRS,
    "doc_sample": SQL_DOC_SAMPLE,
    "heavy_hitter_tokens": SQL_HEAVY_HITTER_TOKENS,
    "benchmark_contamination": SQL_BENCHMARK_CONTAMINATION,
    "fuzzy_contamination": SQL_FUZZY_CONTAMINATION,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "price_quantiles_exact": SQL_PRICE_QUANTILES_EXACT,
    "pii_scrub": SQL_PII_SCRUB,
    "sequence_pack": SQL_SEQUENCE_PACK,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "shard_assignment": SQL_SHARD_ASSIGNMENT,
    "domain_mix": SQL_DOMAIN_MIX,
    "doc_perplexity": SQL_DOC_PERPLEXITY,
    "bm25_topk": SQL_BM25_TOPK,
    "knn_triangles": SQL_KNN_TRIANGLES,
    "dsir_scores": SQL_DSIR_SCORES,
    "graph_components": SQL_GRAPH_COMPONENTS,
    "customer_anti": SQL_CUSTOMER_ANTI,
    "tfidf_keywords": SQL_TFIDF_KEYWORDS,
    "running_spend": SQL_RUNNING_SPEND,
    "cube_orders": SQL_CUBE_ORDERS,
    "price_dispersion": SQL_PRICE_DISPERSION,
    "customer_order_shift": SQL_CUSTOMER_ORDER_SHIFT,
    "user_top_event": SQL_USER_TOP_EVENT,
    "purchase_and_signup_users": SQL_PURCHASE_AND_SIGNUP,
    "high_qty_only_orders": SQL_HIGH_QTY_ONLY_ORDERS,
    "order_value_quartiles": SQL_ORDER_VALUE_QUARTILES,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "price_shape": SQL_PRICE_SHAPE,
    "weighted_doc_sample": SQL_WEIGHTED_DOC_SAMPLE,
    "urgent_revenue": SQL_URGENT_REVENUE,
    "funnel_stages": SQL_FUNNEL_STAGES,
    "fuzzy_name_pairs": SQL_FUZZY_NAME_PAIRS,
    "degree_histogram": SQL_DEGREE_HISTOGRAM,
    "supplier_projection": SQL_SUPPLIER_PROJECTION,
    "purchase_next_error": SQL_PURCHASE_NEXT_ERROR,
    "user_event_pivot": SQL_USER_EVENT_PIVOT,
    "user_value_moving_avg": SQL_USER_VALUE_MOVING_AVG,
    "above_avg_orders": SQL_ABOVE_AVG_ORDERS,
    "user_type_entropy": SQL_USER_TYPE_ENTROPY,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "price_mad": SQL_PRICE_MAD,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "hourly_dense_counts": SQL_HOURLY_DENSE_COUNTS,
    "q5_local_revenue": SQL_Q5_LOCAL_REVENUE,
    "graph_hops": SQL_GRAPH_HOPS,
    # exact winnowing replay (FNV-1a token hash + k-gram fold +
    # leftmost arg-min windows) — see SQL_DOC_FINGERPRINTS commentary
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "hashtag_split": SQL_HASHTAG_SPLIT,
    "hashtag_profiles": SQL_HASHTAG_PROFILES,
    "mentioned_text_profiles": SQL_MENTIONED_TEXT_PROFILES,
    "profile_url_domains": SQL_PROFILE_URL_DOMAINS,
    "hybrid_topk": SQL_HYBRID_TOPK,
}

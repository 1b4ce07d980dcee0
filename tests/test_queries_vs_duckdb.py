"""Operator-conformance: Ray catalog queries vs DuckDB oracles at
sf0.001 (the driver runs the full set at sf0.01; here a fast subset
keeps the suite quick)."""

import duckdb
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_oracle import compare, to_pandas  # noqa: E402

FAST = [
    "q1_pricing_summary",
    "event_type_index",
    "latest_event",
    "source_text_concat",
    "token_freq",
    "exact_dedup",
    "ranked_orders",
    "segment_revenue",
    "supplier_semi",
    "distinct_user_events",
    "doc_filter_stats",
    "doc_repetition",
    "hourly_user_windows",
    "props_k_buckets",
    "ann_topk",
    "ann_ivf_topk",
    "doc_language_quality",
    "minhash_clusters",
    "substring_dup_spans",
    "substring_cut",
    "pagerank_supply",
    "embedding_tiled_dup_pairs",
    "embedding_dup_pairs",
    "benchmark_contamination",
    "fuzzy_contamination",
    "rollup_revenue",
    "price_quantiles_exact",
    "pii_scrub",
    "sequence_pack",
    "curation_pipeline",
    "stratified_sample",
    "shard_assignment",
    "doc_perplexity",
    "bm25_topk",
    "dsir_scores",
    "graph_components",
    "customer_anti",
    "tfidf_keywords",
    "running_spend",
    "cube_orders",
    "price_dispersion",
    "customer_order_shift",
    "user_top_event",
    "purchase_and_signup_users",
    "high_qty_only_orders",
    "order_value_quartiles",
    "price_histogram",
    "price_shape",
    "weighted_doc_sample",
    "urgent_revenue",
    "funnel_stages",
    "fuzzy_name_pairs",
    "degree_histogram",
    "supplier_projection",
    "purchase_next_error",
    "user_event_pivot",
    "user_value_moving_avg",
    "above_avg_orders",
    "user_type_entropy",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(name, con, sf_dir, ray_session):
    from sociallink_ray.queries import ORACLE_SQL, QUERIES

    ray_df = to_pandas(QUERIES[name](sf_dir))
    ora_df = con.execute(ORACLE_SQL[name]).fetchdf()
    problems = compare(name, ray_df, ora_df)
    assert not problems, problems

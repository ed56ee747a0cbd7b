"""Driver-contract rehearsal: run every queries() entry and compare
against its oracle_sql() via DuckDB exactly like the driver does
(row count + schema-insensitive sorted-value comparison)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import os
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as mod

    return mod


def test_entry_smoke(contract):
    res = _to_pandas(contract.entry())
    assert len(res) >= 0
    assert list(res.columns)


ORACLE_KEYS = [
    "headings_from_text", "dfns_from_text", "idl_from_text", "links_from_text",
    "titles_from_text", "meta_from_text", "ids_from_text", "refs_from_text",
    "css_from_text", "events_from_text", "algorithms_from_text",
    "link_hosts",
    "cddl_from_text", "elements_from_text", "annotate_links_sf",
    "token_count", "bpeish_tokens", "quality_score", "lang_id",
    "exact_dedup", "dup_size_hist", "vocab_size_by_lang",
    "funnel_conversion", "interleave_sources", "rank_buckets",
    "char_entropy",
    "ann_topk", "lineitem_agg", "orders_by_segment",
    "events_window", "idlparsed", "idlnames", "backrefs", "media_manifest",
    "frame_sample", "media_features", "media_dedup",
    "word_counts", "bigram_counts", "sessionize",
    "cohort_retention", "line_dedup",
    "fingerprint", "simhash", "minhash_pairs", "jaccard_pairs",
    "embedding_near_dups",
    "sample_split", "stratified_sample", "source_cap",
    "near_dup_clusters", "near_dedup", "near_dedup_best",
    "token_budget_sample", "curation_pipeline", "quantize_embeddings",
    "asof_join", "range_join", "rolling_window", "group_quantiles",
    "global_quantiles", "global_quantiles_skew",
    "doc_freq", "top_terms",
    "decontaminate", "pii_redact", "gopher_quality", "normalize_text",
    "top_k_per_group", "knn_join",
    "repetition_stats", "chunk_tokens", "temperature_mix",
    "group_centroids", "pack_chunks", "boilerplate",
    "ann_ivf", "merge_crawl", "cssmerge", "events_consolidated",
    "patch_dfns", "duplicated_substrings", "substring_dedup",
    "check_missing_dfns", "unigram_logppl", "bigram_logppl", "semantic_dedup",
    "fuzzy_decontaminate", "quality_classifier", "dsir_weights",
    "ccnet_buckets", "dup_ngram_fraction", "ngram_novelty",
    "corpus_report", "c4_clean",
    "source_overlap", "attribution", "regression", "kmeans", "pagerank",
    "hits", "random_walks", "biased_walks", "biased_walk_pairs",
    "bucketed_walks", "bucketed_pagerank", "walk_pairs",
    "cc_components",
    "triangle_count", "bm25", "weighted_sample", "event_gaps",
    "late_events", "event_pattern", "kcore", "watermark_window",
    "semi_join", "anti_join", "skew_join", "nation_revenue",
    "lang_fertility",
    "daily_new_users", "price_histogram", "user_top_event",
    "kmv_distinct", "event_type_pairs", "heavy_hitters", "priority_sample",
    "event_transitions", "user_paths", "corr_stats", "winsorize",
    "cms_counts", "zscore_outliers", "bloom_semi_join", "tfidf_terms",
    "tumbling_window", "hopping_window", "table_diff", "debounce",
    "rare_gram_pairs", "pivot_counts", "rollup", "cumulative",
    "distinct_users", "rrf", "er_pairs", "max_concurrency",
    "rolling_distinct", "pair_lift", "streaks", "inverted_index",
    "ab_test", "share_of_total", "edit_distance", "trending_terms",
    "pareto", "decayed", "hll_users", "interval_merge", "containment",
    "skipgram_counts", "source_dup_stats", "bfs_hops", "bpe_merges",
    "bpe_encode", "pmi",
    "span_stream", "pack_interleaved", "media_text_pairs",
    "span_runs", "span_sections", "span_templates",
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(contract, name):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    ours = _normalize(_to_pandas(q(SF_DIR)))
    oracle = _normalize(_oracle_df(sql))
    assert len(ours) == len(oracle), f"{name}: rows {len(ours)} vs {len(oracle)}"
    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(oracle.columns)}"
    )
    for col in ours.columns:
        a, b = ours[col], oracle[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, rtol=1e-9, atol=1e-9
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}.{col}"


ROWS_ONLY_KEYS = [
    "crawl_fixture", "annotate_links", "node2vec_embeddings",
]


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(contract, name):
    res = _to_pandas(contract.queries()[name](SF_DIR))
    assert res is not None
    if name in ("crawl_fixture",):
        assert len(res) == 5


def test_contract_key_completeness(contract):
    """Every oracle has a query, every query is checked (oracle or
    rows-only), and this file's key lists never drift from the
    contract."""
    queries = set(contract.queries())
    oracles = set(contract.oracle_sql())
    assert oracles <= queries, oracles - queries
    assert set(ORACLE_KEYS) == oracles, (
        set(ORACLE_KEYS) ^ oracles
    )
    assert set(ROWS_ONLY_KEYS) == queries - oracles, (
        set(ROWS_ONLY_KEYS) ^ (queries - oracles)
    )

"""Fast in-repo version of the driver's correctness gate: a subset of
queries() vs their oracle_sql() twins via DuckDB at sf0.001
(scripts/check_oracle.py runs the full set)."""

import os

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
FAST = ["kmer_counts_per_doc", "whole_seq_minimiser", "lag_lead",
        "sessionize", "doc_stats", "dedup_exact", "emb_near_dup",
        "rep_stats", "chunk_windows", "stop_filter", "df_counts",
        "top_quality_per_lang", "dup_spans", "unigram_logprob",
        "zscore_by_source", "events_distinct", "events_funnel",
        "grouped_quantiles",
        # round-4 ops
        "pii_scrub", "domain_stats", "frame_sample", "audio_energy",
        "dsir_weights", "quality_filter", "ppl_buckets", "winnow_fp",
        "bpe_merges", "gopher_filter", "source_overlap", "semdedup",
        "decontam_spans", "hard_negatives", "quantize_emb", "hll_users",
        "feature_hash", "cms_topwords", "dup_span_scrub",
        "ppl_buckets_scored",
        # round-5 ops
        "c4_filter", "block_dedup", "temperature_sample",
        "dedup_incremental", "decontam_frac", "seed_topk", "pack_emit",
        "data_profile", "bigram_logprob", "kmer_novelty", "pmi_pairs",
        "weighted_sample", "sketch_quantiles", "bloom_decontam",
        "kmer_complexity", "vocab_coverage", "char_entropy",
        # round-5b ops
        "mg_topwords", "bm25_topk", "diginorm", "source_divergence",
        "mad_outliers", "proto_prune", "kcenter_select",
        # round-5c ops
        "nb_classify", "retention_cohorts", "pagerank", "knn_graph",
        "url_dedup", "cdc_chunks", "cdc_digest", "phrase_hits",
        "source_diversity"]

pytestmark = pytest.mark.skipif(not os.path.exists(SF),
                                reason="driver testdata unavailable")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(ray_session, name):
    import duckdb

    import __ray_entry__ as e
    from kmerray.queries import oracle_registry

    res = e.queries()[name](SF)
    ray_df = res.to_pandas() if hasattr(res, "to_pandas") else \
        pd.DataFrame(res)
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem",
              "orders", "customer"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    sql_df = con.sql(oracle_registry(SF)[name]).df()
    assert len(ray_df) == len(sql_df), name
    a, b = normalize(ray_df), normalize(sql_df)
    assert list(a.columns) == list(b.columns), name
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "fc":
            assert np.array_equal(av, bv.astype(av.dtype),
                                  equal_nan=True), (name, c)
        else:
            assert np.array_equal(av, bv), (name, c)

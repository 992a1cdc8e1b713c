"""Driver-facing query registry: one callable per implemented pipeline
(SURVEY.md §2), each returning a Dataset whose schema matches the
DuckDB oracle in ``kmerray.oracle`` column-for-column.

No ``ray.init`` here — the driver owns the session."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .core.encoding import canonical_flat_kmers
from .core.oligo import cfv_batch
from .pipelines.arrow_util import list_column_to_numpy
from .pipelines.asof import (asof_coverage_pipeline, lag_lead_pipeline,
                             load_snapshot_index, sessionize_pipeline,
                             snapshot_counts)
from .pipelines.comp import read_sequences
from .pipelines.counter import count_kmers
from .pipelines.cov import coverage_pipeline
from .pipelines.minpipe import minimisers_exploded

# fixed parameters shared by queries() and oracle_sql()
K_PER_DOC = 4
K_GLOBAL = 8
K_COV = 8
COV_BINS = (4, 6)          # bin_size, bin_count
K_ASOF = 8
ASOF_BINS = (2, 4)
MIN_W, MIN_M = 8, 5
WHOLE_M = 10
SESSION_GAP_US = 30 * 60 * 1_000_000


def _seq(sf_dir: str, columns=None):
    return read_sequences(sf_dir, columns=columns)


def q_kmer_counts_per_doc(sf_dir: str, k: int = K_PER_DOC):
    if k > 16:
        raise ValueError("row<<32|kmer packing requires k <= 16")
    ds = _seq(sf_dir, ["doc_id", "tokens"])

    def per_doc(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        canon, row = canonical_flat_kmers(values, offsets, k)
        key = (row.astype(np.uint64) << np.uint64(32)) | canon
        uk, cnt = np.unique(key, return_counts=True)
        urow = (uk >> np.uint64(32)).astype(np.int64)
        ukmer = (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(urow)),
            "kmer": pa.array(ukmer),
            "cnt": pa.array(cnt.astype(np.int64)),
        })
    return ds.map_batches(per_doc, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_global_counts(sf_dir: str, k: int = K_GLOBAL):
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    counts = count_kmers(ds, k)

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "kmer": batch.column("kmer").cast(pa.int64()),
            "cnt": batch.column("cnt").cast(pa.int64()),
        })
    return counts.map_batches(cast, batch_format="pyarrow")


def q_cfv_norm(sf_dir: str, k: int = K_PER_DOC):
    ds = _seq(sf_dir, ["doc_id", "tokens"])

    def nonzero(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        mat = cfv_batch(values, offsets, k, canonical=True, norm=True)
        rows, cols = np.nonzero(mat)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(rows)),
            "col": pa.array(cols.astype(np.int64)),
            "freq": pa.array(mat[rows, cols]),
        })
    return ds.map_batches(nonzero, batch_format="pyarrow",
                          zero_copy_batch=True)


K_RAW = 5


def q_cfv_raw(sf_dir: str, k: int = K_RAW):
    """Raw (non-canonical) normalized CFV nonzero entries — the
    reference's ``--no-canonical`` mode (composition/src/oligo.rs:250),
    previously pytest-only (VERDICT round 1, missing #3)."""
    ds = _seq(sf_dir, ["doc_id", "tokens"])

    def nonzero(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch.column("tokens"))
        mat = cfv_batch(values, offsets, k, canonical=False, norm=True)
        rows, cols = np.nonzero(mat)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(rows)),
            "col": pa.array(cols.astype(np.int64)),
            "freq": pa.array(mat[rows, cols]),
        })
    return ds.map_batches(nonzero, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_oligo_cgr(sf_dir: str, k: int = K_PER_DOC):
    """Oligo-CGR nonzero entries (M9): canonical-column CGR endpoint
    (x, y) + normalized frequency — previously pytest-only (VERDICT
    round 1, missing #4)."""
    from .pipelines.comp import oligo_cgr_pipeline
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    out = oligo_cgr_pipeline(ds, k=k)      # vecsize = k*k, norm=True

    def explode(batch: pa.Table) -> pa.Table:
        arr = batch.column("oligo_cgr").combine_chunks()
        kc = arr.type.list_size
        st = arr.flatten()
        xs = st.field("x").to_numpy()
        ys = st.field("y").to_numpy()
        mat = st.field("freq").to_numpy().reshape(batch.num_rows, kc)
        rows, cols = np.nonzero(mat)
        flat = rows * kc + cols
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(rows)),
            "col": pa.array(cols.astype(np.int64)),
            "x": pa.array(xs[flat]),
            "y": pa.array(ys[flat]),
            "freq": pa.array(mat[rows, cols]),
        })
    return out.map_batches(explode, batch_format="pyarrow")


def _exploded_minimisers(sf_dir: str, w: int, m: int):
    ds = _seq(sf_dir, ["doc_id", "tokens", "n_tok"])
    ex = minimisers_exploded(ds, w, m)

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "mmer": batch.column("mmer").cast(pa.int64()),
            "start_pos": batch.column("start").cast(pa.int64()),
            "end_pos": batch.column("end").cast(pa.int64()),
        })
    return ex.map_batches(cast, batch_format="pyarrow")


def q_minimisers(sf_dir: str, w: int = MIN_W, m: int = MIN_M):
    return _exploded_minimisers(sf_dir, w, m)


def q_m2s_index_counts(sf_dir: str, w: int = MIN_W, m: int = MIN_M,
                       n_buckets: int | None = None):
    ex = _exploded_minimisers(sf_dir, w, m)
    if n_buckets is None:
        # size from the SOURCE read (metadata-only) — size_bytes() on
        # the transformed dataset would trigger execution
        from .pipelines.counter import default_n_buckets
        n_buckets = default_n_buckets(
            _seq(sf_dir, ["doc_id", "tokens"]), floor=32)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = (batch["mmer"] % n_buckets).astype(np.int64)
        return batch

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("mmer", as_index=False)
                .agg(n_entries=("doc_id", "size"),
                     n_docs=("doc_id", "nunique")))
        out["n_entries"] = out["n_entries"].astype(np.int64)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out
    return (ex.map_batches(add_bucket, batch_format="pandas")
              .groupby("bucket").map_groups(agg, batch_format="pandas"))


def q_whole_seq_minimiser(sf_dir: str, m: int = WHOLE_M):
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    ex = minimisers_exploded(ds, 0, m)

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "mmer": batch.column("mmer").cast(pa.int64())})
    return ex.map_batches(cast, batch_format="pyarrow")


from .pipelines.arrow_util import explode_nonzero_fixedlist \
    as _explode_nonzero_fixedlist


def q_cov_hist(sf_dir: str, k: int = K_COV, bins=COV_BINS):
    """Size-triggered default (VERDICT r2 next #2): broadcast scorer
    below the dictionary-size threshold, bucketed join above."""
    from .pipelines.cov import cov_hist_auto
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    return cov_hist_auto(ds, k, bin_size, bin_count)


def q_cov_hist_join(sf_dir: str, k: int = K_COV, bins=COV_BINS):
    """The above-threshold route forced (threshold 0), so the
    fully-distributed bucketed join is oracle-gated every round —
    same SQL oracle as cov_hist."""
    from .pipelines.cov import cov_hist_auto
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    return cov_hist_auto(ds, k, bin_size, bin_count, threshold_keys=0)


def q_cov_hist_sharded(sf_dir: str, k: int = K_COV, bins=COV_BINS,
                       n_shards: int = 4):
    """Sharded-dictionary scale path — same SQL oracle as cov_hist."""
    from .pipelines.cov import (collect_count_table, shard_count_table,
                                sharded_cov_hist)
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    kmers, cnts = collect_count_table(
        count_kmers(ds, k, bucket_by="range"))
    refs = shard_count_table(kmers, cnts, n_shards)
    return sharded_cov_hist(ds, refs, k, bin_size, bin_count)


def q_asof_cov_hist_sharded(sf_dir: str, k: int = K_ASOF, bins=ASOF_BINS,
                            n_shards: int = 4):
    """Sharded-snapshot-index scale path — same SQL oracle as
    asof_cov_hist."""
    from .pipelines.asof import shard_snapshot_index, sharded_asof_hist
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens", "source", "ts"])
    from .pipelines.asof import collect_snapshot_table
    refs = shard_snapshot_index(
        collect_snapshot_table(snapshot_counts(ds, k)), n_shards)
    return sharded_asof_hist(ds, refs, k, bin_size, bin_count)


def q_cgr_final(sf_dir: str):
    """Final CGR point per clean row — exercises the M8 walk through an
    exact SQL oracle (full walks are pytest-golden-tested)."""
    from .pipelines.comp import cgr_pipeline
    ds = _seq(sf_dir, ["doc_id", "tokens"])
    out = cgr_pipeline(ds, vecsize=1.0, strict=False)

    def final_point(batch: pa.Table) -> pa.Table:
        lst = batch.column("cgr").combine_chunks()
        offs = lst.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        pts = lst.flatten()
        xs = pts.field("x").to_numpy()
        ys = pts.field("y").to_numpy()
        valid = batch.column("cgr_valid").to_numpy(zero_copy_only=False)
        lengths = np.diff(offs)
        keep = valid & (lengths > 0)
        fin = offs[1:] - 1
        return pa.table({
            "doc_id": batch.column("doc_id").filter(pa.array(keep)),
            "x": pa.array(xs[fin[keep]]),
            "y": pa.array(ys[fin[keep]]),
        })
    return out.map_batches(final_point, batch_format="pyarrow")


def q_asof_snapshots(sf_dir: str, k: int = K_ASOF):
    ds = _seq(sf_dir, ["doc_id", "tokens", "source", "ts"])
    snap = snapshot_counts(ds, k)

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch.column("source"),
            "kmer": batch.column("kmer").cast(pa.int64()),
            "day": batch.column("day").cast(pa.int64()),
            "cum_cnt": batch.column("cum_cnt").cast(pa.int64()),
        })
    return snap.map_batches(cast, batch_format="pyarrow")


def q_asof_cov_hist(sf_dir: str, k: int = K_ASOF, bins=ASOF_BINS):
    """Size-triggered default (VERDICT r2 next #2)."""
    from .pipelines.asof import asof_hist_auto
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens", "source", "ts"])
    return asof_hist_auto(ds, k, bin_size, bin_count)


BACKFILL_LAG_DAYS = 7


def q_asof_backfill(sf_dir: str, k: int = K_ASOF, bins=ASOF_BINS,
                    lag_days: int = None):
    """Backfill probe for the as-of engine (north_rule): re-score every
    row AS OF ``lag_days`` before its ingest timestamp — scoring is a
    pure function of (row, snapshot table, asof_ts), so backfilling a
    historical feature table is just the same pipeline with shifted
    timestamps; rows whose lagged day predates the first snapshot get
    the zero-coverage bin on both engines (zero temporal leakage at
    the shifted boundary too)."""
    from .pipelines.asof import asof_hist_auto
    lag = BACKFILL_LAG_DAYS if lag_days is None else lag_days
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens", "source", "ts"])
    lag_us = lag * 86_400_000_000

    def shift(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy() - lag_us
        return b.set_column(b.schema.get_field_index("ts"), "ts",
                            pa.array(ts).cast(pa.timestamp("us")))
    shifted = ds.map_batches(shift, batch_format="pyarrow",
                             zero_copy_batch=True)
    # snapshots from TRUE timestamps; only the lookup ts is lagged
    return asof_hist_auto(shifted, k, bin_size, bin_count,
                          snapshot_ds=ds)


def q_asof_cov_hist_join(sf_dir: str, k: int = K_ASOF, bins=ASOF_BINS):
    """Above-threshold route forced — the bucketed as-of join
    oracle-gated every round (same SQL oracle as asof_cov_hist)."""
    from .pipelines.asof import asof_hist_auto
    bin_size, bin_count = bins
    ds = _seq(sf_dir, ["doc_id", "tokens", "source", "ts"])
    return asof_hist_auto(ds, k, bin_size, bin_count, threshold_rows=0)


def q_lag_lead(sf_dir: str):
    ds = _seq(sf_dir, ["doc_id", "source", "ts", "n_tok"])
    out = lag_lead_pipeline(ds)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "prev_n_tok": batch["prev_n_tok"].fillna(-1).astype(np.int64),
            "next_n_tok": batch["next_n_tok"].fillna(-1).astype(np.int64),
        })
    return out.map_batches(cast, batch_format="pandas")


def q_sessionize(sf_dir: str, gap_us: int = SESSION_GAP_US):
    ds = _seq(sf_dir, ["doc_id", "source", "ts"])
    out = sessionize_pipeline(ds, gap_us=gap_us)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "session_seq": batch["session_seq"]
                             .astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_lag_lead_partitioned(sf_dir: str):
    """Scale-path lag/lead (ts-bucket partitions + boundary exchange) —
    checked against the SAME SQL oracle as the single-task variant."""
    from .pipelines.windowed import partitioned_lag_lead
    ds = _seq(sf_dir, ["doc_id", "source", "ts", "n_tok"])
    out = partitioned_lag_lead(ds)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "prev_n_tok": batch["prev_n_tok"].fillna(-1).astype(np.int64),
            "next_n_tok": batch["next_n_tok"].fillna(-1).astype(np.int64),
        })
    return out.map_batches(cast, batch_format="pandas")


def q_sessionize_partitioned(sf_dir: str, gap_us: int = SESSION_GAP_US):
    """Scale-path sessionize (two-phase scan) — same oracle as the
    single-task variant."""
    from .pipelines.windowed import partitioned_sessionize
    ds = _seq(sf_dir, ["doc_id", "source", "ts"])
    out = partitioned_sessionize(ds, gap_us=gap_us)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "session_seq": batch["session_seq"]
                             .astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def registry() -> dict:
    """Driver-facing query registry.  ORDER MATTERS: the driver runs
    the FIRST 50 entries (VERDICT r3 next #1), so the head is curated
    to one hash-gated query per COVERAGE.md op family — redundant
    scale-path variants (sharded/join/partitioned/on-the-fly-IVF),
    rows-only LSH twins, and the constituents of the tagged-union
    composites live in the tail, still runnable via
    ``scripts/check_oracle.py`` and covered by pytest."""
    head = {
        # --- reference §2 surface ---
        "kmer_counts_per_doc": q_kmer_counts_per_doc,
        "ctr_all": q_ctr_all,
        "cfv_norm": q_cfv_norm,
        "oligo_cgr": q_oligo_cgr,
        "cgr_final": q_cgr_final,
        "minimisers_all": q_minimisers_all,
        "m2s_index_counts": q_m2s_index_counts,
        "cov_hist": q_cov_hist,
        "asof_snapshots": q_asof_snapshots,
        "asof_lagged": q_asof_lagged,
        "windowed_all": q_windowed_all,
        # --- relational ---
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "relational_exist": q_relational_exist,
        "relational_rank": q_relational_rank,
        # --- text analysis ---
        "doc_stats": q_doc_stats,
        "lang_id": q_lang_id,
        "rep_stats": q_rep_stats,
        "chunk_windows": q_chunk_windows,
        "text_rewrite": q_text_rewrite,
        "vocab2": q_vocab2,
        "retrieval2": q_retrieval2,
        "colloc2": q_colloc2,
        "lm_logprob2": q_lm_logprob2,
        "decontam2": q_decontam2,
        "source_stats2": q_source_stats2,
        "top_quality_per_lang": q_top_quality_per_lang,
        # --- dedup ---
        "dedup_survivors2": q_dedup_survivors2,
        "ngram_dupes": q_ngram_dupes,
        "near_dup_survivors": q_near_dup_survivors,
        "simhash_recall": q_simhash_recall,
        "dup_spans2": q_dup_spans2,
        # --- similarity ---
        "emb_dedup2": q_emb_dedup2,
        "ann_topk2": q_ann_topk2,
        "ann_topk_ivf_indexed": q_ann_topk_ivf_indexed,
        # --- scans / sampling ---
        "scan_features": q_scan_features,
        "quantiles_all": q_quantiles_all,
        "sampling_flags": q_sampling_flags,
        # --- events ---
        "events_hourly": q_events_hourly,
        "events_enriched": q_events_enriched,
        "events_sessions": q_events_sessions,
        "events_flow": q_events_flow,
        # --- decompositions / multimodal ---
        "decomp_project": q_decomp_project,
        "cluster_reps": q_cluster_reps,
        "media_features": q_media_features,
        "media_windows": q_media_windows,
        "ppl_buckets2": q_ppl_buckets2,
        "pii_scrub": q_pii_scrub,
        "dsir_weights": q_dsir_weights,
        "quality_filter2": q_quality_filter2,
    }
    assert len(head) == 50, f"registry head must be 50, got {len(head)}"
    tail = {
        # composite constituents (hash-gated individually here)
        "ctr_global_counts": q_global_counts,
        "kmer_novelty": q_kmer_novelty,
        "kmer_complexity": q_kmer_complexity,
        "diginorm": q_diginorm,
        "bigram_stats": q_bigram_stats,
        "pmi_pairs": q_pmi_pairs,
        "asof_cov_hist": q_asof_cov_hist,
        "asof_backfill": q_asof_backfill,
        "lag_lead": q_lag_lead,
        "sessionize": q_sessionize,
        "high_qty_orders": q_high_qty_orders,
        "pagerank": q_pagerank,
        "cust_no_big_order": q_cust_no_big_order,
        "shipping_priority": q_shipping_priority,
        "cust_order_rollup": q_cust_order_rollup,
        "events_distinct": q_events_distinct,
        "events_funnel": q_events_funnel,
        "retention_cohorts": q_retention_cohorts,
        "emb_near_dup": q_emb_near_dup,
        "dup_spans": q_dup_spans,
        "dup_span_scrub": q_dup_span_scrub,
        "block_dedup": q_block_dedup,
        "c4_filter": q_c4_filter,
        "char_entropy": q_char_entropy,
        "phrase_hits": q_phrase_hits,
        "temperature_sample": q_temperature_sample,
        "weighted_sample": q_weighted_sample,
        "quality_filter": q_quality_filter,
        "frame_sample": q_frame_sample,
        "audio_energy": q_audio_energy,
        "cdc_chunks": q_cdc_chunks,
        "cdc_digest": q_cdc_digest,
        "semdedup": q_semdedup,
        "ppl_buckets": q_ppl_buckets,
        "ppl_buckets_scored": q_ppl_buckets_scored,
        "domain_stats": q_domain_stats,
        "winnow_fp": q_winnow_fp,
        "gopher_filter": q_gopher_filter,
        "source_overlap": q_source_overlap,
        "decontam": q_decontam,
        "decontam_frac": q_decontam_frac,
        "bloom_decontam": q_bloom_decontam,
        "ann_topk": q_ann_topk,
        "seed_topk": q_seed_topk,
        "knn_graph": q_knn_graph,
        "dedup_incremental": q_dedup_incremental,
        "pack_emit": q_pack_emit,
        "data_profile": q_data_profile,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_logprob,
        "nb_classify": q_nb_classify,
        "decontam_spans": q_decontam_spans,
        "hard_negatives": q_hard_negatives,
        "quantize_emb": q_quantize_emb,
        "hll_users": q_hll_users,
        "feature_hash": q_feature_hash,
        "cms_topwords": q_cms_topwords,
        "mg_topwords": q_mg_topwords,
        "tfidf_topk": q_tfidf_topk,
        "bm25_topk": q_bm25_topk,
        "zscore_by_source": q_zscore_by_source,
        "source_divergence": q_source_divergence,
        "source_diversity": q_source_diversity,
        "mad_outliers": q_mad_outliers,
        "proto_prune": q_proto_prune,
        "kcenter_select": q_kcenter_select,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "cfv_raw": q_cfv_raw,
        "minimisers_s2m": q_minimisers,
        "whole_seq_minimiser": q_whole_seq_minimiser,
        "normalize_text": q_normalize_text,
        "stop_filter": q_stop_filter,
        "df_counts": q_df_counts,
        "vocab_coverage": q_vocab_coverage,
        "token_counts": q_token_counts,
        "quality": q_quality,
        "dedup_exact": q_dedup_exact,
        "dedup_keep_best": q_dedup_keep_best,
        "url_dedup": q_url_dedup,
        "pack_bins": q_pack_bins,
        "rank_by_len": q_rank_by_len,
        "tok_quantiles": q_tok_quantiles,
        "sketch_quantiles": q_sketch_quantiles,
        "grouped_quantiles": q_grouped_quantiles,
        "sample_split": q_sample_split,
        "group_sample": q_group_sample,
        "events_json_k": q_events_json_k,
        "events_history": q_events_history,
        "events_rolling": q_events_rolling,
        "events_dedup": q_events_dedup,
        "pca_project_check": q_pca_project_check,
        "kmeans_assign": q_kmeans_assign,
        "minhash_recall": q_minhash_recall,
        "emb_lsh_recall": q_emb_lsh_recall,
        # forced scale-path variants (same oracle as their auto head
        # entry; pytest holds the switch parity)
        "pagerank_exchange": q_pagerank_exchange,
        "cov_hist_sharded": q_cov_hist_sharded,
        "cov_hist_join": q_cov_hist_join,
        "asof_cov_hist_sharded": q_asof_cov_hist_sharded,
        "asof_cov_hist_join": q_asof_cov_hist_join,
        "lag_lead_partitioned": q_lag_lead_partitioned,
        "sessionize_partitioned": q_sessionize_partitioned,
        "ann_topk_ivf": q_ann_topk_ivf,
        # rows-only twins (recall/containment oracles live in head)
        "minhash_candidates": q_minhash_candidates,
        "simhash_pairs": q_simhash_pairs,
        "emb_near_dup_lsh": q_emb_near_dup_lsh,
        "pca_project": q_pca_project,
    }
    return {**head, **tail}


def oracle_registry(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    from . import oracle
    from .sources.synth import ensure_sequences
    path = ensure_sequences(sf_dir)
    return {
        "kmer_counts_per_doc": oracle.kmer_counts_per_doc_sql(path, K_PER_DOC),
        "ctr_global_counts": oracle.global_counts_sql(path, K_GLOBAL),
        "kmer_novelty": oracle.kmer_novelty_sql(path, K_GLOBAL),
        "ctr_all": f"""\
SELECT CAST(0 AS BIGINT) AS variant, kmer AS a, cnt AS b,
       CAST(0 AS BIGINT) AS c, CAST(0.0 AS DOUBLE) AS f, '' AS id
FROM ({oracle.global_counts_sql(path, K_GLOBAL)})
UNION ALL
SELECT CAST(1 AS BIGINT), day, new_kmers, vocab_size,
       CAST(0.0 AS DOUBLE), ''
FROM ({oracle.kmer_novelty_sql(path, K_GLOBAL)})
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), n_kmers, n_distinct,
       complexity, doc_id
FROM ({oracle.kmer_complexity_sql(path, K_GLOBAL)})
UNION ALL
SELECT CAST(3 AS BIGINT), med_abund, n_kmers, keep,
       CAST(0.0 AS DOUBLE), doc_id
FROM ({oracle.diginorm_sql(path, K_GLOBAL)})""",
        "kmer_complexity": oracle.kmer_complexity_sql(path, K_GLOBAL),
        "diginorm": oracle.diginorm_sql(path, K_GLOBAL),
        "cfv_norm": oracle.cfv_norm_sql(path, K_PER_DOC),
        "cfv_raw": oracle.cfv_raw_sql(path, K_RAW),
        "oligo_cgr": oracle.oligo_cgr_sql(path, K_PER_DOC),
        "minimisers_s2m": oracle.minimisers_sql(path, MIN_W, MIN_M),
        "m2s_index_counts": oracle.m2s_index_counts_sql(path, MIN_W, MIN_M),
        "whole_seq_minimiser": oracle.whole_seq_minimiser_sql(path, WHOLE_M),
        "cgr_final": oracle.cgr_final_sql(path),
        "cov_hist": oracle.cov_hist_sql(path, K_COV, *COV_BINS),
        "cov_hist_sharded": oracle.cov_hist_sql(path, K_COV, *COV_BINS),
        "cov_hist_join": oracle.cov_hist_sql(path, K_COV, *COV_BINS),
        "asof_snapshots": oracle.asof_snapshots_sql(path, K_ASOF),
        "asof_cov_hist": oracle.asof_cov_hist_sql(path, K_ASOF, *ASOF_BINS),
        "asof_cov_hist_sharded": oracle.asof_cov_hist_sql(path, K_ASOF,
                                                          *ASOF_BINS),
        "asof_cov_hist_join": oracle.asof_cov_hist_sql(path, K_ASOF,
                                                       *ASOF_BINS),
        "lag_lead": oracle.lag_lead_sql(path),
        "sessionize": oracle.sessionize_sql(path, SESSION_GAP_US),
        "lag_lead_partitioned": oracle.lag_lead_sql(path),
        "sessionize_partitioned": oracle.sessionize_sql(path,
                                                        SESSION_GAP_US),
        "doc_stats": oracle.doc_stats_sql(),
        "token_counts": oracle.token_counts_sql(),
        "quality": oracle.quality_sql(),
        "lang_id": oracle.lang_id_sql(),
        "dedup_exact": oracle.dedup_exact_sql(),
        "ngram_dupes": oracle.ngram_dupes_sql(NGRAM_N, NGRAM_THRESHOLD),
        "minhash_recall": oracle.minhash_recall_sql(NGRAM_N, ND_THRESHOLD),
        "simhash_recall": oracle.minhash_recall_sql(NGRAM_N, ND_THRESHOLD),
        "near_dup_survivors": oracle.near_dup_survivors_sql(NGRAM_N,
                                                            ND_THRESHOLD),
        "ann_topk": oracle.ann_topk_sql(ANN_QUERIES, ANN_K),
        "ann_topk_ivf": oracle.ann_topk_sql(ANN_QUERIES, ANN_K),
        "ann_topk_ivf_indexed": oracle.ann_topk_sql(ANN_QUERIES, ANN_K),
        "emb_near_dup": oracle.emb_near_dup_sql(EMB_DUP_THRESHOLD),
        "semdedup": oracle.semdedup_sql(f"{sf_dir}/embeddings.parquet",
                                        KMEANS_K, 5, SEMDEDUP_THRESHOLD),
        "emb_dedup2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, a, b
FROM ({oracle.emb_near_dup_sql(EMB_DUP_THRESHOLD)})
UNION ALL
SELECT CAST(1 AS BIGINT), vec_id, cluster
FROM ({oracle.semdedup_sql(f"{sf_dir}/embeddings.parquet",
                           KMEANS_K, 5, SEMDEDUP_THRESHOLD)})""",
        "media_features": oracle.media_features_sql(_media_path()),
        "rep_stats": oracle.rep_stats_sql(),
        "chunk_windows": oracle.chunk_windows_sql(CHUNK_W, CHUNK_S),
        "stop_filter": oracle.stop_filter_sql(),
        "df_counts": oracle.df_counts_sql(),
        "vocab_coverage": oracle.vocab_coverage_sql(),
        "vocab2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, word AS w, df AS a,
       CAST(0 AS BIGINT) AS b
FROM ({oracle.df_counts_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), p, vocab_size, covered
FROM ({oracle.vocab_coverage_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), word, cnt, rank
FROM ({oracle.mg_topwords_sql(CMS_TOPK)})""",
        "mg_topwords": oracle.mg_topwords_sql(CMS_TOPK),
        "top_quality_per_lang": oracle.top_quality_per_lang_sql(
            TOPK_PER_LANG),
        "normalize_text": oracle.normalize_text_sql(),
        "dedup_keep_best": oracle.dedup_keep_best_sql(),
        "pack_bins": oracle.pack_bins_sql(path, PACK_BUDGET),
        "tok_quantiles": oracle.tok_quantiles_sql(path),
        "decontam": oracle.decontam_sql(),
        "sample_split": oracle.sample_split_sql(),
        "tfidf_topk": oracle.tfidf_topk_sql(TFIDF_K),
        "bm25_topk": oracle.bm25_topk_sql(),
        "retrieval2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id AS a, word AS w,
       tf AS b, df AS c, CAST(0.0 AS DOUBLE) AS f
FROM ({oracle.tfidf_topk_sql(TFIDF_K)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, query_id, rank,
       CAST(0 AS BIGINT), score
FROM ({oracle.bm25_topk_sql()})""",
        "pricing_summary": oracle.pricing_summary_sql(),
        "revenue_by_nation": oracle.revenue_by_nation_sql(),
        "high_qty_orders": oracle.high_qty_orders_sql(JOIN_MIN_QTY),
        "cust_no_big_order": oracle.cust_no_big_order_sql(JOIN_MIN_TOTAL),
        "events_hourly": oracle.events_hourly_sql(),
        "events_json_k": oracle.events_json_k_sql(),
        "events_sessions": oracle.events_sessions_sql(),
        "events_history": oracle.events_history_sql(),
        "events_rolling": oracle.events_rolling_sql(),
        "bigram_stats": oracle.bigram_stats_sql(BIGRAM_MIN_COUNT),
        "pmi_pairs": oracle.pmi_pairs_sql(BIGRAM_MIN_COUNT, LM_DP),
        "colloc2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, w1, w2, c12, c1, c2,
       CAST(0.0 AS DOUBLE) AS pmi
FROM ({oracle.bigram_stats_sql(BIGRAM_MIN_COUNT)})
UNION ALL
SELECT CAST(1 AS BIGINT), w1, w2, c12, CAST(-1 AS BIGINT),
       CAST(-1 AS BIGINT), pmi
FROM ({oracle.pmi_pairs_sql(BIGRAM_MIN_COUNT, LM_DP)})""",
        "shipping_priority": oracle.shipping_priority_sql(),
        "cust_order_rollup": oracle.cust_order_rollup_sql(),
        "group_sample": oracle.group_sample_sql(GROUP_SAMPLE_N),
        "rank_by_len": oracle.rank_by_len_sql(path, RANK_TILES),
        "events_dedup": oracle.events_dedup_sql(),
        "kmeans_assign": oracle.kmeans_assign_sql(
            f"{sf_dir}/embeddings.parquet", KMEANS_K, 5),
        "pca_project_check": oracle.pca_check_sql(
            f"{sf_dir}/embeddings.parquet", PCA_COMPONENTS, 4),
        "emb_lsh_recall": oracle.emb_near_dup_sql(EMB_DUP_THRESHOLD),
        "cluster_reps": oracle.cluster_reps_sql(
            f"{sf_dir}/embeddings.parquet", KMEANS_K, 5, CLUSTER_REPS_N),
        "dup_spans": oracle.dup_spans_sql(DUP_SPAN_W),
        "dup_span_scrub": oracle.dup_span_scrub_sql(DUP_SPAN_W),
        "dup_spans2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, n_windows AS v1,
       dup_windows AS v2, dup_frac AS vf, '' AS txt
FROM ({oracle.dup_spans_sql(DUP_SPAN_W)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, n_removed, CAST(-1 AS BIGINT),
       CAST(0.0 AS DOUBLE), scrubbed
FROM ({oracle.dup_span_scrub_sql(DUP_SPAN_W)})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, n_removed, CAST(-2 AS BIGINT),
       CAST(0.0 AS DOUBLE), text2
FROM ({oracle.block_dedup_sql(BLOCK_W)})""",
        "unigram_logprob": oracle.unigram_logprob_sql(LM_DP),
        "bigram_logprob": oracle.bigram_logprob_sql(
            dp=LM_DP, min_count=BIGRAM_LM_MIN_COUNT),
        "nb_classify": oracle.nb_classify_sql(dp=LM_DP),
        "lm_logprob2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, avg_logprob,
       CAST(0 AS BIGINT) AS keep
FROM ({oracle.unigram_logprob_sql(LM_DP)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, avg_logprob, CAST(0 AS BIGINT)
FROM ({oracle.bigram_logprob_sql(
    dp=LM_DP, min_count=BIGRAM_LM_MIN_COUNT)})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, llr, keep
FROM ({oracle.nb_classify_sql(dp=LM_DP)})""",
        "zscore_by_source": oracle.zscore_by_source_sql(),
        "source_divergence": oracle.source_divergence_sql(),
        "mad_outliers": oracle.mad_outliers_sql(),
        "source_stats2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, CAST(doc_id AS VARCHAR) AS s1,
       '' AS s2, CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
       CAST(0 AS BIGINT) AS c, z AS f
FROM ({oracle.zscore_by_source_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), s1, s2, CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), jsd
FROM ({oracle.source_divergence_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(doc_id AS VARCHAR), '', med, mad,
       outlier, rz
FROM ({oracle.mad_outliers_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), source, '', n_grams, n_distinct,
       CAST(0 AS BIGINT), ttr
FROM ({oracle.source_diversity_sql()})""",
        "source_diversity": oracle.source_diversity_sql(),
        "events_distinct": oracle.events_distinct_sql(),
        "events_funnel": oracle.events_funnel_sql(),
        "asof_backfill": oracle.asof_backfill_sql(
            path, K_ASOF, *ASOF_BINS, BACKFILL_LAG_DAYS),
        "grouped_quantiles": oracle.grouped_quantiles_sql(),
        # --- tagged-UNION composites (VERDICT r3 next #1): each arm
        # is the constituent's own (individually green) SQL, tagged
        # and zero-padded exactly like the engine side ---
        "minimisers_all": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, mmer, start_pos, end_pos
FROM ({oracle.minimisers_sql(path, MIN_W, MIN_M)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, mmer, CAST(-1 AS BIGINT),
       CAST(-1 AS BIGINT)
FROM ({oracle.whole_seq_minimiser_sql(path, WHOLE_M)})""",
        "text_rewrite": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, norm_text AS rewritten,
       n_masked AS n
FROM ({oracle.normalize_text_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, clean_text, n_removed
FROM ({oracle.stop_filter_sql()})""",
        "dedup_survivors2": f"""\
SELECT CAST(0 AS BIGINT) AS policy, doc_id
FROM ({oracle.dedup_exact_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id
FROM ({oracle.dedup_keep_best_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id
FROM ({oracle.incremental_dedup_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), doc_id
FROM ({oracle.url_dedup_sql(_urltext_path())}) WHERE keep = 1""",
        "url_dedup": oracle.url_dedup_sql(_urltext_path()),
        "dedup_incremental": oracle.incremental_dedup_sql(),
        "decontam_frac": oracle.decontam_frac_sql(),
        "decontam2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, n_hits,
       CAST(contaminated AS BIGINT) AS v2, CAST(0.0 AS DOUBLE) AS vf
FROM ({oracle.decontam_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, n_hits, n_grams, frac
FROM ({oracle.decontam_frac_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, n_hits,
       CAST(contaminated AS BIGINT), CAST(0.0 AS DOUBLE)
FROM ({oracle.decontam_sql()})""",
        "bloom_decontam": oracle.decontam_sql(),
        "seed_topk": oracle.seed_topk_sql(SEED_MOD, SEED_TOPK_K),
        "ann_topk2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, qid AS a, vec_id AS b,
       CAST(0 AS BIGINT) AS c
FROM ({oracle.ann_topk_sql(ANN_QUERIES, ANN_K)})
UNION ALL
SELECT CAST(1 AS BIGINT), vec_id, score, CAST(0 AS BIGINT)
FROM ({oracle.seed_topk_sql(SEED_MOD, SEED_TOPK_K)})
UNION ALL
SELECT CAST(2 AS BIGINT), vec_id, nbr, rnk
FROM ({oracle.knn_graph_sql(KNN_K, KNN_DP)})""",
        "knn_graph": oracle.knn_graph_sql(KNN_K, KNN_DP),
        "scan_features": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, n_tok, cum_tok AS val1,
       bin AS val2, '' AS txt
FROM ({oracle.pack_bins_sql(path, PACK_BUDGET)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, n_tok, rnk, tile, ''
FROM ({oracle.rank_by_len_sql(path, RANK_TILES)})
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(bin AS VARCHAR), n_tok, n_docs, bin,
       packed
FROM ({oracle.pack_emit_sql(PACK_EMIT_BUDGET)})""",
        "pack_emit": oracle.pack_emit_sql(PACK_EMIT_BUDGET),
        "quantiles_all": f"""\
SELECT '__global__' AS scope, q, value
FROM ({oracle.tok_quantiles_sql(path)})
UNION ALL
SELECT lang, q, value FROM ({oracle.grouped_quantiles_sql()})
UNION ALL
SELECT '__sketch__', q, value
FROM ({oracle.sketch_quantiles_sql(path)})""",
        "sketch_quantiles": oracle.sketch_quantiles_sql(path),
        "sampling_flags": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, lang, bucket, split
FROM ({oracle.sample_split_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, lang, CAST(-1 AS BIGINT), ''
FROM ({oracle.group_sample_sql(GROUP_SAMPLE_N)})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, lang, rate, ''
FROM ({oracle.temperature_sample_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), doc_id, '', w, ''
FROM ({oracle.weighted_sample_sql()})""",
        "weighted_sample": oracle.weighted_sample_sql(),
        "events_enriched": f"""\
SELECT CAST(0 AS BIGINT) AS variant, event_id, k AS v1,
       CAST(0 AS BIGINT) AS v2, CAST(0 AS BIGINT) AS v3,
       CAST(0 AS BIGINT) AS v4, CAST(0 AS BIGINT) AS v5
FROM ({oracle.events_json_k_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), event_id, user_id, prior_n, prior_cents,
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ({oracle.events_history_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), event_id, user_id, roll_n, roll_cents,
       tw_n, tw_cents
FROM ({oracle.events_rolling_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), event_id, user_id, CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ({oracle.events_dedup_sql()})""",
        "relational_exist": f"""\
SELECT CAST(0 AS BIGINT) AS variant, o_orderpriority AS key_str,
       CAST(-1 AS BIGINT) AS key_id, n_orders AS n
FROM ({oracle.high_qty_orders_sql(JOIN_MIN_QTY)})
UNION ALL
SELECT CAST(1 AS BIGINT), c_mktsegment, c_custkey, CAST(0 AS BIGINT)
FROM ({oracle.cust_no_big_order_sql(JOIN_MIN_TOTAL)})""",
        "relational_rank": f"""\
SELECT CAST(0 AS BIGINT) AS variant, o_orderkey AS key,
       o_orderpriority AS cat, o_date_us AS val1, revenue_e4 AS val2
FROM ({oracle.shipping_priority_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), c_custkey, c_mktsegment,
       CAST(n_orders AS DOUBLE), CAST(sum_cents AS DOUBLE)
FROM ({oracle.cust_order_rollup_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), node, '',
       CAST("rank" AS DOUBLE), CAST(deg AS DOUBLE)
FROM ({oracle.pagerank_sql()})""",
        "pagerank": oracle.pagerank_sql(),
        "pagerank_exchange": oracle.pagerank_sql(),
        "windowed_all": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, prev_n_tok AS v1,
       next_n_tok AS v2
FROM ({oracle.lag_lead_sql(path)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, session_seq, CAST(0 AS BIGINT)
FROM ({oracle.sessionize_sql(path, SESSION_GAP_US)})""",
        "events_flow": f"""\
SELECT CAST(0 AS BIGINT) AS variant, event_type AS key_str,
       win AS k1, n_events AS k2, n_users AS k3,
       CAST(0.0 AS DOUBLE) AS vnum, '' AS vstr
FROM ({oracle.events_distinct_sql()})
UNION ALL
SELECT CAST(1 AS BIGINT), '', user_id, abc_ts_us, CAST(0 AS BIGINT),
       CAST(0.0 AS DOUBLE), ''
FROM ({oracle.events_funnel_sql()})
UNION ALL
SELECT CAST(2 AS BIGINT), col || ':' || metric, CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT), val_num, val_str
FROM ({oracle.data_profile_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), '', cohort_day, day_offset, n_users,
       CAST(0.0 AS DOUBLE), ''
FROM ({oracle.retention_cohorts_sql()})""",
        "retention_cohorts": oracle.retention_cohorts_sql(),
        "data_profile": oracle.data_profile_sql(),
        "asof_lagged": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, bin, val
FROM ({oracle.asof_cov_hist_sql(path, K_ASOF, *ASOF_BINS)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, bin, val
FROM ({oracle.asof_backfill_sql(path, K_ASOF, *ASOF_BINS,
                                BACKFILL_LAG_DAYS)})""",
        "dsir_weights": oracle.dsir_weights_sql("en", LM_DP),
        "quality_filter": oracle.quality_filter_sql(QF_KEEP_FRAC),
        "c4_filter": oracle.c4_filter_sql(
            C4_DELIM, C4_MWL, C4_MIN_LINES, None, False),
        "block_dedup": oracle.block_dedup_sql(BLOCK_W),
        "temperature_sample": oracle.temperature_sample_sql(),
        "quality_filter2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, CAST(-1 AS BIGINT) AS v1,
       CAST(-1 AS BIGINT) AS v2, CAST(1 AS BIGINT) AS keep, '' AS txt
FROM ({oracle.quality_filter_sql(QF_KEEP_FRAC)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, n_lines, n_kept, keep, clean_text
FROM ({oracle.c4_filter_sql(C4_DELIM, C4_MWL, C4_MIN_LINES, None,
                            False)})
UNION ALL
SELECT CAST(2 AS BIGINT), doc_id, n_distinct,
       CAST(floor(entropy * 10000 + 0.5) AS BIGINT), keep, ''
FROM ({oracle.char_entropy_sql()})
UNION ALL
SELECT CAST(3 AS BIGINT), doc_id, n, CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), phrase
FROM ({oracle.phrase_hits_sql(BLOCK_PHRASES)})""",
        "phrase_hits": oracle.phrase_hits_sql(BLOCK_PHRASES),
        "char_entropy": oracle.char_entropy_sql(),
        "frame_sample": oracle.frame_sample_sql(_video_path(),
                                                FRAME_STRIDE),
        "audio_energy": oracle.audio_energy_sql(_audio_path(),
                                                AUDIO_WIN, AUDIO_HOP),
        "pii_scrub": oracle.pii_scrub_sql(_webtext_path()),
        "ppl_buckets": oracle.ppl_buckets_sql(LM_DP, PPL_TILES),
        "ppl_buckets_scored": oracle.ppl_buckets_scored_sql(PPL_TILES),
        "ppl_buckets2": f"""\
SELECT CAST(0 AS BIGINT) AS variant, doc_id, avg_logprob AS score,
       tile
FROM ({oracle.ppl_buckets_sql(LM_DP, PPL_TILES)})
UNION ALL
SELECT CAST(1 AS BIGINT), doc_id, model_score, tile
FROM ({oracle.ppl_buckets_scored_sql(PPL_TILES)})""",
        "media_windows": f"""\
SELECT CAST(0 AS BIGINT) AS variant, item_id, frame_idx AS idx,
       mean AS val, '' AS h
FROM ({oracle.frame_sample_sql(_video_path(), FRAME_STRIDE)})
UNION ALL
SELECT CAST(1 AS BIGINT), item_id, win_idx, energy, ''
FROM ({oracle.audio_energy_sql(_audio_path(), AUDIO_WIN, AUDIO_HOP)})
UNION ALL
SELECT CAST(2 AS BIGINT), item_id, n_chunks, CAST(tot AS DOUBLE),
       CAST(xh AS VARCHAR)
FROM ({oracle.cdc_digest_sql(_cdc_media_path())})""",
        "cdc_chunks": oracle.cdc_chunks_sql(_cdc_media_path()),
        "cdc_digest": oracle.cdc_digest_sql(_cdc_media_path()),
        "domain_stats": oracle.domain_stats_sql(_webtext_path()),
        "winnow_fp": oracle.winnow_sql(WINNOW_W),
        "gopher_filter": oracle.gopher_filter_sql(),
        "source_overlap": oracle.source_overlap_sql(),
        "decontam_spans": oracle.decontam_spans_sql(),
        "hard_negatives": oracle.hard_negatives_sql(ANN_QUERIES, ANN_K),
        "quantize_emb": oracle.quantize_sql(),
        "hll_users": oracle.hll_users_sql(f"{sf_dir}/events.parquet"),
        "feature_hash": oracle.feature_hash_sql(FEATURE_DIM),
        "cms_topwords": oracle.cms_topwords_sql(
            f"{sf_dir}/documents.parquet", CMS_TOPK),
        "bpe_merges": oracle.bpe_merges_sql(
            f"{sf_dir}/documents.parquet", BPE_MERGES),
        "decomp_project": f"""\
SELECT CAST(0 AS BIGINT) AS variant, vec_id, comp, val
FROM ({oracle.pca_check_sql(f"{sf_dir}/embeddings.parquet",
                            PCA_COMPONENTS, 4)})
UNION ALL
SELECT CAST(1 AS BIGINT), vec_id, CAST(-1 AS BIGINT),
       CAST(cluster AS DOUBLE)
FROM ({oracle.kmeans_assign_sql(f"{sf_dir}/embeddings.parquet",
                                KMEANS_K, 5)})
UNION ALL
SELECT CAST(2 AS BIGINT), vec_id, cluster, CAST(-1.0 AS DOUBLE)
FROM ({oracle.proto_prune_sql(f"{sf_dir}/embeddings.parquet",
                              KMEANS_K, 5)})
UNION ALL
SELECT CAST(3 AS BIGINT), vec_id, rank, CAST(n_assigned AS DOUBLE)
FROM ({oracle.kcenter_select_sql(f"{sf_dir}/embeddings.parquet",
                                 KCENTER_K)})""",
        "proto_prune": oracle.proto_prune_sql(
            f"{sf_dir}/embeddings.parquet", KMEANS_K, 5),
        "kcenter_select": oracle.kcenter_select_sql(
            f"{sf_dir}/embeddings.parquet", KCENTER_K),
    }


def _media_path() -> str:
    from .extras.multimodal import ensure_media_parquet
    return ensure_media_parquet()


FRAME_STRIDE = 2
AUDIO_WIN = 128
AUDIO_HOP = 64


def _video_path() -> str:
    from .extras.multimodal import ensure_video_parquet
    return ensure_video_parquet()


def _webtext_path() -> str:
    from .extras.pii import ensure_webtext_parquet
    return ensure_webtext_parquet()


def _urltext_path() -> str:
    from .extras.pii import ensure_urltext_parquet
    return ensure_urltext_parquet()


PPL_TILES = 3


def q_ppl_buckets(sf_dir: str):
    """CCNet-style head/middle/tail perplexity buckets over the
    unigram-LM proxy (dp-rounded on both engines, composite ntile
    order so ties are deterministic)."""
    from .extras.text import ppl_buckets
    return ppl_buckets(_docs(sf_dir), tiles=PPL_TILES, dp=LM_DP)


WINNOW_W = 8
BPE_MERGES = 40


def q_ppl_buckets_scored(sf_dir: str):
    """CCNet bucketing over an EXTERNAL precomputed score column
    (the real deployment: an upstream inference stage attaches model
    perplexities; here the deterministic stand-in is n_chars) — the
    unigram proxy is skipped entirely."""
    from .extras.text import ppl_buckets
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def as_score(b):
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "model_score": b["n_chars"].astype(np.float64)})

    scored = ds.map_batches(as_score, batch_format="pandas")
    return ppl_buckets(scored, tiles=PPL_TILES, score_col="model_score")


def q_source_overlap(sf_dir: str):
    """Cross-source shared-vocabulary matrix (contamination / mixture
    diagnostic), distinct-hash combiner + one word-bucket exchange."""
    from .extras.text import source_overlap
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    return source_overlap(ds)


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining: per query, top-k most-similar vectors
    with a DIFFERENT label (contrastive-training negatives)."""
    import pyarrow.parquet as pq

    from .extras.similarity import _emb_matrix, hard_negatives
    path = f"{sf_dir}/embeddings.parquet"
    t = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    t = t.filter(pa.compute.less(t.column("vec_id"), ANN_QUERIES))
    ds = ray.data.read_parquet(path,
                               columns=["vec_id", "embedding", "label"])
    return hard_negatives(ds, t.column("vec_id").to_numpy(),
                          _emb_matrix(t),
                          t.column("label").to_numpy(), k=ANN_K)


def q_quantize_emb(sf_dir: str):
    """Per-vector absmax int8 quantization, exploded for scalar-exact
    comparison."""
    from .extras.similarity import quantize_embeddings
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return quantize_embeddings(ds)


FEATURE_DIM = 1024
CMS_TOPK = 10


def q_cms_topwords(sf_dir: str):
    """Count-min heavy-hitter estimates: the distributed CM register
    matrix (fixed 32 KB partial per block, exact-int sum merge) probed
    at the corpus's exact top-10 words — est and true count side by
    side, gated against an independent scalar-Python fit."""
    from .extras.sketch import cms_estimate, cms_word_counts
    from .extras.text import exact_topk_words
    from .extras.sampling import md5_lower64
    docs = _docs(sf_dir)
    regs = cms_word_counts(docs)
    # exact yardstick via per-block top-k over the merged dictionary
    # blocks (driver sees <= blocks x k rows, never the vocabulary —
    # VERDICT r4 missing #2)
    wc = exact_topk_words(docs, CMS_TOPK)
    words = wc["word"].to_numpy(object)
    est = cms_estimate(regs, md5_lower64(words))
    return pd.DataFrame({"word": words,
                         "est": est.astype(np.int64),
                         "exact": wc["cnt"].to_numpy(np.int64)})


def q_feature_hash(sf_dir: str):
    """Hashing-trick sparse feature vectors (fixed dim, no vocab, no
    shuffle): nonzero (doc_id, idx, signed count) entries."""
    from .extras.text import feature_hash
    return feature_hash(_docs(sf_dir), dim=FEATURE_DIM)


def q_hll_users(sf_dir: str):
    """Distributed HyperLogLog distinct-user estimate per event_type
    (fixed 4 KB register partials, one tiny exchange), dp-rounded and
    gated against an independent scalar-Python fit — plus the TRUE
    exact count joined in so the gated surface shows the sketch
    error."""
    from .extras.sketch import hll_distinct
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    est = hll_distinct(ds, key="user_id", group="event_type")

    def rnd(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "est": np.round(b["est"], 4)})
    est = est.map_batches(rnd, batch_format="pandas")
    # exact distinct count rides along so the GATED surface exposes
    # the sketch error (per-block drop_duplicates combiner, one
    # type-keyed exchange — at test scale; the sketch is the 100-TB
    # path, the exact count is the comparison yardstick)
    dd = ds.map_batches(
        lambda b: b.drop_duplicates(),
        batch_format="pandas").groupby("event_type").map_groups(
        lambda g: pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "exact": [np.int64(g["user_id"].nunique())]}),
        batch_format="pandas")

    def attach(e: pd.DataFrame, x: pd.DataFrame) -> pd.DataFrame:
        return e.merge(x, on="event_type")
    epdf = est.to_pandas()
    xpdf = dd.to_pandas()
    return attach(epdf, xpdf)


def q_decontam_spans(sf_dir: str):
    """Span-level decontamination: mask exactly the words covered by
    eval-matching n-grams, keep the rest (Dolma-style)."""
    from .extras.decontam import decontam_spans_pipeline
    return decontam_spans_pipeline(_docs(sf_dir))


def q_gopher_filter(sf_dir: str):
    """Gopher composite quality rules (Rae et al. 2021): keep +
    per-rule fail bitmask, one streaming pass."""
    from .extras.text import gopher_filter
    return gopher_filter(_docs(sf_dir))


def q_bpe_merges(sf_dir: str):
    """Distributed BPE vocabulary learning: one vocab-bounded word
    count pass + the driver merge loop; gated against an independent
    single-process fit embedded as SQL literals."""
    from .extras.text import bpe_merges
    return bpe_merges(_docs(sf_dir), n_merges=BPE_MERGES)


def q_bpe_encode(sf_dir: str):
    """Rows-only twin: per-doc token count under the learned merges
    (iterative BPE application is not SQL-expressible; the merge
    TABLE itself is exactly gated by bpe_merges, and pytest pins the
    encoder against a direct reference)."""
    from .extras.text import bpe_encode, bpe_merges
    m = bpe_merges(_docs(sf_dir), n_merges=BPE_MERGES).to_pandas()
    return bpe_encode(_docs(sf_dir), m)


def q_winnow_fp(sf_dir: str):
    """Winnowing document fingerprints (MOSS) over the documents
    table: rightmost-tie window minima of md5-lower-64 word hashes."""
    from .extras.text import winnow_fingerprints
    return winnow_fingerprints(_docs(sf_dir), w=WINNOW_W)


def q_domain_stats(sf_dir: str):
    """Per-domain doc counts from each doc's first URL over the
    injected web-text parquet (crawl-curation rollup)."""
    from .extras.pii import domain_stats_pipeline
    return domain_stats_pipeline(ray.data.read_parquet(_webtext_path()))


def q_pii_scrub(sf_dir: str):
    """PII counting + scrubbing over the deterministic injected
    web-text parquet: per-doc URL/email/phone counts on the original
    text plus ordered placeholder substitution, bit-identical to the
    RE2 oracle (patterns restricted to the dialect intersection)."""
    from .extras.pii import pii_scrub_pipeline
    return pii_scrub_pipeline(ray.data.read_parquet(_webtext_path()))


def _audio_path() -> str:
    from .extras.multimodal import ensure_audio_parquet
    return ensure_audio_parquet()


def q_audio_energy(sf_dir: str):
    """Windowed audio energy over the deterministic int16-PCM
    parquet: hop-strided mean-square per window, gated by a per-byte
    blob SQL oracle (bit-identical doubles: int square-sum / win)."""
    from .extras.multimodal import audio_energy_pipeline
    return audio_energy_pipeline(ray.data.read_parquet(_audio_path()),
                                 win=AUDIO_WIN, hop=AUDIO_HOP)


def q_frame_sample(sf_dir: str):
    """Video frame sampling as an actor-pool stage over the
    deterministic raw-frame video parquet: every stride-th frame's
    exact mean byte value, gated by a per-byte blob SQL oracle
    (bit-identical doubles: int sum / frame size)."""
    from .extras.multimodal import frame_sample_pipeline
    out = frame_sample_pipeline(ray.data.read_parquet(_video_path()),
                                stride=FRAME_STRIDE)
    return out


# ---------------------------------------------------------------------------
# training-data extras (documents / embeddings tables)
# ---------------------------------------------------------------------------

NGRAM_N = 3
NGRAM_THRESHOLD = 0.08
ANN_QUERIES = 5
ANN_K = 10
SEED_MOD = 17
SEED_TOPK_K = 100
EMB_DUP_THRESHOLD = 0.4
# end-to-end near-dup / recall-containment params: verify threshold
# 0.8; 128 perms x 32 bands (rows-per-band 4) puts LSH miss
# probability at J>=0.8 at (1-0.8^4)^32 ~ 5e-8 per pair, so the
# oracle (exact-Jaccard edges) matches deterministically
ND_THRESHOLD = 0.8
ND_PERMS = 128
ND_BANDS = 32


def _docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

QF_KEEP_FRAC = 0.5


def q_dsir_weights(sf_dir: str):
    """DSIR-style log importance weights toward the lang='en' target
    slice (two unigram LMs, broadcast once; avg ln-ratio per doc,
    dp-rounded both engines)."""
    from .extras.text import dsir_weights
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    return dsir_weights(ds, target_lang="en", dp=LM_DP)


def q_quality_filter(sf_dir: str):
    """Global quality-percentile survivors: top floor(0.5 * n) docs
    under ORDER BY (quality, doc_id) over the bit-exact quality
    score; range-partitioned rank filter, only the boundary bucket
    sorts."""
    from .extras.scan import quality_filter
    return quality_filter(_docs(sf_dir), keep_frac=QF_KEEP_FRAC)


def q_doc_stats(sf_dir: str):
    from .extras.text import doc_stats_pipeline

    out = doc_stats_pipeline(_docs(sf_dir))

    def cast(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "n_words", "n_chars", "stop_cnt"])
    return out.map_batches(cast, batch_format="pyarrow")


def q_token_counts(sf_dir: str):
    from .extras.text import token_count_pipeline
    return token_count_pipeline(_docs(sf_dir))


def q_quality(sf_dir: str):
    from .extras.text import quality_pipeline
    return quality_pipeline(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    from .extras.text import lang_id_pipeline
    return lang_id_pipeline(_docs(sf_dir))


CHUNK_W, CHUNK_S = 32, 16
TOPK_PER_LANG = 3


def q_rep_stats(sf_dir: str):
    from .extras.text import rep_stats_pipeline
    return rep_stats_pipeline(_docs(sf_dir))


def q_chunk_windows(sf_dir: str):
    from .extras.chunking import chunk_windows_pipeline
    return chunk_windows_pipeline(_docs(sf_dir), window=CHUNK_W,
                                  stride=CHUNK_S)


def q_stop_filter(sf_dir: str):
    from .extras.chunking import stop_filter_pipeline
    return stop_filter_pipeline(_docs(sf_dir))


def q_df_counts(sf_dir: str):
    from .extras.text import df_counts_pipeline
    return df_counts_pipeline(_docs(sf_dir))


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve (tokenizer-sizing Zipf surface)."""
    from .extras.text import vocab_coverage
    return vocab_coverage(_docs(sf_dir))


def q_mg_topwords(sf_dir: str):
    """Certified Misra-Gries heavy hitters: exact top-k words with NO
    word-keyed exchange (per-block MG partials + candidate confirm)."""
    from .extras.sketch import mg_topwords
    return mg_topwords(_docs(sf_dir), k=CMS_TOPK)


def q_vocab2(sf_dir: str):
    """Word-dictionary family: per-word document frequency (variant 0)
    UNION the vocabulary coverage curve (variant 1, w = the target
    fraction as string) UNION the certified Misra-Gries exact top-k
    (variant 2, b = rank)."""
    df = q_df_counts(sf_dir)
    vc = _as_ds(q_vocab_coverage(sf_dir))
    mg = _as_ds(q_mg_topwords(sf_dir))

    def pad_d(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "w": b["word"],
            "a": b["df"].astype(np.int64),
            "b": _const_i64(len(b), 0)})

    def pad_v(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "w": b["p"],
            "a": b["vocab_size"].astype(np.int64),
            "b": b["covered"].astype(np.int64)})

    def pad_m(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2), "w": b["word"],
            "a": b["cnt"].astype(np.int64),
            "b": b["rank"].astype(np.int64)})

    return (df.map_batches(pad_d, batch_format="pandas")
            .union(vc.map_batches(pad_v, batch_format="pandas"))
            .union(mg.map_batches(pad_m, batch_format="pandas")))


def q_top_quality_per_lang(sf_dir: str):
    from .extras.grouped import grouped_topk
    from .extras.text import quality_pipeline
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    scored = quality_pipeline(ds)      # keeps lang (passthrough)
    out = grouped_topk(scored, key="lang", score="quality",
                       k=TOPK_PER_LANG, tiebreak="doc_id")

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "lang", "quality"]]
    return out.map_batches(cast, batch_format="pandas")


def q_events_hourly(sf_dir: str):
    from .extras.events import tumbling_window_agg
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    out = tumbling_window_agg(ds)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["user_id", "win", "n_events", "sum_cents"]]
    return out.map_batches(cast, batch_format="pandas")


def q_events_json_k(sf_dir: str):
    from .extras.events import json_int_field
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])
    return json_int_field(ds, "props", "k")


def _events(sf_dir: str, cols):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def q_events_sessions(sf_dir: str):
    from .extras.events import sessionized_user_stats
    out = sessionized_user_stats(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]))

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["user_id", "session_seq", "n_events",
                      "duration_us", "sum_cents"]]
    return out.map_batches(cast, batch_format="pandas")


def q_events_history(sf_dir: str):
    from .extras.events import user_history_features
    return user_history_features(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]))


def q_events_rolling(sf_dir: str):
    from .extras.events import rolling_user_features
    return rolling_user_features(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]))


BIGRAM_MIN_COUNT = 5


def q_bigram_stats(sf_dir: str):
    from .extras.text import bigram_stats
    return bigram_stats(_docs(sf_dir), min_count=BIGRAM_MIN_COUNT)


def q_events_dedup(sf_dir: str):
    from .extras.events import drop_consecutive_dups
    return drop_consecutive_dups(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]))


def q_dedup_exact(sf_dir: str):
    from .extras.dedup import exact_dedup_survivors
    return exact_dedup_survivors(_docs(sf_dir))


def q_ngram_dupes(sf_dir: str):
    from .extras.dedup import ngram_jaccard_pairs
    out = ngram_jaccard_pairs(_docs(sf_dir), n=NGRAM_N,
                              threshold=NGRAM_THRESHOLD)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_ann_topk(sf_dir: str):
    from .extras.similarity import brute_force_topk, load_queries
    path = f"{sf_dir}/embeddings.parquet"
    qids, qmat = load_queries(path, ANN_QUERIES)
    ds = ray.data.read_parquet(path)
    return brute_force_topk(ds, qids, qmat, k=ANN_K)


def q_ann_topk_ivf(sf_dir: str):
    """IVF cell machinery end-to-end with exhaustive probing
    (nprobe = all cells), which must reproduce the exact top-k — so
    it shares ann_topk's SQL oracle.  The approximate regime
    (nprobe << cells) is recall-tested in pytest."""
    import pyarrow.parquet as pq
    from .extras.similarity import (_emb_matrix, ivf_topk, load_queries,
                                    train_ivf_centroids)
    path = f"{sf_dir}/embeddings.parquet"
    qids, qmat = load_queries(path, ANN_QUERIES)
    cent = train_ivf_centroids(_emb_matrix(pq.read_table(path)),
                               n_centroids=16)
    ds = ray.data.read_parquet(path)
    return ivf_topk(ds, qids, qmat, cent, k=ANN_K, nprobe=len(cent))


def q_ann_topk_ivf_indexed(sf_dir: str):
    """Materialized-IVF path: one-time cell-partitioned index build
    (cached per sf dir), then a query run that READS only probed
    cells' files.  Run at full probe so it must reproduce the exact
    top-k and share ann_topk's SQL oracle; the pruned regime
    (nprobe << cells) is recall- and pruning-tested in pytest."""
    import os
    import pyarrow.parquet as pq
    from .extras.similarity import (_emb_matrix, ivf_build_index,
                                    ivf_topk_indexed, load_queries,
                                    train_ivf_centroids)
    path = f"{sf_dir}/embeddings.parquet"
    qids, qmat = load_queries(path, ANN_QUERIES)
    cent = train_ivf_centroids(_emb_matrix(pq.read_table(path)),
                               n_centroids=16)
    tag = os.path.basename(os.path.normpath(sf_dir))
    idx = f"/tmp/kmerray_data/ivf-index-{tag}-c16-v1"
    if not os.path.isdir(idx) or not os.listdir(idx):
        ivf_build_index(ray.data.read_parquet(path), cent, idx)
    return ivf_topk_indexed(idx, qids, qmat, cent, k=ANN_K,
                            nprobe=len(cent))


SEMDEDUP_THRESHOLD = 0.4


def q_semdedup(sf_dir: str):
    """SemDeDup-style semantic dedup survivors: k-means clusters +
    within-cluster lower-id cosine domination (arXiv:2303.09540)."""
    from .extras.decomp import semdedup_survivors
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return semdedup_survivors(ds, n_clusters=KMEANS_K, iters=5,
                              threshold=SEMDEDUP_THRESHOLD)


def q_emb_dedup2(sf_dir: str):
    """Embedding-level dedup under both granularities: exact global
    cosine near-dup pairs (variant 0: a, b) UNION SemDeDup
    within-cluster survivors (variant 1: a = vec_id, b = cluster)."""
    pairs = q_emb_near_dup(sf_dir)
    surv = q_semdedup(sf_dir)

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"variant": _const_i64(len(b), 0),
                             "a": b["a"].astype(np.int64),
                             "b": b["b"].astype(np.int64)})

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"variant": _const_i64(len(b), 1),
                             "a": b["vec_id"].astype(np.int64),
                             "b": b["cluster"].astype(np.int64)})

    return (pairs.map_batches(pad_p, batch_format="pandas")
            .union(surv.map_batches(pad_s, batch_format="pandas")))


def q_emb_near_dup(sf_dir: str):
    """Exact block-grid path (no full-matrix broadcast); block_rows
    sized so the sf0.01 table exercises a multi-block grid."""
    from .extras.similarity import cosine_near_dup_pairs
    path = f"{sf_dir}/embeddings.parquet"
    return cosine_near_dup_pairs(path, threshold=EMB_DUP_THRESHOLD,
                                 block_rows=256)


def q_emb_near_dup_lsh(sf_dir: str):
    """Rows-only check: sub-quadratic LSH-bucketed near-dup (recall
    vs the exact block grid is asserted in tests)."""
    from .extras.similarity import cosine_near_dup_lsh
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return cosine_near_dup_lsh(ds, threshold=EMB_DUP_THRESHOLD)


# oracle-only LSH config for the cosine-recall containment gate:
# 2-bit hyperplane tables give a pair at the 0.4-cosine boundary
# collision probability p^2 ~ 0.40 per table, so 32 tables miss it
# with probability (1-0.4)^32 ~ 8e-8 — the semi-join with the exact
# pair set deterministically hash-equals the exact set.  (The
# production 4-bit x 8-table config trades that tail recall for
# ~4x smaller buckets.)
EMB_RECALL_BITS = 2
EMB_RECALL_TABLES = 32


def q_emb_lsh_recall(sf_dir: str):
    """Containment oracle for hyperplane-LSH near-dup blocking:
    exact cosine pairs semi-joined with the LSH pairs at an
    oracle-only high-recall config; hash-equals the full exact pair
    set iff the banded shuffle missed none."""
    from .extras.dedup import pair_semijoin
    from .extras.similarity import (cosine_near_dup_lsh,
                                    cosine_near_dup_pairs)
    path = f"{sf_dir}/embeddings.parquet"
    exact = cosine_near_dup_pairs(path, threshold=EMB_DUP_THRESHOLD)
    lsh = cosine_near_dup_lsh(
        ray.data.read_parquet(path, columns=["vec_id", "embedding"]),
        threshold=EMB_DUP_THRESHOLD, n_bits=EMB_RECALL_BITS,
        n_tables=EMB_RECALL_TABLES)
    out = pair_semijoin(exact, lsh)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_near_dup_survivors(sf_dir: str):
    """Full near-dup dedup end-to-end (LSH candidates -> distributed
    gram-semi-join verify -> distributed components -> survivors),
    gated by an EXACT DuckDB oracle (recursive-CTE components over the
    exact Jaccard edge set) — VERDICT r2 next #1."""
    from .extras.dedup import near_dup_survivors
    out = near_dup_survivors(_docs(sf_dir), n=NGRAM_N, num_perm=ND_PERMS,
                             bands=ND_BANDS, threshold=ND_THRESHOLD,
                             distributed=True)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"].astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_minhash_recall(sf_dir: str):
    """Containment oracle for the LSH candidate stage: exact-Jaccard
    pairs at ND_THRESHOLD semi-joined with the banded candidates.
    Hash-equals the full exact pair set iff LSH recall is 1 (VERDICT
    r2 next #6a)."""
    from .extras.dedup import (minhash_lsh_candidates, ngram_jaccard_pairs,
                               pair_semijoin)
    docs = _docs(sf_dir)
    cands = minhash_lsh_candidates(docs, n=NGRAM_N, num_perm=ND_PERMS,
                                   bands=ND_BANDS)
    exact = ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=ND_THRESHOLD)
    out = pair_semijoin(exact, cands)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_minhash_candidates(sf_dir: str):
    """Rows-only check (LSH banding is not SQL-expressible)."""
    from .extras.dedup import minhash_lsh_candidates
    return minhash_lsh_candidates(_docs(sf_dir), n=NGRAM_N)


def q_simhash_pairs(sf_dir: str):
    """Rows-only check (the emitted-pairs-have-Hamming<=3 invariant is
    pytest-asserted against an independent recomputation)."""
    from .extras.dedup import simhash_near_dup_pairs
    return simhash_near_dup_pairs(_docs(sf_dir), max_hamming=3)


# oracle-only simhash config: 16 x 4-bit bands block-guarantee every
# pair with Hamming <= 15 (pigeonhole), and on the deterministic corpus
# every exact-Jaccard>=0.8 pair sits within Hamming 10 (measured max 8)
SH_RECALL_HAMMING = 10
SH_RECALL_BANDS = 16


def q_simhash_recall(sf_dir: str):
    """Containment oracle for SimHash blocking: exact-Jaccard pairs at
    ND_THRESHOLD semi-joined with simhash pairs at a Hamming radius
    wide enough to cover them all (VERDICT r2 next #6).  4-bit bands
    are an oracle-only config (they emit O(n^2/16) candidates — the
    production radius-3 config uses 16-bit bands)."""
    from .extras.dedup import (ngram_jaccard_pairs, pair_semijoin,
                               simhash_near_dup_pairs)
    docs = _docs(sf_dir)
    sh = simhash_near_dup_pairs(docs, max_hamming=SH_RECALL_HAMMING,
                                bands=SH_RECALL_BANDS)
    exact = ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=ND_THRESHOLD)
    out = pair_semijoin(exact, sh)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["a"].astype(np.int64),
                             "b": batch["b"].astype(np.int64)})
    return out.map_batches(cast, batch_format="pandas")


def q_media_features(sf_dir: str):
    """Multimodal actor-pool plumbing over a deterministic fake-binary
    parquet, now gated by an EXACT DuckDB oracle over the BLOB
    (VERDICT r2 next #5): nonzero 16-bin byte-histogram entries +
    frame mean per item (exact int counts / sizes -> bit-identical
    doubles).  Entropy stays pytest-checked (media pipeline tests)."""
    from .extras.multimodal import (ensure_media_parquet,
                                    media_features_pipeline)
    path = ensure_media_parquet()
    out = media_features_pipeline(ray.data.read_parquet(path), fake=True)

    def explode(batch: pa.Table) -> pa.Table:
        arr = batch.column("features").combine_chunks()
        mat = arr.flatten().to_numpy().reshape(batch.num_rows, 18)
        hist, mean = mat[:, :16], mat[:, 17]
        rows, bins = np.nonzero(hist)
        return pa.table({
            "item_id": batch.column("item_id").take(pa.array(rows)),
            "media_type": batch.column("media_type").take(pa.array(rows)),
            "bin": pa.array(bins.astype(np.int64)),
            "freq": pa.array(hist[rows, bins]),
            "mean": pa.array(mean[rows]),
        })
    return out.map_batches(explode, batch_format="pyarrow")


PACK_BUDGET = 4096
PACK_EMIT_BUDGET = 2048
TFIDF_K = 3


RANK_TILES = 10


def q_rank_by_len(sf_dir: str):
    from .extras.scan import rank_by_len
    return rank_by_len(_seq(sf_dir, ["doc_id", "n_tok"]),
                       tiles=RANK_TILES)


def q_pack_bins(sf_dir: str):
    from .extras.scan import pack_bins
    return pack_bins(_seq(sf_dir, ["doc_id", "n_tok"]),
                     budget=PACK_BUDGET)


def q_tok_quantiles(sf_dir: str):
    from .extras.scan import tok_quantiles
    return tok_quantiles(_seq(sf_dir, ["n_tok"]))


def q_decontam(sf_dir: str):
    from .extras.decontam import decontam_pipeline
    return decontam_pipeline(_docs(sf_dir))


def q_decontam_frac(sf_dir: str):
    from .extras.decontam import decontam_frac_pipeline
    return decontam_frac_pipeline(_docs(sf_dir))


def q_decontam2(sf_dir: str):
    """Decontamination family: contaminated flag (variant 0) UNION
    the GPT-3-style per-doc overlap-fraction report (variant 1) UNION
    the Bloom-prefilter scale path (variant 2 — same surface as
    variant 0 through a bitmap-broadcast + bucketed exact confirm)."""
    flag = q_decontam(sf_dir)
    frac = q_decontam_frac(sf_dir)
    bloom = q_bloom_decontam(sf_dir)

    def pad_f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "doc_id": b["doc_id"].astype(np.int64),
            "n_hits": b["n_hits"].astype(np.int64),
            "v2": b["contaminated"].astype(np.int64),
            "vf": np.zeros(len(b))})

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "doc_id": b["doc_id"].astype(np.int64),
            "n_hits": b["n_hits"].astype(np.int64),
            "v2": b["n_grams"].astype(np.int64),
            "vf": b["frac"].astype(np.float64)})

    def pad_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "doc_id": b["doc_id"].astype(np.int64),
            "n_hits": b["n_hits"].astype(np.int64),
            "v2": b["contaminated"].astype(np.int64),
            "vf": np.zeros(len(b))})

    return (flag.map_batches(pad_f, batch_format="pandas")
            .union(frac.map_batches(pad_r, batch_format="pandas"))
            .union(bloom.map_batches(pad_b, batch_format="pandas")))


def q_bloom_decontam(sf_dir: str):
    """Bloom-prefilter decontamination — the no-broadcast scale path;
    same integer surface and SQL oracle as q_decontam."""
    from .extras.decontam import bloom_decontam_pipeline
    return bloom_decontam_pipeline(_docs(sf_dir))


def q_dedup_incremental(sf_dir: str):
    from .extras.dedup import incremental_dedup_survivors
    return incremental_dedup_survivors(_docs(sf_dir))


def q_seed_topk(sf_dir: str):
    from .extras.similarity import seed_centroid_topk
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return seed_centroid_topk(ds, seed_mod=SEED_MOD, k=SEED_TOPK_K)


KNN_K = 5
KNN_DP = 6


def q_knn_graph(sf_dir: str):
    """Exact all-vectors k-NN cosine graph (one task per query
    block streaming the corpus, running top-k — no exchange)."""
    from .extras.similarity import knn_graph
    return knn_graph(f"{sf_dir}/embeddings.parquet", k=KNN_K,
                     dp=KNN_DP)


def q_ann_topk2(sf_dir: str):
    """Similarity-ranking family: brute-force cosine top-k per query
    (variant 0) UNION the quantized seed-centroid global top-k
    (variant 1, the classifier-lite quality-ranking pattern) UNION
    the exact all-vectors k-NN graph (variant 2, rank gated here,
    rounded sims gated in the tail twin)."""
    ann = q_ann_topk(sf_dir)
    seed = q_seed_topk(sf_dir)
    knn = q_knn_graph(sf_dir)

    def pad_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "a": b["qid"].astype(np.int64),
            "b": b["vec_id"].astype(np.int64),
            "c": _const_i64(len(b), 0)})

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "a": b["vec_id"].astype(np.int64),
            "b": b["score"].astype(np.int64),
            "c": _const_i64(len(b), 0)})

    def pad_k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "a": b["vec_id"].astype(np.int64),
            "b": b["nbr"].astype(np.int64),
            "c": b["rnk"].astype(np.int64)})

    return (ann.map_batches(pad_a, batch_format="pandas")
            .union(seed.map_batches(pad_s, batch_format="pandas"))
            .union(knn.map_batches(pad_k, batch_format="pandas")))


def q_sample_split(sf_dir: str):
    from .extras.sampling import sample_split_pipeline
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return sample_split_pipeline(ds)


def q_tfidf_topk(sf_dir: str):
    from .extras.text import tfidf_topk
    ds = _docs(sf_dir)
    return tfidf_topk(ds, n_docs=ds.count(), k=TFIDF_K)


def q_bm25_topk(sf_dir: str):
    """BM25 top-k retrieval for the fixed query set (two streaming
    passes, driver folds <= blocks x |Q| x k rows)."""
    from .extras.text import bm25_topk
    return bm25_topk(_docs(sf_dir))


def q_retrieval2(sf_dir: str):
    """Retrieval family: per-doc tf-idf top-k terms (variant 0) UNION
    the BM25 query-set top-k ranking (variant 1, w = query_id,
    f = the dp-rounded score)."""
    tf = _as_ds(q_tfidf_topk(sf_dir))
    bm = _as_ds(q_bm25_topk(sf_dir))

    def pad_t(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "a": b["doc_id"].astype(np.int64), "w": b["word"],
            "b": b["tf"].astype(np.int64),
            "c": b["df"].astype(np.int64),
            "f": np.zeros(len(b), dtype=np.float64)})

    def pad_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "a": b["doc_id"].astype(np.int64), "w": b["query_id"],
            "b": b["rank"].astype(np.int64),
            "c": _const_i64(len(b), 0),
            "f": b["score"].astype(np.float64)})

    return (tf.map_batches(pad_t, batch_format="pandas")
            .union(bm.map_batches(pad_b, batch_format="pandas")))


def q_normalize_text(sf_dir: str):
    from .extras.chunking import normalize_text_pipeline
    return normalize_text_pipeline(_docs(sf_dir))


def q_dedup_keep_best(sf_dir: str):
    from .extras.dedup import exact_dedup_keep_best
    return exact_dedup_keep_best(_docs(sf_dir))


JOIN_MIN_QTY = 45.0
JOIN_MIN_TOTAL = 400000.0
JOIN_BUCKETS = 64


def _tbl(sf_dir: str, name: str, cols):
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=cols)


def q_pricing_summary(sf_dir: str):
    from .extras.relational import pricing_summary
    return pricing_summary(_tbl(sf_dir, "lineitem",
                                ["l_returnflag", "l_linestatus",
                                 "l_quantity", "l_extendedprice",
                                 "l_discount"]))


def q_revenue_by_nation(sf_dir: str):
    import pyarrow.parquet as pq
    from .extras.relational import revenue_by_nation
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    return revenue_by_nation(
        _tbl(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount"]),
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _tbl(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nation, n_buckets=JOIN_BUCKETS)


def q_high_qty_orders(sf_dir: str):
    from .extras.relational import high_qty_order_priorities
    return high_qty_order_priorities(
        _tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        min_qty=JOIN_MIN_QTY, n_buckets=JOIN_BUCKETS)


def q_cust_no_big_order(sf_dir: str):
    from .extras.relational import customers_without_orders
    return customers_without_orders(
        _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        min_total=JOIN_MIN_TOTAL, n_buckets=JOIN_BUCKETS)


GROUP_SAMPLE_N = 20
PCA_COMPONENTS = 8


def q_pca_project(sf_dir: str):
    """Distributed PCA projection (rows-only: eigendecomposition is
    not SQL-expressible; numpy parity is pytest-gated in
    tests/test_extras.py)."""
    from .extras.decomp import pca_pipeline
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return pca_pipeline(ds, n_components=PCA_COMPONENTS)


def q_pca_project_check(sf_dir: str, dp: int = 4):
    """Oracle-gated PCA twin: the distributed fit + projection of
    q_pca_project, exploded to (vec_id, comp, val) and rounded to
    ``dp`` decimals so the SQL oracle (reference numpy fit embedded as
    literal components, oracle.pca_check_sql) can hash-match the
    doubles across engines."""
    from .extras.decomp import pca_pipeline
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = pca_pipeline(ds, n_components=PCA_COMPONENTS)

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        ids = batch.column("vec_id").to_numpy()
        col = batch.column("proj").combine_chunks()
        off = col.offsets.to_numpy()
        p = int(off[1] - off[0])
        vals = np.round(col.values.to_numpy(), dp)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, p), pa.int64()),
            "comp": pa.array(np.tile(np.arange(p, dtype=np.int64),
                                     len(ids))),
            "val": pa.array(vals, pa.float64()),
        })
    return out.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_group_sample(sf_dir: str):
    from .extras.sampling import group_sample
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return group_sample(ds, key="lang", n=GROUP_SAMPLE_N)


KMEANS_K = 8
KCENTER_K = 16


def q_kmeans_assign(sf_dir: str):
    """Distributed Lloyd's k-means assignment, oracle-gated: the SQL
    twin (oracle.kmeans_assign_sql) embeds an independent
    single-process numpy reference fit as literal centroids and
    recomputes every row's nearest-centroid assignment in DuckDB."""
    from .extras.decomp import kmeans_pipeline
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return kmeans_pipeline(ds, n_clusters=KMEANS_K, iters=5)


def q_shipping_priority(sf_dir: str):
    from .extras.relational import shipping_priority
    return shipping_priority(
        _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                "o_orderpriority"]),
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"]),
        n_buckets=JOIN_BUCKETS)


def q_cust_order_rollup(sf_dir: str):
    from .extras.relational import customer_order_rollup
    return customer_order_rollup(
        _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        n_buckets=JOIN_BUCKETS)


DUP_SPAN_W = 5
LM_DP = 4
BIGRAM_LM_MIN_COUNT = 2
CLUSTER_REPS_N = 5


def q_dup_spans(sf_dir: str):
    """Duplicate-window-span stats (exact substring-dedup signal at
    window granularity — Lee et al. 2022) over the documents table."""
    from .extras.dedup import dup_span_stats
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return dup_span_stats(ds, w=DUP_SPAN_W)


def q_dup_span_scrub(sf_dir: str):
    """Corpus-rewriting exact-substring dedup (Lee et al. 2022): dup
    windows removed everywhere but their keeper doc — the rewritten
    corpus, not just the per-doc signal."""
    from .extras.dedup import dup_span_scrub
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return dup_span_scrub(ds, w=DUP_SPAN_W)


def q_unigram_logprob(sf_dir: str):
    """CCNet-style per-doc mean unigram log-probability (LM quality
    proxy), two-phase: distributed term counts -> broadcast LM score."""
    from .extras.text import unigram_logprob
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return unigram_logprob(ds, dp=LM_DP)


def q_bigram_logprob(sf_dir: str):
    """Interpolated 2-gram LM quality score (the real CCNet-class
    n-gram member; unigram backoff built into the mixture)."""
    from .extras.text import bigram_logprob
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return bigram_logprob(ds, dp=LM_DP, min_count=BIGRAM_LM_MIN_COUNT)


def q_nb_classify(sf_dir: str):
    """Naive Bayes quality classifier (GPT-3-style curated-vs-crawl
    filter; positive class = the ``lang == 'en'`` slice): one fused
    counting exchange, broadcast term table, stateless scoring."""
    from .extras.text import nb_classify
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    return nb_classify(ds, dp=LM_DP)


def q_lm_logprob2(sf_dir: str):
    """LM quality-scoring family: unigram proxy (variant 0) UNION the
    interpolated bigram LM (variant 1) UNION the NB curated-vs-crawl
    classifier (variant 2, llr as the score + keep flag)."""
    uni = q_unigram_logprob(sf_dir)
    bi = q_bigram_logprob(sf_dir)
    nb = q_nb_classify(sf_dir)

    def pad(v, score_col="avg_logprob", keep_col=None):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            keep = (b[keep_col].astype(np.int64) if keep_col
                    else _const_i64(len(b), 0))
            return pd.DataFrame({
                "variant": _const_i64(len(b), v),
                "doc_id": b["doc_id"].astype(np.int64),
                "avg_logprob": b[score_col].astype(np.float64),
                "keep": keep})
        return fn

    return (uni.map_batches(pad(0), batch_format="pandas")
            .union(bi.map_batches(pad(1), batch_format="pandas"))
            .union(nb.map_batches(pad(2, "llr", "keep"),
                                  batch_format="pandas")))


def q_zscore_by_source(sf_dir: str):
    """Per-source z-score of n_chars: exact-integer grouped moments,
    broadcast once, bit-exact doubles against the SQL twin."""
    from .extras.grouped import grouped_zscore
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return grouped_zscore(ds, key="source", col="n_chars")


def q_source_divergence(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (one word-bucketed exchange, driver folds
    buckets x pairs scalars)."""
    from .extras.text import source_divergence
    return source_divergence(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_mad_outliers(sf_dir: str):
    """Per-source median/MAD robust z-scores + Hampel outlier flags
    (value-histogram partials, MAD folded off the same histogram)."""
    from .extras.grouped import grouped_mad_outliers
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return grouped_mad_outliers(ds, key="source", col="n_chars")


def q_source_diversity(sf_dir: str):
    """Per-source n-gram type-token diversity (distinct-(source,
    gram) combiner, one gram-bucket exchange, driver folds
    buckets × sources ints)."""
    from .extras.text import source_ngram_diversity
    return source_ngram_diversity(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_source_stats2(sf_dir: str):
    """Per-source statistics family: per-doc z-scores (variant 0)
    UNION the pairwise source JSD matrix (variant 1) UNION the
    median/MAD robust outlier surface (variant 2) UNION the n-gram
    type-token diversity ratios (variant 3)."""
    zs = q_zscore_by_source(sf_dir)
    dv = _as_ds(q_source_divergence(sf_dir))
    md = q_mad_outliers(sf_dir)
    tt = _as_ds(q_source_diversity(sf_dir))

    def pad_z(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "s1": b["doc_id"].astype(np.int64).astype(str),
            "s2": np.full(len(b), "", dtype=object),
            "a": _const_i64(len(b), 0), "b": _const_i64(len(b), 0),
            "c": _const_i64(len(b), 0),
            "f": b["z"].astype(np.float64)})

    def pad_d(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "s1": b["s1"], "s2": b["s2"],
            "a": _const_i64(len(b), 0), "b": _const_i64(len(b), 0),
            "c": _const_i64(len(b), 0),
            "f": b["jsd"].astype(np.float64)})

    def pad_m(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "s1": b["doc_id"].astype(np.int64).astype(str),
            "s2": np.full(len(b), "", dtype=object),
            "a": b["med"].astype(np.int64),
            "b": b["mad"].astype(np.int64),
            "c": b["outlier"].astype(np.int64),
            "f": b["rz"].astype(np.float64)})

    def pad_t(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 3),
            "s1": b["source"],
            "s2": np.full(len(b), "", dtype=object),
            "a": b["n_grams"].astype(np.int64),
            "b": b["n_distinct"].astype(np.int64),
            "c": _const_i64(len(b), 0),
            "f": b["ttr"].astype(np.float64)})

    return (zs.map_batches(pad_z, batch_format="pandas")
            .union(dv.map_batches(pad_d, batch_format="pandas"))
            .union(md.map_batches(pad_m, batch_format="pandas"))
            .union(tt.map_batches(pad_t, batch_format="pandas")))


def q_cluster_reps(sf_dir: str):
    """Centroid-representative sampling: k-means fit + n-per-cluster
    nearest rows; oracle recomputes from reference-fit literal
    centroids (same machinery as kmeans_assign)."""
    from .extras.decomp import cluster_representatives
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return cluster_representatives(ds, n_clusters=KMEANS_K, iters=5,
                                   n_per=CLUSTER_REPS_N)


def q_grouped_quantiles(sf_dir: str):
    """Exact per-lang n_chars quantiles, fully distributed (per-group
    value histograms co-located by ONE key-hash shuffle)."""
    from .extras.scan import grouped_quantiles
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return grouped_quantiles(ds, key="lang", col="n_chars")


def q_events_distinct(sf_dir: str):
    """Exact distinct-user + event counts per (event_type, hour)."""
    from .extras.events import window_distinct_users
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "user_id"])
    return window_distinct_users(ds)


def q_events_funnel(sf_dir: str):
    """Earliest view->click->purchase funnel completion per user
    (sequence-pattern matching in one user-hash shuffle)."""
    from .extras.events import funnel_first_completion
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_id", "event_type", "user_id"])
    return funnel_first_completion(ds)


# ---------------------------------------------------------------------
# Composite queries (VERDICT r3 next #1): the driver runs the FIRST 50
# registry entries, so redundant variants fold into tagged-UNION
# composites — every COVERAGE.md op family keeps a hash-gated driver
# row inside the 50 budget while the individual variants stay in the
# registry tail (and in pytest / scripts/check_oracle.py).  All
# composites are unions, never joins: no extra shuffle, each
# constituent's full value surface rides through untouched.
# ---------------------------------------------------------------------

def _const_i64(n: int, v: int) -> np.ndarray:
    return np.full(n, v, dtype=np.int64)


def _as_ds(x) -> "ray.data.Dataset":
    """Composites accept constituents that return either a Dataset or
    a small driver-side DataFrame (e.g. quantile picks)."""
    return x if hasattr(x, "map_batches") else ray.data.from_pandas(x)


def q_relational_exist(sf_dir: str):
    """Existence joins under both polarities: semi (variant 0,
    per-priority counts of high-quantity orders) UNION anti
    (variant 1, customers with no big order)."""
    semi = q_high_qty_orders(sf_dir)
    anti = q_cust_no_big_order(sf_dir)

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "key_str": b["o_orderpriority"],
            "key_id": _const_i64(len(b), -1),
            "n": b["n_orders"].astype(np.int64)})

    def pad_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "key_str": b["c_mktsegment"],
            "key_id": b["c_custkey"].astype(np.int64),
            "n": _const_i64(len(b), 0)})

    return (semi.map_batches(pad_s, batch_format="pandas")
            .union(anti.map_batches(pad_a, batch_format="pandas")))


def q_pagerank(sf_dir: str):
    """Integer fixed-point PageRank over the co-order item graph
    (edge build = one order-keyed exchange; 2 bucketed exchanges per
    iteration; all-int64 surface, bit-exact vs the unrolled CTE)."""
    from .extras.graph import pagerank
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"])
    return pagerank(li)


def q_pagerank_exchange(sf_dir: str):
    """Forced fully-distributed iteration engine (the above-bound
    scale path); same oracle as the auto (broadcast) head entry."""
    from .extras.graph import pagerank
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"])
    return pagerank(li, force="exchange")


def q_relational_rank(sf_dir: str):
    """Ranked relational results: Q3-style top-k shipping priority
    (variant 0) UNION LEFT-OUTER customer order rollup (variant 1)
    UNION integer PageRank over the co-order item graph (variant 2);
    exact int64 cents/counts/ranks ride as doubles (< 2^53)."""
    topk = q_shipping_priority(sf_dir)
    roll = q_cust_order_rollup(sf_dir)
    pr = q_pagerank(sf_dir)

    def pad_t(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "key": b["o_orderkey"].astype(np.int64),
            "cat": b["o_orderpriority"],
            "val1": b["o_date_us"].astype(np.float64),
            "val2": b["revenue_e4"].astype(np.float64)})

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "key": b["c_custkey"].astype(np.int64),
            "cat": b["c_mktsegment"],
            "val1": b["n_orders"].astype(np.float64),
            "val2": b["sum_cents"].astype(np.float64)})

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "key": b["node"].astype(np.int64),
            "cat": np.full(len(b), "", dtype=object),
            "val1": b["rank"].astype(np.float64),
            "val2": b["deg"].astype(np.float64)})

    return (topk.map_batches(pad_t, batch_format="pandas")
            .union(roll.map_batches(pad_r, batch_format="pandas"))
            .union(pr.map_batches(pad_p, batch_format="pandas")))


def q_windowed_all(sf_dir: str):
    """Ordered-window features over one source partitioning: lag/lead
    neighbors (variant 0) UNION gap-sessionization (variant 1)."""
    ll = q_lag_lead(sf_dir)
    ss = q_sessionize(sf_dir)

    def pad_l(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "doc_id": b["doc_id"],
            "v1": b["prev_n_tok"].astype(np.int64),
            "v2": b["next_n_tok"].astype(np.int64)})

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "doc_id": b["doc_id"],
            "v1": b["session_seq"].astype(np.int64),
            "v2": _const_i64(len(b), 0)})

    return (ll.map_batches(pad_l, batch_format="pandas")
            .union(ss.map_batches(pad_s, batch_format="pandas")))


def q_data_profile(sf_dir: str):
    from .extras.profile import data_profile
    return data_profile(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_retention_cohorts(sf_dir: str):
    """Cohort-retention matrix (first-active-day cohorts × day
    offsets): distinct-(user, day) combiner, one user-hash exchange,
    driver folds buckets × days² int partials."""
    from .extras.events import retention_cohorts
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return retention_cohorts(ds)


def q_events_flow(sf_dir: str):
    """Event-stream analytics: exact distinct-user window counts
    (variant 0) UNION earliest funnel completions (variant 1) UNION
    the single-pass per-column data-quality profile (variant 2)
    UNION the cohort-retention matrix (variant 3)."""
    dist = q_events_distinct(sf_dir)
    fun = q_events_funnel(sf_dir)
    prof = q_data_profile(sf_dir)
    ret = _as_ds(q_retention_cohorts(sf_dir))

    def pad_d(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "key_str": b["event_type"],
            "k1": b["win"].astype(np.int64),
            "k2": b["n_events"].astype(np.int64),
            "k3": b["n_users"].astype(np.int64),
            "vnum": np.zeros(len(b)),
            "vstr": np.full(len(b), "", dtype=object)})

    def pad_f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "key_str": np.full(len(b), "", dtype=object),
            "k1": b["user_id"].astype(np.int64),
            "k2": b["abc_ts_us"].astype(np.int64),
            "k3": _const_i64(len(b), 0),
            "vnum": np.zeros(len(b)),
            "vstr": np.full(len(b), "", dtype=object)})

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "key_str": b["col"] + ":" + b["metric"],
            "k1": _const_i64(len(b), 0),
            "k2": _const_i64(len(b), 0),
            "k3": _const_i64(len(b), 0),
            "vnum": b["val_num"].astype(np.float64),
            "vstr": b["val_str"]})

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 3),
            "key_str": np.full(len(b), "", dtype=object),
            "k1": b["cohort_day"].astype(np.int64),
            "k2": b["day_offset"].astype(np.int64),
            "k3": b["n_users"].astype(np.int64),
            "vnum": np.zeros(len(b)),
            "vstr": np.full(len(b), "", dtype=object)})

    return (dist.map_batches(pad_d, batch_format="pandas")
            .union(fun.map_batches(pad_f, batch_format="pandas"))
            .union(prof.map_batches(pad_p, batch_format="pandas"))
            .union(ret.map_batches(pad_r, batch_format="pandas")))


def q_asof_lagged(sf_dir: str):
    """Point-in-time coverage under both lookup clocks: as-of ingest
    ts (variant 0) UNION backfill as-of ts - lag (variant 1); the
    two constituents share one output schema already."""
    now = q_asof_cov_hist(sf_dir)
    lag = q_asof_backfill(sf_dir)

    def pad(variant):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "variant": _const_i64(len(b), variant),
                "doc_id": b["doc_id"], "bin": b["bin"].astype(np.int64),
                "val": b["val"].astype(np.int64)})
        return fn

    return (now.map_batches(pad(0), batch_format="pandas")
            .union(lag.map_batches(pad(1), batch_format="pandas")))


def q_minimisers_all(sf_dir: str):
    """Windowed (w=31, m=7) s2m rows UNION whole-seq minimisers
    (variant 0 / 1; whole-seq has no span, padded -1)."""
    s2m = q_minimisers(sf_dir)
    whole = q_whole_seq_minimiser(sf_dir)

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "doc_id": b["doc_id"],
            "mmer": b["mmer"], "start_pos": b["start_pos"],
            "end_pos": b["end_pos"]})

    def pad_w(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "doc_id": b["doc_id"],
            "mmer": b["mmer"], "start_pos": _const_i64(len(b), -1),
            "end_pos": _const_i64(len(b), -1)})

    return (s2m.map_batches(pad_s, batch_format="pandas")
            .union(whole.map_batches(pad_w, batch_format="pandas")))


def q_text_rewrite(sf_dir: str):
    """Digit-masking normalization UNION stopword scrub (variant
    0 / 1): both per-doc text rewrites, full rewritten text gated."""
    norm = q_normalize_text(sf_dir)
    stop = q_stop_filter(sf_dir)

    def pad_n(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "doc_id": b["doc_id"],
            "rewritten": b["norm_text"], "n": b["n_masked"]})

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "doc_id": b["doc_id"],
            "rewritten": b["clean_text"], "n": b["n_removed"]})

    return (norm.map_batches(pad_n, batch_format="pandas")
            .union(stop.map_batches(pad_s, batch_format="pandas")))


def q_url_dedup(sf_dir: str):
    """RefinedWeb-style URL dedup over the deterministic injected
    URL-variant corpus: one exchange of (doc_id, url) pairs, keep =
    lowest doc_id per normalized first URL (URL-less docs pass)."""
    from .extras.pii import url_dedup_pipeline
    return url_dedup_pipeline(ray.data.read_parquet(_urltext_path()))


def q_dedup_survivors2(sf_dir: str):
    """Exact-dedup survivors under four policies: first-seen
    (policy 0, min doc_id) UNION keep-best (policy 1, max quality)
    UNION snapshot-incremental admission (policy 2, new-wave docs
    deduped against the old snapshot AND within the wave) UNION
    URL-normalized dedup survivors (policy 3, over the injected
    URL-variant corpus; full url_norm surface gated in the tail)."""
    first = q_dedup_exact(sf_dir)
    best = q_dedup_keep_best(sf_dir)
    incr = q_dedup_incremental(sf_dir)
    url = q_url_dedup(sf_dir)

    def pad(policy):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "policy": _const_i64(len(b), policy),
                "doc_id": b["doc_id"].astype(np.int64)})
        return fn

    def pad_u(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["keep"] == 1]
        return pd.DataFrame({
            "policy": _const_i64(len(b), 3),
            "doc_id": b["doc_id"].astype(np.int64)})

    return (first.map_batches(pad(0), batch_format="pandas")
            .union(best.map_batches(pad(1), batch_format="pandas"))
            .union(incr.map_batches(pad(2), batch_format="pandas"))
            .union(url.map_batches(pad_u, batch_format="pandas")))


def q_dup_spans2(sf_dir: str):
    """Corpus-rewriting dedup family: per-doc dup-window stats
    (variant 0), the Lee-et-al scrubbed corpus (variant 1, dup spans
    removed everywhere but their keeper doc), and CCNet-style block
    (paragraph) dedup (variant 2, global first occurrence per block
    survives)."""
    stats = q_dup_spans(sf_dir)
    scrub = q_dup_span_scrub(sf_dir)
    blocks = q_block_dedup(sf_dir)

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n_windows"].astype(np.int64),
            "v2": b["dup_windows"].astype(np.int64),
            "vf": b["dup_frac"].astype(np.float64),
            "txt": np.full(len(b), "", dtype=object)})

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n_removed"].astype(np.int64),
            "v2": _const_i64(len(b), -1),
            "vf": np.zeros(len(b)),
            "txt": b["scrubbed"]})

    def pad_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n_removed"].astype(np.int64),
            "v2": _const_i64(len(b), -2),
            "vf": np.zeros(len(b)),
            "txt": b["text2"]})

    return (stats.map_batches(pad_s, batch_format="pandas")
            .union(scrub.map_batches(pad_r, batch_format="pandas"))
            .union(blocks.map_batches(pad_b, batch_format="pandas")))


def _cdc_media_path() -> str:
    from .extras.multimodal import ensure_media_parquet
    return ensure_media_parquet(n_items=64)


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunk table (FastCDC gear hash, vectorized
    64-term XOR expansion) over the small media fixture."""
    from .extras.cdc import cdc_chunks
    return cdc_chunks(ray.data.read_parquet(_cdc_media_path()))


def q_cdc_digest(sf_dir: str):
    """Per-item CDC digest (count / xor-of-chunk-hashes / bytes)."""
    from .extras.cdc import cdc_digest
    return cdc_digest(ray.data.read_parquet(_cdc_media_path()))


def q_media_windows(sf_dir: str):
    """Per-window multimodal features: sampled video-frame means
    (variant 0) UNION hop-strided audio window energies (variant 1)
    UNION the per-item content-defined-chunking digest (variant 2;
    the full chunk table is gated in the tail twin)."""
    vid = q_frame_sample(sf_dir)
    aud = q_audio_energy(sf_dir)
    cdc = q_cdc_digest(sf_dir)

    def pad_v(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "item_id": b["item_id"],
            "idx": b["frame_idx"].astype(np.int64),
            "val": b["mean"].astype(np.float64),
            "h": np.full(len(b), "", dtype=object)})

    def pad_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "item_id": b["item_id"],
            "idx": b["win_idx"].astype(np.int64),
            "val": b["energy"].astype(np.float64),
            "h": np.full(len(b), "", dtype=object)})

    def pad_c(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2), "item_id": b["item_id"],
            "idx": b["n_chunks"].astype(np.int64),
            "val": b["tot"].astype(np.float64),
            "h": b["xh"].astype(np.int64).astype(str)})

    return (vid.map_batches(pad_v, batch_format="pandas")
            .union(aud.map_batches(pad_a, batch_format="pandas"))
            .union(cdc.map_batches(pad_c, batch_format="pandas")))


def q_ppl_buckets2(sf_dir: str):
    """CCNet perplexity bucketing under both scoring regimes: the
    unigram-LM proxy (variant 0) UNION an external precomputed model
    score column (variant 1) — one global-ntile machinery, two score
    sources."""
    proxy = q_ppl_buckets(sf_dir)
    scored = q_ppl_buckets_scored(sf_dir)

    def pad(variant, col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "variant": _const_i64(len(b), variant),
                "doc_id": b["doc_id"].astype(np.int64),
                "score": b[col].astype(np.float64),
                "tile": b["tile"].astype(np.int64)})
        return fn

    return (proxy.map_batches(pad(0, "avg_logprob"),
                              batch_format="pandas")
            .union(scored.map_batches(pad(1, "model_score"),
                                      batch_format="pandas")))


def q_pack_emit(sf_dir: str):
    from .extras.scan import pack_emit
    return pack_emit(_docs(sf_dir), budget=PACK_EMIT_BUDGET)


def q_scan_features(sf_dir: str):
    """Distributed-scan features: prefix-sum token packing over the
    sequence corpus (variant 0: cum_tok, bin) UNION global rank/ntile
    (variant 1: rnk, tile) UNION packed-training-shard emission over
    the documents corpus (variant 2: per-bin doc/token counts + the
    EOS-joined shard text)."""
    packed = q_pack_bins(sf_dir)
    ranked = q_rank_by_len(sf_dir)
    emitted = q_pack_emit(sf_dir)

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "doc_id": b["doc_id"],
            "n_tok": b["n_tok"], "val1": b["cum_tok"],
            "val2": b["bin"],
            "txt": np.full(len(b), "", dtype=object)})

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "doc_id": b["doc_id"],
            "n_tok": b["n_tok"], "val1": b["rnk"], "val2": b["tile"],
            "txt": np.full(len(b), "", dtype=object)})

    def pad_e(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "doc_id": b["bin"].astype(np.int64).astype(str),
            "n_tok": b["n_tok"].astype(np.int64),
            "val1": b["n_docs"].astype(np.int64),
            "val2": b["bin"].astype(np.int64),
            "txt": b["packed"]})

    return (packed.map_batches(pad_p, batch_format="pandas")
            .union(ranked.map_batches(pad_r, batch_format="pandas"))
            .union(emitted.map_batches(pad_e, batch_format="pandas")))


def q_sketch_quantiles(sf_dir: str):
    """Bottom-k sketch quantiles of n_tok — the O(k) mergeable-sample
    path for high-cardinality quantile columns."""
    from .extras.scan import sketch_quantiles
    return sketch_quantiles(_seq(sf_dir, ["doc_id", "n_tok"]))


def q_quantiles_all(sf_dir: str):
    """Exact global token quantiles (scope '__global__') UNION exact
    per-lang n_chars quantiles (scope = lang) UNION the bottom-k
    sketch estimate of the global quantiles (scope '__sketch__')."""
    glob = _as_ds(q_tok_quantiles(sf_dir))
    grouped = _as_ds(q_grouped_quantiles(sf_dir))
    sk = _as_ds(q_sketch_quantiles(sf_dir))

    def pad_g(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "scope": np.full(len(b), "__global__", dtype=object),
            "q": b["q"], "value": b["value"]})

    def pad_l(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"scope": b["lang"], "q": b["q"],
                             "value": b["value"]})

    def pad_k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "scope": np.full(len(b), "__sketch__", dtype=object),
            "q": b["q"], "value": b["value"]})

    return (glob.map_batches(pad_g, batch_format="pandas")
            .union(grouped.map_batches(pad_l, batch_format="pandas"))
            .union(sk.map_batches(pad_k, batch_format="pandas")))


def q_weighted_sample(sf_dir: str):
    """Duffield-Lund-Thorup priority sample of the corpus weighted by
    n_chars, with the unbiased subset-sum estimator weights."""
    from .extras.sampling import WSAMPLE_K, weighted_priority_sample
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    return weighted_priority_sample(ds, k=WSAMPLE_K)


def q_sampling_flags(sf_dir: str):
    """Stratified permille sample+split (variant 0) UNION per-group
    deterministic top-n sample (variant 1, no bucket/split) UNION
    alpha-temperature language rebalancing (variant 2, bucket = the
    ppm keep rate) UNION the weighted priority sample (variant 3,
    bucket = the weight; prio/est gated in the tail entry)."""
    split = _as_ds(q_sample_split(sf_dir))
    grp = _as_ds(q_group_sample(sf_dir))
    temp = _as_ds(q_temperature_sample(sf_dir))
    wsam = _as_ds(q_weighted_sample(sf_dir))

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "doc_id": b["doc_id"],
            "lang": b["lang"], "bucket": b["bucket"],
            "split": b["split"]})

    def pad_g(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "doc_id": b["doc_id"],
            "lang": b["lang"], "bucket": _const_i64(len(b), -1),
            "split": np.full(len(b), "", dtype=object)})

    def pad_t(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2), "doc_id": b["doc_id"],
            "lang": b["lang"], "bucket": b["rate"].astype(np.int64),
            "split": np.full(len(b), "", dtype=object)})

    def pad_w(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 3), "doc_id": b["doc_id"],
            "lang": np.full(len(b), "", dtype=object),
            "bucket": b["w"].astype(np.int64),
            "split": np.full(len(b), "", dtype=object)})

    return (split.map_batches(pad_s, batch_format="pandas")
            .union(grp.map_batches(pad_g, batch_format="pandas"))
            .union(temp.map_batches(pad_t, batch_format="pandas"))
            .union(wsam.map_batches(pad_w, batch_format="pandas")))


def q_events_enriched(sf_dir: str):
    """Per-event feature union over one events read: JSON field
    extraction (variant 0), exclusive PIT history (variant 1), both
    rolling-frame kinds (variant 2), and consecutive-dup survivors
    (variant 3).  All-int64 value surface, zero-padded to width 5."""
    parts = []
    for variant, q, cols in (
            (0, q_events_json_k, ["k"]),
            (1, q_events_history, ["user_id", "prior_n", "prior_cents"]),
            (2, q_events_rolling, ["user_id", "roll_n", "roll_cents",
                                   "tw_n", "tw_cents"]),
            (3, q_events_dedup, ["user_id"])):
        def pad(b: pd.DataFrame, variant=variant, cols=cols
                ) -> pd.DataFrame:
            out = {"variant": _const_i64(len(b), variant),
                   "event_id": b["event_id"].astype(np.int64)}
            for i in range(5):
                out[f"v{i + 1}"] = (b[cols[i]].astype(np.int64)
                                    if i < len(cols)
                                    else _const_i64(len(b), 0))
            return pd.DataFrame(out)
        parts.append(q(sf_dir).map_batches(pad, batch_format="pandas"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def q_proto_prune(sf_dir: str):
    """SSL-prototypes pruning: keep the hardest ceil(frac*n_c) rows
    per k-means cluster (largest centroid distance)."""
    from .extras.decomp import proto_prune
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return proto_prune(ds, n_clusters=KMEANS_K, iters=5)


def q_kcenter_select(sf_dir: str):
    """Greedy k-center coreset: seed = lowest vec_id, k-1 rounds of
    farthest-point traversal, then a coverage-count assignment pass
    (integer output surface, SQL-gated against an independent
    single-process reference via literal centers)."""
    from .extras.decomp import kcenter_select
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return kcenter_select(ds, k=KCENTER_K)


def q_decomp_project(sf_dir: str):
    """Distributed-PCA projection entries (variant 0: comp, val)
    UNION k-means assignments (variant 1: comp -1, val = cluster)
    UNION the SSL-prototypes prune survivors (variant 2: comp = the
    cluster, val = -1) UNION the greedy k-center coreset (variant 3:
    comp = rank, val = coverage count)."""
    pca = q_pca_project_check(sf_dir)
    km = q_kmeans_assign(sf_dir)
    pp = q_proto_prune(sf_dir)
    kc = q_kcenter_select(sf_dir)

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0), "vec_id": b["vec_id"],
            "comp": b["comp"], "val": b["val"].astype(np.float64)})

    def pad_k(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1), "vec_id": b["vec_id"],
            "comp": _const_i64(len(b), -1),
            "val": b["cluster"].astype(np.float64)})

    def pad_s(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2), "vec_id": b["vec_id"],
            "comp": b["cluster"].astype(np.int64),
            "val": np.full(len(b), -1.0, dtype=np.float64)})

    def pad_c(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 3), "vec_id": b["vec_id"],
            "comp": b["rank"].astype(np.int64),
            "val": b["n_assigned"].astype(np.float64)})

    return (pca.map_batches(pad_p, batch_format="pandas")
            .union(km.map_batches(pad_k, batch_format="pandas"))
            .union(pp.map_batches(pad_s, batch_format="pandas"))
            .union(kc.map_batches(pad_c, batch_format="pandas")))


# --- round-5 ops: C4 cleaning, block (paragraph) dedup, temperature
# resampling -------------------------------------------------------------

C4_DELIM = " line "   # pseudo-paragraph delimiter for the synthetic corpus
C4_MWL = 3
C4_MIN_LINES = 2
BLOCK_W = 8


def q_c4_filter(sf_dir: str):
    """C4 (Raffel et al. 2020) line+page cleaning rules.  The
    synthetic corpus has no newlines or punctuation, so this instance
    splits pseudo-lines on the literal ' line ' token and disables
    the terminal-punctuation rule (the pytest gates that rule on
    planted punctuated docs); the badword/min-words/min-lines rules
    fire for real."""
    from .extras.text import c4_filter
    return c4_filter(_docs(sf_dir), line_delim=C4_DELIM,
                     min_words_per_line=C4_MWL, min_lines=C4_MIN_LINES,
                     require_terminal_punct=False)


def q_char_entropy(sf_dir: str):
    """Shannon character-entropy gibberish screen (sub-word quality
    signal complementing the word-level Gopher/C4 rules)."""
    from .extras.text import char_entropy
    return char_entropy(_docs(sf_dir))


def q_block_dedup(sf_dir: str):
    """CCNet-style corpus-level block (paragraph) dedup: global first
    occurrence of each distinct 8-word block survives, docs rewritten
    from surviving blocks."""
    from .extras.dedup import block_dedup
    return block_dedup(_docs(sf_dir), w=BLOCK_W)


def q_temperature_sample(sf_dir: str):
    """XLM-R alpha-temperature language rebalancing (alpha=0.5,
    target half the corpus), md5-ppm deterministic keeps."""
    from .extras.sampling import temperature_sample
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    return temperature_sample(ds)


BLOCK_PHRASES = ("batch batch", "table scan", "spark")


def q_phrase_hits(sf_dir: str):
    """Blocklist substring counting (multi-word phrases cross token
    boundaries): one stateless C-regex pass, exact integer counts."""
    from .extras.text import phrase_hits
    return phrase_hits(_docs(sf_dir), BLOCK_PHRASES)


def q_quality_filter2(sf_dir: str):
    """Quality gating four ways: global-percentile survivor filter
    (variant 0) UNION the C4 line+page cleaning rules (variant 1,
    incl. the rewritten clean_text) UNION the character-entropy
    gibberish screen (variant 2; v2 carries the dp-rounded entropy
    scaled to an exact int — both engines floor(entropy*1e4+0.5) the
    same bit-identical double) UNION blocklist phrase hits (variant
    3, counts in v1, the phrase riding txt)."""
    qf = q_quality_filter(sf_dir)
    c4 = q_c4_filter(sf_dir)
    ce = _as_ds(q_char_entropy(sf_dir))
    ph = q_phrase_hits(sf_dir)

    def pad_q(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": _const_i64(len(b), -1),
            "v2": _const_i64(len(b), -1),
            "keep": _const_i64(len(b), 1),
            "txt": np.full(len(b), "", dtype=object)})

    def pad_c(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n_lines"].astype(np.int64),
            "v2": b["n_kept"].astype(np.int64),
            "keep": b["keep"].astype(np.int64),
            "txt": b["clean_text"]})

    def pad_e(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 2),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n_distinct"].astype(np.int64),
            "v2": np.floor(b["entropy"].to_numpy() * 10000.0
                           + 0.5).astype(np.int64),
            "keep": b["keep"].astype(np.int64),
            "txt": np.full(len(b), "", dtype=object)})

    def pad_p(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 3),
            "doc_id": b["doc_id"].astype(np.int64),
            "v1": b["n"].astype(np.int64),
            "v2": _const_i64(len(b), 0),
            "keep": _const_i64(len(b), 0),
            "txt": b["phrase"]})

    return (qf.map_batches(pad_q, batch_format="pandas")
            .union(c4.map_batches(pad_c, batch_format="pandas"))
            .union(ce.map_batches(pad_e, batch_format="pandas"))
            .union(ph.map_batches(pad_p, batch_format="pandas")))


def q_kmer_novelty(sf_dir: str):
    """Novel-k-mer discovery curve (day, new_kmers, vocab_size): the
    vocabulary-growth monitor over the ingest timeline; ONE kmer-hash
    exchange, driver folds <= buckets x days scalars."""
    from .pipelines.counter import kmer_novelty
    return kmer_novelty(_seq(sf_dir, ["tokens", "ts"]), k=K_GLOBAL)


def q_pmi_pairs(sf_dir: str):
    """PMI collocations over adjacent word bigrams (min_count-pruned),
    tie-safe dp rounding on both engines."""
    from .extras.text import pmi_pairs
    return pmi_pairs(_docs(sf_dir), min_count=BIGRAM_MIN_COUNT, dp=LM_DP)


def q_kmer_complexity(sf_dir: str, k: int = K_GLOBAL):
    """Per-sequence distinct/total canonical k-mer ratio — the
    low-complexity read-QC signal."""
    from .pipelines.counter import kmer_complexity
    return kmer_complexity(_seq(sf_dir, ["doc_id", "tokens"]), k=k)


def q_diginorm(sf_dir: str, k: int = K_GLOBAL):
    """Two-pass digital normalization: per-read median canonical
    k-mer abundance vs the global table, saturated reads flagged."""
    from .pipelines.counter import diginorm
    return diginorm(_seq(sf_dir, ["doc_id", "tokens"]), k=k)


def q_ctr_all(sf_dir: str):
    """Global k-mer dictionary family: exact global counts (variant 0)
    UNION the per-day novel-k-mer discovery curve (variant 1) UNION
    the per-sequence k-mer complexity QC surface (variant 2) UNION
    the two-pass diginorm saturation flags (variant 3)."""
    cnts = q_global_counts(sf_dir)

    def pad0(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "variant": pa.array(np.zeros(n, dtype=np.int64)),
            "a": b.column("kmer"), "b": b.column("cnt"),
            "c": pa.array(np.zeros(n, dtype=np.int64)),
            "f": pa.array(np.zeros(n, dtype=np.float64)),
            "id": pa.array(np.full(n, "", dtype=object), pa.string())})

    nov = q_kmer_novelty(sf_dir)
    nov_tab = pa.table({
        "variant": pa.array(np.ones(len(nov), dtype=np.int64)),
        "a": pa.array(nov["day"].to_numpy(), pa.int64()),
        "b": pa.array(nov["new_kmers"].to_numpy(), pa.int64()),
        "c": pa.array(nov["vocab_size"].to_numpy(), pa.int64()),
        "f": pa.array(np.zeros(len(nov), dtype=np.float64)),
        "id": pa.array([""] * len(nov), pa.string())})

    def pad2(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "variant": pa.array(np.full(n, 2, dtype=np.int64)),
            "a": pa.array(np.zeros(n, dtype=np.int64)),
            "b": b.column("n_kmers"), "c": b.column("n_distinct"),
            "f": b.column("complexity"),
            "id": b.column("doc_id")})

    def pad3(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "variant": pa.array(np.full(n, 3, dtype=np.int64)),
            "a": b.column("med_abund"), "b": b.column("n_kmers"),
            "c": b.column("keep"),
            "f": pa.array(np.zeros(n, dtype=np.float64)),
            "id": b.column("doc_id").cast(pa.string())})

    cplx = q_kmer_complexity(sf_dir)
    dgn = q_diginorm(sf_dir)
    return (cnts.map_batches(pad0, batch_format="pyarrow",
                             zero_copy_batch=True)
            .union(ray.data.from_arrow(nov_tab))
            .union(cplx.map_batches(pad2, batch_format="pyarrow",
                                    zero_copy_batch=True))
            .union(dgn.map_batches(pad3, batch_format="pyarrow",
                                   zero_copy_batch=True)))


def q_colloc2(sf_dir: str):
    """Collocation family: the integer bigram surface (variant 0)
    UNION the dp-rounded PMI ranking derived from it (variant 1)."""
    bs = q_bigram_stats(sf_dir)
    pm = q_pmi_pairs(sf_dir)

    def pad0(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 0),
            "w1": b["w1"], "w2": b["w2"],
            "c12": b["c12"].astype(np.int64),
            "c1": b["c1"].astype(np.int64),
            "c2": b["c2"].astype(np.int64),
            "pmi": np.zeros(len(b), dtype=np.float64)})

    def pad1(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "variant": _const_i64(len(b), 1),
            "w1": b["w1"], "w2": b["w2"],
            "c12": b["c12"].astype(np.int64),
            "c1": _const_i64(len(b), -1),
            "c2": _const_i64(len(b), -1),
            "pmi": b["pmi"].astype(np.float64)})

    return (bs.map_batches(pad0, batch_format="pandas")
            .union(pm.map_batches(pad1, batch_format="pandas")))

"""Parity of the sharded-dictionary scale paths (cov + asof) against
their unsharded broadcast/actor-pool twins on the same corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from kmerray.pipelines.asof import (shard_snapshot_index, sharded_asof_hist,
                                    snapshot_counts)
from kmerray.pipelines.counter import count_kmers
from kmerray.pipelines.cov import (group_pair_counts, shard_count_table,
                                   sharded_cov_hist)
from kmerray.queries import (q_asof_cov_hist, q_asof_cov_hist_sharded,
                             q_cov_hist, q_cov_hist_sharded)
from kmerray.sources.synth import generate_sequences

K = 6
BINS = (2, 4)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["doc_id", "bin", "val"]].astype({"bin": np.int64,
                                              "val": np.int64})
    return df.sort_values(["doc_id", "bin"]).reset_index(drop=True)


def test_group_pair_counts_matches_pandas():
    rng = np.random.default_rng(0)
    row = rng.integers(0, 50, size=2000).astype(np.int64)
    kmer = rng.integers(0, 100, size=2000).astype(np.uint64)
    r, c, n = group_pair_counts(row, kmer)
    want = (pd.DataFrame({"r": row, "c": kmer}).groupby(["r", "c"])
            .size().reset_index(name="n"))
    got = (pd.DataFrame({"r": r, "c": c, "n": n})
           .sort_values(["r", "c"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"r": np.int64, "c": np.uint64, "n": np.int64}),
        check_dtype=False)


def test_sharded_cov_matches_unsharded(ray_session):
    corpus = generate_sequences(300)
    ds = ray.data.from_arrow(corpus)
    ct = count_kmers(ds, K).to_pandas()
    kmers = ct["kmer"].to_numpy().astype(np.uint64)
    cnts = ct["cnt"].to_numpy().astype(np.int64)
    order = np.argsort(kmers)
    kmers, cnts = kmers[order], cnts[order]

    refs = shard_count_table(kmers, cnts, 3)
    sharded = _norm(sharded_cov_hist(ds, refs, K, *BINS).to_pandas())

    # unsharded oracle: one full-dict scorer (reuses the q_cov_hist
    # explode path at unit scale)
    from kmerray.pipelines.cov import coverage_pipeline
    from kmerray.queries import _explode_nonzero_fixedlist
    full_ref = ray.put((kmers, cnts))
    un = (coverage_pipeline(ds, full_ref, K, *BINS, norm=False,
                            concurrency=2)
          .map_batches(_explode_nonzero_fixedlist("coverage"),
                       batch_format="pyarrow").to_pandas())
    pd.testing.assert_frame_equal(sharded, _norm(un))


def test_sharded_asof_matches_unsharded(ray_session):
    corpus = generate_sequences(300)
    ds = ray.data.from_arrow(corpus)
    snap = pa.Table.from_pandas(snapshot_counts(ds, K).to_pandas())
    refs = shard_snapshot_index(snap, 3)
    sharded = _norm(sharded_asof_hist(ds, refs, K, *BINS).to_pandas())

    from kmerray.pipelines.asof import (asof_coverage_pipeline,
                                        load_snapshot_index)
    from kmerray.queries import _explode_nonzero_fixedlist
    index_ref = ray.put(load_snapshot_index(snap))
    un = (asof_coverage_pipeline(ds, index_ref, K, *BINS, norm=False,
                                 concurrency=2)
          .map_batches(_explode_nonzero_fixedlist("asof_coverage"),
                       batch_format="pyarrow").to_pandas())
    pd.testing.assert_frame_equal(sharded, _norm(un))


def test_collect_count_table_range_vs_hash(ray_session):
    """Range-bucketed collection (pre-sorted concat fast path) must
    equal hash-bucketed collection (argsort fallback), both sorted."""
    from kmerray.pipelines.cov import collect_count_table
    corpus = generate_sequences(200)
    k_r, c_r = collect_count_table(
        count_kmers(ray.data.from_arrow(corpus), K, bucket_by="range"))
    k_h, c_h = collect_count_table(
        count_kmers(ray.data.from_arrow(corpus), K))
    assert np.array_equal(k_r, k_h) and np.array_equal(c_r, c_h)
    assert bool(np.all(k_r[1:] >= k_r[:-1]))


def test_cov_hist_auto_threshold_switch(ray_session, tmp_path):
    """The size-trigger routes to the bucketed join above the
    threshold and both routes agree row-for-row (VERDICT r2 next #2)."""
    from kmerray.pipelines.cov import cov_hist_auto
    t = generate_sequences(300)
    bin_size, bin_count = BINS
    broadcast = cov_hist_auto(ray.data.from_arrow(t), K, bin_size,
                              bin_count,
                              threshold_keys=10**9).to_pandas()
    joined = cov_hist_auto(ray.data.from_arrow(t), K, bin_size,
                           bin_count, threshold_keys=0).to_pandas()
    pd.testing.assert_frame_equal(_norm(broadcast), _norm(joined))


def test_asof_hist_auto_threshold_switch(ray_session):
    from kmerray.pipelines.asof import asof_hist_auto
    t = generate_sequences(300)
    bin_size, bin_count = BINS
    broadcast = asof_hist_auto(ray.data.from_arrow(t), K, bin_size,
                               bin_count,
                               threshold_rows=10**9).to_pandas()
    joined = asof_hist_auto(ray.data.from_arrow(t), K, bin_size,
                            bin_count, threshold_rows=0).to_pandas()
    pd.testing.assert_frame_equal(_norm(broadcast), _norm(joined))

"""Ray Data pipeline tests: tokens passthrough invariant, kernel parity
between pipeline output and direct kernel calls, and determinism at two
parallelism levels (FIXTURES.md §5)."""

import numpy as np
import pyarrow.compute as pc
import pytest

from kmerray.core.coverage import coverage_batch
from kmerray.core.oligo import cfv_batch
from kmerray.pipelines.comp import (cfv_pipeline, cgr_pipeline,
                                    oligo_cgr_pipeline, read_sequences)
from kmerray.pipelines.counter import add_acgt_column, count_kmers
from kmerray.pipelines.cov import coverage_pipeline
from kmerray.pipelines.minpipe import (m2s_pipeline, minimisers_exploded,
                                       s2m_pipeline)
from kmerray.sources.synth import generate_sequences


@pytest.fixture(scope="module")
def seq_table():
    return generate_sequences(300)


def ds_of(tiny_corpus_dir, **kw):
    return read_sequences(tiny_corpus_dir, **kw)


def flat_tokens(table):
    col = table.column("tokens").combine_chunks()
    off = col.offsets.to_numpy().astype(np.int64)
    return col.values.to_numpy()[off[0]:off[-1]], off - off[0]


def test_cfv_pipeline_matches_kernel(ray_session, tiny_corpus_dir):
    ds = cfv_pipeline(ds_of(tiny_corpus_dir), k=4)
    out = ds.take_all()
    got = {r["doc_id"]: np.asarray(r["cfv"]) for r in out}
    assert len(got) == 1000

    import pyarrow.parquet as pq
    import glob
    src = pq.read_table(sorted(glob.glob(f"{tiny_corpus_dir}/*.parquet")))
    values, offsets = flat_tokens(src)
    expect = cfv_batch(values, offsets, 4)
    for i, d in enumerate(src.column("doc_id").to_pylist()):
        assert np.array_equal(got[d], expect[i]), d

    # tokens passthrough invariant: byte-identical per row
    toks_out = {r["doc_id"]: np.asarray(r["tokens"]) for r in out}
    for i, d in enumerate(src.column("doc_id").to_pylist()):
        s, e = offsets[i], offsets[i + 1]
        assert np.array_equal(toks_out[d], values[s:e])


def test_determinism_two_parallelisms(ray_session, tiny_corpus_dir):
    a = cfv_pipeline(ds_of(tiny_corpus_dir, override_num_blocks=2), k=4,
                     batch_size=64).take_all()
    b = cfv_pipeline(ds_of(tiny_corpus_dir, override_num_blocks=7), k=4,
                     batch_size=512).take_all()
    da = {r["doc_id"]: np.asarray(r["cfv"]) for r in a}
    db = {r["doc_id"]: np.asarray(r["cfv"]) for r in b}
    assert da.keys() == db.keys()
    for k_ in da:
        assert np.array_equal(da[k_], db[k_])


def test_count_kmers_matches_kernel(ray_session, tiny_corpus_dir, seq_table):
    ds = ds_of(tiny_corpus_dir)
    counts = {r["kmer"]: r["cnt"]
              for r in count_kmers(ds, 8).take_all()}
    import pyarrow.parquet as pq
    import glob
    src = pq.read_table(sorted(glob.glob(f"{tiny_corpus_dir}/*.parquet")))
    values, offsets = flat_tokens(src)
    from kmerray.core.encoding import canonical_flat_kmers
    canon, _ = canonical_flat_kmers(values, offsets, 8)
    uk, uc = np.unique(canon, return_counts=True)
    expect = dict(zip(uk.tolist(), uc.tolist()))
    assert counts == expect


def test_acgt_column(ray_session, tiny_corpus_dir):
    ds = count_kmers(ds_of(tiny_corpus_dir), 4)
    out = add_acgt_column(ds, 4).take(5)
    from kmerray.core.encoding import numeric_to_kmer
    for r in out:
        assert r["acgt"] == numeric_to_kmer(int(r["kmer"]), 4)


def test_coverage_pipeline(ray_session, tiny_corpus_dir, tmp_path):
    ds = ds_of(tiny_corpus_dir)
    count_kmers(ds, 4).write_parquet(str(tmp_path / "counts"))
    out = coverage_pipeline(ds, str(tmp_path / "counts"), k=4, bin_size=256,
                            bin_count=8, concurrency=2).take_all()
    assert len(out) == 1000
    import pyarrow.parquet as pq
    import glob
    src = pq.read_table(sorted(glob.glob(f"{tiny_corpus_dir}/*.parquet")))
    values, offsets = flat_tokens(src)
    from kmerray.core.encoding import canonical_flat_kmers
    canon, _ = canonical_flat_kmers(values, offsets, 4)
    uk, uc = np.unique(canon, return_counts=True)
    expect = coverage_batch(values, offsets, 4, uk, uc, 256, 8)
    got = {r["doc_id"]: np.asarray(r["coverage"]) for r in out}
    for i, d in enumerate(src.column("doc_id").to_pylist()):
        assert np.array_equal(got[d], expect[i])


def test_s2m_and_m2s(ray_session, tiny_corpus_dir):
    ds = ds_of(tiny_corpus_dir)
    s2m = s2m_pipeline(ds, 31, 7).take(20)
    for r in s2m:
        for e in r["minimisers"]:
            assert 0 <= e["start"] < e["end"] <= len(r["tokens"])

    exploded = minimisers_exploded(ds, 0, 10)
    n_exploded = exploded.count()
    m2s = m2s_pipeline(ds, 0, 10).take_all()
    total_entries = sum(len(r["entries"]) for r in m2s)
    assert total_entries == n_exploded
    # whole-row minimizer: at most one per row
    assert n_exploded <= 1000


def test_cgr_pipeline(ray_session, tiny_corpus_dir):
    out = cgr_pipeline(ds_of(tiny_corpus_dir)).take(30)
    for r in out:
        assert len(r["cgr"]) == len(r["tokens"])
        if r["cgr_valid"]:
            assert all(0.0 <= p["x"] <= 1.0 for p in r["cgr"])


def test_oligo_cgr_pipeline(ray_session, tiny_corpus_dir):
    out = oligo_cgr_pipeline(ds_of(tiny_corpus_dir), k=4).take(5)
    for r in out:
        assert len(r["oligo_cgr"]) == 136


def test_minimiser_bucketed_counting(ray_session, tiny_corpus_dir):
    """north_star: minimizer-bucketed partitioning — identical final
    counts to the kmer-hash exchange."""
    ds = ds_of(tiny_corpus_dir)
    a = {r["kmer"]: r["cnt"] for r in
         count_kmers(ds, 12, bucket_by="kmer").take_all()}
    b = {r["kmer"]: r["cnt"] for r in
         count_kmers(ds_of(tiny_corpus_dir), 12,
                     bucket_by="minimiser").take_all()}
    assert a == b

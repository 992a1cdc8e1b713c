"""As-of engine tests: snapshot build, point-in-time lookup with zero
temporal leakage (boundary probes per FIXTURES.md §4), lag/lead and
sessionize vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kmerray.core.encoding import canonical_flat_kmers
from kmerray.pipelines.asof import (AsofCovScorer, asof_coverage_pipeline,
                                    day_of, eff_day_of, lag_lead_pipeline,
                                    load_snapshot_index,
                                    make_sessionize_group, sessionize_pipeline,
                                    snapshot_counts)
from kmerray.sources.synth import DAY_US, TS_BASE_US, generate_sequences

K = 6
BIN_SIZE = 2
BIN_COUNT = 4


@pytest.fixture(scope="module")
def corpus():
    return generate_sequences(400)


def brute_force_asof(table: pa.Table, k: int, bin_size: int, bin_count: int):
    """Reference oracle: per row, dictionary = canonical k-mer counts of
    all same-source rows in windows closed at or before the row's ts."""
    tok = table.column("tokens").combine_chunks()
    off = tok.offsets.to_numpy().astype(np.int64)
    values = tok.values.to_numpy()[off[0]:off[-1]]
    off = off - off[0]
    ts = table.column("ts").cast(pa.int64()).to_numpy()
    src = np.asarray(table.column("source").to_pandas())
    canon, row = canonical_flat_kmers(values, off, k)
    day = day_of(ts)
    eff = eff_day_of(ts)
    n = table.num_rows
    out = np.zeros((n, bin_count))
    for i in range(n):
        mine = canon[row == i]
        if len(mine) == 0:
            continue
        contrib = np.flatnonzero((src == src[i]) & (day <= eff[i]))
        dict_kmers = canon[np.isin(row, contrib)] if len(contrib) else \
            np.empty(0, np.uint64)
        uk, uc = np.unique(dict_kmers, return_counts=True)
        idx = np.searchsorted(uk, mine)
        idxc = np.minimum(idx, max(len(uk) - 1, 0))
        found = (len(uk) > 0) and None
        if len(uk):
            hit = uk[idxc] == mine
            cnt = np.where(hit, uc[idxc], 0)
        else:
            cnt = np.zeros(len(mine), dtype=np.int64)
        bins = np.minimum(cnt // bin_size, bin_count - 1)
        out[i] = np.bincount(bins, minlength=bin_count)
    return out


def test_snapshot_and_asof_match_brute_force(ray_session, corpus):
    ds = ray.data.from_arrow(corpus)
    snap = snapshot_counts(ds, K, n_buckets=8)
    snap_table = pa.Table.from_pandas(snap.to_pandas())
    index = load_snapshot_index(snap_table)
    scored = asof_coverage_pipeline(ds, index, K, BIN_SIZE, BIN_COUNT,
                                    concurrency=2).take_all()
    got = {r["doc_id"]: np.asarray(r["asof_coverage"]) for r in scored}
    expect = brute_force_asof(corpus, K, BIN_SIZE, BIN_COUNT)
    ids = corpus.column("doc_id").to_pylist()
    for i, d in enumerate(ids):
        assert np.array_equal(got[d], expect[i]), d


def test_leakage_probes(ray_session):
    """Rows before the first close see an empty dict; a row exactly on a
    close sees that snapshot but not its own window's data."""
    day = DAY_US
    base = TS_BASE_US
    tok = [0, 1, 2, 3, 0, 1, 2, 3]  # ACGTACGT: canonical 4-mers

    def mk(ts_us, i):
        return {"doc_id": f"d{i}", "tokens": tok, "n_tok": len(tok),
                "source": "s", "ts": ts_us}

    rows = [
        mk(base + 1000, 0),            # day 0, eff -1: empty dict
        mk(base + day - 1, 1),         # day 0 end, eff -1: empty dict
        mk(base + day, 2),             # exactly on close of day 0: eff 0
        mk(base + day + 5, 3),         # just after: still eff 0
        mk(base + 3 * day + 5, 4),     # eff 2: days 0..2 cumulative
    ]
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "tokens": pa.array([r["tokens"] for r in rows],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([r["n_tok"] for r in rows], pa.int32()),
        "source": pa.array([r["source"] for r in rows]),
        "ts": pa.array([r["ts"] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    snap_table = pa.Table.from_pandas(
        snapshot_counts(ds, 4, n_buckets=2).to_pandas())
    index = load_snapshot_index(snap_table)
    scorer = AsofCovScorer(index, 4, 1, 3)
    out = scorer(t)
    cov = {d: list(v) for d, v in
           zip(out.column("doc_id").to_pylist(),
               out.column("asof_coverage").to_pylist())}
    days = {d: v for d, v in zip(out.column("doc_id").to_pylist(),
                                 out.column("asof_day").to_pylist())}
    # each row has 5 4-mer windows
    assert days["d0"] == -1 and days["d1"] == -1
    assert cov["d0"] == [5.0, 0, 0]            # all counts 0 -> bin 0
    assert cov["d1"] == [5.0, 0, 0]
    assert days["d2"] == 0 and days["d3"] == 0
    # snapshot day 0 contains rows d0, d1 (2 copies of each kmer):
    # counts==2 -> bin 2 for all 5 kmers
    assert cov["d2"] == [0, 0, 5.0]
    assert cov["d3"] == [0, 0, 5.0]
    # eff 2: days 0,1,2 contain d0,d1 (day0) + d2,d3 (day1) -> count 4
    assert days["d4"] == 2
    assert cov["d4"] == [0, 0, 5.0]


def test_lag_lead_vs_pandas(ray_session, corpus):
    ds = ray.data.from_arrow(corpus)
    got = lag_lead_pipeline(ds).to_pandas().sort_values("doc_id")
    pdf = corpus.to_pandas()
    exp = (pdf.groupby("source", group_keys=False)
           .apply(lambda g: g.sort_values(["ts", "doc_id"]).assign(
               prev_n_tok=lambda x: x["n_tok"].shift(1),
               next_n_tok=lambda x: x["n_tok"].shift(-1)))
           .sort_values("doc_id"))
    assert np.array_equal(got["doc_id"].values, exp["doc_id"].values)
    assert np.allclose(got["prev_n_tok"].values.astype(float),
                       exp["prev_n_tok"].values.astype(float),
                       equal_nan=True)
    assert np.allclose(got["next_n_tok"].values.astype(float),
                       exp["next_n_tok"].values.astype(float),
                       equal_nan=True)


def test_sessionize(ray_session, corpus):
    gap = 40 * 60 * 1_000_000
    ds = ray.data.from_arrow(corpus)
    got = sessionize_pipeline(ds, gap_us=gap).to_pandas()
    pdf = corpus.to_pandas()
    for s, g in pdf.groupby("source"):
        exp = make_sessionize_group(gap)(g)
        sub = got[got["source"] == s].set_index("doc_id")["session_seq"]
        for d, v in exp.set_index("doc_id")["session_seq"].items():
            assert sub[d] == v
    # sessions increase with ts within a source
    for s in got["source"].unique():
        sub = got[got["source"] == s].sort_values("ts")
        assert (np.diff(sub["session_seq"].values) >= 0).all()


def test_partitioned_lag_lead_matches_simple(ray_session, corpus):
    from kmerray.pipelines.windowed import partitioned_lag_lead
    ds = ray.data.from_arrow(corpus)
    simple = lag_lead_pipeline(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    part = partitioned_lag_lead(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert np.array_equal(simple["doc_id"], part["doc_id"])
    for c in ("prev_n_tok", "next_n_tok"):
        assert np.allclose(simple[c].astype(float), part[c].astype(float),
                           equal_nan=True), c


def test_partitioned_sessionize_matches_simple(ray_session, corpus):
    from kmerray.pipelines.windowed import partitioned_sessionize
    gap = 40 * 60 * 1_000_000
    ds = ray.data.from_arrow(corpus)
    simple = sessionize_pipeline(ds, gap_us=gap).to_pandas().set_index(
        "doc_id")["session_seq"]
    part = partitioned_sessionize(ds, gap_us=gap).to_pandas().set_index(
        "doc_id")["session_seq"]
    assert simple.sort_index().equals(part.sort_index())


def test_partitioned_sessionize_small_buckets(ray_session, corpus):
    """Buckets much smaller than sessions force heavy boundary
    chaining — ids must still match the single-task result."""
    from kmerray.pipelines.windowed import partitioned_sessionize
    gap = 40 * 60 * 1_000_000
    ds = ray.data.from_arrow(corpus)
    simple = sessionize_pipeline(ds, gap_us=gap).to_pandas().set_index(
        "doc_id")["session_seq"]
    part = partitioned_sessionize(ds, gap_us=gap,
                                  bucket_us=6 * 3_600_000_000
                                  ).to_pandas().set_index(
        "doc_id")["session_seq"]
    assert simple.sort_index().equals(part.sort_index())


def test_backfill_idempotent_and_leak_free(ray_session, corpus):
    """Late-arriving data extends the snapshot table; re-scoring
    (backfill) must leave rows whose effective snapshot predates the
    late data bit-identical, and is idempotent."""
    from kmerray.pipelines.asof import backfill_rescore

    pdf_ts = corpus.column("ts").cast(pa.int64()).to_numpy()
    cutoff_day = int(np.median((pdf_ts - TS_BASE_US) // DAY_US))
    early_mask = ((pdf_ts - TS_BASE_US) // DAY_US) < cutoff_day
    early = corpus.filter(pa.array(early_mask))

    # original run: snapshots built from early data only
    ds_early = ray.data.from_arrow(early)
    snap1 = load_snapshot_index(pa.Table.from_pandas(
        snapshot_counts(ds_early, K, n_buckets=4).to_pandas()))
    orig = {r["doc_id"]: tuple(r["asof_coverage"]) for r in
            asof_coverage_pipeline(ds_early, snap1, K, BIN_SIZE, BIN_COUNT,
                                   concurrency=2).take_all()}

    # late data lands -> snapshots rebuilt from everything
    ds_all = ray.data.from_arrow(corpus)
    snap2 = load_snapshot_index(pa.Table.from_pandas(
        snapshot_counts(ds_all, K, n_buckets=4).to_pandas()))

    # backfill early rows against the extended snapshot table
    redone = {r["doc_id"]: tuple(r["asof_coverage"]) for r in
              backfill_rescore(ds_early, snap2, K, BIN_SIZE, BIN_COUNT,
                               concurrency=2).take_all()}
    # rows whose effective snapshot is before the cutoff are identical:
    # later windows' data cannot leak backward
    eff = (pdf_ts - TS_BASE_US) // DAY_US - 1
    ids = corpus.column("doc_id").to_pylist()
    for i, d in enumerate(ids):
        if early_mask[i] and eff[i] < cutoff_day - 1:
            assert redone[d] == orig[d], d

    # idempotence: running backfill twice gives the same result
    again = {r["doc_id"]: tuple(r["asof_coverage"]) for r in
             backfill_rescore(ds_early, snap2, K, BIN_SIZE, BIN_COUNT,
                              concurrency=2).take_all()}
    assert again == redone


# ---------------------------------------------------------------------------
# round-2 packing fixes: arbitrary source counts, k=28 fallback, day guard
# ---------------------------------------------------------------------------


def _many_source_table(n_src=6, rows_per_src=5, n_tok=30, n_days=5, seed=3):
    rng = np.random.default_rng(seed)
    ids, toks, srcs, ts = [], [], [], []
    for s in range(n_src):
        for r in range(rows_per_src):
            ids.append(f"d{s}-{r}")
            toks.append(rng.integers(0, 4, size=n_tok,
                                     dtype=np.int32).tolist())
            srcs.append(f"src{s}")
            ts.append(TS_BASE_US + int(rng.integers(0, n_days)) * DAY_US
                      + 1000)
    return pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "source": pa.array(srcs),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })


def _expected_partial(table, k):
    """Pandas oracle for the per-batch partial: (source, day, kmer) ->
    count over the whole table as one batch."""
    tok = table.column("tokens").combine_chunks()
    off = tok.offsets.to_numpy().astype(np.int64)
    values = tok.values.to_numpy()[off[0]:off[-1]]
    off = off - off[0]
    canon, row = canonical_flat_kmers(values, off, k)
    ts = table.column("ts").cast(pa.int64()).to_numpy()
    df = pd.DataFrame({
        "source": np.asarray(table.column("source").to_pandas())[row],
        "day": day_of(ts)[row],
        "kmer": canon,
    })
    return (df.groupby(["source", "day", "kmer"]).size()
              .reset_index(name="cnt")
              .sort_values(["source", "day", "kmer"])
              .reset_index(drop=True))


@pytest.mark.parametrize("k", [6, 28])
def test_snapshot_partial_many_sources(k):
    """>=5 distinct sources in one batch (round 1 silently aliased
    them into 2 bits); k=28 exercises the per-source fallback path
    (2k + 8 + src_bits > 64)."""
    from kmerray.pipelines.asof import make_snapshot_partial_fn
    t = _many_source_table(n_src=6)
    got = (make_snapshot_partial_fn(k)(t).to_pandas()
           [["source", "day", "kmer", "cnt"]]
           .astype({"kmer": np.uint64})
           .sort_values(["source", "day", "kmer"]).reset_index(drop=True))
    want = _expected_partial(t, k).astype({"kmer": np.uint64,
                                           "cnt": np.int64})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_snapshot_many_sources_end_to_end(ray_session):
    """Full snapshot build over 6 sources matches the cumulative
    pandas oracle."""
    t = _many_source_table(n_src=6)
    snap = snapshot_counts(ray.data.from_arrow(t), K, n_buckets=4)
    got = (snap.to_pandas().astype({"kmer": np.uint64})
           .sort_values(["source", "kmer", "day"]).reset_index(drop=True))
    want = _expected_partial(t, K)
    want = want.sort_values(["source", "kmer", "day"]).reset_index(drop=True)
    want["cum_cnt"] = want.groupby(["source", "kmer"])["cnt"].cumsum()
    want = want[["source", "kmer", "day", "cum_cnt"]].astype(
        {"kmer": np.uint64})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_snapshot_day_out_of_range_raises():
    """A >256-day horizon must raise, not silently wrap into kmer bits."""
    from kmerray.pipelines.asof import make_snapshot_partial_fn
    t = pa.table({
        "doc_id": pa.array(["x"]),
        "tokens": pa.array([[0, 1, 2, 3, 0, 1]], pa.list_(pa.int32())),
        "source": pa.array(["s"]),
        "ts": pa.array([TS_BASE_US + 300 * DAY_US],
                pa.int64()).cast(pa.timestamp("us")),
    })
    with pytest.raises(ValueError, match="day index"):
        make_snapshot_partial_fn(6)(t)


def test_asof_lookup_eff_day_clamped():
    """A row far past the last snapshot still scores against the
    newest snapshot (clamped eff day; no uint64 overflow)."""
    from kmerray.pipelines.asof import (AsofCovScorer, asof_lookup_counts,
                                        load_snapshot_index)
    snap = pa.table({
        "source": pa.array(["s", "s"]),
        "kmer": pa.array([5, 9], pa.uint64()),
        "day": pa.array([0, 2], pa.int64()),
        "cum_cnt": pa.array([7, 3], pa.int64()),
    })
    index = load_snapshot_index(snap)
    canon = np.array([5, 9, 11], dtype=np.uint64)
    row = np.array([0, 0, 0])
    eff = np.array([10_000])          # way past day 255
    out = asof_lookup_counts(index, np.array(["s"]), eff, canon, row)
    assert out.tolist() == [7, 3, 0]


def test_backfill_lag_monotone(ray_session):
    """Backfill semantics: scoring AS OF an earlier timestamp sees a
    prefix of the snapshot history, so every per-kmer count (hence
    every nonzero high bin's mass) can only shrink or hold vs the
    true-ts run; with lag 0 the backfill path is bit-identical to the
    regular one."""
    from kmerray.queries import q_asof_backfill, q_asof_cov_hist

    sf = "/root/testdata/sf0.001"
    base = q_asof_cov_hist(sf).to_pandas()
    same = q_asof_backfill(sf, lag_days=0).to_pandas()
    key = ["doc_id", "bin"]
    a = base.sort_values(key).reset_index(drop=True)
    b = same.sort_values(key).reset_index(drop=True)
    assert a.equals(b)

    lagged = q_asof_backfill(sf, lag_days=7).to_pandas()
    # every doc keeps the same total occurrence mass (bins shift, the
    # per-doc k-mer count does not)
    t0 = base.groupby("doc_id")["val"].sum()
    t7 = lagged.groupby("doc_id")["val"].sum()
    assert t0.equals(t7)
    # lagging the lookup can only move mass toward LOWER bins: the
    # cumulative mass in bins <= b never decreases for any doc
    p0 = base.pivot_table(index="doc_id", columns="bin", values="val",
                          fill_value=0, aggfunc="sum")
    p7 = lagged.pivot_table(index="doc_id", columns="bin",
                            values="val", fill_value=0, aggfunc="sum")
    cols = sorted(set(p0.columns) | set(p7.columns))
    p0 = p0.reindex(columns=cols, fill_value=0).cumsum(axis=1)
    p7 = p7.reindex(columns=cols, fill_value=0).cumsum(axis=1)
    assert (p7.values >= p0.values - 1e-9).all()

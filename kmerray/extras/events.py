"""Event-stream operators over the `events` table: tumbling
event-time window aggregation and JSON property extraction.

The windowed aggregate is the two-phase combiner shape: a per-batch
partial (group keys collapsed inside ``map_batches``) so the shuffle
moves at most one row per (user, window) per block, then ONE small
groupby merge.  Money sums ride as integer cents so the result is
order-independent and bit-exact against the SQL oracle (a double sum
would depend on reduction order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

HOUR_US = 3_600_000_000


def _window_partial(batch: pa.Table, window_us: int) -> pa.Table:
    ts = batch.column("ts").to_numpy().view("int64")     # epoch micros
    win = ts // window_us
    user = batch.column("user_id").to_numpy()
    cents = np.round(batch.column("value").to_numpy() * 100.0) \
        .astype(np.int64)
    df = pd.DataFrame({"user_id": user, "win": win, "cents": cents})
    agg = (df.groupby(["user_id", "win"], as_index=False)
             .agg(n_part=("cents", "size"), cents_part=("cents", "sum")))
    # composite shuffle key: window ids stay < 2^31 for any epoch-us /
    # window >= 1s split, so user<<32|win is collision-free
    gkey = (agg["user_id"].to_numpy().astype(np.int64) << 32) \
        | agg["win"].to_numpy().astype(np.int64)
    return pa.table({
        "gkey": pa.array(gkey),
        "n_part": pa.array(agg["n_part"].to_numpy(np.int64)),
        "cents_part": pa.array(agg["cents_part"].to_numpy(np.int64)),
    })


def tumbling_window_agg(ds: "ray.data.Dataset", window_us: int = HOUR_US,
                        n_buckets: int = 64) -> "ray.data.Dataset":
    """Per (user_id, tumbling window): event count + exact value sum in
    cents.  Streaming-friendly: partials collapse inside each block,
    then the exchange is keyed on a HASH BUCKET of the composite
    (user, window) id and merged by one vectorized pandas groupby per
    bucket.  Two earlier shapes both lose: per-gkey ``map_groups``
    pays per-group pandas overhead (~40x), and Ray's native
    ``groupby(gkey).sum`` sort-aggregates on ~|groups| DISTINCT keys
    (measured 10.4 s vs 1.5 s bucketed on 195k partials — hour
    windows x Zipf users barely collapse, so the key stays near
    input-sized).  Bucketing sorts on ``n_buckets`` values instead."""
    partial = ds.map_batches(lambda b: _window_partial(b, window_us),
                             batch_format="pyarrow", zero_copy_batch=True)

    def add_bucket(b: pa.Table) -> pa.Table:
        g = b.column("gkey").to_numpy().astype(np.uint64)
        h = (g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "gbkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby("gkey", as_index=False)
              .agg(n_events=("n_part", "sum"),
                   sum_cents=("cents_part", "sum")))
        gkey = m["gkey"].to_numpy()
        return pd.DataFrame({
            "user_id": gkey >> 32,
            "win": gkey & 0xFFFFFFFF,
            "n_events": m["n_events"].astype(np.int64),
            "sum_cents": m["sum_cents"].astype(np.int64),
        })

    return (partial.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("gbkt").map_groups(merge, batch_format="pandas"))


SESSION_GAP_US = 6 * 3_600_000_000      # 6h inactivity ends a session


def _epoch_us(ts: pd.Series) -> np.ndarray:
    """Timestamps -> int64 epoch microseconds, integer-exact (a float
    path via Timedelta division loses the low bits of ns-resolution
    epochs ~1.7e18 and yields off-by-one-us durations)."""
    return ts.to_numpy().astype("datetime64[us]").astype(np.int64)


def _with_user_bucket(ds: "ray.data.Dataset",
                      n_buckets: int) -> "ray.data.Dataset":
    """Hash-bucket users so ONE shuffle co-locates each user's whole
    history; all window work is then bucket-local and vectorized
    across the bucket's users at once (per-user ``map_groups`` was
    measured ~40x slower on many small groups).  Partitioning
    assumption: one user's history fits a worker — the few-key /
    huge-history regime is the time-bucketed carry design in
    ``pipelines.windowed`` instead."""
    def add(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy().astype(np.uint64)
        h = (u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "ubucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))
    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _session_ids(g: pd.DataFrame, gap_us: int):
    """Sorted frame + per-user 1-based session ids, vectorized over all
    users in the bucket (sorted by user brings each user contiguous;
    breaks at user change or gap > gap_us; cumsum rebased per user)."""
    g = g.sort_values(["user_id", "ts", "event_id"])
    t = _epoch_us(g["ts"])
    user = g["user_id"].to_numpy()
    new_user = np.empty(len(g), dtype=bool)
    new_user[0] = True
    new_user[1:] = user[1:] != user[:-1]
    brk = new_user.copy()
    brk[1:] |= (t[1:] - t[:-1]) > gap_us
    s = np.cumsum(brk)
    first_s = np.maximum.accumulate(np.where(new_user, s, 0))
    return g, t, s - first_s + 1


def sessionized_user_stats(ds: "ray.data.Dataset",
                           gap_us: int = SESSION_GAP_US,
                           n_buckets: int = 32) -> "ray.data.Dataset":
    """Per (user, session) aggregates — gaps-and-islands sessionization
    followed by session-level rollup, all inside the user bucket (a
    session never crosses buckets, so no second shuffle): event count,
    exact value sum in cents, session duration in microseconds."""
    def stats(g: pd.DataFrame) -> pd.DataFrame:
        g, t, sess = _session_ids(g, gap_us)
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "session_seq": sess, "t": t, "cents": cents})
        out = (df.groupby(["user_id", "session_seq"], as_index=False)
                 .agg(n_events=("t", "size"), first_t=("t", "min"),
                      last_t=("t", "max"), sum_cents=("cents", "sum")))
        return pd.DataFrame({
            "user_id": out["user_id"].astype(np.int64),
            "session_seq": out["session_seq"].astype(np.int64),
            "n_events": out["n_events"].astype(np.int64),
            "duration_us": (out["last_t"] - out["first_t"]).astype(np.int64),
            "sum_cents": out["sum_cents"].astype(np.int64),
        })

    bucketed = _with_user_bucket(
        ds.select_columns(["event_id", "user_id", "ts", "value"]), n_buckets)
    return bucketed.groupby("ubucket").map_groups(
        stats, batch_format="pandas")


def user_history_features(ds: "ray.data.Dataset",
                          n_buckets: int = 32) -> "ray.data.Dataset":
    """Point-in-time user-history features at each event: how many
    events and how many cents this user had accumulated STRICTLY
    BEFORE this event (exclusive scan — zero temporal leakage; ties
    broken by event_id so the feature is deterministic).  The as-of
    lookup shape of the north_rule on the events table."""
    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        by_user = g.groupby("user_id", sort=False)
        cents = pd.Series(
            np.round(g["value"].to_numpy() * 100.0).astype(np.int64),
            index=g.index)
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "user_id": g["user_id"].astype(np.int64),
            "prior_n": by_user.cumcount().astype(np.int64),
            "prior_cents": (cents.groupby(g["user_id"], sort=False)
                            .cumsum() - cents).astype(np.int64),
        })

    bucketed = _with_user_bucket(
        ds.select_columns(["event_id", "user_id", "ts", "value"]), n_buckets)
    return bucketed.groupby("ubucket").map_groups(
        scan, batch_format="pandas")


def rolling_user_features(ds: "ray.data.Dataset", n_prev: int = 3,
                          range_us: int = HOUR_US,
                          n_buckets: int = 32) -> "ray.data.Dataset":
    """Per-event rolling-window features over each user's history,
    both frame kinds of the standard SQL surface:

    - ``roll_n`` / ``roll_cents``: ROWS BETWEEN n_prev PRECEDING AND
      CURRENT ROW, ordered by (ts, event_id);
    - ``tw_n`` / ``tw_cents``: RANGE BETWEEN range_us PRECEDING AND
      CURRENT ROW, ordered by ts — peers (equal ts) are all included,
      exactly the SQL RANGE-frame contract.

    One user-hash shuffle, then everything is vectorized across ALL
    users in the bucket at once: prefix sums + two searchsorted
    probes.  The RANGE frame avoids a per-user Python loop by
    embedding each user's timeline in a disjoint band of one sorted
    int64 axis (``seg_id * span + (t - t_min)`` with
    ``span > max(t) - min(t) + range_us``): band gaps exceed
    ``range_us``, so a window probe can never cross into a neighbor
    user's band.  Sums ride as integer cents (order-independent,
    bit-exact vs the oracle)."""
    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        m = len(g)
        t = _epoch_us(g["ts"])
        user = g["user_id"].to_numpy()
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        idx = np.arange(m)
        new_user = np.empty(m, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        c = np.cumsum(cents)

        def window_sum(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
            return c[hi] - np.where(lo > 0, c[np.maximum(lo, 1) - 1], 0)

        # ROWS frame: window start is max(segment start, i - n_prev)
        j = np.maximum(seg_start, idx - n_prev)
        roll_n = idx - j + 1
        roll_cents = window_sum(idx, j)

        # RANGE frame: banded-axis searchsorted (see docstring)
        seg_id = np.cumsum(new_user) - 1
        t0 = t - t.min()
        span = np.int64(t0.max()) + np.int64(range_us) + 2
        if (seg_id[-1] + 1) * span > np.iinfo(np.int64).max // 2:
            raise OverflowError("banded range axis would overflow; "
                                "raise n_buckets")
        kt = seg_id * span + t0
        lo = np.searchsorted(kt, kt - range_us, side="left")
        hi = np.searchsorted(kt, kt, side="right") - 1
        return pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64),
            "user_id": g["user_id"].astype(np.int64),
            "roll_n": roll_n.astype(np.int64),
            "roll_cents": roll_cents,
            "tw_n": (hi - lo + 1).astype(np.int64),
            "tw_cents": window_sum(hi, lo),
        })

    bucketed = _with_user_bucket(
        ds.select_columns(["event_id", "user_id", "ts", "value"]), n_buckets)
    return bucketed.groupby("ubucket").map_groups(
        roll, batch_format="pandas")


def json_int_field(ds: "ray.data.Dataset", column: str = "props",
                   field: str = "k") -> "ray.data.Dataset":
    """Extract an integer JSON property with one C-regex pass per batch
    (the props payloads are flat one-level objects; a full JSON parse
    per row would be a Python loop).  Missing field -> -1."""
    pat = f'"{field}": ([0-9]+)'

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        got = batch[column].str.extract(pat, expand=False)
        return pd.DataFrame({
            "event_id": batch["event_id"].astype(np.int64),
            field: got.fillna(-1).astype(np.int64),
        })
    return ds.map_batches(extract, batch_format="pandas")


def drop_consecutive_dups(ds: "ray.data.Dataset",
                          n_buckets: int = 32) -> "ray.data.Dataset":
    """Consecutive-duplicate event filter: keep an event iff it is the
    user's first or its value (in exact cents) differs from the
    previous event's — the lag-compare compaction every event stream
    gets before feature extraction.  One user-hash shuffle, vectorized
    across the bucket."""
    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        user = g["user_id"].to_numpy()
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = user[1:] != user[:-1]
        changed = np.empty(len(g), dtype=bool)
        changed[0] = True
        changed[1:] = cents[1:] != cents[:-1]
        m = first | changed
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[m],
            "user_id": user[m],
        })

    bucketed = _with_user_bucket(
        ds.select_columns(["event_id", "user_id", "ts", "value"]), n_buckets)
    return bucketed.groupby("ubucket").map_groups(keep,
                                                  batch_format="pandas")


def window_distinct_users(ds: "ray.data.Dataset",
                          window_us: int = HOUR_US,
                          n_buckets: int = 64) -> "ray.data.Dataset":
    """Per (event_type, tumbling window): exact event count AND exact
    DISTINCT user count.

    COUNT(DISTINCT) can't ride an additive partial the way sums do —
    the design here is the standard two-level exact shape: each block
    first collapses to DISTINCT ``(event_type, win, user)`` triples
    (with the triple's event count as an additive partial), so the
    exchange moves at most one row per active (type, window, user)
    rather than one per event; the merge bucket is keyed on a hash of
    ``(event_type, win)`` so every triple of a group lands together,
    where distinct-user = run-length count over the (already
    block-distinct, now globally deduped) triples."""
    from .text import content_hash64

    def part(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy().view("int64")
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "win": ts // window_us,
            "user_id": b.column("user_id").to_numpy(),
        })
        g = (df.groupby(["event_type", "win", "user_id"], as_index=False)
               .agg(n_part=("win", "size")))
        with np.errstate(over="ignore"):
            h = (content_hash64(g["event_type"])
                 * np.uint64(0x9E3779B97F4A7C15)) \
                ^ g["win"].to_numpy().astype(np.uint64)
        g["gbkt"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # global triple dedup first (a triple may appear once per block)
        t = (g.groupby(["event_type", "win", "user_id"], as_index=False)
              .agg(n=("n_part", "sum")))
        out = (t.groupby(["event_type", "win"], as_index=False)
                .agg(n_events=("n", "sum"), n_users=("user_id", "size")))
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    part_ds = ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
    return part_ds.groupby("gbkt").map_groups(merge,
                                              batch_format="pandas")


def funnel_first_completion(ds: "ray.data.Dataset", a: str = "view",
                            b: str = "click", c: str = "purchase",
                            n_buckets: int = 32) -> "ray.data.Dataset":
    """Sequence-pattern funnel per user: the earliest a -> b -> c
    completion in strict (ts, event_id) order, emitting
    ``(user_id, abc_ts_us)`` for completing users only.

    The earliest completion is always (first a) -> (first b after it)
    -> (first c after that), so the whole pattern reduces to three
    per-user first-occurrence scans over the bucket-sorted frame —
    one ``np.unique(return_index)`` each (ascending row index makes
    the first hit per segment the returned one), no per-user loop.
    ONE user-hash shuffle, same partitioning contract as the other
    event windows (a user's history fits a worker)."""
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        t = _epoch_us(g["ts"])
        user = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "abc_ts_us": pd.Series([], dtype=np.int64)})
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        seg = np.cumsum(new_user) - 1
        nseg = int(seg[-1]) + 1
        i = np.arange(n, dtype=np.int64)
        NO = np.int64(n)          # sentinel: "never happens"

        def first_at(mask: np.ndarray) -> np.ndarray:
            out = np.full(nseg, NO, dtype=np.int64)
            segs, pos = np.unique(seg[mask], return_index=True)
            out[segs] = i[mask][pos]
            return out

        ia = first_at(et == a)
        ib = first_at((et == b) & (i > ia[seg]))
        ic = first_at((et == c) & (i > ib[seg]))
        done = ic < NO
        return pd.DataFrame({
            "user_id": user[new_user][done].astype(np.int64),
            "abc_ts_us": t[ic[done]],
        })

    bucketed = _with_user_bucket(ds, n_buckets)
    return bucketed.groupby("ubucket").map_groups(per_bucket,
                                                  batch_format="pandas")


DAY_US = 24 * HOUR_US


def retention_cohorts(ds: "ray.data.Dataset",
                      period_us: int = DAY_US,
                      n_buckets: int = 32) -> pd.DataFrame:
    """Classic cohort-retention matrix: users are cohorted by their
    first active period (day), and ``n_users`` counts how many of a
    cohort's users were active again ``day_offset`` periods later —
    the standard product-analytics retention triangle, and at corpus
    scale the contributor-activity surface for data-freshness audits.

    Scale shape: per-block partials pre-collapse to DISTINCT
    ``(user, period)`` pairs (one lexsort per block, the events-suite
    combiner discipline), ONE user-hash-bucketed exchange — a user's
    rows land whole in one bucket, so ``cohort = min(period)`` is
    exact per bucket — and each bucket emits pre-counted ``(cohort,
    offset, n)`` partials; the driver folds ``buckets × periods²``
    int rows, never the event stream.  All-integer surface: counts
    and day arithmetic are exact on both engines.

    Output: ``(cohort_day, day_offset, n_users)`` with ``cohort_day``
    in epoch periods (``epoch_us // period_us``)."""

    def partial(batch: pd.DataFrame) -> pa.Table:
        u = batch["user_id"].to_numpy().astype(np.int64)
        day = _epoch_us(batch["ts"]) // period_us
        order = np.lexsort((day, u))
        su, sd = u[order], day[order]
        first = np.ones(len(su), dtype=bool)
        first[1:] = (su[1:] != su[:-1]) | (sd[1:] != sd[:-1])
        su, sd = su[first], sd[first]
        return pa.table({"user": pa.array(su), "day": pa.array(sd),
                         "ub": pa.array(su % n_buckets)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user"].to_numpy()
        day = g["day"].to_numpy()
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        u, day = u[first], day[first]
        ustart = np.ones(len(u), dtype=bool)
        ustart[1:] = u[1:] != u[:-1]
        # post-lexsort each user's first row carries its min day;
        # broadcast it down the user's run
        cohort = day[np.maximum.accumulate(
            np.where(ustart, np.arange(len(u)), 0))]
        off = day - cohort
        order2 = np.lexsort((off, cohort))
        kc, ko = cohort[order2], off[order2]
        kf = np.ones(len(kc), dtype=bool)
        kf[1:] = (kc[1:] != kc[:-1]) | (ko[1:] != ko[:-1])
        starts = np.flatnonzero(kf)
        lens = np.diff(np.append(starts, len(kc)))
        return pd.DataFrame({"cohort_day": kc[starts],
                             "day_offset": ko[starts],
                             "n": lens.astype(np.int64)})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("ub").map_groups(merge, batch_format="pandas"))
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    empty = pd.DataFrame({
        "cohort_day": pd.Series([], dtype=np.int64),
        "day_offset": pd.Series([], dtype=np.int64),
        "n_users": pd.Series([], dtype=np.int64)})
    if not tabs:
        return empty
    allp = pa.concat_tables(tabs)
    c = allp.column("cohort_day").to_numpy()
    o = allp.column("day_offset").to_numpy()
    n = allp.column("n").to_numpy()
    order = np.lexsort((o, c))
    c, o, n = c[order], o[order], n[order]
    first = np.ones(len(c), dtype=bool)
    first[1:] = (c[1:] != c[:-1]) | (o[1:] != o[:-1])
    starts = np.flatnonzero(first)
    csum = np.zeros(len(c) + 1, dtype=np.int64)
    np.cumsum(n, out=csum[1:])
    ends = np.append(starts[1:], len(c))
    return pd.DataFrame({"cohort_day": c[starts],
                         "day_offset": o[starts],
                         "n_users": csum[ends] - csum[starts]})

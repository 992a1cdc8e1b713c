"""Scalable event-time window features: lag/lead and sessionize via
(source, ts-bucket) partitioning with boundary exchange.

``asof.lag_lead_pipeline``/``sessionize_pipeline`` sort each source's
whole history in one task — fine until a source's rows outgrow a
worker.  Here the same features are computed with bounded-size
partitions, the classic two-phase scan:

1. *summary pass*: per (source, bucket) emit only the boundary rows
   and session-break counts — thousands of rows regardless of input
   size;
2. driver combines summaries into per-bucket carry-in state (previous
   bucket's last row; cumulative session offset) — an O(#buckets)
   scan broadcast via ``ray.put``;
3. *apply pass*: per (source, bucket) groups compute the exact
   lag/lead/session ids using the carried state.

Results are bit-identical to the single-task variants (asserted in
tests); ties broken by (ts, doc_id) everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..sources.synth import DAY_US, TS_BASE_US


def _us(ts: pd.Series) -> pd.Series:
    """Timestamps -> int64 microseconds, robust to pandas ns/us units."""
    return ((ts - pd.Timestamp("1970-01-01"))
            / pd.Timedelta(microseconds=1)).astype("int64")


def _bucket_of(ts: pd.Series, bucket_us: int) -> pd.Series:
    return ((_us(ts) - TS_BASE_US) // bucket_us).astype("int64")


def _with_bucket(ds: "ray.data.Dataset", bucket_us: int):
    def add(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = _bucket_of(b["ts"], bucket_us)
        return b
    return ds.map_batches(add, batch_format="pandas")


def partitioned_lag_lead(seq_ds: "ray.data.Dataset",
                         bucket_us: int = DAY_US) -> "ray.data.Dataset":
    """(doc_id, source, ts, n_tok, prev_n_tok, next_n_tok, gap_us) with
    partition-local work + boundary-row exchange."""
    ds = _with_bucket(seq_ds.select_columns(
        ["doc_id", "source", "ts", "n_tok"]), bucket_us)

    def boundary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "doc_id"])
        return pd.concat([g.head(1).assign(edge="first"),
                          g.tail(1).assign(edge="last")])
    bounds = ds.groupby(["source", "bucket"]).map_groups(
        boundary, batch_format="pandas").to_pandas()

    # carry-in/out per (source, bucket): neighbor boundary rows
    carry: dict = {}
    for src, grp in bounds.groupby("source"):
        grp = grp.sort_values(["bucket", "edge"])
        buckets = sorted(grp["bucket"].unique())
        for i, b in enumerate(buckets):
            prev_last = None
            next_first = None
            if i > 0:
                r = grp[(grp["bucket"] == buckets[i - 1]) &
                        (grp["edge"] == "last")].iloc[0]
                prev_last = (r["ts"], r["doc_id"], r["n_tok"])
            if i < len(buckets) - 1:
                r = grp[(grp["bucket"] == buckets[i + 1]) &
                        (grp["edge"] == "first")].iloc[0]
                next_first = (r["ts"], r["doc_id"], r["n_tok"])
            carry[(src, int(b))] = (prev_last, next_first)
    carry_ref = ray.put(carry)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        src = g["source"].iloc[0]
        b = int(g["bucket"].iloc[0])
        prev_last, next_first = c.get((src, b), (None, None))
        g = g.sort_values(["ts", "doc_id"])
        prev_n = g["n_tok"].shift(1).astype("float64")
        next_n = g["n_tok"].shift(-1).astype("float64")
        gap = ((g["ts"] - g["ts"].shift(1))
               / pd.Timedelta(microseconds=1)).astype("float64")
        if prev_last is not None:
            prev_n.iloc[0] = float(prev_last[2])
            gap.iloc[0] = float((g["ts"].iloc[0]
                                 - pd.Timestamp(prev_last[0]))
                                / pd.Timedelta(microseconds=1))
        if next_first is not None:
            next_n.iloc[-1] = float(next_first[2])
        return pd.DataFrame({
            "doc_id": g["doc_id"], "source": g["source"], "ts": g["ts"],
            "n_tok": g["n_tok"], "prev_n_tok": prev_n,
            "next_n_tok": next_n, "gap_us": gap,
        })

    return ds.groupby(["source", "bucket"]).map_groups(
        apply, batch_format="pandas")


def partitioned_sessionize(seq_ds: "ray.data.Dataset", gap_us: int,
                           bucket_us: int = DAY_US) -> "ray.data.Dataset":
    """(doc_id, source, ts, session_seq) — identical ids to the
    single-task sessionizer, with bounded partitions."""
    ds = _with_bucket(seq_ds.select_columns(["doc_id", "source", "ts"]),
                      bucket_us)

    def summary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "doc_id"])
        t = _us(g["ts"])
        internal = int((t.diff().iloc[1:] > gap_us).sum())
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "bucket": [int(g["bucket"].iloc[0])],
            "first_ts": [int(t.iloc[0])], "last_ts": [int(t.iloc[-1])],
            "internal_breaks": [internal],
        })
    summ = ds.groupby(["source", "bucket"]).map_groups(
        summary, batch_format="pandas").to_pandas()

    state: dict = {}
    for src, grp in summ.groupby("source"):
        grp = grp.sort_values("bucket")
        offset = 0
        prev_last_ts = None
        for _, r in grp.iterrows():
            boundary_break = (prev_last_ts is None or
                              r["first_ts"] - prev_last_ts > gap_us)
            state[(src, int(r["bucket"]))] = (offset, boundary_break)
            offset += int(r["internal_breaks"]) + int(boundary_break)
            prev_last_ts = r["last_ts"]
    state_ref = ray.put(state)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(state_ref)
        offset, boundary_break = st[(g["source"].iloc[0],
                                     int(g["bucket"].iloc[0]))]
        g = g.sort_values(["ts", "doc_id"])
        t = _us(g["ts"])
        brk = (t.diff() > gap_us)
        brk.iloc[0] = boundary_break
        return pd.DataFrame({
            "doc_id": g["doc_id"], "source": g["source"], "ts": g["ts"],
            "session_seq": (offset + brk.cumsum()).astype("int64"),
        })

    return ds.groupby(["source", "bucket"]).map_groups(
        apply, batch_format="pandas")

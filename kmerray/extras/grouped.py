"""Grouped top-k: the "best k rows per key" operator (top-quality docs
per language, best candidates per query, ...) expressed scale-first:

1. a per-batch PARTIAL top-k per key inside ``map_batches`` — each
   block contributes at most k rows per key it contains, so the
   shuffle moves O(k x keys x blocks) rows, never the full table;
2. one ``groupby(key).map_groups`` merge that re-ranks the partials.

Ordering is (score DESC, tiebreak ASC) — deterministic under float
ties, and the same ORDER BY the SQL oracle's row_number() uses.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def _topk_per_key(df: pd.DataFrame, key: str, score: str, k: int,
                  tiebreak: str, ascending: bool = False) -> pd.DataFrame:
    df = df.sort_values([key, score, tiebreak],
                        ascending=[True, ascending, True], kind="mergesort")
    return df.groupby(key, sort=False).head(k).reset_index(drop=True)


def grouped_topk(ds: "ray.data.Dataset", key: str, score: str,
                 k: int, tiebreak: str,
                 ascending: bool = False) -> "ray.data.Dataset":
    partial = ds.map_batches(
        lambda b: _topk_per_key(b, key, score, k, tiebreak, ascending),
        batch_format="pandas")
    return partial.groupby(key).map_groups(
        lambda g: _topk_per_key(g, key, score, k, tiebreak, ascending),
        batch_format="pandas")


def grouped_zscore(ds: "ray.data.Dataset", key: str = "source",
                   col: str = "n_chars") -> "ray.data.Dataset":
    """Per-group z-score normalization of an integer feature column —
    the standard feature-engineering step before mixing sources with
    different length/score distributions.

    Scale shape: one ``map_batches`` pass emits EXACT integer partials
    ``(key, cnt, sum, sum_sq)`` per group per block; one tiny groupby
    over <= groups x blocks rows; the per-group moments are broadcast
    once (``ray.put``) and the scoring pass is stateless.  No shuffle
    of the data rows at all.

    Exactness: the partials are int64 (exact while
    ``n x max(col)^2 < 2^63``, i.e. ~10^10 rows at col <= 10^4 — split
    accumulators before that), and both engines compute
    ``(x - s1/cnt) / sqrt(s2/cnt - (s1/cnt)^2)`` with the identical
    IEEE op sequence from the same exact integers, so the doubles
    hash-match bit-for-bit with no rounding."""
    import numpy as np

    import ray

    def part(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy().astype(np.int64)
        g = (pd.DataFrame({key: b[key], "c": 1, "s1": x, "s2": x * x})
             .groupby(key, as_index=False).sum())
        return g

    # <= groups x blocks partial rows; merged on the driver in exact
    # python ints (group count is small by contract — sources, langs)
    rows = ds.map_batches(part, batch_format="pandas").take_all()
    agg: dict = {}
    for r in rows:
        c, s1, s2 = agg.get(r[key], (0, 0, 0))
        agg[r[key]] = (c + int(r["c"]), s1 + int(r["s1"]),
                       s2 + int(r["s2"]))
    ref = ray.put(agg)

    class Z:
        def __init__(self):
            self.stats = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            x = b[col].to_numpy().astype(np.float64)
            cnt = np.empty(len(b))
            s1 = np.empty(len(b))
            s2 = np.empty(len(b))
            keys = b[key].to_numpy()
            for kval, (c, a1, a2) in self.stats.items():
                m = keys == kval
                cnt[m], s1[m], s2[m] = float(c), float(a1), float(a2)
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            # constant group: z is undefined — emit NaN explicitly
            # (the SQL twin mirrors the same rule) instead of relying
            # on engine-specific 0/0 behavior
            with np.errstate(divide="ignore", invalid="ignore"):
                z = np.where(var <= 0.0, np.nan,
                             (x - mean) / np.sqrt(var))
            return pd.DataFrame({"doc_id": b["doc_id"].astype(np.int64),
                                 "z": z})

    return ds.map_batches(Z, concurrency=(1, 8), batch_format="pandas")

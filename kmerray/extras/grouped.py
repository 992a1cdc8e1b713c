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

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


def grouped_mad_outliers(ds: "ray.data.Dataset", key: str = "source",
                         col: str = "n_chars",
                         n_mads: int = 3) -> "ray.data.Dataset":
    """Per-group ROBUST standardization — median/MAD z-scores and the
    classic ``|x - med| > n_mads * MAD`` outlier flag (Hampel
    identifier).  The robust complement to :func:`grouped_zscore`:
    heavy-tailed web-scale feature distributions (lengths, scores)
    break mean/std standardization because the outliers being hunted
    inflate the std; median and MAD have a 50% breakdown point.

    Scale shape: one ``map_batches`` pass emits per-block
    ``(key, value, count)`` VALUE-HISTOGRAM partials (the
    tok_quantiles discipline — the exchange is groups x distinct
    values, never the corpus); the driver folds them, reads the
    group median off the cumsum with the exact ceil-rank rule
    (1-based rank ``ceil(n/2)``), then derives the MAD from the SAME
    histogram by folding it around the median (|v - med| re-bin +
    one more cumsum) — no second data pass.  The <= groups x 2 ints
    broadcast once; the scoring pass is stateless.

    Exactness: med and MAD are integers; ``rz`` is ONE
    int64-difference / int64 IEEE division (bit-exact vs SQL, the
    zscore convention); the flag is a pure integer compare.
    MAD = 0 (majority-constant group) yields ``rz = NaN``, flag
    still exact.

    Output: ``(doc_id, med:int64, mad:int64, rz:double,
    outlier:int64)``."""
    import numpy as np

    import ray

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({key: b[key],
                           "v": b[col].to_numpy().astype(np.int64)})
             .groupby([key, "v"], as_index=False).size())
        g.columns = [key, "v", "c"]
        return g

    rows = (ds.map_batches(part, batch_format="pandas").to_pandas()
            .groupby([key, "v"], as_index=False)["c"].sum())
    stats: dict = {}
    for k_, g in rows.groupby(key):
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        med = int(v[np.searchsorted(cum, (n + 1) // 2)])
        # fold the histogram around med -> |v - med| histogram
        av = np.abs(v - med)
        ao = np.argsort(av, kind="stable")
        av, ac = av[ao], c[ao]
        # merge equal deviations (v=med-d and v=med+d)
        uu, inv = np.unique(av, return_inverse=True)
        uc = np.bincount(inv, weights=ac).astype(np.int64)
        cum2 = np.cumsum(uc)
        mad = int(uu[np.searchsorted(cum2, (n + 1) // 2)])
        stats[k_] = (med, mad)
    ref = ray.put(stats)

    class Score:
        def __init__(self):
            st = ray.get(ref)
            self.med_map = pd.Series({k_: v[0] for k_, v in st.items()})
            self.mad_map = pd.Series({k_: v[1] for k_, v in st.items()})

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            x = b[col].to_numpy().astype(np.int64)
            med = b[key].map(self.med_map).to_numpy(np.int64)
            mad = b[key].map(self.mad_map).to_numpy(np.int64)
            diff = x - med
            with np.errstate(divide="ignore", invalid="ignore"):
                rz = np.where(mad == 0, np.nan,
                              diff.astype(np.float64)
                              / mad.astype(np.float64))
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(),
                "med": med, "mad": mad, "rz": rz,
                "outlier": (np.abs(diff) > n_mads * mad)
                .astype(np.int64)})

    return ds.map_batches(Score, concurrency=4, batch_size=4096,
                          num_cpus=0.5, batch_format="pandas")

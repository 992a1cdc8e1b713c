"""Deterministic stratified sampling + train/val/test split over the
`documents` table.

Every row is routed by a content-independent, engine-portable hash of
its doc_id — DuckDB's ``md5_number_lower(s)`` equals
``int.from_bytes(md5(s).digest()[8:16], 'little')`` in Python, so the
SQL oracle reproduces the exact keep/split decisions bit-for-bit.
That portability is the whole point: a resharded / re-run / re-read
corpus samples identically on any engine, which is what makes
downsampling reproducible at 100 TB.

Per-language keep rates (permille) model the usual "rebalance the
language mix" step; the split hash uses a salted key so keep and
split decisions are independent.

Scale design: stateless ``map_batches`` — no shuffle, no driver
state, streams at read speed.  The md5 itself is a per-row C call
(hashlib) in a list comprehension; ~1 µs/row, the one non-array
kernel in this module (a vectorized siphash would not match any SQL
builtin — portability wins here).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

# permille keep-rate per language (unlisted languages -> DEFAULT)
RATES = {"en": 900, "de": 700, "fr": 500, "es": 300}
DEFAULT_RATE = 100
SPLIT_SALT = "#split"
TRAIN_PCT, VAL_PCT = 90, 95  # <90 train, <95 val, else test


def md5_lower64(strs) -> np.ndarray:
    """DuckDB-compatible 64-bit hash: low half of md5, little-endian
    (matches ``md5_number_lower``)."""
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
         for s in strs], dtype=np.uint64)


def sample_split_fn(batch: pd.DataFrame) -> pd.DataFrame:
    ids = batch["doc_id"].astype(str).to_numpy(dtype=object)
    bucket = (md5_lower64(ids) % 1000).astype(np.int64)
    rates = (batch["lang"].map(RATES).fillna(DEFAULT_RATE)
             .to_numpy(dtype=np.int64))
    keep = bucket < rates
    out = batch.loc[keep, ["doc_id", "lang"]].reset_index(drop=True)
    out["bucket"] = bucket[keep]
    sb = md5_lower64(ids[keep] + SPLIT_SALT) % 100
    out["split"] = np.select([sb < TRAIN_PCT, sb < VAL_PCT],
                             ["train", "val"], default="test")
    return out


def sample_split_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(sample_split_fn, batch_format="pandas")


def group_sample(ds: "ray.data.Dataset", key: str = "lang",
                 n: int = 20) -> "ray.data.Dataset":
    """Deterministic per-group sample: the first ``n`` rows of each
    group in portable-md5 order (hash of doc_id, doc_id tiebreak).

    Unlike a random ``ds.groupby().map_groups(sample)``, the selection
    is content-independent and engine-portable — resharding, re-running
    or re-reading the corpus picks the SAME rows, and any SQL engine
    can reproduce the choice (that reproducibility is what makes a
    100-TB eval-slice defensible).  Scale shape: per-block partial
    head-n per group, then one group merge — the grouped_topk
    combiner, so the shuffle carries at most n rows per group per
    block."""
    from .grouped import grouped_topk

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id", key]].copy()
        b["_h"] = md5_lower64(b["doc_id"].astype(str).to_numpy(object))
        return b

    out = grouped_topk(ds.map_batches(add_hash, batch_format="pandas"),
                       key=key, score="_h", k=n, tiebreak="doc_id",
                       ascending=True)
    return out.map_batches(lambda b: b[["doc_id", key]],
                           batch_format="pandas")


TEMP_ALPHA = 0.5
TEMP_TARGET_FRAC = 0.5
TEMP_SALT = "#temp"


def temperature_sample(ds: "ray.data.Dataset", key: str = "lang",
                       alpha: float = TEMP_ALPHA,
                       target_frac: float = TEMP_TARGET_FRAC,
                       salt: str = TEMP_SALT) -> "ray.data.Dataset":
    """Temperature-based corpus rebalancing (the multilingual
    alpha-sampling of Lample & Conneau 2019 / XLM-R, arXiv:1911.02116
    §3): group g with count ``n_g`` is kept with probability
    proportional to ``(n_g/N)^alpha / n_g`` so the SAMPLED mix follows
    ``p_g ∝ (n_g/N)^alpha`` — alpha<1 upweights low-resource groups,
    alpha=1 preserves the natural mix.  ``target_frac`` scales the
    expected kept volume to ``target_frac * N`` rows (capped at 100%
    per group).

    Keep decisions are the engine-portable md5 permille idiom of
    :func:`sample_split_fn` (rate in parts-per-million here so small
    keep probabilities stay resolvable): a resharded / re-run corpus
    samples identically on any engine.

    Scale design: pass 1 is a per-block partial count — the driver
    merges O(blocks × distinct keys) scalars, never rows (key
    cardinality is languages/domains, i.e. bounded); pass 2 is a
    stateless ``map_batches`` with the tiny rate table captured in
    the closure.  No shuffle at any scale.

    Float caveat (the dsir_weights convention): the per-group rate is
    ``floor(q*1e6 + 0.5)`` of a double computed with the same
    operation order as the SQL oracle; engines could disagree only if
    libm ``pow`` differs by an ulp AND ``q*1e6 + 0.5`` straddles an
    integer — ~2^-40 per group, and the oracle gate would catch it."""
    parts = ds.select_columns([key]).map_batches(
        lambda b: b[key].value_counts().rename_axis(key)
                   .reset_index(name="n"),
        batch_format="pandas").take_all()
    cnt: dict = {}
    for r in parts:
        cnt[r[key]] = cnt.get(r[key], 0) + int(r["n"])
    tot = float(sum(cnt.values()))
    # SQL mirrors this exact op order: power(n/tot, alpha), sum in
    # sorted-key order (DuckDB's aggregate order is unspecified but
    # the sum of a handful of doubles is order-insensitive far beyond
    # the rate's 1e-6 resolution)
    w = {g: (n / tot) ** alpha for g, n in cnt.items()}
    sw = sum(w[g] for g in sorted(w))
    rate = {g: int(np.floor(min(1.0, target_frac * (w[g] / sw) * tot
                                / cnt[g]) * 1_000_000 + 0.5))
            for g in cnt}

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        ids = (b["doc_id"].astype(str) + salt).to_numpy(dtype=object)
        hv = (md5_lower64(ids) % np.uint64(1_000_000)).astype(np.int64)
        r = b[key].map(rate).to_numpy(dtype=np.int64)
        keep = hv < r
        out = b.loc[keep, ["doc_id", key]].reset_index(drop=True)
        out["rate"] = r[keep]
        return out

    return ds.map_batches(flag, batch_format="pandas")


WSAMPLE_K = 64
WSAMPLE_SALT = "#w"
# 2^-64 (a power of two): scaling a float by it changes only the
# exponent, so u = h * 2^-64 is rounding-free on both engines
_INV_2_64 = 2.0 ** -64


def weighted_priority_sample(ds: "ray.data.Dataset", k: int = WSAMPLE_K,
                             weight_col: str = "n_chars",
                             salt: str = WSAMPLE_SALT) -> pd.DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 54(6) 2007):
    the weighted sample-without-replacement that makes any subset-sum
    over a 100-TB corpus estimable from k rows.

    Each row gets priority ``p_i = u_i / w_i`` with
    ``u_i = md5_lower64(doc_id || salt) * 2^-64`` (uniform, portable,
    content-independent) and integer weight ``w_i = max(weight_col, 1)``;
    the sample is the k smallest priorities, ``tau`` is the (k+1)-th,
    and each member carries the unbiased subset-sum estimator weight
    ``est_i = max(w_i, 1/tau)`` (sum of ``est`` over any sampled subset
    estimates that subset's true weight).  All decisions are the md5
    idiom of :func:`sample_split_fn`, so a resharded / re-run corpus —
    or the SQL oracle — draws the IDENTICAL sample.

    Scale design: bottom-(k+1) is a mergeable sketch — each block
    emits its k+1 smallest (the global (k+1)-th must be one of them),
    the driver folds <= blocks x (k+1) rows, the corpus itself never
    shuffles or collects.

    Float discipline: u is exact (power-of-two scale of the 53-bit
    rounded hash), prio is ONE IEEE division, est is one division +
    max — identical op sequences both engines, bit-for-bit hashable.

    Output: pandas ``(doc_id, w:int64, prio:double, est:double)``.
    """
    def part(b: pd.DataFrame) -> pd.DataFrame:
        w = np.maximum(b[weight_col].to_numpy().astype(np.int64), 1)
        ids = b["doc_id"].astype(str).to_numpy(dtype=object)
        u = md5_lower64([s + salt for s in ids]).astype(np.float64) \
            * _INV_2_64
        out = pd.DataFrame({"doc_id": b["doc_id"].astype(np.int64),
                            "w": w, "prio": u / w.astype(np.float64)})
        return (out.sort_values(["prio", "doc_id"], kind="mergesort")
                .head(k + 1))

    from .gather import collect_df
    merged = (collect_df(ds.map_batches(part, batch_format="pandas"))
              .sort_values(["prio", "doc_id"], kind="mergesort")
              .reset_index(drop=True))
    tau = float(merged["prio"].iloc[k]) if len(merged) > k else None
    out = merged.head(k).copy()
    out["est"] = (out["w"].to_numpy().astype(np.float64) if tau is None
                  else np.maximum(out["w"].to_numpy().astype(np.float64),
                                  1.0 / tau))
    return out.reset_index(drop=True)

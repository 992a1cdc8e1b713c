"""Text-analysis stages for a training-data pipeline over the
`documents` table: token counting, quality scoring, language-ID
heuristic, document fingerprinting.  All vectorized ``map_batches``
stages (pandas str kernels / numpy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# crude n-gram language cues for the synthetic corpus's lang tags
_LANG_HINTS = {
    "en": {"the", "and", "of"},
    "es": {"el", "la", "de", "y"},
    "de": {"der", "die", "und", "das"},
    "fr": {"le", "la", "et", "les"},
}


def doc_stats_fn(batch: pa.Table) -> pa.Table:
    """n_words (single-space split), stopword count, avg word length.

    avg_word_len assumes single-space separation:
    ``(n_chars - n_words + 1) / n_words`` — the same closed form the
    SQL oracle uses, so the division is bit-identical."""
    words = pc.split_pattern(batch.column("text"), " ")
    n_words = pc.list_value_length(words).cast(pa.int64())
    n_chars = pc.utf8_length(batch.column("text")).cast(pa.int64())
    flat = words.combine_chunks()
    offs = flat.offsets.to_numpy().astype(np.int64)
    vals = np.asarray(flat.values.to_pandas())
    offs = offs - offs[0]
    is_stop = np.isin(vals, np.array(STOPWORDS))
    c = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(is_stop, out=c[1:])
    stop_cnt = c[offs[1:]] - c[offs[:-1]]
    nw = n_words.to_numpy()
    avg_wl = (n_chars.to_numpy() - nw + 1) / nw
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": n_words,
        "n_chars": n_chars,
        "stop_cnt": pa.array(stop_cnt),
        "stop_ratio": pa.array(stop_cnt / nw),
        "avg_word_len": pa.array(avg_wl),
    })


def doc_stats_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(doc_stats_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def quality_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality score in [0,1]: length sweet-spot x stopword
    presence x repetition penalty (distinct-word ratio)."""
    words = batch["text"].str.split(" ")
    n = words.str.len().astype(float)
    distinct_ratio = words.map(lambda w: len(set(w))) / n
    stop_ratio = words.map(
        lambda w: sum(x in STOPWORDS for x in w)) / n
    len_score = np.clip(n / 50.0, 0, 1) * np.clip(2 - n / 500.0, 0, 1)
    batch = batch[["doc_id"]].copy()
    batch["quality"] = (0.5 * len_score + 0.25 * distinct_ratio.clip(0, 1)
                        + 0.25 * (stop_ratio * 5).clip(0, 1))
    return batch


def quality_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(quality_fn, batch_format="pandas")


def lang_id_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """N-gram-hint language guess (falls back to 'und')."""
    def guess(text: str) -> str:
        ws = set(text.split(" "))
        best, score = "und", 0
        for lang, hints in _LANG_HINTS.items():
            s = len(ws & hints)
            if s > score:
                best, score = lang, s
        return best
    out = batch[["doc_id"]].copy()
    out["lang_guess"] = batch["text"].map(guess)
    return out


def lang_id_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(lang_id_fn, batch_format="pandas")


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_bytes_batch(texts: "pd.Series") -> np.ndarray:
    """Vectorized-ish FNV-1a 64 of each text (used for exact-dedup keys
    and fingerprints; stable across workers, unlike Python hash())."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = _FNV_OFFSET
        for b in t.encode():
            h = (h ^ np.uint64(b)) * _FNV_PRIME
        out[i] = h
    return out


def fingerprint_fn(batch: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprint: FNV-1a of the full text (rolling-hash
    byte stream)."""
    out = batch[["doc_id"]].copy()
    with np.errstate(over="ignore"):
        out["fingerprint"] = fnv1a_bytes_batch(batch["text"])
    return out


def fingerprint_pipeline(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(fingerprint_fn, batch_format="pandas")

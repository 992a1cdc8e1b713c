"""Token-window chunking, stopword scrub, repetition stats, document
frequency, grouped top-k — hand-computed small cases plus multi-block
determinism (the partial/merge paths must not depend on block
boundaries)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kmerray.extras.chunking import (chunk_windows_pipeline,
                                     stop_filter_pipeline)
from kmerray.extras.grouped import grouped_topk
from kmerray.extras.text import df_counts_pipeline, rep_stats_pipeline


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)}))


def test_chunk_windows_hand(ray_session):
    # 7 words, window 3, stride 2 -> starts 0,2,4,6
    ds = _docs(["a b c d e f g"])
    out = (chunk_windows_pipeline(ds, window=3, stride=2)
           .to_pandas().sort_values("win_id").reset_index(drop=True))
    assert out["win_text"].tolist() == ["a b c", "c d e", "e f g", "g"]
    assert out["n_win_tokens"].tolist() == [3, 3, 3, 1]
    assert out["win_id"].tolist() == [0, 1, 2, 3]


def test_chunk_windows_short_doc(ray_session):
    # doc shorter than one window -> exactly one (partial) window
    ds = _docs(["x y"])
    out = chunk_windows_pipeline(ds, window=8, stride=4).to_pandas()
    assert len(out) == 1
    assert out["win_text"].iloc[0] == "x y"
    assert out["n_win_tokens"].iloc[0] == 2


def test_chunk_windows_block_invariant(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(rng.choice(list("abcdefgh"), size=n).tolist())
             for n in rng.integers(1, 40, size=50)]
    ds1 = _docs(texts)
    ds2 = _docs(texts).repartition(13)
    key = ["doc_id", "win_id"]
    a = (chunk_windows_pipeline(ds1, 5, 3).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (chunk_windows_pipeline(ds2, 5, 3).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_stop_filter(ray_session):
    ds = _docs(["the cat and the hat", "the a to", "cat hat"])
    out = (stop_filter_pipeline(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["clean_text"].tolist() == ["cat hat", "", "cat hat"]
    assert out["n_removed"].tolist() == [3, 3, 0]


def test_rep_stats_hand(ray_session):
    # "x y x y z": 5 words, 3 distinct -> dup_word_frac = 0.4;
    # 2-grams: xy yx xy yz -> top count 2 of 4 -> 0.5
    ds = _docs(["x y x y z", "a b c"])
    out = (rep_stats_pipeline(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["dup_word_frac"].tolist() == pytest.approx([0.4, 0.0])
    assert out["top_2gram_frac"].tolist() == pytest.approx([0.5, 0.5])


def test_df_counts(ray_session):
    ds = _docs(["a b a", "b c", "c c c"]).repartition(3)
    out = df_counts_pipeline(ds).to_pandas()
    got = dict(zip(out["word"], out["df"]))
    assert got == {"a": 1, "b": 2, "c": 2}


def test_grouped_topk_ties_and_blocks(ray_session):
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "key": rng.choice(["p", "q", "r"], size=n),
        # coarse scores force ties -> tiebreak must decide
        "score": rng.integers(0, 5, size=n).astype(float),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(9)
    out = (grouped_topk(ds, key="key", score="score", k=4, tiebreak="id")
           .to_pandas().sort_values(["key", "id"]).reset_index(drop=True))
    exp = (df.sort_values(["key", "score", "id"],
                          ascending=[True, False, True], kind="mergesort")
             .groupby("key").head(4)
             .sort_values(["key", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["key", "score", "id"]],
                                  exp[["key", "score", "id"]])

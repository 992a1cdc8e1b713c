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


def test_dsir_weights_ranks_target_like_docs(ray_session):
    """DSIR log importance weight: docs made of target-slice words
    must outrank docs of background-only words, and a doc drawn from
    both sits between."""
    import pandas as pd

    from kmerray.extras.text import dsir_weights
    tgt_words = "alpha beta gamma delta"
    bg_words = "uno dos tres cuatro"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [tgt_words, tgt_words, bg_words,
                 tgt_words + " " + bg_words],
        "lang": ["en", "en", "es", "es"],
    })
    out = (dsir_weights(ray.data.from_pandas(docs), target_lang="en")
           .to_pandas().set_index("doc_id")["logweight"])
    assert out[0] == out[1]                   # identical target docs
    assert out[0] > out[3] > out[2]           # target > mixed > bg-only
    # bg-only doc is exactly the add-one target floor vs the true
    # background probability: ln(1/T_t) - ln(c_b/T_b)
    # T_t = 8 (two en docs x 4 words), c_b = 2, T_b = 20
    want = np.log(1 / 8) - np.log(2 / 20)
    assert out[2] == np.round(want, 4)


def test_quality_filter_matches_rank_rule(ray_session):
    """quality_filter == 'top floor(kf*n) rows under ORDER BY
    (quality, doc_id)' recomputed directly; block/bucket invariance."""
    import numpy as np
    import pandas as pd

    from kmerray.extras.scan import quality_filter
    from kmerray.extras.text import quality_pipeline
    rng = np.random.default_rng(7)
    n = 400
    texts = [" ".join(rng.choice(["the", "and", "of", "xx", "yy", "zz"],
                                 size=rng.integers(5, 120)))
             for _ in range(n)]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})
    ds = ray.data.from_pandas(docs).repartition(7)
    got = set(quality_filter(ds, keep_frac=0.4, n_buckets=6)
              .to_pandas()["doc_id"])
    q = quality_pipeline(ds).to_pandas()
    q = q.sort_values(["quality", "doc_id"]).reset_index(drop=True)
    keep = int(np.floor(0.4 * n))
    want = set(q.iloc[n - keep:]["doc_id"].astype(np.int64))
    assert got == want
    got2 = set(quality_filter(ray.data.from_pandas(docs), keep_frac=0.4,
                              n_buckets=11).to_pandas()["doc_id"])
    assert got2 == want

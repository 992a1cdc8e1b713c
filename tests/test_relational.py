"""Distributed hash-join parity vs pandas merge (extras.relational).

The shuffle join is a composition of map_batches tagging + union +
groupby("jbucket").map_groups; these tests pin its semantics (inner
multiplicity, semi/anti row identity, schema stability under empty
buckets) against single-process pandas on adversarial key sets:
keys present on one side only, duplicated keys on both sides, and a
hot key with high multiplicity.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kmerray.extras.relational import (DimLookup, dim_arrays,
                                       shuffle_join)


def _mk(seed: int):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 40, size=200)
    lk[:30] = 7                      # hot key on the left
    rk = rng.integers(20, 60, size=120)  # half-overlapping key range
    rk[:10] = 7                      # hot key matches on the right
    left = pd.DataFrame({"k": lk.astype(np.int64),
                         "lv": np.arange(200, dtype=np.int64),
                         "ls": [f"l{i % 5}" for i in range(200)]})
    right = pd.DataFrame({"k": rk.astype(np.int64),
                          "rv": np.arange(120, dtype=np.int64) * 10})
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "semi", "anti"])
@pytest.mark.parametrize("n_buckets", [1, 8])
def test_shuffle_join_vs_pandas(ray_session, how, n_buckets):
    left, right = _mk(seed=3)
    lds = ray.data.from_pandas(left).repartition(7)
    rds = ray.data.from_pandas(right).repartition(5)
    got = _norm(shuffle_join(lds, rds, on="k", how=how,
                             n_buckets=n_buckets).to_pandas())
    if how == "inner":
        want = left.merge(right, on="k", how="inner")
    elif how == "semi":
        want = left[left["k"].isin(right["k"])]
    else:
        want = left[~left["k"].isin(right["k"])]
    want = _norm(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_shuffle_join_empty_right_keeps_schema(ray_session):
    left, right = _mk(seed=4)
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right.iloc[:0])
    out = shuffle_join(lds, rds, on="k", how="anti",
                       n_buckets=4).to_pandas()
    # all left rows survive; the string column must stay string even
    # though every bucket's right side is empty
    assert len(out) == len(left)
    assert out["ls"].dtype == object
    # inner join against the empty side yields zero rows (an all-empty
    # Dataset drops column info at to_pandas; row count is the contract)
    inner = shuffle_join(lds, rds, on="k", how="inner",
                         n_buckets=4).to_pandas()
    assert len(inner) == 0


def test_shuffle_join_column_clash(ray_session):
    left, right = _mk(seed=5)
    right = right.rename(columns={"rv": "lv"})
    with pytest.raises(ValueError, match="clash"):
        shuffle_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), on="k")


def test_dim_lookup(ray_session):
    dim = pa.table({"id": pa.array([5, 3, 9], pa.int64()),
                    "name": ["five", "three", "nine"]})
    keys, vals = dim_arrays(dim, "id", "name")
    assert list(keys) == [3, 5, 9]
    look = DimLookup((keys, vals), "id", "name")
    out = look(pa.table({"id": pa.array([9, 3, 3, 5], pa.int64())}))
    assert out.column("name").to_pylist() == ["nine", "three", "three",
                                              "five"]
    with pytest.raises(KeyError):
        look(pa.table({"id": pa.array([4], pa.int64())}))

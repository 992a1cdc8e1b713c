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


def _synth_tpch(seed=0, n_cust=40, n_orders=120, n_lines=400):
    rng = np.random.default_rng(seed)
    segs = np.array(["BUILDING", "MACHINERY", "AUTOMOBILE"], dtype=object)
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_mktsegment": segs[rng.integers(0, 3, n_cust)],
    })
    base = 880_000_000_000_000
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        # leave some customers orderless
        "o_custkey": rng.integers(0, n_cust - 5, n_orders).astype(np.int64),
        "o_orderdate": pd.to_datetime(
            base + rng.integers(0, 40_000_000_000_000, n_orders), unit="us"),
        "o_orderpriority": np.array(["1-URGENT", "3-MEDIUM"],
                                    dtype=object)[rng.integers(0, 2,
                                                               n_orders)],
        "o_totalprice": np.round(rng.uniform(100, 9000, n_orders), 2),
    })
    lines = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, n_lines).astype(np.int64),
        "l_extendedprice": np.round(rng.uniform(10, 2000, n_lines), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_lines), 2),
        "l_shipdate": pd.to_datetime(
            base + rng.integers(0, 45_000_000_000_000, n_lines), unit="us"),
    })
    return cust, orders, lines


def test_shipping_priority_vs_pandas(ray_session):
    from kmerray.extras.relational import shipping_priority
    cust, orders, lines = _synth_tpch()
    cutoff = 900_000_000_000_000
    out = shipping_priority(
        ray.data.from_pandas(cust), ray.data.from_pandas(orders),
        ray.data.from_pandas(lines), segment="BUILDING",
        cutoff_us=cutoff, k=5, n_buckets=8).to_pandas()
    # reference computation in plain pandas
    keys = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    o = orders[(orders["o_custkey"].isin(keys))
               & (orders["o_orderdate"].astype("int64") // 1000 < cutoff
                  if orders["o_orderdate"].dtype == "datetime64[ns]"
                  else orders["o_orderdate"].astype("int64") < cutoff)]
    li = lines[lines["l_shipdate"].values.astype("datetime64[us]")
               .astype(np.int64) > cutoff].copy()
    li["rev"] = (np.round(li["l_extendedprice"] * 100).astype(np.int64)
                 * (100 - np.round(li["l_discount"] * 100).astype(np.int64)))
    m = o.merge(li.groupby("l_orderkey", as_index=False)["rev"].sum(),
                left_on="o_orderkey", right_on="l_orderkey")
    m = m.sort_values(["rev", "o_orderkey"],
                      ascending=[False, True]).head(5)
    assert out["o_orderkey"].tolist() == m["o_orderkey"].tolist()
    assert out["revenue_e4"].tolist() == m["rev"].tolist()


def test_customer_order_rollup_left_outer(ray_session):
    from kmerray.extras.relational import customer_order_rollup
    cust, orders, _ = _synth_tpch(seed=7)
    out = (customer_order_rollup(ray.data.from_pandas(cust),
                                 ray.data.from_pandas(orders),
                                 n_buckets=8)
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert len(out) == len(cust)          # every customer survives
    exp_n = orders.groupby("o_custkey").size()
    for ck in [0, len(cust) - 1]:         # has-orders and orderless tails
        row = out[out["c_custkey"] == ck].iloc[0]
        assert row["n_orders"] == exp_n.get(ck, 0)
    cents = np.round(orders["o_totalprice"] * 100).astype(np.int64)
    assert out["sum_cents"].sum() == cents.sum()
    assert (out.loc[out["n_orders"] == 0, "sum_cents"] == 0).all()

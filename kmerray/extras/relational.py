"""Generic distributed relational operators: equi / semi / anti hash
joins and dimension lookups over Ray Data.

The reference engine has no relational layer (kmertools/src/main.rs
dispatches only comp/cov/ctr/min subcommands); these operators extend
the engine with the join surface a training-data pipeline needs —
fact x fact equi-joins, EXISTS / NOT EXISTS filtering, dimension
enrichment — expressed Ray-Data-first rather than as driver-side
pandas.

Scale design (100 TB):

- **fact x fact equi-join = ONE hash shuffle.** Both sides are tagged
  with ``jbucket = splitmix64(key) % B`` inside ``map_batches``
  (fused with the upstream read), null-padded to a shared schema,
  unioned, and a single ``groupby("jbucket").map_groups`` merges each
  co-partition with a vectorized pandas merge.  Nothing is broadcast,
  nothing is collected on the driver; ``n_buckets`` is the
  parallelism knob and should sit around 4x cluster cores at full
  scale so one bucket's pair of partitions fits a worker heap.
- **partial combiners run BEFORE the shuffle.**  The query helpers
  below pre-aggregate the fact side on the join key per batch
  (revenue per order, distinct keys per batch) so the bytes crossing
  the exchange are reduced rows, not raw lines.  This is also the
  skew story: power-law join keys collapse to one row per key per
  block before they are hashed, so no bucket sees a hot key's raw
  multiplicity from the big side.
- **dimension tables ride ``ray.put`` once** (sorted key + value
  arrays, ``searchsorted`` lookup inside an actor's ``__init__``)
  and are never re-shipped per batch.  Only genuinely fixed-size
  dimensions (nation: 25 rows at every TPC-H scale) use this path;
  anything that grows with SF (customer, orders) goes through the
  shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------

def _splitmix(keys: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full-avalanche so sequential keys
    (orderkey, custkey) spread uniformly over buckets."""
    x = keys.astype(np.uint64, copy=False)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_splitmix(keys) % np.uint64(n_buckets)).astype(np.int64)


# ---------------------------------------------------------------------------
# shuffle hash join
# ---------------------------------------------------------------------------

def _pad_side(ds, all_fields: list, on: str, side: int,
              n_buckets: int) -> "ray.data.Dataset":
    """Null-pad a side to the shared schema + (side, jbucket) tags.

    Padding columns are typed nulls so the union has one schema; the
    merge stage slices each side's own columns back out (all-valid),
    so no null ever reaches a pandas kernel."""
    names = [n for n, _ in all_fields]
    types = dict(all_fields)

    def tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = []
        for name in names:
            if name in b.column_names:
                cols.append(b.column(name))
            else:
                cols.append(pa.nulls(n, types[name]))
        keys = b.column(on).to_numpy().astype(np.int64, copy=False)
        cols.append(pa.array(np.full(n, side, dtype=np.int8)))
        cols.append(pa.array(_bucket_of(keys, n_buckets)))
        return pa.table(cols, names=names + ["side", "jbucket"])

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 on: str, how: str = "inner", n_buckets: int = 64,
                 left_fields: list | None = None,
                 right_fields: list | None = None) -> "ray.data.Dataset":
    """Co-partitioned hash join of two Datasets on an int64 key.

    ``how``: ``inner`` (left cols + right cols), ``semi`` (left rows
    with >=1 right match, left cols only), ``anti`` (left rows with
    no right match).  Inner join is a true equi-join: a left row
    matching m right rows emits m rows.

    One shuffle total: both sides are tagged with the same
    ``jbucket`` and unioned, so Ray's groupby moves each row exactly
    once and every bucket's merge is local and vectorized.  Column
    names must not collide (rename before joining).

    ``left_fields``/``right_fields``: [(name, pa.DataType), ...] —
    pass them when the side is a lazy transform chain so no
    schema-inference execution is triggered; inferred from
    ``ds.schema()`` otherwise.  Output schema is pinned explicitly so
    empty buckets cannot degrade a string column to ``null`` type.
    """
    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"how={how!r}")

    def _pa_type(t):
        # Dataset.schema().types yields numpy dtypes / `object` for
        # pandas-block datasets; normalize to Arrow.
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    def _fields(ds, given):
        if given is not None:
            return [(n, _pa_type(t)) for n, t in given]
        s = ds.schema()
        return [(n, _pa_type(t)) for n, t in zip(s.names, s.types)]

    lf = _fields(left, left_fields)
    rf = _fields(right, right_fields)
    lnames = [n for n, _ in lf]
    rnames = [n for n, _ in rf]
    clash = (set(lnames) & set(rnames)) - {on}
    if clash:
        raise ValueError(f"column clash: {sorted(clash)}")
    all_fields = lf + [(n, t) for n, t in rf if n != on]
    r_out = rnames if how == "inner" else [on]
    out_fields = all_fields if how == "inner" else lf
    out_schema = pa.schema(out_fields)

    tagged = _pad_side(left, all_fields, on, 0, n_buckets).union(
        _pad_side(right, all_fields, on, 1, n_buckets))

    def merge(g: pa.Table) -> pa.Table:
        is_l = pc.equal(g.column("side"), pa.scalar(0, pa.int8()))
        l = g.filter(is_l).select(lnames).to_pandas()
        r = g.filter(pc.invert(is_l)).select(r_out).to_pandas()
        if how == "inner":
            out = l.merge(r, on=on, how="inner")
        else:
            mask = l[on].isin(r[on].to_numpy())
            out = l[mask if how == "semi" else ~mask]
        return pa.Table.from_pandas(out[[f.name for f in out_schema]],
                                    schema=out_schema,
                                    preserve_index=False)

    return tagged.groupby("jbucket").map_groups(merge,
                                                batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dimension lookup (broadcast once per actor)
# ---------------------------------------------------------------------------

class DimLookup:
    """Actor-pool stage: enrich a fact stream with a dimension value.

    The dimension rides ``ray.put`` as (sorted int64 keys, values
    array) and is fetched ONCE per actor in ``__init__`` (plasma
    zero-copy on the node); ``__call__`` is a searchsorted gather.
    Missing keys raise — dimension joins in these pipelines are
    foreign-key complete by construction.
    """

    def __init__(self, dim_ref, key_col: str, out_col: str):
        keys, vals = (ray.get(dim_ref)
                      if isinstance(dim_ref, ray.ObjectRef) else dim_ref)
        self.keys = keys
        self.vals = vals
        self.key_col = key_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = batch.column(self.key_col).to_numpy().astype(np.int64,
                                                         copy=False)
        idx = np.searchsorted(self.keys, k)
        if np.any(idx >= len(self.keys)) or np.any(self.keys[idx] != k):
            raise KeyError(f"{self.key_col}: key missing from dimension")
        return batch.append_column(self.out_col, pa.array(self.vals[idx]))


def dim_arrays(table: pa.Table, key_col: str, val_col: str):
    """Sorted (keys, values) numpy pair for DimLookup, ready for
    ``ray.put``."""
    k = table.column(key_col).to_numpy().astype(np.int64)
    v = np.asarray(table.column(val_col).to_pylist()
                   if pa.types.is_string(table.schema.field(val_col).type)
                   else table.column(val_col).to_numpy())
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


# ---------------------------------------------------------------------------
# exact-money helpers (float sums are order-dependent; all query
# aggregates below are integer cents / basis-point products so the
# result is bit-identical regardless of block schedule — same trick
# as events.sum_cents)
# ---------------------------------------------------------------------------

def _cents(x: np.ndarray) -> np.ndarray:
    return np.round(x * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# query pipelines
# ---------------------------------------------------------------------------

def pricing_summary(lineitem: "ray.data.Dataset") -> "ray.data.Dataset":
    """TPC-H Q1-shaped rollup: per (returnflag, linestatus) exact
    sums.  Per-batch pandas partial -> tiny final groupby (the group
    domain is ~6 rows, so the shuffle moves a few rows per block)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        price_c = _cents(b["l_extendedprice"].to_numpy())
        disc_pct = _cents(b["l_discount"].to_numpy())  # 0.05 -> 5
        d = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": np.round(b["l_quantity"].to_numpy()).astype(np.int64),
            "sum_base_cents": price_c,
            "sum_disc_e4": price_c * (100 - disc_pct),
            "n_lines": np.ones(len(b), dtype=np.int64),
        })
        return d.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False).sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "l_linestatus"],
                         as_index=False).sum()

    return (lineitem.map_batches(partial, batch_format="pandas")
            .groupby(["l_returnflag", "l_linestatus"])
            .map_groups(final, batch_format="pandas"))


def revenue_by_nation(lineitem, orders, customer,
                      nation_tbl: pa.Table,
                      n_buckets: int = 64) -> "ray.data.Dataset":
    """Revenue per nation: lineitem |X| orders |X| customer |X|
    nation.  The two fact joins are co-partitioned shuffle joins with
    pre-shuffle combiners (lineitem collapses to one row per orderkey
    per block; the joined stream collapses to custkey partials per
    block); nation (25 rows at every TPC-H scale) is the only
    broadcast."""
    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        price_c = _cents(b["l_extendedprice"].to_numpy())
        disc_pct = _cents(b["l_discount"].to_numpy())
        d = pd.DataFrame({
            "o_orderkey": b["l_orderkey"].astype(np.int64),
            "revenue_e4": price_c * (100 - disc_pct),
            "n_lines": np.ones(len(b), dtype=np.int64),
        })
        return d.groupby("o_orderkey", as_index=False).sum()

    li = lineitem.map_batches(li_partial, batch_format="pandas")
    j1 = shuffle_join(
        li, orders, on="o_orderkey", how="inner", n_buckets=n_buckets,
        left_fields=[("o_orderkey", pa.int64()), ("revenue_e4", pa.int64()),
                     ("n_lines", pa.int64())],
        right_fields=[("o_orderkey", pa.int64()),
                      ("o_custkey", pa.int64())])

    def cust_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["o_custkey", "revenue_e4", "n_lines"]].rename(
            columns={"o_custkey": "c_custkey"})
        return d.groupby("c_custkey", as_index=False).sum()

    j1p = j1.map_batches(cust_partial, batch_format="pandas")
    j2 = shuffle_join(
        j1p, customer, on="c_custkey", how="inner", n_buckets=n_buckets,
        left_fields=[("c_custkey", pa.int64()), ("revenue_e4", pa.int64()),
                     ("n_lines", pa.int64())],
        right_fields=[("c_custkey", pa.int64()),
                      ("c_nationkey", pa.int32())])

    dim_ref = ray.put(dim_arrays(nation_tbl, "n_nationkey", "n_name"))

    def name_partial(b: pa.Table) -> pd.DataFrame:
        t = DimLookup(dim_ref, "c_nationkey", "n_name")(b).to_pandas()
        return (t[["n_name", "revenue_e4", "n_lines"]]
                .groupby("n_name", as_index=False).sum())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("n_name", as_index=False).sum()

    return (j2.map_batches(name_partial, batch_format="pyarrow")
            .groupby("n_name").map_groups(final, batch_format="pandas"))


def high_qty_order_priorities(orders, lineitem,
                              min_qty: float = 45.0,
                              n_buckets: int = 64) -> "ray.data.Dataset":
    """Orders having >=1 line with quantity >= min_qty, counted per
    priority (EXISTS semi-join).  The probe side sends only per-block
    distinct orderkeys through the shuffle."""
    def keys_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy()
        k = b.column("l_orderkey").to_numpy()[q >= min_qty]
        return pa.table({"o_orderkey": np.unique(k).astype(np.int64)})

    keys = lineitem.map_batches(keys_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    hits = shuffle_join(
        orders, keys, on="o_orderkey", how="semi", n_buckets=n_buckets,
        left_fields=[("o_orderkey", pa.int64()),
                     ("o_orderpriority", pa.string())],
        right_fields=[("o_orderkey", pa.int64())])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"o_orderpriority": b["o_orderpriority"],
                          "n_orders": np.ones(len(b), dtype=np.int64)})
        return d.groupby("o_orderpriority", as_index=False).sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderpriority", as_index=False).sum()

    return (hits.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority").map_groups(final,
                                                   batch_format="pandas"))


def customers_without_orders(customer, orders,
                             min_total: float = 400000.0,
                             n_buckets: int = 64) -> "ray.data.Dataset":
    """NOT EXISTS anti-join: customers that never placed an order of
    at least ``min_total``.  The orders side is filtered then reduced
    to per-block distinct custkeys before the shuffle."""
    def keys_partial(b: pa.Table) -> pa.Table:
        sel = b.column("o_totalprice").to_numpy() >= min_total
        k = b.column("o_custkey").to_numpy()[sel]
        return pa.table({"c_custkey": np.unique(k).astype(np.int64)})

    keys = orders.map_batches(keys_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return shuffle_join(
        customer, keys, on="c_custkey", how="anti", n_buckets=n_buckets,
        left_fields=[("c_custkey", pa.int64()),
                     ("c_mktsegment", pa.string())],
        right_fields=[("c_custkey", pa.int64())])


def shipping_priority(customer, orders, lineitem,
                      segment: str = "BUILDING",
                      cutoff_us: int = 896_659_200_000_000,  # 1998-06-01
                      k: int = 10,
                      n_buckets: int = 64) -> "ray.data.Dataset":
    """TPC-H Q3 shape: top-k unshipped orders by revenue for one
    market segment (orders placed before the cutoff, line items
    shipped after it) — the multi-join + aggregate + global top-k
    composition.

    Two exchanges, matching the two join keys:

    1. custkey: segment customers reduce to per-block distinct keys
       and SEMI-join the date-filtered orders (shuffle, not
       broadcast — the segment slice grows with SF);
    2. orderkey: lineitem revenue partials (filtered + pre-summed per
       block) union the surviving orders; each bucket merges to EXACT
       per-order revenue and keeps only its local top-k, so the final
       global re-rank sees <= k x n_buckets rows.

    Revenue rides as integer e4 (cents x (100 - discount_pct)) —
    order-independent, bit-exact vs the SQL oracle."""
    def cust_keys(b: pa.Table) -> pa.Table:
        sel = pc.equal(b.column("c_mktsegment"), segment)
        keys = b.filter(sel).column("c_custkey").to_numpy()
        return pa.table({"o_custkey": np.unique(keys).astype(np.int64)})

    keys = customer.map_batches(cust_keys, batch_format="pyarrow",
                                zero_copy_batch=True)

    def ord_filter(b: pa.Table) -> pa.Table:
        date_us = b.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64())
        t = b.filter(pc.less(date_us, cutoff_us))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_date_us": t.column("o_orderdate").cast(pa.timestamp("us"))
                          .cast(pa.int64()),
            "o_orderpriority": t.column("o_orderpriority"),
        })

    sel_orders = shuffle_join(
        orders.map_batches(ord_filter, batch_format="pyarrow",
                           zero_copy_batch=True),
        keys, on="o_custkey", how="semi", n_buckets=n_buckets,
        left_fields=[("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_date_us", pa.int64()),
                     ("o_orderpriority", pa.string())],
        right_fields=[("o_custkey", pa.int64())])

    def li_partial(b: pd.DataFrame) -> pa.Table:
        ship = b["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        b = b[ship > cutoff_us]
        price_c = _cents(b["l_extendedprice"].to_numpy())
        disc_pct = _cents(b["l_discount"].to_numpy())
        d = pd.DataFrame({"o_orderkey": b["l_orderkey"].astype(np.int64),
                          "revenue_e4": price_c * (100 - disc_pct)})
        agg = d.groupby("o_orderkey", as_index=False).sum()
        return pa.table({
            "o_orderkey": pa.array(agg["o_orderkey"].to_numpy(np.int64)),
            "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(np.int64)),
            "o_date_us": pa.nulls(len(agg), pa.int64()),
            "o_orderpriority": pa.nulls(len(agg), pa.string()),
            "side": pa.array(np.zeros(len(agg), dtype=np.int8)),
            "obucket": pa.array(_bucket_of(
                agg["o_orderkey"].to_numpy(np.int64), n_buckets)),
        })

    def ord_tag(b: pa.Table) -> pa.Table:
        keys_arr = b.column("o_orderkey").to_numpy().astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "revenue_e4": pa.nulls(b.num_rows, pa.int64()),
            "o_date_us": b.column("o_date_us"),
            "o_orderpriority": b.column("o_orderpriority"),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "obucket": pa.array(_bucket_of(keys_arr, n_buckets)),
        })

    tagged = lineitem.map_batches(li_partial, batch_format="pandas").union(
        sel_orders.select_columns(
            ["o_orderkey", "o_date_us", "o_orderpriority"])
        .map_batches(ord_tag, batch_format="pyarrow", zero_copy_batch=True))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["o_orderkey"].to_numpy(),
                            -df["revenue_e4"].to_numpy()))
        return df.iloc[order[:k]].reset_index(drop=True)

    def merge(g: pa.Table) -> pd.DataFrame:
        is_li = pc.equal(g.column("side"), pa.scalar(0, pa.int8()))
        li = g.filter(is_li).select(["o_orderkey", "revenue_e4"]) \
            .to_pandas().groupby("o_orderkey", as_index=False).sum()
        od = g.filter(pc.invert(is_li)).select(
            ["o_orderkey", "o_date_us", "o_orderpriority"]).to_pandas()
        return topk(od.merge(li, on="o_orderkey", how="inner"))

    local = tagged.groupby("obucket").map_groups(merge,
                                                 batch_format="pyarrow")
    return local.repartition(1).map_batches(topk, batch_format="pandas")


def customer_order_rollup(customer, orders,
                          n_buckets: int = 64) -> "ray.data.Dataset":
    """LEFT OUTER join shape: every customer with order count and
    exact total cents — zero for customers who never ordered.  ONE
    custkey-bucketed exchange: order partials (pre-summed per block)
    union the customer rows; each bucket aggregates its partials and
    left-merges, so no driver state and nothing broadcast."""
    def ord_partial(b: pd.DataFrame) -> pa.Table:
        d = pd.DataFrame({
            "c_custkey": b["o_custkey"].astype(np.int64),
            "n_part": np.ones(len(b), dtype=np.int64),
            "cents_part": _cents(b["o_totalprice"].to_numpy()),
        })
        agg = d.groupby("c_custkey", as_index=False).sum()
        return pa.table({
            "c_custkey": pa.array(agg["c_custkey"].to_numpy(np.int64)),
            "c_mktsegment": pa.nulls(len(agg), pa.string()),
            "n_part": pa.array(agg["n_part"].to_numpy(np.int64)),
            "cents_part": pa.array(agg["cents_part"].to_numpy(np.int64)),
            "side": pa.array(np.zeros(len(agg), dtype=np.int8)),
            "cbucket": pa.array(_bucket_of(
                agg["c_custkey"].to_numpy(np.int64), n_buckets)),
        })

    def cust_tag(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_mktsegment": b.column("c_mktsegment"),
            "n_part": pa.nulls(b.num_rows, pa.int64()),
            "cents_part": pa.nulls(b.num_rows, pa.int64()),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "cbucket": pa.array(_bucket_of(keys, n_buckets)),
        })

    tagged = orders.map_batches(ord_partial, batch_format="pandas").union(
        customer.map_batches(cust_tag, batch_format="pyarrow",
                             zero_copy_batch=True))

    def merge(g: pa.Table) -> pd.DataFrame:
        is_ord = pc.equal(g.column("side"), pa.scalar(0, pa.int8()))
        o = g.filter(is_ord).select(["c_custkey", "n_part", "cents_part"]) \
            .to_pandas().groupby("c_custkey", as_index=False).sum()
        c = g.filter(pc.invert(is_ord)).select(
            ["c_custkey", "c_mktsegment"]).to_pandas()
        m = c.merge(o, on="c_custkey", how="left")
        return pd.DataFrame({
            "c_custkey": m["c_custkey"].astype(np.int64),
            "c_mktsegment": m["c_mktsegment"],
            "n_orders": m["n_part"].fillna(0).astype(np.int64),
            "sum_cents": m["cents_part"].fillna(0).astype(np.int64),
        })

    return tagged.groupby("cbucket").map_groups(merge,
                                                batch_format="pyarrow")

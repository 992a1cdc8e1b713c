"""Single-pass data-quality profiling (the Deequ/Great-Expectations
validation step a production pipeline runs before training): per
column, non-null count, null count, min and max, computed from
per-block partials merged on the driver.

Scale design: ONE streaming pass, no shuffle — each block contributes
an O(columns x metrics) partial row set (sum-mergeable counts,
min/max-mergeable extrema), the driver folds O(blocks x columns x 4)
scalars.  At 100 TB the driver never sees data, only the partials.

Exactness contract (mirrored by the SQL oracle):
- int64 / timestamp extrema are emitted through one int64->double
  conversion (IEEE-defined, identical in numpy and DuckDB even above
  2^53); timestamps profile as epoch microseconds;
- double extrema involve no arithmetic (pure comparisons);
- string extrema are byte/codepoint order, identical across engines
  on ASCII data (DuckDB default collation is binary);
- profiled columns must have at least one non-null value (holds for
  the events table; an all-null column would need a NULL-extremum
  convention this op does not define).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

# (column -> kind) for the events table; kinds: int, ts, num, str
EVENTS_PROFILE_COLS = {
    "event_id": "int", "ts": "ts", "user_id": "int",
    "event_type": "str", "value": "num", "props": "str",
}


def data_profile(ds: "ray.data.Dataset",
                 cols: dict[str, str] = EVENTS_PROFILE_COLS
                 ) -> "ray.data.Dataset":
    """Output: ``(col, metric, val_num:double, val_str:string)``
    with metrics ``n_nonnull, n_null, min, max`` per profiled column
    (string columns carry extrema in ``val_str`` with val_num 0.0)."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        out_c, out_m, out_n, out_s = [], [], [], []

        def emit(c, m, vn=0.0, vs=""):
            out_c.append(c); out_m.append(m)
            out_n.append(float(vn)); out_s.append(vs)

        for c, kind in cols.items():
            s = b[c]
            nn = int(s.notna().sum())
            emit(c, "n_nonnull", nn)
            emit(c, "n_null", len(s) - nn)
            if nn == 0:
                continue
            if kind == "ts":
                v = s.dropna().to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                emit(c, "min", float(v.min()))
                emit(c, "max", float(v.max()))
            elif kind in ("int", "num"):
                v = s.dropna().to_numpy()
                emit(c, "min", float(v.min()))
                emit(c, "max", float(v.max()))
            else:
                v = s.dropna()
                emit(c, "min", 0.0, v.min())
                emit(c, "max", 0.0, v.max())
        return pd.DataFrame({"col": out_c, "metric": out_m,
                             "val_num": out_n, "val_str": out_s})

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    rows = []
    for (c, m), g in parts.groupby(["col", "metric"], sort=True):
        if m in ("n_nonnull", "n_null"):
            rows.append((c, m, float(g["val_num"].sum()), ""))
        elif cols[c] == "str":
            f = min if m == "min" else max
            rows.append((c, m, 0.0, f(g["val_str"])))
        else:
            f = np.min if m == "min" else np.max
            rows.append((c, m, float(f(g["val_num"].to_numpy())), ""))
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["col", "metric", "val_num", "val_str"]))

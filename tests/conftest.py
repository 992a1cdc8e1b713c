import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray
    from ray.data import DataContext
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    """A small deterministic sequences corpus shared across tests."""
    from kmerray.sources.synth import ensure_sequences
    root = str(tmp_path_factory.mktemp("seqdata"))
    os.environ.setdefault("KMERRAY_TEST_CACHE", root)
    return ensure_sequences("sf-test", n_docs=1000, tag="pytest-tiny2", n_files=4)

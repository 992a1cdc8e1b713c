"""CFV kernel tests from the reference's oligo unit tests
(/root/reference/composition/src/oligo.rs:269-309)."""

import numpy as np

from kmerray.core.encoding import tokens_from_str
from kmerray.core.oligo import cfv_batch, cfv_header, cfv_width


def one_row(seq):
    t = tokens_from_str(seq)
    return t, np.array([0, len(t)], dtype=np.int64)


def test_raw_counts():
    v, off = one_row("AAAANGAGA")
    mat = cfv_batch(v, off, 4, canonical=False, norm=False)
    assert mat.shape == (1, 256)
    hdr = cfv_header(4, canonical=False)
    assert hdr[0] == "AAAA" and hdr[-1] == "TTTT"
    assert len(hdr) == 256


def test_norm():
    v, off = one_row("AAAANGAGA")
    mat = cfv_batch(v, off, 4, canonical=True, norm=True)
    assert mat[0, 0] == 0.5


def test_unnorm():
    v, off = one_row("AAAANGAGA")
    mat = cfv_batch(v, off, 4, canonical=True, norm=False)
    assert mat[0, 0] == 1.0
    assert mat.sum() == 2.0


def test_all_ambiguous_zero_vector():
    # norm divides by max(1, total): all-N row -> zeros, not NaN
    # (/root/reference/composition/src/oligo.rs:256)
    v = np.array([4, 4, 4, 4, 4], dtype=np.int32)
    off = np.array([0, 5], dtype=np.int64)
    mat = cfv_batch(v, off, 4, canonical=True, norm=True)
    assert (mat == 0).all()


def test_header_canonical_width():
    assert cfv_width(4) == 136
    assert len(cfv_header(4)) == 136


def test_batch_equals_per_row():
    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 5, size=rng.integers(0, 40)).astype(np.int32)
            for _ in range(50)]
    values = np.concatenate([r for r in rows]) if rows else np.empty(0)
    offsets = np.concatenate([[0], np.cumsum([len(r) for r in rows])])
    batch = cfv_batch(values, offsets.astype(np.int64), 4)
    for i, r in enumerate(rows):
        single = cfv_batch(r, np.array([0, len(r)], dtype=np.int64), 4)
        assert np.array_equal(batch[i], single[0])

"""CGR kernel tests from the reference
(/root/reference/composition/src/cgr.rs:154-187,
/root/reference/composition/src/oligocgr.rs:199-220) — exact float
equality: the recurrence order is identical."""

import numpy as np
import pytest

from kmerray.core.cgr import cgr_batch, oligo_cgr_points
from kmerray.core.encoding import tokens_from_str
from kmerray.core.oligo import cfv_batch

EXPECTED_23 = [
    (0.25, 0.25), (0.625, 0.125), (0.8125, 0.5625), (0.40625, 0.28125),
    (0.703125, 0.140625), (0.8515625, 0.5703125), (0.42578125, 0.28515625),
    (0.212890625, 0.142578125), (0.1064453125, 0.0712890625),
    (0.55322265625, 0.03564453125), (0.276611328125, 0.017822265625),
    (0.6383056640625, 0.5089111328125), (0.31915283203125, 0.25445556640625),
    (0.659576416015625, 0.627227783203125),
    (0.3297882080078125, 0.3136138916015625),
    (0.6648941040039062, 0.6568069458007812),
    (0.3324470520019531, 0.3284034729003906),
    (0.16622352600097656, 0.6642017364501953),
    (0.5831117630004883, 0.33210086822509766),
    (0.7915558815002441, 0.16605043411254883),
    (0.8957779407501221, 0.08302521705627441),
    (0.44788897037506104, 0.04151260852813721),
    (0.7239444851875305, 0.020756304264068604),
]


def test_cgr_exact_walk():
    t = tokens_from_str("atgatgaaatagagagactttat")
    off = np.array([0, len(t)], dtype=np.int64)
    xs, ys, valid = cgr_batch(t, off, vecsize=1.0)
    assert valid.all()
    got = list(zip(xs.tolist(), ys.tolist()))
    assert got == EXPECTED_23


def test_cgr_strict_errors_on_ambiguous():
    t = tokens_from_str("ACGNT")
    off = np.array([0, len(t)], dtype=np.int64)
    with pytest.raises(ValueError):
        cgr_batch(t, off, strict=True)
    xs, ys, valid = cgr_batch(t, off, strict=False)
    assert not valid[0]
    assert np.isnan(xs).all()


def test_cgr_multi_row_matches_single():
    seqs = ["atgatgaaatagagagactttat", "acgt", "ttttt"]
    toks = [tokens_from_str(s) for s in seqs]
    values = np.concatenate(toks)
    offsets = np.concatenate([[0], np.cumsum([len(t) for t in toks])]
                             ).astype(np.int64)
    xs, ys, valid = cgr_batch(values, offsets)
    assert valid.all()
    o = 0
    for s in seqs:
        t = tokens_from_str(s)
        off1 = np.array([0, len(t)], dtype=np.int64)
        x1, y1, _ = cgr_batch(t, off1)
        assert np.array_equal(xs[o:o + len(t)], x1)
        assert np.array_equal(ys[o:o + len(t)], y1)
        o += len(t)


def test_oligo_cgr():
    # oligocgr.rs:199-220: k=4 vecsize=16, first canonical kmer AAAA
    # walks to (0.5, 0.5); freq of AAAA in the 29-base read = 1/26
    xs, ys = oligo_cgr_points(4, 16.0)
    assert xs[0] == 0.5 and ys[0] == 0.5
    t = tokens_from_str("aaaatgatgaaatagagagactttattaa")
    off = np.array([0, len(t)], dtype=np.int64)
    freqs = cfv_batch(t, off, 4, canonical=True, norm=True)
    assert freqs[0, 0] == 1.0 / 26.0
    un = cfv_batch(t, off, 4, canonical=True, norm=False)
    assert un[0, 0] == 1.0

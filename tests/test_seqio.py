"""FASTA/FASTQ adapter vs the reference's own test reads
(/root/reference/test_data/reads.{fa,fq,fq.gz}) end-to-end through the
CFV pipeline."""

import os

import numpy as np
import pandas as pd
import pytest

import ray

from kmerray.core.encoding import tokens_from_str
from kmerray.sources.seqio import parse_payload, read_seq_files

REF = "/root/reference/test_data"
READ_1 = ("GGGTGATGGCCGCTGCCGATGGCGTCAAATCCCACCAAGTTACCCTTAACAACTTAAGGG"
          "TTTTCAAATAGA")
READ_2 = ("GTTCAGGGATACGACGTTTGTATTTTAAGAATCTGAAGCAGAAGTCGATGATAATACGCG"
          "TCGTTTTATCAT")

pytestmark = pytest.mark.skipif(not os.path.exists(f"{REF}/reads.fq"),
                                reason="reference test data unavailable")


def _tokens(table):
    col = table.column("tokens").combine_chunks()
    off = col.offsets.to_numpy().astype(np.int64)
    vals = col.values.to_numpy()
    return [vals[off[i]:off[i + 1]].tolist() for i in range(len(off) - 1)]


def test_parse_fastq_matches_embedded():
    t = parse_payload(open(f"{REF}/reads.fq", "rb").read())
    assert t.column("doc_id").to_pylist() == ["Read_1", "Read_2"]
    assert _tokens(t) == [tokens_from_str(READ_1).tolist(),
                          tokens_from_str(READ_2).tolist()]


def test_parse_fasta_multiline_and_gzip_match():
    fa = parse_payload(open(f"{REF}/reads.fa", "rb").read())
    gz = parse_payload(open(f"{REF}/reads.fq.gz", "rb").read())
    # reads.fa Record_2 spans two lines -> must join to the same tokens
    assert _tokens(fa) == _tokens(gz)
    assert fa.column("n_tok").to_pylist() == [72, 72]
    assert fa.column("doc_id").to_pylist() == ["Record_1", "Record_2"]


def test_read_seq_files_through_cfv(ray_session):
    from kmerray.core.oligo import cfv_batch
    from kmerray.pipelines.comp import cfv_pipeline
    ds = read_seq_files([f"{REF}/reads.fq"])
    out = cfv_pipeline(ds, k=4).take_all()
    assert [r["doc_id"] for r in out] == ["Read_1", "Read_2"]
    toks = tokens_from_str(READ_1)
    want = cfv_batch(toks, np.array([0, len(toks)]), 4)[0]
    assert np.array_equal(np.asarray(out[0]["cfv"]), want)


def test_sniff_rejects_garbage():
    with pytest.raises(ValueError):
        parse_payload(b"not a sequence file")


def _collect_sorted(ds):
    import pandas as pd
    df = ds.to_pandas()
    df["tokens"] = df["tokens"].map(tuple)
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("name", ["reads.fa", "reads.fq"])
def test_within_file_split_golden(ray_session, name):
    """Chunked parse == whole-file parse on the reference test files
    (VERDICT r2 missing #3)."""
    import os
    path = f"/root/reference/test_data/{name}"
    if not os.path.exists(path):
        pytest.skip("reference test_data unavailable")
    from kmerray.sources.seqio import read_seq_files
    whole = _collect_sorted(read_seq_files(path))
    split = _collect_sorted(read_seq_files(path, split_target_bytes=40))
    pd.testing.assert_frame_equal(whole, split)


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
def test_within_file_split_synthetic(ray_session, tmp_path, fmt):
    """A single multi-record file fans out across many byte-range
    chunks and reproduces the unsplit parse exactly — including
    records straddling every chunk boundary."""
    rng = np.random.default_rng(11)
    recs = []
    for i in range(200):
        seq = "".join(rng.choice(list("ACGTacgtN"),
                                 size=rng.integers(10, 120)))
        if fmt == "fasta":
            # multi-line bodies exercise the '\n>' scan
            recs.append(f">rec{i:04d} extra meta\n{seq[:37]}\n{seq[37:]}\n")
        else:
            # '@' leading quality chars exercise the frame rule
            qual = "@" * len(seq)
            recs.append(f"@rec{i:04d}\n{seq}\n+\n{qual}\n")
    path = str(tmp_path / f"big.{fmt}")
    with open(path, "w") as fh:
        fh.write("".join(recs))
    from kmerray.sources.seqio import read_seq_files
    whole = _collect_sorted(read_seq_files(path,
                                           split_target_bytes=10**9))
    for target in (64, 257, 1000):
        split = _collect_sorted(read_seq_files(path,
                                               split_target_bytes=target))
        pd.testing.assert_frame_equal(whole, split)

"""CLI mirroring the reference's subcommands
(/root/reference/kmertools/src/args.rs:239-368) over Parquet in/out:

  python -m kmerray comp  -i SEQS -o OUT -k 4 [--raw] [--no-norm] [--preset oligo|cgr|oligocgr]
  python -m kmerray ctr   -i SEQS -o OUT -k 15 [--acgt]
  python -m kmerray cov   -i SEQS -o OUTDIR -k 15 --bin-size 4 --bin-count 8 [--alt-input ALT]
  python -m kmerray min   -i SEQS -o OUT -m 10 -w 0 --preset s2m|m2s
  python -m kmerray asof  -i SEQS -o OUTDIR -k 8 --bin-size 2 --bin-count 4

Inputs are sequences-table Parquet files/dirs (input_hint schema).
Owns its Ray session (guarded — the driver contract forbids init only
inside the library/queries path).
"""

from __future__ import annotations

import argparse
import sys


def _ranged(lo: int, hi: int, name: str):
    """Reference-CLI-parity range validation (clap value_parser ranges,
    /root/reference/kmertools/src/args.rs:85,148,188,219) — reject at
    argparse time instead of failing later in a kernel."""
    def parse(v: str) -> int:
        iv = int(v)
        if not (lo <= iv <= hi):
            raise argparse.ArgumentTypeError(
                f"{name} must be in {lo}..={hi}")
        return iv
    return parse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kmerray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("-i", "--input", required=True)
        sp.add_argument("-o", "--output", required=True)
        sp.add_argument("--resume", action="store_true",
                        help="checkpointed per-partition run")
        sp.add_argument("--partitions", type=int, default=8)

    comp = sub.add_parser("comp", help="composition vectors (CFV/CGR)")
    common(comp)
    comp.add_argument("-k", "--ksize", type=_ranged(3, 7, "oligo k"),
                  default=4)
    comp.add_argument("--preset", default="oligo",
                      choices=["oligo", "cgr", "oligocgr"])
    comp.add_argument("--raw", action="store_true",
                      help="raw forward counts (non-canonical)")
    comp.add_argument("--no-norm", action="store_true")
    comp.add_argument("--vecsize", type=float, default=None)

    ctr = sub.add_parser("ctr", help="global k-mer counting")
    common(ctr)
    ctr.add_argument("-k", "--ksize", type=_ranged(10, 31, "ctr k"),
                 default=15)
    ctr.add_argument("--acgt", action="store_true")

    cov = sub.add_parser("cov", help="coverage histograms")
    common(cov)
    cov.add_argument("-k", "--ksize", type=_ranged(7, 31, "cov k"),
                 default=15)
    cov.add_argument("--bin-size", type=int, default=16)
    cov.add_argument("--bin-count", type=int, default=16)
    cov.add_argument("--alt-input", default=None,
                     help="build the dictionary from this input instead")
    cov.add_argument("--no-norm", action="store_true")

    mn = sub.add_parser("min", help="minimizers")
    common(mn)
    mn.add_argument("-m", "--msize", type=_ranged(7, 28, "minimizer m"),
                default=10)
    mn.add_argument("-w", "--wsize", type=int, default=0)
    mn.add_argument("--preset", default="s2m", choices=["s2m", "m2s"])

    asof = sub.add_parser("asof", help="point-in-time coverage features")
    common(asof)
    asof.add_argument("-k", "--ksize", type=_ranged(1, 28, "asof k"),
                  default=8)
    asof.add_argument("--bin-size", type=int, default=2)
    asof.add_argument("--bin-count", type=int, default=4)

    tok = sub.add_parser(
        "tokenize",
        help="FASTA/FASTQ(.gz) -> sequences-table Parquet "
             "(ktio/src/seq.rs parity; feeds every other subcommand)")
    tok.add_argument("-i", "--input", required=True, nargs="+",
                     help="FASTA/FASTQ file(s) or directory, or '-' "
                          "for stdin (ktio/src/seq.rs:141-155 parity)")
    tok.add_argument("-o", "--output", required=True)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "tokenize":
        import ray
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from .sources.seqio import parse_payload, read_seq_files
        if args.input == ["-"]:
            # stdin streaming parity (ktio/src/seq.rs:141-155): parse
            # the piped payload on the driver (it arrived here anyway)
            # and hand Ray the finished Arrow table
            table = parse_payload(sys.stdin.buffer.read())
            ray.data.from_arrow(table).write_parquet(args.output)
            return 0
        if "-" in args.input:
            raise SystemExit("'-' (stdin) cannot be mixed with paths")
        paths = args.input if len(args.input) > 1 else args.input[0]
        read_seq_files(paths).write_parquet(args.output)
        return 0

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import glob
    import os

    import numpy as np
    import pyarrow as pa

    from .pipelines.comp import (cfv_pipeline, cgr_pipeline,
                                 oligo_cgr_pipeline, read_sequences)
    from .pipelines.counter import add_acgt_column, count_kmers
    from .pipelines.cov import coverage_pipeline
    from .pipelines.minpipe import m2s_pipeline, s2m_pipeline
    from .runtime.checkpoint import run_partitioned

    def input_files():
        if os.path.isdir(args.input):
            return sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        return [args.input]

    def run(pipeline_fn):
        if args.resume:
            rep = run_partitioned(pipeline_fn, input_files(), args.output,
                                  n_partitions=args.partitions,
                                  params={k: v for k, v in vars(args).items()
                                          if k not in ("input", "output")})
            print(f"completed={rep.completed} skipped={rep.skipped}")
        else:
            pipeline_fn(read_sequences(args.input)).write_parquet(args.output)
        return 0

    if args.cmd == "comp":
        if args.preset == "oligo":
            return run(lambda ds: cfv_pipeline(
                ds, k=args.ksize, canonical=not args.raw,
                norm=not args.no_norm))
        if args.preset == "cgr":
            return run(lambda ds: cgr_pipeline(
                ds, vecsize=args.vecsize or 1.0))
        return run(lambda ds: oligo_cgr_pipeline(
            ds, k=args.ksize, vecsize=args.vecsize,
            norm=not args.no_norm))

    if args.cmd == "ctr":
        def ctr_pipe(ds):
            out = count_kmers(ds, args.ksize)
            return add_acgt_column(out, args.ksize) if args.acgt else out
        return run(ctr_pipe)

    if args.cmd == "cov":
        dict_input = args.alt_input or args.input
        counts_dir = os.path.join(args.output, "kmer_counts")
        count_kmers(read_sequences(dict_input),
                    args.ksize).write_parquet(counts_dir)
        scored = coverage_pipeline(
            read_sequences(args.input), counts_dir, args.ksize,
            args.bin_size, args.bin_count, norm=not args.no_norm,
            concurrency=4)
        scored.write_parquet(os.path.join(args.output, "vectors"))
        return 0

    if args.cmd == "min":
        if args.preset == "s2m":
            return run(lambda ds: s2m_pipeline(ds, args.wsize, args.msize))
        return run(lambda ds: m2s_pipeline(ds, args.wsize, args.msize))

    if args.cmd == "asof":
        from .pipelines.asof import (asof_coverage_pipeline,
                                     load_snapshot_index, snapshot_counts)
        ds = read_sequences(args.input)
        snap_dir = os.path.join(args.output, "snapshots")
        snapshot_counts(ds, args.ksize).write_parquet(snap_dir)
        ref = ray.put(load_snapshot_index(snap_dir))
        scored = asof_coverage_pipeline(ds, ref, args.ksize, args.bin_size,
                                        args.bin_count, concurrency=4)
        scored.write_parquet(os.path.join(args.output, "vectors"))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

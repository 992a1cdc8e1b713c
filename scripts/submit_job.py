"""Cluster submission entry point (``ray job submit`` form).

On a real fixed-size cluster the pipelines here run unchanged — the
code never assumes locality; only this submission wrapper differs from
the sandbox (which is single-node local mode, so this script is
documentation-grade: exercised logic is the same `run()` the CLI and
tests drive).

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python scripts/submit_job.py \
        --input s3://bucket/sequences --output s3://bucket/features \
        --pipeline cfv -k 4 --partitions 4096 --resume

Scale knobs for a 256-node run (per BASELINE.json's N vs 4N rule):
the same job at both cluster sizes, same input; per-stage
``concurrency``/``num_cpus`` scale with ``ray.cluster_resources()``,
partition count with the input fragment count — nothing else changes.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--pipeline", default="cfv",
                   choices=["cfv", "ctr", "cov", "min", "asof"])
    p.add_argument("-k", "--ksize", type=int, default=4)
    p.add_argument("--partitions", type=int, default=256)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init()  # inside `ray job submit` this attaches to the cluster

    import glob
    import os

    from kmerray.pipelines.comp import cfv_pipeline
    from kmerray.runtime.checkpoint import run_partitioned

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet"))) \
        if os.path.isdir(args.input) else [args.input]

    if args.pipeline == "cfv":
        rep = run_partitioned(
            lambda ds: cfv_pipeline(ds, k=args.ksize), files, args.output,
            n_partitions=args.partitions,
            params={"pipeline": "cfv", "k": args.ksize},
            resume=args.resume)
        print(f"completed={len(rep.completed)} skipped={len(rep.skipped)}")
        return 0
    # other pipelines route through the same CLI implementations
    from kmerray.__main__ import main as cli_main
    return cli_main([args.pipeline, "-i", args.input, "-o", args.output,
                     "-k", str(args.ksize)])


if __name__ == "__main__":
    sys.exit(main())

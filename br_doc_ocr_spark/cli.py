"""spark-submit entry points (the reference's Typer CLI surface,
``cli/main.py:78-276``, rebuilt as Spark jobs).

Cluster usage (the north rule's packaging contract):

    zip -r brdoc.zip br_doc_ocr_spark
    spark-submit --py-files brdoc.zip -m br_doc_ocr_spark.cli ...

or locally:

    python -m br_doc_ocr_spark.cli extract --input t.parquet --output out/ \
        --lineage lineage/ --salt 8
    python -m br_doc_ocr_spark.cli resume  --input t.parquet --output out/ \
        --manifest m.json --buckets 64
    python -m br_doc_ocr_spark.cli synth   --turns 1000000 --output t.parquet

On a real cluster drop ``--cpus`` and let ``spark-submit --num-executors``
govern parallelism — the session builder only forces ``local[N]`` when no
master is configured.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    from pyspark.sql import SparkSession

    from br_doc_ocr_spark.session import build_session

    active = SparkSession.getActiveSession()
    if active is not None:  # under spark-submit with a configured master
        return active
    return build_session(cpus=args.cpus)


def cmd_extract(args) -> int:
    from pyspark.sql import functions as sf

    from br_doc_ocr_spark.pipeline import run_pipeline

    spark = _session(args)
    ordered, _ = run_pipeline(
        spark, args.input, output_path=args.output,
        lineage_path=args.lineage, salt=args.salt, run_id=args.run_id)
    summary = {r["status"]: r["n"] for r in
               ordered.groupBy("status").agg(sf.count("*").alias("n")).collect()}
    print(json.dumps({"output": args.output, "status_counts": summary}))
    return 0


def cmd_resume(args) -> int:
    from br_doc_ocr_spark.checkpoint import run_resumable

    spark = _session(args)
    summary = run_resumable(
        spark, args.input, args.output, args.manifest,
        lineage_path=args.lineage, n_buckets=args.buckets,
        run_id=args.run_id, salt=args.salt,
        max_buckets_per_snapshot=args.max_buckets)
    print(json.dumps(summary))
    return 0


def cmd_synth(args) -> int:
    from br_doc_ocr_spark.synth import make_transcripts_spark

    spark = _session(args)
    make_transcripts_spark(spark, args.turns, max(args.turns // 200, 16)) \
        .write.mode("overwrite").parquet(args.output)
    print(json.dumps({"output": args.output, "turns": args.turns}))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="br-doc-ocr-spark")
    parser.add_argument("--cpus", type=int, default=None,
                        help="local[N] when no master configured")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="one-shot extraction job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage")
    p.add_argument("--salt", type=int, default=8)
    p.add_argument("--run-id", default="run-0")
    p.set_defaults(func=cmd_extract)

    p = sub.add_parser("resume", help="manifest-checkpointed resumable job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--lineage")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--salt", type=int, default=8)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--max-buckets", type=int, default=None,
                   help="bound one invocation's snapshot size")
    p.set_defaults(func=cmd_resume)

    p = sub.add_parser("synth", help="generate synthetic transcripts")
    p.add_argument("--turns", type=int, required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(func=cmd_synth)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())

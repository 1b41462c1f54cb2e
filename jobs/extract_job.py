#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline.

Cluster:
    zip -r pdf_toolkit_spark.zip pdf_toolkit_spark/
    spark-submit --py-files pdf_toolkit_spark.zip jobs/extract_job.py \
        --input  s3://bucket/documents_raw/ \
        --output s3://bucket/extracted/ \
        --config extraction.yaml --run-id run42

Local smoke:
    python jobs/extract_job.py --gen-docs 200 --output /tmp/out

The job is checkpoint-resumable: rerunning with the same --output
anti-joins committed doc_ids and processes only the remainder
(SURVEY.md §2.2 P4). --dry-run prints the physical plan and writes
nothing (reference dry-run semantics, utils.py:39-49).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import uuid
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Distributed PDF span extraction")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir with (doc_id, pdf_bytes, n_pages)")
    src.add_argument("--gen-docs", type=int, help="generate a synthetic corpus of N docs instead")
    ap.add_argument("--output", required=True, help="output root (spans/, lineage/, metrics/)")
    ap.add_argument("--config", help="YAML config file (defaults < yaml < flags)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--mode", choices=["auto", "split", "crop"], default=None)
    ap.add_argument("--pages-per-chunk", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (local mode only)")
    args = ap.parse_args(argv)

    from pdf_toolkit_spark.config import effective_config, load_yaml
    from pdf_toolkit_spark.errors import UserError
    from pdf_toolkit_spark.spark.input import corpus_dataframe, read_documents_raw
    from pdf_toolkit_spark.spark.job import run_extraction
    from pdf_toolkit_spark.spark.session import get_spark

    overrides = {}
    if args.mode:
        overrides["mode"] = args.mode
    if args.pages_per_chunk:
        overrides["pages_per_chunk"] = args.pages_per_chunk
    if args.dry_run:
        overrides["dry_run"] = True

    try:
        yaml_cfg = load_yaml(Path(args.config)) if args.config else None
        cfg = effective_config(yaml_cfg, overrides)
    except UserError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="pdf-toolkit-extract", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.input:
            input_df = read_documents_raw(spark, args.input)
        else:
            input_df = corpus_dataframe(spark, args.gen_docs)
        result = run_extraction(
            spark,
            input_df,
            cfg,
            out_dir=args.output,
            run_id=args.run_id or f"run-{uuid.uuid4().hex[:8]}",
            resume=not args.no_resume,
            # Reconstructed invocation, recorded in the metrics table
            # (reference manifest 'command', cli.py:434-438).
            command=subprocess.list2cmdline(
                ["extract_job.py", *(argv if argv is not None else sys.argv[1:])]
            ),
        )
    except UserError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    finally:
        spark.stop()

    print(json.dumps(result.metrics, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""spark-submit entry point for the data-curation pipeline — the CLI
form of ops/curation.curate_survivors: run every curation gate (C4
quality, Gopher repetition, benchmark decontamination, exact dedup)
over a documents table and write the surviving (doc_id, n_tokens)
relation plus per-gate drop counts.

Cluster:
    spark-submit --py-files pdf_toolkit_spark.zip jobs/curate_job.py \
        --input s3://bucket/sf_dir --output s3://bucket/curated/

Local smoke:
    python jobs/curate_job.py --input /root/testdata/sf0.001 --output /tmp/cur
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv: list[str] | None = None, _spark=None) -> int:
    """``_spark``: inject an existing session (in-process smoke tests)."""

    ap = argparse.ArgumentParser(description="Distributed curation pipeline")
    ap.add_argument("--input", required=True,
                    help="sf_dir containing documents.parquet")
    ap.add_argument("--output", required=True,
                    help="output root (survivors/, metrics/)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_toolkit_spark.ops import curation, dedup, text
    from pdf_toolkit_spark.spark.session import get_spark

    command = subprocess.list2cmdline(
        ["curate_job.py", *(argv if argv is not None else sys.argv[1:])]
    )
    spark = _spark or get_spark(app_name="pdf-toolkit-curate", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    started = time.monotonic()

    survivors = curation.curate_survivors(spark, args.input)
    survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    out = spark.read.parquet(f"{args.output}/survivors")

    n_total = text.quality_filter(spark, args.input).count()
    gate_counts = {
        "quality_dropped": text.quality_filter(spark, args.input)
        .filter(~F.col("keep")).count(),
        "repetition_dropped": text.repetition_filter(spark, args.input)
        .filter(~F.col("keep")).count(),
        "contaminated": text.decontaminate(spark, args.input)
        .filter(F.col("contaminated")).count(),
        "exact_duplicates": int(
            dedup.exact_dedup(spark, args.input)
            .agg(F.sum(F.col("n_copies") - 1)).collect()[0][0] or 0
        ),
    }
    metrics = {
        "command": command,
        "docs_in": n_total,
        "survivors": out.count(),
        "tokens_kept": int(out.agg(F.sum("n_tokens")).collect()[0][0] or 0),
        **gate_counts,
        "elapsed_sec": time.monotonic() - started,
    }
    spark.createDataFrame([metrics]).write.mode("overwrite").parquet(
        f"{args.output}/metrics"
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())

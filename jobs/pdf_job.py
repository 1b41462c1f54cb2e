#!/usr/bin/env python
"""spark-submit entry point for the PDF-rewriting commands — the
distributed twins of the reference's `split` and `rotate pdf`
(reference cli.py:308-431), writing part/rotated PDFs as parquet
relations keyed by doc_id.

Local smoke:
    python jobs/pdf_job.py split --gen-docs 10 --output /tmp/parts --pages-per-file 2
    python jobs/pdf_job.py rotate --gen-docs 10 --output /tmp/rot --degrees 90
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv: list[str] | None = None, _spark=None) -> int:
    """``_spark``: inject an existing session for in-process smoke
    tests (left running)."""

    ap = argparse.ArgumentParser(description="Distributed PDF split / rotate")
    sub = ap.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("split")
    rp = sub.add_parser("rotate")
    for p in (sp, rp):
        src = p.add_mutually_exclusive_group(required=True)
        src.add_argument("--input", help="parquet dir with (doc_id, pdf_bytes, n_pages)")
        src.add_argument("--gen-docs", type=int)
        p.add_argument("--output", required=True)
        p.add_argument("--cores", type=int, default=None)
    sp.add_argument("--ranges", default=None, help='explicit ranges, e.g. "1-3,4-10"')
    sp.add_argument("--pages-per-file", type=int, default=None)
    sp.add_argument("--prefix", default="doc")
    rp.add_argument("--degrees", type=int, required=True, choices=[90, 180, 270])
    rp.add_argument("--pages", default="all")

    args = ap.parse_args(argv)

    from pdf_toolkit_spark.errors import UserError
    from pdf_toolkit_spark.spark.input import corpus_dataframe, read_documents_raw
    from pdf_toolkit_spark.spark.pdfjobs import rotate_pdfs, split_pdfs
    from pdf_toolkit_spark.spark.session import get_spark

    spark = _spark or get_spark(app_name=f"pdf-toolkit-{args.command}", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    try:
        docs = (read_documents_raw(spark, args.input) if args.input
                else corpus_dataframe(spark, args.gen_docs))
        if args.command == "split":
            out = split_pdfs(docs, ranges_spec=args.ranges,
                             pages_per_file=args.pages_per_file, prefix=args.prefix)
        else:
            out = rotate_pdfs(docs, args.degrees, pages=args.pages)
        out.write.mode("overwrite").parquet(args.output)
        from pyspark.sql import functions as F

        stats = spark.read.parquet(args.output).groupBy("status").agg(
            F.count("*").alias("n")).collect()
        metrics = {"command": args.command,
                   **{r["status"]: r["n"] for r in stats}}
    except UserError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    finally:
        if _spark is None:
            spark.stop()

    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

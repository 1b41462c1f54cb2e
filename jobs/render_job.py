#!/usr/bin/env python
"""spark-submit entry point for the `render` command twin (reference
render.py / cli.py:129-177): PDF pages -> PNG rasters at a DPI, as a
(doc_id, page_no, name, png) parquet media table.

Local smoke:
    python jobs/render_job.py --gen-docs 20 --output /tmp/rendered --dpi 144
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
    tests (left running); otherwise a fresh one is created/stopped."""

    ap = argparse.ArgumentParser(description="Distributed page rendering")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir with (doc_id, pdf_bytes, n_pages)")
    src.add_argument("--gen-docs", type=int, help="generate a synthetic corpus of N docs")
    ap.add_argument("--output", required=True, help="parquet dir for rendered pages")
    ap.add_argument("--dpi", type=int, default=144)
    ap.add_argument("--pages", default="all", help='page spec, e.g. "1-3,7"')
    ap.add_argument("--prefix", default="page")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pdf_toolkit_spark.errors import UserError
    from pdf_toolkit_spark.spark.input import corpus_dataframe, read_documents_raw
    from pdf_toolkit_spark.spark.render import render_pages
    from pdf_toolkit_spark.spark.session import get_spark

    spark = _spark or get_spark(app_name="pdf-toolkit-render", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    try:
        docs = (read_documents_raw(spark, args.input) if args.input
                else corpus_dataframe(spark, args.gen_docs))
        out = render_pages(docs, dpi=args.dpi, pages=args.pages, prefix=args.prefix)
        out.write.mode("overwrite").parquet(args.output)
        from pyspark.sql import functions as F

        stats = spark.read.parquet(args.output).groupBy("status").agg(
            F.count("*").alias("n")
        ).collect()
        metrics = {"dpi": args.dpi, "pages": args.pages,
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

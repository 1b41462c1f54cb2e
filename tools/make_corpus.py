#!/usr/bin/env python
"""Materialize the deterministic fixture corpus to parquet.

    python tools/make_corpus.py --n-docs 8000 --out /data/corpus \
        [--profile scan|textual] [--seed 42] [--mega-every 400]

Generation runs ON the executors (pure function of (seed, doc_id)); the
driver never holds PDF bytes. Also writes an ``expected_spans`` table
(serial-extractor oracle) when --expected is passed.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--profile", choices=["scan", "textual"], default="scan")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mega-every", type=int, default=400)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--expected", action="store_true",
                    help="also write expected_spans (serial oracle) next to the corpus")
    args = ap.parse_args(argv)

    from pdf_toolkit_spark.spark.input import corpus_dataframe
    from pdf_toolkit_spark.spark.session import get_spark

    spark = get_spark(app_name="make-corpus")
    spark.sparkContext.setLogLevel("WARN")
    df = corpus_dataframe(spark, args.n_docs, seed=args.seed,
                          mega_every=args.mega_every, partitions=args.partitions,
                          profile=args.profile)
    df.write.mode("overwrite").parquet(f"{args.out}/documents_raw")

    if args.expected:
        from typing import Iterator

        import pandas as pd

        from pdf_toolkit_spark.corpus import corpus_config
        from pdf_toolkit_spark.spark.schema import SPANS_SCHEMA

        cfg = corpus_config()
        seed, mega, profile = args.seed, args.mega_every, args.profile

        def oracle(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pdf_toolkit_spark.corpus import make_document
            from pdf_toolkit_spark.extract import extract_document

            for batch in batches:
                out = {"doc_id": [], "spans": []}
                for i in batch["id"]:
                    doc = make_document(int(i), seed=seed, mega_every=mega, profile=profile)
                    spans = extract_document(doc["pdf_bytes"], cfg)["spans"]
                    out["doc_id"].append(doc["doc_id"])
                    out["spans"].append([
                        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
                    ])
                yield pd.DataFrame(out)

        (spark.range(0, args.n_docs)
         .mapInPandas(oracle, schema=SPANS_SCHEMA)
         .write.mode("overwrite").parquet(f"{args.out}/expected_spans"))

    spark.stop()
    print(f"wrote {args.out}/documents_raw" + (" and expected_spans" if args.expected else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""One-off A/B: scan-profile 1->4 scaling with chunk_spread shuffle vs
input (no byte shuffle). Interleaved subprocess measurements."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CORPUS = "/dev/shm/scanexp"
N_DOCS = int(os.environ.get("EXP_DOCS", "3000"))


def generate() -> None:
    from pdf_toolkit_spark.spark.input import corpus_dataframe
    from pdf_toolkit_spark.spark.session import get_spark

    spark = get_spark(app_name="gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dataframe(spark, N_DOCS, seed=42, mega_every=400, partitions=128,
                     profile="scan").write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def measure(cores: int, mode: str) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from pdf_toolkit_spark.corpus import corpus_config
    from pdf_toolkit_spark.spark.job import build_pipeline
    from pdf_toolkit_spark.spark.session import get_spark

    extra = {}
    if mode == "input":
        total = sum(f.stat().st_size for f in Path(CORPUS).glob("*.parquet"))
        target = max(8 << 20, total // (cores * 4))
        extra["spark.sql.files.maxPartitionBytes"] = str(target)
    spark = get_spark(app_name=f"exp-{cores}-{mode}", cores=cores,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(it):
        from pdf_toolkit_spark import extract  # noqa: F401
        for b in it:
            yield pd.DataFrame({"id": b["id"]})

    spark.range(0, cores * 8, numPartitions=cores * 4).mapInPandas(_warm, "id long").count()
    raw = spark.read.parquet(CORPUS)
    n_docs = raw.count()
    t0 = time.monotonic()
    spans, _ = build_pipeline(spark, raw, dict(corpus_config(), chunk_spread=mode))
    n = spans.count()
    el = time.monotonic() - t0
    spark.stop()
    assert n == n_docs
    print("MEASURE_JSON " + json.dumps(
        {"cores": cores, "mode": mode, "sec": round(el, 2),
         "docs_per_sec": round(n_docs / el, 2)}))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--generate":
        generate()
        return
    if len(sys.argv) >= 4 and sys.argv[1] == "--measure":
        measure(int(sys.argv[2]), sys.argv[3])
        return
    if not os.path.isdir(CORPUS):
        subprocess.run([sys.executable, __file__, "--generate"], check=True,
                       capture_output=True, timeout=1800)
    results: dict = {}
    # interleave: (1,shuffle),(1,input),(4,shuffle),(4,input) x repeats
    for rep in range(int(os.environ.get("EXP_REPS", "1"))):
        for cores in (1, 4):
            for mode in ("shuffle", "input"):
                p = subprocess.run(
                    [sys.executable, __file__, "--measure", str(cores), mode],
                    capture_output=True, text=True, timeout=1800)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("MEASURE_JSON ")]
                if not line:
                    sys.stderr.write(p.stdout[-1500:] + p.stderr[-1500:])
                    raise SystemExit(f"{cores}/{mode} failed")
                r = json.loads(line[-1].removeprefix("MEASURE_JSON "))
                results.setdefault(f"{mode}", {}).setdefault(str(cores), []).append(
                    r["docs_per_sec"])
                print(json.dumps(r), flush=True)
    for mode, by_cores in results.items():
        for pair in zip(by_cores.get("1", []), by_cores.get("4", [])):
            print(f"{mode}: eff={pair[1] / pair[0] / 4:.3f} ({pair[0]} -> {pair[1]})")


if __name__ == "__main__":
    main()

"""Extra per-query benchmarks (guide §1.4): noop-sink isolation.

NOT the driver contract — bench.py is frozen for measurement.  This file
exists so optimization evidence (before/after numbers with the noop sink,
per-query, labeled jobs) can be produced without touching bench.py.

Usage:
    python bench_extra.py [query ...]         # default: bench HEADLINE list
    SPARK_GRAFT_TRIALS=3 python bench_extra.py dedup_minhash_lsh

Prints one JSON line: {"queries": {name: best_sec}, "samples": {...}}.
The noop sink computes every column of every row (vs bench.py's count(),
which lets the optimizer prune) — numbers are comparable across runs of
THIS file, not with bench.py's.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench import BENCH_IMPL, HEADLINE  # noqa: E402
from databricks_pdf_ocr_spark.queries import QUERIES  # noqa: E402
from databricks_pdf_ocr_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(master=f"local[{cpus}]", app_name="bench-extra",
                      shuffle_partitions=cpus, arrow_batch_rows=256)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()

    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = BENCH_IMPL.get(name) or QUERIES[name]["fn"]
        samples[name] = []
        for i in range(trials):
            spark.sparkContext.setJobDescription(f"{name} trial {i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        best[name] = min(samples[name])
        print(f"# {name}: {samples[name]}", file=sys.stderr)
    print(json.dumps({"queries": best, "samples": samples, "sf_dir": sf_dir,
                      "cpus": cpus}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

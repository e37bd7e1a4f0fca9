"""Generate the synthetic 10x perf-test set (the r06 "sf1.0 shape").

The driver's round-end measurement can run at sf=1.0 (BENCH_r05 "sf": 1.0)
but only sf<=0.1 ships locally, so optimization A/Bs need a 10x table set
with the same workload *shape*: 10 copies of every sf0.1 table with key
families shifted per copy, and document text word-permuted per copy
(deterministic xxhash order) so copies are NOT near-duplicates and the
dedup ladder keeps its real workload.  PERF TESTING ONLY — correctness
gates always run against /root/testdata with DuckDB.

Usage: python tools/make_scaled.py [out_dir] [copies]   (default /tmp/scaled/sf1.0, 10)
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
# key-column families to shift per copy (column -> parent max is implied
# by shifting every member of the family by the same stride)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STATIC = ["nation", "region", "part", "supplier"]  # dimension tables, copied as-is


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled/sf1.0"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    shutil.rmtree(out, ignore_errors=True)
    Path(out).mkdir(parents=True)
    spark = get_spark(master="local[32]", app_name="make-scaled")
    strides: dict[str, int] = {}
    for table, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        for k in keys:
            fam = k.split("_", 1)[1]
            if fam not in strides:
                strides[fam] = int(df.agg(F.max(k)).first()[0]) + 1
        legs = []
        for c in range(copies):
            leg = df
            for k in keys:
                fam = k.split("_", 1)[1]
                leg = leg.withColumn(k, F.col(k) + F.lit(c * strides[fam]))
            if table == "documents" and c > 0:
                # deterministic per-(doc, copy) word permutation: copies
                # share a vocabulary but are nowhere near-duplicates.  The
                # sort key MUST include doc_id — keying on (word, copy)
                # alone gives every doc in a copy the same relative word
                # order, and the shared shingle subsequences explode LSH
                # band collisions ~30000x (measured: 21.9M candidate
                # pairs vs the ~8k a real 10x corpus would produce).
                perm = F.array_join(
                    F.transform(
                        F.array_sort(F.transform(
                            F.split("text", " "),
                            _keyed(c))),
                        lambda s: s["w"]), " ")
                leg = leg.withColumn("text", perm) \
                         .withColumn("n_chars", F.length("text"))
            legs.append(leg)
        full = legs[0]
        for leg in legs[1:]:
            full = full.unionByName(leg)
        full.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"# {table}: {copies}x -> {out}/{table}.parquet")
    for table in STATIC:
        src = Path(f"{SRC}/{table}.parquet")
        if src.exists():
            spark.read.parquet(str(src)).write.mode("overwrite") \
                .parquet(f"{out}/{table}.parquet")
    Path(f"{out}/_DONE").touch()
    spark.stop()
    return 0


def _keyed(c: int):
    def f(w, i):
        # DELIBERATE two-param lambda: the 2nd param is the element
        # index.  The position must be in the key — keying on the word
        # value alone SORTS (clusters duplicate words into runs, and the
        # shared repeated-word shingles still collide ~2500x); with the
        # index every element gets a distinct key and the result is a
        # true per-(doc, copy) shuffle.  doc_id is an outer attribute
        # reference (cheap per element).
        return F.struct(F.xxhash64(w, i, F.col("doc_id"), F.lit(c))
                        .alias("h"), w.alias("w"))
    return f


if __name__ == "__main__":
    sys.exit(main())

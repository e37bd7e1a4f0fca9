"""Materialize the extract_e2e golden as parquet (committed test data).

The flagship pipeline query (``queries.extract_e2e``) runs the full
distributed extraction over the deterministic fixture corpus; this script
produces the same rows from the single-process golden pipeline
(``tools/goldens.py``) with NO Spark, so DuckDB can hash-compare the two
via ``oracle_sql()`` — giving the flagship an independent correctness
oracle instead of a rows-only check.

Regenerate (and assert unchanged) with:
    python tools/make_golden_parquet.py [--check]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.parquet as pq

from databricks_pdf_ocr_spark import fixtures
from databricks_pdf_ocr_spark.config import ExtractConfig
from tools.goldens import golden_extract

#: must mirror queries.extract_e2e exactly
E2E_SEED, E2E_DOCS, E2E_PROFILE = 42, 80, fixtures.TINY
E2E_CFG = ExtractConfig(n_buckets=16, shuffle_partitions=8)

GOLDEN_PATH = Path(__file__).resolve().parent.parent / "tests" / "data" / \
    "golden_extract_e2e.parquet"


def golden_table() -> pa.Table:
    rows = list(fixtures.gen_rows(E2E_SEED, E2E_DOCS, E2E_PROFILE))
    gold = golden_extract(rows, E2E_CFG)
    doc_ids, offs, kinds, texts, mrefs = [], [], [], [], []
    for did in sorted(gold):
        for (kind, text, mref, off) in gold[did]:
            doc_ids.append(did)
            offs.append(off)
            kinds.append(kind)
            texts.append(text)
            mrefs.append(mref)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "out_offset": pa.array(offs, pa.int32()),
        "kind": pa.array(kinds, pa.string()),
        "text": pa.array(texts, pa.string()),
        "media_ref": pa.array(mrefs, pa.string()),
    })


def main(argv=None) -> int:
    check = "--check" in (argv or sys.argv[1:])
    table = golden_table()
    if check:
        existing = pq.read_table(GOLDEN_PATH)
        assert existing.equals(table), "golden parquet is stale — regenerate"
        print(f"golden up to date: {GOLDEN_PATH} ({table.num_rows} rows)")
        return 0
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, GOLDEN_PATH)
    print(f"wrote {GOLDEN_PATH} ({table.num_rows} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

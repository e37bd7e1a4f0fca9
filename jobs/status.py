"""Status CLI: run history + table summary (reference: ``show_status``,
``main.py:175-199`` / ``StateManager.get_run_history``,
``managers/state.py:106-132``)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from databricks_pdf_ocr_spark.config import ExtractConfig
from databricks_pdf_ocr_spark.plans.checkpoint import CheckpointManager
from databricks_pdf_ocr_spark.session import get_spark
from databricks_pdf_ocr_spark.sources.tables import make_table_io


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", required=True)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--compact-checkpoint", action="store_true",
                    help="maintenance: rewrite the append-only lineage log "
                         "to its latest-wins snapshot (one row per "
                         "fingerprint+bucket); resume behavior unchanged, "
                         "superseded runs drop out of run history")
    ap.add_argument("--gc-media-orphans", action="store_true",
                    help="maintenance: drop media_payloads rows no "
                         "latest-wins result references (re-ingested docs "
                         "with changed content mint new refs; old payloads "
                         "otherwise accumulate forever).  Run only while "
                         "no extraction is in flight.")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="status")
    io = make_table_io(spark, args.tables)
    cp = CheckpointManager(io, ExtractConfig())

    out = {}
    if args.compact_checkpoint:
        out["compaction"] = cp.compact()
    if args.gc_media_orphans:
        from jobs.extract import gc_media_orphans
        out["media_gc"] = gc_media_orphans(io)
    out["runs"] = [r.asDict() for r in cp.run_history(args.limit).collect()]
    for t in ("extraction_results", "extracted_documents", "media_payloads"):
        df = io.read(t)
        out[t] = {"rows": df.count()} if df is not None else None
    print(json.dumps(out, default=str, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

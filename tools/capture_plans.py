"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
Queries default to the bench HEADLINE list (with the bench's production
hash-mode overrides for the dedup phases, so the captured plan is the
one the bench actually times).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_IMPL, HEADLINE  # noqa: E402
from databricks_pdf_ocr_spark.queries import QUERIES  # noqa: E402
from databricks_pdf_ocr_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(master=f"local[{cpus}]", app_name="capture-plans",
                      shuffle_partitions=cpus, arrow_batch_rows=256)
    for name in names:
        fn = BENCH_IMPL.get(name) or QUERIES[name]["fn"]
        try:
            df = fn(spark, sf_dir)
            text = plan_text(df)
        except Exception as e:  # noqa: BLE001 - record, keep going
            text = f"ERROR building {name}: {e}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

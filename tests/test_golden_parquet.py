"""The committed extract_e2e golden parquet must match regeneration from
the fixture + single-process golden pipeline (guards fixture/kernel drift
from silently invalidating the flagship oracle)."""

import pyarrow.parquet as pq

from tools.make_golden_parquet import GOLDEN_PATH, golden_table


def test_golden_parquet_fresh():
    assert pq.read_table(GOLDEN_PATH).equals(golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"

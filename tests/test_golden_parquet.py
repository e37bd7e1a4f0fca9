"""The committed golden parquets must match regeneration from the
fixture + single-process golden pipelines (guards fixture/kernel drift
from silently invalidating the flagship and pdf_images oracles)."""

import pyarrow.parquet as pq

from tools.make_golden_parquet import (
    BPE_GOLDEN_PATH, GOLDEN_PATH, PDFIMG_GOLDEN_PATH, bpe_golden_table,
    golden_table, pdf_images_golden_table,
)


def test_golden_parquet_fresh():
    assert pq.read_table(GOLDEN_PATH).equals(golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_pdf_images_golden_fresh():
    assert pq.read_table(PDFIMG_GOLDEN_PATH).equals(
        pdf_images_golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_pdf_images_golden_covers_contract():
    t = pq.read_table(PDFIMG_GOLDEN_PATH).to_pydict()
    # real decodable payloads AND the loud undecodable-stub rows
    assert set(t["format"]) == {"png", "raw"}
    assert any(not ok for ok in t["extract_ok"])
    assert all(msg for ok, msg in zip(t["extract_ok"], t["error_message"])
               if not ok)


def test_bpe_golden_fresh():
    assert pq.read_table(BPE_GOLDEN_PATH).equals(bpe_golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_phash_golden_fresh():
    from tools.make_golden_parquet import PHASH_GOLDEN_PATH, phash_golden_table
    assert pq.read_table(PHASH_GOLDEN_PATH).equals(phash_golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_ahash_golden_fresh():
    from tools.make_golden_parquet import AHASH_GOLDEN_PATH, \
        ahash_golden_table
    assert pq.read_table(AHASH_GOLDEN_PATH).equals(ahash_golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_ahash_golden_covers_planted_structure():
    """All 8 bases x C(3,2) same-base re-encode pairs, nothing else."""
    from tools.make_golden_parquet import AHASH_GOLDEN_PATH
    t = pq.read_table(AHASH_GOLDEN_PATH)
    assert t.num_rows == 24
    assert max(t.column("hamming").to_pylist()) <= 7


def test_vhash_golden_fresh():
    from tools.make_golden_parquet import VHASH_GOLDEN_PATH, \
        vhash_golden_table
    assert pq.read_table(VHASH_GOLDEN_PATH).equals(vhash_golden_table()), \
        "stale golden — python tools/make_golden_parquet.py"


def test_vhash_golden_covers_planted_structure():
    """All 6 bases x C(3,2) same-base re-encode pairs, every one
    matching on all 4 frames, nothing else."""
    from tools.make_golden_parquet import VHASH_GOLDEN_PATH
    t = pq.read_table(VHASH_GOLDEN_PATH)
    assert t.num_rows == 18
    assert set(t.column("frames_matched").to_pylist()) == {4}
    assert max(t.column("max_hamming").to_pylist()) <= 7


def test_phash_golden_covers_planted_structure():
    """All 10 bases x C(3,2) same-base re-encode pairs, nothing else."""
    from tools.make_golden_parquet import PHASH_GOLDEN_PATH
    t = pq.read_table(PHASH_GOLDEN_PATH)
    assert t.num_rows == 30
    assert max(t.column("hamming").to_pylist()) <= 7

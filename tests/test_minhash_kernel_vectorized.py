"""Focused regression tests for the r06 vectorized minhash kernel and
the candidate-bounded verification path.

The production (hash_mode="xxhash64") signature kernel was rewritten
from a per-document numpy loop to batch-level vectorization (flat
token-hash array, strided shingle adds, per-doc minima via ONE
``np.minimum.reduceat``).  These tests pin the kernel to an
independent per-document reference implementation of the same affine
MinHash family, across the edge shapes the reduceat form must get
right: a doc with exactly n tokens (one window), docs shorter than n
(dropped), null text (dropped), heavy token repetition (memoized
hashes), and multi-row batches.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.operators import dedup


def _reference_signatures(rows, n=3, k=8):
    """Per-doc reference: the pre-r06 loop, reimplemented independently."""
    rng = np.random.RandomState(0x5EED)
    a = (rng.randint(0, 2 ** 62, size=k, dtype=np.uint64)
         << np.uint64(1)) | np.uint64(1)
    c = rng.randint(0, 2 ** 63, size=k, dtype=np.uint64)
    m = [np.uint64(x) for x in
         (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
          0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63)]

    def tok_hash(t):
        return int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")

    out = {}
    for did, text in rows:
        if text is None:
            continue
        toks = text.lower().split(" ")
        if len(toks) < n:
            continue
        th = np.fromiter((tok_hash(t) for t in toks),
                         dtype=np.uint64, count=len(toks))
        base = th[: len(th) - n + 1] * m[0]
        for j in range(1, n):
            base = base + th[j: len(th) - n + 1 + j] * m[j % len(m)]
        out[did] = tuple(
            (a[:, None] * base[None, :] + c[:, None])
            .min(axis=1).astype(np.int64))
    return out


EDGE_ROWS = [
    (1, "alpha beta gamma"),                      # exactly n tokens: 1 window
    (2, "a b"),                                   # < n tokens: dropped
    (3, None),                                    # null text: dropped
    (4, "x x x x x x x x"),                       # all-identical tokens
    (5, "one two three four five six seven"),
    (6, "The QUICK brown Fox jumps over the lazy dog the quick"),
    (7, " lead and trail "),                      # empty-string tokens
    (8, "repeat repeat other repeat repeat other repeat"),
]


def test_vectorized_kernel_matches_reference(spark):
    df = spark.createDataFrame(EDGE_ROWS, "doc_id int, text string")
    got = {r["id"]: tuple(r[f"mh{i}"] for i in range(8))
           for r in dedup.minhash_signatures_df(
               df, hash_mode="xxhash64").collect()}
    want = _reference_signatures(EDGE_ROWS)
    assert got == want
    assert 2 not in got and 3 not in got     # short + null docs dropped


def test_vectorized_kernel_matches_reference_many_rows(spark):
    # enough rows to span several Arrow batches in the test session
    rows = [(i, f"w{i % 7} common w{i % 5} tok{i} common w{(i * 3) % 11} tail")
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: tuple(r[f"mh{i}"] for i in range(8))
           for r in dedup.minhash_signatures_df(
               df, hash_mode="xxhash64").collect()}
    want = _reference_signatures(rows)
    assert got == want


def test_verify_empty_candidates_short_circuit(spark):
    # a corpus with no band collisions: verified pair set is empty but
    # keeps the (doc_a, doc_b) schema the survivor anti-join consumes
    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = dedup.minhash_lsh_pairs(df, hash_mode="xxhash64",
                                    verify_threshold=0.3)
    assert pairs.columns == ["doc_a", "doc_b"]
    assert pairs.count() == 0


def test_verify_still_finds_planted_neardups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base + " tail"),          # near-dup pair
            (3, "completely different words entirely unrelated text here")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = dedup.minhash_lsh_pairs(df, hash_mode="xxhash64",
                                    verify_threshold=0.3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]

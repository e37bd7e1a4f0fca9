"""Repetition quality signals + train/test decontamination (planted cases)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.operators import text_analysis as T


def _bucket(doc_id: int, mod: int = 20) -> int:
    return int(hashlib.sha256(str(doc_id).encode()).hexdigest()[:8], 16) % mod


def _eval_ids(n: int, mod: int = 20):
    """First n ints whose sha2 bucket is 0 (the eval gate) and n whose isn't."""
    ev, co, i = [], [], 0
    while len(ev) < n or len(co) < n:
        (ev if _bucket(i, mod) == 0 else co).append(i)
        i += 1
    return ev[:n], co[:n]


def test_repetition_features_planted(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),          # 2-grams: 'spam spam' x3
         (2, "a b c d"),                      # all distinct
         (3, "x y x y x y"),                  # 'x y' x3, 'y x' x2
         (4, "solo")],                        # too short: no 2-grams
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            T.repetition_features(df, n=2).collect()}
    assert set(rows) == {1, 2, 3}             # doc 4 filtered (n_ngrams=0)
    r1 = rows[1]
    assert (r1["n_ngrams"], r1["n_distinct"], r1["top_ngram_count"]) == (3, 1, 3)
    assert r1["dup_ngram_frac_e6"] == (3 - 1) * 1000000 // 3
    r2 = rows[2]
    assert (r2["n_ngrams"], r2["n_distinct"], r2["top_ngram_count"]) == (3, 3, 1)
    assert r2["dup_ngram_frac_e6"] == 0
    r3 = rows[3]
    assert (r3["n_ngrams"], r3["n_distinct"], r3["top_ngram_count"]) == (5, 2, 3)


def test_contamination_pairs_planted(spark):
    ev_id = _eval_ids(1)[0][0]
    co_a, co_b = _eval_ids(2)[1]
    df = spark.createDataFrame(
        [(ev_id, "the quick brown fox jumps over dogs"),
         # shares 3-grams 'the quick brown', 'quick brown fox' with eval
         (co_a, "see the quick brown fox run away"),
         (co_b, "completely unrelated words here now")],
        "doc_id long, text string")
    rows = T.contamination_pairs(df, eval_mod=20, n=3, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["eval_id"], r["n_common"]) == (co_a, ev_id, 2)
    # eval doc has 5 distinct 3-grams -> contam = floor(2e6 / 5)
    assert r["contam_e6"] == 2 * 1000000 // 5


def test_contamination_eval_side_never_self_pairs(spark):
    ev_ids, _ = _eval_ids(2)
    # two eval docs sharing text must NOT produce an (eval, eval) pair
    df = spark.createDataFrame(
        [(ev_ids[0], "alpha beta gamma delta epsilon"),
         (ev_ids[1], "alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    assert T.contamination_pairs(df, eval_mod=20, n=3).count() == 0

"""Span-level exact-substring dedup: maximal-run merging, disjoint
spans, the boilerplate df-cap guard, and short-doc safety."""

from databricks_pdf_ocr_spark.operators import dedup


# ---------------------------------------------------------------------------
# exact-substring spans
# ---------------------------------------------------------------------------

def _span_rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted((r["id_a"], r["id_b"], r["a_start"], r["b_start"],
                   r["n_tokens"])
                  for r in dedup.shared_substring_spans(df, **kw).collect())


def test_substring_spans_maximal_run_and_offsets(spark):
    shared = " ".join(f"s{i}" for i in range(16))
    rows = [(1, "a1 a2 a3 " + shared + " a4"),
            (2, "b1 " + shared),
            (3, " ".join(f"c{i}" for i in range(13)))]
    assert _span_rows(spark, rows, min_tokens=12) == [(1, 2, 4, 2, 16)]


def test_substring_spans_two_disjoint_spans_per_pair(spark):
    s1 = " ".join(f"x{i}" for i in range(12))
    s2 = " ".join(f"y{i}" for i in range(13))
    rows = [(1, s1 + " gap1 gap2 " + s2),
            (2, s2 + " other filler words here " + s1)]
    got = _span_rows(spark, rows, min_tokens=12)
    assert got == [(1, 2, 1, 18, 12), (1, 2, 15, 1, 13)]


def test_substring_spans_boilerplate_cap(spark):
    """A gram shared by more docs than max_gram_docs must be dropped —
    the quadratic-pair guard."""
    bp = " ".join(f"b{i}" for i in range(12))
    rows = [(i, f"u{i} " + bp) for i in range(6)]
    assert _span_rows(spark, rows, min_tokens=12, max_gram_docs=5) == []
    got = _span_rows(spark, rows, min_tokens=12, max_gram_docs=6)
    assert len(got) == 15                      # C(6,2), all pairs found


def test_substring_spans_short_docs_and_no_false_positives(spark):
    rows = [(1, "one two three"), (2, "one two three"),
            (3, " ".join(f"z{i}" for i in range(30)))]
    assert _span_rows(spark, rows, min_tokens=12) == []

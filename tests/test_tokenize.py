"""BPE tokenizer operators: deterministic fit, encode semantics, and
Java/Python pre-tokenizer agreement (the cross-engine seam the
distributed path depends on)."""

import re

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.operators import tokenize as T


def test_train_known_merges():
    """Hand-checkable corpus: 'aa' dominates, so ('a','a') merges first,
    then ('aa', EOW) — the classic fit, with deterministic tie-breaks."""
    wc = [("aaab", 10), ("aab", 5), ("b", 3)]
    merges, vocab = T.bpe_train(wc, num_merges=2)
    assert merges[0] == ("a", "a")
    # after merging: aaab -> (aa,a,b,EOW) x10, aab -> (aa,b,EOW) x5
    # pair counts: (aa,a)=10, (a,b)=10, (b,EOW)=18 -> (b,EOW) wins
    assert merges[1] == ("b", T.EOW)
    assert vocab["<unk>"] == 0
    assert "aa" in vocab and "b" + T.EOW in vocab


def test_encode_inverts_training_segmentation():
    wc = [("hello", 50), ("help", 30), ("hell", 20)]
    merges, vocab = T.bpe_train(wc, num_merges=20)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ids = T.bpe_encode_word("hello", ranks, vocab)
    # a fully-merged training word encodes to one token
    assert ids == [vocab["hello" + T.EOW]]
    # unseen word over seen characters still encodes (piecewise)
    ids2 = T.bpe_encode_word("pohl", ranks, vocab)
    assert ids2 and all(i != T.UNK_ID for i in ids2)
    # symbol outside the alphabet -> <unk>
    ids3 = T.bpe_encode_word("héllo", ranks, vocab)
    assert T.UNK_ID in ids3


def test_encode_merges_all_occurrences_left_to_right():
    merges = [("a", "a")]
    vocab = {"<unk>": 0, "a": 1, "aa": 2, T.EOW: 3}
    ranks = {("a", "a"): 0}
    # 5 a's -> aa aa a (left-to-right non-overlapping)
    assert T.bpe_encode_word("aaaaa", ranks, vocab) == [2, 2, 1, 3]


def test_pretokenizer_java_python_agreement(spark):
    """The JVM regexp_extract_all scan and Python re.findall must
    produce identical pre-token streams — includes attached leading
    spaces, digit runs, punctuation runs, newlines, and contractions."""
    texts = [
        "Hello world!  It's 42 degrees (— ok, 42.5); total $1,234.56.",
        "line one\nline two\t tabbed...  doubled  spaces",
        "a-b_c 12ab34 #tag @user e.g. i.e.; 'quoted' \"double\"",
        "",
        "   leading spaces",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = (df.select(F.regexp_extract_all(
        "text", F.lit(T.PRETOKEN_PATTERN), 0).alias("toks"))
        .collect())
    for row, text in zip(jvm, texts):
        assert row["toks"] == re.findall(T.PRETOKEN_PATTERN, text), text


def test_distributed_encode_equals_sequential(spark):
    """bpe_encode (mapInPandas + broadcast model) must reproduce the
    sequential bpe_encode_text for every document."""
    from databricks_pdf_ocr_spark import fixtures

    rows = list(fixtures.text_corpus_rows(7, 40))
    df = spark.createDataFrame(rows, "doc_id string, text string") \
        .repartition(5)
    wc = [(r["word"], r["n"])
          for r in T.word_counts(df, top_k=1024).collect()]
    merges, vocab = T.bpe_train(wc, num_merges=80)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
           for r in T.bpe_encode(df, merges, vocab).collect()}
    for did, text in rows:
        want = T.bpe_encode_text(text, ranks, vocab)
        assert got[did] == (want, len(want)), did


def test_word_counts_cap_is_deterministic(spark):
    """The top-K cut orders by (count desc, word asc): re-running and
    re-partitioning must give the same table — the model input is a
    pure function of the corpus."""
    from databricks_pdf_ocr_spark import fixtures

    rows = list(fixtures.text_corpus_rows(11, 30))
    a = spark.createDataFrame(rows, "doc_id string, text string") \
        .repartition(3)
    b = spark.createDataFrame(list(reversed(rows)),
                              "doc_id string, text string").repartition(7)
    wa = [(r["word"], r["n"]) for r in T.word_counts(a, top_k=50).collect()]
    wb = [(r["word"], r["n"]) for r in T.word_counts(b, top_k=50).collect()]
    assert wa == wb and len(wa) == 50


def test_roundtrip_token_count_reasonable():
    """Sanity on compression: trained BPE over its own corpus should
    use fewer tokens than characters and more than words."""
    from databricks_pdf_ocr_spark import fixtures

    rows = list(fixtures.text_corpus_rows(3, 50))
    corpus = [t for _, t in rows]
    from collections import Counter
    counts = Counter()
    for t in corpus:
        counts.update(re.findall(T.PRETOKEN_PATTERN, t))
    merges, vocab = T.bpe_train(sorted(counts.items(),
                                       key=lambda kv: (-kv[1], kv[0])),
                                num_merges=150)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    n_chars = sum(len(t) for t in corpus)
    n_words = sum(counts.values())
    n_tokens = sum(len(T.bpe_encode_text(t, ranks, vocab)) for t in corpus)
    assert n_words < n_tokens < n_chars


def test_eow_sentinel_outside_ascii_alphabet():
    """The end-of-word sentinel must never collide with corpus symbols
    or with any token formed by merging them."""
    assert len(T.EOW) == 1 and ord(T.EOW) >= 0xE000

"""Production (xxhash64) vs oracle (sha2) hash-mode agreement for the
dedup ladder: both configurations must find the planted duplicates.

The two modes use different hash families, so borderline-Jaccard candidate
sets may differ — but exact duplicates (identical signatures by
construction) and strong near-dups (collision probability ≈ 1 at these
band parameters) must be found by both.
"""

import random

import pytest

from databricks_pdf_ocr_spark.operators import dedup

_VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango "
          "uniform victor whiskey xray yankee zulu merge join sort hash "
          "scan filter").split()


def _text(rng, n=80):
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(99)
    rows = [(f"doc{i}", _text(rng)) for i in range(20)]
    dup_text = _text(rng)
    rows += [("dup_a", dup_text), ("dup_b", dup_text)]
    near = _text(rng).split()
    near_b = list(near)
    near_b[40] = "CHANGED"
    rows += [("near_a", " ".join(near)), ("near_b", " ".join(near_b))]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.mark.parametrize("mode", ["sha2", "xxhash64"])
def test_minhash_lsh_finds_planted_dups(corpus, mode):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             dedup.minhash_lsh_pairs(corpus, n=3, k=8, bands=4,
                                     hash_mode=mode).collect()}
    assert ("dup_a", "dup_b") in pairs
    assert ("near_a", "near_b") in pairs


@pytest.mark.parametrize("mode", ["sha2", "xxhash64"])
def test_simhash_modes(corpus, mode):
    fp = {r["id"]: r["simhash"] for r in
          dedup.simhash(corpus, hash_mode=mode).collect()}
    assert fp["dup_a"] == fp["dup_b"]
    assert 0 <= fp["dup_a"] < 2 ** 32
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             dedup.simhash_pairs(corpus, max_hamming=6,
                                 hash_mode=mode).collect()}
    assert pairs[("dup_a", "dup_b")] == 0
    assert ("near_a", "near_b") in pairs


def test_modes_agree_true_on_dup_free_corpus(spark, tmp_path):
    """ADVICE r3: zero verified pairs in BOTH hash families → union 0 →
    the agreement ratio is null; the gate must report vacuous agreement
    (true), not null/fail."""
    from databricks_pdf_ocr_spark import queries as Q

    rng = random.Random(5)
    # texts with disjoint vocabulary chunks — no near-dup pairs survive
    rows = [(f"u{i}", " ".join(f"w{i}_{j}" for j in range(60)))
            for i in range(12)]
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id string, text string") \
        .write.parquet(f"{sf_dir}/documents.parquet")
    out = Q.queries()["dedup_modes_agree"](spark, sf_dir).collect()
    assert len(out) == 1
    assert out[0]["n_sha2_pairs"] == 0
    assert out[0]["modes_agree"] is True


def test_neardup_components_empty_pairs(spark):
    """An empty pair set (the common clean-corpus case) must return an
    empty (node, comp) frame with the pair id type, report rounds=0, and
    take the fast path regardless of whether the input is lazy or
    already materialized (the r06 pairs-first localCheckpoint)."""
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    for pairs in (empty, empty.localCheckpoint()):
        st = {}
        out = dedup.neardup_components(pairs, stats=st)
        assert out.columns == ["node", "comp"]
        assert out.schema["node"].dataType.simpleString() == "string"
        assert out.count() == 0
        assert st["rounds"] == 0


def test_neardup_components_transitive_chain(spark):
    """a~b and b~c (no a~c pair) must land in ONE component labeled by
    the smallest id; disjoint pairs stay separate; converges and raises
    on a too-small max_iter instead of returning partial labels."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")],
        "doc_a string, doc_b string")
    st = {}
    comp = {r["node"]: r["comp"]
            for r in dedup.neardup_components(pairs, stats=st).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # frontier propagation: rounds == graph diameter (2 for a-b-c), no
    # extra full-graph no-change sweep
    assert st["rounds"] == 2

    # long chain: diameter 6 needs several rounds; max_iter=1 must be loud
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)],
        "doc_a string, doc_b string")
    comp2 = {r["node"]: r["comp"]
             for r in dedup.neardup_components(chain).collect()}
    assert set(comp2.values()) == {"n0"}
    with pytest.raises(ValueError, match="did not converge"):
        dedup.neardup_components(chain, max_iter=1)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_neardup_components_random_graphs_vs_union_find(spark, seed):
    """Seeded random pair graphs: the distributed min-label propagation
    must agree with a local union-find reference on every node."""
    rng = random.Random(seed)
    nodes = [f"v{i:02d}" for i in range(30)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(25)})

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    in_graph = {n for p in pairs for n in p}
    expected = {n: min(m for m in in_graph if find(m) == find(n))
                for n in in_graph}

    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    got = {r["node"]: r["comp"]
           for r in dedup.neardup_components(df).collect()}
    assert got == expected


def test_minhash_incremental_equals_from_scratch(spark, tmp_path):
    """Production mode (xxhash64): build on old + upsert delta +
    delta-vs-all candidates must equal the from-scratch full-corpus
    pairs restricted to pairs touching the delta — in BOTH hash modes."""
    from pyspark.sql import functions as F

    from databricks_pdf_ocr_spark.sources.tables import TableIO

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    old = docs.filter(F.col("doc_id") < 350)
    new = docs.filter(F.col("doc_id") >= 350)
    for mode in ("xxhash64", "sha2"):
        io = TableIO(spark, str(tmp_path / f"idx_{mode}"))
        dedup.build_minhash_index(old, io, hash_mode=mode)
        assert dedup.minhash_index_upsert(io, new, hash_mode=mode) > 0
        assert dedup.minhash_index_upsert(io, new, hash_mode=mode) == 0
        inc = {(r["doc_a"], r["doc_b"]) for r in
               dedup.minhash_lsh_pairs_incremental(
                   io, new.select(F.col("doc_id").alias("id"))).collect()}
        full = {(r["doc_a"], r["doc_b"]) for r in
                dedup.minhash_lsh_pairs(docs, hash_mode=mode).collect()
                if r["doc_a"] >= 350 or r["doc_b"] >= 350}
        assert inc == full, mode


def test_merge_components_equals_from_scratch(spark):
    """Star-collapse merge: old labels + delta pairs must converge to
    exactly the from-scratch components over the full pair set —
    including a delta pair that BRIDGES two old components."""
    old_pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("x", "y")], "doc_a string, doc_b string")
    old_labels = dedup.neardup_components(old_pairs)
    # delta: bridges {a,b} and {c,d}; attaches a brand-new node to x
    delta = spark.createDataFrame(
        [("b", "c"), ("x", "z")], "doc_a string, doc_b string")
    st = {}
    merged = {r["node"]: r["comp"] for r in
              dedup.merge_components(old_labels, delta, stats=st).collect()}
    full = {r["node"]: r["comp"] for r in
            dedup.neardup_components(
                old_pairs.unionByName(delta)).collect()}
    assert merged == full
    assert merged["d"] == "a" and merged["z"] == "x"

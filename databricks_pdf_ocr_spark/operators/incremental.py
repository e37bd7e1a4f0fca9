"""Work-selection operators: the reference's processing modes, Spark-first.

Reference: ``get_unprocessed_files`` (``processors/ocr.py:59-85``) collects
all processed ids to the driver and filters with ``isin`` — the collapse
point at 10^12 docs (SURVEY.md §3.3).  Here the work set stays a DataFrame:

- incremental  → ``left_anti`` join against processed doc ids
- reprocess_all → full scan
- reprocess_specific → ``isin`` for short user lists, ``left_semi`` join
  against a DataFrame for large ones

plus the per-run cap (``max_docs_per_run``, reference ``settings.toml:21``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import ExtractConfig

#: above this many ids, a literal IN-list stops being sane SQL
_ISIN_LIMIT = 1000


def cap_to_buckets(pending: DataFrame, max_docs: int) -> DataFrame:
    """Cap a pending work set at checkpoint-BUCKET granularity.

    Keeps whole buckets, in bucket order, until the cumulative doc count
    reaches ``max_docs`` (so the cap rounds UP to a bucket boundary —
    never truncates inside a bucket).  Buckets are the lineage/resume
    unit: a run marks every touched bucket 'done', so any row-level cut
    inside a bucket is permanent silent data loss on resume.

    Cost: one per-bucket count aggregate (≤ n_buckets rows) + a running
    sum over that tiny frame, then a broadcast semi-join back — the big
    side is never shuffled.
    """
    counts = pending.groupBy("bucket").agg(F.count(F.lit(1)).alias("__n"))
    w = (Window.partitionBy(F.lit(1)).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    keep = (counts
            .withColumn("__before", F.coalesce(F.sum("__n").over(w), F.lit(0)))
            .filter(F.col("__before") < max_docs)
            .select("bucket"))
    return pending.join(F.broadcast(keep), "bucket", "left_semi")


# ---------------------------------------------------------------------------
# Bloom-gated anti join — the 10^12-row shape of `unprocessed`.
#
# At extreme scale the plain left_anti shuffles the ENTIRE source on the
# key just to discover that most rows were never processed.  A Bloom
# filter over the done-key set is fixed-size (m bits regardless of key
# count, vs a broadcast of raw distinct keys that grows with them) and
# removes the definitely-new rows map-side; only the maybe-done sliver
# pays the exact anti-join shuffle.  No false negatives by construction,
# so the composition is EXACT — false positives merely ride into the
# verification join and are kept there.
#
# Spark's own BloomFilterAggregate/might_contain pair is not exposed to
# SQL in this build (UNRESOLVED_ROUTINE — it exists only for Catalyst's
# runtime row-level filtering), so the filter is built from public
# column expressions: k seeded xxhash64 probes → explode → ONE bit_or
# hash-agg over ≤ m/64 word rows → a one-row broadcast map<int,bigint>.
# Membership is k element_at lookups — pure JVM codegen, no join, no UDF.
# ---------------------------------------------------------------------------

def bloom_build(done: DataFrame, key: str, m_bits: int = 1 << 20,
                k: int = 5) -> DataFrame:
    """ONE-row DataFrame ``(__bloom: array<bigint>)`` — a Bloom filter
    over ``done[key]`` as a DENSE bitmap of ``m_bits/64`` words.

    Dense array, NOT ``map<int,bigint>``: Spark's MapData has no hash
    index — ``element_at`` on a map is a LINEAR scan of all entries, so
    a sparse-map filter costs O(words) per probe (measured 10 s for
    100 k probe rows at the default size; the array variant is O(1) per
    probe and milliseconds).  At the default m=2^20 the row is 128 KiB;
    size m ≈ 10 bits/key for ~1 % fpp, and shard the filter by key
    range past ~10^9 keys rather than growing one giant row.

    Build cost: a k× narrow fan-out of hashes, one hash-agg down to the
    present words, a broadcast left join onto the 0..n_words index span
    (zeros for absent words), one ordered collect-to-array global agg.
    Only the fixed-size sketch ever leaves the executors.
    """
    n_words = (m_bits + 63) // 64
    probes = done.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(m_bits))
        for i in range(k)])).alias("__pos"))
    words = (probes
             .select(F.floor(F.col("__pos") / 64).cast("int").alias("__w"),
                     F.call_function(
                         "shiftleft", F.lit(1).cast("bigint"),
                         (F.col("__pos") % 64).cast("int")).alias("__mask"))
             .groupBy("__w").agg(F.bit_or("__mask").alias("__bits")))
    span = (done.sparkSession.range(n_words)
            .select(F.col("id").cast("int").alias("__w")))
    dense = (span.join(F.broadcast(words), "__w", "left")
             .select("__w", F.coalesce("__bits", F.lit(0).cast("bigint"))
                     .alias("__bits")))
    return dense.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("__w", "__bits"))),
                    lambda s: s["__bits"]).alias("__bloom"))


def might_contain_expr(bloom, key_col, m_bits: int = 1 << 20,
                       k: int = 5):
    """Column: True iff every one of the k probe bits for ``key_col`` is
    set in the ``bloom`` dense-bitmap column (O(1) array indexing per
    probe).  Out-of-range/absent words coalesce to 0 (an empty done set
    says "definitely not contained" for everything)."""
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), key_col), F.lit(m_bits))
        w = F.floor(pos / 64).cast("int")
        mask = F.call_function("shiftleft", F.lit(1).cast("bigint"),
                               (pos % 64).cast("int"))
        word = F.coalesce(F.try_element_at(bloom, w + F.lit(1)),
                          F.lit(0).cast("bigint"))
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


def split_by_bloom(source: DataFrame, done: DataFrame, key: str,
                   done_key: str | None = None, m_bits: int = 1 << 20,
                   k: int = 5) -> tuple[DataFrame, DataFrame]:
    """(definitely_unprocessed, maybe_done) — the map-side Bloom split.

    ``definitely_unprocessed`` needs NO join (no false negatives);
    ``maybe_done`` is the sliver (true-done rows + ~fpp false positives)
    that still needs the exact anti-join.

    Cost shape: the two legs each scan ``source`` once — two
    column-pruned scans replace one full-width shuffle of the whole
    source, which is the winning trade at 10^12 rows (scan bandwidth is
    the cheap resource; the shuffle is the bottleneck).  The one-row
    bloom DF is persisted so its build (the done-set scan + bit_or agg)
    runs once, not once per leg — verified in PLANS.md: without the
    persist the two broadcast subtrees are NOT exchange-reused."""
    done_key = done_key or key
    bloom = bloom_build(done.select(F.col(done_key).alias("__k")), "__k",
                        m_bits, k).persist()
    tagged = source.crossJoin(F.broadcast(bloom))
    mc = might_contain_expr(F.col("__bloom"), F.col(key), m_bits, k)
    return (tagged.filter(~mc).drop("__bloom"),
            tagged.filter(mc).drop("__bloom"))


def unprocessed_bloom(source: DataFrame, done: DataFrame, key: str,
                      done_key: str | None = None, m_bits: int = 1 << 20,
                      k: int = 5) -> DataFrame:
    """EXACT ``source ∖ done`` on ``key`` with the anti-join shuffle paid
    only by the Bloom-positive sliver.  Equals the plain left_anti row
    for row (oracled as NOT EXISTS in ``queries.py::bloom_gate``)."""
    done_key = done_key or key
    definite, candidates = split_by_bloom(source, done, key, done_key,
                                          m_bits, k)
    done_keys = done.select(F.col(done_key).alias("__dk")).distinct()
    exact = (candidates
             .join(done_keys, candidates[key] == done_keys["__dk"],
                   "left_anti"))
    return definite.unionByName(exact)


def unprocessed(documents: DataFrame, results: DataFrame | None,
                cfg: ExtractConfig) -> DataFrame:
    """Select the work set for a run according to ``cfg.processing_mode``."""
    mode = cfg.processing_mode
    if mode == "reprocess_all":
        out = documents
    elif mode == "reprocess_specific":
        ids = list(cfg.specific_doc_ids)
        if len(ids) <= _ISIN_LIMIT:
            out = documents.filter(F.col("doc_id").isin(ids))
        else:
            ids_df = documents.sparkSession.createDataFrame(
                [(i,) for i in ids], "doc_id string")
            out = documents.join(F.broadcast(ids_df), "doc_id", "left_semi")
    else:  # incremental
        if results is None:
            out = documents
        else:
            done = results.select("doc_id").distinct()
            # Catalyst picks broadcast vs shuffled anti join by size; at
            # 10^12 docs both sides shuffle on doc_id — correct and bounded,
            # unlike the reference's driver-side collect
            out = documents.join(done, "doc_id", "left_anti")
    if cfg.max_docs_per_run:
        # row-level cap is safe HERE: this operator selects work without
        # marking lineage.  The checkpointed job path must use
        # cap_to_buckets instead (a row cut inside a marked bucket is
        # silent data loss on resume).
        out = out.limit(cfg.max_docs_per_run)
    return out

"""Continuous near-dup dedup over a document stream.

The rolling-ingest dedup recursion (``dedup.minhash_index_upsert`` →
``minhash_lsh_pairs_incremental`` → ``merge_components``) driven by
Structured Streaming ``foreachBatch``: each micro-batch of crawl
documents lands in the corpus table, upserts ONLY its own MinHash
signatures into the persisted banded index, generates candidate pairs
delta-vs-all (never corpus²), exact-Jaccard-verifies them, and folds
them into the persisted component labeling via the star-collapse merge.
State between batches is the three tables, not a Spark state store —
restartable, inspectable, and exactly the layout the batch jobs use.

Idempotence under foreachBatch's at-least-once replay: the corpus land
and the index upsert both anti-join the delta against what is already
stored (a replayed batch appends nothing), and the label merge is a
pure function of (index, corpus) state so re-running it rewrites the
same labeling; the label swap itself is the crash-safe
``TableIO.replace_table`` two-rename hop.

Reference analogue: none — the reference's ingestion stream lands files
only (`SURVEY.md §3`); dedup-as-you-ingest is the capability a 100 TB
crawl pipeline actually needs (re-signing the corpus per batch is the
quadratic trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from ..sources.tables import make_table_io

CORPUS_TABLE = "dedup_corpus"
INDEX_TABLE = "minhash_index"
LABELS_TABLE = "dedup_labels"


def dedup_batch(spark: SparkSession, io, batch_df: DataFrame,
                verify_threshold: float = 0.3,
                hash_mode: str = "sha2") -> dict:
    """One rolling-dedup step: absorb a (doc_id, text) delta into the
    corpus/index/labels tables.  Returns control-plane stats."""
    batch_df = batch_df.select("doc_id", "text").localCheckpoint()

    existing = io.read(CORPUS_TABLE)
    if existing is None:
        delta = batch_df
    else:
        delta = batch_df.join(existing.select("doc_id"), "doc_id",
                              "left_anti")
    delta = delta.dropDuplicates(["doc_id"]).localCheckpoint()
    n_new = delta.count()                      # batch-bounded scalar
    if n_new == 0:
        return {"new_docs": 0, "new_pairs": 0}

    if existing is None:
        io.overwrite(delta, CORPUS_TABLE)
    else:
        io.append(delta, CORPUS_TABLE)

    if io.read(INDEX_TABLE) is None:
        dedup.build_minhash_index(delta, io, INDEX_TABLE,
                                  hash_mode=hash_mode)
    else:
        dedup.minhash_index_upsert(io, delta, INDEX_TABLE,
                                   hash_mode=hash_mode)

    corpus = io.read(CORPUS_TABLE)
    pairs = dedup.minhash_lsh_pairs_incremental(
        io, delta.select(F.col("doc_id").alias("id")), INDEX_TABLE,
        docs=corpus, verify_threshold=verify_threshold).localCheckpoint()
    n_pairs = pairs.count()                    # pair-bounded scalar

    old_labels = io.read(LABELS_TABLE)
    if old_labels is None:
        labels = dedup.neardup_components(pairs)
    else:
        labels = dedup.merge_components(old_labels, pairs)
    io.overwrite(labels, LABELS_TABLE + "__staged")
    io.replace_table(LABELS_TABLE + "__staged", LABELS_TABLE)
    return {"new_docs": int(n_new), "new_pairs": int(n_pairs)}


def canonical_docs(io) -> DataFrame:
    """Current deduplicated view: corpus minus every labeled non-
    canonical member (comp != node) — the read side of the rolling
    recursion, same anti-join as the batch curate job."""
    corpus = io.read(CORPUS_TABLE)
    labels = io.read(LABELS_TABLE)
    if labels is None:
        return corpus
    losers = (labels.filter(F.col("comp") != F.col("node"))
              .select(F.col("node").alias("doc_id")))
    return corpus.join(losers, "doc_id", "left_anti")


def start_dedup_stream(spark: SparkSession, input_dir: str,
                       tables_dir: str, checkpoint_dir: str,
                       verify_threshold: float = 0.3,
                       hash_mode: str = "sha2",
                       available_now: bool = True):
    """(doc_id, text) parquet stream → continuously deduplicated
    corpus/index/labels tables."""
    io = make_table_io(spark, tables_dir)
    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", "8")
              .parquet(input_dir))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch(spark, io, batch_df, verify_threshold, hash_mode)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_available(spark: SparkSession, input_dir: str, tables_dir: str,
                    checkpoint_dir: str, **kw) -> None:
    q = start_dedup_stream(spark, input_dir, tables_dir, checkpoint_dir,
                           **kw)
    q.awaitTermination()

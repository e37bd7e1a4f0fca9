"""Multimodal column operators: Spark plumbing is real (schemas, batch
shapes, fan-out, partitioning); the codec itself is a marked stub."""

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(f"m{i}", bytes([i]) * (100 + i * 37)) for i in range(20)]
    return spark.createDataFrame(rows, "name string, content binary").repartition(4)


def test_decode_media_schema_and_determinism(spark, media_df):
    meta = multimodal.decode_media(media_df)
    assert meta.columns == ["media_id", "kind", "byte_size", "format", "width",
                            "height", "duration_ms", "decode_ok", "error_message"]
    rows = meta.collect()
    assert len(rows) == 20 and all(r["decode_ok"] for r in rows)
    # deterministic across runs
    again = {r["media_id"]: (r["format"], r["width"], r["height"])
             for r in multimodal.decode_media(media_df).collect()}
    assert {r["media_id"]: (r["format"], r["width"], r["height"])
            for r in rows} == again
    # empty payload → decode_ok False, pipeline continues
    bad = spark.createDataFrame([("x", None)], "name string, content binary")
    brow = multimodal.decode_media(bad).first()
    assert brow["decode_ok"] is False and brow["error_message"]


def test_real_decoder_is_a_loud_stub():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"xx")


def test_resize_plan_geometry(spark, media_df):
    meta = multimodal.decode_media(media_df)
    plan = multimodal.resize_plan(meta, max_edge=1568)
    for r in plan.collect():
        assert max(r["target_width"], r["target_height"]) <= 1568 + 1
        if r["needs_resize"]:
            assert r["scale"] < 1.0
        else:
            assert (r["target_width"], r["target_height"]) == (r["width"], r["height"])


def test_frame_sample_fanout(spark, media_df):
    frames = multimodal.frame_sample(media_df, every_ms=1000, max_frames=8)
    rows = frames.collect()
    assert rows, "some media decode as video/audio with duration"
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    for mid, fr in per.items():
        idxs = sorted(f["frame_idx"] for f in fr)
        assert idxs == list(range(len(fr))), "dense frame indices"
        assert len(fr) <= 8
        assert all(f["ts_ms"] == f["frame_idx"] * 1000 for f in fr)


def test_embed_media_feeds_similarity(spark, media_df):
    emb = multimodal.embed_media(media_df)
    first = emb.first()
    assert len(first["embedding"]) == multimodal.EMBED_DIM
    # compose with the similarity operator (media near-dup path)
    from databricks_pdf_ocr_spark.operators.similarity import brute_force_topk
    e = emb.withColumnRenamed("media_id", "vec_id")
    q = e.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = brute_force_topk(e, q, k=3, id_col="vec_id")
    got = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)

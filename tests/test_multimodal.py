"""Multimodal plumbing: schema, batch shape, determinism, and the
NotImplementedError gate on the real-decoder path."""

import pytest

from text_search_spark.operators.multimodal import (
    AUDIO_FEAT_DIM,
    IMAGE_FEAT_DIM,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).cache()


def test_image_features(spark, media):
    rows = extract_features(media, "image").collect()
    assert len(rows) == 16
    assert all(len(r.feature) == IMAGE_FEAT_DIM for r in rows)
    # deterministic across runs
    again = extract_features(media, "image").collect()
    assert {r.media_id: r.feature for r in rows} == {
        r.media_id: r.feature for r in again
    }


def test_audio_features(spark, media):
    rows = extract_features(media, "audio").collect()
    assert len(rows) == 16
    assert all(len(r.feature) == AUDIO_FEAT_DIM for r in rows)


def test_real_decoder_gate(spark, media):
    with pytest.raises(Exception) as e:
        extract_features(media, "image", deterministic=False).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=1000).collect()
    vids = {r.media_id for r in plan}
    assert vids  # every third media row is a video
    by_id = {}
    for r in plan:
        by_id.setdefault(r.media_id, []).append(r.frame_ts_ms)
    for mid, ts in by_id.items():
        assert ts == sorted(ts)
        assert ts[0] == 0
        assert all(b - a == 1000 for a, b in zip(ts, ts[1:]))


def test_features_feed_ann(spark, media):
    """Extracted features plug straight into the ANN operator."""
    from pyspark.sql import functions as F

    from text_search_spark.operators import ann

    feats = extract_features(media, "image").withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    qs = feats.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ann.cosine_topk(feats, qs, k=3)
    rows = out.collect()
    assert len(rows) > 0 and all(r.rank <= 3 for r in rows)

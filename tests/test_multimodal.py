"""Multimodal column plumbing (decode is a documented STUB; the Spark
contract — schema, Arrow batching, explode planning — is real)."""

from zef_spark.pipeline.multimodal import (extract_features,
                                           frame_sample_plan, resize_meta,
                                           synthetic_media)


def test_extract_features(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] == 128 for r in rows)
    by_id = {r["media_id"]: r["feature"] for r in rows}
    again = {r["media_id"]: r["feature"]
             for r in extract_features(media, dim=8).collect()}
    assert by_id == again  # deterministic


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    assert rows and all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    # every video contributes ≥1 frame
    vids = media.where("media_type = 'video'").count()
    assert frames.select("media_id").distinct().count() == vids


def test_resize_meta(spark):
    media = synthetic_media(spark, 30).where("media_type = 'image'")
    out = resize_meta(media, max_side=512).collect()
    for r in out:
        assert r["target_w"] <= 512 + 1 or r["target_h"] <= 512 + 1
        assert 0 < r["resize_scale"] <= 1.0

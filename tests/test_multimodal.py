"""Multimodal columns: REAL decode for PPM/BMP/WAV (r11, pure-Python
codecs) + the Spark contract — schema, Arrow batching, explode
planning. Compressed codecs still route to the documented stub."""

from zef_spark.pipeline.multimodal import (extract_features,
                                           frame_sample_plan, resize_meta,
                                           synthetic_media)


def test_extract_features_real_decode(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media, dim=9)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 9 for r in rows)
    by_id = {r["media_id"]: r for r in rows}
    # image features are REAL channel means from the generating
    # formula rgb[j] = (i*7 + j*13) % 256 — computed here
    # independently of the decoder's byte parsing
    for i in range(0, 30, 6):  # every PPM image (i%3==0, i%2==0)
        px = [(i * 7 + j * 13) % 256 for j in range(8 * 6 * 3)]
        want_r = sum(px[0::3]) / 48
        f = by_id[i]["feature"]
        assert f[0] == 8.0 and f[1] == 6.0  # width, height
        assert abs(f[3] - want_r) < 1e-12
        assert by_id[i]["codec"] == "ppm"
    # BMP images decode to the SAME pixels as their PPM siblings
    # would (same formula) — bottom-up/BGR/padding all unwound
    for i in range(3, 30, 6):  # i%3==0, i%2==1 → BMP
        px = [(i * 7 + j * 13) % 256 for j in range(8 * 6 * 3)]
        want_g = sum(px[1::3]) / 48
        assert abs(by_id[i]["feature"][4] - want_g) < 1e-12
        assert by_id[i]["codec"] == "bmp"
    # audio: sr/nch/n + exact-int mean of the sample formula
    for i in range(1, 30, 3):
        s = [(i * 13 + j * 7) % 2003 - 1001 for j in range(64)]
        f = by_id[i]["feature"]
        assert f[0] == 16000.0 and f[1] == 1.0 and f[2] == 64.0
        assert abs(f[3] - sum(s) / 64) < 1e-12
        assert by_id[i]["codec"] == "wav"
    # video (no dependency-free container parser) → stub fallback
    assert all(by_id[i]["codec"] == "stub" for i in range(2, 30, 3))
    again = {r["media_id"]: r["feature"]
             for r in extract_features(media, dim=9).collect()}
    assert {k: v["feature"] for k, v in by_id.items()} == again


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

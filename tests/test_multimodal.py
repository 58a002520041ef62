"""Multimodal plumbing tests: schema, batch flow, deterministic fake
decode, and the real-decoder stub contract."""

import numpy as np
import pytest

from website_indexer_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    return mm.synth_media(spark, n=30)


def test_media_schema(media_df):
    assert media_df.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media_df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features(spark, media_df):
    feats = mm.image_features(media_df, thumb=4).collect()
    n_images = media_df.filter("kind = 'image'").count()
    assert len(feats) == n_images
    for r in feats:
        assert 0 <= r["mean_luma"] <= 255
        assert len(r["histogram"]) == 16
        assert sum(r["histogram"]) > 0
        assert len(r["thumbnail"]) == 4 * 4 * 3  # HxWx3 uint8 raw


def test_image_features_deterministic(spark, media_df):
    a = sorted((r["media_id"], r["mean_luma"]) for r in mm.image_features(media_df).collect())
    b = sorted((r["media_id"], r["mean_luma"]) for r in mm.image_features(media_df).collect())
    assert a == b


def test_audio_features(spark, media_df):
    feats = mm.audio_features(media_df).collect()
    assert len(feats) == media_df.filter("kind = 'audio'").count()
    for r in feats:
        assert r["duration_s"] == pytest.approx(0.1)  # 1600 / 16000
        assert r["rms"] > 0
        assert r["zero_crossings"] > 0


def test_sample_frames(spark, media_df):
    frames = mm.sample_frames(media_df, every=4).collect()
    assert len(frames) > 0
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
        assert r["frame_idx"] % 4 == 0
        assert len(r["frame"]) == r["frame_w"] * r["frame_h"] * 3
    metas = {
        r["media_id"]: r["meta"]
        for r in media_df.filter("kind = 'video'").collect()
    }
    for mid, rows in by_media.items():
        expect = -(-metas[mid]["n_frames"] // 4)  # ceil
        assert len(rows) == expect


def test_real_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"bytes", "image")


def test_fake_decode_shapes():
    meta = {"width": 8, "height": 6, "channels": 3, "sample_rate": None,
            "n_frames": None, "format": "fake-png"}
    img = mm._decode_fake(b"payload", "image", meta)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8
    # same payload => same pixels
    assert (img == mm._decode_fake(b"payload", "image", meta)).all()
    assert not (img == mm._decode_fake(b"other", "image", meta)).all()


def test_media_from_documents_and_payload_stats(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "")],
        ["doc_id", "text"],
    )
    media = mm.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    got = {r["media_id"]: r for r in mm.payload_stats(media).collect()}
    for doc_id, text in [(1, "hello world"), (2, "spark engine"), (3, "")]:
        assert got[doc_id]["n_bytes"] == len(text.encode())
        assert got[doc_id]["payload_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_media_features_gate_shape(spark):
    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(6)], ["doc_id", "text"]
    )
    media = mm.media_from_documents(docs)
    feats = mm.image_features(media, thumb=8).collect()
    assert len(feats) == 6
    # decode dims come from the doc_id-shaped meta, not the payload
    assert all(r["thumb_w"] == 8 and r["thumb_h"] == 8 for r in feats)
    # deterministic: same payload+meta => identical features
    again = mm.image_features(media, thumb=8).collect()
    assert {(r["media_id"], r["mean_luma"]) for r in feats} == {
        (r["media_id"], r["mean_luma"]) for r in again
    }

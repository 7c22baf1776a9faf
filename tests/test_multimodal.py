"""Multimodal plumbing tests: schema, Arrow batch path, frame sampling,
payload-pruned stats — with the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from airbnb_pyspark_jobs_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    media_stats,
    repartition_by_bytes,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(
            media_id=i,
            payload=bytes([i % 251] * (100 + i * 10)),
            meta=Row(
                modality="video" if i % 3 == 0 else "image",
                mime="video/mp4" if i % 3 == 0 else "image/png",
                width=64,
                height=64,
                n_frames=25 if i % 3 == 0 else 1,
                sample_rate=None,
            ),
        )
        for i in range(12)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batch_path(media):
    out = extract_features(media, feature_dims=8).collect()
    assert len(out) == 12
    by_id = {r.media_id: r for r in out}
    assert by_id[0].n_bytes == 100
    assert len(by_id[0].feature) == 8
    # deterministic fake: constant payload byte -> constant feature
    assert all(abs(v - 0 / 255.0) < 1e-12 for v in by_id[0].feature)
    assert by_id[5].feature[0] == pytest.approx(5 / 255.0)
    assert all(r.decoder == "fake" for r in out)


def test_extract_features_deterministic_rerun(media):
    a = sorted(map(tuple, extract_features(media).collect()))
    b = sorted(map(tuple, extract_features(media).collect()))
    assert a == b


def test_sample_frames(media):
    frames = sample_frames(media, every_nth=10).collect()
    # videos are ids 0,3,6,9 with 25 frames -> indices 0,10,20
    got = sorted((r.media_id, r.frame_idx) for r in frames)
    assert got == [(i, f) for i in (0, 3, 6, 9) for f in (0, 10, 20)]


def test_media_stats_prunes_payload(media):
    stats = {r.modality: r for r in media_stats(media).collect()}
    assert stats["video"].n_items == 4
    assert stats["image"].n_items == 8
    # payload-length sums are exact
    assert stats["video"].total_bytes == sum(100 + i * 10 for i in (0, 3, 6, 9))


def test_repartition_by_bytes(media):
    out = repartition_by_bytes(media, target_bytes_per_partition=500)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 12


def test_codec_present_dispatches_real_decoder(media, monkeypatch):
    """With HAVE_CODECS=True the real decoder runs (not a raise): inject
    a PIL-free stand-in for _codec_decode_feature and check it is picked
    up driver-side and labeled 'real'."""
    from airbnb_pyspark_jobs_spark.operators import multimodal as MM

    def stand_in(payload, dims=8):
        return [float(len(payload) % 7)] * dims

    monkeypatch.setattr(MM, "HAVE_CODECS", True)
    monkeypatch.setattr(MM, "_codec_decode_feature", stand_in)
    out = MM.extract_features(media, feature_dims=4).collect()
    assert len(out) == 12
    assert all(r.decoder == "real" for r in out)
    by_id = {r.media_id: r for r in out}
    assert by_id[0].feature == [float(100 % 7)] * 4


def test_resize_images_fake_path(media, spark):
    from airbnb_pyspark_jobs_spark.operators.multimodal import resize_images

    out = resize_images(media, width=4, height=4).collect()
    # fixture: ids not divisible by 3 are images (8 of 12)
    assert len(out) == 8
    assert all(len(r.thumb) == 16 for r in out)
    assert all(r.decoder == "fake" for r in out)
    # deterministic: constant payload byte -> constant thumb
    by_id = {r.media_id: r for r in out}
    assert set(by_id[1].thumb) == {1 % 251}


def test_resize_dispatches_injected_real_resizer(media, monkeypatch):
    from airbnb_pyspark_jobs_spark.operators import multimodal as MM

    def stand_in(payload, width, height):
        return bytes([7]) * (width * height)

    monkeypatch.setattr(MM, "HAVE_CODECS", True)
    monkeypatch.setattr(MM, "_codec_resize", stand_in)
    out = MM.resize_images(media, width=2, height=2).collect()
    assert all(r.decoder == "real" and r.thumb == bytes([7] * 4) for r in out)


def test_audio_frame_windows(spark):
    from pyspark.sql import Row

    from airbnb_pyspark_jobs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_frame_windows,
    )

    rows = [
        Row(
            media_id=i,
            payload=bytes(n),
            meta=Row(
                modality="audio",
                mime="audio/wav",
                width=None,
                height=None,
                n_frames=None,
                sample_rate=16000,
            ),
        )
        for i, n in [(1, 1000), (2, 300), (3, 400)]
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sorted(
        (r.media_id, r.win_idx, r.start_sample)
        for r in audio_frame_windows(df, frame_samples=400, hop_samples=160).collect()
    )
    # 1000 samples: floor((1000-400)/160) = 3 -> windows 0..3, starts
    # 0/160/320/480 (480+400 <= 1000 still a full frame)
    assert [t for t in out if t[0] == 1] == [(1, i, i * 160) for i in range(4)]
    # short clip (300 < frame): one window at 0
    assert [t for t in out if t[0] == 2] == [(2, 0, 0)]
    # exactly one frame
    assert [t for t in out if t[0] == 3] == [(3, 0, 0)]

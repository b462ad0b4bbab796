"""Multimodal plumbing: binary payload decode via mapInPandas (stubbed codec)."""

import pytest

from sparvi_core_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    make_synthetic_payload,
    media_quality_summary,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", make_synthetic_payload(0, 640, 480)),
        (1, "image", make_synthetic_payload(1, 1920, 1080)),
        (2, "audio", make_synthetic_payload(2, 1, 16000)),
        (3, "image", b"not-a-real-payload"),
        (4, "image", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_schema_and_values(media):
    out = decode_media(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "payload", "width", "height", "n_bytes", "valid",
    ]
    got = {r["media_id"]: r for r in out.collect()}
    assert (got[0]["width"], got[0]["height"]) == (640, 480)
    assert (got[1]["width"], got[1]["height"]) == (1920, 1080)
    assert got[3]["valid"] == "corrupt"
    assert got[4]["valid"] == "corrupt" and got[4]["n_bytes"] == 0


def test_quality_summary(media):
    s = {r["kind"]: r for r in media_quality_summary(decode_media(media)).collect()}
    assert s["image"]["n"] == 4
    assert s["image"]["n_corrupt"] == 2
    assert s["image"]["max_width"] == 1920
    assert s["audio"]["n_corrupt"] == 0


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, decoder="real")
    with pytest.raises(ValueError):
        decode_media(media, decoder="nope")


def test_resize_roundtrip(media):
    """Resize then decode: valid payloads carry the new dims, schema is
    unchanged, corrupt payloads pass through for accounting."""
    resized = resize_media(media, 320, 240)
    assert resized.schema == media.schema
    got = {r["media_id"]: r for r in decode_media(resized).collect()}
    for mid in (0, 1, 2):
        assert (got[mid]["width"], got[mid]["height"]) == (320, 240)
        assert got[mid]["valid"] == "ok"
    assert got[3]["valid"] == "corrupt"  # untouched
    assert got[4]["valid"] == "corrupt"


def test_resize_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        resize_media(media, 320, 240, decoder="real")


def test_sample_frames(media):
    out = sample_frames(media.filter("media_id = 0"), every_n=100)
    rows = out.collect()
    assert len(rows) >= 1
    assert all(r["byte_offset"] == r["frame_idx"] * 100 for r in rows)

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


def test_extract_features_deterministic_and_unit_norm(spark, media):
    import math

    from sparvi_core_spark.operators.multimodal import extract_features

    out = extract_features(media, dim=8)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert all(len(v) == 8 for v in rows.values())
    # unit norm for valid payloads, zero vector for corrupt/None
    for mid, v in rows.items():
        n = math.sqrt(sum(x * x for x in v))
        assert n == 0.0 or abs(n - 1.0) < 1e-5
    assert rows[3] == [0.0] * 8 and rows[4] == [0.0] * 8
    again = {
        r["media_id"]: r["features"]
        for r in extract_features(media, dim=8).collect()
    }
    assert rows == again


def test_extract_features_identical_payloads_embed_identically(spark):
    from sparvi_core_spark.operators.multimodal import extract_features

    p = make_synthetic_payload(7, 64, 48)
    df = spark.createDataFrame(
        [(1, "image", p), (2, "image", p), (3, "image", b"not-media")],
        MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r["features"]
        for r in extract_features(df, dim=4).collect()
    }
    assert rows[1] == rows[2]
    assert rows[3] == [0.0, 0.0, 0.0, 0.0]


def test_extract_features_feeds_similarity_operators(spark):
    """The produced column is directly consumable by the ANN surface —
    media near-dup = extract_features -> embedding_near_duplicates."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.operators.multimodal import extract_features
    from sparvi_core_spark.operators.similarity import embedding_near_duplicates

    p1 = make_synthetic_payload(1, 64, 48)
    p2 = make_synthetic_payload(2, 32, 32)
    df = spark.createDataFrame(
        [(1, "image", p1), (2, "image", p1), (3, "image", p2)], MEDIA_SCHEMA
    )
    feats = extract_features(df, dim=8).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    pairs = embedding_near_duplicates(
        feats, threshold=0.99, bucket_col=None
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_extract_features_rejects_bad_args(spark, media):
    from sparvi_core_spark.operators.multimodal import extract_features

    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="real")
    with pytest.raises(ValueError):
        extract_features(media, dim=0)

"""Multimodal plumbing: binary payload decode via mapInPandas.

The metadata-stub decoder is pinned unconditionally; the Pillow-backed
real decoder is skip-gated on the ``[media]`` extra being installed
(mirrors the protobuf gating of the TWS streaming tests).
"""

import pytest

from sparvi_core_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    make_synthetic_payload,
    media_quality_summary,
    pil_available,
    resize_media,
    sample_frames,
)

needs_pil = pytest.mark.skipif(
    not pil_available(), reason="Pillow not installed (media extra)"
)
needs_no_pil = pytest.mark.skipif(
    pil_available(), reason="decoder='real' only raises without Pillow"
)


def _png_bytes(width: int, height: int, pattern: str = "h") -> bytes:
    """A real PNG with a smooth deterministic gradient.

    ``"h"`` ramps left→right, ``"v"`` top→bottom.  Mean-centered, the
    two patterns are exactly uncorrelated (separable ramps), so the
    perceptual-feature assertions below hold by construction rather
    than by tuned thresholds — important because these tests only run
    where Pillow is installed.
    """
    import io

    from PIL import Image

    im = Image.new("L", (width, height))
    if pattern == "h":
        im.putdata(
            [
                (i % width) * 255 // max(width - 1, 1)
                for i in range(width * height)
            ]
        )
    else:
        im.putdata(
            [
                (i // width) * 255 // max(height - 1, 1)
                for i in range(width * height)
            ]
        )
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


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


@needs_no_pil
def test_real_decoder_raises_without_pillow(media):
    with pytest.raises(NotImplementedError, match="media"):
        decode_media(media, decoder="real")


def test_unknown_decoder_rejected(media):
    with pytest.raises(ValueError):
        decode_media(media, decoder="nope")


def test_auto_decoder_resolves(media):
    """decoder='auto' always yields a working decoder: the metadata
    stub here (no Pillow), the real codec when the extra is installed
    — either way the SPV0 fixture decodes or is flagged, never raises."""
    got = {r["media_id"]: r for r in decode_media(media, decoder="auto").collect()}
    if pil_available():
        # synthetic SPV0 blobs are not real images for the real codec
        assert got[0]["valid"] == "corrupt"
    else:
        assert (got[0]["width"], got[0]["height"]) == (640, 480)
    assert got[4]["valid"] == "corrupt"


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


@needs_no_pil
def test_resize_real_decoder_raises_without_pillow(media):
    with pytest.raises(NotImplementedError, match="media"):
        resize_media(media, 320, 240, decoder="real")


@pytest.fixture(scope="module")
def png_media(spark):
    if not pil_available():
        pytest.skip("Pillow not installed (media extra)")
    rows = [
        (0, "image", _png_bytes(64, 48, "h")),
        (1, "image", _png_bytes(128, 96, "v")),
        (2, "image", b"not-an-image"),
        (3, "image", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@needs_pil
def test_real_decode_reads_png_dims(png_media):
    got = {
        r["media_id"]: r
        for r in decode_media(png_media, decoder="real").collect()
    }
    assert (got[0]["width"], got[0]["height"]) == (64, 48)
    assert (got[1]["width"], got[1]["height"]) == (128, 96)
    assert got[2]["valid"] == "corrupt"
    assert got[3]["valid"] == "corrupt" and got[3]["n_bytes"] == 0


@needs_pil
def test_real_resize_roundtrip(png_media):
    resized = resize_media(png_media, 32, 24, decoder="real")
    assert resized.schema == png_media.schema
    got = {
        r["media_id"]: r
        for r in decode_media(resized, decoder="real").collect()
    }
    for mid in (0, 1):
        assert (got[mid]["width"], got[mid]["height"]) == (32, 24)
        assert got[mid]["valid"] == "ok"
    assert got[2]["valid"] == "corrupt"  # untouched
    assert got[3]["valid"] == "corrupt"


@needs_pil
def test_real_features_are_perceptual(spark):
    """Pixel-statistics features: a downscaled copy of an image stays
    near cosine 1 with the original; a structurally different image
    does not — so the vectors drive perceptual near-dup matching."""
    import math

    from sparvi_core_spark.operators.multimodal import extract_features

    base = _png_bytes(64, 48, "h")
    rows = [
        (0, "image", base),
        (1, "image", base),  # exact re-use
        (2, "image", _png_bytes(640, 480, "v")),  # orthogonal structure
        (3, "image", b"junk"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    # add a genuinely resized copy of the base image
    small = resize_media(
        spark.createDataFrame([(4, "image", base)], MEDIA_SCHEMA),
        32,
        24,
        decoder="real",
    )
    feats = extract_features(df.unionByName(small), dim=16, decoder="real")
    got = {r["media_id"]: r["features"] for r in feats.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    assert got[0] == got[1]  # identical bytes → identical vector
    assert cos(got[0], got[4]) > 0.95  # resized copy → near-dup
    assert cos(got[0], got[2]) < 0.9  # different image → not a dup
    assert got[3] == [0.0] * 16  # corrupt → zero vector


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

    if not pil_available():
        with pytest.raises(NotImplementedError):
            extract_features(media, decoder="real")
    with pytest.raises(ValueError):
        extract_features(media, dim=0)


# --- real-codec kernels under a faked PIL --------------------------------
# The PIL-backed kernels are module-level precisely so this works: a
# minimal in-process PIL fake exercises their control flow (corrupt
# handling, round-trip, normalization math) even where the media extra
# isn't installed. Where real Pillow IS installed, the @needs_pil tests
# above exercise the same kernels against the real codec.


class _FakeImg:
    """Grayscale image; container format: FAKEPNG + dims + raw bytes."""

    def __init__(self, w, h, data):
        self.width, self.height = w, h
        self._data = data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, mode):
        return self

    def resize(self, size, resample=None):
        w2, h2 = size
        out = [
            self._data[
                min(y * self.height // h2, self.height - 1) * self.width
                + min(x * self.width // w2, self.width - 1)
            ]
            for y in range(h2)
            for x in range(w2)
        ]
        return _FakeImg(w2, h2, out)

    def save(self, buf, format=None):
        buf.write(
            b"FAKEPNG"
            + self.width.to_bytes(2, "big")
            + self.height.to_bytes(2, "big")
            + bytes(v % 256 for v in self._data)
        )

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        arr = np.array(self._data, dtype=np.uint8).reshape(self.height, self.width)
        return arr.astype(dtype) if dtype is not None else arr


class _FakeImageMod:
    BILINEAR = 2

    @staticmethod
    def open(fp):
        b = fp.read()
        if not b.startswith(b"FAKEPNG"):
            raise OSError("cannot identify image file")
        w = int.from_bytes(b[7:9], "big")
        h = int.from_bytes(b[9:11], "big")
        return _FakeImg(w, h, list(b[11 : 11 + w * h]))


@pytest.fixture
def fake_pil(monkeypatch):
    import sys
    import types

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    for name in ("BILINEAR", "open"):
        setattr(image_mod, name, getattr(_FakeImageMod, name))
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def _fake_png(w, h, data=None):
    import io

    buf = io.BytesIO()
    _FakeImg(w, h, data or [(i * 7) % 256 for i in range(w * h)]).save(buf)
    return buf.getvalue()


def test_real_kernels_under_fake_pil(fake_pil):
    from sparvi_core_spark.operators.multimodal import (
        _dims_real,
        _embed_one_real,
        _resize_one_real,
        _resolve_decoder,
        pil_available,
    )

    assert pil_available()
    assert _resolve_decoder("auto", "t") == "real"

    img = _fake_png(10, 6)
    assert _dims_real(img) == (10, 6)
    assert _dims_real(b"junk") is None

    # resize: round-trips through the codec with the new dims
    small = _resize_one_real(img, 4, 3)
    assert _dims_real(small) == (4, 3)
    assert _resize_one_real(b"junk", 4, 3) == b"junk"  # passthrough

    # embed: unit norm, deterministic, corrupt -> zeros, flat -> zeros
    import math

    v = _embed_one_real(img, 4, 2)
    assert len(v) == 4
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    assert v == _embed_one_real(img, 4, 2)
    assert _embed_one_real(b"junk", 4, 2) == [0.0] * 4
    flat = _fake_png(8, 8, data=[100] * 64)
    assert _embed_one_real(flat, 4, 2) == [0.0] * 4


# --- REAL audio: stdlib-wave WAV decode (no skips, no extras) ----------


def test_decode_audio_real_wav(spark):
    """decode_audio parses ACTUAL RIFF/WAVE containers generated by
    stdlib wave — rates, channel counts, frame counts, durations all
    exact; corrupt payloads get zeros + valid='corrupt'."""
    from sparvi_core_spark.operators.multimodal import (
        decode_audio,
        make_wav_payload,
    )

    rows = [
        (0, "audio", make_wav_payload(0, seconds=0.25, rate=8000)),
        (1, "audio", make_wav_payload(1, seconds=0.5, rate=16000, channels=2)),
        (2, "audio", make_wav_payload(2, seconds=0.1, rate=8000, sampwidth=1)),
        (3, "audio", b"not audio at all"),
        (4, "audio", None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert (got[0]["sample_rate"], got[0]["n_channels"]) == (8000, 1)
    assert got[0]["n_frames"] == 2000
    assert abs(got[0]["duration_s"] - 0.25) < 1e-6
    assert (got[1]["sample_rate"], got[1]["n_channels"]) == (16000, 2)
    assert got[1]["n_frames"] == 8000
    assert got[2]["sample_rate"] == 8000 and got[2]["valid"] == "ok"
    for bad in (3, 4):
        assert got[bad]["valid"] == "corrupt"
        assert got[bad]["sample_rate"] == 0 and got[bad]["duration_s"] == 0.0
    assert got[4]["n_bytes"] == 0 and got[3]["n_bytes"] == len(rows[3][2])


def test_audio_features_real_and_feed_similarity(spark):
    """Windowed-RMS features from REAL WAV decode: unit-norm,
    deterministic, identical signals embed identically across
    channel-layout re-renders, and the vectors drop straight into
    embedding_near_duplicates — the audio analog of the perceptual
    image dedup path. Silence and corrupt bytes embed to zero."""
    import math

    from pyspark.sql import functions as F

    from sparvi_core_spark.operators.multimodal import (
        extract_audio_features,
        make_wav_payload,
    )
    from sparvi_core_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    mono = make_wav_payload(5, seconds=0.25, rate=8000)
    # the same mono signal duplicated into two channels: the mixdown
    # reproduces it, so the energy envelope — and the features — match
    import io
    import wave

    with wave.open(io.BytesIO(mono)) as w:
        frames = w.readframes(w.getnframes())
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        stereo_frames = b"".join(
            frames[i : i + 2] * 2 for i in range(0, len(frames), 2)
        )
        w.writeframes(stereo_frames)
    stereo = buf.getvalue()

    import struct

    silence = io.BytesIO()
    with wave.open(silence, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<1000h", *([0] * 1000)))

    rows = [
        (0, "audio", mono),
        (1, "audio", stereo),
        (2, "audio", make_wav_payload(77, seconds=0.25, rate=8000)),
        (3, "audio", silence.getvalue()),
        (4, "audio", b"corrupt"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in extract_audio_features(df, dim=16).collect()
    }
    for mid, v in feats.items():
        n = math.sqrt(sum(x * x for x in v))
        if mid in (3, 4):
            assert v == [0.0] * 16  # silent / corrupt: zero vector
        else:
            assert abs(n - 1.0) < 1e-5

    vec = extract_audio_features(df, dim=16).select(
        F.col("media_id").alias("vec_id"), F.lit(0).alias("label"), "features"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            vec, threshold=0.98, vec_col="features", bucket_col="label"
        ).collect()
    }
    assert (0, 1) in pairs  # channel-layout re-render = near-dup
    assert all(p in ((0, 1),) or 2 not in p for p in pairs)

    import pytest

    with pytest.raises(ValueError, match="dim"):
        extract_audio_features(df, dim=0)


# --- REAL video: stdlib-struct uncompressed-AVI decode (no skips) ------


def test_avi_kernels_pixel_exact():
    """The codec kernels against the generator's pinned pixel formula:
    a genuine RIFF/AVI chunk tree round-trips through header parse and
    per-frame DIB decode (bottom-up flip + stride unpadding) to the
    exact pixel values — no Spark, no mocks."""
    import numpy as np

    from sparvi_core_spark.operators.multimodal import (
        _video_frame_offsets_avi,
        _video_frames_avi,
        _video_info_avi,
        make_avi_payload,
    )

    w, h, nf, fps = 13, 9, 5, 25  # w*3 = 39: stride padding exercised
    b = make_avi_payload(7, n_frames=nf, width=w, height=h, fps=fps)
    info = _video_info_avi(b)
    assert info == (w, h, float(fps), nf, 24, 0)
    assert len(_video_frame_offsets_avi(b)) == nf
    frames = _video_frames_avi(b)
    assert [i for i, _ in frames] == list(range(nf))
    y, x = np.mgrid[0:h, 0:w]
    for i, gray in frames:
        expect = ((6 * x + 7 * y + 13 * 7 + 29 * i) % 256).astype(np.float64)
        assert gray.shape == (h, w)
        np.testing.assert_allclose(gray, expect)

    # selective decode touches only the requested chunk indices
    sel = _video_frames_avi(b, [0, 3])
    assert [i for i, _ in sel] == [0, 3]
    # non-AVI / non-RIFF / truncated-header payloads → None
    assert _video_info_avi(b"garbage") is None
    assert _video_info_avi(b"RIFF\x10\x00\x00\x00WAVE") is None
    assert _video_frames_avi(b"\x00" * 64) is None


def test_decode_video_real_avi(spark):
    """decode_video parses ACTUAL RIFF/AVI containers: dims, fps,
    frame counts, durations all exact; corrupt payloads get zeros +
    valid='corrupt'. Header-only — works on any frame codec."""
    from sparvi_core_spark.operators.multimodal import (
        decode_video,
        make_avi_payload,
    )

    rows = [
        (0, "video", make_avi_payload(0, n_frames=10, width=16, height=12, fps=10)),
        (1, "video", make_avi_payload(1, n_frames=4, width=8, height=8, fps=25)),
        (2, "video", b"not video at all"),
        (3, "video", None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_video(df).collect()}
    assert (got[0]["width"], got[0]["height"]) == (16, 12)
    assert got[0]["n_frames"] == 10 and abs(got[0]["fps"] - 10.0) < 1e-6
    assert abs(got[0]["duration_s"] - 1.0) < 1e-6
    assert (got[1]["width"], got[1]["n_frames"]) == (8, 4)
    assert abs(got[1]["duration_s"] - 0.16) < 1e-6
    for bad in (2, 3):
        assert got[bad]["valid"] == "corrupt"
        assert got[bad]["width"] == 0 and got[bad]["n_frames"] == 0
    assert got[3]["n_bytes"] == 0 and got[2]["n_bytes"] == len(rows[2][2])


def test_sample_video_frames_real(spark):
    """sample_video_frames decodes exactly the sampled frames: row per
    frame index 0, n, 2n, … with exact timestamps and unit-norm
    per-frame features; the payload column is dropped (by design —
    exploding it would multiply corpus bytes by the frame count);
    corrupt payloads emit zero rows."""
    import math

    from sparvi_core_spark.operators.multimodal import (
        make_avi_payload,
        sample_video_frames,
    )

    rows = [
        (0, "video", make_avi_payload(0, n_frames=10, fps=10)),
        (1, "video", b"corrupt"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_video_frames(df, every_n=3, dim=9).collect()
    assert "payload" not in out[0].asDict()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert 1 not in by_id  # corrupt: zero rows
    got = sorted(by_id[0], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in got] == [0, 3, 6, 9]
    for r in got:
        assert abs(r["time_s"] - r["frame_idx"] / 10.0) < 1e-6
        n = math.sqrt(sum(v * v for v in r["features"]))
        assert abs(n - 1.0) < 1e-5 or n == 0.0

    with pytest.raises(ValueError, match="every_n"):
        sample_video_frames(df, every_n=0)


def test_video_features_real_and_feed_similarity(spark):
    """Temporally-pooled aHash features from REAL AVI decode:
    unit-norm, deterministic, identical pixels re-muxed at a different
    fps embed identically (frame content is what's pooled), and the
    vectors drop straight into embedding_near_duplicates — the video
    analog of the perceptual image/audio dedup paths. Corrupt bytes
    embed to zero."""
    import math
    import struct

    from pyspark.sql import functions as F

    from sparvi_core_spark.operators.multimodal import (
        extract_video_features,
        make_avi_payload,
    )
    from sparvi_core_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    clip = make_avi_payload(5, n_frames=8, fps=10)
    # re-mux: same pixels, different container timing (fps 10 → 30).
    # the generator is deterministic, so rebuild + patch the rate
    # fields: dwMicroSecPerFrame (avih) and dwRate (strh)
    remux = bytearray(make_avi_payload(5, n_frames=8, fps=10))
    pos = remux.find(b"avih") + 8
    struct.pack_into("<I", remux, pos, 1_000_000 // 30)
    pos = remux.find(b"strh") + 8 + 8 + 16  # fourccs + flags..initial
    struct.pack_into("<2I", remux, pos, 1, 30)
    remux = bytes(remux)
    assert remux != clip

    rows = [
        (0, "video", clip),
        (1, "video", remux),
        (2, "video", make_avi_payload(77, n_frames=8, fps=10)),
        (3, "video", b"corrupt"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in extract_video_features(df, dim=16).collect()
    }
    assert feats[3] == [0.0] * 16
    for mid in (0, 1, 2):
        n = math.sqrt(sum(v * v for v in feats[mid]))
        assert abs(n - 1.0) < 1e-5
    assert feats[0] == feats[1]  # same pixels, different mux

    vec = extract_video_features(df, dim=16).select(
        F.col("media_id").alias("vec_id"), F.lit(0).alias("label"), "features"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            vec, threshold=0.98, vec_col="features", bucket_col="label"
        ).collect()
    }
    assert (0, 1) in pairs  # re-mux = near-dup

    with pytest.raises(ValueError, match="dim"):
        extract_video_features(df, dim=0)
    with pytest.raises(ValueError, match="max_frames"):
        extract_video_features(df, max_frames=0)

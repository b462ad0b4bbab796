"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video in a 100 TB Spark pipeline: the payload
is an opaque ``binary`` column; decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` (one Python worker per partition, vectorized
batch transfer) — never row-at-a-time UDFs.

Decoder selection (per operator, via ``decoder=``):

* ``"metadata"`` — deterministic stub: parses this module's synthetic
  ``SPV0`` header.  Always available; what the test suite pins.
* ``"real"`` — Pillow-backed image codec (``pip install
  sparvi-core-spark[media]``): real decode, real pixel resample, real
  perceptual features.  Raises with an install hint if Pillow is not
  importable.  Audio/video codecs (pyav/torchaudio) plug into the same
  batch loops but are not bundled.
* ``"auto"`` — ``"real"`` when Pillow imports on the driver, else the
  ``"metadata"`` stub.  The choice is resolved driver-side and baked
  into the serialized batch function, so a heterogeneous cluster can't
  split-brain between executors.

Audio is REAL with zero dependencies: ``decode_audio`` /
``extract_audio_features`` parse PCM WAV payloads with stdlib
``wave`` + NumPy (no ``audioop`` — removed in Python 3.13) — genuine
decode, duration/sample-rate stats, and windowed-RMS energy features
that feed the ANN/dedup surface exactly like the image features.
Other audio containers (mp3/flac) and video plug into the same batch
loops via the ``[media]`` extra pattern but are not bundled.

The Spark-side plumbing — schema, batch iteration, partition sizing —
is identical across decoders and is what the tests pin; the real-codec
tests are skip-gated on Pillow like the protobuf-gated streaming tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# header: b"SPV0" + 2-byte width + 2-byte height + payload
MAGIC = b"SPV0"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("valid", StringType()),
]


def make_synthetic_payload(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake media blob (tests / fixtures)."""
    body = bytes((media_id * 31 + i) % 256 for i in range(width * height % 4096))
    return MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big") + body


def pil_available() -> bool:
    """True if Pillow imports (the ``[media]`` extra is installed)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_decoder(decoder: str, op: str) -> str:
    """Resolve ``auto`` driver-side and validate the decoder name.

    Resolution happens once on the driver so the serialized batch
    function is the same on every executor regardless of what happens
    to be pip-installed there.
    """
    if decoder == "auto":
        return "real" if pil_available() else "metadata"
    if decoder == "real":
        if not pil_available():
            raise NotImplementedError(
                f"{op}(decoder='real') needs Pillow, which is not "
                "importable here. Install the media extra "
                "(pip install sparvi-core-spark[media]) or pass "
                "decoder='metadata' for the deterministic stub "
                "(decoder='auto' picks for you)."
            )
        return "real"
    if decoder != "metadata":
        raise ValueError(f"unknown decoder: {decoder}")
    return "metadata"


# --- per-payload codec kernels -------------------------------------------
# Module-level (not closures) so they are unit-testable without Spark:
# the PIL-backed ones run under a faked PIL in the test suite even when
# the media extra isn't installed, and under real Pillow when it is.


def _dims_real(b: bytes) -> tuple[int, int] | None:
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(b)) as im:
            return im.width, im.height
    except Exception:
        return None


def _dims_metadata(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 8 and b[:4] == MAGIC:
        return (
            int.from_bytes(b[4:6], "big"),
            int.from_bytes(b[6:8], "big"),
        )
    return None


def _resize_one_real(b: bytes, width: int, height: int) -> bytes:
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(b)) as im:
            resized = im.resize((width, height), Image.BILINEAR)
    except Exception:
        return b  # corrupt: pass through for accounting
    buf = io.BytesIO()
    resized.save(buf, format="PNG")
    return buf.getvalue()


def _resize_one_metadata(b: bytes, width: int, height: int) -> bytes:
    if len(b) >= 8 and b[:4] == MAGIC:
        body_len = width * height % 4096
        body = b[8:][:body_len].ljust(body_len, b"\0")
        return MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big") + body
    return b  # corrupt: pass through for accounting


def _embed_one_real(b: bytes, dim: int, side: int) -> list[float]:
    import io

    import numpy as np
    from PIL import Image

    try:
        with Image.open(io.BytesIO(b)) as im:
            thumb = im.convert("L").resize((side, side), Image.BILINEAR)
    except Exception:
        return [0.0] * dim  # corrupt → zero vector
    v = np.asarray(thumb, dtype=np.float64).ravel()[:dim]
    v = v - v.mean()
    n = np.linalg.norm(v)
    if n == 0:  # flat image: no structure to match on
        return [0.0] * dim
    return (v / n).astype(np.float32).tolist()


def _embed_one_metadata(b: bytes, dim: int) -> list[float]:
    import hashlib

    import numpy as np

    if len(b) < 8 or b[:4] != MAGIC:
        return [0.0] * dim  # corrupt → zero vector
    v = np.array(
        [
            int.from_bytes(
                hashlib.blake2b(
                    b, digest_size=8, salt=i.to_bytes(8, "big")
                ).digest(),
                "big",
                signed=True,
            )
            for i in range(dim)
        ],
        dtype=np.float64,
    )
    n = np.linalg.norm(v)
    if n == 0:
        return [0.0] * dim
    return (v / n).astype(np.float32).tolist()


def make_wav_payload(
    media_id: int,
    seconds: float = 0.25,
    rate: int = 8000,
    channels: int = 1,
    sampwidth: int = 2,
) -> bytes:
    """Deterministic REAL WAV blob (tests / fixtures): a seeded
    sine-plus-noise PCM signal written through stdlib ``wave`` — what
    ``decode_audio`` parses is an actual RIFF/WAVE container, not a
    synthetic header."""
    import io
    import math
    import random
    import wave

    rnd = random.Random(media_id)
    n = int(seconds * rate)
    freq = 100 + (media_id % 20) * 37
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        frames = bytearray()
        full = (1 << (8 * sampwidth - 1)) - 1
        for i in range(n):
            v = 0.6 * math.sin(2 * math.pi * freq * i / rate)
            v += 0.05 * (rnd.random() * 2 - 1)
            s = int(max(-1.0, min(1.0, v)) * full)
            for _ in range(channels):
                if sampwidth == 1:
                    frames += bytes([(s // 256) + 128 & 0xFF])
                else:
                    frames += s.to_bytes(sampwidth, "little", signed=True)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _audio_info_wav(b: bytes) -> tuple[int, int, int, int] | None:
    """(rate, channels, frames, sampwidth) from a WAV header, or None."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(b)) as w:
            return (
                w.getframerate(),
                w.getnchannels(),
                w.getnframes(),
                w.getsampwidth(),
            )
    except Exception:
        return None


def _audio_samples_wav(b: bytes):
    """Mono-mixed float64 samples in [-1, 1], or None if undecodable.

    8/16/32-bit PCM via NumPy ``frombuffer`` (no ``audioop``); 24-bit
    and compressed WAVs return None → corrupt accounting, same
    contract as the image codecs."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(b)) as w:
            sw, nch = w.getsampwidth(), w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x


def _audio_embed_one(b: bytes, dim: int) -> list[float]:
    """Windowed-RMS energy signature: ``dim`` equal time windows →
    per-window RMS → mean-centered, L2-normalized. Same output
    contract as the image features (unit norm, corrupt/silent → zero
    vector), so the result drops straight into the ANN/dedup surface."""
    import numpy as np

    x = _audio_samples_wav(b)
    if x is None or len(x) == 0:
        return [0.0] * dim
    edges = np.linspace(0, len(x), dim + 1).astype(np.int64)
    rms = np.array(
        [
            np.sqrt(np.mean(x[edges[i] : edges[i + 1]] ** 2))
            if edges[i + 1] > edges[i]
            else 0.0
            for i in range(dim)
        ]
    )
    rms = rms - rms.mean()
    n = np.linalg.norm(rms)
    if n == 0:
        return [0.0] * dim
    return (rms / n).astype(np.float32).tolist()


AUDIO_FIELDS = [
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("duration_s", FloatType()),
    StructField("n_bytes", LongType()),
    StructField("valid", StringType()),
]


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode via stdlib ``wave`` — no extra, no stub, no
    skip-gate: parses actual RIFF/WAVE headers in Arrow-batched
    ``mapInPandas`` (same plumbing shape as ``decode_media``).

    Output schema = input schema + (sample_rate, n_channels, n_frames,
    duration_s, n_bytes, valid). Undecodable payloads get zeros +
    ``valid="corrupt"``."""
    out_schema = StructType(df.schema.fields + AUDIO_FIELDS)

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, frames, durs, sizes, valid = [], [], [], [], [], []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                info = _audio_info_wav(b)
                if info is not None:
                    rate, nch, nfr, _ = info
                    rates.append(rate)
                    chans.append(nch)
                    frames.append(nfr)
                    durs.append(nfr / rate if rate else 0.0)
                    valid.append("ok")
                else:
                    rates.append(0)
                    chans.append(0)
                    frames.append(0)
                    durs.append(0.0)
                    valid.append("corrupt")
                sizes.append(len(b))
            pdf = pdf.copy()
            pdf["sample_rate"] = pd.array(rates, dtype="int32")
            pdf["n_channels"] = pd.array(chans, dtype="int32")
            pdf["n_frames"] = pd.array(frames, dtype="int64")
            pdf["duration_s"] = pd.array(durs, dtype="float32")
            pdf["n_bytes"] = pd.array(sizes, dtype="int64")
            pdf["valid"] = valid
            yield pdf

    return df.mapInPandas(_decode_batches, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    out_col: str = "features",
) -> DataFrame:
    """REAL audio features (windowed-RMS energy) via stdlib ``wave`` +
    NumPy — the audio analog of ``extract_features``: payload →
    unit-norm ``array<float>`` that feeds ``operators.similarity``
    (near-dup WAVs — re-containered or level-preserved copies — land
    at cosine ≈ 1). Corrupt or silent payloads embed to the zero
    vector so they can't spuriously match."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _audio_embed_one(bytes(raw) if raw is not None else b"", dim)
                for raw in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(_feature_batches, schema=out_schema)


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: str = "metadata",
) -> DataFrame:
    """Decode/inspect binary payloads via mapInPandas (Arrow batches).

    Output schema = input schema + (width, height, n_bytes, valid).
    ``decoder="metadata"`` parses the synthetic header; ``"real"``
    decodes actual image bytes (PNG/JPEG/...) with Pillow; ``"auto"``
    picks real when Pillow is installed.  Undecodable payloads get
    ``valid="corrupt"`` with zero dims in both modes.
    """
    decoder = _resolve_decoder(decoder, "decode_media")
    out_schema = StructType(df.schema.fields + DECODED_FIELDS)
    _dims = _dims_real if decoder == "real" else _dims_metadata

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, valid = [], [], [], []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                wh = _dims(b)
                if wh is not None:
                    widths.append(wh[0])
                    heights.append(wh[1])
                    valid.append("ok")
                else:
                    widths.append(0)
                    heights.append(0)
                    valid.append("corrupt")
                sizes.append(len(b))
            pdf = pdf.copy()
            pdf["width"] = pd.array(widths, dtype="int32")
            pdf["height"] = pd.array(heights, dtype="int32")
            pdf["n_bytes"] = pd.array(sizes, dtype="int64")
            pdf["valid"] = valid
            yield pdf

    return df.mapInPandas(_decode_batches, schema=out_schema)


def media_quality_summary(decoded: DataFrame) -> DataFrame:
    """Per-kind quality rollup over decoded media — plain DataFrame agg
    downstream of the Pandas stage (back on the JVM fast path)."""
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("valid") == "corrupt").cast("long")).alias("n_corrupt"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    decoder: str = "metadata",
) -> DataFrame:
    """Resize plumbing via mapInPandas — same Arrow-batched shape as
    ``decode_media``; schema is unchanged (the payload column is
    replaced).

    ``decoder="metadata"``: rewrites the synthetic header to the target
    dimensions and truncates/pads the body to the new ``width*height %
    4096`` length — deterministic, so a decode round-trip shows the new
    dims. ``"real"``: Pillow bilinear resample, re-encoded as PNG (a
    lossless container, so resize → decode round-trips exactly).
    Corrupt payloads pass through untouched in both modes so the
    downstream ``valid`` accounting still sees them.
    """
    decoder = _resolve_decoder(decoder, "resize_media")
    _resize_one = _resize_one_real if decoder == "real" else _resize_one_metadata

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _resize_one(bytes(raw) if raw is not None else b"", width, height)
                for raw in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_resize_batches, schema=df.schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled frame index.

    For video-like payloads this is where per-frame decode fans out;
    with the stub decoder the frame index and byte-offset math is real,
    the pixel decode is not.
    """
    n_frames = (F.length(F.col(payload_col)) / F.lit(every_n)).cast("int")
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .withColumn("byte_offset", F.col("frame_idx") * every_n)
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    out_col: str = "features",
    decoder: str = "metadata",
) -> DataFrame:
    """Feature extraction plumbing: payload → ``array<float>`` embedding
    via Arrow-batched ``mapInPandas`` — the bridge from multimodal
    columns into the ANN/dedup operators (``operators.similarity``
    takes exactly this column shape, so media dedup is
    ``extract_features`` → ``kmeans_fit``/``semantic near-dup`` with
    no glue).

    ``decoder="metadata"`` produces a DETERMINISTIC unit-norm vector
    from the payload bytes: each component is a keyed blake2b digest of
    the payload (salted per component), so components are independent —
    identical payloads embed identically, distinct payloads are
    near-orthogonal in expectation, and corrupt payloads embed to the
    zero vector so they can't spuriously match anything.

    ``decoder="real"`` computes mean-centered unit-norm pixel-intensity
    features (the aHash family): grayscale → bilinear thumbnail on a
    ``ceil(sqrt(dim))``-sided grid → first ``dim`` intensities, mean
    subtracted, L2-normalized.  Re-encodes/resizes of the same image
    land at cosine ≈ 1, so the vectors feed
    ``similarity.embedding_near_duplicates`` for perceptual media
    dedup with no glue.  A learned encoder (CLIP, wav2vec, ...) plugs
    into the same batch loop for semantic matching.
    """
    decoder = _resolve_decoder(decoder, "extract_features")
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")

    import math

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    if decoder == "real":
        side = math.isqrt(dim - 1) + 1  # ceil(sqrt(dim))

        def _embed_one(b: bytes) -> list[float]:
            return _embed_one_real(b, dim, side)

    else:

        def _embed_one(b: bytes) -> list[float]:
            return _embed_one_metadata(b, dim)

    def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _embed_one(bytes(raw) if raw is not None else b"")
                for raw in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(_feature_batches, schema=out_schema)

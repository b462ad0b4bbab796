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

Video is REAL with zero dependencies for uncompressed AVI:
``decode_video`` / ``sample_video_frames`` / ``extract_video_features``
parse the RIFF/AVI container (the same chunk grammar as WAV) with
``struct`` + NumPy — genuine header decode (dims/fps/frame count),
genuine per-frame pixel decode of 24-bit DIB ``00db`` chunks
(bottom-up rows, 4-byte stride padding), uniform frame sampling
without materializing unsampled frames, and temporally-pooled
perceptual features. Compressed codecs (h264/vp9) and other audio
containers (mp3/flac) plug into the same batch loops via the
``[media]`` extra pattern but are not bundled.

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


# --- REAL video: stdlib-struct uncompressed-AVI codec --------------------
# AVI is RIFF — the same chunk grammar as WAV: fourcc + u32le size +
# data (padded to even). 'hdrl' holds avih (global header) and one
# strl per stream (strh timing + strf BITMAPINFOHEADER); 'movi' holds
# the frame chunks ('NNdb' = uncompressed DIB). 24-bit DIB frames are
# bottom-up BGR rows padded to a 4-byte stride. Everything below is
# struct+NumPy; any parse failure → None → corrupt accounting, the
# contract shared by the image and audio codecs.


def make_avi_payload(
    media_id: int,
    n_frames: int = 8,
    width: int = 16,
    height: int = 12,
    fps: int = 10,
) -> bytes:
    """Deterministic REAL AVI blob (tests / fixtures): seeded moving
    gradients written as a genuine RIFF/AVI container with
    uncompressed 24-bit DIB frames — what ``decode_video`` parses is
    an actual chunk tree with stride-padded bottom-up pixel rows, not
    a synthetic header. Pixel formula: ``(6x + 7y + 13·media_id +
    29·frame) % 256`` in all three channels (tests pin it)."""
    import struct

    import numpy as np

    stride = (width * 3 + 3) & ~3
    frame_bytes = []
    y, x = np.mgrid[0:height, 0:width]
    for f in range(n_frames):
        v = ((6 * x + 7 * y + 13 * media_id + 29 * f) % 256).astype(np.uint8)
        bgr = np.repeat(v[..., None], 3, axis=2)
        rows = [
            bgr[r].tobytes().ljust(stride, b"\0")
            for r in range(height - 1, -1, -1)  # DIB rows are bottom-up
        ]
        frame_bytes.append(b"".join(rows))

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\0" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def list_chunk(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    frame_size = stride * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1)
        n_frames,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n_frames,  # dwLength
            frame_size,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        width,
        height,  # positive = bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB (uncompressed)
        frame_size,
        0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(
        b"movi", b"".join(chunk(b"00db", f) for f in frame_bytes)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, data_off, size) for RIFF chunks in [off, end);
    stops at the first truncated chunk (partial tail = best effort)."""
    import struct

    while off + 8 <= end:
        fourcc = buf[off : off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        data_off = off + 8
        if data_off + size > end:
            return
        yield fourcc, data_off, size
        off = data_off + size + (size & 1)


def _video_info_avi(b: bytes):
    """(width, height, fps, n_frames, bit_count, compression) from an
    AVI header, or None if the payload isn't a parseable AVI."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    width = height = n_frames = None
    micro_per_frame = 0
    scale = rate = 0
    bit_count = compression = None
    try:
        for fourcc, doff, size in _riff_chunks(b, 12, end):
            if fourcc != b"LIST" or b[doff : doff + 4] != b"hdrl":
                continue
            for f2, d2, s2 in _riff_chunks(b, doff + 4, doff + size):
                if f2 == b"avih" and s2 >= 40:
                    micro_per_frame, _, _, _, n_frames = struct.unpack_from(
                        "<5I", b, d2
                    )
                    width, height = struct.unpack_from("<2I", b, d2 + 32)
                elif f2 == b"LIST" and b[d2 : d2 + 4] == b"strl":
                    is_vids = False
                    for f3, d3, s3 in _riff_chunks(b, d2 + 4, d2 + s2):
                        if f3 == b"strh" and s3 >= 32:
                            is_vids = b[d3 : d3 + 4] == b"vids"
                            if is_vids:
                                scale, rate = struct.unpack_from(
                                    "<2I", b, d3 + 20
                                )
                        elif f3 == b"strf" and s3 >= 20 and is_vids:
                            bit_count = struct.unpack_from("<H", b, d3 + 14)[0]
                            compression = struct.unpack_from("<I", b, d3 + 16)[0]
    except (struct.error, IndexError):
        return None
    if width is None or n_frames is None or not width or not height:
        return None
    if scale and rate:
        fps = rate / scale
    elif micro_per_frame:
        fps = 1_000_000.0 / micro_per_frame
    else:
        return None
    return width, height, float(fps), n_frames, bit_count, compression


def _video_frame_offsets_avi(b: bytes):
    """Byte ranges [(data_off, size), ...] of the movi frame chunks
    ('NNdb'/'NNdc'), in stream order — an index scan, no pixel work."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)
    out = []
    for fourcc, doff, size in _riff_chunks(b, 12, end):
        if fourcc == b"LIST" and b[doff : doff + 4] == b"movi":
            for f2, d2, s2 in _riff_chunks(b, doff + 4, doff + size):
                if f2[2:4] in (b"db", b"dc"):
                    out.append((d2, s2))
    return out


def _video_frames_avi(b: bytes, indices=None):
    """Decode frames to grayscale float64 H×W arrays in [0, 255].

    Returns ``[(frame_idx, ndarray), ...]`` for the requested indices
    (all frames when ``indices`` is None), or None when the payload
    isn't uncompressed 24-bit DIB — the only pixel format bundled
    (same contract as the 24-bit-only WAV sample reader). Unsampled
    frames are never unpacked: selection happens on the chunk index."""
    import numpy as np

    info = _video_info_avi(b)
    if info is None:
        return None
    width, height, _, _, bit_count, compression = info
    if bit_count != 24 or compression != 0:
        return None
    offsets = _video_frame_offsets_avi(b)
    if not offsets:
        return None
    if indices is None:
        indices = range(len(offsets))
    stride = (width * 3 + 3) & ~3
    out = []
    for i in indices:
        if not 0 <= i < len(offsets):
            continue
        doff, size = offsets[i]
        if size < stride * height:
            continue  # short frame chunk: skip, keep accounting honest
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=doff)
        rows = raw.reshape(height, stride)[:, : width * 3].reshape(
            height, width, 3
        )
        gray = rows.mean(axis=2)[::-1]  # BGR mean, flip bottom-up → top-down
        out.append((i, gray))
    return out


def _frame_embed(gray, dim: int):
    """aHash-family features for one decoded frame: area-mean the
    pixel grid down to a ``ceil(sqrt(dim))``-sided thumbnail (2-D
    analog of the audio RMS windows), first ``dim`` cells,
    mean-centered, L2-normalized. Flat frames → zero vector."""
    import math

    import numpy as np

    side = math.isqrt(dim - 1) + 1
    h, w = gray.shape
    ye = np.linspace(0, h, side + 1).astype(np.int64)
    xe = np.linspace(0, w, side + 1).astype(np.int64)
    cells = np.array(
        [
            gray[ye[i] : ye[i + 1], xe[j] : xe[j + 1]].mean()
            if ye[i + 1] > ye[i] and xe[j + 1] > xe[j]
            else 0.0
            for i in range(side)
            for j in range(side)
        ]
    )[:dim]
    cells = cells - cells.mean()
    n = np.linalg.norm(cells)
    if n == 0:
        return None
    return (cells / n).astype(np.float64)


def _video_embed_one(b: bytes, dim: int, max_frames: int) -> list[float]:
    """Whole-video signature: uniformly sample ≤ ``max_frames`` frames,
    mean the per-frame aHash features over time, re-normalize. Copies
    that re-container the same pixels land at cosine = 1; corrupt or
    flat payloads embed to the zero vector so they can't match."""
    import numpy as np

    offsets = _video_frame_offsets_avi(b)
    n = len(offsets) if offsets else 0
    if n == 0:
        return [0.0] * dim
    take = min(max_frames, n)
    idx = sorted({int(i) for i in np.linspace(0, n - 1, take)})
    frames = _video_frames_avi(b, idx)
    if not frames:
        return [0.0] * dim
    vecs = [v for _, g in frames if (v := _frame_embed(g, dim)) is not None]
    if not vecs:
        return [0.0] * dim
    pooled = np.mean(vecs, axis=0)
    norm = np.linalg.norm(pooled)
    if norm == 0:
        return [0.0] * dim
    return (pooled / norm).astype(np.float32).tolist()


VIDEO_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("fps", FloatType()),
    StructField("n_frames", LongType()),
    StructField("duration_s", FloatType()),
    StructField("n_bytes", LongType()),
    StructField("valid", StringType()),
]


def decode_video(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL video decode via stdlib ``struct`` — no extra, no stub, no
    skip-gate: parses actual RIFF/AVI chunk trees in Arrow-batched
    ``mapInPandas`` (same plumbing shape as ``decode_media`` /
    ``decode_audio``). Header-only: no pixel data is touched.

    Output schema = input schema + (width, height, fps, n_frames,
    duration_s, n_bytes, valid). Undecodable payloads get zeros +
    ``valid="corrupt"``."""
    out_schema = StructType(df.schema.fields + VIDEO_FIELDS)

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fpss, frames, durs, sizes, valid = [], [], [], [], [], [], []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                info = _video_info_avi(b)
                if info is not None:
                    w, h, fps, nf, _, _ = info
                    ws.append(w)
                    hs.append(h)
                    fpss.append(fps)
                    frames.append(nf)
                    durs.append(nf / fps if fps else 0.0)
                    valid.append("ok")
                else:
                    ws.append(0)
                    hs.append(0)
                    fpss.append(0.0)
                    frames.append(0)
                    durs.append(0.0)
                    valid.append("corrupt")
                sizes.append(len(b))
            pdf = pdf.copy()
            pdf["width"] = pd.array(ws, dtype="int32")
            pdf["height"] = pd.array(hs, dtype="int32")
            pdf["fps"] = pd.array(fpss, dtype="float32")
            pdf["n_frames"] = pd.array(frames, dtype="int64")
            pdf["duration_s"] = pd.array(durs, dtype="float32")
            pdf["n_bytes"] = pd.array(sizes, dtype="int64")
            pdf["valid"] = valid
            yield pdf

    return df.mapInPandas(_decode_batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    dim: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling: one output row per sampled frame (indices
    0, every_n, 2·every_n, …) with the frame's timestamp and aHash
    features — genuine pixel decode of exactly the sampled ``00db``
    chunks (unsampled frames are located on the chunk index but never
    unpacked).

    Output schema = input schema MINUS the payload column (exploding
    the payload into per-frame rows would multiply the corpus bytes by
    the frame count — the payload stays behind on purpose) PLUS
    (frame_idx, time_s, features). Corrupt payloads emit zero rows;
    count them upstream with ``decode_video``."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(
        keep
        + [
            StructField("frame_idx", IntegerType()),
            StructField("time_s", FloatType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )
    keep_names = [f.name for f in keep]

    def _sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = row[payload_col]
                b = bytes(raw) if raw is not None else b""
                info = _video_info_avi(b)
                if info is None:
                    continue
                _, _, fps, _, _, _ = info
                offsets = _video_frame_offsets_avi(b)
                if not offsets:
                    continue
                idx = list(range(0, len(offsets), every_n))
                frames = _video_frames_avi(b, idx) or []
                for i, gray in frames:
                    v = _frame_embed(gray, dim)
                    feats = (
                        [0.0] * dim
                        if v is None
                        else v.astype(np.float32).tolist()
                    )
                    rows.append(
                        tuple(row[c] for c in keep_names)
                        + (i, i / fps if fps else 0.0, feats)
                    )
            yield pd.DataFrame(
                rows, columns=keep_names + ["frame_idx", "time_s", "features"]
            )

    return df.mapInPandas(_sample_batches, schema=out_schema)


def extract_video_features(
    df: DataFrame,
    dim: int = 16,
    max_frames: int = 16,
    payload_col: str = "payload",
    out_col: str = "features",
) -> DataFrame:
    """REAL video features: temporally-pooled per-frame aHash — the
    video analog of ``extract_features``: payload → unit-norm
    ``array<float>`` that feeds ``operators.similarity`` (re-muxed
    copies of the same pixels land at cosine ≈ 1). Uniformly samples
    ≤ ``max_frames`` frames so cost is bounded per payload regardless
    of clip length. Corrupt or flat payloads embed to the zero
    vector so they can't spuriously match."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    if max_frames < 1:
        raise ValueError(f"max_frames must be >= 1, got {max_frames}")
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _video_embed_one(
                    bytes(raw) if raw is not None else b"", dim, max_frames
                )
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

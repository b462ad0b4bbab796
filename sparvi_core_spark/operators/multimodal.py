"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video in a 100 TB Spark pipeline: the payload
is an opaque ``binary`` column; decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` (one Python worker per partition, vectorized
batch transfer) — never row-at-a-time UDFs. Real codecs (PIL/ffmpeg/...)
are NOT available in this environment, so the decode step is stubbed:
``decoder="metadata"`` parses our deterministic synthetic header, and
``decoder="real"`` raises NotImplementedError where the codec call
belongs. The Spark-side plumbing — schema, batch iteration, partition
sizing — is real and tested.
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


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: str = "metadata",
) -> DataFrame:
    """Decode/inspect binary payloads via mapInPandas (Arrow batches).

    Output schema = input schema + (width, height, n_bytes, valid).
    ``decoder="metadata"`` parses the synthetic header; ``"real"`` is
    the seam where an actual codec (PIL / torchaudio / pyav) plugs in.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "plug PIL/pyav into _decode_batch and pass decoder='metadata' "
            "for the deterministic stub"
        )
    if decoder != "metadata":
        raise ValueError(f"unknown decoder: {decoder}")

    out_schema = StructType(df.schema.fields + DECODED_FIELDS)

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, valid = [], [], [], []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if len(b) >= 8 and b[:4] == MAGIC:
                    widths.append(int.from_bytes(b[4:6], "big"))
                    heights.append(int.from_bytes(b[6:8], "big"))
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
    dims. ``"real"`` is the seam where an actual pixel resample
    (PIL.Image.resize / ffmpeg scale) plugs into the same batch loop.
    Corrupt payloads (bad magic) pass through untouched so the
    downstream ``valid`` accounting still sees them.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "plug PIL/pyav into _resize_batches and pass "
            "decoder='metadata' for the deterministic stub"
        )
    if decoder != "metadata":
        raise ValueError(f"unknown decoder: {decoder}")

    body_len = width * height % 4096

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if len(b) >= 8 and b[:4] == MAGIC:
                    body = b[8:][:body_len].ljust(body_len, b"\0")
                    out.append(
                        MAGIC
                        + width.to_bytes(2, "big")
                        + height.to_bytes(2, "big")
                        + body
                    )
                else:
                    out.append(b)  # corrupt: pass through for accounting
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
    ``decoder="real"`` is the seam where an actual vision/audio encoder
    (CLIP, wav2vec, ...) plugs into the same batch loop.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media encoders are not available in this environment; "
            "plug your model into _feature_batches and pass "
            "decoder='metadata' for the deterministic stub"
        )
    if decoder != "metadata":
        raise ValueError(f"unknown decoder: {decoder}")
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")

    import hashlib

    import numpy as np

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if len(b) < 8 or b[:4] != MAGIC:
                    feats.append([0.0] * dim)  # corrupt → zero vector
                    continue
                v = np.array(
                    [
                        int.from_bytes(
                            hashlib.blake2b(
                                b,
                                digest_size=8,
                                salt=i.to_bytes(8, "big"),
                            ).digest(),
                            "big",
                            signed=True,
                        )
                        for i in range(dim)
                    ],
                    dtype=np.float64,
                )
                n = np.linalg.norm(v)
                feats.append(
                    (v / n).astype(np.float32).tolist()
                    if n > 0
                    else [0.0] * dim
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(_feature_batches, schema=out_schema)

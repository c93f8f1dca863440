"""Multimodal column operators: image / audio / video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

Pattern (the round-1 contract): the Spark-side plumbing — schemas,
mapInPandas batch shape, error quarantine, partitioning — is real and
tested; the codec layer decodes what pure NumPy can (raw RGB, PNG,
s16le PCM, concatenated raw frames) and raises NotImplementedError for
container formats that need external libs (jpeg/mp3/mp4 -> ffmpeg/PIL at
deployment), which the kernel catches into the err column exactly like
the image extract stage.

Reference analog: the ffmpeg decode pipe (Key.java:85,
PanakoStrategy.java:223-237) — the reference also treats media as an
opaque byte stream decoded to a canonical array at the pipeline edge.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from panako_spark.kernels import codec

# ---------------------------------------------------------------- images ---

RESIZED_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("err", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("edge_density", T.DoubleType()),
    T.StructField("err", T.StringType()),
])


def _resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    ys = np.linspace(0, img.shape[0] - 1, out_h)
    xs = np.linspace(0, img.shape[1] - 1, out_w)
    yi = np.round(ys).astype(int)
    xi = np.round(xs).astype(int)
    return img[np.ix_(yi, xi)]


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode PNG, per Arrow batch."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    img = codec.decode(bytes(r.bytes), int(r.w), int(r.h),
                                       r.fmt)
                    small = _resize(img, out_h, out_w)
                    rows.append((r.image_id, codec.encode(small, "png"),
                                 out_w, out_h, "png", None))
                except Exception as e:  # noqa: BLE001 quarantine, don't die
                    rows.append((r.image_id, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, RESIZED_SCHEMA)


def image_features(images: DataFrame) -> DataFrame:
    """Batched feature extraction: channel means, luma std, edge density
    (gradient-magnitude fraction) — the feature-extract step of a
    training-data pipeline."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    img = codec.decode(bytes(r.bytes), int(r.w), int(r.h),
                                       r.fmt)
                    g = codec.to_gray(img)
                    gy, gx = np.gradient(g)
                    mag = np.hypot(gx, gy)
                    rows.append((
                        r.image_id,
                        [float(img[..., c].mean()) for c in range(3)],
                        float(g.std()),
                        float((mag > 10.0).mean()),
                        None))
                except Exception as e:  # noqa: BLE001
                    rows.append((r.image_id, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, FEATURE_SCHEMA)


# ---------------------------------------------------------------- audio ----

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("err", T.StringType()),
])


def decode_audio(data: bytes, fmt: str, sample_rate: int) -> np.ndarray:
    """bytes -> float32 mono waveform in [-1, 1].

    'pcm16' (s16le mono, the reference decoder's own canonical target,
    Key.java:85) decodes in pure NumPy. Container formats (mp3/ogg/wav
    with headers) route through the ffmpeg subprocess pipe when the
    binary exists — the reference's own decode strategy
    (Key.java:80-107) — and raise NotImplementedError otherwise (the
    kernels quarantine that into the err column).
    """
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    from panako_spark.kernels.codec import ffmpeg_path

    exe = ffmpeg_path()
    if exe is None:
        raise NotImplementedError(
            f"audio codec {fmt!r} requires ffmpeg (not in this sandbox)")
    import subprocess

    proc = subprocess.run(
        [str(exe), "-v", "error", "-i", "pipe:0", "-f", "s16le",
         "-ac", "1", "-ar", str(sample_rate), "pipe:1"],
        input=data, capture_output=True, timeout=120)
    if proc.returncode != 0:
        raise ValueError("ffmpeg audio decode failed: "
                         f"{proc.stderr.decode(errors='replace')[:200]}")
    return np.frombuffer(proc.stdout, dtype="<i2").astype(np.float32) / 32768.0


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, bytes, sample_rate, fmt) -> duration/RMS/zero-crossings."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    wave = decode_audio(bytes(r.bytes), r.fmt,
                                        int(r.sample_rate))
                    zc = int(np.count_nonzero(np.diff(np.signbit(wave))))
                    rows.append((r.audio_id,
                                 float(wave.size / r.sample_rate),
                                 float(np.sqrt(np.mean(wave ** 2))),
                                 zc, None))
                except Exception as e:  # noqa: BLE001
                    rows.append((r.audio_id, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in AUDIO_FEATURE_SCHEMA])

    return audio.select("audio_id", "bytes", "sample_rate", "fmt") \
        .mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------- video ----

FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("err", T.StringType()),
])


def frame_sample(video: DataFrame, every_k: int = 10) -> DataFrame:
    """(video_id, bytes, fmt, n_frames, w, h) -> one row per sampled frame
    (PNG-encoded), feeding the sampled frames straight into the image
    dedup pipeline. 'rawrgb' = n_frames concatenated h*w*3 buffers
    (decodes in NumPy); container formats (mp4/webm) are stubbed like
    decode_audio."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    if r.fmt != "rawrgb":
                        raise NotImplementedError(
                            f"video codec {r.fmt!r} requires ffmpeg")
                    w, h, n = int(r.w), int(r.h), int(r.n_frames)
                    frame_sz = w * h * 3
                    buf = bytes(r.bytes)
                    if len(buf) != frame_sz * n:
                        raise ValueError("video payload size mismatch")
                    for i in range(0, n, every_k):
                        frame = np.frombuffer(
                            buf[i * frame_sz:(i + 1) * frame_sz],
                            dtype=np.uint8).reshape(h, w, 3)
                        rows.append((r.video_id, i,
                                     codec.encode(frame, "png"),
                                     w, h, "png", None))
                except Exception as e:  # noqa: BLE001
                    rows.append((r.video_id, -1, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return video.select("video_id", "bytes", "fmt", "n_frames", "w", "h") \
        .mapInPandas(fn, FRAME_SCHEMA)


def video_dedup_frames(video: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame-sample -> image rows ready for the landmark extract stage
    (image_id = video_id#frame): videos deduplicate through the same
    pipeline as stills."""
    frames = frame_sample(video, every_k).where(F.col("err").isNull())
    return frames.select(
        F.concat_ws("#", "video_id",
                    F.col("frame_index").cast("string")).alias("image_id"),
        "bytes", "w", "h", "fmt",
        F.lit("").alias("caption"), F.lit(0).cast("long").alias("phash"))

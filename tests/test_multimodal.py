"""Multimodal operator tests: real plumbing (schemas, batching, error
quarantine), real NumPy codecs for raw formats, clean stubs for
container formats."""

import numpy as np
import pandas as pd
import pytest

from panako_spark.data.synth import generate_corpus, rows_to_pandas
from panako_spark.kernels import codec
from panako_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def images(spark):
    rows, _ = generate_corpus(4, dup_fraction=0.0, seed=31)
    return spark.createDataFrame(rows_to_pandas(rows)), rows


def test_resize_images(spark, images):
    df, rows = images
    out = MM.resize_images(df, 32, 24)
    got = {r["image_id"]: r for r in out.collect()}
    assert len(got) == len(rows)
    for r in rows:
        o = got[r.image_id]
        assert o["err"] is None
        img = codec.decode(bytes(o["bytes"]), 32, 24, "png")
        assert img.shape == (24, 32, 3)


def test_image_features(spark, images):
    df, rows = images
    out = {r["image_id"]: r for r in MM.image_features(df).collect()}
    for r in rows:
        o = out[r.image_id]
        assert o["err"] is None
        assert len(o["mean_rgb"]) == 3
        assert 0 <= o["edge_density"] <= 1
        assert o["std_gray"] > 0


def test_audio_features_pcm_and_stub(spark):
    sr = 8000
    t = np.arange(sr * 2)
    wave = (0.5 * np.sin(2 * np.pi * 440 * t / sr) * 32767).astype("<i2")
    pdf = pd.DataFrame({
        "audio_id": ["a_pcm", "a_mp3"],
        "bytes": [wave.tobytes(), b"\xff\xfbjunk"],
        "sample_rate": np.array([sr, sr], dtype=np.int32),
        "fmt": ["pcm16", "mp3"],
    })
    out = {r["audio_id"]: r for r in
           MM.audio_features(spark.createDataFrame(pdf)).collect()}
    ok = out["a_pcm"]
    assert ok["err"] is None
    assert abs(ok["duration_s"] - 2.0) < 1e-6
    assert abs(ok["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert ok["zero_crossings"] > 1500
    # container format: stubbed decode quarantines, never crashes the job
    bad = out["a_mp3"]
    assert bad["err"] is not None and "NotImplementedError" in bad["err"]


def test_video_frame_sample_and_dedup_rows(spark):
    rng = np.random.default_rng(5)
    w, h, n = 16, 12, 25
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    pdf = pd.DataFrame({
        "video_id": ["v1", "v_mp4"],
        "bytes": [frames.tobytes(), b"\x00\x00\x00 ftypmp42"],
        "fmt": ["rawrgb", "mp4"],
        "n_frames": np.array([n, 100], dtype=np.int32),
        "w": np.array([w, 640], dtype=np.int32),
        "h": np.array([h, 480], dtype=np.int32),
    })
    df = spark.createDataFrame(pdf)
    out = MM.frame_sample(df, every_k=10).collect()
    good = [r for r in out if r["err"] is None]
    bad = [r for r in out if r["err"] is not None]
    assert {r["frame_index"] for r in good} == {0, 10, 20}
    for r in good:
        img = codec.decode(bytes(r["bytes"]), w, h, "png")
        assert np.array_equal(img, frames[r["frame_index"]])
    assert len(bad) == 1 and "NotImplementedError" in bad[0]["err"]
    # frames flow into the image-pipeline shape
    rows = MM.video_dedup_frames(df, every_k=10)
    assert rows.columns == ["image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash"]
    assert rows.count() == 3


# ----------------------------------------------------- ffmpeg pipe seam ----
def _have_ffmpeg():
    from panako_spark.kernels.codec import ffmpeg_path

    return ffmpeg_path() is not None


def test_ffmpeg_seam_absent_path_quarantines():
    """Without ffmpeg the container-codec path must raise
    NotImplementedError (which the extract kernel turns into an err
    row), never crash differently or silently return."""
    import numpy as np
    import pytest

    from panako_spark.kernels import codec
    from panako_spark.operators.multimodal import decode_audio

    if _have_ffmpeg():
        pytest.skip("ffmpeg present; covered by the integration test")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        codec.decode(b"\xff\xd8\xff", 4, 4, "jpeg")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_audio(b"\x00" * 64, "mp3", 8000)


def test_ffmpeg_pipe_roundtrip_if_available():
    """Integration: with ffmpeg on PATH, a PNG decoded via the
    subprocess pipe matches the native NumPy decoder pixel-exactly."""
    import numpy as np
    import pytest

    from panako_spark.kernels import codec

    if not _have_ffmpeg():
        pytest.skip("no ffmpeg in this environment")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(16, 12, 3), dtype=np.uint8)
    png = codec.encode(img, "png")
    via_pipe = codec.decode_via_ffmpeg(png, 12, 16)
    assert np.array_equal(via_pipe, img)


def test_ffmpeg_persistent_stream_if_available():
    """Integration: the long-lived stream decoder must decode several
    sequential frames from ONE process, match the native decoder
    pixel-exactly, and recover (restart + one-shot fallback) after a
    poisoned payload. Skips where no ffmpeg binary exists."""
    import numpy as np
    import pytest

    from panako_spark.kernels import codec

    if not _have_ffmpeg():
        pytest.skip("no ffmpeg in this environment")
    dec = codec.FFmpegStreamDecoder.get("png")
    assert dec is not None
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, size=(10 + i, 8, 3), dtype=np.uint8)
            for i in range(4)]
    pngs = [codec.encode(im, "png") for im in imgs]
    out = [dec.decode(p, 8, 10 + i) for i, p in enumerate(pngs)]
    pid = dec._proc.pid
    for im, o in zip(imgs, out):
        assert np.array_equal(im, o)
    assert dec._proc.pid == pid  # same process served every frame
    # poisoned payload: stream restarts, seam falls back one-shot
    with pytest.raises(Exception):
        dec.decode(b"not a png at all", 8, 10)
    ok = codec.decode_via_ffmpeg(pngs[0], 8, 10, fmt="png")
    assert np.array_equal(ok, imgs[0])

"""Image codecs: 'raw' (h*w*3 uint8, row-major) and 'png' (stdlib zlib).

Reference analog: the ffmpeg decode pipe that turns any container into a
canonical mono 16 kHz PCM stream (PanakoStrategy.java:223-237; pipe command
Key.java:85). Here the canonical form is an (h, w, 3) uint8 array; both
codecs are lossless so the decoded-pixel invariant (BASELINE.json
input_hint: PSNR>=40dB for lossy, exact for lossless) is exact.

No image libraries exist in this sandbox, so PNG is a minimal pure-Python
RGB8 implementation (encode: filter 0; decode: all five standard filters).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_raw(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> raw bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    return img.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size != h * w * 3:
        raise ValueError(f"raw payload size {arr.size} != {h}x{w}x3")
    return arr.reshape(h, w, 3)


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (8-bit RGB, filter 0, one IDAT).

    Any zlib level is equally lossless; level 1 is ~4x faster and is used
    for the per-row roundtrip invariant check."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend filter byte 0 to each scanline
    scanlines = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scanlines[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(scanlines.tobytes(), level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (h, 1+stride) uint8 incl filter byte."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 1:
                    v = line[x] + a
                elif ft == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitd, ctype = struct.unpack(">IIBB", payload[:10])
            if bitd != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w <= 0 or h <= 0:
        raise ValueError("PNG missing or empty IHDR")
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    stride = w * 3
    if raw.size != h * (1 + stride):
        raise ValueError(
            f"PNG payload {raw.size} != expected {h * (1 + stride)}")
    raw = raw.reshape(h, 1 + stride)
    if np.all(raw[:, 0] == 0):  # fast path: our own encoder
        return raw[:, 1:].reshape(h, w, 3).copy()
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


def encode(img: np.ndarray, fmt: str, level: int = 6) -> bytes:
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "png":
        return encode_png(img, level)
    raise ValueError(f"unknown fmt {fmt!r}")


def ffmpeg_path() -> str | None:
    """Resolved ffmpeg binary, or None (memoized per process)."""
    global _FFMPEG
    if _FFMPEG is _UNSET:
        import shutil

        _FFMPEG = shutil.which("ffmpeg")
    return _FFMPEG


_UNSET = object()
_FFMPEG: object = _UNSET


# streaming demuxers that parse one encoded image per write, enabling a
# long-lived decoder process (formats outside this map use the one-shot
# subprocess path)
_STREAM_DEMUXERS = {"jpeg": "mjpeg", "jpg": "mjpeg", "mjpeg": "mjpeg",
                    "png": "png_pipe"}


class FFmpegStreamDecoder:
    """One LONG-LIVED ffmpeg per (executor process, format family).

    Encoded images are written sequentially to stdin — the streaming
    demuxer (mjpeg / png_pipe) frames them — and raw rgb24 frames are
    read back by exact byte count (w*h*3 is known from row metadata, the
    length-prefix equivalent). A daemon thread drains stderr so the pipe
    can't deadlock. Any protocol error (short read, timeout, dead
    process) kills and restarts the process; the failing row falls back
    to the one-shot subprocess so a single poisoned payload never stalls
    the stream. This retires the per-row-subprocess cost of
    decode_via_ffmpeg at 10^12-row scale: process startup amortizes to
    zero and the decode loop is two pipe transfers per image.
    """

    _instances: dict[str, "FFmpegStreamDecoder"] = {}

    def __init__(self, demuxer: str, read_timeout: float = 30.0):
        self.demuxer = demuxer
        self.read_timeout = read_timeout
        self._proc = None

    @classmethod
    def get(cls, fmt: str) -> "FFmpegStreamDecoder | None":
        demux = _STREAM_DEMUXERS.get(fmt.lower())
        if demux is None or ffmpeg_path() is None:
            return None
        inst = cls._instances.get(demux)
        if inst is None:
            inst = cls._instances[demux] = cls(demux)
        return inst

    def _ensure_proc(self):
        import subprocess
        import threading

        if self._proc is not None and self._proc.poll() is None:
            return self._proc
        self._proc = subprocess.Popen(
            [str(ffmpeg_path()), "-v", "error", "-fflags", "nobuffer",
             "-f", self.demuxer, "-i", "pipe:0",
             "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE)
        # drain stderr forever: a full stderr pipe deadlocks the decoder
        t = threading.Thread(target=self._proc.stderr.read, daemon=True)
        t.start()
        return self._proc

    def _kill(self):
        if self._proc is not None:
            try:
                self._proc.kill()
                self._proc.wait(timeout=5)
            except Exception:
                pass
            self._proc = None

    def decode(self, data: bytes, w: int, h: int) -> np.ndarray:
        import select

        proc = self._ensure_proc()
        want = h * w * 3
        try:
            proc.stdin.write(data)
            proc.stdin.flush()
            buf = bytearray()
            fd = proc.stdout.fileno()
            import time as _t

            deadline = _t.monotonic() + self.read_timeout
            while len(buf) < want:
                wait = deadline - _t.monotonic()
                if wait <= 0:
                    raise TimeoutError(
                        f"ffmpeg frame read timed out at {len(buf)}/{want}")
                r, _, _ = select.select([fd], [], [], wait)
                if not r:
                    continue
                chunk = os.read(fd, want - len(buf))
                if not chunk:
                    raise ValueError("ffmpeg stream closed mid-frame")
                buf.extend(chunk)
        except Exception:
            # restart the stream; the caller retries one-shot
            self._kill()
            raise
        return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, 3)


def decode_via_ffmpeg(data: bytes, w: int, h: int,
                      timeout: float = 60.0,
                      fmt: str | None = None) -> np.ndarray:
    """Container codecs (jpeg/webp/mp4-frame/...) through ffmpeg — the
    reference engine's own decode strategy: it shells out to ffmpeg per
    resource and reads raw samples from stdout (the DECODER/pipe config
    family, Key.java:80-107). stdin carries the encoded bytes, stdout
    returns rgb24 raw frames; no temp files.

    When `fmt` names a streaming-demuxer family (jpeg/png), the decode
    routes through the long-lived per-executor FFmpegStreamDecoder
    first — process startup amortizes to zero at 10^12 rows; any stream
    protocol error restarts the stream and falls back to the one-shot
    subprocess for that row, so correctness never depends on the stream
    staying healthy.
    """
    exe = ffmpeg_path()
    if exe is None:
        raise NotImplementedError(
            "container codec needs ffmpeg on PATH (absent in this "
            "sandbox); raw/png decode natively")
    if fmt is not None:
        stream = FFmpegStreamDecoder.get(fmt)
        if stream is not None:
            try:
                return stream.decode(data, w, h)
            except Exception:
                pass  # stream restarted inside; one-shot below
    import subprocess

    proc = subprocess.run(
        [str(exe), "-v", "error", "-i", "pipe:0",
         "-frames:v", "1", "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
        input=data, capture_output=True, timeout=timeout)
    if proc.returncode != 0:
        raise ValueError(
            f"ffmpeg decode failed: {proc.stderr.decode(errors='replace')[:200]}")
    raw = np.frombuffer(proc.stdout, dtype=np.uint8)
    if raw.size != h * w * 3:
        raise ValueError(f"ffmpeg output {raw.size} bytes != expected "
                         f"{h}x{w}x3 (metadata mismatch?)")
    return raw.reshape(h, w, 3).copy()


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes -> (h, w, 3) uint8. 'raw' and 'png' decode natively (pure
    NumPy); any other fmt routes through the ffmpeg subprocess pipe when
    the binary is present (decode_via_ffmpeg — the reference's own
    decode path) and raises NotImplementedError otherwise, which the
    extract kernel quarantines into the err column."""
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        img = decode_png(data)
        if img.shape[:2] != (h, w):
            raise ValueError(f"PNG dims {img.shape[:2]} != metadata ({h},{w})")
        return img
    return decode_via_ffmpeg(data, w, h, fmt=fmt)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float32 luma (BT.601)."""
    f = img.astype(np.float32)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

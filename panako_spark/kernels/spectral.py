"""Image -> time/frequency field (the spectrogram analog).

Reference: audio is framed and transformed to a 2-D magnitude field — Olaf:
FFT(1024)+Hamming power spectrum (OlafEventPointProcessor.java:99-133,
166-181); Panako: 512-bin constant-Q Gabor (PanakoEventPointProcessor.java:
105,120-125). Our image analog (SURVEY.md E1/E2, north_star "2D-FFT
spectral event points"):

  * time axis  = horizontal position: frames of `frame_width` columns,
    hop `frame_step` (E1 framing)
  * each frame's column-mean profile is resampled to a fixed
    `freq_samples` length and rfft'd; |coeffs| of bins 1..freq_bins is the
    frame's "spectrum" (E2)

Properties this buys (mirrors the reference's robustness goals):
  * horizontal crop        -> pure time offset   (handled by ΔT alignment)
  * vertical translation   -> phase change only  (magnitude invariant)
  * brightness offset      -> DC bin only        (bin 0 dropped)
  * uniform/anisotropic rescale -> time-stretch / frequency shift
    (handled by the scale-invariant triplet hash, E7)
"""

from __future__ import annotations

import numpy as np

from panako_spark.config import PanakoConfig


def _resample_rows(mat: np.ndarray, n_out: int) -> np.ndarray:
    """Linear-resample each row of (n, m) to (n, n_out)."""
    n, m = mat.shape
    if m == n_out:
        return mat
    # sample positions in source coordinates
    pos = np.linspace(0.0, m - 1.0, n_out)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, m - 1)
    w1 = (pos - i0).astype(mat.dtype)
    return mat[:, i0] * (1.0 - w1) + mat[:, i1] * w1


def _log_positions(cfg: PanakoConfig) -> np.ndarray:
    """Log-spaced source positions over the linear spectrum (memoized)."""
    key = (cfg.freq_bins, cfg.log_fmin_bin)
    cached = _log_positions.__dict__.get("cache")
    if cached is None or cached[0] != key:
        # geometric grid from fmin to the top bin, in 0-based coordinates
        # of the post-DC-drop linear spectrum (bin i = linear bin i+1)
        pos = np.geomspace(cfg.log_fmin_bin, cfg.freq_bins,
                           cfg.freq_bins) - 1.0
        _log_positions.cache = (key, pos)
        cached = _log_positions.cache
    return cached[1]


def _remap_log(spec: np.ndarray, cfg: PanakoConfig) -> np.ndarray:
    """Resample each frame's linear spectrum onto a log-frequency grid.

    The constant-Q move from the reference (PanakoEventPointProcessor.
    java:105,120-125): on a log axis a frequency *scaling* (what a
    vertical crop/rescale does to our column-profile spectrum) becomes a
    pure *translation*, so triplet Δf fields — 12 of the hash's low
    bits — are invariant under crops, and only the coarse f1 bucket
    moves."""
    pos = _log_positions(cfg)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, spec.shape[1] - 1)
    w1 = (pos - i0).astype(spec.dtype)
    return spec[:, i0] * (1.0 - w1) + spec[:, i1] * w1


def column_profiles(gray: np.ndarray, cfg: PanakoConfig) -> np.ndarray:
    """(h, w) float32 luma -> (n_frames, h) per-frame column-mean profiles.

    Row y of the image maps to column y of the output independently of
    every other row, so a vertical tile's profiles are EXACTLY
    `column_profiles(gray, cfg)[:, r0:r1]` (bit-identical floats) — the
    tile-rescue channel exploits this to probe many row ranges from one
    raster pass (landmarks.extract_prints_with_tiles)."""
    h, w = gray.shape
    fw, step = cfg.frame_width, cfg.frame_step
    if w < fw:  # pad narrow images to one frame
        gray = np.pad(gray, ((0, 0), (0, fw - w)), mode="edge")
        w = fw
    n_frames = 1 + (w - fw) // step
    if n_frames >= 1 << 21:
        # frame indices must fit the packed hit-coordinate budget
        # (stages/candidates._pack_half: t < 2^21); a >4M-frame image is
        # a multi-gigapixel-wide raster — fail loudly, never corrupt
        # packed hashes silently
        raise ValueError(
            f"image yields {n_frames} frames (width ~{w}px), beyond the "
            "packed hit-coordinate budget of 2^21 frames")
    # column-mean profile per frame: (n_frames, h)
    starts = np.arange(n_frames) * step
    # cumulative sum along x for O(1) window means
    csum = np.concatenate(
        [np.zeros((h, 1), np.float64), np.cumsum(gray, axis=1, dtype=np.float64)],
        axis=1,
    )
    return ((csum[:, starts + fw] - csum[:, starts]) / fw).T  # (n_frames, h)


def profiles_to_spectrogram(profiles: np.ndarray,
                            cfg: PanakoConfig) -> np.ndarray:
    """(n_frames, rows) profiles -> (n_frames, freq_bins) log-magnitude."""
    profiles = _resample_rows(profiles, cfg.freq_samples)
    # remove per-frame mean (brightness invariance beyond the DC drop)
    profiles = profiles - profiles.mean(axis=1, keepdims=True)
    spec = np.abs(np.fft.rfft(profiles, axis=1))[:, 1 : cfg.freq_bins + 1]
    if cfg.log_freq:
        spec = _remap_log(spec, cfg)
    return np.log1p(spec).astype(np.float32)


def spectrogram(gray: np.ndarray, cfg: PanakoConfig) -> np.ndarray:
    """(h, w) float32 luma -> (n_frames, freq_bins) float32 log-magnitude."""
    return profiles_to_spectrogram(column_profiles(gray, cfg), cfg)

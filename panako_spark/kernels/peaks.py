"""Event-point (peak) detection on the time/frequency field.

Reference semantics (SURVEY.md E3-E5):
  * separable running-max filter — vertical window over frequency bins
    then horizontal window over frames (Lemire streaming filter,
    LemireMinMaxFilter.java:114-162, applied in
    PanakoEventPointProcessor.java:114,135-148,166-176)
  * a bin is an event point iff its value equals the 2-D max-filtered
    value and is non-zero (PanakoEventPointProcessor.java:178-198)
  * event-point magnitude = 3x3 neighborhood sum for robustness (ibid.)

We vectorize the running max with stride tricks instead of the Lemire
deque — same output, batch-friendly. `naive_max_filter` mirrors the
reference's own test oracle (OlafEventPointProcessor.java:149-163).
"""

from __future__ import annotations

import numpy as np

from panako_spark.config import PanakoConfig


def running_max_1d(mat: np.ndarray, window: int, axis: int) -> np.ndarray:
    """Centered running max along `axis`, edge-padded (same shape out).

    van Herk/Gil-Werman: two `maximum.accumulate` passes over
    window-sized blocks give every position's max in O(n) total work,
    independent of window size — the batch-vectorized equivalent of the
    reference's O(n) Lemire deque (LemireMinMaxFilter.java:114-162),
    ~w/2 x less work than a sliding-window reduction at w=21."""
    if window <= 1:
        return mat
    half = window // 2
    m = np.moveaxis(mat, axis, -1)
    padded = np.pad(m, [(0, 0)] * (m.ndim - 1) + [(half, window - 1 - half)],
                    mode="edge")
    n_out = m.shape[-1]
    np_ = padded.shape[-1]
    n_blocks = -(-np_ // window)
    tail = n_blocks * window - np_
    if tail:  # pad to a block multiple; values never reach an output
        padded = np.concatenate(
            [padded, np.repeat(padded[..., -1:], tail, axis=-1)], axis=-1)
    blocks = padded.reshape(*padded.shape[:-1], n_blocks, window)
    # prefix max within each block, and suffix max within each block
    g = np.maximum.accumulate(blocks, axis=-1).reshape(
        *padded.shape[:-1], n_blocks * window)
    h = np.maximum.accumulate(blocks[..., ::-1], axis=-1)[..., ::-1].reshape(
        *padded.shape[:-1], n_blocks * window)
    # window starting at padded index i covers [i, i+window-1]:
    # max = max(suffix-in-block at i, prefix-in-block at i+window-1)
    out = np.maximum(h[..., :n_out], g[..., window - 1:window - 1 + n_out])
    return np.moveaxis(out, -1, axis)


def naive_max_filter(mat: np.ndarray, w_time: int, w_freq: int) -> np.ndarray:
    """O(n*w) loop oracle for tests (reference's own oracle pattern)."""
    nt, nf = mat.shape
    out = np.empty_like(mat)
    ht, hf = w_time // 2, w_freq // 2
    for t in range(nt):
        t0, t1 = max(0, t - ht), min(nt, t + w_time - ht)
        for f in range(nf):
            f0, f1 = max(0, f - hf), min(nf, f + w_freq - hf)
            out[t, f] = mat[t0:t1, f0:f1].max()
    return out


def max_filter_2d(mat: np.ndarray, w_time: int, w_freq: int) -> np.ndarray:
    """Separable 2-D max filter: E3 (freq axis) then E4 (time axis)."""
    return running_max_1d(running_max_1d(mat, w_freq, axis=1), w_time, axis=0)


def _peak_mask(spec: np.ndarray, w_time: int, w_freq: int,
               cfg: PanakoConfig) -> tuple[np.ndarray, np.ndarray]:
    filt = max_filter_2d(spec, w_time, w_freq)
    mask = (spec >= filt) & (spec > cfg.min_peak_magnitude)
    return np.nonzero(mask)


def find_peaks(spec: np.ndarray, cfg: PanakoConfig,
               windows: tuple[int, int] | None = None):
    """-> (t, f, m) int32/int32/float32 arrays, sorted by (t, f), capped.

    spec: (n_frames, freq_bins) log-magnitude field. `windows`
    overrides (w_time, w_freq) for the print-rescue re-pick
    (landmarks.prints_with_rescue) — config windows otherwise.
    """
    w_time, w_freq = windows or (cfg.max_filter_time, cfg.max_filter_freq)
    t, f = _peak_mask(spec, w_time, w_freq, cfg)
    if t.size == 0:
        return (t.astype(np.int32), f.astype(np.int32),
                np.zeros(0, np.float32))
    # 3x3 neighborhood sum as magnitude (E5)
    padded = np.pad(spec, 1, mode="constant")
    box = (
        padded[:-2, :-2] + padded[:-2, 1:-1] + padded[:-2, 2:]
        + padded[1:-1, :-2] + padded[1:-1, 1:-1] + padded[1:-1, 2:]
        + padded[2:, :-2] + padded[2:, 1:-1] + padded[2:, 2:]
    )
    m = box[t, f].astype(np.float32)
    if t.size > cfg.max_peaks_per_image:
        # keep strongest (reference caps event points per frame;
        # OlafEventPointProcessor.java:316-324) — deterministic tie-break
        order = np.lexsort((f, t, -m))[: cfg.max_peaks_per_image]
        t, f, m = t[order], f[order], m[order]
    order = np.lexsort((f, t))
    return (t[order].astype(np.int32), f[order].astype(np.int32), m[order])

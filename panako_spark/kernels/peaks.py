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

    Doubling / sparse-table max: O(log w) SIMD `np.maximum` passes over
    shifted views. Replaces a van Herk two-pass (`maximum.accumulate`)
    implementation that was algorithmically O(n) but ran the scan as a
    scalar loop (~0.8 GB/s measured vs ~30 GB/s for a vectorized
    `np.maximum`) — at w<=21 five vector passes beat two scalar scans
    ~10x. Semantics match the reference's Lemire deque filter
    (LemireMinMaxFilter.java:114-162) bit-for-bit: max is max."""
    if window <= 1:
        return mat
    half = window // 2
    pad = [(0, 0)] * mat.ndim
    pad[axis] = (half, window - 1 - half)
    g = np.pad(mat, pad, mode="edge")
    n_out = mat.shape[axis]

    def ax(arr: np.ndarray, start: int, stop: int | None) -> np.ndarray:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(start, stop)
        return arr[tuple(sl)]

    # g[i] = max over [i, i+span-1]; double span while it fits the window
    span = 1
    while span * 2 <= window:
        g = np.maximum(ax(g, 0, g.shape[axis] - span), ax(g, span, None))
        span *= 2
    # two overlapping spans cover [i, i+window-1] exactly
    return np.maximum(ax(g, 0, n_out),
                      ax(g, window - span, window - span + n_out))


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


def _cap_and_sort(t: np.ndarray, f: np.ndarray, m: np.ndarray,
                  cfg: PanakoConfig):
    """Per-image peak cap + canonical (t, f) sort (shared by the single
    and batched pickers so their outputs are bit-identical)."""
    if t.size > cfg.max_peaks_per_image:
        # keep strongest (reference caps event points per frame;
        # OlafEventPointProcessor.java:316-324) — deterministic tie-break
        order = np.lexsort((f, t, -m))[: cfg.max_peaks_per_image]
        t, f, m = t[order], f[order], m[order]
    order = np.lexsort((f, t))
    return (t[order].astype(np.int32), f[order].astype(np.int32), m[order])


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
    m = _box3_at(np.pad(spec, 1, mode="constant")[None],
                 np.zeros(t.size, np.intp), t, f)
    return _cap_and_sort(t, f, m, cfg)


def _box3_at(padded: np.ndarray, s: np.ndarray, t: np.ndarray,
             f: np.ndarray) -> np.ndarray:
    """3x3 neighborhood sum (E5 magnitude) gathered at peak coordinates
    only — peaks are ~10-40 per slice, so 9 gathers of a short vector
    replace 9 full-field adds (~4x measured). `padded` is the zero-
    padded (n_slices, frames+2, bins+2) stack; (s, t, f) index the
    UNpadded field. Accumulation order matches the full-field
    expression term-for-term, so the float32 sums are bit-identical."""
    m = padded[s, t, f]
    for dt in (0, 1, 2):
        for df in (0, 1, 2):
            if dt == 0 and df == 0:
                continue
            m = m + padded[s, t + dt, f + df]
    return m.astype(np.float32)


def find_peaks_batch(stack: np.ndarray, cfg: PanakoConfig,
                     windows: tuple[int, int] | None = None):
    """Batched find_peaks over a (n_slices, n_frames, freq_bins) stack.

    Element i of the returned list is bit-identical to
    `find_peaks(stack[i], cfg, windows)` — the max filter, mask, and
    3x3 box are elementwise/per-lane ops, so running them once over the
    3-D stack changes no values, only amortizes the per-call NumPy
    dispatch overhead that dominates at bench image sizes (~617 us per
    find_peaks call for ~18 peaks, of which ~2x230 us was running-max
    dispatch). The extract hot path (landmarks.extract_prints_with_tiles)
    feeds the full image + its crop-rescue tiles through one batch."""
    w_time, w_freq = windows or (cfg.max_filter_time, cfg.max_filter_freq)
    filt = running_max_1d(running_max_1d(stack, w_freq, axis=2),
                          w_time, axis=1)
    mask = (stack >= filt) & (stack > cfg.min_peak_magnitude)
    # flatnonzero + divmod == np.nonzero(mask) (~9x: one pass, no
    # per-axis index arrays built inside a generic ndim loop)
    n_sl, n_t, n_f = mask.shape
    flat = np.flatnonzero(mask.reshape(-1))
    s, rem = np.divmod(flat, n_t * n_f)
    t, f = np.divmod(rem, n_f)
    m = _box3_at(np.pad(stack, ((0, 0), (1, 1), (1, 1)), mode="constant"),
                 s, t, f)
    # nonzero emits row-major order: within a slice, (t, f) ascending —
    # already the canonical order find_peaks' final lexsort produces
    bounds = np.searchsorted(s, np.arange(stack.shape[0] + 1))
    out = []
    for i in range(stack.shape[0]):
        lo, hi = bounds[i], bounds[i + 1]
        if lo == hi:
            z = np.zeros(0, np.int32)
            out.append((z, z.copy(), np.zeros(0, np.float32)))
            continue
        out.append(_cap_and_sort(t[lo:hi], f[lo:hi], m[lo:hi], cfg))
    return out

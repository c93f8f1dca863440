"""Deterministic synthetic image+caption corpus (FIXTURES.md).

Mirrors the reference's evaluation protocol: base items plus modified
duplicates whose ground truth is encoded in the id (the reference encodes
it in filenames, TestData.java:67-80), with modification factors matching
the SoX sweep 0.84-1.16 (create_queries.rb:154-180) translated to images,
and a true-negative hold-out (evaluation.rb:32-37).

Everything is seeded NumPy — no external data (sandbox rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from panako_spark.config import PanakoConfig
from panako_spark.kernels.codec import encode, to_gray

WORDS = [f"w{i:04d}" for i in range(5000)]

MODS = ["reencode", "rescale", "anisoscale", "crop", "gamma", "noise",
        "translate"]
CAPTION_MODS = ["copy", "subst", "contain"]


@dataclass
class SynthRow:
    image_id: str
    bytes: bytes
    w: int
    h: int
    fmt: str
    caption: str
    phash: int
    pixels: np.ndarray = field(repr=False)  # kept for golden matcher


def _base_image(rng: np.random.Generator) -> np.ndarray:
    """Low-frequency random field + shapes + texture so 2D-FFT peaks are
    non-degenerate (FIXTURES.md Table 1)."""
    h = int(rng.integers(64, 257))
    w = int(rng.integers(64, 257))
    # low-frequency field: upsample a small random grid
    small = rng.random((8, 8))
    yy = np.linspace(0, 7, h)
    xx = np.linspace(0, 7, w)
    yi = np.floor(yy).astype(int); yf = yy - yi
    xi = np.floor(xx).astype(int); xf = xx - xi
    yi1 = np.minimum(yi + 1, 7); xi1 = np.minimum(xi + 1, 7)
    fld = (small[np.ix_(yi, xi)] * np.outer(1 - yf, 1 - xf)
           + small[np.ix_(yi1, xi)] * np.outer(yf, 1 - xf)
           + small[np.ix_(yi, xi1)] * np.outer(1 - yf, xf)
           + small[np.ix_(yi1, xi1)] * np.outer(yf, xf))
    img = fld * 120 + 60
    # periodic texture patches (strong FFT peaks)
    for _ in range(int(rng.integers(2, 5))):
        py, px = int(rng.integers(0, h - 16)), int(rng.integers(0, w - 16))
        ph, pw = int(rng.integers(16, min(48, h - py) + 1)), int(
            rng.integers(16, min(48, w - px) + 1))
        fy, fx = rng.uniform(0.2, 1.5), rng.uniform(0.2, 1.5)
        ys, xs = np.mgrid[0:ph, 0:pw]
        img[py:py + ph, px:px + pw] += 40 * np.sin(fy * ys + fx * xs)
    # geometric shapes
    for _ in range(int(rng.integers(2, 6))):
        cy, cx = int(rng.integers(8, h - 8)), int(rng.integers(8, w - 8))
        r = int(rng.integers(4, 20))
        ys, xs = np.mgrid[0:h, 0:w]
        mask = (ys - cy) ** 2 + (xs - cx) ** 2 < r * r
        img[mask] += float(rng.uniform(-50, 50))
    img = np.clip(img, 0, 255)
    rgb = np.stack([np.clip(img + rng.uniform(-10, 10), 0, 255)
                    for _ in range(3)], axis=-1)
    return rgb.astype(np.uint8)


def _resample_axis(img: np.ndarray, new_len: int, axis: int) -> np.ndarray:
    """Linear resample along one spatial axis."""
    img = np.moveaxis(img.astype(np.float64), axis, 0)
    m = img.shape[0]
    pos = np.linspace(0, m - 1, new_len)
    i0 = np.floor(pos).astype(int)
    i1 = np.minimum(i0 + 1, m - 1)
    w1 = (pos - i0).reshape(-1, *([1] * (img.ndim - 1)))
    out = img[i0] * (1 - w1) + img[i1] * w1
    return np.moveaxis(out, 0, axis)


def modify_image(img: np.ndarray, mod: str,
                 rng: np.random.Generator) -> np.ndarray:
    """Image analog of the SoX modification sweep (FIXTURES.md)."""
    h, w = img.shape[:2]
    if mod == "reencode":
        return img.copy()
    if mod == "rescale":
        f = float(rng.uniform(0.84, 1.16))
        out = _resample_axis(_resample_axis(img, max(16, int(h * f)), 0),
                             max(16, int(w * f)), 1)
    elif mod == "anisoscale":
        f = float(rng.uniform(0.84, 1.16))
        axis = int(rng.integers(0, 2))
        out = _resample_axis(img, max(16, int(img.shape[axis] * f)), axis)
    elif mod == "crop":
        ky = float(rng.uniform(0.80, 0.95))
        kx = float(rng.uniform(0.80, 0.95))
        nh, nw = max(16, int(h * ky)), max(16, int(w * kx))
        y0 = int(rng.integers(0, h - nh + 1))
        x0 = int(rng.integers(0, w - nw + 1))
        out = img[y0:y0 + nh, x0:x0 + nw].astype(np.float64)
    elif mod == "gamma":
        gain = float(rng.uniform(0.85, 1.15))
        gamma = float(rng.uniform(0.8, 1.2))
        out = 255.0 * np.power(np.clip(img / 255.0 * gain, 0, 1), gamma)
    elif mod == "noise":
        sigma = float(rng.uniform(2.0, 12.0))
        out = img + rng.normal(0, sigma, img.shape)
    elif mod == "translate":
        dy, dx = int(rng.integers(-4, 5)), int(rng.integers(-4, 5))
        out = np.roll(np.roll(img.astype(np.float64), dy, 0), dx, 1)
    else:
        raise ValueError(mod)
    return np.clip(out, 0, 255).astype(np.uint8)


def phash64(img: np.ndarray) -> int:
    """8x8 DCT-sign perceptual hash (FIXTURES.md phash column)."""
    g = to_gray(img)
    # mean-pool to 32x32 then DCT-II via FFT-free matrix (32x32 basis)
    gh = _resample_axis(_resample_axis(g[..., None], 32, 0), 32, 1)[..., 0]
    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d = basis @ gh @ basis.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint64)
    return int(((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
               .astype(np.int64))


def make_caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(8, 65))
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n))


def modify_caption(cap: str, mod: str, rng: np.random.Generator) -> str:
    toks = cap.split()
    if mod == "copy":
        return cap
    if mod == "subst":
        n_swap = max(1, int(len(toks) * float(rng.uniform(0.05, 0.20))))
        idx = rng.choice(len(toks), size=n_swap, replace=False)
        for i in idx:
            toks[int(i)] = WORDS[int(rng.integers(0, len(WORDS)))]
        return " ".join(toks)
    if mod == "contain":
        pre = [WORDS[int(rng.integers(0, len(WORDS)))]
               for _ in range(int(rng.integers(2, 8)))]
        post = [WORDS[int(rng.integers(0, len(WORDS)))]
                for _ in range(int(rng.integers(2, 8)))]
        return " ".join(pre + toks + post)
    raise ValueError(mod)


def generate_corpus(n_base: int, dup_fraction: float = 0.5,
                    seed: int = 42, cfg: PanakoConfig | None = None):
    """-> (rows: list[SynthRow], truth: dict) deterministic corpus.

    truth = {"image_dups": set[(a,b)], "caption_dups": set[(a,b)],
             "negatives": set[id]} — id encodes ground truth like the
    reference's filename convention.
    """
    rng = np.random.default_rng(seed)
    rows: list[SynthRow] = []
    image_dups: set[tuple[str, str]] = set()
    caption_dups: set[tuple[str, str]] = set()
    negatives: set[str] = set()
    n_dup_base = int(n_base * dup_fraction)
    for i in range(n_base):
        base_id = f"img{i:08d}"
        img = _base_image(rng)
        cap = make_caption(rng)
        fmt = "png" if i % 3 == 0 else "raw"
        rows.append(SynthRow(base_id, encode(img, fmt), img.shape[1],
                             img.shape[0], fmt, cap, phash64(img), img))
        if i < n_dup_base:
            k = int(rng.integers(1, 3))
            for d in range(k):
                mod = MODS[int(rng.integers(0, len(MODS)))]
                cmod = CAPTION_MODS[int(rng.integers(0, len(CAPTION_MODS)))]
                dimg = modify_image(img, mod, rng)
                dcap = modify_caption(cap, cmod, rng)
                did = f"{base_id}_dup{d}_{mod}_{cmod}"
                dfmt = "raw" if fmt == "png" else "png"
                rows.append(SynthRow(did, encode(dimg, dfmt), dimg.shape[1],
                                     dimg.shape[0], dfmt, dcap,
                                     phash64(dimg), dimg))
                image_dups.add((min(base_id, did), max(base_id, did)))
                caption_dups.add((min(base_id, did), max(base_id, did)))
        else:
            negatives.add(base_id)
    truth = {"image_dups": image_dups, "caption_dups": caption_dups,
             "negatives": negatives}
    return rows, truth


def rows_to_pandas(rows: list[SynthRow]):
    import pandas as pd

    return pd.DataFrame({
        "image_id": [r.image_id for r in rows],
        "bytes": [r.bytes for r in rows],
        "w": np.array([r.w for r in rows], dtype=np.int32),
        "h": np.array([r.h for r in rows], dtype=np.int32),
        "fmt": [r.fmt for r in rows],
        "caption": [r.caption for r in rows],
        "phash": np.array([r.phash for r in rows], dtype=np.int64),
    })


# ---------------------------------------------------------------------------
# Spark-parallel corpus generation for large bench corpora.
#
# generate_corpus above threads ONE rng through every row, which makes the
# content depend on generation order — inherently serial (4.6 ms/row on the
# bench host, so a 100k-image corpus would take ~8 min of driver time).
# Here each base index i gets its own child rng seeded (seed, i), so any
# partitioning of the index range produces byte-identical content — the
# generator parallelizes over all executors while staying deterministic.
# Used for throughput/scaling corpora; tests and the golden-parity fixtures
# keep the original serial generator.
# ---------------------------------------------------------------------------

IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, "
                 "fmt string, caption string, phash long")


def rows_for_base_index(i: int, n_dup_base: int, seed: int) -> list[SynthRow]:
    """All rows (base + its dups) for base index i; self-deterministic."""
    rng = np.random.default_rng([seed, 9173, i])
    base_id = f"img{i:08d}"
    img = _base_image(rng)
    cap = make_caption(rng)
    fmt = "png" if i % 3 == 0 else "raw"
    rows = [SynthRow(base_id, encode(img, fmt), img.shape[1], img.shape[0],
                     fmt, cap, phash64(img), img)]
    if i < n_dup_base:
        k = int(rng.integers(1, 3))
        for d in range(k):
            mod = MODS[int(rng.integers(0, len(MODS)))]
            cmod = CAPTION_MODS[int(rng.integers(0, len(CAPTION_MODS)))]
            dimg = modify_image(img, mod, rng)
            dcap = modify_caption(cap, cmod, rng)
            did = f"{base_id}_dup{d}_{mod}_{cmod}"
            dfmt = "raw" if fmt == "png" else "png"
            rows.append(SynthRow(did, encode(dimg, dfmt), dimg.shape[1],
                                 dimg.shape[0], dfmt, dcap, phash64(dimg),
                                 dimg))
    return rows


def write_corpus_spark(spark, out_path: str, n_base: int,
                       dup_fraction: float = 0.3, seed: int = 1234,
                       n_files: int = 64) -> None:
    """Generate the corpus on the cluster and write it as parquet."""
    n_dup_base = int(n_base * dup_fraction)

    def gen(it):
        for pdf in it:
            out: list[SynthRow] = []
            for i in pdf["id"]:
                out.extend(rows_for_base_index(int(i), n_dup_base, seed))
            yield rows_to_pandas(out)

    (spark.range(n_base).repartition(n_files)
     .mapInPandas(gen, IMAGES_SCHEMA)
     .write.mode("overwrite").parquet(out_path))

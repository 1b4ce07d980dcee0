"""Cardinality sketches: HyperLogLog approximate count-distinct.

Classic Flajolet et al. 2007 HLL with the standard small-range linear-
counting correction; 64-bit hashes make the large-range correction
unnecessary. Registers are a fixed ``2^p``-byte numpy array — the
mergeable (elementwise-max) summary that makes count-distinct a
constant-size per-block map + a driver merge at ANY corpus scale
(exact distinct is an all-to-all shuffle; the sketch is the 100 TB
path when +-1% is acceptable).

New scope vs the reference (large-scale training-data pipeline
tooling), same family as functions/minhash.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# alpha_m constants (Flajolet et al. 2007, fig. 3)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_new(p: int = 14) -> np.ndarray:
    """Empty register array (2^p uint8)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    return np.zeros(1 << p, dtype=np.uint8)


def hll_update(reg: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Fold a batch of values into the registers (vectorized).

    Values are hashed with ``pd.util.hash_array`` (any dtype, stable
    across processes). Top ``p`` hash bits pick the register, the rank
    is leading-zeros+1 of the remaining ``64-p`` bits — computed via
    float log2, exact because ``64-p <= 60 < 53`` holds for p >= 11 and
    for smaller p the low bits beyond 2^53 only matter for ranks <= 11
    where log2 is still exact on the leading bit."""
    if len(values) == 0:
        return reg
    p = int(np.log2(len(reg)))
    h = pd.util.hash_array(np.asarray(values)).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    nz = w > 0
    bits = np.zeros(len(w), dtype=np.int64)
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rank = ((64 - p) - bits + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches = elementwise max (associative,
    commutative, idempotent — safe under retries)."""
    return np.maximum(a, b)


def mg_summary(values: np.ndarray, k: int) -> dict:
    """Misra-Gries heavy-hitter summary of a batch: at most ``k``
    (item, undercount) counters. Guarantee: for every item,
    ``true_count - n/(k+1) <= est <= true_count``, so every item with
    frequency > n/(k+1) is retained. Built vectorized from exact batch
    counts, then reduced to k entries by subtracting the (k+1)-largest
    count (the batched equivalent of MG's decrement-all step)."""
    if len(values) == 0:
        return {}
    vals, counts = np.unique(np.asarray(values), return_counts=True)
    if len(vals) <= k:
        return dict(zip(vals.tolist(), counts.tolist()))
    # subtract the (k+1)-th largest count from everyone; keep positives
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > kth
    return dict(zip(vals[keep].tolist(), (counts[keep] - kth).tolist()))


def mg_merge(a: dict, b: dict, k: int) -> dict:
    """Merge two MG summaries (Agarwal et al. 2013: add counters, then
    subtract the (k+1)-largest merged count). Error bounds add."""
    out = dict(a)
    for v, c in b.items():
        out[v] = out.get(v, 0) + c
    if len(out) <= k:
        return out
    counts = np.fromiter(out.values(), dtype=np.int64, count=len(out))
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    return {v: c - kth for v, c in out.items() if c > kth}


def bloom_new(m_bits: int) -> np.ndarray:
    """Empty Bloom bit array (uint8-packed, m_bits rounded up to 8)."""
    return np.zeros((m_bits + 7) // 8, dtype=np.uint8)


def _bloom_positions(h1: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k double-hashed bit positions per input hash (Kirsch-Mitzenmacher:
    idx_i = h1 + i*h2, h2 derived from h1 by a splitmix finalizer and
    forced odd). Shape (len, k)."""
    h2 = h1 ^ (h1 >> np.uint64(30))
    with np.errstate(over="ignore"):
        h2 = h2 * np.uint64(0xBF58476D1CE4E5B9)
        h2 ^= h2 >> np.uint64(27)
        h2 = h2 * np.uint64(0x94D049BB133111EB)
        h2 |= np.uint64(1)
        ks = np.arange(k, dtype=np.uint64)
        pos = h1[:, None] + ks[None, :] * h2[:, None]
    return (pos % np.uint64(m_bits)).astype(np.int64)


def bloom_add(bloom: np.ndarray, h1: np.ndarray, k: int = 7) -> np.ndarray:
    """Fold pre-hashed u64 keys into the filter (vectorized)."""
    if len(h1) == 0:
        return bloom
    pos = _bloom_positions(h1, len(bloom) * 8, k).ravel()
    np.bitwise_or.at(bloom, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bloom


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_might_contain(
    bloom: np.ndarray, h1: np.ndarray, k: int = 7
) -> np.ndarray:
    """Membership mask (no false negatives; FP rate ~ (1-e^{-kn/m})^k)."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(h1, len(bloom) * 8, k)
    bits = (bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def tdigest_build(
    values: np.ndarray, weights: np.ndarray | None = None, delta: int = 100
) -> tuple[np.ndarray, np.ndarray]:
    """Merging t-digest (Dunning & Ertl 2019): compress sorted
    (value, weight) points into <= ~2*delta centroids, tighter near the
    tails (k1 scale function k(q) = delta/(2pi) * asin(2q-1)). Returns
    (means, weights), sorted by mean. Mergeable: concatenate two
    digests' centroids and rebuild."""
    v = np.asarray(values, dtype=np.float64)
    w = (
        np.ones(len(v), dtype=np.float64)
        if weights is None
        else np.asarray(weights, dtype=np.float64)
    )
    if len(v) == 0:
        return np.empty(0), np.empty(0)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    # the greedy pass below is sequential Python; pre-compress raw
    # (unit-weight) batches to <= 2000 equal-count groups first —
    # vectorized, and the 1/2000 per-batch rank error is far below the
    # digest's own tail accuracy at any practical delta
    if weights is None and len(v) > 2000:
        edges = np.linspace(0, len(v), 2001).astype(np.int64)
        edges = np.unique(edges)
        counts = np.diff(edges).astype(np.float64)
        sums = np.add.reduceat(v, edges[:-1])
        v = sums / counts
        w = counts
    W = float(w.sum())

    def k(q: float) -> float:
        return delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)

    means, wts = [], []
    cm, cw = v[0], w[0]
    q0 = 0.0
    for i in range(1, len(v)):
        q_new = (q0 + (cw + w[i]) / W)
        if k(min(q_new, 1.0)) - k(q0) <= 1.0:
            cm += (v[i] - cm) * (w[i] / (cw + w[i]))
            cw += w[i]
        else:
            means.append(cm)
            wts.append(cw)
            q0 += cw / W
            cm, cw = v[i], w[i]
    means.append(cm)
    wts.append(cw)
    return np.asarray(means), np.asarray(wts)


def tdigest_merge(
    a: tuple[np.ndarray, np.ndarray], b: tuple[np.ndarray, np.ndarray],
    delta: int = 100,
) -> tuple[np.ndarray, np.ndarray]:
    return tdigest_build(
        np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]]), delta
    )


def tdigest_quantile(
    digest: tuple[np.ndarray, np.ndarray], q: float
) -> float:
    """Interpolated quantile from centroid midpoints."""
    means, wts = digest
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    W = wts.sum()
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(wts) - wts / 2.0
    target = q * W
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    t = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + t * (means[i + 1] - means[i]))


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected cardinality estimate (+- ~1.04/sqrt(2^p))."""
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)

"""Dedup / fingerprint kernels: shingles, MinHash, LSH banding, SimHash,
n-gram Jaccard, rolling-hash document fingerprints.

New scope vs the reference (which only has exact dedup via Flink
``distinct``/groupby-first — SURVEY.md §2.7); required by the north
star for web-scale near-dedup. Algorithms are the standard published
ones (Broder 1997 MinHash; Charikar 2002 SimHash; Leskovec et al.,
"Mining of Massive Datasets" ch. 3 LSH banding). Vectorized with numpy
where the shapes allow.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)


def token_shingles(text: str, k: int = 3) -> set[bytes]:
    """Set of k-token shingles (whitespace tokens, joined by a single
    space, utf-8 encoded)."""
    toks = text.split()
    if len(toks) < k:
        return {(" ".join(toks)).encode("utf-8")} if toks else set()
    return {" ".join(toks[i : i + k]).encode("utf-8") for i in range(len(toks) - k + 1)}


def _hash64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def _perm_params(num_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """MinHash signatures with ``num_perm`` universal-hash permutations.

    Stateful (permutation params precomputed once) — instantiate in an
    actor's ``__init__`` and call per batch.
    """

    def __init__(self, num_perm: int = 128, k: int = 3, seed: int = 1337):
        self.num_perm = num_perm
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        """uint64 signature of length ``num_perm``; all-max for empty text."""
        sh = token_shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, _MAXH, dtype=np.uint64)
        base = np.fromiter((_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))
        # (a*x + b) mod p, vectorized over shingles × permutations
        with np.errstate(over="ignore"):
            vals = (np.outer(base, self.a) + self.b) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """LSH band keys: hash of each contiguous band of the signature,
        mixed with the band index so buckets don't collide across bands."""
        rows = self.num_perm // bands
        keys = []
        for b in range(bands):
            h = hashlib.blake2b(sig[b * rows : (b + 1) * rows].tobytes(), digest_size=8)
            h.update(struct.pack("<I", b))
            keys.append(struct.unpack("<Q", h.digest())[0] & 0x7FFFFFFFFFFFFFFF)
        return keys


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact Jaccard over k-token shingle sets (the LSH verify step)."""
    sa, sb = token_shingles(a, k), token_shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over whitespace tokens (unit weights)."""
    acc = np.zeros(bits, dtype=np.int64)
    for tok in set(text.split()):
        h = _hash64(tok.encode("utf-8"))
        for i in range(bits):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: 64-bit rolling hashes of
    ``window``-token windows, keeping hashes ≡ 0 (mod ``keep_mod``)
    (mod-p selection variant of Schleimer et al. 2003)."""
    toks = text.split()
    if not toks:
        return []
    if len(toks) < window:
        return [_hash64(" ".join(toks).encode("utf-8"))]
    out = []
    for i in range(len(toks) - window + 1):
        h = _hash64(" ".join(toks[i : i + window]).encode("utf-8"))
        if h % keep_mod == 0:
            out.append(h)
    return out

"""String/vector similarity kernels.

Reference formulas: NameScorer uses ``eu.fbk.utils`` Levenshtein /
Jaro-Winkler distances averaged over entity names
(alignments/.../scorer/NameScorer.java:18-60); cosine over tf/LSA
vectors (scorer/text/CosineScorer.java). Implemented from the public
textbook definitions (Winkler 1990; standard DP Levenshtein); numpy for
the vector ops.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    """Jaro similarity in [0,1]."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ch:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity (Winkler's prefix boost, scaling 0.1,
    prefix capped at 4)."""
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def name_similarity(compare: str, names: list[str], metric=jaro_winkler) -> float:
    """NameScorer.getFeatureForString (NameScorer.java:42-53): the metric
    averaged over all entity names, both sides trimmed+lowercased."""
    if not names:
        return 0.0
    left = compare.strip().lower()
    total = 0.0
    for name in names:
        total += metric(left, name.strip().lower())
    return total / len(names)


def cosine(u: np.ndarray, v: np.ndarray) -> float:
    """Cosine similarity; 0.0 when either norm is 0."""
    nu = float(np.linalg.norm(u))
    nv = float(np.linalg.norm(v))
    if nu == 0.0 or nv == 0.0:
        return 0.0
    return float(np.dot(u, v) / (nu * nv))


def cosine_matrix(batch: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity of ``batch`` (n×d) against ``queries``
    (q×d) → n×q matrix. Zero-norm rows get similarity 0."""
    bn = np.linalg.norm(batch, axis=1, keepdims=True)
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    bn[bn == 0] = 1.0
    qn[qn == 0] = 1.0
    return (batch / bn) @ (queries / qn).T


def tf_vector(text: str, vocab: dict[str, int]) -> np.ndarray:
    """Logarithmic term-frequency vector over a fixed vocab
    (profiling/extractors/LSA/BOW.java:105-117 semantics: 1+log(tf))."""
    v = np.zeros(len(vocab), dtype=np.float64)
    for tok in text.split():
        idx = vocab.get(tok)
        if idx is not None:
            v[idx] += 1.0
    nz = v > 0
    v[nz] = 1.0 + np.log(v[nz])
    return v

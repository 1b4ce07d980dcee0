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


def token_shingles(text: str, k: int = 3) -> set[str]:
    """Set of k-token shingles (whitespace tokens, joined by a single
    space)."""
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def _hash64_strings(strings: list[str]) -> np.ndarray:
    """Vectorized deterministic 64-bit hashes of strings (pandas
    hash_pandas_object: fixed-key sipstring hash — stable across
    processes; ~50x faster than per-item blake2b)."""
    import pandas as pd

    if not strings:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(
        pd.Series(strings, dtype="object"), index=False
    ).to_numpy(dtype=np.uint64)


def _perm_params(num_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """MinHash signatures with ``num_perm`` universal-hash permutations.

    Stateful (permutation params precomputed once) — instantiate in an
    actor's ``__init__`` and call per batch.

    ``scheme="perm"`` (default) is classic k-permutation MinHash
    (Broder 1997): every shingle is hashed once per permutation —
    O(shingles x num_perm) multiplies, the dominant cost of the dedup
    stage at corpus scale. ``scheme="oph"`` is one-permutation hashing
    (Li, Owen, Zhang, NIPS 2012) with rotation densification
    (Shrivastava & Li, ICML 2014): ONE universal hash per shingle,
    binned into ``num_perm`` slots with a per-slot min, empty slots
    borrowing circularly from the nearest filled slot with an
    offset-per-hop to avoid spurious collisions — O(shingles) total.
    Both schemes are unbiased Jaccard estimators and produce drop-in
    signatures for ``band_keys_batch`` (OPH variance is slightly higher
    for docs with fewer shingles than slots)."""

    def __init__(
        self, num_perm: int = 128, k: int = 3, seed: int = 1337,
        scheme: str = "perm",
    ):
        if scheme not in ("perm", "oph"):
            raise ValueError(f"unknown minhash scheme: {scheme!r}")
        self.num_perm = num_perm
        self.k = k
        self.scheme = scheme
        self.a, self.b = _perm_params(num_perm, seed)
        rng = np.random.RandomState(seed ^ 0x5EED)
        self.oph_a = np.uint64(rng.randint(1, _MERSENNE) | 1)  # odd
        self.oph_b = np.uint64(rng.randint(0, _MERSENNE))

    def signature(self, text: str) -> np.ndarray:
        """uint64 signature of length ``num_perm``; all-max for empty text."""
        return self.signatures([text])[0]

    def _token_hashes(self, texts) -> tuple[np.ndarray, np.ndarray, list[int]]:
        """(flat per-token u64 hashes, per-nonempty-doc token counts,
        nonempty doc indices). Accepts a Python list[str] OR an Arrow
        string array/chunked array — the Arrow path tokenizes with
        ``utf8_split_whitespace`` (verified identical to ``str.split``
        incl. unicode whitespace) and only materializes the DISTINCT
        tokens as Python strings for hashing, so a split task never
        allocates per-token Python objects for the whole corpus slice.
        Both paths hash distinct tokens via ``pd.util.hash_pandas_object``
        — signatures are bit-identical across paths (unit-tested).
        A/B at the 1M-page scale measured the arrow path neutral-to-
        slower on this box (dictionary_encode dominates), so callers
        default to list[str]; the arrow path remains for payloads where
        ``to_pylist`` itself is the bottleneck."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            col = (
                texts.combine_chunks()
                if isinstance(texts, pa.ChunkedArray)
                else texts
            )
            toks = pc.utf8_split_whitespace(col)
            lens_raw = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = pc.list_flatten(toks)
            keep = pc.greater(pc.binary_length(flat), 0)
            doc_flat = np.repeat(np.arange(len(lens_raw)), lens_raw)
            keep_np = keep.to_numpy(zero_copy_only=False)
            if not keep_np.all():
                doc_flat = doc_flat[keep_np]
                flat = flat.filter(keep)
            lens = np.bincount(doc_flat, minlength=len(lens_raw))
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            uniques = enc.dictionary.to_pandas().astype(object)
            uh = pd.util.hash_pandas_object(
                pd.Series(uniques, dtype="object"), index=False
            ).to_numpy(dtype=np.uint64)
            th = uh[codes] if len(codes) else np.empty(0, np.uint64)
            nz = lens > 0
            return th, lens[nz], list(np.nonzero(nz)[0])

        tok_lists = [t.split() for t in texts]
        doc_idx = [i for i, tl in enumerate(tok_lists) if tl]
        tok_lists = [tok_lists[i] for i in doc_idx]
        if not tok_lists:
            return np.empty(0, np.uint64), np.empty(0, np.int64), doc_idx
        all_toks = np.asarray(
            [t for tl in tok_lists for t in tl], dtype=object
        )
        codes, uniques = pd.factorize(all_toks)
        th = pd.util.hash_pandas_object(
            pd.Series(uniques, dtype="object"), index=False
        ).to_numpy(dtype=np.uint64)[codes]
        tok_lens = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
        return th, tok_lens, doc_idx

    def _shingle_hashes(self, texts) -> tuple[np.ndarray, np.ndarray, list[int]]:
        """Numeric shingle hashes without materializing shingle strings:
        tokens are factorized per batch (each distinct token hashed
        ONCE), then k-window shingle hashes are a vectorized polynomial
        over the token-hash array. Eliminates the 15M-string-joins-per-
        100k-docs cost of the naive shingle builder (measured 5x on the
        LSH stage). Duplicate shingles are NOT deduped — min() is
        invariant under multiplicity, so MinHash needs no set semantics.

        Returns (flat shingle hashes, per-doc shingle counts, doc idx)."""
        th, tok_lens, doc_idx = self._token_hashes(texts)
        if len(th) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64), doc_idx
        k = self.k
        n_win = len(th) - k + 1
        mix = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            if n_win > 0:
                acc = np.zeros(n_win, dtype=np.uint64)
                for j in range(k):
                    acc = (acc ^ th[j : j + n_win]) * mix
                acc ^= acc >> np.uint64(29)
            else:
                acc = np.empty(0, dtype=np.uint64)
            # short docs (0 < len < k): one shingle of all tokens —
            # fold the whole doc's token hashes (token_shingles parity)
            starts = np.concatenate(([0], np.cumsum(tok_lens)[:-1]))
            short = np.nonzero(tok_lens < k)[0]
            short_vals = np.empty(len(short), dtype=np.uint64)
            for si, d in enumerate(short):
                a = np.uint64(0)
                for hv in th[starts[d] : starts[d] + tok_lens[d]]:
                    a = (a ^ hv) * mix
                short_vals[si] = a ^ (a >> np.uint64(29))
        # gather valid windows per doc (windows crossing doc boundaries
        # are computed above but dropped here)
        lens = np.maximum(tok_lens - k + 1, 1)
        out_parts = []
        for d in range(len(tok_lens)):
            if tok_lens[d] >= k:
                out_parts.append(acc[starts[d] : starts[d] + lens[d]])
        long_mask = tok_lens >= k
        if len(short):
            # interleave in doc order
            base = np.empty(int(lens.sum()), dtype=np.uint64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            li = 0
            si = 0
            for d in range(len(tok_lens)):
                if long_mask[d]:
                    base[offs[d] : offs[d + 1]] = out_parts[li]
                    li += 1
                else:
                    base[offs[d]] = short_vals[si]
                    si += 1
        else:
            base = (
                np.concatenate(out_parts)
                if out_parts
                else np.empty(0, np.uint64)
            )
        return base, lens, doc_idx

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch signatures (n × num_perm).

        Permutations are multiply-shift universal hashes ``a*x + b``
        over the natural u64 wraparound (Dietzfelbinger et al. — no
        modulo pass), and the (shingles × perms) intermediate is blocked
        at ~4 MB so the multiply and the per-doc ``minimum.reduceat``
        stay cache-resident: the naive 50 MB-block version was DRAM-
        bandwidth-bound and did not scale past ~8 cores."""
        n = len(texts)
        out = np.full((n, self.num_perm), _MAXH, dtype=np.uint64)
        base, lens, doc_idx = self._shingle_hashes(texts)
        if len(base) == 0:
            return out
        if self.scheme == "oph":
            out[np.asarray(doc_idx, dtype=np.int64)] = self._oph_matrix(
                base, lens
            )
            return out
        # block sized for a PRIVATE L2 slice (~512 KB): with many workers
        # per node the aggregate working set must not rely on shared L3,
        # or the stage stops scaling past ~8 cores
        block_shingles = max(32, 512_000 // (8 * self.num_perm))
        buf = np.empty((block_shingles, self.num_perm), dtype=np.uint64)
        pos = 0
        d = 0
        with np.errstate(over="ignore"):
            while d < len(lens):
                j = d
                tot = 0
                while j < len(lens) and (tot == 0 or tot + lens[j] <= block_shingles):
                    tot += lens[j]
                    j += 1
                # a single oversized doc can exceed the buffer
                v = (
                    buf[:tot]
                    if tot <= block_shingles
                    else np.empty((tot, self.num_perm), dtype=np.uint64)
                )
                np.multiply(base[pos : pos + tot, None], self.a, out=v)
                np.add(v, self.b, out=v)
                starts = np.concatenate(([0], np.cumsum(lens[d:j])[:-1]))
                mins = np.minimum.reduceat(v, starts, axis=0)
                out[[doc_idx[x] for x in range(d, j)]] = mins
                pos += tot
                d = j
        return out

    def _oph_matrix(self, base: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """One-permutation-hashing signature rows for the non-empty docs
        of a ``_shingle_hashes`` result: one universal hash per shingle,
        per-(doc, slot) min via sort + ``minimum.reduceat``, then
        rotation densification. O(shingles) hash work vs the perm
        scheme's O(shingles x num_perm)."""
        P = self.num_perm
        nd = len(lens)
        with np.errstate(over="ignore"):
            v = base * self.oph_a + self.oph_b
            v ^= v >> np.uint64(33)
            v *= np.uint64(0xFF51AFD7ED558CCD)
            v ^= v >> np.uint64(33)
        slots = (v % np.uint64(P)).astype(np.int64)
        docs = np.repeat(np.arange(nd, dtype=np.int64), lens)
        key = docs * P + slots
        order = np.argsort(key, kind="stable")
        ks, vs = key[order], v[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]])
        )
        mins = np.minimum.reduceat(vs, starts)
        skey = ks[starts]
        m = np.full((nd, P), _MAXH, dtype=np.uint64)
        m[skey // P, skey % P] = mins
        return self._densify_rotation(m)

    def _densify_rotation(self, m: np.ndarray) -> np.ndarray:
        """Fill empty OPH slots from the nearest filled slot to the LEFT
        (circular), adding a fixed offset per hop (improved/rotation
        densification, Shrivastava & Li 2014): two docs that are both
        empty at slot j collide iff they borrow from equal values at
        equal distance, preserving the unbiased-Jaccard collision
        probability; the per-hop offset stops borrowed values colliding
        with genuine ones. Every row here has >=1 filled slot (a doc
        with >=1 shingle always fills one); all-empty rows are handled
        by the caller (all-sentinel signature)."""
        P = m.shape[1]
        filled = m != _MAXH
        if filled.all():
            return m
        cols = np.arange(P, dtype=np.int64)
        # doubled position space keeps the running max monotone: the
        # second copy stores col+P, so "largest filled position <= P+j"
        # IS the circularly-nearest filled slot at or left of j
        pos1 = np.where(filled, cols[None, :], np.int64(-1))
        pos2 = np.where(filled, cols[None, :] + P, np.int64(-1))
        ff = np.maximum.accumulate(
            np.concatenate([pos1, pos2], axis=1), axis=1
        )[:, P:]
        dist = cols[None, :] + P - ff  # circular hop count, in [0, P)
        src = m[np.arange(m.shape[0])[:, None], ff % P]
        with np.errstate(over="ignore"):
            borrowed = src + dist.astype(np.uint64) * np.uint64(
                0x9E3779B97F4A7C15
            )
        return np.where(filled, m, borrowed)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """LSH band keys for one signature."""
        return self.band_keys_batch(sig.reshape(1, -1), bands)[0].tolist()

    def band_keys_batch(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """Vectorized band keys (n × bands): polynomial mix of each
        contiguous band's rows, xor'd with the band index so buckets
        never collide across bands. Mixing collisions are harmless —
        the exact-Jaccard verify step rejects false candidates."""
        n, p = sigs.shape
        rows = p // bands
        mix = np.uint64(0x9E3779B97F4A7C15)
        out = np.empty((n, bands), dtype=np.int64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                band = sigs[:, b * rows : (b + 1) * rows]
                acc = np.zeros(n, dtype=np.uint64)
                for r in range(rows):
                    acc = (acc ^ band[:, r]) * mix
                acc ^= np.uint64(b * 0x100000001B3)
                out[:, b] = (acc >> np.uint64(1)).astype(np.int64)
        return out


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


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a64_codepoints(strings) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over Unicode CODE POINTS, one hash per
    string: ``acc = (acc ^ cp) * prime mod 2^64`` folded left-to-right
    from the standard offset basis. This is SimHash's token hash —
    chosen over the (faster-to-call) pandas siphash because FNV-1a is
    a published, implementation-independent recurrence that ANSI SQL
    can replay exactly (DuckDB ``list_reduce`` over ``unicode()`` code
    points mod 2^64 — see SQL_SIMHASH_DUP_PAIRS in queries.py), which
    makes the SimHash near-dup catalog query EXACTLY oracle-checkable
    rather than rows-only. Vectorized across strings: a padded 2-D
    code-point matrix (utf-32 decode per string) and one fused
    xor-multiply per CHARACTER POSITION, so cost scales with the
    longest token, not token count."""
    n = len(strings)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    if lens.max() == 0:
        return out
    # Process in LENGTH-SORTED chunks bounded to ~32 MB of matrix: the
    # padded n x maxlen design is O(n * longest) — one pathological
    # unbroken crawl token (URL/base64/minified-JS run) next to a big
    # vocabulary would otherwise allocate gigabytes in a map task.
    # Sorting groups similar lengths so each chunk's matrix is tight;
    # results scatter back to input order.
    order = np.argsort(lens, kind="stable")
    budget = (32 << 20) // 8  # uint64 elements
    start = 0
    with np.errstate(over="ignore"):
        while start < n:
            end = start + 1
            maxlen = max(int(lens[order[start]]), 1)
            while end < n:
                cand_len = max(int(lens[order[end]]), 1)
                if (end - start + 1) * cand_len > budget:
                    break
                maxlen = cand_len  # sorted: last element is longest
                end += 1
            idx = order[start:end]
            m = len(idx)
            mat = np.zeros((m, maxlen), dtype=np.uint64)
            for r, i in enumerate(idx):
                s = strings[i]
                if s:
                    mat[r, : len(s)] = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    )
            acc = np.full(m, _FNV_OFFSET, dtype=np.uint64)
            clens = lens[idx]
            for j in range(maxlen):
                active = clens > j
                acc[active] = (acc[active] ^ mat[active, j]) * _FNV_PRIME
            out[idx] = acc
            start = end
    return out


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over whitespace tokens (unit weights),
    vectorized. Token hash is ``fnv1a64_codepoints`` (SQL-replayable
    — the exact-oracle contract; see that function's docstring)."""
    toks = sorted(set(text.split()))
    if not toks:
        return 0
    hs = fnv1a64_codepoints(toks)
    shifts = np.arange(bits, dtype=np.uint64)
    bitm = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    acc = (2 * bitm - 1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def simhash_batch(texts: list[str], bits: int = 64) -> np.ndarray:
    """Vectorized batch SimHash (same result per text as ``simhash``):
    the batch's tokens are factorized so each distinct token is hashed
    ONCE, the per-token ±1 bit signs are gathered, and per-doc sign
    accumulation is a single ``np.add.reduceat`` over the contiguous
    doc segments — no per-document 64×n bit-matrix builds. Returns
    uint64 fingerprints (0 for empty docs)."""
    import pandas as pd

    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    tok_lists = [sorted(set(t.split())) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    if lens.sum() == 0:
        return out
    flat = np.asarray([t for tl in tok_lists for t in tl], dtype=object)
    codes, uniques = pd.factorize(flat)
    # FNV-1a over code points — the SQL-replayable token hash that
    # makes simhash_dup_pairs exactly oracle-checkable (each distinct
    # token hashed once per batch; see fnv1a64_codepoints)
    uh = fnv1a64_codepoints(list(uniques))
    shifts = np.arange(bits, dtype=np.uint64)
    signs = (2 * ((uh[:, None] >> shifts) & np.uint64(1)).astype(np.int32)) - 1
    tok_signs = signs[codes]  # (total_tokens × bits), int32
    nz = np.nonzero(lens)[0]
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
    acc = np.add.reduceat(tok_signs, starts, axis=0)
    m = (acc > 0).astype(np.uint64)
    out[nz] = (m << shifts).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def winnow_anchors(
    texts: list[str], k: int = 8, min_tokens: int = 40
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Positioned winnowing anchors (Schleimer et al. 2003, the
    min-in-window scheme with its coverage GUARANTEE, unlike the
    mod-p ``rolling_fingerprint``): per doc, 64-bit rolling hashes of
    every ``k``-token window, then the minimum of each sliding window
    of ``w = min_tokens - k + 1`` consecutive window-hashes is
    selected. Any two docs sharing a run of >= ``min_tokens`` exact
    tokens are guaranteed to select at least one identical
    (fingerprint, k-gram) anchor inside the shared run, so anchor
    collision + extension finds every qualifying span. Docs shorter
    than ``min_tokens`` cannot contain one and are skipped.

    Returns (doc_idx int64, token_pos int64, fp uint64) arrays.
    Anchor density is ~2/w of token count — the exchange ships
    fingerprints, never text."""
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    w = min_tokens - k + 1
    assert w >= 1, "min_tokens must be >= k"
    z = np.empty(0, dtype=np.int64)
    tok_lists = [str(t).split() for t in texts]
    idxs = [i for i, tl in enumerate(tok_lists) if len(tl) >= min_tokens]
    if not idxs:
        return z, z.copy(), np.empty(0, dtype=np.uint64)
    # batch-level token hashing: one factorize over the flat stream
    # (each distinct token hashed once), one polynomial pass for every
    # window hash; cross-doc windows are computed then masked out by
    # the per-doc valid ranges — far cheaper than per-doc hashing
    flat = np.asarray(
        [t for i in idxs for t in tok_lists[i]], dtype=object
    )
    codes, uniques = pd.factorize(flat)
    # FNV-1a over code points (like simhash): SQL-replayable, which
    # makes the doc_fingerprints catalog query exactly oracle-checkable
    # (SQL_DOC_FINGERPRINTS replays token hash + k-gram fold + leftmost
    # arg-min winnowing verbatim)
    th = fnv1a64_codepoints(list(uniques))[codes]
    lens = np.asarray([len(tok_lists[i]) for i in idxs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    m_all = len(th) - k + 1
    mix = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        acc = np.zeros(m_all, dtype=np.uint64)
        for j in range(k):
            acc = (acc ^ th[j : j + m_all]) * mix
    di: list[np.ndarray] = []
    pos: list[np.ndarray] = []
    fps: list[np.ndarray] = []
    for i, off, ln in zip(idxs, offs, lens):
        h = acc[off : off + ln - k + 1]
        sw = sliding_window_view(h, min(w, len(h)))
        sel = np.unique(np.argmin(sw, axis=1) + np.arange(len(sw)))
        di.append(np.full(len(sel), i, dtype=np.int64))
        pos.append(sel.astype(np.int64))
        fps.append(h[sel])
    return np.concatenate(di), np.concatenate(pos), np.concatenate(fps)


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: 64-bit rolling hashes of
    ``window``-token windows, keeping hashes ≡ 0 (mod ``keep_mod``)
    (mod-p selection variant of Schleimer et al. 2003)."""
    toks = text.split()
    if not toks:
        return []
    if len(toks) < window:
        return [int(_hash64_strings([" ".join(toks)])[0])]
    windows = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
    hs = _hash64_strings(windows)
    return [int(h) for h in hs if h % keep_mod == 0]

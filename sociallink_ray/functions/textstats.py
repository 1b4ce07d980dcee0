"""Text-analysis kernels: language ID, quality scoring, token counting,
stopword ratios.

New scope vs the reference (required for a large-scale training-data
pipeline). Heuristics only — no external models: language ID is a
character-n-gram profile match over tiny built-in profiles; quality
scores are length/punctuation/stopword ratios (C4/Gopher-style published
heuristics).
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"[\w']+|[^\w\s]", re.U)

EN_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not have has had but they you we he she i".split()
)

# Tiny per-language frequent-word profiles (public common-word lists).
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for was with are be this have from".split()),
    "de": frozenset("der die und das ist du ich nicht sie es ein mit für auf den von".split()),
    "fr": frozenset("le la et les des est vous que il pour pas avec une sur dans du je".split()),
    "es": frozenset("el la de que y en los se del las un por con una para es no".split()),
}


def bpe_ish_token_count(text: str) -> int:
    """Token count with a BPE-ish regex (words + punctuation as separate
    tokens) — the cheap stand-in for a real tokenizer."""
    return len(_WORD_RE.findall(text))


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def detect_language(text: str) -> str:
    """Heuristic language ID: share of whitespace tokens present in each
    language's frequent-word profile; 'und' when nothing scores > 0."""
    toks = text.lower().split()
    if not toks:
        return "und"
    best_lang, best = "und", 0.0
    for lang, profile in _LANG_PROFILES.items():
        score = sum(1 for t in toks if t in profile) / len(toks)
        if score > best:
            best, best_lang = score, lang
    return best_lang if best > 0.0 else "und"


def repetition_signals(text: str) -> dict[str, float]:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 —
    published heuristics): duplicate-line fraction, duplicate-line
    character fraction, and top-n-gram character fractions. A line
    occurring c times contributes c-1 duplicate occurrences; the
    character fraction weights by line length. top_{n}gram_char_frac is
    the share of characters covered by the single most frequent word
    n-gram (only counted when it repeats)."""
    from collections import Counter

    lines = text.split("\n")
    n_lines = len(lines)
    lc = Counter(lines)
    dup_lines = n_lines - len(lc)
    total_chars = sum(len(ln) * c for ln, c in lc.items())
    dup_chars = sum(len(ln) * (c - 1) for ln, c in lc.items() if c > 1)
    out = {
        "n_lines": float(n_lines),
        "dup_line_frac": dup_lines / n_lines if n_lines else 0.0,
        "dup_line_char_frac": dup_chars / total_chars if total_chars else 0.0,
    }
    toks = text.split()
    wc = Counter(toks)
    n_words = len(toks)
    dup_words = n_words - len(wc)
    total_wchars = sum(len(w) * c for w, c in wc.items())
    dup_wchars = sum(len(w) * (c - 1) for w, c in wc.items() if c > 1)
    out["n_words"] = float(n_words)
    out["dup_word_frac"] = dup_words / n_words if n_words else 0.0
    out["dup_word_char_frac"] = (
        dup_wchars / total_wchars if total_wchars else 0.0
    )
    n_txt_chars = len(text)
    for n in (2, 3, 4):
        frac = 0.0
        if len(toks) >= n and n_txt_chars:
            grams = Counter(
                tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            gram, cnt = grams.most_common(1)[0]
            if cnt > 1:
                # chars covered = occurrences * n-gram length (with spaces)
                frac = min(
                    1.0, cnt * (sum(map(len, gram)) + n - 1) / n_txt_chars
                )
        out[f"top_{n}gram_char_frac"] = frac
    return out


def quality_features(text: str) -> dict[str, float]:
    """Quality-scoring features (length / punctuation / stopword ratios,
    mean word length, uppercase ratio) — the usual web-corpus filters."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    if n_chars == 0:
        return {
            "n_chars": 0.0, "n_tokens": 0.0, "mean_word_len": 0.0,
            "punct_ratio": 0.0, "stopword_ratio": 0.0, "upper_ratio": 0.0,
            "quality": 0.0,
        }
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    n_upper = sum(1 for c in text if c.isupper())
    stop = sum(1 for t in toks if t.lower() in EN_STOPWORDS)
    mean_wl = float(np.mean([len(t) for t in toks])) if toks else 0.0
    punct_ratio = n_punct / n_chars
    stop_ratio = stop / n_tokens if n_tokens else 0.0
    upper_ratio = n_upper / n_chars
    # crude composite: reward stopword presence + sane word length,
    # penalize punctuation/upper noise
    quality = max(
        0.0,
        min(
            1.0,
            0.5 * min(stop_ratio * 4, 1.0)
            + 0.5 * (1.0 if 3.0 <= mean_wl <= 10.0 else 0.3)
            - punct_ratio
            - max(0.0, upper_ratio - 0.3),
        ),
    )
    return {
        "n_chars": float(n_chars), "n_tokens": float(n_tokens),
        "mean_word_len": mean_wl, "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio, "upper_ratio": upper_ratio,
        "quality": quality,
    }

"""Text-normalization kernels (the byte-identity invariants).

Pure Python / unicode-codepoint-exact functions, engine-agnostic; Ray
stages wrap them in ``map_batches``. Semantics follow the reference
normalization kernel (reference: alignments/src/main/java/eu/fbk/fm/
vectorize/preprocessing/text/TextProcessor.java:30-176 and
index/BuildUserIndex.java:271-322) re-expressed for this engine:

* ``prepare_string``        — NUL (U+0000) strip (TextProcessor.java:165-176)
* ``collapse_ws``           — whitespace-run collapse to single space + trim
                              (BuildUserIndex.java:271-297 ``prepareString``)
* ``normalize_fullname``    — the inverted-index key normalization:
                              NUL strip + ws collapse + casefold
* ``break_camel``           — CamelCase splitter used for hashtag-style spans
                              (TextProcessor.java:129-147 ``breakHashtag``)
* ``clean_and_separate_emoji`` — emoji isolation; Fitzpatrick modifiers and
                              ZWJ dropped (TextProcessor.java:95-127)
* ``normalize_microtext``   — the full microtext kernel: span replacement by
                              codepoint indices, RT strip, residual-URL
                              replacement, ws collapse, optional lowercase
                              (TextProcessor.java:30-93)
* ``extract_html_text``     — the graft's HTML->text extractor; the per-url
                              byte-identity contract of BASELINE.json
                              ``input_hint`` (spec defined HERE, fixtures
                              generate the inverse)

All are deterministic; golden tests live in tests/test_textnorm.py.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterable, Sequence

NUL = "\x00"

# --- reference-equivalent micro kernels -----------------------------------

_WS_RUN = re.compile(r"\s+")
_URL_RE = re.compile(r"https?://[^\s]+")


def prepare_string(s: str) -> str:
    """Strip NUL codepoints (TextProcessor.java:165-176)."""
    return s.replace(NUL, "")


def collapse_ws(s: str) -> str:
    """Collapse whitespace runs to a single space and trim
    (BuildUserIndex.java:271-297)."""
    return _WS_RUN.sub(" ", s).strip()


def normalize_fullname(s: str) -> str:
    """Inverted-index key: NUL strip + ws collapse + casefold.

    The reference stores raw display names and relies on Postgres
    fulltext (schema.sql:43-48); our broadcast index uses an explicit
    normalized key instead — this function IS that key's definition.
    """
    return collapse_ws(prepare_string(s)).casefold()


def break_camel(word: str) -> str:
    """CamelCase split with ``<shash>``/``<ehash>`` guards
    (TextProcessor.java:129-147): a space is inserted before every
    uppercase run start."""
    out = [" <shash> "]
    prev_upper = False
    for ch in word:
        if ch.isupper():
            if not prev_upper:
                out.append(" ")
            prev_upper = True
        else:
            prev_upper = False
        out.append(ch)
    out.append(" <ehash> ")
    return "".join(out)


_EMOJI_RANGES = (
    (0x1F600, 0x1F64F),  # Emoticons
    (0x1F900, 0x1F9FF),  # Supplemental Symbols and Pictograms
    (0x2600, 0x26FF),    # Miscellaneous Symbols
    (0x2700, 0x27BF),    # Dingbats
    (0x1F300, 0x1F5FF),  # Misc Symbols And Pictographs
    (0x1F1E6, 0x1F1FF),  # Flags
)


def _is_emoji(cp: int) -> bool:
    for lo, hi in _EMOJI_RANGES:
        if lo <= cp <= hi:
            return True
    return False


def clean_and_separate_emoji(source: str) -> str:
    """Isolate emoji with surrounding spaces; drop Fitzpatrick skin-tone
    modifiers (U+1F3FB..U+1F3FF) and ZWJ (TextProcessor.java:95-127)."""
    buf: list[str] = []
    prev_emoji = False
    for ch in source:
        cp = ord(ch)
        if 0x1F3FB <= cp <= 0x1F3FF or cp == 0x200D:
            continue
        if _is_emoji(cp):
            if not prev_emoji:
                buf.append(" ")
            prev_emoji = True
        else:
            prev_emoji = False
        if prev_emoji:
            buf.append(" ")
        buf.append(ch)
    return "".join(buf)


def splice_spans(
    text: str, spans: Iterable[tuple[int, int, str]]
) -> str:
    """Replace codepoint-index spans ``(start, end, replacement)`` in
    ``text`` (TextProcessor.java:56-74 splice semantics: the replacement
    is emitted at the span's LAST position; overlapping spans consume by
    start order)."""
    ordered = sorted(spans, key=lambda r: r[0])
    out: list[str] = []
    nxt = 0  # index into ordered
    for i, ch in enumerate(text):
        if nxt >= len(ordered) or i < ordered[nxt][0]:
            out.append(ch)
            continue
        if i < ordered[nxt][1] - 1:
            continue
        out.append(ordered[nxt][2])
        nxt += 1
    return "".join(out)


def normalize_microtext(
    text: str,
    spans: Sequence[tuple[int, int, str]] = (),
    no_case: bool = False,
) -> str:
    """Full microtext normalization (TextProcessor.java:30-93):
    span splice -> emoji pass -> ``^RT `` strip -> residual URLs to
    `` <url> `` -> whitespace collapse -> optional lowercase -> NUL strip.
    """
    s = splice_spans(text, spans) if spans else text
    s = clean_and_separate_emoji(s)
    if s.startswith("RT "):
        s = s[3:]
    s = _URL_RE.sub(" <url> ", s)
    s = _WS_RUN.sub(" ", s)
    if no_case:
        s = s.lower()
    return prepare_string(s.strip())


# --- HTML -> text extraction (the graft invariant) ------------------------

# Spec (ours; fixtures generate the inverse — see fixtures.py):
#  1. html decodes as UTF-8; otherwise the row is dropped (silent-skip path,
#     Deserializer.java:28-32 analogue).
#  2. The document body is the FIRST <article ...>...</article> element; a
#     page without one is dropped (broken-markup path).
#  3. <script>/<style> subtrees inside the article are removed.
#  4. Block-level tags (p, h1-h6, li, ul, ol, div, br, tr, blockquote,
#     article) are line boundaries; all other tags are stripped inline.
#  5. HTML entities are decoded after tag stripping.
#  6. Per line: NUL strip + whitespace collapse + trim; empty lines dropped;
#     lines joined with "\n".

_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article>", re.S | re.I)
_ARTICLE_OPEN_CI = re.compile(r"<article\b", re.I)
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.S | re.I)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|h[1-6]|li|ul|ol|div|br|tr|blockquote|article)\b[^>]*/?>",
    re.I,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
# whole-body line normalization (C-level passes replacing the per-line
# Python loop; equivalence is pinned by goldens + the fuzz test):
#   1. non-newline whitespace runs -> single space
#   2. any ws run containing a newline -> one "\n" (trims line edges and
#      drops empty lines in the same pass)
_NON_NL_WS = re.compile(r"[^\S\n]+")
_NL_RUN = re.compile(r" ?\n[\n ]*")


def _find_article(html: str) -> str | None:
    """Body of the first ``<article ...>...</article>``. Fast path:
    plain ``str.find`` when the tags appear in canonical lowercase
    (~5x cheaper than the lazy-dotall regex scan); any miss falls back
    to the case-insensitive regex so semantics are unchanged. The fast
    path is only taken when the lowercase hit is also the FIRST article
    tag of any case — an uppercase ``<ARTICLE>`` before a lowercase
    ``<article>`` must win, as the regex semantics dictate (verified by
    a bounded case-insensitive scan of the prefix only)."""
    i = html.find("<article")
    if i >= 0:
        first_ci = _ARTICLE_OPEN_CI.search(html, 0, i + 9)
        if first_ci is not None and first_ci.start() >= i:
            gt = html.find(">", i + 8)
            # reject a lookalike tag such as <articlex ...>
            nxt = html[i + 8 : i + 9]
            if gt >= 0 and (nxt == ">" or nxt.isspace()):
                end = html.find("</article>", gt + 1)
                if end >= 0:
                    return html[gt + 1 : end]
    m = _ARTICLE_RE.search(html)
    return m.group(1) if m is not None else None


def extract_html_text(html: bytes | str) -> str | None:
    """HTML -> text kernel; returns None for undecodable / article-less
    pages (those rows are silently dropped with a counter, mirroring the
    reference's Deserializer drop path)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        try:
            html = bytes(html).decode("utf-8")
        except UnicodeDecodeError:
            return None
    body = _find_article(html)
    if body is None:
        return None
    body = _SCRIPT_RE.sub("", body)
    body = _BLOCK_TAG_RE.sub("\n", body)
    body = _ANY_TAG_RE.sub("", body)
    if "&" in body:  # html.unescape scans the whole body otherwise
        body = _htmllib.unescape(body)
    body = prepare_string(body)
    body = _NON_NL_WS.sub(" ", body)
    body = _NL_RUN.sub("\n", body)
    return body.strip("\n ")


# --- structured span extraction from page HTML ----------------------------

# Fixture pages mark entity mentions and account references:
#   <b class="mention" data-surface="...">Surface Form</b>
#   <a class="account" data-uid="123">Display Name</a>
# (analogue of tweet `entities.user_mentions` with `indices`,
# IndexExtractor BuildUserIndex.java:221-298).

_MENTION_RE = re.compile(
    r'<b class="mention"[^>]*>(.*?)</b>', re.S
)
_ACCOUNT_RE = re.compile(
    r'<a class="account" data-uid="(\d+)"[^>]*>(.*?)</a>', re.S
)


def extract_account_refs(html: str) -> list[tuple[str, int]]:
    """All account references in a page: ``(normalized_name, uid)``."""
    return [
        (normalize_fullname(_htmllib.unescape(name)), int(uid))
        for uid, name in _ACCOUNT_RE.findall(html)
    ]


def extract_mention_surfaces(html: str) -> list[str]:
    """All marked entity-mention surface forms (normalized)."""
    return [
        normalize_fullname(_htmllib.unescape(s))
        for s in _MENTION_RE.findall(html)
    ]

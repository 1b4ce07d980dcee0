"""Golden tests for the normalization kernels (the byte-identity
invariants; SURVEY.md §5 item 1)."""

from sociallink_ray.functions import textnorm as tn


def test_prepare_string_strips_nul():
    assert tn.prepare_string("a\x00b\x00") == "ab"


def test_collapse_ws():
    assert tn.collapse_ws("  a\t\nb   c ") == "a b c"


def test_normalize_fullname():
    assert tn.normalize_fullname(" John\x00  SMITH\t") == "john smith"


def test_break_camel_goldens():
    # breakHashtag semantics (TextProcessor.java:129-147): space before
    # every uppercase-run start; guards around the token.
    assert tn.break_camel("FooBar") == " <shash>  Foo Bar <ehash> "
    assert tn.break_camel("foobar") == " <shash> foobar <ehash> "
    assert tn.break_camel("FOOBar") == " <shash>  FOOBar <ehash> "
    assert tn.break_camel("aFooBAR") == " <shash> a Foo BAR <ehash> "


def test_emoji_separation_and_modifiers():
    # U+1F600 = emoticon; U+1F3FB = Fitzpatrick modifier (dropped);
    # U+200D = ZWJ (dropped)
    # Reference behavior (TextProcessor.java:95-127): TWO spaces open an
    # emoji run (one on run entry + one per emoji codepoint), none close
    # it — the later \s+ collapse normalizes; goldens match the Java.
    s = "hi\U0001F600\U0001F3FBthere"
    assert tn.clean_and_separate_emoji(s) == "hi  \U0001F600there"
    assert tn.clean_and_separate_emoji("a‍b") == "ab"
    assert tn.clean_and_separate_emoji("\U0001F600\U0001F601x") == \
        "  \U0001F600 \U0001F601x"
    # after full normalization the doubles collapse
    assert tn.normalize_microtext("hi\U0001F600\U0001F3FBthere") == \
        "hi \U0001F600there"


def test_splice_spans():
    # replacement emitted at the last codepoint of the span
    assert tn.splice_spans("hello world", [(0, 5, "HI")]) == "HI world"
    assert tn.splice_spans("a #Tag b", [(2, 6, "<T>")]) == "a <T> b"


def test_normalize_microtext():
    out = tn.normalize_microtext("RT some  text https://t.co/xyz end")
    assert out == "some text <url> end"
    out2 = tn.normalize_microtext("Hello @User", [(6, 11, "Real Name")])
    assert out2 == "Hello Real Name"
    assert tn.normalize_microtext("ABC", no_case=True) == "abc"


GOLDEN_HTML = (
    "<html><head><title>T</title></head><body><nav>junk</nav>"
    "<article><h1>Big   Title</h1>"
    "<p>First &amp; second <b class=\"mention\" data-surface=\"x\">Ada "
    "Lovelace</b> line.</p>"
    "<script>var x = '<p>no</p>';</script>"
    "<p>Next <a class=\"account\" data-uid=\"42\">Grace Hopper</a>!</p>"
    "</article><footer>f</footer></body></html>"
)


def test_extract_html_text_golden():
    assert tn.extract_html_text(GOLDEN_HTML) == (
        "Big Title\nFirst & second Ada Lovelace line.\nNext Grace Hopper!"
    )
    # bytes in, same out (the per-url byte-identity contract)
    assert tn.extract_html_text(GOLDEN_HTML.encode()) == \
        tn.extract_html_text(GOLDEN_HTML)


def test_extract_html_text_drop_paths():
    assert tn.extract_html_text(b"\xff\xfe broken") is None
    assert tn.extract_html_text("<html><body>no article</body></html>") is None


def test_extract_refs():
    assert tn.extract_account_refs(GOLDEN_HTML) == [("grace hopper", 42)]
    assert tn.extract_mention_surfaces(GOLDEN_HTML) == ["ada lovelace"]

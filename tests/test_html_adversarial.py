"""Adversarial HTML extraction: the exact output of extract_text is
pinned for malformed nesting, unclosed tags, script/style payloads,
CDATA, comments (incl. EOF-truncated), entities, and attribute traps —
plus a corpus-level hash so any drift in ANY case fails loudly. The
byte-identity contract (BASELINE.json input_hint: text column ==
extract_text(html) per url) only holds if the extractor is stable on
hostile real-world markup, not just the synthetic template
(reference cleaner semantics: examples/libriheavy/scripts/clean.py:8-19)."""

import hashlib

from text_search_spark.textnorm import extract_text

# (name, html, expected extract_text output)
CASES = [
    ("malformed_nesting",
     "<p><b><i>bold italic</b> still italic</i> plain</p>",
     "bold italic still italic plain"),
    ("unclosed_paragraphs",
     "<body><p>one<p>two<p>three</body>",
     "one two three"),
    ("script_with_markup_payload",
     '<div><script>if (a<b) { document.write("<p>hidden</p>"); }'
     "</script>visible</div>",
     "visible"),
    ("style_payload",
     '<style>p > a { color: red; } .x:before { content: "<fake>"; }'
     "</style>shown",
     "shown"),
    # HTML5 script data runs to EOF when unterminated — the tail is
    # swallowed, never leaked as text
    ("unclosed_script_swallows_rest",
     "<p>before</p><script>var x = 1; rest",
     "before"),
    ("nested_script_tags",
     "<script><script>inner</script>after</script>tail",
     "after tail"),
    ("mixed_case_skip_tag",
     "<SCRIPT>alert(1)</SCRIPT><P>Text</P>",
     "Text"),
    # &nbsp; decodes to U+00A0, which Python's str.split() treats as
    # whitespace -> collapsed like any space
    ("entities",
     "<p>&amp; &lt;tag&gt; &#65;&#x42; caf&eacute; &nbsp;end</p>",
     "& <tag> AB café end"),
    # &#9; (tab) is whitespace-collapsed; &#0; is an HTML5
    # invalid-character reference -> U+FFFD (kept: it is not a control
    # char after decoding)
    ("numeric_entity_control",
     "<p>a&#9;b&#0;c</p>",
     "a b�c"),
    ("cdata_section",
     "<p>x<![CDATA[ raw <tag> & stuff ]]>y</p>",
     "x y"),
    ("comment_hidden",
     "<p>a<!-- hidden <b>bold</b> -->b</p>",
     "a b"),
    # truncated page: unterminated comment runs to EOF, content ignored
    ("unterminated_comment",
     "<p>seen</p><!-- lost forever",
     "seen"),
    ("gt_inside_attribute",
     '<a title="a>b">link</a> tail',
     "link tail"),
    ("lt_in_text",
     "<p>5 < 6 and 7 > 2</p>",
     "5 < 6 and 7 > 2"),
    ("template_skipped",
     "<template><li>never</li></template><span>yes</span>",
     "yes"),
    ("deeply_broken",
     "</div></p><td>orphan<table><x-foo bar>custom</x-foo>",
     "orphan custom"),
    ("whitespace_shapes",
     "<p>  a\n\n  b\t\tc\r\nd  </p>",
     "a b c d"),
    ("unicode_text",
     "<p>héllo wörld — 中文 ¡hola!</p>",
     "héllo wörld — 中文 ¡hola!"),
    ("bare_ampersand",
     "<p>AT&T and R&D</p>",
     "AT&T and R&D"),
    ("doctype_and_pi",
     '<!DOCTYPE html><?xml version="1.0"?><p>doc</p>',
     "doc"),
    ("bytes_input_with_bad_utf8",
     b"<p>ok \xff broken</p>",
     "ok � broken"),
    ("control_chars_in_text",
     "<p>a\x01b\x7fc d\x0be</p>",
     "abc de"),  # C0 controls (incl \x0b) and DEL removed
    # '<!--' in a non-markup context must NOT trigger EOF-comment
    # handling (the parser consumed it; nothing is buffered) — a
    # string-level heuristic would leak a spurious '-->' here
    ("comment_opener_in_script_string",
     '<p>hi</p><script>var s = "<!--";</script>bye',
     "hi bye"),
    ("comment_opener_in_attribute",
     '<div title="<!--">x</div>',
     "x"),
    # HTML5 eof-in-* rules: constructs truncated at EOF are discarded
    ("truncated_comment_token",
     "<p>a</p><!-",
     "a"),
    ("truncated_open_tag",
     '<p>a</p><div class="trunca',
     "a"),
    ("truncated_close_tag",
     "<p>a</p></p",
     "a"),
    ("truncated_processing_instruction",
     "<p>a</p><?php trunc",
     "a"),
    # a bare trailing '<' is TEXT per HTML5, not a truncated construct
    ("bare_trailing_lt",
     "<p>a</p><",
     "a <"),
]


def test_adversarial_cases_pinned():
    for name, html, want in CASES:
        got = extract_text(html)
        assert got == want, (name, got, want)


def test_corpus_hash_pinned():
    """One hash over every case output — catches silent drift even if an
    expected value above is edited carelessly."""
    h = hashlib.md5()
    for name, html, _ in CASES:
        h.update(name.encode())
        h.update(b"\x00")
        h.update(extract_text(html).encode())
        h.update(b"\x01")
    assert h.hexdigest() == "17767c8b0bf86c8e64a3bdff4254be3a"


def test_unterminated_comment_does_not_eat_earlier_comments():
    """The EOF-comment fix only closes a genuinely unterminated trailing
    comment — documents whose last comment IS terminated are untouched."""
    assert extract_text("<p>a<!-- x -->b</p>") == "a b"
    assert extract_text("<!-- a --><p>mid</p><!-- trailing") == "mid"

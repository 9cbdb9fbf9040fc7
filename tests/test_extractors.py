"""Golden-output tests for the pure-Python extraction core.

Mirrors the reference's test strategy: exact/contains assertions over a
small committed corpus (/root/reference/tika/src/test/.../TikaDocParserTest.java),
plus the universal span invariant:
    "\n".join(text[s:e] for (s,e) in spans) == extracted
"""

from fscrawler_spark.functions.extractors import (
    MIME_BINARY,
    MIME_HTML,
    MIME_JSON,
    MIME_PDF,
    MIME_PLAIN,
    MIME_XML,
    extract,
    sniff_mime,
)


def check_invariant(src, res):
    if res.extracted is None:
        assert res.spans == []
    else:
        assert "\n".join(src[s:e] for s, e in res.spans) == res.extracted


# --- sniff -------------------------------------------------------------------

def test_sniff():
    assert sniff_mime(None) == MIME_PLAIN
    assert sniff_mime("") == MIME_PLAIN
    assert sniff_mime("hello world") == MIME_PLAIN
    assert sniff_mime("<!DOCTYPE html><html>") == MIME_HTML
    assert sniff_mime("  \n<html lang='en'>") == MIME_HTML
    assert sniff_mime("<?xml version='1.0'?><a/>") == MIME_XML
    assert sniff_mime("%PDF-SYNTH 1.0\nx") == MIME_PDF
    assert sniff_mime('{"a": 1}') == MIME_JSON
    assert sniff_mime("[1, 2]") == MIME_JSON
    assert sniff_mime("ENC:secret") == MIME_BINARY
    assert sniff_mime("abc\x00def") == MIME_BINARY


# --- plain -------------------------------------------------------------------

def test_plain_passthrough():
    r = extract("just some plain text")
    assert r.mime == MIME_PLAIN
    assert r.extracted == "just some plain text"
    assert r.spans == [(0, 20)]
    check_invariant("just some plain text", r)


def test_plain_truncation():
    # WriteLimitReached: keep truncated prefix (TikaInstance.java:249-258)
    r = extract("abcdefghij", limit=4)
    assert r.extracted == "abcd"
    assert r.spans == [(0, 4)]


def test_empty_and_null():
    r = extract("")
    assert r.extracted == "" and r.error is None and r.spans == []
    r = extract(None)
    assert r.extracted is None and r.error is None


# --- html --------------------------------------------------------------------

HTML_DOC = (
    "<!DOCTYPE html><html><head><title>Title</title>"
    "<style>body{color:red}</style><script>var x=1;</script></head>"
    "<body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
    "<header>Site header junk</header>"
    "<article><p>This is a sample text available in page one.</p>"
    "<p>Second paragraph with more substance here.</p></article>"
    "<aside>ad ad ad</aside>"
    "<div><a href='/x'>link1</a> <a href='/y'>link2</a></div>"
    "<footer>Copyright footer</footer></body></html>"
)


def test_html_boilerplate_strip():
    r = extract(HTML_DOC)
    assert r.mime == MIME_HTML
    assert r.extracted == (
        "This is a sample text available in page one.\n"
        "Second paragraph with more substance here."
    )
    check_invariant(HTML_DOC, r)
    # spans point at the real source offsets
    s, e = r.spans[0]
    assert HTML_DOC[s:e] == "This is a sample text available in page one."


def test_html_title_captured():
    r = extract(HTML_DOC)
    assert r.title == "Title"
    # title text is metadata, not content
    assert "Title" not in r.extracted
    r2 = extract("<html><body><p>no head here at all okay</p></body></html>")
    assert r2.title is None


def test_html_link_density_drops_nav_div():
    # a div of pure links (not inside <nav>) must be dropped by density
    doc = "<html><body><div><a href='/1'>one</a> <a href='/2'>two</a></div><p>Real content sentence with enough words.</p></body></html>"
    r = extract(doc)
    assert r.extracted == "Real content sentence with enough words."


def test_html_keeps_long_linky_block():
    # long block with some links but low density is kept
    doc = (
        "<html><body><p>Read the <a href='/d'>documentation</a> to learn how the "
        "extraction pipeline handles mixed inline anchors in long paragraphs.</p></body></html>"
    )
    r = extract(doc)
    assert "Read the" in r.extracted
    assert "documentation" in r.extracted
    check_invariant(doc, r)


def test_html_inline_tags_split_runs():
    doc = "<html><body><p>Hello <b>bold</b> world</p></body></html>"
    r = extract(doc)
    assert r.extracted == "Hello\nbold\nworld"
    check_invariant(doc, r)


def test_html_truncation_mid_block():
    doc = "<html><body><p>aaaa</p><p>bbbb</p></body></html>"
    r = extract(doc, limit=7)
    assert r.extracted == "aaaa\nbb"
    check_invariant(doc, r)


def test_html_comment_and_cdata_ignored():
    doc = "<html><body><!-- hidden comment --><p>visible text here okay</p></body></html>"
    r = extract(doc)
    assert r.extracted == "visible text here okay"


def test_html_malformed_never_raises():
    docs = [
        "<html><body><p>unclosed",
        "<html><div><<<>>><p>weird</p>",
        "<html><body></p></p></div><p>stray closes still fine</p>",
        "<html><!-- unterminated comment <p>gone</p>",
    ]
    for d in docs:
        r = extract(d)
        assert r.error is None
        check_invariant(d, r)


# --- xml ---------------------------------------------------------------------

def test_xml_text_nodes():
    doc = "<?xml version='1.0'?><doc><title>Hello</title><body>World text</body></doc>"
    r = extract(doc)
    assert r.mime == MIME_XML
    assert r.extracted == "Hello\nWorld text"
    check_invariant(doc, r)


def test_xml_whitespace_only_strict_equality():
    # mirrors TikaDocParserTest.java:186 isEqualTo("   \n")
    doc = "<?xml version='1.0'?><doc>   \n</doc>"
    r = extract(doc)
    assert r.extracted == "   \n"
    check_invariant(doc, r)


# --- pdfish ------------------------------------------------------------------

def test_pdfish_layout():
    doc = "%PDF-SYNTH 1.0\n%%Page: 1\nline one\nline two\n%%Page: 2\nline three\n"
    r = extract(doc)
    assert r.mime == MIME_PDF
    assert r.extracted == "line one\nline two\nline three"
    check_invariant(doc, r)


def test_pdfish_blank_lines_skipped():
    doc = "%PDF-SYNTH 1.0\n%%Page: 1\n\n  \nreal line\n"
    r = extract(doc)
    assert r.extracted == "real line"


# --- json --------------------------------------------------------------------

def test_json_string_values():
    doc = '{"title": "Hello", "n": 3, "tags": ["x", "y"], "nested": {"k": "deep value"}}'
    r = extract(doc)
    assert r.mime == MIME_JSON
    assert r.extracted == "Hello\nx\ny\ndeep value"
    check_invariant(doc, r)


def test_json_broken_degrades_to_plain_text():
    """A failed JSON detection must not destroy content: first-char
    sniff is not proof ('[INFO] log line', prose with braces). Mirror
    Tika — degrade to plain text, mime included."""
    r = extract('{"a": unterminated')
    assert r.error is None and r.extracted == '{"a": unterminated'
    assert r.mime == "text/plain"
    r2 = extract("[INFO] server started on port 8080")
    assert r2.extracted == "[INFO] server started on port 8080"


def test_json_escapes_verbatim():
    doc = '{"a": "line\\nbreak"}'
    r = extract(doc)
    # span slices raw source -> escape sequence stays verbatim
    assert r.extracted == "line\\nbreak"
    check_invariant(doc, r)


# --- encrypted / broken ------------------------------------------------------

def test_encrypted_yields_null_content():
    r = extract("ENC:0a1b2c3d")
    assert r.extracted is None and r.error == "encrypted" and r.mime == MIME_BINARY


def test_binary_garbage_yields_parse_error():
    r = extract("PK\x00\x01\x02 binary junk")
    assert r.extracted is None and r.error == "parse_error"


# --- unicode -----------------------------------------------------------------

def test_unicode_cjk_html():
    doc = "<html><body><p>中文名称测试 — 日本語のテキスト</p></body></html>"
    r = extract(doc)
    assert r.extracted == "中文名称测试 — 日本語のテキスト"
    check_invariant(doc, r)


def test_truncation_counts_joiners():
    doc = "<html><body><p>abc</p><p>def</p></body></html>"
    r = extract(doc, limit=5)
    # 'abc' + '\n' + 'd' = 5 chars
    assert r.extracted == "abc\nd"
    assert len(r.extracted) == 5

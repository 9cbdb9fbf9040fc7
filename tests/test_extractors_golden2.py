"""Round-2 golden extraction edge cases, mirroring the reference's
TikaDocParserTest corpus-regression style (exact-equality assertions on
crafted payloads — reference:
tika/src/test/.../TikaDocParserTest.java:186,254-257,1408-1416 and the
issue-400/issue-418 encoding fixtures)."""

from fscrawler_spark.functions.extractors import extract, extract_html, extract_raw_meta


def _spans_text(src, r):
    return "\n".join(src[s:e] for s, e in r.spans)


# --- HTML tokenizer edge cases ------------------------------------------------


def test_html_bare_lt_is_text():
    """HTML5: '<' not followed by a letter is TEXT ('a < b', 'x <3 y')."""
    src = "<html><body><p>a < b and x <3 y</p></body></html>"
    r = extract(src)
    assert r.extracted == "a < b and x <3 y"
    assert _spans_text(src, r) == r.extracted


def test_html_bogus_close_tag_consumed():
    """'</' + non-letter opens a bogus comment consumed to '>' (HTML5)."""
    src = "<html><body><p>keep</ 1>also kept</p></body></html>"
    r = extract(src)
    assert r.extracted == "keep\nalso kept"


def test_html_unclosed_tag_at_eof():
    src = "<html><body><p>content here<a href='x"
    r = extract(src)
    assert r.extracted == "content here"


def test_html_nested_drop_subtrees():
    """nav inside aside inside body: the whole nest is boilerplate;
    content before/after survives."""
    src = (
        "<html><body><p>first</p>"
        "<aside>junk <nav><a href='/'>x</a></nav> more junk</aside>"
        "<p>second</p></body></html>"
    )
    r = extract(src)
    assert r.extracted == "first\nsecond"


def test_html_self_closing_drop_tag_does_not_sink_rest():
    """<iframe/> self-closes: the document after it is NOT swallowed."""
    src = "<html><body><iframe/><p>visible</p></body></html>"
    r = extract(src)
    assert r.extracted == "visible"


def test_html_title_outside_head():
    """<title> anywhere is metadata, never content (reference captures
    the first title; svg-embedded titles are not document titles)."""
    src = "<html><body><title>My Title</title><p>body text</p></body></html>"
    r = extract(src)
    assert r.title == "My Title"
    assert r.extracted == "body text"
    src2 = "<html><body><svg><title>axis label</title></svg><p>t</p></body></html>"
    r2 = extract(src2)
    assert r2.title is None  # svg subtree: not the document title
    assert r2.extracted == "t"


def test_html_table_cells_become_blocks():
    src = "<html><body><table><tr><td>a1</td><td>b1</td></tr></table></body></html>"
    r = extract(src)
    assert r.extracted == "a1\nb1"


def test_html_entities_kept_verbatim():
    """No entity decoding: spans are verbatim source slices (the
    span-concatenation invariant forbids rewriting &amp; -> &)."""
    src = "<html><body><p>fish &amp; chips</p></body></html>"
    r = extract(src)
    assert r.extracted == "fish &amp; chips"
    assert _spans_text(src, r) == r.extracted


def test_html_doctype_case_insensitive_sniff():
    r = extract("<!DOCTYPE HTML><html><body><p>x</p></body></html>")
    assert r.mime == "text/html" and r.extracted == "x"
    r2 = extract("<HTML><body><p>y</p></body></HTML>")
    assert r2.mime == "text/html" and r2.extracted == "y"


def test_html_attribute_with_gt_in_quotes():
    """Meta extraction must not split a tag on '>' inside a quoted
    attribute (raw-metadata regex edge)."""
    meta = extract_raw_meta(
        '<html><head><meta name="desc" content="a > b"></head><body></body></html>',
        "text/html",
    )
    assert meta == {"desc": "a > b"}


# --- encoding regressions (issue-400 / issue-418 analogs) ---------------------


def test_cjk_filename_class_content():
    """issue-418 analog: CJK text round-trips exactly through every
    format branch."""
    body = "中文名称 テキスト解析 내용"
    for src, want in [
        (body, body),
        (f"<html><body><p>{body}</p></body></html>", body),
        (f"<?xml version='1.0'?><d><b>{body}</b></d>", body),
        ('{"k": "' + body + '"}', body),
    ]:
        r = extract(src)
        assert r.extracted == want
        assert _spans_text(src, r) == want


def test_mixed_width_whitespace_trim():
    """Unicode spaces (ideographic space U+3000) are whitespace to
    str.isspace(): trimmed at run edges like the reference's trim."""
    src = "<html><body><p>　padded　</p></body></html>"
    r = extract(src)
    assert r.extracted == "padded"


# --- XML / JSON / PDF edges ---------------------------------------------------


def test_xml_cdata_not_extracted_as_text():
    """CDATA sections are markup tokens in the lightweight tokenizer —
    consistent with spans always being non-markup source runs."""
    src = "<?xml version='1.0'?><d><![CDATA[raw]]><k>kept</k></d>"
    r = extract(src)
    assert r.extracted == "kept"


def test_xml_processing_instruction_skipped():
    src = "<?xml version='1.0'?><?php echo 1 ?><d><k>v</k></d>"
    r = extract(src)
    assert r.extracted == "v"


def test_json_unicode_escapes_stay_raw():
    """Spans slice the raw source, so \\u escapes are NOT decoded."""
    src = '{"k": "caf\\u00e9"}'
    r = extract(src)
    assert r.extracted == "caf\\u00e9"
    assert _spans_text(src, r) == r.extracted


def test_json_empty_string_values_skipped():
    # a zero-length value contributes no span (e - 1 > s + 1 guard)
    r = extract('{"a": "", "b": "x"}')
    assert r.extracted == "x"


def test_json_array_root():
    r = extract('["one", "two", 3]')
    assert r.mime == "application/json"
    assert r.extracted == "one\ntwo"


def test_pdf_directive_only_doc():
    r = extract("%PDF-SYNTH 1.0\n%%Page: 1\n%%Page: 2\n")
    assert r.mime == "application/pdf"
    assert r.extracted == "" and r.spans == []


def test_pdf_crlf_lines():
    src = "%PDF-SYNTH 1.0\r\nline one\r\nline two\r\n"
    r = extract(src)
    # \r is whitespace: trimmed from run edges, lines preserved
    assert r.extracted == "line one\nline two"


# --- failure tolerance (TikaDocParserTest.java:1408-1416 analog) --------------


def test_pathological_inputs_never_raise():
    cases = [
        "<" * 10_000,
        "{" * 10_000,
        "<?xml " + "<a" * 5_000,
        "%PDF-" + "\n" * 10_000,
        "\x00" * 100,
        "ENC:",
        "ENC:::::",
        "<!DOCTYPE html>" + "<div>" * 5_000 + "x",
        '{"a": ' * 2_000,
    ]
    for src in cases:
        r = extract(src)  # must not raise
        if r.extracted is not None:
            assert _spans_text(src, r) == r.extracted


def test_extract_html_limit_zero():
    r = extract_html("<html><body><p>abc</p></body></html>", 0)
    assert r.extracted == "" and r.spans == []

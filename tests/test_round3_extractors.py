"""Round-3 review fixes on the extraction heart + checkpoint durability.

Reference parity: HTML5 tokenizer unquoted-attribute '/' semantics,
Tika-style degrade-to-plain on failed JSON detection, XmlDocParser
text-node capture incl. tails, FsCrawlerCheckpointFileHandler
crash-safety.
"""

import json
import os
import time

from fscrawler_spark.functions.extractors import (
    extract,
    extract_object,
    extract_raw_meta,
)


def test_meta_tag_regex_no_redos():
    """Truncated '<meta \"a\" \"a\" ...' with no '>' used to backtrack
    exponentially (>10s at 24 quote pairs)."""
    evil = "<meta " + '"a" ' * 200  # no closing '>'
    t0 = time.perf_counter()
    extract_raw_meta(evil, "text/html")
    assert time.perf_counter() - t0 < 1.0


def test_unquoted_attr_slash_is_not_self_closing():
    """HTML5: '/' after an unquoted attribute value is part of the value
    — '<script src=https://x/>' does NOT self-close (browsers treat the
    body as script data until </script>)."""
    r = extract("<html><body><script src=https://cdn.x.com/>alert(1)</script><p>real text</p></body></html>")
    assert r.extracted == "real text"
    # anchors likewise: the nav text counts as anchor text (droppable)
    r2 = extract(
        "<html><body><div><a href=https://x.com/>nav nav nav nav</a></div>"
        "<p>content sentence with enough words to stay a content block here</p></body></html>"
    )
    assert "nav nav" not in (r2.extracted or "")
    # ...while a CLEAN self-close still self-closes (golden behavior)
    r3 = extract("<html><body><iframe/><p>visible</p></body></html>")
    assert r3.extracted == "visible"


def test_meta_data_name_not_mistaken_for_name():
    got = extract_raw_meta('<html><head><meta data-name="x" content="y"></head></html>', "text/html")
    assert got is None
    ok = extract_raw_meta('<html><head><meta name="author" content="me"></head></html>', "text/html")
    assert ok == {"author": "me"}


def test_xml_object_captures_tail_text():
    got = extract_object("<doc>a<b>x</b>tail-text</doc>", "application/xml")
    assert got["doc.$"] == "a tail-text"
    assert got["doc.b.$"] == "x"


def test_extract_object_shares_parse(monkeypatch):
    """raw+object extraction accept a pre-parsed JSON value (one parse
    per row in the batch builder)."""
    parsed = {"k": "v", "n": 3}
    assert extract_raw_meta("ignored-text", "application/json", parsed) == {
        "k": "v", "n": "3",
    }
    assert extract_object("ignored-text", "application/json", parsed) == {
        "k": "v", "n": "3",
    }


def test_checkpoint_recovers_from_corrupt_manifest(tmp_path):
    from fscrawler_spark.plans.checkpoint import CheckpointManifest

    p = tmp_path / "_checkpoint.json"
    p.write_text("")  # zero-length (torn write)
    m = CheckpointManifest.load_or_create(str(p), num_buckets=4)
    assert m.completed == set()  # fresh manifest, no exception
    m.mark_completed([1])
    assert json.loads(p.read_text())["completed"] == [1]


def test_save_preserves_earlier_on_disk_next_check(tmp_path):
    from fscrawler_spark.plans.checkpoint import CheckpointManifest

    p = str(tmp_path / "_checkpoint.json")
    m = CheckpointManifest.load_or_create(p, num_buckets=4)
    m.set_next_check(1000.0)
    # external actor pulls the next run FORWARD while the job holds a
    # stale copy
    other = CheckpointManifest.load_or_create(p, num_buckets=4)
    other.set_next_check(500.0)
    m.mark_completed([0])  # stale in-memory next_check=1000 saves...
    assert json.loads(open(p).read())["next_check"] == 500.0  # ...but 500 survives
    # the explicit overwrite path still replaces it
    m.set_next_check(2000.0)
    assert json.loads(open(p).read())["next_check"] == 2000.0


def test_save_cleans_temp_on_failure(tmp_path, monkeypatch):
    from fscrawler_spark.plans import checkpoint as cp

    m = cp.CheckpointManifest.load_or_create(str(tmp_path / "_c.json"), num_buckets=2)

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(cp.json, "dump", boom)
    try:
        m.save()
    except OSError:
        pass
    assert not [f for f in os.listdir(tmp_path) if f.startswith(".ckpt-")]

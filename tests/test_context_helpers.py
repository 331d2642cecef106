"""Driver-side context helpers: get_prefixes (T18), serialize (T19)."""

from __future__ import annotations

from jsonld_spark.core.context import Context, JsonLdOptions


def _ctx(local):
    c = Context(JsonLdOptions())
    return c.parse(local)


def test_get_prefixes_common_only():
    c = _ctx({"schema": "http://schema.org/",
              "name": "http://schema.org/name",
              "ex": "http://example.com#",
              "bad:term": "http://x/"})
    assert c.get_prefixes(True) == {"schema": "http://schema.org/",
                                    "ex": "http://example.com#"}
    all_p = c.get_prefixes(False)
    assert all_p["name"] == "http://schema.org/name"
    assert "bad:term" not in all_p  # terms containing ':' skipped


def test_serialize_roundtrip_simple_terms():
    local = {"@vocab": "http://v/", "@language": "en",
             "name": "http://schema.org/name",
             "knows": {"@id": "http://schema.org/knows", "@type": "@id"},
             "homepage": {"@reverse": "http://schema.org/member"}}
    c = _ctx(local)
    out = c.serialize()["@context"]
    assert out["@vocab"] == "http://v/"
    assert out["@language"] == "en"
    assert out["name"] == "http://schema.org/name"
    assert out["knows"] == {"@id": "http://schema.org/knows", "@type": "@id"}
    assert out["homepage"] == {"@reverse": "http://schema.org/member"}
    # reparsing the serialized form reproduces the same active context
    c2 = _ctx(out)
    assert c2.vocab == c.vocab and c2.language == c.language
    assert c2.term_definitions.keys() == c.term_definitions.keys()


def test_serialize_empty_context():
    assert _ctx({}).serialize() == {}


def test_ctx_parse_memo_returns_isolated_clones():
    """ADVICE r3: a memo hit must be a clone — a caller mutating its
    returned context may only corrupt its own document, never every
    later document sharing the memo entry. The lazily-built inverse
    stays shared (read-only once built)."""
    from jsonld_spark.core.context import Context, JsonLdOptions
    opts = JsonLdOptions()
    ctx = {"name": "http://x/name"}
    c1 = Context(opts).parse(ctx)
    c2 = Context(opts).parse(ctx)
    assert c1 is not c2
    c1.term_definitions["name"]["@id"] = "http://CORRUPT/"
    c3 = Context(opts).parse(ctx)
    assert c3.term_definitions["name"]["@id"] == "http://x/name"
    # the built inverse map is shared across clones, not rebuilt per doc
    assert c2.get_inverse() is c3.get_inverse()

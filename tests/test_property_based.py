"""Property-based tests (hypothesis) for the pure core.

The reference has no property testing (SURVEY.md §5); these harden the
serializer/parser and IRI-resolution edge cases beyond the fixture
corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonld_spark.core.nquads import (escape, parse_nquads, quad_to_nquad,
                                      unescape)
from jsonld_spark.core.rdf import Quad
from jsonld_spark.core.url import resolve_iri

text = st.text(max_size=80)
iri_chars = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           exclude_characters='<>"{}|^`\\'),
    min_size=1, max_size=40)


@given(text)
@settings(max_examples=300)
def test_escape_unescape_roundtrip(s):
    assert unescape(escape(s)) == s


@given(iri_chars, iri_chars, text,
       st.sampled_from([None, "en", "de-AT"]))
@settings(max_examples=200)
def test_literal_quad_serialize_parse_roundtrip(subj_frag, pred_frag, value,
                                                lang):
    subj = f"http://s.example/{subj_frag}"
    pred = f"http://p.example/{pred_frag}"
    dt = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString" if lang
          else "http://www.w3.org/2001/XMLSchema#string")
    q = Quad("@default", subj, pred, "literal", value, dt, lang)
    line = quad_to_nquad(q)
    back = parse_nquads(line + "\n")
    assert len(back) == 1
    b = back[0]
    assert (b.subj, b.pred, b.obj_value, b.obj_lang) == \
        (subj, pred, value, lang)


@given(iri_chars)
@settings(max_examples=200)
def test_bnode_and_iri_object_roundtrip(frag):
    for kind, obj in (("iri", f"http://o.example/{frag}"), ("bnode", "_:b0")):
        q = Quad("http://g.example/g", "_:s0", f"http://p.example/{frag}",
                 kind, obj, None, None)
        back = parse_nquads(quad_to_nquad(q) + "\n")
        assert len(back) == 1 and back[0].obj_value == obj
        assert back[0].graph == "http://g.example/g"


@given(st.sampled_from([
    # RFC 3986 §5.4 normal + abnormal examples (base as in the RFC)
    ("g", "http://a/b/c/g"), ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"), ("/g", "http://a/g"),
    ("//g", "http://g"), ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"), ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"), (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"), ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"), ("./", "http://a/b/c/"),
    ("..", "http://a/b/"), ("../", "http://a/b/"),
    ("../g", "http://a/b/g"), ("../..", "http://a/"),
    ("../../", "http://a/"), ("../../g", "http://a/g"),
    ("../../../g", "http://a/g"), ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"), ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."), (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."), ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"), ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"), ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("http://x/y", "http://x/y"),
]))
def test_rfc3986_reference_resolution(case):
    rel, expect = case
    assert resolve_iri("http://a/b/c/d;p?q", rel) == expect

"""Driver-side document-loader edge semantics (reference
DocumentLoader.java:56-77, JsonUtils.java:340-413; JSON-LD-API
LoadDocumentCallback). All HTTP is faked — the policy itself is under
test, and executors never fetch at all."""

from __future__ import annotations

import json

import pytest

from jsonld_spark.core.errors import JsonLdError
from jsonld_spark.sources.loader import (DriverDocumentLoader,
                                         JSONLD_CONTEXT_REL)

CTX = {"@context": {"name": "http://schema.org/name"}}


def fake_http(responses):
    """responses: url -> (status, headers, body)"""
    def get(url):
        if url not in responses:
            raise IOError(f"unexpected fetch: {url}")
        return responses[url]
    return get


def test_injected_docs_never_fetch():
    ldr = DriverDocumentLoader(injected={"http://x/ctx": CTX},
                               http_get=fake_http({}))
    assert ldr.load_document("http://x/ctx").document == CTX


def test_disallow_remote_raises_typed_error():
    ldr = DriverDocumentLoader(http_get=fake_http({}), allow_remote=False)
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/ctx")
    assert e.value.code == JsonLdError.LOADING_REMOTE_CONTEXT_FAILED


def test_plain_fetch_and_status_check():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/ok": (200, [("Content-Type", "application/ld+json")],
                        json.dumps(CTX)),
        "http://x/teapot": (418, [], ""),
    }))
    assert ldr.load_document("http://x/ok").document == CTX
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/teapot")
    assert "status code: 418" in e.value.detail


def test_redirects_followed_and_bounded():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/a": (301, [("Location", "/b")], ""),
        "http://x/b": (302, [("Location", "http://x/c")], ""),
        "http://x/c": (200, [("Content-Type", "application/ld+json")],
                       json.dumps(CTX)),
        "http://x/loop": (301, [("Location", "/loop")], ""),
    }))
    doc = ldr.load_document("http://x/a")
    assert doc.document == CTX and doc.document_url == "http://x/c"
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/loop")
    assert "too many redirects" in e.value.detail


def test_alternate_link_followed_for_non_ldjson():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/page": (200, [
            ("Content-Type", "text/html"),
            ("Link", '</data.jsonld>; rel="alternate"; '
                     'type="application/ld+json"')], "<html>"),
        "http://x/data.jsonld": (200,
                                 [("Content-Type", "application/ld+json")],
                                 json.dumps(CTX)),
    }))
    assert ldr.load_document("http://x/page").document == CTX


def test_alternate_link_cycle_aborts():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/p": (200, [
            ("Content-Type", "text/html"),
            ("Link", '</p>; rel="alternate"; type="application/ld+json"')],
            "<html>"),
    }))
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/p")
    assert "Too many alternate links" in e.value.detail


def test_single_context_link_header_attached():
    body = json.dumps({"name": "x"})
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/doc": (200, [
            ("Content-Type", "application/json"),
            ("Link", f'</ctx.jsonld>; rel="{JSONLD_CONTEXT_REL}"')], body),
        "http://x/ctx.jsonld": (200,
                                [("Content-Type", "application/ld+json")],
                                json.dumps(CTX)),
    }))
    doc = ldr.load_document("http://x/doc")
    assert doc.context_url == "http://x/ctx.jsonld"
    cache = ldr.resolve_all(["http://x/doc"])
    assert cache["http://x/ctx.jsonld"] == CTX


def test_multiple_context_link_headers_is_typed_error():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/doc": (200, [
            ("Content-Type", "application/json"),
            ("Link", f'</c1>; rel="{JSONLD_CONTEXT_REL}"'),
            ("Link", f'</c2>; rel="{JSONLD_CONTEXT_REL}"')], "{}"),
    }))
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/doc")
    assert e.value.code == JsonLdError.MULTIPLE_CONTEXT_LINK_HEADERS
    assert e.value.code == "multiple context link headers"


def test_ldjson_content_type_ignores_link_headers():
    """Per spec the context/alternate Link headers only apply to
    non-ld+json responses."""
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/doc": (200, [
            ("Content-Type", "application/ld+json"),
            ("Link", f'</c1>; rel="{JSONLD_CONTEXT_REL}"'),
            ("Link", f'</c2>; rel="{JSONLD_CONTEXT_REL}"')],
            json.dumps(CTX)),
    }))
    doc = ldr.load_document("http://x/doc")
    assert doc.document == CTX and doc.context_url is None


def test_resolve_all_builds_broadcastable_cache():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/c1": (200, [("Content-Type", "application/ld+json")],
                        json.dumps(CTX)),
        "http://x/c2": (200, [("Content-Type", "application/ld+json")],
                        json.dumps({"@context": {}})),
    }))
    cache = ldr.resolve_all(["http://x/c1", "http://x/c2", "http://x/c1"])
    assert set(cache) == {"http://x/c1", "http://x/c2"}
    # the cache is a plain dict — exactly what make_extract_quads takes
    from jsonld_spark.operators.pipeline import make_extract_quads
    make_extract_quads(contexts=cache)  # constructs without error

def test_comma_separated_link_values_in_one_header():
    """RFC 8288: one Link header may carry several comma-separated
    link-values — two context links in a single header is the same
    typed error as two separate headers."""
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/doc": (200, [
            ("Content-Type", "application/json"),
            ("Link", f'</c1>; rel="{JSONLD_CONTEXT_REL}", '
                     f'</c2>; rel="{JSONLD_CONTEXT_REL}"')], "{}"),
    }))
    with pytest.raises(JsonLdError) as e:
        ldr.load_document("http://x/doc")
    assert e.value.code == JsonLdError.MULTIPLE_CONTEXT_LINK_HEADERS


def test_alternate_link_parsed_from_comma_separated_header():
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/page": (200, [
            ("Content-Type", "text/html"),
            ("Link", '</style.css>; rel="stylesheet", '
                     '</data.jsonld>; rel="alternate"; '
                     'type="application/ld+json"')], "<html>"),
        "http://x/data.jsonld": (200,
                                 [("Content-Type", "application/ld+json")],
                                 json.dumps(CTX)),
    }))
    assert ldr.load_document("http://x/page").document == CTX


def test_link_param_commas_inside_quotes_not_split():
    """A quoted param value containing a comma must not split the
    link-value."""
    body = json.dumps({"name": "x"})
    ldr = DriverDocumentLoader(http_get=fake_http({
        "http://x/doc": (200, [
            ("Content-Type", "application/json"),
            ("Link", f'</ctx.jsonld>; rel="{JSONLD_CONTEXT_REL}"; '
                     f'title="a, b"')], body),
        "http://x/ctx.jsonld": (200,
                                [("Content-Type", "application/ld+json")],
                                json.dumps(CTX)),
    }))
    doc = ldr.load_document("http://x/doc")
    assert doc.context_url == "http://x/ctx.jsonld"

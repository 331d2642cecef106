"""IRI parsing and RFC 3986 reference resolution.

Behavioral parity target: jsonld-java ``utils/JsonLdUrl.java`` (parse at
:17-112, dot-segment removal :114-160, removeBase :161-250, resolve :252+).
Implemented from the RFC 3986 §5 algorithms directly (not a port) because
Python's ``urljoin`` special-cases known schemes only.
"""

from __future__ import annotations

import re
from typing import NamedTuple

_URL_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.DOTALL,
)

_AUTH_RE = re.compile(r"^(?:([^@]*)@)?(\[[^\]]*\]|[^:]*)(?::(.*))?$", re.DOTALL)


class ParsedIri(NamedTuple):
    scheme: str | None
    authority: str | None  # None means no '//'; '' is an empty authority
    path: str
    query: str | None
    fragment: str | None

    @property
    def normalized_path(self) -> str:
        return remove_dot_segments(self.path, self.authority is not None)


def parse_iri(value: str) -> ParsedIri:
    m = _URL_RE.match(value)
    assert m is not None  # the regex matches any string
    scheme, authority, path, query, fragment = m.groups()
    return ParsedIri(scheme, authority, path, query, fragment)


def is_absolute_iri(value: str) -> bool:
    """True when value has a scheme (per the reference's absolute-IRI test:
    ``JsonLdUtils.isAbsoluteIri`` = contains ':')."""
    return isinstance(value, str) and ":" in value


def remove_dot_segments(path: str, has_authority: bool) -> str:
    """RFC 3986 §5.2.4 (reference: JsonLdUrl.removeDotSegments :114-160)."""
    if not path:
        return ""
    out: list[str] = []
    segments = path.split("/")
    leading_slash = path.startswith("/")
    i = 0
    n = len(segments)
    while i < n:
        seg = segments[i]
        last = i == n - 1
        if seg == ".":
            if last:
                out.append("")
            i += 1
            continue
        if seg == "..":
            # pop unless at root
            if len(out) == 1 and out[0] == "":
                pass  # at root with leading slash: keep
            elif out:
                out.pop()
            if last:
                out.append("")
            i += 1
            continue
        out.append(seg)
        i += 1
    result = "/".join(out)
    if leading_slash and not result.startswith("/"):
        result = "/" + result
    if has_authority and result and not result.startswith("/"):
        result = "/" + result
    return result


def _recompose(scheme: str | None, authority: str | None, path: str,
               query: str | None, fragment: str | None) -> str:
    rval = ""
    if scheme is not None:
        rval += scheme + ":"
    if authority is not None:
        rval += "//" + authority
    rval += path
    if query is not None:
        rval += "?" + query
    if fragment is not None:
        rval += "#" + fragment
    return rval


def resolve_iri(base: str | None, ref: str | None) -> str:
    """RFC 3986 §5.2.2 transform-references (reference: JsonLdUrl.resolve)."""
    if ref is None:
        ref = ""
    if base is None or base == "":
        return ref
    r = parse_iri(ref)
    b = parse_iri(base)
    if r.scheme is not None:
        scheme = r.scheme
        authority = r.authority
        path = remove_dot_segments(r.path, authority is not None)
        query = r.query
    else:
        scheme = b.scheme
        if r.authority is not None:
            authority = r.authority
            path = remove_dot_segments(r.path, True)
            query = r.query
        else:
            authority = b.authority
            if r.path == "":
                path = b.path
                query = r.query if r.query is not None else b.query
            else:
                if r.path.startswith("/"):
                    path = remove_dot_segments(r.path, authority is not None)
                else:
                    # merge paths (RFC 3986 §5.2.3)
                    if authority is not None and b.path == "":
                        merged = "/" + r.path
                    else:
                        idx = b.path.rfind("/")
                        merged = (b.path[: idx + 1] if idx >= 0 else "") + r.path
                    path = remove_dot_segments(merged, authority is not None)
                query = r.query
    return _recompose(scheme, authority, path, query, r.fragment)


def remove_base(base: str | None, iri: str) -> str:
    """Make ``iri`` relative to ``base`` when possible (reference:
    JsonLdUrl.removeBase :161-250): match root (scheme://authority),
    strip common leading path segments, '../' per remaining base dir
    segment, keep query/fragment. Same-document references collapse to
    '?query'/'#fragment'/'./'."""
    if base is None:
        return iri
    b = parse_iri(base)
    root = ""
    if base != "":
        root = f"{b.scheme or ''}://{b.authority or ''}"
    elif not iri.startswith("//"):
        root = "//"
    if not iri.startswith(root):
        return iri
    rel = parse_iri(iri[len(root):])

    def segs(p: ParsedIri) -> list[str]:
        path = p.normalized_path
        # Java String.split drops trailing empties, then the reference
        # re-appends one for a trailing '/' — Python split matches that
        out = path.split("/")
        while len(out) > 1 and out[-1] == "" and not path.endswith("/"):
            out.pop()
        return out

    base_segments = segs(b)
    iri_segments = segs(rel)
    while base_segments and iri_segments:
        if base_segments[0] != iri_segments[0]:
            break
        base_segments.pop(0)
        iri_segments.pop(0)
    rval = ""
    if base_segments:
        if not b.normalized_path.endswith("/") or base_segments[0] == "":
            base_segments.pop()
        rval += "../" * len(base_segments)
    rval += "/".join(iri_segments)
    if rel.query is not None and rel.query != "":
        rval += "?" + rel.query
    if rel.fragment is not None and rel.fragment != "":
        rval += "#" + rel.fragment
    if rval == "":
        rval = "./"
    return rval

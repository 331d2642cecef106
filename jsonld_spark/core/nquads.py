"""N-Quads serialization and parsing.

Parity targets: jsonld-java ``core/RDFDatasetUtils.java`` — toNQuad(s)
(:15-123), escape (:203-258), unescape (:128-193), parseNQuads + quad
regex (:260-372).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .context import RDF_LANGSTRING, XSD_STRING
from .rdf import Quad

# ---------------------------------------------------------------------------
# escaping (RDFDatasetUtils.java:203-258)
# ---------------------------------------------------------------------------

_SPECIAL = {"\b": "\\b", "\n": "\\n", "\t": "\\t", "\f": "\\f",
            "\r": "\\r", '"': '\\"', "\\": "\\\\"}


# fast path: strings of plain ASCII (the overwhelming majority of IRIs,
# predicates, and synthetic literals) escape to themselves — one regex
# probe instead of a per-character Python loop. The memo caps at 64k
# entries because predicates/datatypes/common values repeat heavily
# inside a canonicalization kernel partition (measured 4-5 escape calls
# per quad).
_PLAIN_RE = re.compile(r'[ -!#-\[\]-~]*\Z')  # printable ASCII minus " and \


def escape(s: str) -> str:
    if _PLAIN_RE.match(s):
        return s
    # only short strings consult the memo: it targets the repeating
    # predicates/datatypes/short values, and an unbounded-entry-size
    # cache over distinct large non-ASCII literals could pin hundreds
    # of MB in a long-lived executor Python process
    if len(s) <= 256:
        return _escape_cached(s)
    return _escape_slow(s)


@lru_cache(maxsize=65536)
def _escape_cached(s: str) -> str:
    return _escape_slow(s)


def _escape_slow(s: str) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if (cp <= 0x8 or cp == 0xB or cp == 0xC or 0xE <= cp <= 0x1F
                or 0x7F <= cp <= 0xA0 or (0x24F <= cp <= 0xFFFF)):
            out.append(f"\\u{cp:04x}")
        elif cp > 0xFFFF:  # astral plane → \U (surrogate pair in Java)
            out.append(f"\\U{cp:08x}")
        elif ch in _SPECIAL:
            out.append(_SPECIAL[ch])
        else:
            out.append(ch)
    return "".join(out)


_UNESCAPE_RE = re.compile(
    r"\\\\|\\([tbnrf\"'])|\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")

_SIMPLE = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
           '"': '"', "'": "'"}


def unescape(s: str) -> str:
    if s is None:
        return None

    def repl(m: re.Match) -> str:
        if m.group(0) == "\\\\":
            return "\\"
        if m.group(1):
            return _SIMPLE[m.group(1)]
        if m.group(2):
            return chr(int(m.group(2), 16))
        return chr(int(m.group(3), 16))

    return _UNESCAPE_RE.sub(repl, s)


# ---------------------------------------------------------------------------
# serialization (RDFDatasetUtils.java:40-123)
# ---------------------------------------------------------------------------

def quad_to_nquad(q: Quad) -> str:
    parts = []
    # subject
    if q.subj.startswith("_:"):
        parts.append(q.subj)
    else:
        parts.append(f"<{escape(q.subj)}>")
    # predicate (bnode predicates only under generalized RDF)
    if q.pred.startswith("_:"):
        parts.append(f" {escape(q.pred)} ")
    else:
        parts.append(f" <{escape(q.pred)}> ")
    # object
    if q.obj_kind == "iri":
        parts.append(f"<{escape(q.obj_value)}>")
    elif q.obj_kind == "bnode":
        parts.append(q.obj_value)
    else:
        parts.append(f'"{escape(q.obj_value)}"')
        if q.obj_datatype == RDF_LANGSTRING:
            parts.append(f"@{q.obj_lang}")
        elif q.obj_datatype != XSD_STRING:
            parts.append(f"^^<{escape(q.obj_datatype)}>")
    # graph
    if q.graph is not None and q.graph != "@default":
        if q.graph.startswith("_:"):
            parts.append(f" {q.graph}")
        else:
            parts.append(f" <{escape(q.graph)}>")
    parts.append(" .")
    return "".join(parts)


def quads_to_nquads(quads: list[Quad]) -> list[str]:
    """Dataset → sorted N-Quads lines (RDFDatasetUtils.java:22-36)."""
    return sorted(quad_to_nquad(q) for q in quads)


# ---------------------------------------------------------------------------
# parsing (RDFDatasetUtils.java:260-372)
# ---------------------------------------------------------------------------

_IRI = r"(?:<([^>]*)>)"
_BNODE = r"(_:(?:[A-Za-z][A-Za-z0-9]*))"
_PLAIN = r"\"([^\"\\]*(?:\\.[^\"\\]*)*)\""
_DATATYPE = rf"(?:\^\^{_IRI})"
_LANGUAGE = r"(?:@([a-z]+(?:-[a-zA-Z0-9]+)*))"
_LITERAL = rf"(?:{_PLAIN}(?:{_DATATYPE}|{_LANGUAGE})?)"
_WS = r"[ \t]+"
_WSO = r"[ \t]*"

_QUAD_RE = re.compile(
    rf"^{_WSO}(?:{_IRI}|{_BNODE}){_WS}{_IRI}{_WS}"
    rf"(?:{_IRI}|{_BNODE}|{_LITERAL}){_WSO}"
    rf"(?:\.|(?:(?:{_IRI}|{_BNODE}){_WSO}\.)){_WSO}$")

_EOLN_RE = re.compile(r"(?:\r\n)|(?:\n)|(?:\r)")
_EMPTY_RE = re.compile(rf"^{_WSO}$")


def parse_nquads(text: str, dedupe: bool = True) -> list[Quad]:
    """Parse N-Quads text → quads, deduplicating per graph like the
    reference (RDFDatasetUtils.java:299-372)."""
    quads: list[Quad] = []
    seen: set[Quad] = set()
    for line_no, line in enumerate(_EOLN_RE.split(text), start=1):
        if _EMPTY_RE.match(line) or line.lstrip().startswith("#"):
            continue
        m = _QUAD_RE.match(line)
        if m is None:
            from .errors import JsonLdError
            raise JsonLdError(JsonLdError.SYNTAX_ERROR,
                              f"error while parsing N-Quads; invalid quad. "
                              f"line: {line_no}")
        g = m.groups()
        # groups: 0 subj-iri, 1 subj-bnode, 2 pred-iri, 3 obj-iri,
        #         4 obj-bnode, 5 literal-value, 6 datatype, 7 language,
        #         8 graph-iri, 9 graph-bnode
        subj = unescape(g[0]) if g[0] is not None else g[1]
        pred = unescape(g[2])
        if g[3] is not None:
            okind, oval, odt, olang = "iri", unescape(g[3]), None, None
        elif g[4] is not None:
            okind, oval, odt, olang = "bnode", g[4], None, None
        else:
            okind = "literal"
            oval = unescape(g[5])
            olang = g[7]
            if g[6] is not None:
                odt = unescape(g[6])
            else:
                odt = RDF_LANGSTRING if olang else XSD_STRING
        if g[8] is not None:
            graph = unescape(g[8])
        elif g[9] is not None:
            graph = g[9]
        else:
            graph = "@default"
        q = Quad(graph, subj, pred, okind, oval, odt, olang)
        if dedupe:
            if q in seen:
                continue
            seen.add(q)
        quads.append(q)
    return quads

"""Pluggable RDF parser registry (SURVEY.md §2.1 S7).

Reference: ``JsonLdProcessor.registerRDFParser`` + the format→parser map
at ``JsonLdProcessor.java:375-388`` — only ``application/n-quads`` (and
its aliases) ships registered; users plug in their own formats. Here a
parser is any callable ``str → list[Quad]``.
"""

from __future__ import annotations

from typing import Callable

from .nquads import parse_nquads
from .rdf import Quad

RDFParser = Callable[[str], "list[Quad]"]

_PARSERS: dict[str, RDFParser] = {}


def register_rdf_parser(fmt: str, parser: RDFParser) -> None:
    _PARSERS[fmt] = parser


def remove_rdf_parser(fmt: str) -> None:
    _PARSERS.pop(fmt, None)


def get_rdf_parser(fmt: str) -> RDFParser:
    try:
        return _PARSERS[fmt]
    except KeyError:
        raise ValueError(f"no RDF parser registered for format: {fmt!r}")


def parse_rdf(text: str, fmt: str = "application/n-quads") -> list[Quad]:
    return get_rdf_parser(fmt)(text)


# the reference auto-registers only APPLICATION_NQUADS
# (JsonLdProcessor.java:375-381); we add the common aliases
for _fmt in ("application/n-quads", "application/nquads", "text/x-nquads"):
    register_rdf_parser(_fmt, parse_nquads)

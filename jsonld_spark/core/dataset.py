"""RDF dataset wrapper + processor-level toRDF / fromRDF entry points
with the reference's legacy output options (SURVEY.md §2 — closes the
``useNamespaces`` / ``outputForm`` API-parity gap).

Reference behavior ported:

* ``RDFDataset`` namespaces map + ``parseContext``/``getContext``
  (``core/RDFDataset.java:396-457``): context prefixes leak into the
  dataset; ``getContext`` turns the ``""`` prefix back into ``@vocab``;
* ``JsonLdProcessor.toRDF`` (``JsonLdProcessor.java:525-561``):
  ``useNamespaces`` harvests ``@context`` prefixes from the input
  documents; ``format="application/n-quads"`` serializes;
* ``JsonLdProcessor.fromRDF`` (``JsonLdProcessor.java:407-487``):
  ``format`` picks a registered RDF parser (N-Quads default for string
  input, ``unknown format`` otherwise); ``outputForm`` re-processes the
  expanded result — ``expanded`` as-is, ``compacted``/``flattened``
  against the dataset's harvested context, anything else →
  ``unknown error``.

These run driver-side (single documents / small datasets). The
distributed equivalents are ``operators/pipeline.py`` (toRDF) and
``operators/outputs.py`` (fromRDF); this module exists for API parity
and for per-document use inside kernels.
"""

from __future__ import annotations

from typing import Any, Callable

from .compact import compact_document, flatten_document
from .context import Context, JsonLdOptions
from .errors import JsonLdError
from .fromrdf import from_rdf_quads
from .nquads import quads_to_nquads
from .rdf import Quad, document_to_quads
from .registry import get_rdf_parser

EXPANDED = "expanded"
COMPACTED = "compacted"
FLATTENED = "flattened"
APPLICATION_NQUADS = "application/n-quads"
_KEYWORD_PREFIX = "@"


class RdfDataset:
    """Quads + a namespaces (prefix → IRI) map
    (``core/RDFDataset.java:40-46,396-457``)."""

    def __init__(self, quads: list[Quad] | None = None):
        self.quads: list[Quad] = list(quads or [])
        self._namespaces: dict[str, str] = {}

    def set_namespace(self, prefix: str, iri: str) -> None:
        self._namespaces[prefix] = iri

    def get_namespaces(self) -> dict[str, str]:
        return self._namespaces

    def clear_namespaces(self) -> None:
        self._namespaces.clear()

    def get_context(self) -> dict[str, Any]:
        """Namespaces as a usable ``@context`` value; the ``""`` prefix
        becomes ``@vocab`` (``RDFDataset.java:413-421``)."""
        rval: dict[str, Any] = dict(self._namespaces)
        if "" in rval:
            rval["@vocab"] = rval.pop("")
        return rval

    def parse_context(self, context_like: Any,
                      options: JsonLdOptions | None = None) -> None:
        """Parse a context and harvest its prefixes into the namespaces
        map (``RDFDataset.java:431-457``)."""
        ctx = Context(options or JsonLdOptions()).parse(context_like)
        prefixes = ctx.get_prefixes(True)
        for key, val in prefixes.items():
            if key == "@vocab":
                if val is None or isinstance(val, str):
                    self.set_namespace("", val)
            elif not key.startswith(_KEYWORD_PREFIX):
                self.set_namespace(key, val)


def to_rdf(input_doc: Any, options: JsonLdOptions | None = None,
           callback: Callable[[RdfDataset], Any] | None = None) -> Any:
    """Processor-level toRDF (``JsonLdProcessor.java:525-561``): returns
    the :class:`RdfDataset`, the callback's result, or — with
    ``options.format`` — sorted N-Quads text."""
    options = options or JsonLdOptions()
    dataset = RdfDataset(document_to_quads(input_doc, options))
    if options.use_namespaces:
        docs = input_doc if isinstance(input_doc, list) else [input_doc]
        for e in docs:
            if isinstance(e, dict) and "@context" in e:
                dataset.parse_context(e["@context"], options)
    if callback is not None:
        return callback(dataset)
    if options.format is not None:
        if options.format in (APPLICATION_NQUADS, "application/nquads"):
            return "".join(line + "\n"
                           for line in quads_to_nquads(dataset.quads))
        raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, options.format)
    return dataset


def from_rdf(input_data: Any, options: JsonLdOptions | None = None) -> Any:
    """Processor-level fromRDF (``JsonLdProcessor.java:407-487``):
    accepts an :class:`RdfDataset`, a list of :class:`Quad`, or a
    serialized string parsed by the registered parser for
    ``options.format`` (N-Quads default for strings)."""
    options = options or JsonLdOptions()
    if isinstance(input_data, RdfDataset):
        dataset = input_data
    elif isinstance(input_data, str):
        fmt = options.format or APPLICATION_NQUADS
        try:
            parser = get_rdf_parser(fmt)
        except (KeyError, ValueError):
            raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, fmt) from None
        dataset = RdfDataset(parser(input_data))
    elif isinstance(input_data, list):
        dataset = RdfDataset(input_data)
    else:
        raise JsonLdError(JsonLdError.INVALID_INPUT,
                          f"cannot read RDF from {type(input_data).__name__}")

    rval = from_rdf_quads(dataset.quads, use_rdf_type=options.use_rdf_type,
                          use_native_types=options.use_native_types)
    # re-process using the harvested context when outputForm is set
    # (JsonLdProcessor.java:471-484)
    if options.output_form is not None:
        if options.output_form == EXPANDED:
            return rval
        if options.output_form == COMPACTED:
            return compact_document(rval, dataset.get_context(), options)
        if options.output_form == FLATTENED:
            return flatten_document(rval, dataset.get_context(), options)
        raise JsonLdError(JsonLdError.UNKNOWN_ERROR,
                          f"Output form was unknown: {options.output_form}")
    return rval


def normalize(input_doc: Any, options: JsonLdOptions | None = None) -> Any:
    """Processor-level normalize (``JsonLdProcessor.java:627-649`` →
    ``JsonLdApi.normalize``, :2187-2237): canonical ``_:c14n`` labels;
    returns N-Quads text when ``options.format`` is set, otherwise the
    canonicalized dataset re-parsed from those lines (the reference
    parses its own serialization back)."""
    from .normalize import normalize_quads
    from .registry import parse_rdf

    options = options or JsonLdOptions()
    lines = "".join(normalize_quads(document_to_quads(input_doc, options)))
    if options.format is not None:
        if options.format in (APPLICATION_NQUADS, "application/nquads"):
            return lines
        raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, options.format)
    return RdfDataset(parse_rdf(lines))

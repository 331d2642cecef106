"""Deserialize JSON-LD to RDF: node map → quads.

Parity targets: jsonld-java ``core/JsonLdApi.java:2147-2166`` (toRDF),
``core/RDFDataset.java:552-638`` (graphToRDF, @list chains),
``core/RDFDataset.java:648-710`` (objectToRDF, literal canonical forms).

Quads are flat named tuples — the exact columnar shape of the Spark
triples DataFrame (SURVEY.md §1.3): one row per quad, string columns only.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

from .context import (RDF_FIRST, RDF_LANGSTRING, RDF_NIL, RDF_REST, RDF_TYPE,
                      XSD_BOOLEAN, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER,
                      XSD_STRING, is_keyword)
from .expand import expand_document, is_list_object, is_value_object
from .nodemap import BlankNodeNamer, generate_node_map
from .url import is_absolute_iri


class Quad(NamedTuple):
    graph: str          # '@default' or IRI / bnode label
    subj: str           # IRI or '_:' label
    pred: str           # IRI (or '_:' label when produce_generalized_rdf)
    obj_kind: str       # 'iri' | 'bnode' | 'literal'
    obj_value: str
    obj_datatype: str | None   # None for iri/bnode
    obj_lang: str | None


def canonical_double(value: float) -> str:
    """Java ``DecimalFormat("0.0###############E0")`` (US locale):
    1 integer digit, 1-16 fraction digits, exponent form, HALF_EVEN
    (RDFDataset.java:673-676)."""
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    mantissa, _, exp = f"{value:.15E}".partition("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    return f"{mantissa}E{int(exp)}"


def canonical_integer(value: Any) -> str:
    """Java ``DecimalFormat("0")``: round HALF_EVEN to integer."""
    if isinstance(value, int):
        return str(value)
    # floats routed here only via explicit non-double datatypes
    from decimal import ROUND_HALF_EVEN, Decimal
    return str(Decimal(value).quantize(Decimal(1), rounding=ROUND_HALF_EVEN))


class _ObjNode(NamedTuple):
    kind: str
    value: str
    datatype: str | None
    lang: str | None


def object_to_rdf(item: Any) -> _ObjNode | None:
    """JSON-LD value/node object → RDF node (RDFDataset.java:648-710)."""
    if is_value_object(item):
        value = item["@value"]
        datatype = item.get("@type")
        if isinstance(value, bool):
            return _ObjNode("literal", "true" if value else "false",
                            datatype or XSD_BOOLEAN, None)
        if isinstance(value, (int, float)):
            if isinstance(value, float) or datatype == XSD_DOUBLE:
                if isinstance(value, float) and not math.isfinite(value):
                    return _ObjNode("literal", canonical_double(value),
                                    datatype or XSD_DOUBLE, None)
                if datatype == XSD_DECIMAL:
                    # not canonicalized (RDFDataset.java:669-671)
                    v = repr(value) if isinstance(value, float) else str(value)
                    return _ObjNode("literal", v, XSD_DECIMAL, None)
                return _ObjNode("literal", canonical_double(float(value)),
                                datatype or XSD_DOUBLE, None)
            return _ObjNode("literal", canonical_integer(value),
                            datatype or XSD_INTEGER, None)
        if "@language" in item:
            return _ObjNode("literal", value, datatype or RDF_LANGSTRING,
                            item["@language"])
        return _ObjNode("literal", value, datatype or XSD_STRING, None)
    # node object / string id
    nid = item["@id"] if isinstance(item, dict) else item
    if nid is None or (not is_keyword(nid) and not is_absolute_iri(nid)):
        return None  # relative IRI → skip
    if nid.startswith("_:"):
        return _ObjNode("bnode", nid, None, None)
    return _ObjNode("iri", nid, None, None)


def graph_to_quads(graph_name: str, graph: dict, namer: BlankNodeNamer,
                   produce_generalized_rdf: bool = False) -> list[Quad]:
    """RDFDataset.graphToRDF (:552-638): subjects in node-map insertion
    order, properties sorted; @list → rdf:first/rest/nil chains with fresh
    blank nodes from the shared per-document namer."""
    quads: list[Quad] = []

    def emit(subj: str, pred: str, obj: _ObjNode) -> None:
        quads.append(Quad(graph_name, subj, pred, obj.kind, obj.value,
                          obj.datatype, obj.lang))

    for nid, node in graph.items():
        if not is_absolute_iri(nid):  # relative subject skipped
            continue
        for prop in sorted(node.keys()):
            if prop == "@type":
                values = node["@type"]
                prop_iri = RDF_TYPE
            elif is_keyword(prop):
                continue
            elif prop.startswith("_:") and not produce_generalized_rdf:
                continue
            elif not is_absolute_iri(prop):
                continue
            else:
                values = node[prop]
                prop_iri = prop
            for item in values:
                if is_list_object(item):
                    lst = item["@list"]
                    if not lst:
                        emit(nid, prop_iri, _ObjNode("iri", RDF_NIL, None, None))
                        continue
                    last = object_to_rdf(lst[-1])
                    first_bnode = namer.get()
                    emit(nid, prop_iri, _ObjNode("bnode", first_bnode, None, None))
                    for i in range(len(lst) - 1):
                        obj = object_to_rdf(lst[i])
                        if obj is not None:
                            quads.append(Quad(graph_name, first_bnode, RDF_FIRST,
                                              obj.kind, obj.value, obj.datatype,
                                              obj.lang))
                        rest_bnode = namer.get()
                        quads.append(Quad(graph_name, first_bnode, RDF_REST,
                                          "bnode", rest_bnode, None, None))
                        first_bnode = rest_bnode
                    if last is not None:
                        quads.append(Quad(graph_name, first_bnode, RDF_FIRST,
                                          last.kind, last.value, last.datatype,
                                          last.lang))
                        quads.append(Quad(graph_name, first_bnode, RDF_REST,
                                          "iri", RDF_NIL, None, None))
                else:
                    obj = object_to_rdf(item)
                    if obj is not None:
                        emit(nid, prop_iri, obj)
    return quads


def expanded_to_quads(expanded: list, produce_generalized_rdf: bool = False,
                      dedupe: bool = False) -> list[Quad]:
    # NOTE: the reference's toRDF does NOT dedupe quads (value objects
    # differing only in @index collapse to identical quads and both are
    # kept — toRdf-0076); dedup happens later at the DataFrame level.
    """Expanded JSON-LD → quads (JsonLdApi.toRDF :2147-2166): node map into
    ``{"@default": {}}`` then per-graph conversion, graphs in sorted order
    with '@default' first (insertion order starts with @default; remaining
    keys follow node-map insertion which the reference preserves)."""
    namer = BlankNodeNamer("b")
    node_map: dict[str, dict] = {"@default": {}}
    generate_node_map(expanded, node_map, namer)
    quads: list[Quad] = []
    for graph_name, graph in node_map.items():
        # skip graphs whose name is a relative IRI (non-bnode, non-absolute)
        if not is_absolute_iri(graph_name) and graph_name != "@default":
            continue
        quads.extend(graph_to_quads(graph_name, graph, namer,
                                    produce_generalized_rdf))
    if dedupe:
        seen = set()
        out = []
        for q in quads:
            if q not in seen:
                seen.add(q)
                out.append(q)
        quads = out
    return quads


def document_to_quads(input_doc: Any, options=None) -> list[Quad]:
    """Full per-document pipeline: expand → node map → quads."""
    expanded = expand_document(input_doc, options)
    pgr = bool(options and options.produce_generalized_rdf)
    return expanded_to_quads(expanded, pgr)

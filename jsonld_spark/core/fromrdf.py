"""Serialize RDF as JSON-LD (fromRDF).

Parity target: jsonld-java ``core/JsonLdApi.java:1935-2127`` including
its quirks:

* rdf:type folds to ``@type`` only when the type IRI is not itself a
  subject in the same graph (or is the subject itself) — :2003-2008;
* native integer conversion goes through double → int32 truncation and
  only sticks when the round-trip reproduces the lexical form; on
  failure the value stays a string with NO datatype (RDFDataset.java
  Node.toObject :214-236);
* the well-formed-list check counts keys exactly like
  ``isWellFormedListNode`` (:1886-1917).
"""

from __future__ import annotations

import re
from typing import Any

from .context import (RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE,
                      XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, XSD_STRING)
from .rdf import Quad
from .util import merge_value

RDF_LIST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"

_PATTERN_INTEGER = re.compile(r"^[\-+]?[0-9]+$")
_PATTERN_DOUBLE = re.compile(
    r"^(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?$")

_INT32_MIN, _INT32_MAX = -(2 ** 31), 2 ** 31 - 1


def _object_to_jsonld(q: Quad, use_native_types: bool) -> dict:
    """RDF object node → JSON-LD value/node object (Node.toObject)."""
    if q.obj_kind in ("iri", "bnode"):
        return {"@id": q.obj_value}
    rval: dict[str, Any] = {"@value": q.obj_value}
    if q.obj_lang is not None:
        rval["@language"] = q.obj_lang
        return rval
    dtype, value = q.obj_datatype, q.obj_value
    if use_native_types:
        if dtype == XSD_STRING:
            pass
        elif dtype == XSD_BOOLEAN:
            if value == "true":
                rval["@value"] = True
            elif value == "false":
                rval["@value"] = False
            else:
                rval["@type"] = dtype
        elif ((dtype == XSD_INTEGER and _PATTERN_INTEGER.match(value))
              or (dtype == XSD_DOUBLE and _PATTERN_DOUBLE.match(value))):
            d = float(value)
            if d == d and d not in (float("inf"), float("-inf")):
                if dtype == XSD_INTEGER:
                    # Java Double.intValue(): truncate + saturate at int32
                    i = max(_INT32_MIN, min(_INT32_MAX, int(d)))
                    if str(i) == value:
                        rval["@value"] = i
                else:
                    rval["@value"] = d
        else:
            rval["@type"] = dtype
    elif dtype != XSD_STRING:
        rval["@type"] = dtype
    return rval


def _is_well_formed_list_node(node: dict, usages: list) -> bool:
    if len(usages) != 1:
        return False
    keys = 0
    if RDF_FIRST in node:
        keys += 1
        if not (isinstance(node[RDF_FIRST], list)
                and len(node[RDF_FIRST]) == 1):
            return False
    if RDF_REST in node:
        keys += 1
        if not (isinstance(node[RDF_REST], list)
                and len(node[RDF_REST]) == 1):
            return False
    if "@type" in node:
        keys += 1
        t = node["@type"]
        # replicate the reference's precedence quirk (:1901-1906)
        if not (isinstance(t, list) and len(t) == 1) and t[0] == RDF_LIST:
            return False
    if "@id" in node:
        keys += 1
    return keys >= len(node)


def from_rdf_quads(quads: list[Quad], use_rdf_type: bool = False,
                   use_native_types: bool = False) -> list:
    """quads → expanded JSON-LD array (JsonLdApi.fromRDF)."""
    # group quads by graph, preserving first-appearance order, with
    # @default always present and first (RDFDataset constructor)
    graphs: dict[str, list[Quad]] = {"@default": []}
    for q in quads:
        graphs.setdefault(q.graph or "@default", []).append(q)

    default_graph: dict[str, dict] = {}
    graph_map: dict[str, dict[str, dict]] = {"@default": default_graph}
    usages_map: dict[tuple[str, str], list] = {}

    for name, graph_quads in graphs.items():
        node_map = graph_map.setdefault(name, {})
        if name != "@default" and name not in default_graph:
            default_graph[name] = {"@id": name}
        # subjects present in this graph (for the rdf:type fold quirk)
        subjects = {q.subj for q in graph_quads}
        for q in graph_quads:
            node = node_map.setdefault(q.subj, {"@id": q.subj})
            if q.obj_kind in ("iri", "bnode"):
                node_map.setdefault(q.obj_value, {"@id": q.obj_value})
            if (q.pred == RDF_TYPE and q.obj_kind in ("iri", "bnode")
                    and not use_rdf_type
                    and (q.obj_value not in subjects or q.subj == q.obj_value)):
                merge_value(node, "@type", q.obj_value)
                continue
            value = _object_to_jsonld(q, use_native_types)
            merge_value(node, q.pred, value)
            if q.obj_kind in ("iri", "bnode"):
                usages_map.setdefault((name, q.obj_value), []).append(
                    {"node": node, "property": q.pred, "value": value})

    # 4) list reconstruction from rdf:nil usages backwards
    for name, graph in graph_map.items():
        if RDF_NIL not in graph:
            continue
        for usage in usages_map.get((name, RDF_NIL), []):
            node = usage["node"]
            prop = usage["property"]
            head = usage["value"]
            lst: list = []
            list_nodes: list[str] = []
            while prop == RDF_REST and _is_well_formed_list_node(
                    node, usages_map.get((name, node.get("@id")), [])):
                lst.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                node_usage = usages_map[(name, node["@id"])][0]
                node = node_usage["node"]
                prop = node_usage["property"]
                head = node_usage["value"]
                nid = node.get("@id")
                if not (isinstance(nid, str) and nid.startswith("_:")):
                    break
            if prop == RDF_FIRST:
                if node.get("@id") == RDF_NIL:
                    continue
                head_id = head["@id"]
                head = graph[head_id][RDF_REST][0]
                lst.pop()
                list_nodes.pop()
            head.pop("@id", None)
            lst.reverse()
            head["@list"] = lst
            for nid in list_nodes:
                graph.pop(nid, None)

    # 5-6) assemble result, sorted subjects, named graphs nested
    result: list = []
    for subject in sorted(default_graph.keys()):
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            graph_nodes = []
            for s in sorted(graph_map[subject].keys()):
                n = graph_map[subject][s]
                if len(n) == 1 and "@id" in n:
                    continue
                graph_nodes.append(n)
            node["@graph"] = graph_nodes
        if len(node) == 1 and "@id" in node:
            continue
        result.append(node)
    return result

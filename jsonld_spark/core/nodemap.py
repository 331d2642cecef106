"""Node Map Generation + blank-node relabeling.

Parity target: jsonld-java ``core/JsonLdApi.java`` generateNodeMap
(:1038-1222) and generateBlankNodeIdentifier (:1229-1271). Per-document,
pure Python; mutates the (freshly built) expanded tree like the reference.
"""

from __future__ import annotations

from typing import Any

from .errors import JsonLdError
from .util import deep_compare, merge_value


class BlankNodeNamer:
    """Counter + memo issuing ``_:{prefix}{n}`` labels in first-seen order
    (reference: core/UniqueNamer.java:6-72)."""

    def __init__(self, prefix: str = "b"):
        self.prefix = prefix
        self.counter = 0
        self.mapping: dict[str, str] = {}

    def get(self, old: str | None = None) -> str:
        if old is not None and old in self.mapping:
            return self.mapping[old]
        name = f"_:{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.mapping[old] = name
        return name

    def is_named(self, old: str) -> bool:
        return old in self.mapping


def generate_node_map(element: Any, node_map: dict, namer: BlankNodeNamer,
                      active_graph: str = "@default",
                      active_subject: Any = None,
                      active_property: str | None = None,
                      list_obj: dict | None = None) -> None:
    if isinstance(element, list):
        for item in element:
            generate_node_map(item, node_map, namer, active_graph,
                              active_subject, active_property, list_obj)
        return
    elem: dict = element
    graph = node_map.setdefault(active_graph, {})
    node = graph.get(active_subject) if isinstance(active_subject, str) else None

    # 3) relabel blank-node @type values
    if "@type" in elem:
        old_types = elem["@type"]
        was_list = isinstance(old_types, list)
        if not was_list:
            old_types = [old_types]
        new_types = [namer.get(t) if t.startswith("_:") else t for t in old_types]
        elem["@type"] = new_types if was_list else new_types[0]

    # 4) value object
    if "@value" in elem:
        if list_obj is None:
            merge_value(node, active_property, elem)
        else:
            merge_value(list_obj, "@list", elem)
    # 5) list object
    elif "@list" in elem:
        result = {"@list": []}
        generate_node_map(elem["@list"], node_map, namer, active_graph,
                          active_subject, active_property, result)
        merge_value(node, active_property, result)
    # 6) node object
    else:
        nid = elem.pop("@id", None)
        if nid is not None:
            if nid.startswith("_:"):
                nid = namer.get(nid)
        else:
            nid = namer.get()
        if nid not in graph:
            graph[nid] = {"@id": nid}
        # 6.5) reverse case: active_subject is a node reference map
        if isinstance(active_subject, dict):
            merge_value(graph[nid], active_property, active_subject)
        # 6.6)
        elif active_property is not None:
            reference = {"@id": nid}
            if list_obj is None:
                merge_value(node, active_property, reference)
            else:
                merge_value(list_obj, "@list", reference)
        node = graph[nid]
        # 6.7)
        if "@type" in elem:
            for t in elem.pop("@type"):
                merge_value(node, "@type", t)
        # 6.8)
        if "@index" in elem:
            elem_index = elem.pop("@index")
            if "@index" in node:
                if not deep_compare(node["@index"], elem_index):
                    raise JsonLdError(JsonLdError.CONFLICTING_INDEXES)
            else:
                node["@index"] = elem_index
        # 6.9)
        if "@reverse" in elem:
            referenced_node = {"@id": nid}
            reverse_map = elem.pop("@reverse")
            for prop, values in reverse_map.items():
                for value in values:
                    generate_node_map(value, node_map, namer, active_graph,
                                      referenced_node, prop, None)
        # 6.10)
        if "@graph" in elem:
            generate_node_map(elem.pop("@graph"), node_map, namer, nid,
                              None, None, None)
        # 6.11) remaining properties, sorted for determinism
        for prop in sorted(elem.keys()):
            value = elem[prop]
            if prop.startswith("_:"):
                prop = namer.get(prop)
            if prop not in node:
                node[prop] = []
            generate_node_map(value, node_map, namer, active_graph, nid,
                              prop, None)

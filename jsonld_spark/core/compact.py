"""JSON-LD Compaction + Flattening.

Parity targets: jsonld-java ``core/JsonLdApi.java:158-464`` (compact),
``core/JsonLdProcessor.java:43-84`` (compact entry), ``:173-255``
(flatten entry), ``:353-367`` (returnedContext). Quirky branches
(e.g. the @reverse set-container double-add path, list-wrapped puts via
``tmp.add(result.put(...))``) are replicated as-is for fixture parity.
"""

from __future__ import annotations

from typing import Any

from .context import Context, JsonLdOptions
from .errors import JsonLdError
from .expand import expand_document
from .nodemap import BlankNodeNamer, generate_node_map


def compact(active_ctx: Context, active_property: str | None, element: Any,
            compact_arrays: bool = True) -> Any:
    opts = active_ctx.options
    if isinstance(element, list):
        result = []
        for item in element:
            compacted_item = compact(active_ctx, active_property, item,
                                     compact_arrays)
            if compacted_item is not None:
                result.append(compacted_item)
        if compact_arrays and len(result) == 1 and \
                active_ctx.get_container(active_property) is None:
            return result[0]
        return result
    if not isinstance(element, dict):
        return element
    elem: dict = element
    if "@value" in elem or "@id" in elem:
        compacted_value = active_ctx.compact_value(active_property, elem)
        if not isinstance(compacted_value, (dict, list)):
            return compacted_value
    inside_reverse = active_property == "@reverse"
    result: dict[str, Any] = {}
    for expanded_property in sorted(elem.keys()):
        expanded_value = elem[expanded_property]
        if expanded_property in ("@id", "@type"):
            alias = active_ctx.compact_iri(expanded_property, None, True)
            if isinstance(expanded_value, str):
                compacted_value = active_ctx.compact_iri(
                    expanded_value, None, expanded_property == "@type")
            else:
                types = [active_ctx.compact_iri(t, None, True)
                         for t in expanded_value]
                # json-ld-1.1: keep single @type as array when the alias
                # has @container:@set (JsonLdApi.java:225-233)
                if len(types) == 1 and (
                        not opts.allow_container_set_on_type
                        or active_ctx.get_container(alias) != "@set"):
                    compacted_value = types[0]
                else:
                    compacted_value = types
            result[alias] = compacted_value
            continue
        if expanded_property == "@reverse":
            compacted_value = compact(active_ctx, "@reverse", expanded_value,
                                      compact_arrays)
            for prop in list(compacted_value.keys()):
                value = compacted_value[prop]
                if active_ctx.is_reverse_property(prop):
                    if (active_ctx.get_container(prop) == "@set"
                            or not compact_arrays) and \
                            not isinstance(value, list):
                        result[prop] = [value]
                    if prop not in result:
                        result[prop] = value
                    else:
                        if not isinstance(result[prop], list):
                            result[prop] = [result[prop]]
                        if isinstance(value, list):
                            result[prop].extend(value)
                        else:
                            result[prop].append(value)
                    del compacted_value[prop]
            if compacted_value:
                alias = active_ctx.compact_iri("@reverse", None, True)
                result[alias] = compacted_value
            continue
        if expanded_property == "@index" and \
                active_ctx.get_container(active_property) == "@index":
            continue
        if expanded_property in ("@index", "@value", "@language"):
            alias = active_ctx.compact_iri(expanded_property, None, True)
            result[alias] = expanded_value
            continue
        # expanded_value is an array (guaranteed by expansion)
        if len(expanded_value) == 0:
            item_active_property = active_ctx.compact_iri(
                expanded_property, expanded_value, True, inside_reverse)
            if item_active_property not in result:
                result[item_active_property] = []
            elif not isinstance(result[item_active_property], list):
                result[item_active_property] = [result[item_active_property]]
        for expanded_item in expanded_value:
            item_active_property = active_ctx.compact_iri(
                expanded_property, expanded_item, True, inside_reverse)
            container = active_ctx.get_container(item_active_property)
            is_list = isinstance(expanded_item, dict) and "@list" in expanded_item
            lst = expanded_item.get("@list") if is_list else None
            compacted_item = compact(active_ctx, item_active_property,
                                     lst if is_list else expanded_item,
                                     compact_arrays)
            if is_list:
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if container != "@list":
                    wrapper = {active_ctx.compact_iri("@list", None, True):
                               compacted_item}
                    compacted_item = wrapper
                    if "@index" in expanded_item:
                        compacted_item[active_ctx.compact_iri("@index", None,
                                                              True)] = \
                            expanded_item["@index"]
                elif item_active_property in result:
                    raise JsonLdError(
                        JsonLdError.COMPACTION_TO_LIST_OF_LISTS,
                        "There cannot be two list objects associated with an "
                        "active property that has a container mapping")
            if container in ("@language", "@index"):
                map_object = result.setdefault(item_active_property, {})
                if container == "@language" and \
                        isinstance(compacted_item, dict) and \
                        "@value" in compacted_item:
                    compacted_item = compacted_item["@value"]
                map_key = expanded_item[container]
                if map_key not in map_object:
                    map_object[map_key] = compacted_item
                else:
                    if not isinstance(map_object[map_key], list):
                        map_object[map_key] = [map_object[map_key]]
                    map_object[map_key].append(compacted_item)
            else:
                check = (not compact_arrays or container in ("@set", "@list")
                         or expanded_property in ("@list", "@graph")) and \
                        not isinstance(compacted_item, list)
                if check:
                    compacted_item = [compacted_item]
                if item_active_property not in result:
                    result[item_active_property] = compacted_item
                else:
                    if not isinstance(result[item_active_property], list):
                        result[item_active_property] = \
                            [result[item_active_property]]
                    if isinstance(compacted_item, list):
                        result[item_active_property].extend(compacted_item)
                    else:
                        result[item_active_property].append(compacted_item)
    return result


def _returned_context(context: Any, options: JsonLdOptions) -> Any:
    if context is not None and (
            (isinstance(context, dict) and context)
            or (isinstance(context, list) and context)
            or (isinstance(context, str) and context)):
        if isinstance(context, list) and len(context) == 1 and \
                options.compact_arrays:
            return context[0]
        return context
    return None


def compact_document(input_doc: Any, context: Any,
                     options: JsonLdOptions | None = None) -> dict:
    """JsonLdProcessor.compact (:43-84)."""
    options = options or JsonLdOptions()
    expanded = expand_document(input_doc, options)
    if isinstance(context, dict) and "@context" in context:
        context = context["@context"]
    active_ctx = Context(options).parse(context)
    compacted = compact(active_ctx, None, expanded, options.compact_arrays)
    if isinstance(compacted, list):
        if not compacted:
            compacted = {}
        else:
            compacted = {active_ctx.compact_iri("@graph", None, True):
                         compacted}
    if compacted is not None:
        returned = _returned_context(context, options)
        if returned is not None:
            compacted["@context"] = returned
    return compacted


def flatten_document(input_doc: Any, context: Any = None,
                     options: JsonLdOptions | None = None) -> Any:
    """JsonLdProcessor.flatten (:173-255): expand → node map → sorted
    flat node array (named graphs nested under @graph), then optional
    compaction."""
    options = options or JsonLdOptions()
    expanded = expand_document(input_doc, options)
    if isinstance(context, dict) and "@context" in context:
        context = context["@context"]
    node_map: dict[str, dict] = {"@default": {}}
    generate_node_map(expanded, node_map, BlankNodeNamer("b"))
    default_graph = node_map.pop("@default")
    for graph_name in node_map.keys():
        graph = node_map[graph_name]
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        entry.setdefault("@graph", [])
        for nid in sorted(graph.keys()):
            node = graph[nid]
            if not (len(node) == 1 and "@id" in node):
                entry["@graph"].append(node)
    flattened = []
    for nid in sorted(default_graph.keys()):
        node = default_graph[nid]
        if not (len(node) == 1 and "@id" in node):
            flattened.append(node)
    if context is not None and flattened:
        active_ctx = Context(options).parse(context)
        compacted = compact(active_ctx, None, flattened,
                            options.compact_arrays)
        if not isinstance(compacted, list):
            compacted = [compacted]
        alias = active_ctx.compact_iri("@graph")
        rval: dict[str, Any] = {}
        returned = _returned_context(context, options)
        if returned is not None:
            rval["@context"] = returned
        rval[alias] = compacted
        return rval
    return flattened

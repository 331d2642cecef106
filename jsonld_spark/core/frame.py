"""JSON-LD Framing.

Parity target: jsonld-java ``core/JsonLdApi.java:1340-1834`` (frame,
filterNode, addFrameOutput, removeEmbed), ``core/JsonLdUtils.java:199-322``
(removePreserve, pruneBlankNodes), entry
``core/JsonLdProcessor.java:294-345``.
"""

from __future__ import annotations

import copy
from typing import Any

from .compact import _returned_context, compact
from .context import Context, JsonLdOptions, is_keyword
from .errors import JsonLdError
from .expand import expand_document
from .nodemap import BlankNodeNamer, generate_node_map
from .util import deep_compare

EMBED_ALWAYS, EMBED_NEVER, EMBED_LAST, EMBED_LINK = (
    "@always", "@never", "@last", "@link")


class _EmbedNode:
    __slots__ = ("parent", "property")

    def __init__(self, parent, property):
        self.parent = parent
        self.property = property


class _FramingState:
    def __init__(self, options: JsonLdOptions):
        self.embed = options.embed or EMBED_LAST
        self.explicit = bool(options.explicit)
        self.omit_default = bool(options.omit_default)
        self.require_all = False
        self.unique_embeds: dict[str, _EmbedNode] = {}
        self.subject_stack: list[str] = []


def _get_frame_value(frame: dict, name: str):
    value = frame.get(name)
    if isinstance(value, list) and value:
        value = value[0]
    if isinstance(value, dict) and "@value" in value:
        value = value["@value"]
    return value


def _get_frame_flag(frame: dict, name: str, default: bool) -> bool:
    value = _get_frame_value(frame, name)
    return value if isinstance(value, bool) else default


def _get_frame_embed(frame: dict, default: str) -> str:
    value = _get_frame_value(frame, "@embed")
    if value is None:
        return default
    if isinstance(value, bool):
        return EMBED_LAST if value else EMBED_NEVER
    if value in (EMBED_ALWAYS, EMBED_NEVER, EMBED_LAST, EMBED_LINK):
        return value
    raise JsonLdError("invalid @embed value", str(value))


def _is_node_reference(v: Any) -> bool:
    return isinstance(v, dict) and len(v) == 1 and "@id" in v


def _add_frame_output(parent, prop: str | None, output) -> None:
    if isinstance(parent, dict):
        parent.setdefault(prop, []).append(output)
    else:
        parent.append(output)


def _filter_node(node: dict, frame: dict, require_all: bool) -> bool:
    types = frame.get("@type")
    frame_ids = frame.get("@id")
    if frame_ids is not None:
        if isinstance(frame_ids, str):
            node_id = node.get("@id")
            return node_id is not None and deep_compare(node_id, frame_ids)
        if isinstance(frame_ids, dict) and len(frame_ids) == 0:
            return "@id" in node
        if not isinstance(frame_ids, list):
            raise JsonLdError(JsonLdError.SYNTAX_ERROR,
                              "frame @id must be an array")
        node_id = node.get("@id")
        if node_id is None:
            return False
        return any(deep_compare(node_id, j) for j in frame_ids)
    if types is not None:
        if not isinstance(types, list):
            raise JsonLdError(JsonLdError.SYNTAX_ERROR,
                              "frame @type must be an array")
        node_types = node.get("@type") or []
        for i in node_types:
            for j in types:
                if deep_compare(i, j):
                    return True
        if len(types) == 1 and isinstance(types[0], dict) and \
                len(types[0]) == 0:
            return bool(node_types)
        return False
    for key in frame.keys():
        if not is_keyword(key) and key not in node:
            frame_object = frame.get(key)
            if isinstance(frame_object, list):
                if any(isinstance(oo, dict) and "@default" in oo
                       for oo in frame_object):
                    continue
            return False
    return True


def _remove_dependents(embeds: dict[str, _EmbedNode], nid: str) -> None:
    for id_dep in list(embeds.keys()):
        e = embeds.get(id_dep)
        if e is None or not isinstance(e.parent, dict):
            continue
        if e.parent.get("@id") == nid:
            embeds.pop(id_dep, None)
            _remove_dependents(embeds, id_dep)


def _remove_embed(state: _FramingState, nid: str) -> None:
    embed = state.unique_embeds[nid]
    parent, prop = embed.parent, embed.property
    node_ref = {"@id": nid}
    if isinstance(parent, dict):
        newvals = []
        for v in parent.get(prop, []):
            if isinstance(v, dict) and v.get("@id") == nid:
                newvals.append(node_ref)
            else:
                newvals.append(v)
        parent[prop] = newvals
    _remove_dependents(state.unique_embeds, nid)


def _frame(state: _FramingState, nodes: dict, node_map: dict, frame: dict,
           parent, prop: str | None) -> None:
    embed = _get_frame_embed(frame, state.embed)
    explicit_on = _get_frame_flag(frame, "@explicit", state.explicit)
    require_all = _get_frame_flag(frame, "@requireAll", state.require_all)
    flags = {"@explicit": explicit_on, "@embed": embed,
             "@requireAll": require_all}
    matches = {nid: el for nid, el in nodes.items()
               if el is not None and _filter_node(el, frame, require_all)}
    for nid in sorted(matches.keys()):
        output: dict[str, Any] = {"@id": nid}
        if embed == EMBED_LINK and nid in state.unique_embeds:
            _add_frame_output(parent, prop, state.unique_embeds[nid])
            continue
        if prop is None:
            state.unique_embeds = {}
        if embed == EMBED_NEVER or nid in state.subject_stack:
            _add_frame_output(parent, prop, output)
            continue
        if embed == EMBED_LAST:
            if nid in state.unique_embeds:
                _remove_embed(state, nid)
            state.unique_embeds[nid] = _EmbedNode(parent, prop)
        state.subject_stack.append(nid)
        element = matches[nid]
        for p in sorted(element.keys()):
            if is_keyword(p):
                output[p] = copy.deepcopy(element[p])
                continue
            if explicit_on and p not in frame:
                continue
            for item in element[p]:
                if isinstance(item, dict) and "@list" in item:
                    lst = {"@list": []}
                    _add_frame_output(output, p, lst)
                    for listitem in item["@list"]:
                        if _is_node_reference(listitem):
                            itemid = listitem["@id"]
                            tmp = {itemid: node_map.get(itemid)}
                            subframe = (frame[p][0] if p in frame
                                        else flags)
                            _frame(state, tmp, node_map, subframe, lst,
                                   "@list")
                        else:
                            _add_frame_output(lst, "@list", listitem)
                elif _is_node_reference(item):
                    itemid = item["@id"]
                    tmp = {itemid: node_map.get(itemid)}
                    subframe = frame[p][0] if p in frame else flags
                    _frame(state, tmp, node_map, subframe, output, p)
                else:
                    _add_frame_output(output, p, item)
        for p in sorted(frame.keys()):
            if is_keyword(p):
                continue
            pf = frame[p]
            property_frame = pf[0] if isinstance(pf, list) and pf else None
            if property_frame is None:
                property_frame = {}
            omit_default_on = _get_frame_flag(property_frame, "@omitDefault",
                                              state.omit_default)
            if not omit_default_on and p not in output:
                default = property_frame.get("@default", "@null")
                default = copy.deepcopy(default)
                if not isinstance(default, list):
                    default = [default]
                output[p] = [{"@preserve": default}]
        _add_frame_output(parent, prop, output)
        state.subject_stack.pop()


def frame_expanded(expanded_input: list, expanded_frame: list,
                   options: JsonLdOptions) -> list:
    """JsonLdApi.frame (:1340-1360)."""
    state = _FramingState(options)
    nodes: dict[str, dict] = {}
    generate_node_map(copy.deepcopy(expanded_input), nodes,
                      BlankNodeNamer("b"))
    node_map = nodes.get("@default", {})
    framed: list = []
    frm = expanded_frame[0] if expanded_frame else {}
    _frame(state, node_map, node_map, frm, framed, None)
    return framed


def _remove_preserve(ctx: Context, input_: Any, options: JsonLdOptions):
    if isinstance(input_, list):
        output = []
        for i in input_:
            result = _remove_preserve(ctx, i, options)
            if result is not None:
                output.append(result)
        return output
    if isinstance(input_, dict):
        if "@preserve" in input_:
            if input_["@preserve"] == "@null":
                return None
            return input_["@preserve"]
        if "@value" in input_:
            return input_
        if "@list" in input_:
            input_["@list"] = _remove_preserve(ctx, input_["@list"], options)
            return input_
        for p in list(input_.keys()):
            result = _remove_preserve(ctx, input_[p], options)
            container = ctx.get_container(p)
            if options.compact_arrays and isinstance(result, list) and \
                    len(result) == 1 and container is None:
                result = result[0]
            input_[p] = result
    return input_


def _fill_nodes_to_prune(input_: Any, to_prune: dict) -> None:
    if isinstance(input_, list):
        for i in input_:
            _fill_nodes_to_prune(i, to_prune)
    elif isinstance(input_, dict):
        if "@value" in input_:
            return
        if "@list" in input_:
            _fill_nodes_to_prune(input_["@list"], to_prune)
            return
        for p in list(input_.keys()):
            if p == "@id":
                nid = input_["@id"]
                if isinstance(nid, str) and nid.startswith("_:"):
                    if nid in to_prune:
                        to_prune[nid] = None
                    else:
                        to_prune[nid] = input_
            else:
                _fill_nodes_to_prune(input_[p], to_prune)
    elif isinstance(input_, str):
        if input_.startswith("_:"):
            to_prune[input_] = None


def _prune_blank_nodes(input_: Any) -> None:
    to_prune: dict[str, Any] = {}
    _fill_nodes_to_prune(input_, to_prune)
    for nid, node in to_prune.items():
        if node is not None:
            node.pop("@id", None)


def frame_document(input_doc: Any, frame: Any,
                   options: JsonLdOptions | None = None) -> dict:
    """JsonLdProcessor.frame (:294-345)."""
    options = options or JsonLdOptions()
    if isinstance(frame, dict):
        frame = copy.deepcopy(frame)
    expanded_input = expand_document(input_doc, options)
    saved_ec = options.expand_context
    options.expand_context = None
    expanded_frame = expand_document(frame, options, frame_expansion=True)
    options.expand_context = saved_ec
    context = frame.get("@context") if isinstance(frame, dict) else None
    active_ctx = Context(options).parse(context)
    framed = frame_expanded(expanded_input, expanded_frame, options)
    if options.prune_blank_node_identifiers:
        _prune_blank_nodes(framed)
    compacted = compact(active_ctx, None, framed, options.compact_arrays)
    rval: dict[str, Any] = {}
    returned = _returned_context(context, options)
    if returned is not None:
        rval["@context"] = returned
    add_graph = not isinstance(compacted, list) and not options.omit_graph
    if add_graph and not isinstance(compacted, list):
        compacted = [compacted]
    if add_graph or isinstance(compacted, list):
        alias = active_ctx.compact_iri("@graph")
        rval[alias] = compacted
    elif isinstance(compacted, dict):
        rval.update(compacted)
    _remove_preserve(active_ctx, rval, options)
    return rval

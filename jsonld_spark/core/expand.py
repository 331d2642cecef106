"""JSON-LD Expansion Algorithm (JSON-LD 1.0 API).

Pure-Python, per-document. Behavioral parity target: jsonld-java
``core/JsonLdApi.java:509-1011`` (expand) and
``core/JsonLdProcessor.java:100-156`` (entry). Keys are processed in
sorted order for deterministic output (JsonLdApi.java:555-556).
"""

from __future__ import annotations

from typing import Any

from .context import Context, JsonLdOptions, is_keyword
from .errors import JsonLdError


def is_list_object(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def is_value_object(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


_FRAMING_KEYWORDS = ("@explicit", "@default", "@embed", "@omitDefault", "@requireAll")


def expand(active_ctx: Context, active_property: str | None, element: Any,
           frame_expansion: bool = False) -> Any:
    # 1) null stays null
    if element is None:
        return None
    # 2) scalars
    if not isinstance(element, (dict, list)):
        # free-floating scalars are dropped (JsonLdApi.java:988-998 analogue)
        if active_property is None or active_property == "@graph":
            return None
        return active_ctx.expand_value(active_property, element)
    # 3) arrays
    if isinstance(element, list):
        result: list[Any] = []
        inside_list = (active_property == "@list"
                       or active_ctx.get_container(active_property) == "@list")
        for item in element:
            expanded_item = expand(active_ctx, active_property, item, frame_expansion)
            if inside_list and (isinstance(expanded_item, list)
                                or is_list_object(expanded_item)):
                raise JsonLdError(JsonLdError.LIST_OF_LISTS,
                                  "lists of lists are not permitted")
            if isinstance(expanded_item, list):
                result.extend(expanded_item)
            elif expanded_item is not None:
                result.append(expanded_item)
        return result
    # 4) maps
    if "@context" in element:
        active_ctx = active_ctx.parse(element["@context"])
    result: dict[str, Any] = {}
    for key in sorted(element.keys()):
        value = element[key]
        if key == "@context":
            continue
        expanded_property = active_ctx.expand_iri(key, False, True)
        if expanded_property is None or not (
                ":" in expanded_property or is_keyword(expanded_property)):
            continue
        if is_keyword(expanded_property):
            if active_property == "@reverse":
                raise JsonLdError(JsonLdError.INVALID_REVERSE_PROPERTY_MAP,
                                  "a keyword cannot be used as a @reverse property")
            if expanded_property in result:
                raise JsonLdError(JsonLdError.COLLIDING_KEYWORDS, expanded_property)
            if expanded_property == "@id":
                if not isinstance(value, str):
                    if frame_expansion and isinstance(value, (list, dict)):
                        expanded_value = value
                    else:
                        raise JsonLdError(JsonLdError.INVALID_ID_VALUE,
                                          "value of @id must be a string")
                else:
                    expanded_value = active_ctx.expand_iri(value, True, False)
            elif expanded_property == "@type":
                if isinstance(value, str):
                    expanded_value = active_ctx.expand_iri(value, True, True)
                elif isinstance(value, list):
                    expanded_value = []
                    for v in value:
                        if not isinstance(v, str):
                            raise JsonLdError(JsonLdError.INVALID_TYPE_VALUE,
                                              "@type value must be a string or array of strings")
                        expanded_value.append(active_ctx.expand_iri(v, True, True))
                elif frame_expansion and isinstance(value, dict):
                    if len(value) != 0:
                        raise JsonLdError(JsonLdError.INVALID_TYPE_VALUE,
                                          "@type value must be an empty object for frames")
                    expanded_value = value
                else:
                    raise JsonLdError(JsonLdError.INVALID_TYPE_VALUE,
                                      "@type value must be a string or array of strings")
            elif expanded_property == "@graph":
                expanded_value = expand(active_ctx, "@graph", value, frame_expansion)
            elif expanded_property == "@value":
                if value is not None and isinstance(value, (dict, list)):
                    raise JsonLdError(JsonLdError.INVALID_VALUE_OBJECT_VALUE,
                                      "value of @value must be a scalar or null")
                expanded_value = value
                if expanded_value is None:
                    result["@value"] = None
                    continue
            elif expanded_property == "@language":
                if not isinstance(value, str):
                    raise JsonLdError(JsonLdError.INVALID_LANGUAGE_TAGGED_STRING,
                                      "value of @language must be a string")
                expanded_value = value.lower()
            elif expanded_property == "@index":
                if not isinstance(value, str):
                    raise JsonLdError(JsonLdError.INVALID_INDEX_VALUE,
                                      "value of @index must be a string")
                expanded_value = value
            elif expanded_property == "@list":
                if active_property is None or active_property == "@graph":
                    continue
                expanded_value = expand(active_ctx, active_property, value,
                                        frame_expansion)
                if not isinstance(expanded_value, list):
                    expanded_value = [expanded_value]
                for v in expanded_value:
                    if is_list_object(v):
                        raise JsonLdError(JsonLdError.LIST_OF_LISTS,
                                          "lists of lists are not permitted")
            elif expanded_property == "@set":
                expanded_value = expand(active_ctx, active_property, value,
                                        frame_expansion)
            elif expanded_property == "@reverse":
                if not isinstance(value, dict):
                    raise JsonLdError(JsonLdError.INVALID_REVERSE_VALUE,
                                      "@reverse value must be an object")
                expanded_value = expand(active_ctx, "@reverse", value, frame_expansion)
                if isinstance(expanded_value, dict) and "@reverse" in expanded_value:
                    # reverse of a reverse = forward
                    for prop, items in expanded_value["@reverse"].items():
                        bucket = result.setdefault(prop, [])
                        if isinstance(items, list):
                            bucket.extend(items)
                        else:
                            bucket.append(items)
                if isinstance(expanded_value, dict) and len(expanded_value) > (
                        1 if "@reverse" in expanded_value else 0):
                    reverse_map = result.setdefault("@reverse", {})
                    for prop, items in expanded_value.items():
                        if prop == "@reverse":
                            continue
                        for item in items:
                            if is_value_object(item) or is_list_object(item):
                                raise JsonLdError(
                                    JsonLdError.INVALID_REVERSE_PROPERTY_VALUE,
                                    "invalid value for a reverse property")
                            reverse_map.setdefault(prop, []).append(item)
                continue
            elif frame_expansion and expanded_property in _FRAMING_KEYWORDS:
                expanded_value = expand(active_ctx, expanded_property, value,
                                        frame_expansion)
            else:
                expanded_value = None
            if expanded_value is not None:
                result[expanded_property] = expanded_value
            continue
        # non-keyword key
        container = active_ctx.get_container(key)
        if container == "@language" and isinstance(value, dict):
            expanded_value = []
            for lang in sorted(value.keys()):
                lang_value = value[lang]
                if not isinstance(lang_value, list):
                    lang_value = [lang_value]
                for item in lang_value:
                    if not isinstance(item, str):
                        raise JsonLdError(JsonLdError.INVALID_LANGUAGE_MAP_VALUE,
                                          "expected string for language map value")
                    expanded_value.append({"@value": item, "@language": lang.lower()})
        elif container == "@index" and isinstance(value, dict):
            expanded_value = []
            for index in sorted(value.keys()):
                index_value = value[index]
                if not isinstance(index_value, list):
                    index_value = [index_value]
                index_value = expand(active_ctx, key, index_value, frame_expansion)
                for item in index_value:
                    if "@index" not in item:
                        item["@index"] = index
                    expanded_value.append(item)
        else:
            expanded_value = expand(active_ctx, key, value, frame_expansion)
        if expanded_value is None:
            continue
        if container == "@list" and not is_list_object(expanded_value):
            if not isinstance(expanded_value, list):
                expanded_value = [expanded_value]
            expanded_value = {"@list": expanded_value}
        if active_ctx.is_reverse_property(key):
            reverse_map = result.setdefault("@reverse", {})
            if not isinstance(expanded_value, list):
                expanded_value = [expanded_value]
            for item in expanded_value:
                if is_value_object(item) or is_list_object(item):
                    raise JsonLdError(JsonLdError.INVALID_REVERSE_PROPERTY_VALUE,
                                      "invalid value for a reverse property")
                reverse_map.setdefault(expanded_property, []).append(item)
        else:
            bucket = result.setdefault(expanded_property, [])
            if isinstance(expanded_value, list):
                bucket.extend(expanded_value)
            else:
                bucket.append(expanded_value)
    # post-processing (JsonLdApi.java:905-1010 analogue)
    if "@value" in result:
        allowed = {"@value", "@language", "@type", "@index"}
        if not set(result).issubset(allowed) or (
                "@language" in result and "@type" in result):
            raise JsonLdError(JsonLdError.INVALID_VALUE_OBJECT,
                              "value object has unknown or conflicting keys")
        if result["@value"] is None:
            return None
        if not isinstance(result["@value"], str) and "@language" in result:
            raise JsonLdError(JsonLdError.INVALID_LANGUAGE_TAGGED_VALUE,
                              "only strings may be language-tagged")
        if "@type" in result and not (
                isinstance(result["@type"], str)
                and (":" in result["@type"])
                and not result["@type"].startswith("_:")
                and not is_keyword(result["@type"])):
            raise JsonLdError(JsonLdError.INVALID_TYPED_VALUE,
                              "@type of a value object must be an IRI")
        # free-floating value objects are dropped (JsonLdApi.java:988-998)
        if active_property is None or active_property == "@graph":
            return None
        return result
    if "@type" in result and not isinstance(result["@type"], list):
        result["@type"] = [result["@type"]]
    elif "@set" in result or "@list" in result:
        if len(result) > (2 if "@index" in result else 1):
            raise JsonLdError(JsonLdError.INVALID_SET_OR_LIST_OBJECT,
                              "@set or @list objects allow only @index as other key")
        if "@set" in result:
            return result["@set"]
    if isinstance(result, dict) and len(result) == 1 and "@language" in result:
        return None
    if active_property is None or active_property == "@graph":
        if isinstance(result, dict) and (
                len(result) == 0 or "@value" in result or "@list" in result):
            return None
        if isinstance(result, dict) and len(result) == 1 and "@id" in result \
                and not frame_expansion:
            return None
    return result


def expand_document(input_doc: Any, options: JsonLdOptions | None = None,
                    frame_expansion: bool = False) -> list:
    """Top-level expand entry (JsonLdProcessor.java:100-156)."""
    options = options or JsonLdOptions()
    active_ctx = Context(options)
    if options.expand_context is not None:
        ec = options.expand_context
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        active_ctx = active_ctx.parse(ec)
    expanded = expand(active_ctx, None, input_doc, frame_expansion)
    if isinstance(expanded, dict) and set(expanded.keys()) == {"@graph"}:
        expanded = expanded["@graph"]
    if expanded is None:
        return []
    if not isinstance(expanded, list):
        return [expanded]
    return expanded

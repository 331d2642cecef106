"""Structural JSON helpers shared by the engine and tests.

Parity targets: jsonld-java ``core/JsonLdUtils.java`` deepCompare
(:38-92), deepContains (:94-101), mergeValue (:103-117).
"""

from __future__ import annotations

from typing import Any


def deep_compare(v1: Any, v2: Any, list_order_matters: bool = False) -> bool:
    if v1 is None or v2 is None:
        return v1 is None and v2 is None
    if isinstance(v1, dict) and isinstance(v2, dict):
        if len(v1) != len(v2):
            return False
        return all(k in v2 and deep_compare(v1[k], v2[k], list_order_matters)
                   for k in v1)
    if isinstance(v1, list) and isinstance(v2, list):
        if len(v1) != len(v2):
            return False
        if list_order_matters:
            return all(deep_compare(a, b, True) for a, b in zip(v1, v2))
        # order-insensitive: each element of v1 matches some unused element of v2
        used = [False] * len(v2)
        for a in v1:
            found = False
            for i, b in enumerate(v2):
                if not used[i] and deep_compare(a, b, False):
                    used[i] = True
                    found = True
                    break
            if not found:
                return False
        return True
    # bool is not int for JSON-LD purposes; numbers compare by value
    if isinstance(v1, bool) or isinstance(v2, bool):
        return v1 is v2 or (isinstance(v1, bool) and isinstance(v2, bool) and v1 == v2)
    if isinstance(v1, (int, float)) and isinstance(v2, (int, float)):
        return v1 == v2
    return v1 == v2


def deep_contains(values: list, value: Any) -> bool:
    return any(deep_compare(v, value, False) for v in values)


def merge_value(obj: dict, key: str, value: Any) -> None:
    """Append ``value`` to ``obj[key]`` unless structurally present
    (JsonLdUtils.mergeValue:103-117)."""
    values = obj.setdefault(key, [])
    if key == "@list" or (isinstance(value, dict) and "@list" in value) \
            or not deep_contains(values, value):
        values.append(value)

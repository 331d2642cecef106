"""compact (75) + flatten (45) W3C suites, deepCompare equality."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdOptions
from jsonld_spark.core.compact import compact_document, flatten_document
from jsonld_spark.core.util import deep_compare

from .fixture_utils import (case_options, fixtures_available, load_json,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

COMPACT_CASES = list(manifest_cases("compact")) if fixtures_available() else []
FLATTEN_CASES = list(manifest_cases("flatten")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", COMPACT_CASES,
                         ids=[t for t, _ in COMPACT_CASES])
def test_compact(tid, case):
    input_doc = load_json(case["input"])
    context = load_json(case["context"])
    expected = load_json(case["expect"])
    opts = JsonLdOptions(**case_options(case))
    actual = compact_document(input_doc, context, opts)
    assert deep_compare(actual, expected), (
        f"{case.get('name')}\nactual:   {actual!r}\nexpected: {expected!r}")


@pytest.mark.parametrize("tid,case", FLATTEN_CASES,
                         ids=[t for t, _ in FLATTEN_CASES])
def test_flatten(tid, case):
    input_doc = load_json(case["input"])
    context = load_json(case["context"]) if "context" in case else None
    expected = load_json(case["expect"])
    opts = JsonLdOptions(**case_options(case))
    actual = flatten_document(input_doc, context, opts)
    assert deep_compare(actual, expected), (
        f"{case.get('name')}\nactual:   {actual!r}\nexpected: {expected!r}")

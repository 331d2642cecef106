"""Expand-suite conformance (77 W3C cases) for the pure-Python core."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdOptions, expand_document
from jsonld_spark.core.util import deep_compare

from .fixture_utils import (case_options, fixtures_available, load_json,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("expand")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_expand(tid, case):
    input_doc = load_json(case["input"])
    expected = load_json(case["expect"])
    opts = JsonLdOptions(**case_options(case))
    actual = expand_document(input_doc, opts)
    assert deep_compare(actual, expected), (
        f"{case.get('name')}\nactual:   {actual!r}\nexpected: {expected!r}")

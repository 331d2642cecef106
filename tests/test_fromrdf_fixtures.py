"""fromRdf-suite conformance (20 W3C cases): N-Quads → expanded JSON-LD,
deepCompare equality."""

from __future__ import annotations

import pytest

from jsonld_spark.core.fromrdf import from_rdf_quads
from jsonld_spark.core.nquads import parse_nquads
from jsonld_spark.core.util import deep_compare

from .fixture_utils import (fixtures_available, load_json, load_text,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("fromRdf")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_fromrdf(tid, case):
    quads = parse_nquads(load_text(case["input"]))
    expected = load_json(case["expect"])
    raw = case.get("option", {}) or {}
    actual = from_rdf_quads(
        quads,
        use_rdf_type=raw.get("useRdfType", False),
        use_native_types=raw.get("useNativeTypes", False))
    assert deep_compare(actual, expected), (
        f"{case.get('name')}\nactual:   {actual!r}\nexpected: {expected!r}")

"""toRdf-suite conformance (125 W3C cases): expand → node map → quads →
sorted N-Quads string equality (JsonLdProcessorTest.java:358-371,476-481)."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdOptions, expand_document
from jsonld_spark.core.nquads import quads_to_nquads
from jsonld_spark.core.rdf import expanded_to_quads

from .fixture_utils import (case_options, expected_nquads_lines,
                            fixtures_available, load_json, manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("toRdf")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_tordf(tid, case):
    input_doc = load_json(case["input"])
    expected = expected_nquads_lines(case["expect"])
    opts = JsonLdOptions(**case_options(case))
    expanded = expand_document(input_doc, opts)
    quads = expanded_to_quads(expanded, opts.produce_generalized_rdf)
    actual = [line.rstrip() for line in quads_to_nquads(quads)]
    assert actual == expected, (
        f"{case.get('name')}\nactual:\n" + "\n".join(actual)
        + "\nexpected:\n" + "\n".join(expected))

"""normalize-suite conformance (57 W3C cases): canonical N-Quads with
deterministic _:c14n labels, sorted-line string equality."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdOptions
from jsonld_spark.core.normalize import normalize_document

from .fixture_utils import (case_options, expected_nquads_lines,
                            fixtures_available, load_json, manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("normalize")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_normalize(tid, case):
    input_doc = load_json(case["input"])
    expected = expected_nquads_lines(case["expect"])
    opts = JsonLdOptions(**case_options(case))
    actual = [line.rstrip("\n") for line in
              normalize_document(input_doc, opts).splitlines()]
    assert sorted(actual) == expected, (
        f"{case.get('name')}\nactual:\n" + "\n".join(sorted(actual))
        + "\nexpected:\n" + "\n".join(expected))

"""error-suite conformance (43 negative W3C cases): the typed
JsonLdError code string must match the manifest's ``expect``
(JsonLdProcessorTest.java:492-495)."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdError, JsonLdOptions
from jsonld_spark.core.compact import compact_document, flatten_document

from .fixture_utils import (case_options, fixtures_available, load_json,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("error")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_error(tid, case):
    input_doc = load_json(case["input"])
    opts = JsonLdOptions(**case_options(case))
    types = case["@type"]
    with pytest.raises(JsonLdError) as exc:
        if "jld:CompactTest" in types:
            context = load_json(case["context"]) if "context" in case else {}
            compact_document(input_doc, context, opts)
        else:  # flatten / expand negative tests all surface via expansion
            flatten_document(
                input_doc,
                load_json(case["context"]) if "context" in case else None,
                opts)
    assert exc.value.code == case["expect"], (
        f"{case.get('name')}: raised {exc.value.code!r}, "
        f"expected {case['expect']!r}")

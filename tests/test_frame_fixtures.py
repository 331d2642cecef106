"""frame-suite conformance (26 W3C cases), deepCompare equality."""

from __future__ import annotations

import pytest

from jsonld_spark.core import JsonLdOptions
from jsonld_spark.core.frame import frame_document
from jsonld_spark.core.util import deep_compare

from .fixture_utils import (case_options, fixtures_available, load_json,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

CASES = list(manifest_cases("frame")) if fixtures_available() else []


@pytest.mark.parametrize("tid,case", CASES, ids=[t for t, _ in CASES])
def test_frame(tid, case):
    input_doc = load_json(case["input"])
    frame = load_json(case["frame"])
    expected = load_json(case["expect"])
    raw = case.get("option", {}) or {}
    opts = JsonLdOptions(**case_options(case))
    if "embed" in raw:
        opts.embed = raw["embed"]
    if "explicit" in raw:
        opts.explicit = raw["explicit"]
    if "omitDefault" in raw:
        opts.omit_default = raw["omitDefault"]
    if "pruneBlankNodeIdentifiers" in raw:
        opts.prune_blank_node_identifiers = raw["pruneBlankNodeIdentifiers"]
    if "omitGraph" in raw:
        opts.omit_graph = raw["omitGraph"]
    actual = frame_document(input_doc, frame, opts)
    assert deep_compare(actual, expected), (
        f"{case.get('name')}\nactual:   {actual!r}\nexpected: {expected!r}")

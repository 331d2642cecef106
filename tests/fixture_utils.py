"""W3C json-ld.org fixture harness.

Loads the public W3C JSON-LD test suite that ships with the reference
(read-only at /root/reference/core/src/test/resources/json-ld.org/),
mirroring the reference's manifest-driven runner
(JsonLdProcessorTest.java:177-231,400-446). Nothing is copied into this
repo; fixtures are read at test time.
"""

from __future__ import annotations

import json
from pathlib import Path

FIXTURE_DIR = Path("/root/reference/core/src/test/resources/json-ld.org")
TEST_BASE = "http://json-ld.org/test-suite/tests/"


def fixtures_available() -> bool:
    return FIXTURE_DIR.is_dir()


def load_json(name: str):
    with open(FIXTURE_DIR / name, encoding="utf-8") as f:
        return json.load(f)


def load_text(name: str) -> str:
    with open(FIXTURE_DIR / name, encoding="utf-8") as f:
        return f.read()


def fixture_loader(url: str):
    """Dict-backed document loader: resolves test-suite URLs to local
    fixture files (JsonLdProcessorTest.java:233-264 analogue)."""
    if url.startswith(TEST_BASE):
        rel = url[len(TEST_BASE):]
        path = FIXTURE_DIR / rel
        if path.is_file():
            with open(path, encoding="utf-8") as f:
                return json.load(f)
    raise IOError(f"no local fixture for {url}")


def manifest_cases(suite: str):
    """Yield (test_id, case_dict) for a suite manifest, e.g. 'expand'."""
    manifest = load_json(f"{suite}-manifest.jsonld")
    for case in manifest["sequence"]:
        yield case["@id"].lstrip("#"), case


def case_options(case: dict):
    """Build JsonLdOptions kwargs from a manifest case's option map
    (JsonLdProcessorTest.java:395-446)."""
    opts = {
        "base": TEST_BASE + case["input"],
        "document_loader": fixture_loader,
    }
    raw = case.get("option", {}) or {}
    if "base" in raw:
        opts["base"] = raw["base"]
    if "expandContext" in raw:
        opts["expand_context"] = load_json(raw["expandContext"])
    if "compactArrays" in raw:
        opts["compact_arrays"] = raw["compactArrays"]
    if "useNativeTypes" in raw:
        opts["use_native_types"] = raw["useNativeTypes"]
    if "useRdfType" in raw:
        opts["use_rdf_type"] = raw["useRdfType"]
    if "produceGeneralizedRdf" in raw:
        opts["produce_generalized_rdf"] = raw["produceGeneralizedRdf"]
    if "processingMode" in raw:
        opts["processing_mode"] = raw["processingMode"]
    if "omitGraph" in raw:
        opts["omit_graph"] = raw["omitGraph"]
    return opts


def expected_nquads_lines(name: str) -> list[str]:
    """Expected .nq file → trimmed, comment-stripped, sorted lines
    (JsonLdProcessorTest.java:358-371)."""
    lines = []
    for line in load_text(name).split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        lines.append(line)
    return sorted(lines)

"""W3C expand/compact/flatten/frame suites through the DISTRIBUTED
per-row transform (one Spark job per suite, every fixture a row with its
own context/frame + options columns) — the heterogeneous-corpus path.
Complements test_w3c_spark_pr.py (toRdf suite through the pipeline) so
every output stage has distributed-suite coverage, not just pure-core.
"""

from __future__ import annotations

import json

import pytest

from jsonld_spark.core.util import deep_compare
from jsonld_spark.operators.outputs import jsonld_transform_docs

from .fixture_utils import (case_options, fixture_loader,
                            fixtures_available, load_json, load_text,
                            manifest_cases)

pytestmark = pytest.mark.skipif(not fixtures_available(),
                                reason="reference fixture dir not present")

AUX_KEY = {"expand": None, "compact": "context", "flatten": "context",
           "frame": "frame"}


def _suite_rows(suite: str):
    """(doc_id, doc_json, aux_json, opts_json, expected) per positive
    case."""
    rows, expected = [], {}
    for tid, case in manifest_cases(suite):
        if "expect" not in case:
            continue  # negative cases covered by the pure-core suites
        kwargs = case_options(case)
        kwargs.pop("document_loader", None)
        aux = None
        if AUX_KEY[suite] and AUX_KEY[suite] in case:
            aux = json.dumps(load_json(case[AUX_KEY[suite]]))
        rows.append((tid, load_text(case["input"]), aux,
                     json.dumps(kwargs)))
        expected[tid] = load_json(case["expect"])
    return rows, expected


@pytest.mark.parametrize("suite", ["expand", "compact", "flatten", "frame"])
def test_suite_through_distributed_transform(spark, suite):
    rows, expected = _suite_rows(suite)
    assert rows, f"no positive {suite} cases found"
    df = spark.createDataFrame(
        rows, "doc_id string, doc_json string, aux_json string, "
              "opts_json string").repartition(4)
    out = jsonld_transform_docs(df, suite,
                                document_loader=fixture_loader).collect()
    assert len(out) == len(rows)
    failures = []
    for r in out:
        if r.error is not None:
            failures.append((r.doc_id, f"error: {r.error}"))
        elif not deep_compare(json.loads(r.out_json), expected[r.doc_id]):
            failures.append((r.doc_id, "mismatch"))
    assert not failures, (
        f"{len(failures)}/{len(rows)} {suite} cases failed distributed: "
        f"{failures[:5]}")


def test_heterogeneous_contexts_one_pass(spark):
    """The capability the suite run exercises, stated directly: documents
    with DIFFERENT target contexts and processing options compact in one
    distributed pass."""
    rows = [
        ("a", '{"http://s/name": "x"}',
         '{"n": "http://s/name"}', None),
        ("b", '{"http://s/name": "y"}',
         '{"nom": "http://s/name"}', None),
        ("c", '{"@context": {"t": {"@id": "http://s/tag", "@container": '
              '"@set"}}, "t": "v"}',
         '{"t": {"@id": "http://s/tag", "@container": "@set"}}',
         '{"compact_arrays": false}'),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, doc_json string, aux_json string, "
              "opts_json string")
    got = {r.doc_id: json.loads(r.out_json)
           for r in jsonld_transform_docs(df, "compact").collect()}
    assert got["a"] == {"@context": {"n": "http://s/name"}, "n": "x"}
    assert got["b"] == {"@context": {"nom": "http://s/name"}, "nom": "y"}
    # compact_arrays=False keeps @graph wrapping and the @set list
    assert got["c"]["@graph"][0]["t"] == ["v"]

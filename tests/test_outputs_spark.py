"""Distributed output stages vs the pure-core algorithms."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jsonld_spark.core.compact import compact_document, flatten_document
from jsonld_spark.core.fromrdf import from_rdf_quads
from jsonld_spark.core.rdf import Quad
from jsonld_spark.operators.outputs import (compact_docs, flatten_docs,
                                            frame_docs, jsonld_from_triples)
from jsonld_spark.operators.pipeline import docs_to_triples
from jsonld_spark.sources.interleaved import (assemble_documents,
                                              interleaved_from_documents)

SF_DIR = "/root/testdata/sf0.001"

CTX = {"text": "http://schema.org/text",
       "lang": "http://schema.org/inLanguage",
       "source": "http://purl.org/dc/terms/source",
       "nChars": "http://example.org/nChars"}


@pytest.fixture(scope="module")
def assembled(spark):
    df = assemble_documents(
        interleaved_from_documents(spark, SF_DIR)).persist()
    yield df
    df.unpersist()


def _core_map(assembled, fn):
    return {r.doc_id: fn(json.loads(r.doc_json))
            for r in assembled.limit(50).collect()}


def test_compact_matches_core(spark, assembled):
    got = {r.doc_id: json.loads(r.out_json)
           for r in compact_docs(assembled.limit(50), CTX).collect()}
    want = _core_map(assembled, lambda d: compact_document(d, CTX))
    assert got == want and not any(v is None for v in got.values())


def test_flatten_matches_core(spark, assembled):
    got = {r.doc_id: json.loads(r.out_json)
           for r in flatten_docs(assembled.limit(50)).collect()}
    want = _core_map(assembled, lambda d: flatten_document(d))
    assert got == want


def test_frame_matches_core(spark, assembled):
    frame = {"@context": CTX, "@type": []}
    from jsonld_spark.core.frame import frame_document
    got = {r.doc_id: json.loads(r.out_json)
           for r in frame_docs(assembled.limit(20), frame).collect()}
    want = {r.doc_id: frame_document(json.loads(r.doc_json), frame)
            for r in assembled.limit(20).collect()}
    assert got == want


def test_fromrdf_matches_core(spark):
    triples = docs_to_triples(
        interleaved_from_documents(spark, SF_DIR)).persist()
    try:
        got = {r.doc_id: json.loads(r.out_json)
               for r in jsonld_from_triples(triples).collect()}
        rows = triples.collect()
        by_doc: dict[str, list[Quad]] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(
                Quad(r.graph, r.subj, r.pred, r.obj_kind, r.obj_value,
                     r.obj_datatype, r.obj_lang))
        for doc_id, quads in by_doc.items():
            assert got[doc_id] == from_rdf_quads(quads), doc_id
    finally:
        triples.unpersist()

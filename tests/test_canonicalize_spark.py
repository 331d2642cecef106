"""Distributed canonicalization vs the pure-core reference algorithm."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from jsonld_spark.core import JsonLdOptions
from jsonld_spark.core.normalize import normalize_quads
from jsonld_spark.core.nquads import quad_to_nquad
from jsonld_spark.core.rdf import Quad, document_to_quads
from jsonld_spark.operators.canonicalize import (QUAD_COLS, bnode_components,
                                                 canonicalize_triples)

SCHEMA = ", ".join(f"{c}: string" for c in QUAD_COLS)


def _doc_quads(doc, doc_id="d0", prefix=""):
    quads = document_to_quads(doc, JsonLdOptions())
    if prefix:
        def pre(v):
            return f"_:{prefix}{v[2:]}" if v and v.startswith("_:") else v
        quads = [Quad(pre(q.graph), pre(q.subj), q.pred, q.obj_kind,
                      pre(q.obj_value) if q.obj_kind == "bnode" else q.obj_value,
                      q.obj_datatype, q.obj_lang) for q in quads]
    return [(doc_id, q.graph or "@default", q.subj, q.pred, q.obj_kind,
             q.obj_value, q.obj_datatype, q.obj_lang) for q in quads]


def _lines(df):
    rows = df.collect()
    return sorted(
        quad_to_nquad(Quad(r.graph, r.subj, r.pred, r.obj_kind, r.obj_value,
                           r.obj_datatype, r.obj_lang)) + "\n" for r in rows)


CYCLE_DOC = {  # two mutually-referencing bnodes: forces hashPaths
    "@context": {"knows": "http://xmlns.com/foaf/0.1/knows"},
    "@graph": [
        {"@id": "_:x", "knows": {"@id": "_:y"}},
        {"@id": "_:y", "knows": {"@id": "_:x"}},
    ],
}

TREE_DOC = {  # asymmetric bnode tree: unique first-degree hashes
    "@context": {"p": "http://ex.org/p", "q": "http://ex.org/q"},
    "p": {"q": {"p": "leaf"}},
}


@pytest.mark.parametrize("doc", [CYCLE_DOC, TREE_DOC],
                         ids=["cycle", "tree"])
def test_single_component_matches_pure_core_exactly(spark, doc):
    rows = _doc_quads(doc)
    df = spark.createDataFrame(rows, SCHEMA)
    got = _lines(canonicalize_triples(df))
    expect = normalize_quads(document_to_quads(doc, JsonLdOptions()))
    assert got == expect


def test_multi_component_deterministic_and_locally_exact(spark):
    """Three docs (two structurally identical) — each one bnode component.
    Distributed labels must be globally unique, the output independent of
    partitioning, and each doc's quads equal to its pure-core
    canonicalization up to a constant per-component label offset."""
    rows = (_doc_quads(CYCLE_DOC, "a", prefix="da") +
            _doc_quads(CYCLE_DOC, "b", prefix="db") +
            _doc_quads(TREE_DOC, "c", prefix="dc"))
    df = spark.createDataFrame(rows, SCHEMA)

    out1 = _lines(canonicalize_triples(df.repartition(1)))
    out2 = _lines(canonicalize_triples(df.repartition(7, "pred")))
    assert out1 == out2  # pure function of content, not of partitioning

    canon = canonicalize_triples(df).persist()
    try:
        labels = (canon.select(F.explode(F.array("subj", "obj_value"))
                               .alias("v"))
                  .where(F.col("v").startswith("_:c14n"))
                  .select("v").distinct().collect())
        nums = sorted(int(r.v[6:]) for r in labels)
        assert nums == list(range(len(nums)))  # contiguous, globally unique

        # per-doc: distributed labels == pure-core labels + constant offset
        for doc_id, doc in (("a", CYCLE_DOC), ("b", CYCLE_DOC),
                            ("c", TREE_DOC)):
            doc_rows = canon.where(F.col("doc_id") == doc_id)
            got = _lines(doc_rows)
            offsets = {int(m) for line in got
                       for m in re.findall(r"_:c14n(\d+)", line)}
            base = min(offsets)
            shifted = [re.sub(r"_:c14n(\d+)",
                              lambda m: f"_:c14n{int(m.group(1)) - base}",
                              line) for line in got]
            expect = normalize_quads(document_to_quads(doc, JsonLdOptions()))
            assert sorted(shifted) == expect
    finally:
        canon.unpersist()


def test_bnode_components_grouping(spark):
    rows = (_doc_quads(CYCLE_DOC, "a", prefix="da") +
            _doc_quads(TREE_DOC, "c", prefix="dc"))
    df = spark.createDataFrame(rows, SCHEMA)
    comps = bnode_components(df).collect()
    by_comp = {}
    for r in comps:
        by_comp.setdefault(r.component, set()).add(r.node)
    groups = sorted(sorted(g) for g in by_comp.values())
    # cycle doc: {x,y} one component; tree doc: 3-bnode chain together
    assert len(groups) == 2
    assert sorted(len(g) for g in groups) == [2, 3]


def test_plain_triples_pass_through(spark):
    rows = [("d", "@default", "http://s", "http://p", "iri", "http://o",
             None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = canonicalize_triples(df).collect()
    assert len(out) == 1 and out[0].subj == "http://s"


def test_reliable_checkpoint_used_when_dir_configured(spark, tmp_path):
    """With a checkpoint dir set, lineage cuts in canonicalize go through
    reliable checkpoints (survive executor loss) instead of
    executor-local blocks — and results are unchanged."""
    import os
    rows = (_doc_quads(CYCLE_DOC, "a", prefix="da") +
            _doc_quads(TREE_DOC, "c", prefix="dc"))
    df = spark.createDataFrame(rows, SCHEMA)
    expect = _lines(canonicalize_triples(df))
    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        got = _lines(canonicalize_triples(df))
        assert got == expect
        # reliable checkpoint data landed on (shared) storage
        walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
        assert walked, "no reliable checkpoint files written"
    finally:
        # unset so other tests keep using localCheckpoint (scala var
        # setter name contains '$', so go through getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))


def test_prefix_offsets_matches_cumsum(spark):
    """Distributed exclusive prefix sum == driver cumsum, any ordering,
    any partitioning (the primitive under the c14n renumber)."""
    from jsonld_spark.operators.canonicalize import prefix_offsets
    rows = [(f"k{i:03d}", (i * 7) % 13 + 1) for i in range(257)]
    expect = {}
    acc = 0
    for k, v in sorted(rows):
        expect[k] = acc
        acc += v
    df = spark.createDataFrame(rows, "k string, v long").repartition(9)
    got = {r.k: r._offset for r in
           prefix_offsets(df, ["k"], "v").collect()}
    assert got == expect
    # empty input
    empty = spark.createDataFrame([], "k string, v long")
    assert prefix_offsets(empty, ["k"], "v").count() == 0


@pytest.mark.parametrize("labels", ["component", "reference"])
def test_literal_starting_with_c14n_not_rewritten(spark, labels):
    """A literal whose TEXT begins with "_:c14n" must pass through both
    label modes untouched — only obj_kind='bnode' values carry labels.
    (The component-mode shift once rewrote such literals, and a
    non-numeric suffix like "_:c14n notes" cast to NULL.)"""
    rows = (_doc_quads(CYCLE_DOC, "a", prefix="da") +
            _doc_quads(CYCLE_DOC, "b", prefix="db"))
    rows += [
        ("a", "@default", "_:dax", "http://ex.org/note", "literal",
         "_:c14n7", "http://www.w3.org/2001/XMLSchema#string", None),
        ("b", "@default", "_:dbx", "http://ex.org/note", "literal",
         "_:c14n notes", "http://www.w3.org/2001/XMLSchema#string", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = canonicalize_triples(df, labels=labels)
    lits = {r.obj_value for r in
            out.where(F.col("obj_kind") == "literal").collect()}
    assert lits == {"_:c14n7", "_:c14n notes"}
    # and none of them became NULL
    assert out.where(F.col("obj_value").isNull()).count() == 0


def test_giant_component_raises_named_error(spark, monkeypatch):
    """Adversarial input: one bnode chain spanning the whole dataset —
    a single connected component the per-component kernel would have to
    canonicalize in one task. The streaming row-count guard must raise
    the typed, named error (not an opaque executor OOM), and it must
    fire for the fd-hash path too."""
    from jsonld_spark.operators import canonicalize as C
    monkeypatch.setattr(C, "MAX_COMPONENT_ROWS", 50)
    rows = [("d0", "@default", f"_:b{i}", "http://ex.org/p", "bnode",
             f"_:b{i+1}", None, None) for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(Exception, match="bnode component .* quads"):
        canonicalize_triples(df).collect()
    from jsonld_spark.operators.canonicalize import _canonicalize_reference
    with pytest.raises(Exception, match="bnode component .* quads"):
        _canonicalize_reference(df, max_iter=50).collect()


def test_recanonicalize_does_not_merge_c14n_labels(spark):
    """Review regression (confirmed by repro): input labels already in
    the _:c14n namespace were kept verbatim by rename_quads' parity
    guard while still being counted, so the global renumber merged
    them with another component's fresh labels. Distinct input bnodes
    must stay distinct."""
    from jsonld_spark.operators.canonicalize import canonicalize_triples
    rows = [
        ("d1", None, "_:b0", "http://p", "bnode", "_:c14n5", None, None),
        ("d2", None, "_:x1", "http://p", "bnode", "_:x2", None, None),
        ("d2", None, "_:x2", "http://p", "bnode", "_:x3", None, None),
        ("d2", None, "_:x3", "http://p", "bnode", "_:x4", None, None),
        ("d2", None, "_:x4", "http://p", "bnode", "_:x5", None, None),
        ("d2", None, "_:x5", "http://p", "bnode", "_:x6", None, None),
    ]
    t = spark.createDataFrame(
        rows, "doc_id string, graph string, subj string, pred string, "
              "obj_kind string, obj_value string, obj_datatype string, "
              "obj_lang string")
    out = canonicalize_triples(t).collect()
    labels = {r["subj"] for r in out} | {
        r["obj_value"] for r in out if r["obj_kind"] == "bnode"}
    # 8 distinct input bnodes -> 8 distinct canonical labels
    assert len(labels) == 8, sorted(labels)
    assert all(lab.startswith("_:c14n") for lab in labels)

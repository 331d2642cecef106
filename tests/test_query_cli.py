"""scripts/query_graph.py: SPARQL-over-materialized-graph CLI."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "scripts")

EX = "http://example.org/"


def _triples_parquet(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("d1", EX + "author", "alice"),
         ("d2", EX + "author", "bob"),
         ("d1", EX + "lang", "en")],
        "subj string, pred string, obj_value string"
    ).write.mode("overwrite").parquet(path)
    return path


def test_select_to_parquet(spark, tmp_path, capsys):
    import query_graph
    t = _triples_parquet(spark, tmp_path)
    out = str(tmp_path / "ans")
    rc = query_graph.main([
        "--triples", t, "--out", out,
        "--query", f"PREFIX ex: <{EX}> SELECT ?d WHERE "
                   "{ ?d ex:author 'alice' }"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["rows"] == 1
    assert [r.d for r in spark.read.parquet(out).collect()] == ["d1"]


def test_construct_then_query_user_story(spark, tmp_path, capsys):
    """The full documented flow: run_pipeline materializes the graph
    from interleaved docs, query_graph answers SPARQL text over it."""
    import query_graph
    import run_pipeline
    from jsonld_spark.sources.interleaved import interleaved_from_documents

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "kg")
    interleaved_from_documents(spark, "/root/testdata/sf0.001") \
        .write.parquet(inp)
    assert run_pipeline.main(["--input", inp, "--output", out,
                              "--n-buckets", "4",
                              "--run-id", "r1"]) == 0
    capsys.readouterr()
    rc = query_graph.main([
        "--graph", out, "--show", "3",
        "--query", """PREFIX s: <http://schema.org/>
            SELECT ?lang (COUNT(DISTINCT ?d) AS ?n)
            WHERE { ?d s:inLanguage ?lang }
            GROUP BY ?lang ORDER BY DESC(?n) ?lang"""])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    top = json.loads(lines[0])
    assert top["n"] > 0 and isinstance(top["lang"], str)
    assert json.loads(lines[-1])["rows_shown"] == 3


def test_ask_and_show(spark, tmp_path, capsys):
    import query_graph
    t = _triples_parquet(spark, tmp_path)
    rc = query_graph.main([
        "--triples", t,
        "--query", f"PREFIX ex: <{EX}> ASK {{ ?d ex:lang 'en' }}"])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["ask"] is True
    rc = query_graph.main([
        "--triples", t, "--show", "5",
        "--query", f"PREFIX ex: <{EX}> SELECT ?d ?a WHERE "
                   "{ ?d ex:author ?a } ORDER BY ?d"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["rows_shown"] == 2
    assert json.loads(lines[0]) == {"d": "d1", "a": "alice"}

"""Vectorized N-Quads serializer/parser stages (Arrow-batched).

Serialization needs the reference-exact escape rules
(RDFDatasetUtils.java:203-258) — codepoint-class escaping isn't
expressible with built-in SQL functions, so this is a pandas UDF
(Arrow batch transfer, never per-row Python)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.nquads import parse_nquads, quad_to_nquad
from ..core.rdf import Quad


@F.pandas_udf("string")
def nquad_line(graph: pd.Series, subj: pd.Series, pred: pd.Series,
               obj_kind: pd.Series, obj_value: pd.Series,
               obj_datatype: pd.Series, obj_lang: pd.Series) -> pd.Series:
    out = []
    for g, s, p, ok, ov, od, ol in zip(graph, subj, pred, obj_kind,
                                       obj_value, obj_datatype, obj_lang):
        q = Quad(g, s, p, ok, ov,
                 od if pd.notna(od) else None,
                 ol if (ol is not None and pd.notna(ol)) else None)
        # quad_to_nquad appends " ."; strip no newline handling needed
        out.append(quad_to_nquad(q))
    return pd.Series(out)


def triples_to_nquads(triples: DataFrame) -> DataFrame:
    """Add an ``nq`` column with the serialized N-Quads line."""
    return triples.withColumn(
        "nq", nquad_line("graph", "subj", "pred", "obj_kind", "obj_value",
                         "obj_datatype", "obj_lang"))


NQUAD_PARSED_SCHEMA = T.StructType([
    T.StructField("graph", T.StringType()),
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj_kind", T.StringType()),
    T.StructField("obj_value", T.StringType()),
    T.StructField("obj_datatype", T.StringType()),
    T.StructField("obj_lang", T.StringType()),
])


def nquads_lines_to_triples(lines: DataFrame, line_col: str = "nq") -> DataFrame:
    """Parse a DataFrame of N-Quads lines into quad columns
    (reference grammar RDFDatasetUtils.java:260-287), Arrow-batched."""

    def parse_batch(batches):
        for pdf in batches:
            rows = {f: [] for f in NQUAD_PARSED_SCHEMA.fieldNames()}
            for line in pdf[line_col]:
                for q in parse_nquads(line, dedupe=False):
                    rows["graph"].append(q.graph)
                    rows["subj"].append(q.subj)
                    rows["pred"].append(q.pred)
                    rows["obj_kind"].append(q.obj_kind)
                    rows["obj_value"].append(q.obj_value)
                    rows["obj_datatype"].append(q.obj_datatype)
                    rows["obj_lang"].append(q.obj_lang)
            yield pd.DataFrame(rows)

    return lines.select(line_col).mapInPandas(parse_batch, NQUAD_PARSED_SCHEMA)


def read_nquads(spark, path: str) -> DataFrame:
    """N-Quads file scan (S4): text files → quad columns. Each line
    parses independently (N-Quads is line-delimited), so the scan
    parallelizes over file splits; dataset-level dedup mirrors
    ``RDFDatasetUtils.parseNQuads`` (:362-368)."""
    lines = spark.read.text(path).withColumnRenamed("value", "nq") \
        .where(F.length(F.trim("nq")) > 0) \
        .where(~F.trim("nq").startswith("#"))
    return nquads_lines_to_triples(lines).dropDuplicates(
        ["graph", "subj", "pred", "obj_kind", "obj_value", "obj_datatype",
         "obj_lang"])


def write_nquads(triples: DataFrame, path: str, mode: str = "error") -> None:
    """N-Quads sink (S5): quad columns → text files of serialized lines.
    One output file per partition; for a single globally-sorted file
    (the reference's ``toNQuads`` contract) coalesce(1) + sortWithin —
    only sensible for small exports."""
    triples_to_nquads(triples).select("nq").write.mode(mode).text(path)

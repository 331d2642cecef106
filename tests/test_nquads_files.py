"""N-Quads file source/sink (S4/S5 at the file level): write a triples
DataFrame to text files, scan it back, byte-exact quad columns."""

from __future__ import annotations

from jsonld_spark.operators.pipeline import docs_to_triples
from jsonld_spark.sources.interleaved import interleaved_from_documents

from .conftest import SF_SMALL

QCOLS = ["graph", "subj", "pred", "obj_kind", "obj_value", "obj_datatype",
         "obj_lang"]


def test_nquads_file_roundtrip(spark, tmp_path):
    # import needs an active session (module-level pandas_udf)
    from jsonld_spark.functions.nquads_udf import read_nquads, write_nquads
    triples = docs_to_triples(interleaved_from_documents(spark, SF_SMALL))
    out = str(tmp_path / "nq")
    write_nquads(triples, out)
    back = read_nquads(spark, out)
    a = sorted(tuple(r) for r in triples.select(*QCOLS).collect())
    b = sorted(tuple(r) for r in back.select(*QCOLS).collect())
    assert a == b


def test_read_nquads_skips_comments_and_blanks(spark, tmp_path):
    from jsonld_spark.functions.nquads_udf import read_nquads
    p = tmp_path / "f.nq"
    p.write_text('# comment\n\n<http://s> <http://p> "v" .\n'
                 '<http://s> <http://p> "v" .\n')  # duplicate line
    got = read_nquads(spark, str(p)).collect()
    assert len(got) == 1  # dedup per RDFDatasetUtils.parseNQuads
    assert got[0].subj == "http://s" and got[0].obj_value == "v"

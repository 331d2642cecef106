"""PII redaction and boilerplate removal semantics."""

from __future__ import annotations

from jsonld_spark.operators.textstats import redact_pii, strip_boilerplate


def test_redact_pii_classes_and_counts(spark):
    docs = spark.createDataFrame([
        (1, "mail bob@example.com and alice@test.org now"),
        (2, "server 10.0.0.1 port"),
        (3, "acct 123456789012 ref 42"),   # long digit run, short one kept
        (4, "clean text only"),
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].n_email == 2 and "[EMAIL]" in got[1].redacted
    assert "bob@example.com" not in got[1].redacted
    assert got[2].n_ipv4 == 1 and "[IPV4]" in got[2].redacted
    assert got[3].n_number == 1
    assert "42" in got[3].redacted  # short numbers survive
    assert got[4].redacted == "clean text only"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_number) == (0, 0, 0)


def test_strip_boilerplate_drops_shared_lines_keeps_order(spark):
    chrome = "accept our cookies please"
    rows = [(i, f"{chrome}\nunique body {i}\nsecond line {i}")
            for i in range(12)]
    rows.append((99, "standalone doc\nwith no chrome"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           strip_boilerplate(docs, max_docs=10).collect()}
    # the chrome line appears in 12 docs > 10 → stripped everywhere
    assert got[0].clean_text == "unique body 0\nsecond line 0"
    assert got[0].n_lines_kept == 2
    assert got[99].clean_text == "standalone doc\nwith no chrome"
    # under the threshold nothing is stripped
    got2 = {r.doc_id: r for r in
            strip_boilerplate(docs, max_docs=20).collect()}
    assert got2[0].n_lines_kept == 3

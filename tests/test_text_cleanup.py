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


def test_doc_repetition_hand_computed(spark):
    from jsonld_spark.operators.textstats import doc_repetition
    docs = spark.createDataFrame(
        [(1, "a a a b"),                      # 4 words, 2 distinct; top=3/4
         (2, "x y\nx y\nz w")],               # 3 lines, 2 distinct
        "doc_id long, text string")
    got = {r.doc_id: r for r in doc_repetition(docs).collect()}
    assert abs(got[1].dup_word_frac - 0.5) < 1e-9
    assert abs(got[1].top_word_frac - 0.75) < 1e-9
    assert abs(got[1].dup_line_frac - 0.0) < 1e-9
    assert abs(got[2].dup_line_frac - (1 - 2 / 3)) < 1e-9
    assert abs(got[2].dup_word_frac - 0.0) < 1e-9

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
    # whitespace-run tokenization (review fix): the word stream is
    # [x y x y z w] -> 4 distinct of 6, not the newline-fused 4-of-4
    assert abs(got[2].dup_word_frac - (1 - 4 / 6)) < 1e-9


def test_quality_score_empty_text_no_crash(spark):
    """Review regression: an empty document must score (clean term 0),
    not throw ANSI DIVIDE_BY_ZERO and kill the job."""
    from jsonld_spark.operators.textstats import quality_score
    docs = spark.createDataFrame(
        [("d1", ""), ("d2", "the quick brown fox and the lazy dog "
                            "of the farm again and again" * 3)],
        "doc_id string, text string")
    rows = {r["doc_id"]: r["quality"] for r in
            quality_score(docs).collect()}
    assert rows["d1"] == 0.0
    assert rows["d2"] > 0.3


def test_strip_boilerplate_keeps_all_boilerplate_docs(spark):
    """Review regression: a doc whose EVERY line is boilerplate comes
    back with empty clean_text instead of vanishing."""
    from jsonld_spark.operators.textstats import strip_boilerplate
    chrome = "cookie banner accept all cookies now"
    rows = [(f"d{i}", chrome + "\ncontent line for doc %d" % i)
            for i in range(12)]
    rows.append(("dd", chrome))  # only the chrome line
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
           for r in strip_boilerplate(docs, max_docs=10).collect()}
    assert len(out) == 13
    assert out["dd"] == ("", 0)
    assert out["d3"][1] == 1 and "content line" in out["d3"][0]


def test_doc_repetition_multiline_and_null(spark):
    """Review regressions: words tokenize on whitespace runs (newlines
    fused words before), and a null-text doc keeps its row."""
    from jsonld_spark.operators.textstats import doc_repetition
    docs = spark.createDataFrame(
        [("d1", "buy now\nbuy now\nbuy now"), ("d2", None)],
        "doc_id string, text string")
    rows = {r["doc_id"]: r for r in doc_repetition(docs).collect()}
    assert len(rows) == 2
    assert abs(rows["d1"]["dup_word_frac"] - (1 - 2 / 6)) < 1e-6
    assert abs(rows["d1"]["top_word_frac"] - 0.5) < 1e-6

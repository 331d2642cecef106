"""Deterministic sampling: reproducibility, nesting, stratification,
and the composed curation funnel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonld_spark.operators.sampling import (curate_corpus, hash_sample,
                                             stratified_hash_sample)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_hash_sample_deterministic_and_nested(spark):
    docs = _docs(spark)
    a1 = {r.doc_id for r in hash_sample(docs, 0.3).select("doc_id").collect()}
    a2 = {r.doc_id for r in
          hash_sample(docs.repartition(7), 0.3).select("doc_id").collect()}
    assert a1 == a2  # partitioning-independent
    small = {r.doc_id for r in
             hash_sample(docs, 0.1).select("doc_id").collect()}
    assert small <= a1  # nested: smaller fraction is a strict subset
    other_salt = {r.doc_id for r in
                  hash_sample(docs, 0.3, salt="s1")
                  .select("doc_id").collect()}
    assert other_salt != a1  # independent draw
    n = docs.count()
    assert abs(len(a1) / n - 0.3) < 0.1  # roughly the asked fraction

    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5)


def test_stratified_sample_respects_per_stratum_fractions(spark):
    from jsonld_spark.operators.textstats import lang_id
    docs = _docs(spark)
    df = docs.join(lang_id(docs).select("doc_id", "lang_pred"), "doc_id")
    kept = stratified_hash_sample(df, {"en": 1.0}, "lang_pred",
                                  default_fraction=0.0)
    langs = {r.lang_pred for r in kept.select("lang_pred").collect()}
    assert langs == {"en"}  # full en, everything else dropped
    n_en = df.where(F.col("lang_pred") == "en").count()
    assert kept.count() == n_en


def test_curate_corpus_funnel_properties(spark):
    docs = _docs(spark)
    out = curate_corpus(docs, min_quality=0.3,
                        lang_fractions=None).persist()
    try:
        rows = out.collect()
        assert len(rows) > 0
        assert all(r.quality >= 0.3 for r in rows)
        # kept ids are unique and drawn from the corpus
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids))
        # exact duplicates by normalized fingerprint are gone
        from jsonld_spark.operators.textstats import fingerprint
        kept_fp = (docs.join(out.select("doc_id"), "doc_id")
                   .transform(fingerprint))
        assert kept_fp.count() == kept_fp.select("fp").distinct().count()
    finally:
        out.unpersist()


def test_lang_id_null_text_is_und(spark):
    """NULL text → lang_pred 'und' with NULL scores, matching the SQL
    oracle's NULL-probe semantics on both sides."""
    from jsonld_spark.operators.textstats import lang_id
    docs = spark.createDataFrame([(1, None), (2, "the cat and the dog")],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in lang_id(docs).collect()}
    assert got[1].lang_pred == "und" and got[1].score_en is None
    assert got[2].lang_pred == "en" and got[2].score_en > 0

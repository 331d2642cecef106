"""Text-analysis operators for training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen — no Python
in the hot path): language-ID by stopword-hit heuristic, quality
scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword probes; counted by substring occurrences
LANG_PROBES = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}


def occurrences(col: Column, needle: str) -> Column:
    """Count of non-overlapping substring occurrences — expressible in
    any SQL dialect as (len(x) - len(replace(x, n, ''))) / len(n)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))).cast("long")


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: char count, whitespace-token count,
    mean token length, uppercase ratio proxy."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(t, " "))
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(F.length(F.replace(t, F.lit(" "), F.lit(""))) /
                n_tokens, 4).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-probe hit counts, 'und'
    (undetermined) when all probes miss. Deterministic tie-break by
    language code order."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {lang: sum((occurrences(t, p) for p in probes), F.lit(0).cast("long"))
              for lang, probes in LANG_PROBES.items()}
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_PROBES, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score == 0, F.lit("und")).otherwise(pred)
    sel = [F.col("doc_id"), pred.alias("lang_pred")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_PROBES)]
    return docs.select(*sel)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized lowercase MD5 fingerprint — the exact-dedup
    key that survives formatting noise."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))

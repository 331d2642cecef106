"""Generate the expected token_count_vocab parquet for the CORRECTNESS
oracle — WITHOUT Spark.

DuckDB cannot replay BPE merges, so the oracle for ``token_count_vocab``
is a landed expectation: this script reads the sf0.01 documents via
DuckDB, trains the merge table and encodes every document with the
pure-Python kernels in ``jsonld_spark.functions.bpe`` (word counting
included — no Spark regex, no Spark aggregation anywhere), and writes
``tests/data/token_count_vocab_sf001.parquet``. The driver's oracle SQL
is then a plain SELECT from that file, so a green row certifies the
distributed path (Spark word count → driver merge loop → Arrow-batched
encode) against a fully independent single-process execution of the
same public algorithm.

Rerun after changing NUM_MERGES, the pre-tokenization pattern, or the
merge tie-breaks:  python scripts/gen_bpe_expected.py
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jsonld_spark.functions.bpe import (bpe_train, encode_text_len,
                                        pretokenize)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "token_count_vocab_sf001.parquet")
NUM_MERGES = 200
MAX_WORDS = 1_000_000


def main() -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"ORDER BY doc_id").fetchall()
    freq: dict[str, int] = {}
    for _, text in rows:
        if text is None:
            continue
        for w in pretokenize(text):
            freq[w] = freq.get(w, 0) + 1
    assert len(freq) < MAX_WORDS, (
        f"{len(freq)} distinct words >= MAX_WORDS cap {MAX_WORDS}: the "
        f"capped Spark training set would diverge from this uncapped one")
    merges = bpe_train(freq, NUM_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}
    out = [(doc_id, None if text is None
            else encode_text_len(text, ranks, cache))
           for doc_id, text in rows]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_vocab_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", out)
    con.execute(f"COPY t TO '{os.path.abspath(OUT)}' (FORMAT PARQUET)")
    print(f"wrote {len(out)} rows, {len(merges)} merges -> {OUT}")


if __name__ == "__main__":
    main()

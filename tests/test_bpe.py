"""BPE tokenizer: pure-core kernel semantics + Spark-vs-pure parity."""

from __future__ import annotations

from jsonld_spark.functions.bpe import (EOW, bpe_encode, bpe_train,
                                        encode_text_len, pretokenize)


def test_bpe_train_classic_example():
    """Sennrich's worked example: with {'low','lower','newest','widest'}
    frequencies, the first merges pick the most frequent pairs — 'es'
    then 'est' then 'est</w>' (ties broken lexicographically)."""
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(freq, 4)
    assert merges[0] == ("e", "s")          # 6+3=9 occurrences
    assert merges[1] == ("es", "t")         # still 9
    assert merges[2] == ("est", EOW)        # 9, word-final
    assert merges[3] == ("l", "o")          # 5+2=7


def test_bpe_encode_replays_training():
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(freq, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word encodes to few symbols; an unseen word falls back
    # to chars + whatever merges apply
    assert len(bpe_encode("newest", ranks)) <= 2
    assert bpe_encode("xyz", ranks) == ["x", "y", "z", EOW]


def test_encode_text_len_counts_and_caches():
    freq = {"ab": 10}
    merges = bpe_train(freq, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}
    # "ab ab ab" = 3 words, each fully merged to 1 symbol
    assert encode_text_len("ab ab ab", ranks, cache) == 3
    assert cache == {"ab": 1}
    assert pretokenize("Ab, ab!") == ["ab", ",", "ab", "!"]


def test_spark_token_count_vocab_matches_pure_python(spark):
    """The distributed path (Spark word count → driver merge loop →
    Arrow-batched encode) must equal a single-process pure-Python run
    of the same algorithm on the same texts."""
    from jsonld_spark.operators.textstats import (token_count_vocab,
                                                  train_bpe)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker browner foxes jump over lazier dogs",
        "pack my box with five dozen liquor jugs, quickly!",
        "sphinx of black quartz judge my vow",
        "the the the quick quick brown",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    merges = train_bpe(docs, num_merges=50)
    got = {r.doc_id: r.n_vocab_tokens
           for r in token_count_vocab(docs, merges).collect()}

    freq: dict[str, int] = {}
    for t in texts:
        for w in pretokenize(t):
            freq[w] = freq.get(w, 0) + 1
    want_merges = bpe_train(freq, 50)
    assert [tuple(m) for m in merges] == want_merges
    ranks = {p: i for i, p in enumerate(want_merges)}
    want = {i: encode_text_len(t, ranks) for i, t in enumerate(texts)}
    assert got == want

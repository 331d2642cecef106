"""Byte-pair-encoding tokenizer: pure-Python train/encode kernels.

Classic Sennrich-style BPE (Neural Machine Translation of Rare Words
with Subword Units, ACL 2016 — public algorithm): words are symbol
sequences (unicode chars + a word-final ``</w>`` marker); training
repeatedly merges the most frequent adjacent symbol pair over a word-
frequency table; encoding replays the merges by rank. Everything here
is deterministic — ties on pair count break by lexicographically
smallest pair — so the same corpus always yields the same vocabulary
on any engine.

Scale split (used by ``operators.textstats.train_bpe``): the corpus
scan (word counting) is the 100 TB part and runs distributed; the
merge loop runs driver-side on the compact word-frequency table (top
``max_words`` words — exactly how production tokenizer trainers work,
since the merge recurrence is inherently sequential but its input is
tiny)."""

from __future__ import annotations

import re

# the SAME pattern string as textstats.BPE_ISH_PATTERN (kept literal
# here to avoid an operators→functions→operators import cycle): letter
# runs, digit runs, punctuation runs; whitespace separates words. Input
# is lowercased first, so A-Z matching is inert but keeps the Spark
# (Java regex) and Python pre-tokenizations byte-identical. Whitespace
# is the explicit ASCII class: Python \s is Unicode-aware while Java's
# is not, so \s here would tokenize U+00A0 etc. differently per engine.
WORD_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f\x0B]+")

EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    """Lowercased word pre-tokenization shared by train and encode."""
    return WORD_RE.findall(text.lower())


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_vocab(vocab: dict[tuple[str, ...], int],
                 pair: tuple[str, str]) -> dict:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, n in vocab.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def bpe_train(word_freq: dict[str, int],
              num_merges: int) -> list[tuple[str, str]]:
    """Merge table from a word-frequency dict. Deterministic: each step
    picks the (count DESC, pair ASC) best pair; stops early when no
    adjacent pair remains."""
    vocab = {tuple(w) + (EOW,): n for w, n in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-tokenized word by replaying merges in rank order
    (always the lowest-rank pair present merges next — the standard
    replay that reproduces training exactly)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = [(ranks[(a, b)], i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))
                 if (a, b) in ranks]
        if not pairs:
            break
        _, j = min(pairs)
        a, b = syms[j], syms[j + 1]
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def encode_text_len(text: str, ranks: dict[tuple[str, str], int],
                    cache: dict[str, int] | None = None) -> int:
    """Token count of a text = Σ encoded lengths of its words. ``cache``
    memoizes per distinct word — corpora repeat words heavily, so the
    per-batch cache turns the merge replay into a dict lookup."""
    if cache is None:
        cache = {}
    total = 0
    for w in pretokenize(text):
        n = cache.get(w)
        if n is None:
            n = len(bpe_encode(w, ranks))
            cache[w] = n
        total += n
    return total

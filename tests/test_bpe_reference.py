"""Reference-implementation parity for the BPE training loop: the
Spark fold/argmax formulation must reproduce a pure-Python Sennrich
(2016) BPE trainer exactly — merges, counts, AND the encoded vocab —
on randomized corpora (where hand fixtures would miss tie-break and
merge-interaction edge cases)."""

from __future__ import annotations

import os
import tempfile

import pytest


def _reference_bpe(word_freq: dict[str, int], rounds: int):
    """Plain-Python Sennrich trainer: returns (merges, final_vocab)
    with merges as [(round, a, b, count)] and final_vocab word →
    symbol tuple.  Greedy left-to-right non-overlapping merge, ties
    broken by (count desc, a asc, b asc)."""
    vocab = {w: tuple(w) for w in word_freq}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, a, b, n))
        merged = a + b
        new_vocab = {}
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bpe_train_matches_reference(spark, seed):
    import numpy as np

    from mediawiki_to_notion_spark.operators.text_analysis import (
        BPE_TRAIN_ROUNDS,
        _bpe_train,
    )

    rng = np.random.default_rng(seed)
    # skewed random corpus over a small alphabet: forces repeated
    # merges, ties, and merged-symbol re-pairing across rounds
    alphabet = "abcd"
    words = [
        "".join(rng.choice(list(alphabet), size=rng.integers(1, 9)))
        for _ in range(120)
    ]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 20)))
        for _ in range(40)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        merges, vocab_df = _bpe_train(spark, tmp)
        got_vocab = {
            r.word: tuple(r.l) for r in vocab_df.collect()
        }

    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    want_merges, want_vocab = _reference_bpe(freq, BPE_TRAIN_ROUNDS)
    assert merges == want_merges
    assert got_vocab == {w: s for w, s in want_vocab.items()}

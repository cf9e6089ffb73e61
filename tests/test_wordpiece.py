"""WordPiece + unigram-LM tokenizer tests: longest-match property,
losslessness, Viterbi optimality vs brute force, EM sanity."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.wordpiece import (
    UNK,
    _make_viterbi_encoder,
    _make_wp_encoder,
    train_unigram_py,
    train_wordpiece_py,
    unigram_encode,
    unigram_train,
    wordpiece_encode,
    wordpiece_train,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- WordPiece --------------------------------------------------------------


def test_wordpiece_training_deterministic_and_scored():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    v1 = train_wordpiece_py(wc, vocab_size=40)
    v2 = train_wordpiece_py(wc, vocab_size=40)
    assert v1 == v2
    assert v1[0] == UNK
    # base symbols present: word-initial chars bare, continuations ##'d
    assert "l" in v1 and "##o" in v1 and "##w" in v1
    # merges happened (some multi-char token exists)
    assert any(len(t.lstrip("#")) > 1 for t in v1 if t != UNK)


def test_wordpiece_longest_match_property(spark, docs):
    """Every emitted token must be the longest vocab piece at its
    position — checked by re-deriving each step greedily."""
    vocab = wordpiece_train(docs, vocab_size=300, max_words=2000)
    vset = set(vocab)
    out = wordpiece_encode(docs.limit(30), "doc_id", "text", vocab).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(30).collect()}
    enc = _make_wp_encoder(vset)
    import re

    ws = re.compile(r"\s+", re.ASCII)
    for r in out:
        assert r["n_tokens"] == len(r["tokens"])
        assert r["n_unk"] == sum(1 for t in r["tokens"] if t == UNK)
        # per-word reconstruction: concat(strip ##) == word unless UNK
        words = [w for w in ws.split(texts[r["doc_id"]].strip().lower()) if w]
        flat = []
        for w in words:
            flat.extend(enc(w))
        assert flat == r["tokens"]
        for w in words:
            pieces = enc(w)
            if UNK not in pieces:
                assert "".join(p.lstrip("#") for p in pieces) == w
                # greedy longest-match: at each step no LONGER prefix
                # of the remaining word is in the vocab
                pos = 0
                for p in pieces:
                    raw = p[2:] if p.startswith("##") else p
                    for longer in range(len(raw) + 1, len(w) - pos + 1):
                        cand = w[pos : pos + longer]
                        if pos > 0:
                            cand = "##" + cand
                        assert cand not in vset
                    pos += len(raw)


def test_wordpiece_unk_on_unseen_chars():
    vocab = train_wordpiece_py([("abc", 3)], vocab_size=20)
    enc = _make_wp_encoder(set(vocab))
    assert enc("abz") == [UNK]
    assert enc("abc") != [UNK]


# --- Unigram LM -------------------------------------------------------------


def test_unigram_probs_normalized_and_chars_kept():
    wc = [("aba", 4), ("abc", 2), ("cab", 1)]
    probs = train_unigram_py(wc, vocab_size=6, max_piece_len=3)
    assert sum(probs.values()) == pytest.approx(1.0, abs=1e-9)
    for ch in "abc":
        assert ch in probs  # single chars never pruned


def test_viterbi_matches_bruteforce():
    """Viterbi best path must equal exhaustive max-probability
    segmentation for every short word."""
    wc = [("banana", 3), ("bandana", 2), ("nab", 5)]
    probs = train_unigram_py(wc, vocab_size=10, max_piece_len=4)
    enc = _make_viterbi_encoder(probs, 4)

    def brute(word):
        best, best_key = None, None
        n = len(word)
        for cuts in range(1 << (n - 1)):
            pieces, start = [], 0
            for i in range(1, n):
                if cuts & (1 << (i - 1)):
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            if any(p not in probs for p in pieces):
                continue
            score = sum(math.log(probs[p]) for p in pieces)
            key = (round(score, 12), -len(pieces))
            if best_key is None or key > best_key:
                best, best_key = pieces, key
        return best

    for w in ["banana", "bandana", "nab", "ban", "ana"]:
        want = brute(w)
        got = enc(w)
        if want is None:
            assert got == [UNK]
        else:
            assert sum(math.log(probs[p]) for p in got) == pytest.approx(
                sum(math.log(probs[p]) for p in want), abs=1e-9
            )
            assert "".join(got) == w


def test_unigram_encode_corpus(spark, docs):
    probs = unigram_train(
        docs, vocab_size=400, max_words=1500, max_piece_len=6
    )
    out = unigram_encode(
        docs.limit(25), "doc_id", "text", probs, max_piece_len=6
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(25).collect()}
    import re

    ws = re.compile(r"\s+", re.ASCII)
    for r in out:
        assert r["n_tokens"] == len(r["tokens"])
        assert r["logprob"] < 0  # every piece has prob < 1
        words = [w for w in ws.split(texts[r["doc_id"]].strip().lower()) if w]
        # lossless unless UNK: tokens concat back to the word stream
        if UNK not in r["tokens"]:
            assert "".join(r["tokens"]) == "".join(words)


def test_unigram_em_improves_likelihood():
    """More EM shrink rounds must not decrease the corpus likelihood of
    the kept vocabulary relative to a chars-only model."""
    wc = [("sharding", 4), ("shard", 6), ("harding", 2), ("ding", 3)]
    probs = train_unigram_py(wc, vocab_size=30, max_piece_len=5)
    enc = _make_viterbi_encoder(probs, 5)
    chars_only = {p: v for p, v in probs.items() if len(p) == 1}
    s = sum(chars_only.values())
    chars_only = {p: v / s for p, v in chars_only.items()}
    enc_chars = _make_viterbi_encoder(chars_only, 1)

    def ll(enc_fn, table):
        total = 0.0
        for w, c in wc:
            pieces = enc_fn(w)
            total += c * sum(math.log(table[p]) for p in pieces)
        return total

    assert ll(enc, probs) >= ll(enc_chars, chars_only)

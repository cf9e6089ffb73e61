"""WordPiece and unigram-LM subword tokenizers.

Completes the subword family next to BPE (`operators/bpe.py`): the
three schemes behind virtually every production LLM tokenizer —

* **WordPiece** (Schuster & Nakajima, ICASSP 2012; BERT): merge-based
  like BPE but the merge criterion is the likelihood ratio
  ``count(ab) / (count(a)·count(b))`` instead of raw pair frequency,
  and continuation symbols carry a ``##`` prefix. Encoding is greedy
  longest-match-first with ``[UNK]`` fallback per word.
* **Unigram LM** (Kudo, ACL 2018; SentencePiece): a probabilistic
  piece vocabulary fit by EM — the E-step computes each piece's
  expected count over ALL segmentations of each word
  (forward–backward), the M-step re-normalizes, and the vocabulary is
  pruned to size by dropping the lowest-probability pieces. Encoding
  is Viterbi (max-probability segmentation).

Scale shape (identical to ``bpe_train``): the ONLY corpus-scale work
is one word-count aggregate + exact bounded top-k; training loops run
on the driver over the ≤``max_words`` word vocabulary (microscopic
next to a corpus pass, and driver-bounded by construction). Encoding
broadcasts the vocab inside the closure and runs Arrow-batched with a
per-batch word cache — the documented Pandas-UDF slow path, kept off
every other operator's hot path.

No reference twin: the reference tokenizes against a fixed BEHRT code
vocabulary (`model/behrt_train.py`); subword induction is LLM-corpus
surface.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.functions.schema_utils import (
    id_field as _id_field,
)

from mimic_iv_data_pipeline_spark.operators.text import tokens

__all__ = [
    "train_wordpiece_py",
    "wordpiece_train",
    "wordpiece_encode",
    "train_unigram_py",
    "unigram_train",
    "unigram_encode",
]

UNK = "[UNK]"
_WS = re.compile(r"\s+", re.ASCII)


def _word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """One corpus aggregate + exact bounded top-k (count desc, word asc)."""
    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("word"))
        .limit(max_words)  # TakeOrderedAndProject — no global sort
        .collect()
    )
    return [(r.word, r.c) for r in wc]


# --------------------------------------------------------------------------
# WordPiece
# --------------------------------------------------------------------------


def train_wordpiece_py(
    word_counts: list[tuple[str, int]], vocab_size: int
) -> list[str]:
    """WordPiece vocabulary induction over ``(word, count)`` pairs.

    Symbols: word-initial pieces bare, continuations ``##``-prefixed.
    Each round merges the pair maximizing ``count(ab)/(count(a)·count(b))``
    (ties: higher raw pair count, then lexicographic — deterministic).
    Returns the vocabulary as a list: ``[UNK]``, base symbols
    (sorted), then merged tokens in merge order, truncated/stopped at
    ``vocab_size``.
    """
    segs: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if not w:
            continue
        syms = (w[0],) + tuple("##" + ch for ch in w[1:])
        segs[syms] = segs.get(syms, 0) + c

    base = sorted({s for syms in segs for s in syms})
    vocab = [UNK] + base
    merged_tokens: list[str] = []

    def join(a: str, b: str) -> str:
        return a + (b[2:] if b.startswith("##") else b)

    while len(vocab) + len(merged_tokens) < vocab_size:
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in segs.items():
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + c
        if not pair_counts:
            break
        best = min(
            pair_counts.items(),
            key=lambda kv: (
                -(kv[1] / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]])),
                -kv[1],
                kv[0],  # lexicographically smallest pair wins ties
            ),
        )[0]
        new_tok = join(*best)
        merged_tokens.append(new_tok)
        new_segs: dict[tuple[str, ...], int] = {}
        for syms, c in segs.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_segs[key] = new_segs.get(key, 0) + c
        segs = new_segs
    return (vocab + merged_tokens)[:vocab_size]


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_words: int = 50_000,
) -> list[str]:
    return train_wordpiece_py(_word_counts(df, text_col, max_words), vocab_size)


def _make_wp_encoder(vocab: set[str], max_chars: int = 200):
    """Greedy longest-match-first word encoder (BERT's algorithm):
    repeatedly take the longest vocab prefix (continuations tried with
    ``##``); any dead end collapses the WHOLE word to ``[UNK]``.
    Nested closure → pickled by value (see bpe._make_word_encoder)."""
    unk = UNK

    def encode_word(word: str) -> list[str]:
        if len(word) > max_chars:
            return [unk]
        out: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return [unk]
            out.append(cur)
            start = end
        return out

    return encode_word


def wordpiece_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
) -> DataFrame:
    """Tokenize with a trained WordPiece vocabulary.

    Returns ``(id, tokens array<string>, n_tokens long, n_unk long)``.
    Lossless for words without ``[UNK]``: stripping ``##`` and
    concatenating restores the word (property-tested).
    """
    vset = set(vocab)
    raw_encoder = _make_wp_encoder(vset)
    ws = _WS
    out_schema = f"{_id_field(df, id_col)}, tokens array<string>, n_tokens long, n_unk long"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = raw_encoder(w)
            return got

        for pdf in batches:
            if pdf.empty:
                continue
            toks, n_unk = [], []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in ws.split((text or "").strip(" \t\n\r\f\x0b").lower()):
                    if w:
                        doc.extend(enc_word(w))
                toks.append(doc)
                n_unk.append(sum(1 for t in doc if t == UNK))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                    "n_unk": n_unk,
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)


# --------------------------------------------------------------------------
# Unigram LM
# --------------------------------------------------------------------------


def _seed_vocab(
    word_counts: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Seed pieces: all substrings up to ``max_piece_len`` scored by
    occurrence count × length (the SentencePiece seed heuristic), kept
    to the top ``seed_size`` plus every single character (so any word
    stays segmentable)."""
    counts: dict[str, int] = {}
    for w, c in word_counts:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p] * len(p), p),
    )[: max(0, seed_size - len(chars))]
    keep = chars | set(multi)
    total = sum(counts[p] for p in keep)
    return {p: counts[p] / total for p in keep}


def _forward_backward(
    word: str, probs: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """One word's marginal likelihood and per-piece expected counts
    under the unigram model (standard lattice forward–backward in the
    log/real domain; word lengths are bounded so reals suffice)."""
    n = len(word)
    fwd = [0.0] * (n + 1)
    fwd[0] = 1.0
    for j in range(1, n + 1):
        acc = 0.0
        for i in range(max(0, j - max_len), j):
            p = probs.get(word[i:j])
            if p:
                acc += fwd[i] * p
        fwd[j] = acc
    if fwd[n] == 0.0:
        return 0.0, {}
    bwd = [0.0] * (n + 1)
    bwd[n] = 1.0
    for i in range(n - 1, -1, -1):
        acc = 0.0
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = probs.get(word[i:j])
            if p:
                acc += p * bwd[j]
        bwd[i] = acc
    z = fwd[n]
    exp: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = probs.get(word[i:j])
            if p:
                gamma = fwd[i] * p * bwd[j] / z
                if gamma > 0:
                    piece = word[i:j]
                    exp[piece] = exp.get(piece, 0.0) + gamma
    return z, exp


def train_unigram_py(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    char_smooth: float = 0.01,
) -> dict[str, float]:
    """Unigram-LM vocabulary fit (Kudo 2018 §3.2, simplified shrink
    loop): seed → repeat [EM ×``em_iters``, prune the lowest-prob
    ``prune_frac`` of multi-char pieces] until ≤ ``vocab_size`` pieces.
    Single characters are never pruned and their expected counts get an
    additive ``char_smooth`` floor: plain MLE-EM is degenerate here —
    on a memorizable corpus it drives every non-whole-word piece to
    EXACTLY zero (verified on toy input), which would make unseen words
    unsegmentable; the floor keeps the char fallback alive, the same
    role SentencePiece's Bayesianized M-step plays. Returns piece →
    probability (sums to 1). Deterministic.
    """
    probs = _seed_vocab(word_counts, max_piece_len, seed_size)

    def em_round(probs: dict[str, float]) -> dict[str, float]:
        exp_total: dict[str, float] = {}
        for w, c in word_counts:
            z, exp = _forward_backward(w, probs, max_piece_len)
            if z <= 0.0:
                continue
            for piece, e in exp.items():
                exp_total[piece] = exp_total.get(piece, 0.0) + c * e
        for p in probs:
            if len(p) == 1:  # char fallback never starves
                exp_total[p] = exp_total.get(p, 0.0) + char_smooth
        s = sum(exp_total.values())
        if s == 0.0:
            return probs
        return {p: e / s for p, e in exp_total.items() if e > 0.0}

    while True:
        for _ in range(em_iters):
            probs = em_round(probs)
        multi = [p for p in probs if len(p) > 1]
        if len(probs) <= vocab_size or not multi:
            break
        n_drop = max(1, int(len(multi) * prune_frac))
        if len(probs) - n_drop < vocab_size:
            n_drop = len(probs) - vocab_size
        drop = set(
            sorted(multi, key=lambda p: (probs[p], p))[:n_drop]
        )
        kept = {p: v for p, v in probs.items() if p not in drop}
        s = sum(kept.values())
        probs = {p: v / s for p, v in kept.items()}
    return probs


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_words: int = 50_000,
    **kwargs,
) -> dict[str, float]:
    return train_unigram_py(
        _word_counts(df, text_col, max_words), vocab_size=vocab_size, **kwargs
    )


def _make_viterbi_encoder(probs: dict[str, float], max_len: int):
    """Max-probability segmentation (Viterbi over the piece lattice).
    Ties break to the FEWER-pieces path, then lexicographically by the
    piece ending at the boundary — deterministic. Unsegmentable words
    (characters outside the vocab) yield ``[UNK]``."""
    unk = UNK
    logp = {p: math.log(v) for p, v in probs.items() if v > 0}

    def encode_word(word: str) -> list[str]:
        n = len(word)
        NEG = float("-inf")
        # (score, -n_pieces) maximized; back[j] = best piece ending at j
        best = [NEG] * (n + 1)
        pieces = [0] * (n + 1)
        back: list[str | None] = [None] * (n + 1)
        best[0] = 0.0
        for j in range(1, n + 1):
            for i in range(max(0, j - max_len), j):
                if best[i] == NEG:
                    continue
                piece = word[i:j]
                lp = logp.get(piece)
                if lp is None:
                    continue
                cand = best[i] + lp
                key = (cand, -(pieces[i] + 1))
                cur = (best[j], -pieces[j]) if back[j] is not None else (NEG, 0)
                if back[j] is None or key > cur or (
                    key == cur and piece < back[j]
                ):
                    best[j], pieces[j], back[j] = cand, pieces[i] + 1, piece
        if back[n] is None:
            return [unk]
        out: list[str] = []
        j = n
        while j > 0:
            piece = back[j]
            out.append(piece)
            j -= len(piece)
        return out[::-1]

    return encode_word


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    probs: dict[str, float],
    max_piece_len: int = 8,
    unk_logprob: float | None = None,
) -> DataFrame:
    """Viterbi tokenization with a trained unigram vocabulary.

    Returns ``(id, tokens array<string>, n_tokens long, logprob
    double)`` where ``logprob`` is the document's total best-path
    log-probability (the LM score — usable directly for
    perplexity-style quality filtering). An ``[UNK]`` piece
    (unsegmentable word) scores ``unk_logprob`` — by default one nat
    WORSE than the rarest vocabulary piece, so out-of-vocabulary
    garbage ranks below every segmentable document instead of scoring
    log-prob 0 (probability 1) and inverting the quality signal.
    """
    raw_encoder = _make_viterbi_encoder(probs, max_piece_len)
    lp_table = {p: math.log(v) for p, v in probs.items() if v > 0}
    if unk_logprob is None:
        unk_logprob = (min(lp_table.values()) if lp_table else 0.0) - 1.0
    lp_table[UNK] = unk_logprob
    ws = _WS
    out_schema = (
        f"{_id_field(df, id_col)}, tokens array<string>, n_tokens long, logprob double"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = raw_encoder(w)
            return got

        for pdf in batches:
            if pdf.empty:
                continue
            toks, lps = [], []
            for text in pdf[text_col]:
                doc: list[str] = []
                lp = 0.0
                for w in ws.split((text or "").strip(" \t\n\r\f\x0b").lower()):
                    if w:
                        pieces = enc_word(w)
                        doc.extend(pieces)
                        lp += sum(lp_table.get(p, unk_logprob) for p in pieces)
                toks.append(doc)
                lps.append(round(lp, 6))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                    "logprob": lps,
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)

"""Hypothesis property tests for pure-logic primitives.

These target the driver-side algorithms whose correctness the Spark
plans inherit (BPE trainer/encoder, union-find, rounding, ES-sampling
keys) — randomized inputs, exact invariants, no SparkSession needed, so
they run in milliseconds and shrink failures to minimal cases.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from mimic_iv_data_pipeline_spark.operators.bpe import (
    EOW,
    _encode_word,
    train_merges_py,
)
from mimic_iv_data_pipeline_spark.operators.graph import _driver_union_find

words = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=8
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(words, st.integers(1, 50)), min_size=1, max_size=20))
def test_bpe_roundtrip_any_vocab(vocab):
    merges = train_merges_py(vocab, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in vocab:
        toks = _encode_word(w, ranks)
        # lossless: concatenation restores word + EOW marker
        assert "".join(toks) == w + EOW
        # the marker never appears mid-word more than once
        assert sum(t.count(EOW) for t in toks) == 1


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(words, st.integers(1, 50)), min_size=1, max_size=20))
def test_bpe_merges_deterministic(vocab):
    assert train_merges_py(vocab, 15) == train_merges_py(list(vocab), 15)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        max_size=60,
    )
)
def test_union_find_matches_bfs(edges):
    got = dict(_driver_union_find(edges))
    # reference: BFS components with min label
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[int] = set()
    want: dict[int, int] = {}
    for start in adj:
        if start in seen:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            x = frontier.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    frontier.append(y)
        m = min(comp)
        seen |= comp
        for x in comp:
            want[x] = m
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 2**32 - 1), st.floats(0.001, 1000.0))
def test_es_key_formula_total_order_safe(h, w):
    # the exponential race key is finite and positive for every hash
    # value the md5 prefix can produce and every positive weight
    u = (h + 0.5) / 4294967296.0
    key = -math.log(u) / w
    assert math.isfinite(key) and key > 0


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_md5_prefix_hash_in_span(s):
    # the portable hash primitive always lands in [0, 2^32)
    h = int(hashlib.md5(f"x:{s}".encode()).hexdigest()[:8], 16)
    assert 0 <= h < 2**32


words_wp = st.text(alphabet="abcde", min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(words_wp, st.integers(1, 30)), min_size=1, max_size=12))
def test_wordpiece_lossless_on_training_words(vocab):
    """Any word the trainer saw must encode without [UNK] and decode
    (strip ##, concat) back to itself."""
    from mimic_iv_data_pipeline_spark.operators.wordpiece import (
        UNK,
        _make_wp_encoder,
        train_wordpiece_py,
    )

    v = train_wordpiece_py(vocab, vocab_size=200)
    enc = _make_wp_encoder(set(v))
    for w, _ in vocab:
        pieces = enc(w)
        assert UNK not in pieces, (w, pieces)
        assert "".join(p[2:] if p.startswith("##") else p for p in pieces) == w


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(words_wp, st.integers(1, 30)), min_size=1, max_size=10))
def test_unigram_viterbi_segments_training_words(vocab):
    """Every training word must Viterbi-segment (chars never pruned,
    probs never zero) and concatenate back exactly."""
    from mimic_iv_data_pipeline_spark.operators.wordpiece import (
        UNK,
        _make_viterbi_encoder,
        train_unigram_py,
    )

    probs = train_unigram_py(vocab, vocab_size=40, max_piece_len=4, em_iters=1)
    enc = _make_viterbi_encoder(probs, 4)
    for w, _ in vocab:
        pieces = enc(w)
        assert pieces != [UNK], (w, probs)
        assert "".join(pieces) == w


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 5)), min_size=0, max_size=30),
    st.lists(st.tuples(st.integers(0, 20), st.integers(0, 5)), min_size=0, max_size=30),
)
def test_upsert_latest_is_argmax_per_key(base_rows, upd_rows):
    """Pure-python replica of upsert_latest's contract: per key, keep
    max version; ties go to the update side."""
    best: dict[int, tuple[int, int]] = {}  # key -> (version, origin)
    for k, v in base_rows:
        if k not in best or (v, 0) > best[k]:
            best[k] = (v, 0)
    for k, v in upd_rows:
        if k not in best or (v, 1) >= best[k]:
            # >= : update wins version ties against base
            if k not in best or (v, 1) > best[k] or (
                v == best[k][0] and best[k][1] == 0
            ):
                best[k] = (v, 1)
    # invariants the Spark op's window ordering encodes
    for k, (v, origin) in best.items():
        versions = [bv for bk, bv in base_rows + upd_rows if bk == k]
        assert v == max(versions)
        upd_max = max((uv for uk, uv in upd_rows if uk == k), default=None)
        if upd_max == v:
            assert origin == 1  # update wins any tie at the max version

"""Property-based tests (hypothesis) for the pure-python kernel cores —
fast (no Spark session) and adversarial where example tests are gentle."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from imdedup_plus_spark.config import HASH_MOD, REFERENCE_CONFIG as CFG
from imdedup_plus_spark.signatures import _sig_of_text_py, _word_hash_py
from imdedup_plus_spark.spans import greedy_spans

tokens_st = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=0, max_size=80
)


@settings(max_examples=200, deadline=None)
@given(tokens_st, tokens_st)
def test_greedy_spans_roundtrip(base, tgt):
    """Replaying COPY spans against the base + splicing INSERT payloads
    reproduces the target token stream exactly — for ANY pair, including
    empty/degenerate ones (the CHECK_DECOMPRESS invariant)."""
    instrs = greedy_spans(base, tgt)
    out: list[str] = []
    for kind, a_off, b_off, length, payload in instrs:
        if kind == "COPY":
            assert 0 <= a_off and a_off + length <= len(base)
            out.extend(base[a_off : a_off + length])
        else:
            out.extend(payload.split(" ") if payload else [])
    assert out == tgt


@settings(max_examples=200, deadline=None)
@given(tokens_st, tokens_st)
def test_greedy_spans_offsets_cover_target(base, tgt):
    """Instructions tile the target contiguously in order."""
    pos = 0
    for kind, a_off, b_off, length, payload in greedy_spans(base, tgt):
        assert b_off == pos
        assert length >= 1
        pos += length
    assert pos == len(tgt)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_word_hash_domain(tok):
    h = _word_hash_py(tok)
    assert 0 <= h < HASH_MOD


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from("aa bb cc dd ee".split()), min_size=2, max_size=60))
def test_signature_shape_and_domain(toks):
    sig = _sig_of_text_py(" ".join(toks), CFG)
    assert sig is not None
    assert len(sig) == CFG.n_perm
    assert all(0 <= v < 2**31 - 1 for v in sig)


@settings(max_examples=100, deadline=None)
@given(tokens_st)
def test_identical_docs_full_copy(toks):
    """A doc deltas against itself as one COPY (plus nothing), whenever it
    meets the min-copy length."""
    instrs = greedy_spans(toks, toks)
    if len(toks) >= 3:  # MIN_COPY_LEN
        assert instrs == [("COPY", 0, 0, len(toks), None)]

"""Suffix-array LCS kernel: cross-algorithm twin parity and exactness.

The production span matcher (``suffix.suffix_spans``) and the pure-python
greedy probe (``spans.greedy_spans`` with an unbounded ``max_pos``) are two
independent algorithms for the same function — longest match at each
target position, ties to the smallest base offset. Bit-identical output
is the kernel-twin invariant (CLAUDE.md); hypothesis drives it over
adversarial alphabets (tiny alphabets force heavy repetition, the regime
where the algorithms diverge structurally)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imdedup_plus_spark.spans import greedy_spans
from imdedup_plus_spark.suffix import adjacent_lcp, suffix_array, suffix_spans

UNBOUNDED = 10**18

tokens = st.lists(
    st.sampled_from(["a", "b", "c", "d", "w1", "w2", "x"]), min_size=0, max_size=60
)


@settings(max_examples=300, deadline=None)
@given(tokens, tokens, st.sampled_from([1, 2, 3]))
def test_twin_parity_random(A, B, min_copy):
    assert suffix_spans(A, B, min_copy) == greedy_spans(
        A, B, min_copy, max_pos=UNBOUNDED
    )


@settings(max_examples=100, deadline=None)
@given(tokens, st.integers(0, 50), st.integers(0, 50))
def test_twin_parity_spliced(A, cut, pad):
    """Targets built from base slices — dense long matches."""
    cut = min(cut, len(A))
    B = A[cut:] + ["zz"] * (pad % 4) + A[:cut]
    assert suffix_spans(A, B, 3) == greedy_spans(A, B, 3, max_pos=UNBOUNDED)


@settings(max_examples=100, deadline=None)
@given(tokens, tokens)
def test_twin_parity_hex_domain(A, B):
    """The byte-delta configuration: min_copy=1, empty joiner."""
    assert suffix_spans(A, B, 1, joiner="") == greedy_spans(
        A, B, 1, max_pos=UNBOUNDED, joiner=""
    )


def test_capped_probe_misses_long_match_suffix_kernel_does_not():
    """Why the cap is gone: when a long match's first token occurs more
    than max_pos times earlier in the base, the capped probe never reaches
    it. Web boilerplate hits this constantly."""
    A = ["x"] * 100 + "long match here indeed".split() + ["x"] * 3
    B = ["x"] + "long match here indeed".split()
    capped = greedy_spans(A, B, 3, max_pos=64)
    exact = suffix_spans(A, B, 3)
    assert exact == [("COPY", 99, 0, 5, None)]  # full 5-token match
    copied_capped = sum(l for k, _, _, l, _ in capped if k == "COPY")
    assert copied_capped < 5  # the capped probe loses coverage


def test_suffix_spans_edges():
    assert suffix_spans([], [], 3) == []
    assert suffix_spans(["a", "b"], [], 3) == []
    assert suffix_spans([], ["a", "b"], 3) == [("INSERT", -1, 0, 2, "a b")]
    # all-same-token: one maximal COPY from offset 0
    A = ["t"] * 30
    assert suffix_spans(A, A, 3) == [("COPY", 0, 0, 30, None)]
    # target longer than base on the repeated token: COPY the full base
    # prefix match then the greedy continues on the remainder
    out = suffix_spans(["t"] * 5, ["t"] * 8, 3)
    assert out == greedy_spans(["t"] * 5, ["t"] * 8, 3, max_pos=UNBOUNDED)


def test_tie_break_smallest_a_off():
    A = "p q r s p q r t".split()  # 'p q r' at offsets 0 and 4
    B = "p q r z".split()
    assert suffix_spans(A, B, 3)[0] == ("COPY", 0, 0, 3, None)


def test_suffix_array_against_sorted_suffixes():
    """SA construction itself vs the definitional O(n^2 log n) sort."""
    rng = np.random.default_rng(5)
    for _ in range(25):
        n = int(rng.integers(2, 40))
        c = rng.integers(0, 4, size=n).astype(np.int64)
        c[-1] = -1  # unique terminal (smaller than all symbols)
        sa, hist = suffix_array(c)
        expected = sorted(range(n), key=lambda i: list(c[i:]))
        assert list(sa) == expected
        # adjacent LCPs vs direct comparison
        lcp = adjacent_lcp(sa, hist, n)
        for r in range(n - 1):
            i, j = sa[r], sa[r + 1]
            direct = 0
            while (
                i + direct < n and j + direct < n and c[i + direct] == c[j + direct]
            ):
                direct += 1
            assert lcp[r] == direct

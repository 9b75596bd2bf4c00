"""Suffix-array longest-common-substring kernel (stage-2 span matcher).

The north-star seam: *"a suffix-array substring stage that finds exact
duplicated spans inside candidate clusters ... a vectorized Arrow-UDF
longest-common-substring kernel"*. This module is that stage; it replaces
the capped hash-probe greedy matcher (``spans.greedy_spans``) as the
production kernel behind ``spans.extract_spans`` / the byte-delta lane.

Semantics — identical to ``greedy_spans(A, B, min_copy, max_pos=inf)``:
scan the target left to right; at each position take the LONGEST match
found anywhere in the base, ties broken by the smallest base offset;
emit ``COPY`` and jump, else fall through into an ``INSERT`` run. The
greedy matcher realizes this by probing every indexed occurrence of the
first token — O(occurrences x match_len) per position, O(nA x nB) worst
case on repetitive boilerplate, which is why it carries a per-token
probe cap (``MAX_POSITIONS_PER_TOKEN``, mirroring the reference's
consecutive-duplicate index suppression ``/root/reference/index.c:102-109``).
The cap bounds cost but silently MISSES long matches whose first token
is frequent (web boilerplate exactly). The suffix-array kernel computes
the same function via matching statistics in O(n log n) regardless of
repetition: the cap is gone — exactness AND a bounded worst case.

Construction (all heavy steps are numpy-vectorized; the two O(n)
rank-order scans are plain loops over small per-document arrays):

* joint token->int encoding (``pandas.factorize``; any injective total
  order works — matching statistics only need "equal LCP = contiguous
  suffix-array range", which holds for every alphabet order);
* combined sequence ``C = A' + [1] + B' + [0]`` with token ids >= 2, a
  separator (1) so no match crosses the A/B boundary, and a unique
  terminal (0) so all suffixes are pairwise distinct — which makes the
  rank-equality tests below exact;
* suffix array by prefix doubling (``np.lexsort`` per doubling round,
  O(n log^2 n)); the per-round rank arrays are kept;
* LCP of suffix-array neighbours by vectorized binary descent over the
  kept rank arrays (rank_k[i] == rank_k[j] with a unique terminal implies
  the first k tokens agree);
* matching statistics: for each target suffix, the longest common prefix
  with ANY base suffix is ``max`` over the min-LCP chains to the nearest
  base suffix above and below in suffix-array order (two O(n) scans);
* greedy emission reuses the statistics; the smallest base offset among
  maximizers is recovered by walking the LCP plateau around the target's
  rank (only at COPY emissions — a few walks per pair).

Oracle: the DuckDB recursive-CTE replay (``oracle.span_ctes``) mirrors
the same longest-match/smallest-offset rule with an unbounded candidate
list; the pure-python ``greedy_spans`` with an unbounded probe is the
bit-identical cross-algorithm twin (tests/test_suffix.py, hypothesis).

Reference parity: the exact-substring semantics is the 1-D analog of the
reference's block-index + row-scan delta (``/root/reference/index.c:207-267``,
``idelta.c:25-176``) with the probe cap removed — what the reference
approximates with its bounded index, this kernel computes exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_INF = 1 << 60


def _encode(base_tokens, tgt_tokens) -> np.ndarray:
    """``C = A' + [sep=1] + B' + [terminal=0]`` with token ids >= 2."""
    n_a = len(base_tokens)
    codes, _ = pd.factorize(
        np.asarray(list(base_tokens) + list(tgt_tokens), dtype=object)
    )
    ids = codes.astype(np.int64) + 2
    c = np.empty(len(ids) + 2, dtype=np.int64)
    c[:n_a] = ids[:n_a]
    c[n_a] = 1
    c[n_a + 1 : -1] = ids[n_a:]
    c[-1] = 0
    return c


def suffix_array(c: np.ndarray):
    """Prefix-doubling suffix array (numpy ``lexsort`` per round).

    Returns ``(sa, hist)`` where ``hist`` is the list of ``(k, rank)``
    snapshots — ``rank`` compares prefixes of length ``k`` (k = 1, 2, 4,
    ...) — consumed by :func:`adjacent_lcp`'s binary descent.
    """
    n = c.size
    rank = np.unique(c, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    hist = [(1, rank)]
    k = 1
    while rank[sa[-1]] != n - 1:  # not yet all-distinct
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        r1, r2 = rank[sa], key2[sa]
        changed = np.zeros(n, dtype=np.int64)
        np.cumsum((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1]), out=changed[1:])
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = changed
        k *= 2
        hist.append((k, rank))
    return sa, hist


def adjacent_lcp(sa: np.ndarray, hist, n: int) -> np.ndarray:
    """LCP of suffix-array neighbours, vectorized binary descent.

    With the unique terminal all suffixes are pairwise distinct, so
    ``rank_k[i] == rank_k[j]`` (i != j) implies both suffixes are at
    least ``k`` long and agree on their first ``k`` tokens — adding
    ``k`` and advancing is exact. When the doubling loop exited at level
    ``K`` all rank_K values were distinct, hence every LCP < K and the
    smaller powers (sum = K - 1) suffice.
    """
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=np.int64)
    for k, rank in reversed(hist):
        valid = (i < n) & (j < n)
        eq = valid & (rank[np.minimum(i, n - 1)] == rank[np.minimum(j, n - 1)])
        lcp[eq] += k
        i[eq] += k
        j[eq] += k
    return lcp


def _matching_stats(sa, lcp, n_a, n):
    """Per-rank longest common prefix with the nearest base suffix above
    / below in suffix-array order (min-LCP chain, two O(n) scans)."""
    up = np.zeros(n, dtype=np.int64)
    seen, cur = False, 0
    for r in range(n):
        if sa[r] < n_a:
            seen, cur = True, _INF
        elif seen:
            up[r] = cur
        if seen and r < n - 1 and lcp[r] < cur:
            cur = lcp[r]
    down = np.zeros(n, dtype=np.int64)
    seen, cur = False, 0
    for r in range(n - 1, -1, -1):
        if sa[r] < n_a:
            seen, cur = True, _INF
        elif seen:
            down[r] = cur
        if seen and r > 0 and lcp[r - 1] < cur:
            cur = lcp[r - 1]
    return np.maximum(up, down)


def suffix_spans(base_tokens, tgt_tokens, min_copy: int = 3, joiner: str = " "):
    """Greedy span extraction over the suffix-array matching statistics.

    Returns the same ``(kind, a_off, b_off, length, payload)`` instruction
    list as ``spans.greedy_spans(base, tgt, min_copy, max_pos=inf)`` —
    longest match first, ties to the smallest base offset — in
    O(n log^2 n) instead of O(nA x nB) worst case. The token domain is
    opaque (the byte-delta lane feeds hex-encoded CDC chunks with
    ``joiner=""``).
    """
    n_a, n_b = len(base_tokens), len(tgt_tokens)
    if n_b == 0:
        return []
    if n_a == 0:
        return [("INSERT", -1, 0, n_b, joiner.join(tgt_tokens))]

    c = _encode(base_tokens, tgt_tokens)
    n = c.size
    sa, hist = suffix_array(c)
    lcp = adjacent_lcp(sa, hist, n)
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[sa] = np.arange(n)
    ms = _matching_stats(sa, lcp, n_a, n)

    out = []
    i = 0
    ins_start = 0
    while i < n_b:
        r = int(rank_of[n_a + 1 + i])
        m = int(ms[r])
        if m >= min_copy:
            # smallest base offset among maximizers: all base suffixes with
            # LCP == m against this target suffix sit on the contiguous
            # LCP >= m plateau around rank r — walk it both ways.
            best = _INF
            run = _INF
            j = r - 1
            while j >= 0:
                if lcp[j] < run:
                    run = int(lcp[j])
                if run < m:
                    break
                p = int(sa[j])
                if p < n_a and p < best:
                    best = p
                j -= 1
            run = _INF
            j = r
            while j < n - 1:
                if lcp[j] < run:
                    run = int(lcp[j])
                if run < m:
                    break
                p = int(sa[j + 1])
                if p < n_a and p < best:
                    best = p
                j += 1
            if i > ins_start:
                out.append(
                    ("INSERT", -1, ins_start, i - ins_start,
                     joiner.join(tgt_tokens[ins_start:i]))
                )
            out.append(("COPY", best, i, m, None))
            i += m
            ins_start = i
        else:
            i += 1
    if n_b > ins_start:
        out.append(
            ("INSERT", -1, ins_start, n_b - ins_start,
             joiner.join(tgt_tokens[ins_start:n_b]))
        )
    return out

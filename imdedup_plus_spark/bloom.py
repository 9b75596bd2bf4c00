"""Bloom-filter membership probe for decontamination at extreme
benchmark scale.

``trainprep.decontaminate`` broadcasts the benchmark n-gram set as a
sorted array — exact, and the right call while eval sets are KBs-to-MBs.
The data card of a frontier run can push the union of held-out sets into
the multi-GB range (every eval suite x every n-gram); at that point the
sorted-array closure stops fitting executor broadcast budgets. The
classical answer is a **Bloom filter**: the gram set becomes an
``m``-bit bitmap probed with ``k`` affine hashes — memory drops from
O(|grams| * 8B) to m/8 bytes at a deterministic, tunable false-positive
rate, and the plan shape (broadcast + per-row probe, ZERO corpus
shuffle) is unchanged.

Reference discipline: this is the scale escape-hatch for the same
GPT-3 appendix-C 13-gram rule the exact lane implements; the reference
engine's analog is the feature-table membership probe
(``/root/reference/2df.c:321-354`` probes a hash table of sketch
features per target) — here the table is bit-packed and intentionally
lossy-by-one-side (false positives only, NEVER false negatives).

Two-compilers discipline (see ``signatures.py``): one arithmetic, a
Spark Column form AND a bit-identical DuckDB SQL form. Both forms emit
exact hits AND bloom hits side by side, so the oracle row itself proves
the superset property (``n_false_pos = n_bloom_hits - n_exact_hits``
is >= 0 by construction and usually 0 at the default sizing).

Position arithmetic (all BIGINT-safe, identical in both engines and in
the numpy kernel):

    pos_i(h) = ((K_i * h + B_i) mod PERM_P) mod m_bits      i = 0..k-1
    word     = floor(pos / 32);   bit = pos mod 32

``h`` is the 13-gram shingle hash (< 2**31); the K_i are the public
xxhash32 primes (< 2**32), so ``K_i * h + B_i < 2**63`` — no overflow
in int64/BIGINT. Words hold 32 bits each (bits 0..31 of a BIGINT), so
no sign-bit cases exist in either engine.

Scale notes (100 TB): the bitmap is m/32 BIGINTs in ONE broadcast row
(default m = 2**17 -> 4 KB of set words); the corpus side is a narrow
(id, text) scan folded per-row — no explode, no (id, gram) shuffle, no
join. The production path is ``bloom_decontaminate_kernel`` (Arrow
batches, vectorized probe); the Column/SQL forms are the oracle-shaped
twins, bit-identical by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import HASH_MOD, PERM_P
from .oracle import shingles_sql, tokens_sql, word_hashes_sql
from .signatures import shingles_expr
from .trainprep import DUP_NGRAM, _wh_cte, _wh_df, benchmark_snippets

#: default bitmap size in bits (2**17 = 131072 bits = 4096 32-bit words,
#: 16 KB dense) — sized so the sf0.01 benchmark set (~1k set bits) probes
#: at a ~1e-10 per-gram false-positive rate; production sizing is
#: m ~= 20 * |grams| bits for ~1e-4 (k=5 optimum is m/n = k/ln2 ~ 7.2,
#: larger m only lowers the rate).
BLOOM_M_BITS = 1 << 17
#: the five public xxhash32 primes as the affine multipliers
#: (Collet, xxHash, public domain) — B_i = i + 1 keeps the k probes
#: distinct even for h = 0.
BLOOM_KB: tuple[tuple[int, int], ...] = (
    (2654435761, 1),
    (2246822519, 2),
    (3266489917, 3),
    (668265263, 4),
    (374761393, 5),
)

# every K_i * max(h) + B_i must stay below 2**63 (int64/BIGINT safety,
# also relied on by the numpy kernel which computes in signed int64)
assert all(k * (HASH_MOD - 1) + b < 2**63 for k, b in BLOOM_KB)


def _positions_terms(h_var: str, m_bits: int) -> list[str]:
    """The k position expressions — valid in BOTH Spark SQL and DuckDB
    (floor-division discipline; `%` on BIGINT is identical)."""
    return [
        f"(({k} * {h_var} + {b}) % {PERM_P}) % {m_bits}"
        for k, b in BLOOM_KB
    ]


def _probe_lambda(arr_col: str, h_var: str, m_bits: int, *, duck: bool) -> str:
    """Per-gram bloom test: ALL k bits set in the dense word array.
    Expressed as a forall over the k positions; the bit test is
    ``(arr[floor(p/32) + 1] & (1 << (p % 32))) != 0`` (1-based element
    access in both engines)."""
    pos_list = ", ".join(_positions_terms(h_var, m_bits))
    if duck:
        one = "CAST(1 AS BIGINT)"
        test = (
            f"CASE WHEN ({arr_col}[CAST(floor(p / 32) AS INT) + 1] "
            f"& ({one} << CAST(p % 32 AS INT))) != 0 THEN 1 ELSE 0 END"
        )
        return (
            f"list_aggregate(list_transform([{pos_list}], p -> {test}), "
            f"'min') = 1"
        )
    test = (
        f"(element_at({arr_col}, CAST(floor(p / 32) AS INT) + 1) "
        f"& shiftleft(1L, CAST(p % 32 AS INT))) != 0"
    )
    return f"forall(array({pos_list}), p -> {test})"


def bloom_bench_row(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """ONE row: (bloom_arr: array<bigint> of m/32 dense words,
    bench_arr: sorted array<bigint> of the exact benchmark gram hashes).

    Both sides of the probe (lossy bitmap + exact set) are built from the
    same distinct-gram stream so the downstream superset accounting is
    apples-to-apples. The row is O(m/32 + |grams|) — broadcast class."""
    n_words = m_bits // 32
    bench_ng = (
        benchmark_snippets(docs, id_col)
        .select(F.explode(F.expr(shingles_expr("wh", window))).alias("h"))
        .distinct()
    )
    pos = bench_ng.select(
        F.explode(
            F.expr(f"array({', '.join(_positions_terms('h', m_bits))})")
        ).alias("p")
    )
    words = pos.groupBy(
        F.expr("CAST(floor(p / 32) AS INT)").alias("wi")
    ).agg(
        F.expr("bit_or(shiftleft(1L, CAST(p % 32 AS INT)))").alias("w")
    )
    # two steps: Spark rejects aggregate functions inside lambda bodies
    bitmap = words.agg(
        F.expr("map_from_entries(collect_list(struct(wi, w)))").alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "i -> coalesce(element_at(wm, i), 0L))"
        ).alias("bloom_arr")
    )
    exact = bench_ng.agg(
        F.expr("sort_array(collect_list(h))").alias("bench_arr")
    )
    return bitmap.crossJoin(exact)


def bloom_decontaminate(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    m_bits: int = BLOOM_M_BITS,
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination through the Bloom bitmap, with exact
    hits alongside: (doc_id, n_doc_ngrams, n_exact_hits, n_bloom_hits,
    n_false_pos, contaminated_bloom).

    Plan shape: build the single bench row (tiny — corpus/BENCH_MOD
    snippet docs), broadcast-crossJoin it onto the per-doc distinct-gram
    fold, and score both probes inside one per-row projection. The ONLY
    corpus-wide operation is the narrow (id, text) scan — no explode, no
    shuffle, no join on the corpus side (compare
    ``trainprep.decontaminate``, whose hit aggregation still shuffles
    the contaminated ids)."""
    one_row = bloom_bench_row(docs, id_col, window, m_bits)
    doc_ng = _wh_df(docs, id_col, text_col).select(
        "id",
        F.expr(f"array_distinct({shingles_expr('wh', window)})").alias("hs"),
    )
    probe = _probe_lambda("bloom_arr", "h", m_bits, duck=False)
    return (
        doc_ng.crossJoin(F.broadcast(one_row))
        .select(
            F.col("id").alias(id_col),
            F.expr("CAST(size(hs) AS BIGINT)").alias("n_doc_ngrams"),
            F.expr(
                "CAST(size(filter(hs, h -> "
                "array_contains(bench_arr, h))) AS BIGINT)"
            ).alias("n_exact_hits"),
            F.expr(
                f"CAST(size(filter(hs, h -> {probe})) AS BIGINT)"
            ).alias("n_bloom_hits"),
        )
        .withColumn("n_false_pos", F.expr("n_bloom_hits - n_exact_hits"))
        .withColumn(
            "contaminated_bloom", F.expr("CAST(n_bloom_hits > 0 AS INT)")
        )
    )


def bloom_decontaminate_sql(
    id_col: str,
    table: str = "documents",
    window: int = DUP_NGRAM,
    m_bits: int = BLOOM_M_BITS,
) -> str:
    """DuckDB twin of ``bloom_decontaminate`` — identical position and
    bit arithmetic, dense word list built by generate_series left join."""
    from .trainprep import BENCH_MOD, BENCH_SNIP_LEN, BENCH_SNIP_START

    n_words = m_bits // 32
    wh = word_hashes_sql(tokens_sql("text"))
    pos_list = ", ".join(_positions_terms("h", m_bits))
    probe = _probe_lambda("o.bloom_arr", "h", m_bits, duck=True)
    return f"""WITH bench AS (
  SELECT {wh}[{BENCH_SNIP_START + 1} : {BENCH_SNIP_START + BENCH_SNIP_LEN}] AS wh
  FROM {table} WHERE {id_col} % {BENCH_MOD} = 0
),
bench_ng AS (
  SELECT DISTINCT unnest({shingles_sql('wh', window)}) AS h FROM bench
),
pos AS (SELECT unnest([{pos_list}]) AS p FROM bench_ng),
words AS (
  SELECT CAST(floor(p / 32) AS INT) AS wi,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS w
  FROM pos GROUP BY 1
),
one_row AS (
  SELECT (SELECT list(coalesce(w.w, CAST(0 AS BIGINT)) ORDER BY g.i)
          FROM generate_series(0, {n_words - 1}) AS g(i)
          LEFT JOIN words w ON w.wi = g.i) AS bloom_arr,
         (SELECT coalesce(list(h ORDER BY h), []) FROM bench_ng) AS bench_arr
),
{_wh_cte(id_col, table)},
doc_ng AS (
  SELECT id, list_distinct({shingles_sql('wh', window)}) AS hs FROM wh
)
SELECT d.id AS {id_col},
       CAST(len(d.hs) AS BIGINT) AS n_doc_ngrams,
       CAST(len(list_filter(d.hs, h -> list_contains(o.bench_arr, h)))
            AS BIGINT) AS n_exact_hits,
       CAST(len(list_filter(d.hs, h -> {probe})) AS BIGINT) AS n_bloom_hits,
       CAST(len(list_filter(d.hs, h -> {probe})) AS BIGINT)
         - CAST(len(list_filter(d.hs, h -> list_contains(o.bench_arr, h)))
                AS BIGINT) AS n_false_pos,
       CAST(len(list_filter(d.hs, h -> {probe})) > 0 AS INT)
         AS contaminated_bloom
FROM doc_ng d CROSS JOIN one_row o"""


def bloom_decontaminate_kernel(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    m_bits: int = BLOOM_M_BITS,
    text_col: str = "text",
) -> DataFrame:
    """SCALE-path twin of ``bloom_decontaminate`` — identical output
    columns (parity-tested), one ``mapInPandas`` over the pruned
    (id, text) scan, vectorized bitmap probe.

    The bitmap (m/32 int64 words, 32 KB at the default m) and the exact
    sorted gram array are built once on the driver from the BOUNDED
    benchmark set and captured in the closure — same broadcast-analog
    contract as ``trainprep.decontaminate_kernel`` (the exact array is
    kept ONLY to emit the false-positive accounting columns; a real
    too-big-for-broadcast deployment would drop it and ship the bitmap
    alone, which is the entire point of the lane).

    Precondition (shared with decontaminate_kernel): ``id_col`` is a
    key; under duplicate ids the SQL forms score merged rows while this
    kernel scores each physical row.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import (
        _flat_shingles,
        _flat_word_hashes,
        _iter_text_chunks,
    )

    bench_rows = (
        benchmark_snippets(docs, id_col)
        .select(F.explode(F.expr(shingles_expr("wh", window))).alias("h"))
        .distinct()
        .collect()
    )
    bench = (
        np.sort(np.asarray([r["h"] for r in bench_rows], dtype=np.int64))
        if bench_rows
        else np.empty(0, dtype=np.int64)
    )
    n_words = m_bits // 32
    bitmap = np.zeros(n_words, dtype=np.int64)
    for k, b in BLOOM_KB:
        # k * h + b < 2**63 (module-level assert): exact in int64
        p = ((k * bench + b) % PERM_P) % m_bits
        np.bitwise_or.at(bitmap, p // 32, np.int64(1) << (p % 32))
    mask31 = np.uint64(2**31 - 1)

    def _probe(uh: "np.ndarray") -> "np.ndarray":
        hit = np.ones(uh.size, dtype=bool)
        for k, b in BLOOM_KB:
            p = ((k * uh + b) % PERM_P) % m_bits
            hit &= (bitmap[p // 32] >> (p % 32)) & 1 != 0
        return hit

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for texts, ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                ids_np = np.asarray(ids, dtype=np.int64)
                ndoc = len(ids_np)
                n_ng = np.zeros(ndoc, dtype=np.int64)
                n_exact = np.zeros(ndoc, dtype=np.int64)
                n_bloom = np.zeros(ndoc, dtype=np.int64)
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                keep = n_tok >= window
                if keep.any():
                    wh_k = wh_all if keep.all() else wh_all[keep[wdoc]]
                    n_tok_k = n_tok[keep]
                    sh, _, n_sh = _flat_shingles(wh_k, n_tok_k, window)
                    didx = np.repeat(
                        np.arange(n_sh.size, dtype=np.int64), n_sh
                    ).astype(np.uint64)
                    uk = np.unique((didx << np.uint64(31)) | sh)
                    ud = (uk >> np.uint64(31)).astype(np.int64)
                    uh = (uk & mask31).astype(np.int64)
                    kidx = np.nonzero(keep)[0]
                    n_ng[kidx] = np.bincount(ud, minlength=n_sh.size)
                    if bench.size:
                        pos = np.searchsorted(bench, uh)
                        ex = (pos < bench.size) & (
                            bench[np.minimum(pos, bench.size - 1)] == uh
                        )
                        n_exact[kidx] = np.bincount(
                            ud[ex], minlength=n_sh.size
                        )
                        bl = _probe(uh)
                        n_bloom[kidx] = np.bincount(
                            ud[bl], minlength=n_sh.size
                        )
                yield pd.DataFrame(
                    {
                        id_col: ids_np,
                        "n_doc_ngrams": n_ng,
                        "n_exact_hits": n_exact,
                        "n_bloom_hits": n_bloom,
                        "n_false_pos": n_bloom - n_exact,
                        "contaminated_bloom": (n_bloom > 0).astype(np.int32),
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} long, n_doc_ngrams long, n_exact_hits long, "
            "n_bloom_hits long, n_false_pos long, contaminated_bloom int"
        ),
    )

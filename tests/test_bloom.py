"""bloom.py — Bloom-filter decontamination: superset law, forced false
positives at tiny m, kernel/SQL/oracle parity, empty-benchmark edge."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from imdedup_plus_spark import bloom as B
from imdedup_plus_spark.trainprep import BENCH_MOD


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _words(n, tag=""):
    return " ".join(f"w{tag}{i}" for i in range(n))


def _corpus():
    """doc 0 (id % BENCH_MOD == 0) donates the benchmark snippet
    (tokens 6..35); doc 7 copies part of that snippet (contaminated),
    doc 9 is disjoint vocabulary (clean), doc 11 is shorter than the
    13-gram window (no grams at all)."""
    base = _words(60)
    toks = base.split()
    contam = " ".join(toks[10:30]) + " " + _words(10, "pad")
    return [
        (0, base, "en"),
        (7, contam, "en"),
        (9, _words(40, "z"), "en"),
        (11, _words(5, "q"), "en"),
    ]


def test_bloom_matches_exact_and_oracle(spark):
    rows = _corpus()
    got = _collect(B.bloom_decontaminate(_mk_docs(spark, rows), "doc_id"))
    want = _duck(rows, B.bloom_decontaminate_sql("doc_id"))
    assert got == want
    by_id = {r[0]: r for r in got}
    # contaminated doc: bloom and exact agree, no FPs at default sizing
    assert by_id[7][2] > 0 and by_id[7][3] == by_id[7][2] and by_id[7][4] == 0
    assert by_id[7][5] == 1
    # clean doc
    assert by_id[9][2] == 0 and by_id[9][3] == 0 and by_id[9][5] == 0
    # sub-window doc: zero grams, zero everything
    assert by_id[11] == (11, 0, 0, 0, 0, 0)


def test_bloom_kernel_bit_identical(spark):
    rows = _corpus()
    docs = _mk_docs(spark, rows)
    for m in (B.BLOOM_M_BITS, 256):
        sql_form = _collect(B.bloom_decontaminate(docs, "doc_id", m_bits=m))
        kern = _collect(B.bloom_decontaminate_kernel(docs, "doc_id", m_bits=m))
        assert sql_form == kern, f"m_bits={m}"


def test_tiny_bitmap_forces_false_positives_superset_holds(spark):
    """At m = 64 bits nearly every probe collides: bloom hits must cover
    the exact hits on every row (NEVER a false negative), and the clean
    doc must show bloom-only hits (the FP accounting column works)."""
    rows = _corpus()
    got = _collect(B.bloom_decontaminate(_mk_docs(spark, rows), "doc_id", m_bits=64))
    want = _duck(rows, B.bloom_decontaminate_sql("doc_id", m_bits=64))
    assert got == want
    for (_id, n_ng, n_exact, n_bloom, n_fp, flag) in got:
        assert n_bloom >= n_exact
        assert n_fp == n_bloom - n_exact >= 0
        assert flag == (1 if n_bloom > 0 else 0)
    by_id = {r[0]: r for r in got}
    assert by_id[9][4] > 0, "64-bit bitmap must produce FPs on the clean doc"


def test_empty_benchmark_set(spark):
    """No id % BENCH_MOD == 0 docs -> empty bitmap and empty exact set:
    every doc scores zero on both probes, in all three forms."""
    rows = [(1, _words(30), "en"), (BENCH_MOD + 2, _words(30, "b"), "en")]
    docs = _mk_docs(spark, rows)
    got = _collect(B.bloom_decontaminate(docs, "doc_id"))
    want = _duck(rows, B.bloom_decontaminate_sql("doc_id"))
    kern = _collect(B.bloom_decontaminate_kernel(docs, "doc_id"))
    assert got == want == kern
    for r in got:
        assert r[2] == r[3] == r[4] == r[5] == 0


def test_position_arithmetic_int64_safe():
    """The module-level overflow assert is load-bearing for the numpy
    kernel: re-derive it here so a constant edit that breaks int64
    safety fails a test, not just an import-time assert."""
    from imdedup_plus_spark.config import HASH_MOD

    for k, b in B.BLOOM_KB:
        assert k * (HASH_MOD - 1) + b < 2**63

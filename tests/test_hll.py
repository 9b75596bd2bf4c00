"""HyperLogLog distinct-shingle estimator: accuracy, SQL/kernel parity,
merge law, branch coverage, guards.

The register sketch (metrics.distinct_shingle_hll) is the fixed-width
sibling of the KMV lane — same question as the reference's exact
feature-table insert accounting (/root/reference/main.c:483-487), but the
summary is m registers merged by elementwise MAX, the cheapest combine at
100 TB. The DuckDB side (oracle.hll_estimate_sql) is exercised by
scripts/driver_check.py / the driver's CORRECTNESS gate via the
dedup_hll_estimate query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import metrics as M
from imdedup_plus_spark import signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG
from imdedup_plus_spark.config import SCALE_CONFIG


@pytest.fixture(scope="module")
def sig_df(spark, fixture_corpus):
    v = S.valid_documents(fixture_corpus.select("url", "text", "lang"), CFG)
    return S.with_signature(v, CFG).select("url", "shingle_set").cache()


@pytest.fixture(scope="module")
def exact_distinct(sig_df) -> int:
    return (
        sig_df.select(F.explode("shingle_set").alias("s")).distinct().count()
    )


def test_estimate_accuracy(sig_df, exact_distinct):
    row = M.distinct_shingle_hll(sig_df).collect()[0]
    assert row.n_docs == sig_df.count()
    n_doc_shingles = sig_df.agg(F.sum(F.size("shingle_set"))).collect()[0][0]
    assert row.n_doc_shingles == n_doc_shingles
    assert row.hll_m == M.HLL_M
    assert 0 <= row.n_zero_regs <= M.HLL_M
    # stderr ~ 1.04/sqrt(512) = 4.6% (raw) and tighter in the
    # linear-counting regime; 15% is a >3-sigma envelope
    assert abs(row.est_distinct - exact_distinct) <= 0.15 * exact_distinct
    expected_ratio = round(1.0 - row.est_distinct / n_doc_shingles, 6)
    assert row.dup_shingle_ratio == pytest.approx(expected_ratio, abs=1e-9)


def test_kernel_parity_array_sets(sig_df):
    ref = M.distinct_shingle_hll(sig_df).collect()
    ker = M.distinct_shingle_hll_kernel(sig_df).collect()
    assert [tuple(r) for r in ref] == [tuple(r) for r in ker]


def test_kernel_parity_binary_sets(spark, fixture_corpus, sig_df):
    # the Arrow signature kernel emits packed little-endian int32 BINARY
    # sets; REFERENCE_CONFIG (verify_sketch_k=0) keeps them untruncated
    ksig = S.signature_kernel_arrow(
        fixture_corpus.select("url", "text", "lang"), CFG, "url"
    ).select("url", "shingle_set", "n_set_true")
    ref = M.distinct_shingle_hll(sig_df).collect()
    ker = M.distinct_shingle_hll_kernel(ksig).collect()
    assert [tuple(r) for r in ref] == [tuple(r) for r in ker]


def test_raw_estimator_branch(spark):
    # 600 docs x 40 disjoint shingles = 24,000 distinct >> 5m/2 = 1280:
    # forces the integer alpha*m^2*2^S div z path with a known exact
    # answer; SQL and kernel forms must stay bit-identical
    df = spark.range(600).select(
        F.col("id").cast("string").alias("url"),
        F.expr(
            "transform(sequence(id * 40, id * 40 + 39), "
            "x -> CAST(x * 104729 % 2147483648 AS INT))"
        ).alias("shingle_set"),
    )
    row = M.distinct_shingle_hll(df).collect()[0]
    assert row.est_raw > M.HLL_LC_MAX  # raw branch taken
    assert row.est_distinct == row.est_raw
    exact = 600 * 40
    assert abs(row.est_distinct - exact) <= 0.15 * exact
    ker = M.distinct_shingle_hll_kernel(df).collect()[0]
    assert tuple(row) == tuple(ker)


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "url string, shingle_set array<int>")
    row = M.distinct_shingle_hll(df).collect()[0]
    assert (row.n_docs, row.n_zero_regs) == (0, M.HLL_M)
    # V = m -> linear counting ln(1) = 0: the estimate is exactly zero
    assert row.est_distinct == 0


def test_hll_merge_property():
    """Registers merge by elementwise MAX: registers(A ∪ B) ==
    max(registers(A), registers(B)) for any split of any multiset — the
    law that makes the sketch a per-epoch streaming summary."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    m, qb, s_max = M.HLL_M, M.HLL_Q_BITS, M.HLL_S

    def regs(xs):
        reg = np.zeros(m, dtype=np.int64)
        if xs:
            s = np.asarray(xs, dtype=np.int64)
            x = ((s >> 16) ^ s) * M.HLL_MIX_K % 4294967296
            x = ((x >> 16) ^ x) * M.HLL_MIX_K % 4294967296
            h = (x >> 16) ^ x
            q = h // m
            rho = np.where(
                q > 0, qb - np.floor(np.log2(np.maximum(q, 1))).astype(np.int64), s_max
            )
            np.maximum.at(reg, h % m, rho)
        return reg

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 2**31 - 1), max_size=400),
        st.lists(st.integers(0, 2**31 - 1), max_size=400),
    )
    def law(xs, ys):
        assert np.array_equal(
            regs(xs + ys), np.maximum(regs(xs), regs(ys))
        )

    law()


def test_rho_range_exhaustive():
    """rho is in [1, S] for every possible q, and the float64-log2 idiom
    agrees with exact bit-length arithmetic across the whole boundary
    set (2^k - 1, 2^k, 2^k + 1 for every k in the 22-bit domain)."""
    import numpy as np

    qs = [0, 1, 2, 3]
    for k in range(2, M.HLL_Q_BITS):
        qs += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    qs = np.asarray(sorted(set(q for q in qs if q < (1 << M.HLL_Q_BITS))))
    rho_float = np.where(
        qs > 0,
        M.HLL_Q_BITS - np.floor(np.log2(np.maximum(qs, 1))).astype(np.int64),
        M.HLL_S,
    )
    rho_exact = np.asarray(
        [M.HLL_S if q == 0 else M.HLL_Q_BITS - (int(q).bit_length() - 1) for q in qs]
    )
    assert np.array_equal(rho_float, rho_exact)
    assert rho_float.min() >= 1 and rho_float.max() <= M.HLL_S


def test_streaming_register_union_is_exact(spark, fixture_corpus, tmp_path):
    """Per-epoch HLL registers folded by read_distinct_hll must equal
    the one-shot batch estimate over everything ingested — bit-exact
    (the register-MAX merge law), including under identical-content
    recrawls (supersede retirement never subtracts)."""
    import dataclasses

    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import SCALE_CONFIG

    state = str(tmp_path / "state")
    docs = fixture_corpus.select("url", "warc_ts", "html", "text", "lang")
    b = F.crc32("url") % 3
    for e in range(3):
        ST.incremental_dedup_batch(
            docs.where(b == e), state, SCALE_CONFIG, "url",
            epoch_id=e, track_distinct=True, supersede=True,
        )
    inc = ST.read_distinct_hll(spark, state).collect()

    ucfg = dataclasses.replace(SCALE_CONFIG, verify_sketch_k=0)
    batch = M.distinct_shingle_hll_kernel(
        S.signature_kernel_arrow(docs, ucfg, "url")
    ).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in batch]

    # identical-content recrawl wave: totals grow, registers (and so
    # est_distinct / z_scaled / n_zero_regs) are unchanged
    wave0 = docs.where(b == 0)
    ST.incremental_dedup_batch(
        wave0, state, SCALE_CONFIG, "url",
        epoch_id=3, track_distinct=True, supersede=True,
    )
    after = ST.read_distinct_hll(spark, state).collect()[0]
    before = batch[0]
    w0 = M._kmv_totals(
        S.signature_kernel_arrow(wave0, ucfg, "url")
    ).collect()[0]
    assert after.n_docs == before.n_docs + w0.n_docs
    assert after.n_doc_shingles == before.n_doc_shingles + w0.n_doc_shingles
    assert (after.n_zero_regs, after.z_scaled, after.est_distinct) == (
        before.n_zero_regs, before.z_scaled, before.est_distinct
    )


def test_streaming_registerless_epoch_refused(spark, fixture_corpus, tmp_path):
    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import SCALE_CONFIG

    state = str(tmp_path / "state")
    docs = fixture_corpus.select("url", "warc_ts", "html", "text", "lang")
    b = F.crc32("url") % 3
    ST.incremental_dedup_batch(
        docs.where(b == 0), state, SCALE_CONFIG, "url",
        epoch_id=0, track_distinct=True,
    )
    ST.incremental_dedup_batch(
        docs.where(b == 1), state, SCALE_CONFIG, "url", epoch_id=1
    )
    with pytest.raises(ValueError, match="without track_distinct"):
        ST.read_distinct_hll(spark, state)


def test_truncated_sets_refused(spark, fixture_corpus):
    # the totals guard is shared with the KMV lane: SCALE_CONFIG's per-doc
    # bottom-64 truncation is a biased sample — refuse loudly
    tsig = S.signature_kernel_arrow(
        fixture_corpus.select("url", "text", "lang"), SCALE_CONFIG, "url"
    )
    with pytest.raises(Exception, match="KMV-truncated"):
        M.distinct_shingle_hll_kernel(tsig).collect()


def test_refuses_packed_set_without_n_set_true(spark):
    df = spark.createDataFrame(
        [(1, bytearray((7).to_bytes(4, "little")))],
        "doc_id long, shingle_set binary",
    )
    with pytest.raises(ValueError, match="n_set_true"):
        M.distinct_shingle_hll_kernel(df)

"""KMV distinct-shingle estimator: accuracy, SQL/kernel parity, guards.

The estimator (metrics.distinct_shingle_estimate) answers "how many
distinct shingles / how much cross-document shingle duplication" in one
pass — the scale stand-in for the reference's exact feature-table insert
accounting (/root/reference/main.c:483-487). The DuckDB side
(oracle.kmv_estimate_sql) is exercised by scripts/driver_check.py /
the driver's CORRECTNESS gate via the dedup_distinct_estimate query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import metrics as M
from imdedup_plus_spark import signatures as S
from imdedup_plus_spark.config import KMV_EST_K, SCALE_CONFIG
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG


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
    row = M.distinct_shingle_estimate(sig_df).collect()[0]
    assert row.n_docs == sig_df.count()
    n_doc_shingles = sig_df.agg(
        F.sum(F.size("shingle_set"))
    ).collect()[0][0]
    assert row.n_doc_shingles == n_doc_shingles
    if row.kmv_k < KMV_EST_K:
        # sketch not full: the estimate IS the exact distinct count
        assert row.est_distinct == exact_distinct
    else:
        # full sketch: ~1/sqrt(k) stderr; 15% is a 5-sigma envelope
        assert abs(row.est_distinct - exact_distinct) <= 0.15 * exact_distinct
    # ratio recomputed from the row's own integers
    expected_ratio = round(1.0 - row.est_distinct / n_doc_shingles, 6)
    assert row.dup_shingle_ratio == pytest.approx(expected_ratio, abs=1e-9)


def test_oversized_k_degrades_to_exact(sig_df, exact_distinct):
    row = M.distinct_shingle_estimate(sig_df, k=10_000_000).collect()[0]
    assert row.kmv_k == exact_distinct
    assert row.est_distinct == exact_distinct


def test_kernel_parity_array_sets(sig_df):
    ref = M.distinct_shingle_estimate(sig_df).collect()
    ker = M.distinct_shingle_estimate_kernel(sig_df).collect()
    assert [tuple(r) for r in ref] == [tuple(r) for r in ker]


def test_kernel_parity_binary_sets(spark, fixture_corpus, sig_df):
    # the Arrow signature kernel emits packed little-endian int32 BINARY
    # sets; REFERENCE_CONFIG (verify_sketch_k=0) keeps them untruncated.
    # Caller contract (ADVICE r03): packed frames must RETAIN n_set_true
    # so the estimator can prove untruncatedness.
    ksig = S.signature_kernel_arrow(
        fixture_corpus.select("url", "text", "lang"), CFG, "url"
    ).select("url", "shingle_set", "n_set_true")
    ref = M.distinct_shingle_estimate(sig_df).collect()
    ker = M.distinct_shingle_estimate_kernel(ksig).collect()
    assert [tuple(r) for r in ref] == [tuple(r) for r in ker]


def test_full_sketch_branch(spark):
    # 300 docs x 40 disjoint shingles = 12,000 distinct >> k=1024: forces
    # the (k-1)*P div (kth+1) estimator path with a known exact answer
    df = spark.range(300).select(
        F.col("id").cast("string").alias("url"),
        F.expr(
            "transform(sequence(id * 40, id * 40 + 39), x -> CAST(x * 104729 % 2147483648 AS INT))"
        ).alias("shingle_set"),
    )
    row = M.distinct_shingle_estimate(df).collect()[0]
    assert row.kmv_k == KMV_EST_K
    exact = 300 * 40
    assert abs(row.est_distinct - exact) <= 0.15 * exact
    ker = M.distinct_shingle_estimate_kernel(df).collect()[0]
    assert tuple(row) == tuple(ker)


def test_kmv_merge_property():
    """The mergeability law the streaming store relies on, as a pure-numpy
    hypothesis property: bottom-k of a union == bottom-k of the union of
    per-part bottom-k's — for any split of any multiset."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from imdedup_plus_spark.config import KMV_EST_A, KMV_EST_B, PERM_P

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 2**31 - 1), max_size=400),
        st.lists(st.integers(0, 2**31 - 1), max_size=400),
        st.integers(1, 64),
    )
    def law(xs, ys, k):
        h = lambda a: np.unique(
            (KMV_EST_A * np.asarray(a, dtype=np.int64) + KMV_EST_B) % PERM_P
        )
        direct = np.unique(np.concatenate([h(xs + ys)]))[:k] if xs + ys else np.array([])
        merged = (
            np.unique(np.concatenate([h(xs)[:k], h(ys)[:k]]))[:k]
            if xs or ys
            else np.array([])
        )
        assert direct.tolist() == merged.tolist()

    law()


def test_streaming_sketch_union_is_exact(spark, fixture_corpus, tmp_path):
    """Per-epoch KMV sketches folded by read_distinct_estimate must equal
    the one-shot batch estimate over everything ingested — bit-exact (the
    KMV union property), including under identical-content recrawls."""
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
    inc = ST.read_distinct_estimate(spark, state).collect()

    # batch estimator over the full corpus, untruncated sets (the same
    # config the track_distinct re-pass uses inside the loop)
    ucfg = dataclasses.replace(SCALE_CONFIG, verify_sketch_k=0)
    batch = M.distinct_shingle_estimate_kernel(
        S.signature_kernel_arrow(docs, ucfg, "url")
    ).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in batch]

    # clean replay of a committed epoch: no-op, estimate unchanged
    ST.incremental_dedup_batch(
        docs.where(b == 1), state, SCALE_CONFIG, "url",
        epoch_id=1, track_distinct=True, supersede=True,
    )
    assert [tuple(r) for r in ST.read_distinct_estimate(spark, state).collect()] == [
        tuple(r) for r in batch
    ]

    # identical-content recrawl wave (supersede): totals grow by the
    # recrawled volume, but the distinct universe — and therefore
    # est_distinct / kth_hash / kmv_k — is unchanged
    wave0 = docs.where(b == 0)
    ST.incremental_dedup_batch(
        wave0, state, SCALE_CONFIG, "url",
        epoch_id=3, track_distinct=True, supersede=True,
    )
    after = ST.read_distinct_estimate(spark, state).collect()[0]
    before = batch[0]
    w0 = M._kmv_totals(
        S.signature_kernel_arrow(wave0, ucfg, "url")
    ).collect()[0]
    assert after.n_docs == before.n_docs + w0.n_docs
    assert after.n_doc_shingles == before.n_doc_shingles + w0.n_doc_shingles
    assert (after.kmv_k, after.kth_hash, after.est_distinct) == (
        before.kmv_k, before.kth_hash, before.est_distinct
    )


def test_sketchless_epoch_refused(spark, fixture_corpus, tmp_path):
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
        ST.read_distinct_estimate(spark, state)


def test_truncated_sets_refused(spark, fixture_corpus):
    # SCALE_CONFIG truncates shingle_set to the per-doc KMV bottom-64 —
    # a biased sample under the spreading permutation; must refuse loudly
    tsig = S.signature_kernel_arrow(
        fixture_corpus.select("url", "text", "lang"), SCALE_CONFIG, "url"
    )
    assert "n_set_true" in tsig.columns
    with pytest.raises(Exception, match="KMV-truncated"):
        M.distinct_shingle_estimate_kernel(tsig).collect()


def test_estimator_refuses_packed_set_without_n_set_true(spark):
    """ADVICE r03: a packed (binary) shingle_set frame whose projection
    dropped n_set_true cannot prove the sets are untruncated — the
    estimator must refuse at plan time, not silently bias."""
    import pytest

    from imdedup_plus_spark import metrics as M

    df = spark.createDataFrame(
        [(1, bytearray((7).to_bytes(4, "little")))],
        "doc_id long, shingle_set binary",
    )
    with pytest.raises(ValueError, match="n_set_true"):
        M.distinct_shingle_estimate_kernel(df)

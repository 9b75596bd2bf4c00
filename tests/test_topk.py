"""Mergeable top-k gram summary: bracket law, form parity, truncation
cases.

topk.topk_gram_bracket merges deterministic per-id-range top-k
summaries into a heavy-gram list whose counts carry a certified
two-sided bracket est <= exact <= ub (TPUT/threshold-algorithm partial
sums; see the module docstring). The DuckDB side
(topk.topk_gram_bracket_sql) is exercised by scripts/driver_check.py /
the driver's CORRECTNESS gate via the corpus_topk_grams query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import topk as TK


@pytest.fixture(scope="module")
def iddocs(spark, fixture_corpus):
    """Fixture corpus with a dense deterministic numeric id (the driver
    table's doc_id analog): order by url, number from 0."""
    from pyspark.sql import Window

    w = Window.orderBy("url")
    return (
        fixture_corpus.select("url", "text")
        .withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
        .cache()
    )


def _law(df):
    assert (df.n_missed >= 0).all(), "lower bound violated"
    assert (df.ub_slack >= 0).all(), "upper bound violated"
    assert (df.ub_count >= df.exact_count).all()
    assert (df.est_count <= df.exact_count).all()


def test_bracket_law_and_emission(iddocs):
    out = TK.topk_gram_bracket(iddocs, "doc_id").toPandas()
    assert len(out) > 0
    _law(out)
    assert (out.est_count >= TK.TOPK_MIN).all()
    # exact term cross-check against an independent global count
    grams = (
        TK._wh_df(iddocs, "doc_id")
        .select(
            F.explode(
                F.expr(TK.shingles_expr("wh", TK.DUP_NGRAM))
            ).alias("h")
        )
        .groupBy("h")
        .count()
    )
    gmap = {r["h"]: r["count"] for r in grams.collect()}
    for r in out.itertuples():
        assert gmap[r.h] == r.exact_count


def test_kernel_parity(iddocs):
    a = (
        TK.topk_gram_bracket(iddocs, "doc_id")
        .toPandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    b = (
        TK.topk_gram_bracket_kernel(iddocs, "doc_id")
        .toPandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_cross_group_miss_is_bracketed(spark):
    """A gram heavy in one group but crowded out of another group's
    top-k: the merged lower bound must MISS the crowded-out occurrences
    (n_missed > 0) while the threshold term still covers them
    (ub_slack >= 0) — the exact situation the bracket exists for.
    Unigram window for direct control over gram counts."""
    rows = []
    # group 0 (ids 0..31): the target word dominates
    for i in range(32):
        rows.append((i, "zebra " * 5))
    # group 1 (ids 32..63): target occurs ONCE, crowded out by k=4
    # words that each occur twice per doc
    for i in range(32, 64):
        rows.append((i, "alpha alpha beta beta gamma gamma delta delta"))
    rows.append((63, "zebra"))  # the stray occurrence, same group 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = TK.topk_gram_bracket(
        docs, "doc_id", window=1, group=32, k=4, hh_min=2
    ).toPandas()
    _law(out)
    missed = out[out.n_missed > 0]
    assert len(missed) == 1
    assert missed.iloc[0].n_missed == 1  # the stray group-1 "zebra"
    assert missed.iloc[0].est_count == 32 * 5
    assert missed.iloc[0].exact_count == 32 * 5 + 1
    # kernel twin agrees bit-for-bit on the adversarial shape
    ker = (
        TK.topk_gram_bracket_kernel(
            docs, "doc_id", window=1, group=32, k=4, hh_min=2
        )
        .toPandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    assert out.sort_values("h").reset_index(drop=True).equals(ker)


def test_no_truncation_means_tight_bracket(spark):
    """Groups with <= k distinct grams drop nothing: thresholds are all
    zero and the bracket collapses to est == exact == ub."""
    rows = [(i, "one two three one two one") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = TK.topk_gram_bracket(
        docs, "doc_id", window=1, group=8, k=16, hh_min=2
    ).toPandas()
    assert len(out) == 3
    assert (out.est_count == out.exact_count).all()
    assert (out.ub_count == out.exact_count).all()
    assert (out.n_missed == 0).all() and (out.ub_slack == 0).all()


def test_rank_tie_break_deterministic(spark):
    """Ties at the top-k boundary break by gram hash ascending — the
    rule that makes the summary identical across engines. With k=1 and
    two words of equal count, exactly the smaller hash is kept."""
    docs = spark.createDataFrame(
        [(0, "aaa bbb aaa bbb")], "doc_id long, text string"
    )
    out = TK.topk_gram_bracket(
        docs, "doc_id", window=1, group=32, k=1, hh_min=1
    ).toPandas()
    assert len(out) == 1
    # the kept gram was kept in its ONLY group, so its own group's
    # threshold is subtracted back out (covered == t_total) and the
    # bracket is tight despite the dropped tie partner
    assert out.iloc[0].est_count == 2 and out.iloc[0].exact_count == 2
    assert out.iloc[0].ub_count == 2 and out.iloc[0].ub_slack == 0

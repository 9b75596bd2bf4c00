"""Global metrics fold + similarity histogram.

Analog of the reference's result accounting: ratio/bandwidth fold
(``/root/reference/main.c:412-501``, ``idedup.c:952-978``) and the 20-bin
similarity histogram (``/root/reference/idelta.c:382-401``,
``main.c:488-492``). All are single-pass aggregates; the final collect is
~20 scalars (never a data-sized collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def similarity_histogram(verified: DataFrame, n_perm: int, bins: int = 20) -> DataFrame:
    """20-bin histogram of estimated Jaccard (n_eq / n_perm) over verified
    pairs — integer arithmetic only so the oracle matches bit-for-bit."""
    bin_expr = F.least(
        F.lit(bins - 1), (F.col("n_eq") * bins / n_perm).cast("int")
    ).alias("bin")
    return (
        verified.select(bin_expr)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def dedup_metrics(
    docs: DataFrame,
    valid: DataFrame,
    verified: DataFrame,
    clusters: DataFrame,
    id_col: str,
) -> DataFrame:
    """One-row global fold: the engine's ``result6.txt`` analog."""
    n_docs = docs.count()
    n_valid = valid.count()
    n_pairs = verified.count()
    agg = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    n_clusters = agg.count()
    n_dup_docs = (
        agg.where(F.col("sz") > 1).agg(F.sum("sz").alias("s")).collect()[0]["s"] or 0
    )
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n_docs),
                int(n_valid),
                int(n_docs - n_valid),
                int(n_pairs),
                int(n_clusters),
                int(n_dup_docs),
                int(n_dup_docs - (n_valid - n_clusters)),  # representatives kept
            )
        ],
        "n_docs long, n_valid long, n_rejected long, n_verified_pairs long, "
        "n_clusters long, n_docs_in_dup_clusters long, n_dup_representatives long",
    )


def dedup_ratio(span_sum: DataFrame) -> DataFrame:
    """Token-level dedup ratio over the span summaries — the analog of the
    reference's compression ratio ``(raw - undecodable)/final``
    (``/root/reference/main.c:444``): copied tokens are the bytes the
    delta eliminated."""
    return span_sum.agg(
        F.sum("copied_tokens").cast("long").alias("copied_tokens"),
        F.sum("inserted_tokens").cast("long").alias("inserted_tokens"),
        F.round(
            F.sum("copied_tokens")
            / (F.sum("copied_tokens") + F.sum("inserted_tokens")),
            6,
        ).alias("dedup_fraction"),
    )

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


# ---------------------------------------------------------------------------
# KMV bottom-k distinct-shingle estimator (single-pass redundancy estimate)
# ---------------------------------------------------------------------------
#
# Estimates the number of DISTINCT shingles in the corpus — and from it the
# shingle-level duplication mass — without ever materializing the distinct
# set. This is the scale answer to the reference's exact feature-table
# accounting (`/root/reference/main.c:483-487` counts every feature insert
# into SF_NUM exact hash tables): at 10^12 docs the exact distinct is a
# petabyte shuffle, while a KMV sketch of width k answers with ~1/sqrt(k)
# relative error from one narrow pass.
#
# Arithmetic (identical in Spark, numpy kernel, and the DuckDB oracle —
# oracle.kmv_estimate_sql):
#   h            = (KMV_EST_A * s + KMV_EST_B) mod PERM_P   for each shingle s
#   bottom-k     = the k smallest DISTINCT h over the whole corpus
#   est_distinct = n        if n < k  (sketch not full: exact count)
#                = (n-1) * PERM_P div (kth + 1)   otherwise (integer floor)
# with n = |bottom-k| and kth = max(bottom-k). The +1 maps h in [0, P) onto
# (0, P] so the divisor is never zero; integer div keeps both sides
# bit-exact (DuckDB `//` == Spark `div` for non-negative operands).


def _kmv_set_size(sig_df: DataFrame):
    if dict(sig_df.dtypes).get("shingle_set") == "binary":
        return F.expr("CAST(length(shingle_set) / 4 AS INT)")
    return F.size("shingle_set")


def _kmv_totals(sig_df: DataFrame) -> DataFrame:
    """One row ``(n_docs, n_doc_shingles, _trunc)`` over a signature frame."""
    set_sz = _kmv_set_size(sig_df)
    # the estimator is only meaningful over UNTRUNCATED shingle sets: a
    # per-doc KMV bottom-64 set (SCALE_CONFIG kernel output) keeps the
    # smallest *shingle values*, which under the spreading permutation is a
    # biased sample of h — refuse loudly at execution time. The guard
    # needs ``n_set_true`` to see truncation, and every packed (binary)
    # frame comes from a kernel that emits it — so a binary frame WITHOUT
    # the column is a projection that dropped the evidence (ADVICE r03):
    # refuse at plan time rather than silently under-estimate.
    if (
        dict(sig_df.dtypes).get("shingle_set") == "binary"
        and "n_set_true" not in sig_df.columns
    ):
        raise ValueError(
            "distinct_shingle_estimate: packed shingle_set without "
            "n_set_true — cannot prove the sets are untruncated; keep "
            "n_set_true in the projection (signature kernels emit it)"
        )
    trunc = (
        F.max(F.col("n_set_true") - set_sz) if "n_set_true" in sig_df.columns
        else F.lit(0)
    )
    return sig_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(set_sz.cast("long")).alias("n_doc_shingles"),
        trunc.cast("int").alias("_trunc"),
    )


def _kmv_assemble(totals: DataFrame, bot: DataFrame, k: int) -> DataFrame:
    """Fold a bottom-k sketch + a ``_kmv_totals``-shaped row into the
    one-row estimate (shared by the batch forms and the streaming-state
    reader)."""
    from .config import PERM_P

    sketch = bot.agg(
        F.count(F.lit(1)).cast("long").alias("kmv_k"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    est = (
        F.when(F.col("kmv_k") < k, F.col("kmv_k"))
        .otherwise(F.expr(f"(kmv_k - 1) * {PERM_P} div (kth_hash + 1)"))
        .alias("est_distinct")
    )
    guard = F.when(
        F.col("_trunc") > 0,
        F.expr(
            "raise_error('distinct_shingle_estimate: shingle_set is "
            "KMV-truncated (n_set_true > |set|); run on untruncated sets')"
        ).cast("long"),
    ).otherwise(F.col("n_docs"))
    return (
        totals.crossJoin(sketch)
        .select(
            guard.alias("n_docs"), "n_doc_shingles", "kmv_k", "kth_hash", est
        )
        .withColumn(
            "dup_shingle_ratio",
            F.round(F.lit(1.0) - F.col("est_distinct") / F.col("n_doc_shingles"), 6),
        )
    )


def distinct_shingle_estimate(sig_df: DataFrame, k: int | None = None) -> DataFrame:
    """REFERENCE form: exact global bottom-k over ``distinct`` h via SQL.

    One row: ``(n_docs, n_doc_shingles, kmv_k, kth_hash, est_distinct,
    dup_shingle_ratio)``. ``n_doc_shingles`` sums per-doc DISTINCT set
    sizes, so ``dup_shingle_ratio`` is the cross-document shingle
    duplication mass — the fraction of per-doc shingle volume that is a
    repeat of some other document's shingles.

    Scale note: ``.distinct()`` here shuffles every distinct hash once
    (8 bytes/value — at web scale that is the expensive-but-exact form);
    :func:`distinct_shingle_estimate_kernel` is the production path that
    never shuffles the universe.
    """
    from .config import KMV_EST_A, KMV_EST_B, KMV_EST_K, PERM_P

    k = KMV_EST_K if k is None else k
    h = F.pmod(
        F.lit(KMV_EST_A) * F.col("s").cast("long") + F.lit(KMV_EST_B),
        F.lit(PERM_P),
    )
    bot = (
        sig_df.select(F.explode("shingle_set").alias("s"))
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return _kmv_assemble(_kmv_totals(sig_df), bot, k)


def kmv_bottomk_kernel(sig_df: DataFrame, k: int | None = None) -> DataFrame:
    """The bottom-k sketch itself: ``<=k`` rows ``(h BIGINT)``, ascending
    semantics (unordered rows). Per-chunk numpy partials merged exactly —
    see :func:`distinct_shingle_estimate_kernel`. KMV sketches are
    mergeable (bottom-k of a union == bottom-k of the union of per-part
    bottom-k's), so this frame is also the unit the streaming state
    persists per epoch (``streaming.incremental_dedup_batch
    track_distinct=True``)."""
    from .config import KMV_EST_A, KMV_EST_B, KMV_EST_K, PERM_P

    k = KMV_EST_K if k is None else k
    binary = dict(sig_df.dtypes).get("shingle_set") == "binary"

    def part(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            col = pdf["shingle_set"]
            outs = []
            for lo in range(0, len(col), 1024):
                chunk = col.iloc[lo : lo + 1024]
                if binary:
                    arrs = [np.frombuffer(b, dtype="<i4") for b in chunk]
                else:
                    arrs = [np.asarray(a, dtype=np.int64) for a in chunk]
                arrs = [a for a in arrs if a.size]
                if not arrs:
                    continue
                s = np.concatenate(arrs).astype(np.int64, copy=False)
                hv = (KMV_EST_A * s + KMV_EST_B) % PERM_P
                outs.append(np.unique(hv)[:k])
            if outs:
                merged = np.unique(np.concatenate(outs))[:k]
                yield pd.DataFrame({"h": merged})

    return (
        sig_df.select("shingle_set")
        .mapInPandas(part, "h long")
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def distinct_shingle_estimate_kernel(sig_df: DataFrame, k: int | None = None) -> DataFrame:
    """SCALE form: per-chunk numpy bottom-k partials, then an exact merge.

    ``mapInPandas`` emits at most k candidate hashes per 1024-row chunk
    (cache-resident, per the measured chunking rule in
    scripts/bench_verify_forms.py), so the merge input is ~``n_chunks * k``
    rows — the full shingle universe is never shuffled or distinct-ed.
    Correct by the KMV union property: any global bottom-k member is a
    bottom-k member of its own chunk. Bit-identical to
    :func:`distinct_shingle_estimate` (tests/test_kmv.py parity).

    Accepts ``shingle_set`` as ``ARRAY<INT>`` (SQL path) or packed
    little-endian int32 ``BINARY`` (kernel path) — untruncated only.
    """
    from .config import KMV_EST_K

    k = KMV_EST_K if k is None else k
    return _kmv_assemble(_kmv_totals(sig_df), kmv_bottomk_kernel(sig_df, k), k)


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

"""Mergeable top-k gram summary with a certified count bracket.

The distributed-readout complement of the CMS lane: ``cms.py`` answers
point-frequency queries with one-sided OVERestimates; this lane builds a
corpus-wide heavy-gram list whose per-gram counts carry a certified
two-sided bracket — a deterministic lower bound from the merged
summaries and an upper bound from the summaries' truncation thresholds.
The construction is the partial-sums/threshold idea of distributed top-k
(Fagin, Lotem & Naor 2001's Threshold Algorithm; Cao & Wang 2004, TPUT)
with the per-part summary shaped like a Misra-Gries/SpaceSaving synopsis
(Agarwal et al. 2012, "Mergeable summaries"): each deterministic
id-range GROUP keeps only its top-k grams plus one scalar threshold, and
anything the merge reports satisfies

    est_count(h)  =  sum of h's counts over groups that KEPT h
    ub_count(h)   =  est_count + sum of thresholds of groups that did
                     NOT keep h        (h's count there <= threshold
                     by the ranking rule, 0 if h never occurred there)
    est_count(h)  <=  exact_count(h)  <=  ub_count(h)

Both inequalities are certified IN the official oracle row: the output
carries ``exact_count`` (the verification term, computed only for the
bounded candidate set) beside the bracket, so ``n_missed = exact - est``
and ``ub_slack = ub - exact`` are >= 0 by construction and the driver
compare certifies both engines agree on every bracket. A production
deployment drops the exact term and ships the bracket alone.

Training-data use case: license headers / navigation boilerplate /
template sentences concentrated in parts of the crawl — the per-group
summaries catch locally-heavy grams that a global uniform sample can
miss, and the bracket says how wrong the merged count can be, per gram,
with no distributional assumption.

Reference discipline: the reference's exact per-super-feature collision
accounting (``/root/reference/main.c:483-487``) is the exact in-memory
analog; this lane is its bounded-shuffle replacement, the same
relationship the CMS lane has to point frequency.

Determinism: groups are ``id div TOPK_GROUP_DOCS`` — a function of the
data, not of the partition layout — and the per-group ranking orders by
``(count DESC, h ASC)``, so Spark, the numpy kernel and DuckDB produce
identical summaries regardless of physical parallelism (the property a
stream-order-dependent Misra-Gries sweep cannot give an oracle).

Scale notes (100 TB): the per-group stage shuffles (g, h) partial
counts — with the corpus stored id-clustered (the engine's layout), g is
partition-local and the map-side combine collapses it before exchange;
the per-group sort is bounded by one group's distinct grams (groups are
fixed id-ranges, so no unbounded window partition — the exact hazard the
cluster-keeper lane's max_by rewrite removed). After pruning, the merge
handles n_groups * (k rows + 1 threshold scalar) regardless of the gram
universe, and the candidate/exact verification join is
candidate-bounded and broadcast. The kernel twin replaces the JVM HOF
gram explosion with the chunked numpy counter (the measured 18-28x
lever from the trainprep lanes) and shares the ranking tail verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .oracle import shingles_sql, tokens_sql, word_hashes_sql
from .signatures import shingles_expr
from .trainprep import DUP_NGRAM, _wh_cte, _wh_df

#: docs per deterministic summary group (id div this). Small here so the
#: sf0.01 fixture exercises real truncation in every group; production
#: sizing makes a group one storage partition (~10^5 docs), keeping the
#: merged summary at n_groups * (k + 1) rows.
TOPK_GROUP_DOCS = 32
#: grams kept per group summary
TOPK_K = 64
#: emission floor on the merged LOWER bound (a gram whose certified
#: floor clears this is heavy somewhere by construction)
TOPK_MIN = 2


def _gh_counts(docs: DataFrame, id_col: str, window: int, group: int) -> DataFrame:
    """Per (group, gram) occurrence counts — SQL form."""
    return (
        _wh_df(docs, id_col)
        .select(
            F.expr(f"id div {group}").alias("g"),
            F.explode(F.expr(shingles_expr("wh", window))).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _bracket_tail(
    gh: DataFrame,
    grams: DataFrame,
    k: int,
    hh_min: int,
) -> DataFrame:
    """Shared readout from the (g, h, c) counts: rank within group,
    truncate to top-k + threshold, merge with bracket accounting, verify
    against the exact counts of the bounded candidate set. ``grams`` is
    the raw gram occurrence stream (h), used only for the verification
    term."""
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("h").asc())
    ranked = gh.withColumn("rn", F.row_number().over(w))
    kept = ranked.where(F.col("rn") <= k).select("g", "h", "c")
    # threshold_g = the count at rank k+1 (max over dropped); groups with
    # <= k distinct grams dropped nothing -> threshold 0
    thr = (
        ranked.groupBy("g")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rn") > k, F.col("c"))), F.lit(0)
            ).cast("long").alias("thr")
        )
    )
    t_total = thr.agg(F.sum("thr").cast("long").alias("t_total"))
    merged = (
        kept.join(F.broadcast(thr), "g")
        .groupBy("h")
        .agg(
            F.sum("c").cast("long").alias("est_count"),
            F.sum("thr").cast("long").alias("covered"),
        )
    )
    exact = (
        grams.join(F.broadcast(merged.select("h")), "h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        merged.join(exact, "h")
        .crossJoin(F.broadcast(t_total))
        .select(
            "h",
            "est_count",
            "exact_count",
            F.expr("est_count + t_total - covered").alias("ub_count"),
            F.expr("exact_count - est_count").alias("n_missed"),
            F.expr("(est_count + t_total - covered) - exact_count").alias(
                "ub_slack"
            ),
        )
        .where(F.col("est_count") >= hh_min)
    )


def topk_gram_bracket(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    group: int = TOPK_GROUP_DOCS,
    k: int = TOPK_K,
    hh_min: int = TOPK_MIN,
) -> DataFrame:
    """Merged heavy-gram list with the certified bracket: ``(h,
    est_count, exact_count, ub_count, n_missed, ub_slack)`` for every
    gram whose merged lower bound clears ``hh_min``. Oracle-shaped
    Column form; the kernel twin shares the ranking tail."""
    gh = _gh_counts(docs, id_col, window, group)
    grams = _wh_df(docs, id_col).select(
        F.explode(F.expr(shingles_expr("wh", window))).alias("h")
    )
    return _bracket_tail(gh, grams, k, hh_min)


def topk_gram_bracket_sql(
    id_col: str,
    table: str = "documents",
    window: int = DUP_NGRAM,
    group: int = TOPK_GROUP_DOCS,
    k: int = TOPK_K,
    hh_min: int = TOPK_MIN,
) -> str:
    """DuckDB twin of ``topk_gram_bracket`` — identical grouping,
    ranking order, threshold accounting and bracket arithmetic."""
    return f"""WITH {_wh_cte(id_col, table)},
gh AS (
  SELECT id // {group} AS g, unnest({shingles_sql('wh', window)}) AS h
  FROM wh
),
ghc AS (SELECT g, h, CAST(count(*) AS BIGINT) AS c FROM gh GROUP BY 1, 2),
ranked AS (
  SELECT g, h, c,
         row_number() OVER (PARTITION BY g ORDER BY c DESC, h ASC) AS rn
  FROM ghc
),
kept AS (SELECT g, h, c FROM ranked WHERE rn <= {k}),
thr AS (
  SELECT g,
         CAST(coalesce(max(CASE WHEN rn > {k} THEN c END), 0) AS BIGINT) AS thr
  FROM ranked GROUP BY 1
),
tt AS (SELECT CAST(sum(thr) AS BIGINT) AS t_total FROM thr),
merged AS (
  SELECT k2.h,
         CAST(sum(k2.c) AS BIGINT) AS est_count,
         CAST(sum(t.thr) AS BIGINT) AS covered
  FROM kept k2 JOIN thr t USING (g)
  GROUP BY 1
),
grams AS (
  SELECT unnest({shingles_sql('wh', window)}) AS h FROM wh
),
exact AS (
  SELECT g2.h, CAST(count(*) AS BIGINT) AS exact_count
  FROM grams g2 JOIN (SELECT h FROM merged) m USING (h)
  GROUP BY 1
)
SELECT m.h,
       m.est_count,
       e.exact_count,
       m.est_count + t.t_total - m.covered AS ub_count,
       e.exact_count - m.est_count AS n_missed,
       (m.est_count + t.t_total - m.covered) - e.exact_count AS ub_slack
FROM merged m JOIN exact e USING (h) CROSS JOIN tt t
WHERE m.est_count >= {hh_min}"""


def topk_gram_bracket_kernel(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    group: int = TOPK_GROUP_DOCS,
    k: int = TOPK_K,
    hh_min: int = TOPK_MIN,
    text_col: str = "text",
) -> DataFrame:
    """SCALE-path twin: one chunked-numpy ``mapInPandas`` pass emits
    (g, h, partial-count) rows — the JVM HOF gram explosion never runs —
    then the exact ``groupBy(g, h).sum`` and the shared ranking tail
    reproduce the Column form bit-for-bit (parity-tested). The
    verification term needs no second corpus pass: the per-group counts
    summed over g ARE the global occurrence counts, so one pass feeds
    both the summaries and the exact term."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import (
        _flat_shingles,
        _flat_word_hashes,
        _iter_text_chunks,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys_out, cnt_out = [], []
            for texts, ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                keep = n_tok >= window
                if not keep.any():
                    continue
                wh_k = wh_all if keep.all() else wh_all[keep[wdoc]]
                sh, _, n_sh = _flat_shingles(wh_k, n_tok[keep], window)
                ids_k = np.asarray(ids, dtype=np.int64)[keep]
                g = (ids_k // group).repeat(n_sh)
                # packed (g, h) key: h < 2^31, g < 2^32 for any real corpus
                key = (g << np.int64(31)) | sh.astype(np.int64)
                uk, uc = np.unique(key, return_counts=True)
                keys_out.append(uk)
                cnt_out.append(uc)
            if keys_out:
                uk = np.concatenate(keys_out)
                uc = np.concatenate(cnt_out)
                yield pd.DataFrame(
                    {
                        "g": (uk >> np.int64(31)).astype(np.int64),
                        "h": (uk & np.int64((1 << 31) - 1)).astype(np.int64),
                        "c": uc.astype(np.int64),
                    }
                )

    partials = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, schema="g long, h long, c long"
    )
    # materialize the bounded (g, h, c) table ONCE: five downstream
    # branches (rank, thresholds, totals, merge, exact term) reference
    # it, and AQE's exchange reuse does not collapse them (measured: 10
    # MapInPandas subtrees in the executed plan without this — the
    # corpus pass re-ran per branch). localCheckpoint persists the agg
    # to executor storage, so the corpus is scanned exactly once.
    gh = (
        partials.groupBy("g", "h")
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    # the global gram stream for the verification term is the same
    # partials summed over g — re-expanded to an occurrence-count frame
    # the shared tail can count (weighted count = sum of c)
    grams_counts = gh.select("h", "c")

    # inline the tail with a weighted exact term (sum(c) over all groups
    # == the occurrence count the Column form's raw-stream count gives)
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("h").asc())
    ranked = gh.withColumn("rn", F.row_number().over(w))
    kept = ranked.where(F.col("rn") <= k).select("g", "h", "c")
    thr = ranked.groupBy("g").agg(
        F.coalesce(F.max(F.when(F.col("rn") > k, F.col("c"))), F.lit(0))
        .cast("long").alias("thr")
    )
    t_total = thr.agg(F.sum("thr").cast("long").alias("t_total"))
    merged = (
        kept.join(F.broadcast(thr), "g")
        .groupBy("h")
        .agg(
            F.sum("c").cast("long").alias("est_count"),
            F.sum("thr").cast("long").alias("covered"),
        )
    )
    exact = (
        grams_counts.join(F.broadcast(merged.select("h")), "h")
        .groupBy("h")
        .agg(F.sum("c").cast("long").alias("exact_count"))
    )
    return (
        merged.join(exact, "h")
        .crossJoin(F.broadcast(t_total))
        .select(
            "h",
            "est_count",
            "exact_count",
            F.expr("est_count + t_total - covered").alias("ub_count"),
            F.expr("exact_count - est_count").alias("n_missed"),
            F.expr("(est_count + t_total - covered) - exact_count").alias(
                "ub_slack"
            ),
        )
        .where(F.col("est_count") >= hh_min)
    )

"""Data-selection lanes: which surviving documents actually get trained on.

Dedup and hygiene (``trainprep.py`` / ``hygiene.py`` / ``lmquality.py``)
decide what to THROW AWAY; a training-data pipeline then decides what to
KEEP and in what proportion. This module adds the two canonical selection
operators of that stage, re-expressed with the engine's two-compilers
discipline (one integer arithmetic, a Spark Column/SQL form AND a
bit-identical DuckDB form):

* **DSIR importance resampling** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling", arXiv 2302.03169): score
  every raw document by the log-likelihood ratio of its hashed n-gram
  features under a TARGET distribution (high-quality seed corpus) vs the
  RAW distribution (the crawl itself), then resample the top-K by
  Gumbel-perturbed weight. Determinism mapping, stated plainly:

  - the paper's float ``log p`` becomes integer ``floor(log2)`` in the
    engine's fixed-point form — ``q = ((total + V) * 2^10) div (cnt + 1)``
    is the add-one-smoothed INVERSE probability and
    ``length(bin(q)) - 1`` is its exact bit-length log, identical in
    Spark and DuckDB (the ``lmquality.py`` mechanism; no transcendental
    whose last ulp could differ between engines). The per-bucket score is
    ``llr[b] = ilog2(q_raw[b]) - ilog2(q_target[b])`` — positive when the
    bucket is likelier under the target.
  - the paper's Gumbel-top-k sampling becomes top-K of
    ``weight * 2^10 + lcg(id) % 2^10`` — an LCG hash perturbation in the
    sub-weight digits, the deterministic member of the perturb-then-top-K
    family (Gumbel-top-k IS perturb-then-top-K; the engine swaps the
    noise source so reruns and the oracle reproduce the sample exactly,
    the same reason ``trainprep.sample_stratified`` shuns ``F.rand``).
  - features are hashed {1,2}-gram word hashes (the paper's hashed
    n-gram model), bucketed to ``DSIR_V`` by an affine map mod the
    Mersenne prime.

* **UniMax language allocation** (Chung et al. 2023, "UniMax: Fairer and
  More Effective Language Sampling for Large-Scale Multilingual
  Pretraining", arXiv 2304.09151): given per-language available token
  counts, a total training budget, and a per-language epoch cap, water-
  fill the budget uniformly across languages, capping each language at
  ``epochs * available``. The closed-form waterfill is exact in integer
  arithmetic over one window frame of ``n_languages`` rows: languages
  sorted by cap ascending, ``capped(rn) <=> cap * (n - rn) <= B -
  prefix(rn)`` (the condition is monotone along the sort, so the capped
  set is a prefix), and the uncapped share is
  ``theta = (B - sum capped caps) div (n - n_capped)``.

A third lane, the per-document **selection verdict** (every gate's flag
plus the first-failing-reason string), is a pure composition of already-
checked lanes and lives in ``__spark_entry__.py`` next to the pipeline
wiring; ``verdict_case_sql`` below pins its CASE priority so the Spark
and DuckDB forms share one source of truth.

Scale notes (100 TB):

* DSIR's two distributions are ONE conditional aggregate over the gram
  stream (map-side combined to <= DSIR_V rows per task); the model is a
  single broadcast row (DSIR_V BIGINTs = 64 KB); scoring is a per-row
  fold over that row — zero corpus exchanges. The top-K select is
  ``orderBy().limit(K)`` = TakeOrderedAndProject: a per-partition heap
  and a K-row driver merge, NEVER a global sort. K is a literal by
  contract (the training budget in documents), not a data-dependent
  fraction — at 10^12 docs pass K explicitly.
* UniMax aggregates the corpus once (map-side combine to n_languages
  rows) and waterfills over n_languages rows — the unpartitioned window
  is bounded by the language inventory (~200 rows at web scale), the
  same bounded-window contract as the lmquality histogram.

Reference discipline: the reference selects the delta BASE per pair
(``/root/reference/2df.c:459-498``) and keeps unique files; it has no
corpus-proportion stage (its corpus is a trusted camera-image set).
These lanes are the web-corpus counterpart the north rule's
training-pipeline shape requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import HASH_MOD, PERM_P
from .oracle import shingles_sql, tokens_sql, word_hashes_sql
from .signatures import shingles_expr, tokens_expr, word_hashes_expr
from .trainprep import SAMPLE_INC, SAMPLE_MULT, _wh_cte, _wh_df

#: deterministic target slice: every DSIR_TARGET_MOD-th doc is the
#: "trusted corpus" stand-in (co-prime with LM_SEED_MOD=17, BENCH_MOD=41,
#: CMS_CAND_MOD=20 so the deterministic samples interleave, not nest).
DSIR_TARGET_MOD = 23
#: hashed feature-bucket width; one 64 KB broadcast row. Production
#: sizing follows the paper's 10^4..10^6 hashed buckets.
DSIR_V = 1 << 13
#: bucket affine map (public Knuth/xxHash 32-bit prime family, distinct
#: from the lmquality pair so the two hashed vocabularies decorrelate).
DSIR_A = 2654435761
DSIR_B = 97
#: fixed-point scale for the inverse probabilities (10 bits, lmquality's)
DSIR_Q_BITS = 10
#: resample size — the training budget in documents. A literal by
#: contract (TakeOrdered needs a constant); callers size it to the run.
DSIR_K = 100
assert DSIR_A * (HASH_MOD - 1) + DSIR_B < 2**63  # int64/BIGINT safety

#: UniMax defaults: budget as a permille of available tokens, epoch cap.
#: Chosen so the sf fixtures exercise BOTH waterfill branches (the
#: low-resource languages cap at one epoch, the head language takes the
#: uncapped share); a real run passes its own budget/cap.
UNIMAX_BUDGET_PERMILLE = 800
UNIMAX_EPOCHS = 1


def _bucket_term(h_var: str) -> str:
    """Feature-bucket expression — valid in BOTH Spark SQL and DuckDB."""
    return f"((({DSIR_A} * {h_var} + {DSIR_B}) % {PERM_P}) % {DSIR_V})"


def _feats_expr(wh_col: str) -> str:
    """Hashed {1,2}-gram feature stream (Spark): the word hashes
    themselves plus the 2-gram shingle hashes."""
    return f"concat({wh_col}, {shingles_expr(wh_col, 2)})"


def _feats_sql(wh: str) -> str:
    """DuckDB twin of ``_feats_expr``."""
    return f"list_concat({wh}, {shingles_sql(wh, 2)})"


def _noise_term(id_col: str) -> str:
    """Deterministic Gumbel stand-in: the engine's sampling LCG reduced
    to the sub-weight digits. Valid in both compilers."""
    return (
        f"((({id_col} % {PERM_P}) * {SAMPLE_MULT} + {SAMPLE_INC}) "
        f"% {PERM_P}) % {1 << DSIR_Q_BITS}"
    )


# ---------------------------------------------------------------------------
# 1. DSIR importance resampling
# ---------------------------------------------------------------------------


def dsir_model_row(docs: DataFrame, id_col: str) -> DataFrame:
    """ONE row ``(llr_arr: array<bigint> of DSIR_V per-bucket integer
    log-likelihood ratios, t_total, r_total)`` — the trained importance
    model, broadcast-class. One conditional aggregate over the gram
    stream covers BOTH distributions (raw = every doc, target = the
    DSIR_TARGET_MOD slice; the raw distribution includes the target docs,
    as in the paper's raw-crawl featurization)."""
    feats = _wh_df(docs, id_col).select(
        F.col("id"),
        F.explode(F.expr(_feats_expr("wh"))).alias("h"),
    )
    buckets = (
        feats.select(
            F.expr(_bucket_term("h")).alias("b"),
            (F.col("id") % DSIR_TARGET_MOD == 0).cast("long").alias("is_t"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum("is_t").alias("c_t"),
        )
    )
    # two steps: Spark rejects aggregate functions inside lambda bodies
    q_t = (
        f"((t_total + {DSIR_V}) * {1 << DSIR_Q_BITS}) div "
        f"(coalesce(element_at(tm, k), 0L) + 1)"
    )
    q_r = (
        f"((r_total + {DSIR_V}) * {1 << DSIR_Q_BITS}) div "
        f"(coalesce(element_at(rm, k), 0L) + 1)"
    )
    return (
        buckets.agg(
            F.expr("map_from_entries(collect_list(struct(b, c_r)))").alias("rm"),
            F.expr("map_from_entries(collect_list(struct(b, c_t)))").alias("tm"),
            F.sum("c_r").alias("r_total"),
            F.sum("c_t").alias("t_total"),
        )
        .select(
            "rm",
            "tm",
            F.coalesce(F.col("r_total"), F.lit(0)).cast("long").alias("r_total"),
            F.coalesce(F.col("t_total"), F.lit(0)).cast("long").alias("t_total"),
        )
        .select(
            F.expr(
                f"transform(sequence(0, {DSIR_V - 1}), k -> "
                f"(length(bin({q_r})) - 1) - (length(bin({q_t})) - 1))"
            ).alias("llr_arr"),
            "t_total",
            "r_total",
        )
    )


def dsir_select(
    docs: DataFrame, id_col: str, k: int = DSIR_K
) -> DataFrame:
    """Top-``k`` documents by DSIR importance weight:
    ``(doc_id, n_feats, dsir_llr_bits, dsir_key)``.

    ``dsir_llr_bits`` is the document's summed per-feature integer LLR
    (the log importance weight in bits); ``dsir_key`` perturbs it into
    the resampling key (module docstring). Zero corpus exchanges before
    the TakeOrdered heap."""
    model = dsir_model_row(docs, id_col)
    w = (
        "aggregate(feats, 0L, (acc, h) -> acc + "
        f"element_at(llr_arr, CAST({_bucket_term('h')} AS INT) + 1))"
    )
    return (
        _wh_df(docs, id_col)
        .select(F.col("id"), F.expr(_feats_expr("wh")).alias("feats"))
        .crossJoin(F.broadcast(model))
        .select(
            F.col("id").alias(id_col),
            F.expr("CAST(size(feats) AS BIGINT)").alias("n_feats"),
            F.expr(w).alias("dsir_llr_bits"),
        )
        .select(
            id_col,
            "n_feats",
            "dsir_llr_bits",
            F.expr(
                f"dsir_llr_bits * {1 << DSIR_Q_BITS} + {_noise_term(id_col)}"
            ).alias("dsir_key"),
        )
        .orderBy(F.col("dsir_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_select_sql(
    id_col: str, table: str = "documents", k: int = DSIR_K
) -> str:
    """DuckDB twin of ``dsir_select`` — identical bucket, fixed-point,
    bin-length, perturbation and tie-break arithmetic."""
    q_t = (
        f"((o.t_total + {DSIR_V}) * {1 << DSIR_Q_BITS}) // "
        f"(coalesce(tb.c_t, CAST(0 AS BIGINT)) + 1)"
    )
    q_r = (
        f"((o.r_total + {DSIR_V}) * {1 << DSIR_Q_BITS}) // "
        f"(coalesce(tb.c_r, CAST(0 AS BIGINT)) + 1)"
    )
    return f"""WITH {_wh_cte(id_col, table)},
feats AS (
  SELECT id, {_feats_sql('wh')} AS feats FROM wh
),
grams AS (
  SELECT CAST(id % {DSIR_TARGET_MOD} = 0 AS BIGINT) AS is_t,
         unnest(feats) AS h
  FROM feats
),
buckets AS (
  SELECT {_bucket_term('h')} AS b,
         CAST(count(*) AS BIGINT) AS c_r,
         CAST(sum(is_t) AS BIGINT) AS c_t
  FROM grams GROUP BY 1
),
totals AS (
  SELECT CAST(coalesce(sum(c_r), 0) AS BIGINT) AS r_total,
         CAST(coalesce(sum(c_t), 0) AS BIGINT) AS t_total
  FROM buckets
),
model AS (
  SELECT (SELECT list(
            CAST((length(bin({q_r})) - 1) - (length(bin({q_t})) - 1)
              AS BIGINT) ORDER BY g.k)
          FROM generate_series(0, {DSIR_V - 1}) AS g(k)
          LEFT JOIN buckets tb ON tb.b = g.k
          CROSS JOIN totals o) AS llr_arr
),
scored AS (
  SELECT f.id AS {id_col},
         CAST(len(f.feats) AS BIGINT) AS n_feats,
         CAST(coalesce(list_aggregate(list_transform(f.feats,
             h -> m.llr_arr[CAST({_bucket_term('h')} AS INT) + 1]),
           'sum'), 0) AS BIGINT) AS dsir_llr_bits
  FROM feats f CROSS JOIN model m
)
SELECT {id_col}, n_feats, dsir_llr_bits,
       dsir_llr_bits * {1 << DSIR_Q_BITS} + {_noise_term(id_col)}
         AS dsir_key
FROM scored
ORDER BY dsir_key DESC, {id_col} ASC
LIMIT {k}"""


def _bucket_np(h):
    """numpy twin of ``_bucket_term`` — exact uint64 arithmetic
    (``DSIR_A * (2^31 - 1) < 2^63``, asserted at import)."""
    import numpy as np

    return (
        ((np.uint64(DSIR_A) * h + np.uint64(DSIR_B)) % np.uint64(PERM_P))
        % np.uint64(DSIR_V)
    ).astype(np.int64)


def dsir_model_counts_kernel(
    docs: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """SCALE-path model build: per-PARTITION partial bucket counts
    ``(b, c_r, c_t)`` from ONE ``mapInPandas`` pass — each task folds its
    whole partition into two dense ``DSIR_V`` arrays and emits only the
    nonzero rows, so the exchange is bounded at ``tasks x DSIR_V`` rows
    regardless of corpus size (the CMS kernel's fused-partials shape;
    the SQL form's explode+groupBy shuffles the same bounded set but
    pays the interpreted per-row HOF fold to produce the gram stream)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import (
        _flat_shingles,
        _flat_word_hashes,
        _iter_text_chunks,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_r = np.zeros(DSIR_V, dtype=np.int64)
        c_t = np.zeros(DSIR_V, dtype=np.int64)
        for pdf in batches:
            for texts, ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                ids_np = np.asarray(ids, dtype=np.int64)
                is_t = ids_np % DSIR_TARGET_MOD == 0
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                b_u = _bucket_np(wh_all)
                c_r += np.bincount(b_u, minlength=DSIR_V)
                if is_t.any():
                    c_t += np.bincount(
                        b_u[is_t[wdoc]], minlength=DSIR_V
                    )
                keep = n_tok >= 2
                if keep.any():
                    wh_k = wh_all if keep.all() else wh_all[keep[wdoc]]
                    sh, _, n_sh = _flat_shingles(wh_k, n_tok[keep], 2)
                    b_s = _bucket_np(sh)
                    c_r += np.bincount(b_s, minlength=DSIR_V)
                    t_k = is_t[keep]
                    if t_k.any():
                        didx = np.repeat(
                            np.arange(n_sh.size, dtype=np.int64), n_sh
                        )
                        c_t += np.bincount(
                            b_s[t_k[didx]], minlength=DSIR_V
                        )
        nz = np.nonzero(c_r)[0]
        yield pd.DataFrame(
            {"b": nz.astype(np.int64), "c_r": c_r[nz], "c_t": c_t[nz]}
        )

    return docs.select(id_col, text_col).mapInPandas(
        fn, schema="b long, c_r long, c_t long"
    )


def _dsir_llr_np(c_r, c_t):
    """Driver-side numpy twin of the llr_arr transform in
    ``dsir_model_row`` — same fixed-point inverse probabilities, exact
    ``floor(log2)`` via ``lmquality._floor_log2_int64``."""
    import numpy as np

    from .lmquality import _floor_log2_int64

    r_total = np.int64(c_r.sum())
    t_total = np.int64(c_t.sum())
    q_r = ((r_total + DSIR_V) * (1 << DSIR_Q_BITS)) // (c_r + 1)
    q_t = ((t_total + DSIR_V) * (1 << DSIR_Q_BITS)) // (c_t + 1)
    return _floor_log2_int64(q_r) - _floor_log2_int64(q_t)


def dsir_select_kernel(
    docs: DataFrame, id_col: str, k: int = DSIR_K, text_col: str = "text"
) -> DataFrame:
    """SCALE-path twin of ``dsir_select`` — identical output (tested).

    Two passes, both kernel-side: (1) the model counts fold above, whose
    <= DSIR_V-row aggregate is collected once (64 KB — the bounded
    driver-side collect contract of the IVF codebook / decontaminate
    benchmark set) and turned into the llr array; (2) ONE ``mapInPandas``
    over the pruned (id, text) scan scoring every document against the
    closed-over llr array — ZERO corpus exchanges before the TakeOrdered
    heap. The SQL form's per-row interpreted HOF fold (the measured
    >8-thread anti-scaling ceiling) never runs.

    Precondition (shared with decontaminate_kernel): ``id_col`` is a
    key; under duplicate ids the SQL form scores merged rows identically
    anyway (the weight is a pure function of (id, text)). Ids must be
    NON-NEGATIVE (the whole pipeline's contract — ids are abs(hash)):
    numpy's ``%`` is floor-mod while Spark/DuckDB ``%`` is
    truncated-mod, so a negative id would split the target slice and
    the noise term between the kernel and the SQL twins."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import (
        _flat_shingles,
        _flat_word_hashes,
        _iter_text_chunks,
    )

    counts = (
        dsir_model_counts_kernel(docs, id_col, text_col)
        .groupBy("b")
        .agg(F.sum("c_r").alias("c_r"), F.sum("c_t").alias("c_t"))
        .collect()
    )
    c_r = np.zeros(DSIR_V, dtype=np.int64)
    c_t = np.zeros(DSIR_V, dtype=np.int64)
    for row in counts:
        c_r[row["b"]] = row["c_r"]
        c_t[row["b"]] = row["c_t"]
    # float64 lane for the bincount-weights fold below: |llr| <= ~60 and
    # per-doc feature counts are bounded by the doc length, so the float
    # partial sums stay far below 2^53 — exact
    llr_f = _dsir_llr_np(c_r, c_t).astype(np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for texts, ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                ids_np = np.asarray(ids, dtype=np.int64)
                ndoc = len(ids_np)
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                w = np.bincount(
                    wdoc, weights=llr_f[_bucket_np(wh_all)], minlength=ndoc
                )
                n_feats = n_tok.copy()
                keep = n_tok >= 2
                if keep.any():
                    wh_k = wh_all if keep.all() else wh_all[keep[wdoc]]
                    sh, _, n_sh = _flat_shingles(wh_k, n_tok[keep], 2)
                    kidx = np.nonzero(keep)[0]
                    didx = kidx[
                        np.repeat(np.arange(n_sh.size, dtype=np.int64), n_sh)
                    ]
                    w += np.bincount(
                        didx, weights=llr_f[_bucket_np(sh)], minlength=ndoc
                    )
                    n_feats[kidx] += n_sh
                weight = w.astype(np.int64)
                noise = (
                    (ids_np % PERM_P) * SAMPLE_MULT + SAMPLE_INC
                ) % PERM_P % (1 << DSIR_Q_BITS)
                yield pd.DataFrame(
                    {
                        id_col: ids_np,
                        "n_feats": n_feats,
                        "dsir_llr_bits": weight,
                        "dsir_key": weight * (1 << DSIR_Q_BITS) + noise,
                    }
                )

    scored = docs.select(id_col, text_col).mapInPandas(
        fn,
        schema=f"{id_col} long, n_feats long, dsir_llr_bits long, dsir_key long",
    )
    return scored.orderBy(
        F.col("dsir_key").desc(), F.col(id_col).asc()
    ).limit(k)


# ---------------------------------------------------------------------------
# 2. UniMax language allocation
# ---------------------------------------------------------------------------


def unimax_alloc(
    docs: DataFrame,
    id_col: str,
    budget_permille: int = UNIMAX_BUDGET_PERMILLE,
    epochs: int = UNIMAX_EPOCHS,
    text_col: str = "text",
) -> DataFrame:
    """UniMax waterfill: ``(lang, n_tokens, cap_tokens, alloc_tokens,
    capped, epochs_milli)`` — one row per language. ``alloc_tokens`` is
    the training-token budget the language receives; ``capped`` = 1 when
    its epoch cap binds; ``epochs_milli = 1000 * alloc div n_tokens``.
    Integer floors leave <= n_languages tokens of the budget
    unallocated — deliberate (allocations must be exact integers).

    The corpus aggregates once (map-side combine to n_languages rows);
    every window below runs over that bounded frame only."""
    toks = f"CAST(size({tokens_expr(text_col)}) AS BIGINT)"
    by_lang = (
        docs.select(F.col("lang"), F.expr(toks).alias("t"))
        .groupBy("lang")
        .agg(F.sum("t").alias("n_tokens"))
        .select("lang", "n_tokens", (F.lit(epochs) * F.col("n_tokens")).alias("cap_tokens"))
    )
    ordw = Window.orderBy("cap_tokens", "lang")
    allw = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    staged = by_lang.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        F.row_number().over(ordw).alias("rn"),
        F.sum("cap_tokens").over(
            ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("prefix"),
        F.count(F.lit(1)).over(allw).alias("n"),
        F.sum("n_tokens").over(allw).alias("tot"),
    ).withColumn(
        # integer div, NOT float-/ (a float quotient's cast could differ
        # from DuckDB's // above 2**53 total tokens)
        "budget",
        F.expr(f"(tot * {budget_permille}) div 1000"),
    ).withColumn(
        "capped",
        (F.col("cap_tokens") * (F.col("n") - F.col("rn"))
         <= F.col("budget") - F.col("prefix")).cast("int"),
    )
    final = staged.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        "capped",
        "budget",
        F.sum("capped").over(allw).alias("j_star"),
        F.sum(F.when(F.col("capped") == 1, F.col("cap_tokens")).otherwise(0))
        .over(allw).alias("capped_sum"),
        F.col("n"),
    ).withColumn(
        "theta",
        F.expr(
            "CASE WHEN j_star >= n THEN 0L "
            "ELSE (budget - capped_sum) div (n - j_star) END"
        ),
    )
    return final.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        F.expr(
            "CASE WHEN capped = 1 THEN cap_tokens "
            "ELSE least(cap_tokens, theta) END"
        ).alias("alloc_tokens"),
        "capped",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0L ELSE (1000 * (CASE WHEN capped = 1 "
            "THEN cap_tokens ELSE least(cap_tokens, theta) END)) div n_tokens END"
        ).alias("epochs_milli"),
    )


def unimax_alloc_sql(
    id_col: str,
    table: str = "documents",
    budget_permille: int = UNIMAX_BUDGET_PERMILLE,
    epochs: int = UNIMAX_EPOCHS,
) -> str:
    """DuckDB twin of ``unimax_alloc`` — identical waterfill arithmetic."""
    toks = f"CAST(len({tokens_sql('text')}) AS BIGINT)"
    return f"""WITH by_lang AS (
  SELECT lang,
         CAST(sum({toks}) AS BIGINT) AS n_tokens,
         CAST({epochs} * sum({toks}) AS BIGINT) AS cap_tokens
  FROM {table} GROUP BY lang
),
staged AS (
  SELECT lang, n_tokens, cap_tokens,
         row_number() OVER (ORDER BY cap_tokens, lang) AS rn,
         sum(cap_tokens) OVER (ORDER BY cap_tokens, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         count(*) OVER () AS n,
         CAST((sum(n_tokens) OVER ()) * {budget_permille} // 1000
           AS BIGINT) AS budget
  FROM by_lang
),
flagged AS (
  SELECT *, CAST(cap_tokens * (n - rn) <= budget - prefix AS INT) AS capped
  FROM staged
),
solved AS (
  SELECT *,
         sum(capped) OVER () AS j_star,
         sum(CASE WHEN capped = 1 THEN cap_tokens ELSE 0 END) OVER ()
           AS capped_sum
  FROM flagged
)
SELECT lang, n_tokens, cap_tokens,
       CAST(CASE WHEN capped = 1 THEN cap_tokens
            ELSE least(cap_tokens, CASE WHEN j_star >= n THEN 0
              ELSE (budget - capped_sum) // (n - j_star) END) END
         AS BIGINT) AS alloc_tokens,
       capped,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (1000 * (CASE WHEN capped = 1 THEN cap_tokens
              ELSE least(cap_tokens, CASE WHEN j_star >= n THEN 0
                ELSE (budget - capped_sum) // (n - j_star) END) END))
              // n_tokens END
         AS BIGINT) AS epochs_milli
FROM solved"""


# ---------------------------------------------------------------------------
# 3. leakage-safe train/test split
# ---------------------------------------------------------------------------

#: test-slice size (permille of clusters) and the split LCG — a distinct
#: public LCG (Knuth MMIX) reduced mod the Mersenne prime, so the split
#: hash is independent of the sampling LCG (a doc's sample decision and
#: its cluster's split decision must not correlate).
SPLIT_TEST_PERMILLE = 100
SPLIT_MULT = 2862933555777941757 % PERM_P
SPLIT_INC = 3037000493 % PERM_P


def split_term(cluster_col: str) -> str:
    """The cluster-keyed split hash in [0, 1000) — valid in BOTH
    compilers."""
    return (
        f"((({cluster_col} % {PERM_P}) * {SPLIT_MULT} + {SPLIT_INC}) "
        f"% {PERM_P}) % 1000"
    )


def cluster_split(
    members: DataFrame,
    id_col: str,
    test_permille: int = SPLIT_TEST_PERMILLE,
) -> DataFrame:
    """Leakage-safe train/test split: hash the CLUSTER id, not the doc
    id, so every member of a near-dup cluster lands on the same side —
    near-duplicates can never straddle the boundary (the train/test
    contamination Lee et al. 2022 §6.2 measure: eval examples with a
    near-dup in train overstate model quality; splitting by doc hash
    reintroduces exactly that leak for every non-singleton cluster).

    ``members``: (id_col, cluster_id). Returns (doc_id, cluster_id,
    split_permille, is_test) for every member. Narrow projection — no
    shuffle beyond what produced ``members``; deterministic across runs,
    engines, and partitionings (LCG, not ``F.rand``)."""
    return members.select(
        id_col,
        "cluster_id",
        F.expr(f"CAST({split_term('cluster_id')} AS BIGINT)").alias(
            "split_permille"
        ),
        F.expr(
            f"CAST({split_term('cluster_id')} < {test_permille} AS INT)"
        ).alias("is_test"),
    )


# ---------------------------------------------------------------------------
# 4. selection-verdict CASE (shared source of truth for the composition
#    lane wired in __spark_entry__.py)
# ---------------------------------------------------------------------------


def verdict_case_sql() -> str:
    """The per-document first-failing-reason CASE — valid in BOTH
    compilers, over columns (is_exact_dup, neardup_keep, contaminated,
    c4_keep, repetition_pass). Priority mirrors the pipeline's stage
    order: exact dedup runs first (cheapest gate), then near-dup
    elimination, then decontamination, then the quality gates."""
    return (
        "CASE WHEN is_exact_dup = 1 THEN 'exact_dup' "
        "WHEN neardup_keep = 0 THEN 'near_dup' "
        "WHEN contaminated = 1 THEN 'contaminated' "
        "WHEN c4_keep = 0 THEN 'quality_c4' "
        "WHEN repetition_pass = 0 THEN 'repetition' "
        "ELSE 'kept' END"
    )

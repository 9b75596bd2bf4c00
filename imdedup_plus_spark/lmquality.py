"""CCNet-style language-model quality bucketing (head / middle / tail).

The CCNet pipeline (Wenzek et al. 2019, "CCNet: Extracting high quality
monolingual datasets from web crawl data", arXiv 1911.00359) scores
every Common-Crawl document with a language model trained on a trusted
seed corpus (Wikipedia) and splits the crawl into HEAD / MIDDLE / TAIL
perplexity tertiles — the standard quality gate LLaMA-class pipelines
run beside dedup. This module is that operator with the engine's
determinism discipline:

* **LM**: a hashed-vocabulary unigram model with add-one smoothing,
  "trained" on the deterministic seed slice ``doc_id % LM_SEED_MOD = 0``
  (the Wikipedia stand-in; at deployment the seed frame is simply a
  different table). Hashing bounds the vocabulary at ``LM_V`` buckets —
  counts are ONE dense broadcast row, never a corpus-sized vocab join.
* **Score**: integer log2-perplexity. Per token,
  ``q = ((T + V) * 1024) div (cnt[b(h)] + 1)`` is the inverse smoothed
  probability in 10 fixed-point bits, and ``floor(log2 q)`` is computed
  EXACTLY as ``length(bin(q)) - 1`` — a string-length of the binary
  representation, identical in Spark and DuckDB, no transcendental
  float whose last ulp could differ between engines. The per-doc score
  is the mean in milli-bits:
  ``lm_bits_milli = 1000 * (sum_bits - 10 * n_tokens) div n_tokens``
  (the -10 removes the fixed-point scale), i.e. integer-truncated
  log2(perplexity) * 1000. Token-free documents are excluded (a mean
  over zero tokens is undefined; CCNet drops empty docs upstream).
* **Buckets**: exact corpus tertiles. The score domain is BOUNDED BY
  CONSTRUCTION (0 .. ~60,000 milli-bits regardless of corpus size), so
  cutoffs come from a running sum over the grouped score histogram —
  a window over <= |score domain| rows, never a corpus-wide sort.
  ``c1 = min{s : 3 * cum(s) >= n}``, ``c2 = min{s : 3 * cum(s) >= 2n}``;
  bucket 0 (head, fluent) = score <= c1, 1 (middle) = score <= c2,
  2 (tail, far from the LM) otherwise. Boundary ties share a bucket —
  the deterministic CCNet-faithful choice (cutoffs are score values,
  not per-doc ranks).

Honest deviation from CCNet, stated plainly: CCNet scores with a
5-gram Kneser-Ney KenLM; this lane is a unigram model over hashed
buckets. The *mechanism* under test — seed-LM scoring, bounded-memory
model broadcast, exact tertile bucketing — is CCNet's; the model
itself is the simplest member of the family that keeps the
two-compilers bit-exactness (higher-order backoff needs float log-space
interpolation). Swapping the per-token score for a richer model changes
ONE expression in each compiler.

Reference discipline: the reference has no quality gate (its corpus is
trusted camera imagery); this lane exists for the north rule's
Common-Crawl shape, beside the C4 gate (``hygiene.c4_filters``) and the
Gopher repetition gate (``trainprep.repetition_stats``) — CCNet is the
third canonical member of that family.

Scale notes (100 TB): seed counts shuffle <= LM_V rows per map task
(partial agg); the model is ONE broadcast row (LM_V BIGINTs = 128 KB);
scoring is a per-row fold over the broadcast row — ZERO corpus
exchanges in the Column form; the histogram shuffle is score-domain
bounded; cutoffs are one broadcast row. The production path is
``lm_quality_kernel`` (Arrow batches, the per-row JVM HOF fold is the
known >8-thread anti-scaling ceiling); Column/SQL forms are the
oracle-shaped twins, bit-identical by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import HASH_MOD, PERM_P
from .oracle import tokens_sql, word_hashes_sql
from .trainprep import _wh_cte, _wh_df

#: deterministic seed slice: every LM_SEED_MOD-th document trains the LM
#: (the Wikipedia stand-in; co-prime with BENCH_MOD=41 / CMS_CAND_MOD=20
#: so the three deterministic samples interleave rather than nest).
LM_SEED_MOD = 17
#: hashed vocabulary width (buckets). 2**14 * 8 B = 128 KB dense row;
#: production sizing is V >~ a few x the true vocab to keep collision
#: mass low — still one broadcast row at 2**24.
LM_V = 1 << 14
#: bucket permutation (another public xxhash32 prime; B from the same
#: family as the other lanes' affine constants).
LM_A = 2246822519
LM_B = 11
#: fixed-point scale: 10 bits (q carries log2 in excess-10)
LM_Q_BITS = 10
assert LM_A * (HASH_MOD - 1) + LM_B < 2**63  # int64/BIGINT safety


def _bucket_term(h_var: str) -> str:
    """Vocab-bucket expression — valid in BOTH Spark SQL and DuckDB."""
    return f"((({LM_A} * {h_var} + {LM_B}) % {PERM_P}) % {LM_V})"


def _floor_log2_int64(q):
    """Exact ``floor(log2 q)`` for an int64 array of q >= 1 — the numpy
    twin of ``length(bin(q)) - 1``. float64 holds integers exactly below
    2**53, so values >= 2**36 are pre-shifted right 16 bits (exponent
    corrected by +16); the shifted value < 2**47 stays exact and the
    low bits discarded by the shift cannot change floor(log2)."""
    import numpy as np

    shift = np.where(q >= np.int64(1) << 36, 16, 0)
    _, e = np.frexp((q >> shift).astype(np.float64))
    return (e - 1 + shift).astype(np.int64)


def lm_seed_row(docs: DataFrame, id_col: str) -> DataFrame:
    """ONE row ``(lm_arr: array<bigint> of LM_V bucket counts,
    t_total: bigint)`` — the trained unigram model, broadcast-class."""
    seed_tok = _wh_df(
        docs.where(F.col(id_col) % LM_SEED_MOD == 0), id_col
    ).select(F.explode("wh").alias("h"))
    buckets = seed_tok.select(
        F.expr(_bucket_term("h")).alias("b")
    ).groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # two steps: Spark rejects aggregate functions inside lambda bodies
    return buckets.agg(
        F.expr("map_from_entries(collect_list(struct(b, c)))").alias("bm"),
        F.sum("c").alias("t_total"),
    ).select(
        F.expr(
            f"transform(sequence(0, {LM_V - 1}), "
            "k -> coalesce(element_at(bm, k), 0L))"
        ).alias("lm_arr"),
        F.coalesce(F.col("t_total"), F.lit(0)).cast("long").alias("t_total"),
    )


def _scores(docs: DataFrame, id_col: str) -> DataFrame:
    """Per-doc integer LM score: (id_col, n_tokens, lm_bits_milli).
    Zero corpus exchanges: one broadcast crossJoin + a per-row fold."""
    seed = lm_seed_row(docs, id_col)
    q = (
        f"((t_total + {LM_V}) * {1 << LM_Q_BITS}) div "
        f"(element_at(lm_arr, CAST({_bucket_term('h')} AS INT) + 1) + 1)"
    )
    bits_sum = (
        f"aggregate(wh, 0L, (acc, h) -> acc + length(bin({q})) - 1)"
    )
    return (
        _wh_df(docs, id_col)
        .crossJoin(F.broadcast(seed))
        .select(
            F.col("id").alias(id_col),
            F.expr("CAST(size(wh) AS BIGINT)").alias("n_tokens"),
            F.expr(bits_sum).alias("_bits"),
        )
        .where(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            F.expr(
                f"(1000 * (_bits - {LM_Q_BITS} * n_tokens)) div n_tokens"
            ).alias("lm_bits_milli"),
        )
    )


def _cutoffs(scores: DataFrame) -> DataFrame:
    """ONE row ``(c1, c2)`` — exact tertile cutoff scores from the
    grouped score histogram. The unpartitioned running-sum window is
    over <= |score domain| rows (bounded by construction, NOT by corpus
    size — see module docstring), the same bounded-window contract as
    the streaming epoch manifests."""
    hist = scores.groupBy("lm_bits_milli").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = hist.select(
        "lm_bits_milli",
        F.sum("cnt").over(
            Window.orderBy("lm_bits_milli").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    return cum.agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("lm_bits_milli")))
        .alias("c1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("lm_bits_milli"))
        ).alias("c2"),
    )


def _bucket_tail(scores: DataFrame, id_col: str) -> DataFrame:
    """Shared readout: broadcast the cutoff row onto the scores."""
    return scores.crossJoin(F.broadcast(_cutoffs(scores))).select(
        id_col,
        "n_tokens",
        "lm_bits_milli",
        F.expr(
            "CASE WHEN lm_bits_milli <= c1 THEN 0 "
            "WHEN lm_bits_milli <= c2 THEN 1 ELSE 2 END"
        ).cast("int").alias("ppl_bucket"),
    )


def lm_quality(docs: DataFrame, id_col: str) -> DataFrame:
    """Per-document LM quality: ``(id_col, n_tokens, lm_bits_milli,
    ppl_bucket)`` with ppl_bucket 0=head / 1=middle / 2=tail.
    Oracle-shaped Column form; the kernel twin is the scale path."""
    return _bucket_tail(_scores(docs, id_col), id_col)


def lm_quality_sql(id_col: str, table: str = "documents") -> str:
    """DuckDB twin of ``lm_quality`` — identical bucket, fixed-point,
    bin-length and cutoff arithmetic."""
    q = (
        f"((o.t_total + {LM_V}) * {1 << LM_Q_BITS}) // "
        f"(o.lm_arr[CAST({_bucket_term('h')} AS INT) + 1] + 1)"
    )
    seed_wh = word_hashes_sql(tokens_sql("text"))
    return f"""WITH seed_tok AS (
  SELECT unnest({seed_wh}) AS h
  FROM {table} WHERE {id_col} % {LM_SEED_MOD} = 0
),
buckets AS (
  SELECT {_bucket_term('h')} AS b, CAST(count(*) AS BIGINT) AS c
  FROM seed_tok GROUP BY 1
),
one_row AS (
  SELECT (SELECT list(coalesce(b.c, CAST(0 AS BIGINT)) ORDER BY g.k)
          FROM generate_series(0, {LM_V - 1}) AS g(k)
          LEFT JOIN buckets b ON b.b = g.k) AS lm_arr,
         (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM buckets)
           AS t_total
),
{_wh_cte(id_col, table)},
scores AS (
  SELECT id AS {id_col},
         CAST(len(wh) AS BIGINT) AS n_tokens,
         CAST((1000 * (list_aggregate(list_transform(wh,
             h -> CAST(length(bin({q})) - 1 AS BIGINT)), 'sum')
           - {LM_Q_BITS} * CAST(len(wh) AS BIGINT)))
           // CAST(len(wh) AS BIGINT) AS BIGINT) AS lm_bits_milli
  FROM wh CROSS JOIN one_row o
  WHERE len(wh) > 0
),
hist AS (
  SELECT lm_bits_milli, count(*) AS cnt FROM scores GROUP BY 1
),
cum AS (
  SELECT lm_bits_milli,
         sum(cnt) OVER (ORDER BY lm_bits_milli) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
),
cuts AS (
  SELECT min(CASE WHEN cum * 3 >= n THEN lm_bits_milli END) AS c1,
         min(CASE WHEN cum * 3 >= 2 * n THEN lm_bits_milli END) AS c2
  FROM cum
)
SELECT s.{id_col}, s.n_tokens, s.lm_bits_milli,
       CAST(CASE WHEN s.lm_bits_milli <= c.c1 THEN 0
                 WHEN s.lm_bits_milli <= c.c2 THEN 1 ELSE 2 END AS INT)
         AS ppl_bucket
FROM scores s CROSS JOIN cuts c"""


def lm_quality_kernel(
    docs: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """SCALE-path twin of ``lm_quality`` — identical output columns
    (parity-tested). The trained model (LM_V int64 counts + total) is
    collected once (bounded: one row) and captured in the closure (the
    broadcast analog); one ``mapInPandas`` over the pruned (id, text)
    scan scores each Arrow batch vectorized; the bounded histogram /
    cutoff / bucket tail is shared with the Column form.

    ``floor(log2 q)`` is computed exactly via ``np.frexp`` on a value
    pre-shifted to < 2**53 (``q >> 16`` when q >= 2**36, exponent + 16)
    — bit-identical to ``length(bin(q)) - 1`` for all int64 q >= 1.

    Precondition (shared with the other kernel twins): ``id_col`` is a
    key; under duplicate ids the SQL form scores merged rows."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import _flat_word_hashes, _iter_text_chunks

    seed = lm_seed_row(docs, id_col).collect()[0]
    lm_arr = np.asarray(seed["lm_arr"], dtype=np.int64)
    t_total = int(seed["t_total"])
    num = (t_total + LM_V) << LM_Q_BITS
    _bits = _floor_log2_int64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for texts, ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                h = wh_all.astype(np.int64)
                # LM_A * h + LM_B < 2**63 (module assert): exact in int64
                b = ((LM_A * h + LM_B) % PERM_P) % LM_V
                q = num // (lm_arr[b] + 1)
                bits = np.zeros(n_tok.size, dtype=np.int64)
                np.add.at(bits, wdoc, _bits(q))
                keep = n_tok > 0
                ids_np = np.asarray(ids, dtype=np.int64)[keep]
                n_k = n_tok[keep]
                score = (1000 * (bits[keep] - LM_Q_BITS * n_k)) // n_k
                yield pd.DataFrame(
                    {
                        id_col: ids_np,
                        "n_tokens": n_k,
                        "lm_bits_milli": score,
                    }
                )

    scores = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, schema=f"{id_col} long, n_tokens long, lm_bits_milli long"
    )
    return _bucket_tail(scores, id_col)

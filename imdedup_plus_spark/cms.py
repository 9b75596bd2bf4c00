"""Count-Min sketch n-gram frequency / over-represented-gram detection.

Completes the engine's sketch family: KMV answers *how many distinct*
(``metrics.distinct_shingle_estimate``), Bloom answers *membership*
(``bloom.bloom_decontaminate``) — the Count-Min sketch (Cormode &
Muthukrishnan 2005, "An improved data stream summary") answers *point
frequency*: how often does this n-gram occur across the corpus. The
training-data use case is over-represented-gram detection — boilerplate
navigation strings, license headers, template sentences that survive
document-level dedup because they ride inside otherwise-distinct pages.
At 10^12 documents the exact answer (``groupBy(gram).count()``) is a
shuffle keyed by the gram universe (~10^14-10^15 keys); the CMS caps
the shuffle at ``d x w`` counter cells REGARDLESS of corpus size, at
the cost of one-sided error: estimates can only OVERSTATE, never
understate (min over d rows of non-negative counter sums).

Reference discipline: the reference's exact feature-table accounting
(``/root/reference/main.c:483-487`` tallies every super-feature insert
into SF_NUM exact hash tables) is the in-memory exact analog; this lane
is its bounded-memory replacement, the same relationship the KMV lane
has to the distinct count.

Arithmetic (identical in the Spark Column form, the DuckDB oracle and
the numpy kernel — all BIGINT-safe, see the overflow assert):

    col_i(h)  = ((K_i * h + B_i) mod PERM_P) mod w        i = 0..d-1
    idx_i(h)  = i * w + col_i(h)                          flat cell index
    cell[idx] = SUM over every gram occurrence mapping there
    est(h)    = min_i cell[idx_i(h)]

One-sided-error law, proven IN the official oracle row: the output
carries ``exact_count`` (the verification term — built from the same
gram stream restricted to the bounded candidate set) next to
``cms_estimate``, so ``n_overestimate = cms_estimate - exact_count`` is
>= 0 by construction and the driver compare certifies both engines
agree on every overestimate. A production deployment drops the exact
term and ships the sketch alone — which is the entire point.

Candidate probe set: a CMS answers point queries, so heavy-hitter
READOUT needs candidates to probe. The classical streaming answer
(a heap beside the sketch) is inherently sequential; the distributed
analog used here is a deterministic document sample (every
``CMS_CAND_MOD``-th doc contributes its distinct grams) — any gram
over-represented corpus-wide appears in some sampled doc with
probability -> 1 as its document frequency grows, and the sample size
is corpus-fraction-bounded by construction. The emission rule is the
scale-shaped one: ``cms_estimate >= CMS_HH_MIN`` (a superset of the
true rule by the one-sided law; ``is_true_hh`` labels the difference).

Scale notes (100 TB): the sketch build's shuffle is <= d*w rows per
map task (partial aggregation combines within partitions); the dense
sketch is ONE broadcast row of d*w/8 bytes (2 MB at the defaults); the
candidate set and its exact counts are sample-bounded. The production
path is ``cms_heavy_hitters_kernel`` (one mapInPandas pass emits cell
partials AND candidate-hit partials together); the Column/SQL forms
are the oracle-shaped twins, bit-identical by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import HASH_MOD, PERM_P
from .oracle import shingles_sql, tokens_sql, word_hashes_sql
from .signatures import shingles_expr
from .trainprep import DUP_NGRAM, _wh_cte, _wh_df

#: sketch depth (rows) and width (columns per row). w = 2**16 holds the
#: sf0.01 gram stream (~21k occurrences) at a measured ~0.5% candidate
#: overestimate rate; production sizing is w ~= e * total_gram_mass /
#: acceptable_absolute_error (the CMS guarantee est <= exact + e*N/w
#: with prob 1 - exp(-d)), i.e. w grows with corpus mass while the
#: sketch stays d*w*8 bytes — 2 MB here, a few GB at 10^12 docs, still
#: one broadcast row.
CMS_D = 4
CMS_W = 1 << 16
#: affine multipliers: four of the public xxhash32 primes (Collet,
#: xxHash, public domain); B_i = i + 1 keeps rows distinct for h = 0.
CMS_KB: tuple[tuple[int, int], ...] = (
    (2654435761, 1),
    (2246822519, 2),
    (3266489917, 3),
    (668265263, 4),
)
assert len(CMS_KB) == CMS_D
#: every K_i * max(h) + B_i must stay below 2**63 (int64/BIGINT safety)
assert all(k * (HASH_MOD - 1) + b < 2**63 for k, b in CMS_KB)

#: deterministic candidate sample: every CMS_CAND_MOD-th document
#: contributes its distinct grams to the probe set.
CMS_CAND_MOD = 20
#: heavy-hitter emission threshold on the ESTIMATE (>= exact by the
#: one-sided law, so emission is a superset of the true rule).
CMS_HH_MIN = 2


def _flat_idx_terms(h_var: str, w: int) -> list[str]:
    """The d flat cell-index expressions — valid in BOTH Spark SQL and
    DuckDB (``%`` on non-negative BIGINTs is identical)."""
    return [
        f"({i} * {w} + ((({k} * {h_var} + {b}) % {PERM_P}) % {w}))"
        for i, (k, b) in enumerate(CMS_KB)
    ]


def _grams(docs: DataFrame, id_col: str, window: int) -> DataFrame:
    """Corpus gram OCCURRENCE stream (multiplicity kept — the sketch
    counts occurrences, not document frequency)."""
    return _wh_df(docs, id_col).select(
        F.explode(F.expr(shingles_expr("wh", window))).alias("h")
    )


def cms_cells(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    w: int = CMS_W,
) -> DataFrame:
    """The sketch as a ``(i, c)`` cell TABLE (<= d*w rows, sparse form).

    Plan shape: gram stream -> explode the d flat indices -> groupBy(idx)
    count (partial agg caps the shuffle at d*w rows per map task). The
    sketch stays a table rather than one dense-array row deliberately:
    the readout is a bounded JOIN against it (the cells side never
    reshuffles), and a dense ``transform(sequence(0, d*w-1))`` over a
    Spark MAP is an O(d*w * |cells|) linear-scan trap — ``element_at``
    on MapType is not a hash probe (measured stall at d*w = 2**18)."""
    idx_arr = ", ".join(_flat_idx_terms("h", w))
    return (
        _grams(docs, id_col, window)
        .select(F.explode(F.expr(f"array({idx_arr})")).alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _candidate_grams(
    docs: DataFrame, id_col: str, window: int, cand_mod: int
) -> DataFrame:
    """Bounded probe set: distinct grams of every ``cand_mod``-th doc."""
    return (
        _wh_df(docs.where(F.col(id_col) % cand_mod == 0), id_col)
        .select(F.explode(F.expr(shingles_expr("wh", window))).alias("h"))
        .distinct()
    )


def _probe_tail(
    exact: DataFrame,
    cells: DataFrame,
    w: int,
    hh_min: int,
) -> DataFrame:
    """Shared readout: explode each candidate's d cell indices, inner-
    join the cell table (the bounded PROBE side broadcasts; the cells
    side is never reshuffled), min over the d counters per candidate.
    The inner join is lossless: a candidate gram occurs in the corpus
    by construction, so all d of its cells hold counts >= 1.
    ``exact`` is (h, exact_count)."""
    idx_arr = ", ".join(_flat_idx_terms("h", w))
    probe = exact.select(
        "h", "exact_count", F.explode(F.expr(f"array({idx_arr})")).alias("i")
    )
    return (
        cells.join(F.broadcast(probe), "i")
        .groupBy("h", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .withColumn("n_overestimate", F.expr("cms_estimate - exact_count"))
        .withColumn(
            "is_true_hh", F.expr(f"CAST(exact_count >= {hh_min} AS INT)")
        )
        .where(F.col("cms_estimate") >= hh_min)
        .select(
            "h", "exact_count", "cms_estimate", "n_overestimate", "is_true_hh"
        )
    )


def cms_heavy_hitters(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    w: int = CMS_W,
    cand_mod: int = CMS_CAND_MOD,
    hh_min: int = CMS_HH_MIN,
) -> DataFrame:
    """Over-represented grams through the CMS, with exact counts
    alongside: ``(h, exact_count, cms_estimate, n_overestimate,
    is_true_hh)`` for every candidate whose ESTIMATE clears ``hh_min``.

    Oracle-shaped Column form. Two corpus passes (sketch build + the
    exact verification term); the kernel twin fuses them into one."""
    cells = cms_cells(docs, id_col, window, w)
    cand = _candidate_grams(docs, id_col, window, cand_mod)
    exact = (
        _grams(docs, id_col, window)
        .join(F.broadcast(cand), "h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return _probe_tail(exact, cells, w, hh_min)


def cms_heavy_hitters_sql(
    id_col: str,
    table: str = "documents",
    window: int = DUP_NGRAM,
    w: int = CMS_W,
    cand_mod: int = CMS_CAND_MOD,
    hh_min: int = CMS_HH_MIN,
) -> str:
    """DuckDB twin of ``cms_heavy_hitters`` — identical cell-index and
    min-readout arithmetic, join-shaped probe."""
    idx_list = ", ".join(_flat_idx_terms("h", w))
    return f"""WITH {_wh_cte(id_col, table)},
grams AS (SELECT unnest({shingles_sql('wh', window)}) AS h FROM wh),
idx AS (SELECT unnest([{idx_list}]) AS i FROM grams),
cells AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM idx GROUP BY 1),
cand AS (
  SELECT DISTINCT unnest({shingles_sql('cwh', window)}) AS h
  FROM (SELECT {word_hashes_sql(tokens_sql('text'))} AS cwh
        FROM {table} WHERE {id_col} % {cand_mod} = 0)
),
exact AS (
  SELECT g.h, CAST(count(*) AS BIGINT) AS exact_count
  FROM grams g JOIN cand USING (h) GROUP BY 1
),
probe AS (
  SELECT h, exact_count, unnest([{idx_list}]) AS i FROM exact
),
est AS (
  SELECT p.h, p.exact_count, min(c.c) AS cms_estimate
  FROM probe p JOIN cells c USING (i)
  GROUP BY 1, 2
)
SELECT h,
       exact_count,
       cms_estimate,
       cms_estimate - exact_count AS n_overestimate,
       CAST(exact_count >= {hh_min} AS INT) AS is_true_hh
FROM est
WHERE cms_estimate >= {hh_min}"""


def cms_heavy_hitters_kernel(
    docs: DataFrame,
    id_col: str,
    window: int = DUP_NGRAM,
    w: int = CMS_W,
    cand_mod: int = CMS_CAND_MOD,
    hh_min: int = CMS_HH_MIN,
    text_col: str = "text",
) -> DataFrame:
    """SCALE-path twin of ``cms_heavy_hitters`` — identical output
    columns (parity-tested). ONE ``mapInPandas`` pass over the pruned
    (id, text) scan emits BOTH partial streams — flat-cell counts
    (kind 0, <= d*w rows per task) and candidate-hit counts (kind 1,
    sample-bounded) — merged by one bounded groupBy; the readout tail
    is shared with the Column form.

    The candidate gram array is built once on the driver from the
    BOUNDED sample and captured in the closure (the broadcast analog,
    same contract as ``bloom.bloom_decontaminate_kernel``)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from .signatures import (
        _flat_shingles,
        _flat_word_hashes,
        _iter_text_chunks,
    )

    d = CMS_D
    cand_rows = _candidate_grams(docs, id_col, window, cand_mod).collect()
    cand = (
        np.sort(np.asarray([r["h"] for r in cand_rows], dtype=np.int64))
        if cand_rows
        else np.empty(0, dtype=np.int64)
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cells = np.zeros(d * w, dtype=np.int64)
        cand_cnt = np.zeros(cand.size, dtype=np.int64)
        for pdf in batches:
            for texts, _ids in _iter_text_chunks(
                pdf[id_col].values, pdf[text_col].values
            ):
                wh_all, wdoc, n_tok = _flat_word_hashes(texts)
                keep = n_tok >= window
                if not keep.any():
                    continue
                wh_k = wh_all if keep.all() else wh_all[keep[wdoc]]
                sh, _, _ = _flat_shingles(wh_k, n_tok[keep], window)
                h = sh.astype(np.int64)
                for i, (k, b) in enumerate(CMS_KB):
                    # k * h + b < 2**63 (module assert): exact in int64
                    col = ((k * h + b) % PERM_P) % w
                    np.add.at(cells, i * w + col, 1)
                if cand.size:
                    pos = np.searchsorted(cand, h)
                    hit = (pos < cand.size) & (
                        cand[np.minimum(pos, cand.size - 1)] == h
                    )
                    np.add.at(cand_cnt, pos[hit], 1)
        nz = np.flatnonzero(cells)
        cz = np.flatnonzero(cand_cnt)
        yield pd.DataFrame(
            {
                "kind": np.concatenate(
                    (np.zeros(nz.size, np.int32), np.ones(cz.size, np.int32))
                ),
                "k": np.concatenate((nz.astype(np.int64), cand[cz])),
                "c": np.concatenate((cells[nz], cand_cnt[cz])),
            }
        )

    partials = docs.select(
        F.col(id_col), F.col(text_col)
    ).mapInPandas(fn, schema="kind int, k long, c long")
    # materialize the bounded (kind, key, count) table ONCE: the cells
    # and exact branches both reference it and AQE's exchange reuse does
    # not collapse them (measured: the fused corpus pass re-ran per
    # branch without this)
    agg = (
        partials.groupBy("kind", "k")
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    cells = agg.where(F.col("kind") == 0).select(
        F.col("k").alias("i"), "c"
    )
    exact = agg.where(F.col("kind") == 1).select(
        F.col("k").alias("h"), F.col("c").alias("exact_count")
    )
    return _probe_tail(exact, cells, w, hh_min)

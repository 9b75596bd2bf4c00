"""Content-defined chunking (CDC) feature lane.

The reference ships three feature methods: the default 2df max-hash sketch
plus Rabin and Gear rolling-hash CDC variants
(``/root/reference/2df.c:272-355`` rabin, ``:356-396`` gear; hash tables
``rabin/rabin.c:42-133``, ``rabin/gear.c:3-260``). This module supplies the
CDC lane over web text:

* the rolling-window fingerprint is the shingle hash (identical window
  arithmetic to ``signatures.py`` — single source of truth for the
  constants);
* a chunk boundary falls wherever the fingerprint passes the divisor test
  ``fp % divisor == remainder`` — the textbook Rabin-CDC boundary rule
  (the gear variant's ``(fp & mask) == 0`` test, ``2df.c:383-390``, is the
  power-of-two special case);
* each chunk gets an order-preserving polynomial fingerprint, enabling
  **segment-level dedup across documents** (the storage-dedup use of CDC:
  two pages sharing a boilerplate paragraph produce an identical chunk
  hash even when the pages as wholes are dissimilar).

Scale shape: shingling is a narrow map; the only shuffle is the
per-document window (posexplode -> cumulative boundary count), the same
cost class as the band-explode shuffle of the LSH lane. Expected chunk
length is ``divisor`` shingles, so the chunk table is ~n_shingles/divisor
rows. All arithmetic is integer modular math < 2**62 — the DuckDB oracle
replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import HASH_MOD, SHINGLE_MULT, DedupConfig
from .signatures import shingles_expr, valid_documents, word_hashes_expr

#: expected chunk length in shingles (the reference's avg-chunk-size knob).
#: MUST be coprime to HASH_MOD: the shingle fp is a base-31/base-1000003
#: polynomial mod 2**31, so its low bits are a badly biased small-base
#: polynomial mod 2**k — with a power-of-two divisor the boundary test
#: reads ONLY those bits and can fire never (measured: 0 boundaries in
#: 199 uniform-ish shingles at divisor 16). A prime divisor folds every
#: bit into the test and the boundary rate is the textbook 1/divisor.
#: (The reference's gear variant gets away with a power-of-two mask,
#: 2df.c:383-390, because gear hashes mix high bits into low per step.)
CDC_DIVISOR = 17
CDC_REMAINDER = 0


#: gear variant (2df.c:356-396 analog): rolling accumulator
#: g_i = (2*g_{i-1} + fp_i) mod 2**31 — the mod makes shingles older than
#: 31 steps vanish EXACTLY (2**31 = 0 mod HASH_MOD), so the window is
#: implicit, like gear's shift-out. Boundary test is top-bits-zero
#: (g < 2**(31-GEAR_MASK_BITS)): the TOP bits of g are well mixed (every
#: fp contributes upward via the doubling), whereas the low bits inherit
#: the shingle hash's low-bit bias — the same reason the divisor rule
#: above must be prime. Expected chunk length = 2**GEAR_MASK_BITS.
GEAR_MASK_BITS = 4
GEAR_WINDOW = 31


def _shingle_stream(docs: DataFrame, cfg: DedupConfig, id_col: str,
                    text_col: str = "text") -> DataFrame:
    v = valid_documents(docs, cfg, text_col)
    return (
        v.withColumn("word_hashes", F.expr(word_hashes_expr("tokens")))
        .withColumn("shingles", F.expr(shingles_expr("word_hashes", cfg.shingle_window)))
        .where(F.size("shingles") > 0)
        .select(F.col(id_col), "shingles")
    )


def _assemble_chunks(pos: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, fp, boundary) -> (id, chunk_id, chunk_hash, chunk_len).
    A boundary shingle ENDS its chunk; ``chunk_id`` is the 0-based running
    boundary count before the position, so an edit inside one chunk shifts
    no other chunk's content — the CDC invariant."""
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = pos.withColumn(
        "chunk_id", (F.sum("boundary").over(w) - F.col("boundary")).cast("int")
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("chunk_len"),
            F.sort_array(F.collect_list(F.struct("pos", "fp"))).alias("rows"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.expr(
                f"aggregate(transform(rows, r -> r.fp), 0L, "
                f"(acc, h) -> (acc * {SHINGLE_MULT} + h) % {HASH_MOD})"
            ).alias("chunk_hash"),
            "chunk_len",
        )
    )


def cdc_chunks(
    docs: DataFrame, cfg: DedupConfig, id_col: str,
    divisor: int = CDC_DIVISOR, remainder: int = CDC_REMAINDER,
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, chunk_hash, chunk_len): content-defined chunks of the
    shingle stream under the rabin-style prime-divisor boundary rule."""
    sh = _shingle_stream(docs, cfg, id_col, text_col)
    pos = sh.select(
        F.col(id_col), F.posexplode("shingles").alias("pos", "fp")
    ).withColumn(
        "boundary",
        F.when(F.col("fp") % divisor == remainder, F.lit(1)).otherwise(F.lit(0)),
    )
    return _assemble_chunks(pos, id_col)


def gear_chunks(
    docs: DataFrame, cfg: DedupConfig, id_col: str,
    mask_bits: int = GEAR_MASK_BITS, text_col: str = "text",
) -> DataFrame:
    """Gear-CDC variant: boundaries where the rolling doubling accumulator
    has its top ``mask_bits`` bits zero. The accumulator at position i is
    a weighted sum of the last ``GEAR_WINDOW`` shingles (older terms carry
    factor 2**31 = 0 mod the hash domain), computed per position with an
    ordered fold over the array slice — O(n * window) narrow map, the
    same cost class as the byte-delta chunker."""
    thresh = 1 << (31 - mask_bits)
    g = (
        f"aggregate(slice(shingles, greatest(1, i - {GEAR_WINDOW - 1}), "
        f"i - greatest(1, i - {GEAR_WINDOW - 1}) + 1), 0L, "
        f"(acc, h) -> (acc * 2 + h) % {HASH_MOD})"
    )
    sh = _shingle_stream(docs, cfg, id_col, text_col)
    pos = (
        sh.withColumn(
            "bnds",
            F.expr(
                f"transform(sequence(1, size(shingles)), i -> "
                f"CASE WHEN {g} < {thresh} THEN 1 ELSE 0 END)"
            ),
        )
        .select(
            F.col(id_col),
            F.posexplode(F.arrays_zip("shingles", "bnds")).alias("pos", "z"),
        )
        .select(
            F.col(id_col), "pos",
            F.col("z.shingles").alias("fp"),
            F.col("z.bnds").alias("boundary"),
        )
    )
    return _assemble_chunks(pos, id_col)


def shared_chunks(chunks: DataFrame, id_col: str) -> DataFrame:
    """Cross-document chunk-level dedup: chunk hashes carried by >= 2
    distinct documents (the CDC storage-dedup signal — shared boilerplate
    segments). One groupBy shuffle on chunk_hash."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _chunk_ctes(boundary_expr: str) -> str:
    """Shared CTE skeleton of both chunker oracles: per-position boundary
    flag (``boundary_expr`` is a SQL expression over ``id``/``shingles``/
    ``i`` yielding 0/1), cumulative-boundary chunk ids, ordered chunk-hash
    fold (same combiner + init as Spark's ``aggregate(..., 0L, ...)`` —
    ``list_reduce`` with a prepended 0). Single source so a fix to the
    window or the fold cannot drift between the rabin and gear oracles."""
    return f"""
cdc_pos AS (
  SELECT id, i - 1 AS pos, shingles[i] AS fp,
         {boundary_expr} AS boundary
  FROM (
    SELECT id, shingles, unnest(generate_series(1, len(shingles))) AS i
    FROM sh WHERE len(shingles) > 0
  )
),
cdc_chunked AS (
  SELECT id, pos, fp,
         CAST(sum(boundary) OVER (PARTITION BY id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - boundary AS INT)
           AS chunk_id
  FROM cdc_pos
),
cdc_chunks AS (
  SELECT id, chunk_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list(fp ORDER BY pos)),
                     (acc, h) -> (acc * {SHINGLE_MULT} + h) % {HASH_MOD}) AS chunk_hash,
         CAST(count(*) AS BIGINT) AS chunk_len
  FROM cdc_chunked GROUP BY 1, 2
)"""


def cdc_chunks_ctes(divisor: int = CDC_DIVISOR, remainder: int = CDC_REMAINDER) -> str:
    """CTEs over the pipeline chain's ``sh`` stage (id, shingles) replaying
    ``cdc_chunks`` bit-for-bit — the rabin-style prime-divisor boundary."""
    return _chunk_ctes(
        f"CASE WHEN shingles[i] % {divisor} = {remainder} THEN 1 ELSE 0 END"
    )


def cdc_stage_query(
    cfg: DedupConfig, select: str, id_col: str = "doc_id",
    table: str = "documents", divisor: int = CDC_DIVISOR,
    remainder: int = CDC_REMAINDER,
) -> str:
    from .oracle import pipeline_ctes

    return (
        f"WITH RECURSIVE {pipeline_ctes(cfg, id_col, table)},"
        f"{cdc_chunks_ctes(divisor, remainder)}\n{select}"
    )


def gear_chunks_ctes(mask_bits: int = GEAR_MASK_BITS) -> str:
    """CTEs replaying ``gear_chunks`` bit-for-bit: per-position fold over
    the trailing GEAR_WINDOW-slice (DuckDB 1-based inclusive list slices,
    same ordered doubling fold)."""
    thresh = 1 << (31 - mask_bits)
    g = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"shingles[greatest(1, i - {GEAR_WINDOW - 1}) : i]), "
        f"(acc, h) -> (acc * 2 + h) % {HASH_MOD})"
    )
    return _chunk_ctes(f"CASE WHEN ({g}) < {thresh} THEN 1 ELSE 0 END")


def gear_stage_query(
    cfg: DedupConfig, select: str, id_col: str = "doc_id",
    table: str = "documents", mask_bits: int = GEAR_MASK_BITS,
) -> str:
    from .oracle import pipeline_ctes

    return (
        f"WITH RECURSIVE {pipeline_ctes(cfg, id_col, table)},"
        f"{gear_chunks_ctes(mask_bits)}\n{select}"
    )

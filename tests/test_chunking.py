"""Content-defined chunking lane: boundary rule, edit locality, and
cross-document shared-segment detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdedup_plus_spark import chunking as CH
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG


def _chunks(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return CH.cdc_chunks(docs, CFG, "doc_id")


def test_cdc_chunks_cover_shingles(spark, sf001_docs):
    """Chunk lengths per doc must sum to the doc's shingle count, and the
    average chunk length should be near the divisor."""
    ch = CH.cdc_chunks(sf001_docs, CFG, "doc_id")
    agg = ch.groupBy("doc_id").agg(
        F.sum("chunk_len").alias("total"), F.count(F.lit(1)).alias("n_chunks")
    )
    from imdedup_plus_spark import signatures as S

    v = S.valid_documents(sf001_docs, CFG)
    n_sh = v.select(
        "doc_id", (F.size("tokens") - CFG.shingle_window + 1).alias("n_shingles")
    ).where(F.col("n_shingles") > 0)
    j = agg.join(n_sh, "doc_id")
    bad = j.where(F.col("total") != F.col("n_shingles")).count()
    assert bad == 0
    tot, cnt = j.agg(F.sum("total"), F.sum("n_chunks")).collect()[0]
    assert CH.CDC_DIVISOR / 3 <= tot / cnt <= CH.CDC_DIVISOR * 3


def test_cdc_edit_locality(spark):
    """The CDC invariant: an edit inside one chunk leaves every other
    chunk's fingerprint unchanged (boundaries are content-defined, not
    offset-defined — unlike fixed-size chunking)."""
    base = " ".join(f"tok{i}" for i in range(400))
    edited = base.replace("tok200", "EDITED")
    ch = _chunks(spark, [(1, base), (2, edited)]).collect()
    h1 = {r["chunk_hash"] for r in ch if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in ch if r["doc_id"] == 2}
    shared = h1 & h2
    # all but the edited chunk(s) survive byte-for-byte
    assert len(shared) >= len(h1) - 3
    assert h1 != h2


def test_cdc_shared_chunks_find_boilerplate(spark):
    """Two dissimilar pages sharing one boilerplate paragraph must share
    at least one chunk hash — the segment-level dedup signal."""
    boiler = " ".join(f"footer{i}" for i in range(60))
    a = " ".join(f"alpha{i}" for i in range(200)) + " " + boiler
    b = " ".join(f"beta{i}" for i in range(200)) + " " + boiler
    chunks = _chunks(spark, [(1, a), (2, b)])
    shared = CH.shared_chunks(chunks, "doc_id").collect()
    assert shared, "boilerplate segment must surface as a shared chunk"
    for r in shared:
        assert r["n_docs"] == 2


def _gchunks(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return CH.gear_chunks(docs, CFG, "doc_id")


def test_gear_chunks_cover_shingles(spark, sf001_docs):
    """Gear rule: chunk lengths still sum to the shingle count, with mean
    chunk length near 2**GEAR_MASK_BITS."""
    ch = CH.gear_chunks(sf001_docs, CFG, "doc_id")
    agg = ch.groupBy("doc_id").agg(
        F.sum("chunk_len").alias("total"), F.count(F.lit(1)).alias("n_chunks")
    )
    from imdedup_plus_spark import signatures as S

    v = S.valid_documents(sf001_docs, CFG)
    n_sh = v.select(
        "doc_id", (F.size("tokens") - CFG.shingle_window + 1).alias("n_shingles")
    ).where(F.col("n_shingles") > 0)
    j = agg.join(n_sh, "doc_id")
    assert j.where(F.col("total") != F.col("n_shingles")).count() == 0
    tot, cnt = j.agg(F.sum("total"), F.sum("n_chunks")).collect()[0]
    mean = tot / cnt
    exp = 2 ** CH.GEAR_MASK_BITS
    assert exp / 3 <= mean <= exp * 3


def test_gear_edit_locality(spark):
    """Edit locality holds under the gear rule too (the accumulator
    forgets a shingle after GEAR_WINDOW doublings, so an edit can only
    move boundaries within its own neighborhood)."""
    base = " ".join(f"tok{i}" for i in range(400))
    edited = base.replace("tok200", "EDITED")
    ch = _gchunks(spark, [(1, base), (2, edited)]).collect()
    h1 = {r["chunk_hash"] for r in ch if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in ch if r["doc_id"] == 2}
    shared = h1 & h2
    # the edit perturbs at most the chunks overlapping its 31-shingle
    # accumulator window on each side
    assert len(shared) >= len(h1) - 8
    assert h1 != h2

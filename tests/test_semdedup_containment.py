"""SemDeDup (ann.semantic_dedup*) and asymmetric containment
(candidates.containment_pairs*) — kernel/SQL twin parity, keeper-rule
semantics, and the doc-inside-doc case the symmetric verify rejects."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import ann, candidates as C, signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semantic_dedup_kernel_matches_sql_form(spark):
    emb = spark.read.parquet(EMB)
    a = _rows(ann.semantic_dedup(emb))
    b = _rows(ann.semantic_dedup_kernel(emb))
    assert a == b
    assert len(a) == emb.count()  # every (nonzero-norm) vector gets a row


def test_semantic_dedup_matches_duckdb_oracle(spark):
    emb = spark.read.parquet(EMB)
    got = _rows(ann.semantic_dedup_kernel(emb))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    cur = con.execute(ann.semantic_dedup_sql())
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


def test_semantic_dedup_keeper_rule_on_planted_dups(spark):
    # 8 deterministic "spread" vectors seed the codebook (smallest ids);
    # ids 100/101 are IDENTICAL -> cosine 1.0, same cell, tie on cell_cos
    # -> the smaller id survives, the larger is dropped
    import numpy as np

    rows = []
    for i in range(8):
        v = [0.0] * 64
        v[i] = 1.0
        v[(i + 11) % 64] = 0.5
        rows.append((i, v))
    dup = [float((j * 7 + 3) % 5 - 2) for j in range(64)]
    rows.append((100, dup))
    rows.append((101, list(dup)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in ann.semantic_dedup_kernel(
            emb, threshold_permille=950
        ).collect()
    }
    assert out[100]["n_dup_neighbors"] == 1
    assert out[101]["n_dup_neighbors"] == 1
    assert out[100]["cell_id"] == out[101]["cell_id"]
    assert out[100]["keep"] == 1  # tie on cell_cos -> smaller id kept
    assert out[101]["keep"] == 0
    # no collateral: everything else is far below the threshold
    assert all(out[i]["keep"] == 1 for i in range(8))


def test_semantic_dedup_every_dup_group_retains_a_keeper(spark):
    # the (cell_cos, id)-minimal dup-involved member of each cell is
    # unbeaten by construction — assert the corpus-level consequence
    emb = spark.read.parquet(EMB)
    out = ann.semantic_dedup_kernel(emb, threshold_permille=350)
    bad = (
        out.where("n_dup_neighbors > 0")
        .groupBy("cell_id")
        .agg(F.max("keep").alias("any_keep"))
        .where("any_keep = 0")
        .count()
    )
    assert bad == 0


def test_semantic_dedup_hot_cell_guard(spark):
    emb = spark.read.parquet(EMB)
    with pytest.raises(Exception, match="raise n_cells"):
        ann.semantic_dedup_kernel(emb, max_cell_rows=3).collect()


# ---------------------------------------------------------------------------
# Containment
# ---------------------------------------------------------------------------


def test_containment_kernel_matches_sql_form(spark, fixture_corpus):
    docs = fixture_corpus.select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    sig_sql = S.with_signature(S.valid_documents(docs, CFG), CFG)
    sig_k = S.signature_kernel_arrow(docs, CFG, "doc_id")
    a = _rows(
        C.containment_pairs(
            S.explode_bands(sig_sql, CFG, "doc_id"), sig_sql, CFG, "doc_id"
        )
    )
    b = _rows(
        C.containment_pairs_kernel(
            S.explode_bands(sig_k, CFG, "doc_id"), sig_k, CFG, "doc_id"
        )
    )
    assert a == b
    assert len(a) > 0


def test_containment_superset_of_high_jaccard_verified(spark, fixture_corpus):
    """J >= 0.5 implies containment >= 500 permille, so every such verified
    pair must appear in the containment lane (same candidate universe)."""
    docs = fixture_corpus.select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    sig = S.signature_kernel_arrow(docs, CFG, "doc_id")
    bands = S.explode_bands(sig, CFG, "doc_id")
    ver = C.verify_pairs_kernel(
        C.candidate_pairs(bands, CFG, "doc_id"), sig, CFG, "doc_id"
    )
    high = {
        (r["id_a"], r["id_b"])
        for r in ver.where("inter * 2 >= un").collect()  # J >= 0.5
    }
    cont = {
        (r["id_a"], r["id_b"])
        for r in C.containment_pairs_kernel(bands, sig, CFG, "doc_id").collect()
    }
    assert high <= cont


def test_containment_catches_doc_inside_doc(spark):
    """A short page quoted whole inside a long page: Jaccard below the
    verify threshold, containment ~1000 — the verify lane must reject the
    pair, the containment lane must emit it."""
    # sizes picked so a band matches under the fixed permutation constants
    # (deterministic): J ~ 0.13 << 0.30, containment = 1000
    short = " ".join(f"alpha{i} beta{i}" for i in range(30))
    extra = " ".join(f"zz{j} qq{j} ww{j} ee{j}" for j in range(100))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + extra), (3, "unrelated filler words")],
        "doc_id long, text string",
    )
    sig = S.signature_kernel_arrow(docs, CFG, "doc_id")
    bands = S.explode_bands(sig, CFG, "doc_id")
    ver = C.verify_pairs_kernel(
        C.candidate_pairs(bands, CFG, "doc_id"), sig, CFG, "doc_id"
    )
    assert ver.where("id_a = 1 AND id_b = 2").count() == 0
    got = (
        C.containment_pairs_kernel(bands, sig, CFG, "doc_id")
        .where("id_a = 1 AND id_b = 2")
        .collect()
    )
    assert len(got) == 1
    r = got[0]
    # every shingle of the short doc appears in the long one
    assert r["containment_permille"] == 1000
    assert r["inter"] == min(r["n_set_a"], r["n_set_b"])
    # and the pair's Jaccard really is below the verify threshold
    un = r["n_set_a"] + r["n_set_b"] - r["inter"]
    assert r["inter"] * 100 < un * CFG.verify_jaccard_pct


def test_containment_matches_duckdb_oracle_on_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sig = S.signature_kernel_arrow(docs, CFG, "doc_id")
    got = _rows(
        C.containment_pairs_kernel(
            S.explode_bands(sig, CFG, "doc_id"), sig, CFG, "doc_id"
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    cur = con.execute(C.containment_pairs_sql(CFG))
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want

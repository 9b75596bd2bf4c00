"""T2: planted-duplicate recall/precision vs ground truth (FIXTURES.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import candidates as C, clustering as CL, fixtures as FX
from imdedup_plus_spark import signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG


@pytest.fixture(scope="module")
def run(spark, fixture_corpus):
    gt = fixture_corpus
    docs = gt.drop("base_id", "variant")
    sig = S.with_signature(S.valid_documents(docs, CFG), CFG).cache()
    bands = S.explode_bands(sig, CFG, "url")
    ver = C.verify_pairs(C.candidate_pairs(bands, CFG, "url"), sig, CFG, "url").cache()
    cl = CL.clusters_from_pairs(sig, ver, "url").cache()
    return gt, sig, ver, cl


def test_recall_at_reference_config(run):
    gt, _, _, cl = run
    exp = FX.expected_dup_pairs(gt)
    ca = cl.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("ca"))
    cb = cl.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("cb"))
    j = exp.join(ca, "url_a").join(cb, "url_b")
    tot, hit = j.count(), j.where("ca = cb").count()
    assert tot > 0
    assert hit / tot >= 0.99, f"recall {hit}/{tot}"


def test_cluster_assignments_match_ground_truth(run):
    gt, _, _, cl = run
    exp = FX.expected_clusters(gt).withColumnRenamed("cluster_id", "exp_cid")
    cmp = cl.join(exp, "url")
    assert cmp.where("cluster_id != exp_cid").count() == 0


def test_distractor_precision(run):
    gt, _, _, cl = run
    distract = gt.where("base_id < 0").select("url")
    assert cl.join(distract, "url").where("cluster_id != url").count() == 0


def test_exact_dups_verified(run):
    gt, _, ver, _ = run
    exact = FX.expected_dup_pairs(gt).where("kind = 'exact'")
    n_exact = exact.count()
    if n_exact:
        merged = exact.join(
            ver.select(F.col("id_a").alias("url_a"), F.col("id_b").alias("url_b")),
            ["url_a", "url_b"],
        )
        assert merged.count() == n_exact


def test_sketch_verify_recall(spark, fixture_corpus):
    """KMV bottom-k verification keeps planted-pair recall >= 0.99
    (the scale config used by the bench pipeline)."""
    from pyspark.sql import functions as F

    from imdedup_plus_spark import candidates as C, fixtures as FX, signatures as S
    from imdedup_plus_spark.config import DedupConfig

    cfg = DedupConfig(verify_sketch_k=128)
    exp = FX.expected_dup_pairs(fixture_corpus)
    sig = S.signature_kernel_arrow(fixture_corpus, cfg, "url").persist()
    ver = C.verify_pairs_kernel(
        C.candidate_pairs(S.explode_bands(sig, cfg, "url"), cfg, "url"), sig, cfg, "url"
    )
    n_exp = exp.count()
    hit = exp.join(
        ver.select(F.col("id_a").alias("url_a"), F.col("id_b").alias("url_b")),
        ["url_a", "url_b"],
    ).count()
    assert n_exp > 0
    assert hit / n_exp >= 0.99
    sig.unpersist()

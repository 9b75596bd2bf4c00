"""Bucketed signature store: the verify join consumes the bucketed
distribution in place (no Exchange on the signature side), with results
identical to the plain-parquet path."""

from __future__ import annotations

import pytest

from imdedup_plus_spark import bucketing as B
from imdedup_plus_spark import candidates as C
from imdedup_plus_spark import signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    """The same signature table twice: bucketed catalog table vs plain
    parquet directory."""
    from imdedup_plus_spark import fixtures as FX

    root = tmp_path_factory.mktemp("bucketed")
    docs = FX.generate_documents(spark, n_base=48)
    sig = S.signature_kernel_arrow(docs, CFG, "url")
    plain_path = str(root / "sig_plain")
    sig.write.mode("overwrite").parquet(plain_path)
    B.write_bucketed(sig, "sig_bucketed_t", str(root / "sig_bucketed"), "url", 8)
    yield {
        "plain": spark.read.parquet(plain_path),
        "bucketed": B.read_bucketed(spark, "sig_bucketed_t"),
    }
    spark.sql("DROP TABLE IF EXISTS sig_bucketed_t")


def _verify(sig_df):
    bands = S.explode_bands(sig_df, CFG, "url")
    pairs = C.candidate_pairs(bands, CFG, "url")
    return C.verify_pairs_kernel(pairs, sig_df, CFG, "url")


def test_bucketed_join_drops_exchanges(stores):
    vb = _verify(stores["bucketed"])
    vp = _verify(stores["plain"])
    nb, np_ = B.n_exchanges(vb), B.n_exchanges(vp)
    # two signature-side scans (id_a join + id_b join) stop shuffling:
    # the bucketed plan needs at least two fewer Exchanges
    assert nb <= np_ - 2, f"bucketed={nb} plain={np_}"


def test_bucketed_results_identical(stores):
    rows_b = sorted(tuple(r) for r in _verify(stores["bucketed"]).collect())
    rows_p = sorted(tuple(r) for r in _verify(stores["plain"]).collect())
    assert rows_b == rows_p and rows_b


def test_bucket_metadata_in_catalog(spark, stores):
    """The catalog carries the bucket spec (a bare scan may ignore it —
    autoBucketedScan — but joins consume it; parallelism in those joins
    is pinned by this count, the sizing rule the docstring states)."""
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE EXTENDED sig_bucketed_t").collect()
    }
    assert desc.get("Num Buckets") == "8"
    assert "url" in desc.get("Bucket Columns", "")

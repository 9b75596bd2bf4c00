"""Candidate generation: cap semantics, salted pairing equivalence."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from imdedup_plus_spark import candidates as C, signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG


def _bands(spark, n_docs=60):
    """Corpus with deliberate hot bands: all docs share a boilerplate
    prefix so several band values repeat across many docs."""
    rows = [
        (i, "common header words here always the same " + " ".join(f"w{i}_{j}" for j in range(20)))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = S.with_signature(S.valid_documents(docs, CFG), CFG)
    return S.explode_bands(sig, CFG, "doc_id")


def test_salted_pairs_identical_to_direct(spark):
    bands = _bands(spark)
    direct = C.candidate_pairs_direct(bands, CFG, "doc_id")
    salted = C.candidate_pairs_salted(bands, CFG, "doc_id", split_threshold=8)
    d = sorted(tuple(r) for r in direct.collect())
    s = sorted(tuple(r) for r in salted.collect())
    assert d == s
    assert len(d) > 0


def test_bucket_cap_drops_hot_buckets(spark):
    bands = _bands(spark, n_docs=40)
    tiny_cap = replace(CFG, bucket_cap=5)
    capped = C.candidate_pairs_direct(bands, tiny_cap, "doc_id")
    uncapped = C.candidate_pairs_direct(bands, CFG, "doc_id")
    assert capped.count() < uncapped.count()
    hot = C.hot_buckets(bands, tiny_cap, "doc_id")
    assert hot.count() > 0
    assert hot.agg(F.min("bucket_size")).collect()[0][0] > 5


def test_pair_orientation_canonical(spark):
    bands = _bands(spark, n_docs=20)
    pairs = C.candidate_pairs(bands, CFG, "doc_id").collect()
    assert all(r.id_a < r.id_b for r in pairs)


def test_salted_handles_mixed_bucket_sizes(spark):
    # small buckets (g=1) and large buckets (g>1) in one frame
    bands = _bands(spark, n_docs=70)
    salted = C.candidate_pairs_salted(bands, CFG, "doc_id", split_threshold=16)
    direct = C.candidate_pairs_direct(bands, CFG, "doc_id")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


def test_verify_kernel_matches_sql(spark, fixture_corpus):
    """SQL verify on ARRAY sets == numpy kernel verify on packed BINARY
    sets — same candidates, bit-identical verified output."""
    from imdedup_plus_spark import signatures as S, candidates as C
    from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG

    sig_sql = S.with_signature(S.valid_documents(fixture_corpus, CFG), CFG).select(
        "url", "sig", "shingle_set"
    ).persist()
    sig_bin = S.signature_kernel_arrow(fixture_corpus, CFG, "url").persist()
    cand = C.candidate_pairs(S.explode_bands(sig_bin, CFG, "url"), CFG, "url").persist()
    sql_rows = sorted(
        tuple(r) for r in C.verify_pairs(cand, sig_sql, CFG, "url").collect()
    )
    ker_rows = sorted(
        tuple(r) for r in C.verify_pairs_kernel(cand, sig_bin, CFG, "url").collect()
    )
    assert sql_rows == ker_rows
    cand.unpersist(); sig_sql.unpersist(); sig_bin.unpersist()


def test_hotwindow_equals_salted_when_no_hot_buckets(spark, fixture_corpus):
    """With a cap no bucket reaches, window pairing adds nothing — output
    must equal the plain salted pairing row-for-row."""
    import dataclasses

    from imdedup_plus_spark import signatures as S
    from imdedup_plus_spark.config import DedupConfig

    cfg = DedupConfig(bucket_cap=10**6, hot_window=8)
    docs = fixture_corpus.select("url", "text")
    bands = S.explode_bands(S.signature_kernel_arrow(docs, cfg, "url"), cfg, "url")
    hw = sorted(tuple(r) for r in C.candidate_pairs_hotwindow(bands, cfg, "url").collect())
    plain = sorted(
        tuple(r)
        for r in C.candidate_pairs_salted(
            bands, dataclasses.replace(cfg, hot_window=0), "url"
        ).collect()
    )
    assert hw == plain


def test_hotwindow_recovers_groups_in_hot_buckets(spark, fixture_corpus):
    """With an artificially tiny cap most buckets go hot; drop-only loses
    planted pairs while window pairing keeps cluster recall ~1."""
    from imdedup_plus_spark import clustering as CL, fixtures as FX, signatures as S
    from imdedup_plus_spark.config import DedupConfig
    from pyspark.sql import functions as F

    exp = FX.expected_dup_pairs(fixture_corpus)
    n_exp = exp.count()
    docs = fixture_corpus.select("url", "text")

    def recall(cfg):
        sig = S.signature_kernel_arrow(docs, cfg, "url").persist()
        ver = C.verify_pairs_kernel(
            C.candidate_pairs(S.explode_bands(sig, cfg, "url"), cfg, "url"),
            sig, cfg, "url",
        )
        cl = CL.clusters_from_pairs(sig, ver, "url")
        ca = cl.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("ca"))
        cb = cl.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("cb"))
        hit = exp.join(ca, "url_a").join(cb, "url_b").where("ca = cb").count()
        sig.unpersist()
        return hit / n_exp

    drop_only = recall(DedupConfig(bucket_cap=4))
    windowed = recall(DedupConfig(bucket_cap=4, hot_window=4))
    assert windowed >= drop_only
    assert windowed >= 0.99, f"windowed recall {windowed} (drop-only {drop_only})"


def test_verify_kernel_kmv_matches_reference_loop(spark, fixture_corpus):
    """Flattened KMV verification == the straightforward per-pair
    intersect1d/union1d reference (the pre-flattening kernel), field for
    field. Tiny k stresses the window edge (union shorter than k, ties at
    the k-th key)."""
    import numpy as np

    from imdedup_plus_spark.config import DedupConfig

    cfg = DedupConfig(verify_sketch_k=8)
    docs = fixture_corpus.select("url", "text")
    sig = S.signature_kernel_arrow(docs, cfg, "url").persist()
    cand = C.candidate_pairs(S.explode_bands(sig, cfg, "url"), cfg, "url").persist()
    got = sorted(
        tuple(r) for r in C.verify_pairs_kernel(cand, sig, cfg, "url").collect()
    )

    sets = {
        r["url"]: (
            np.asarray(r["sig"]),
            np.frombuffer(r["shingle_set"], dtype="<i4").astype(np.int64),
        )
        for r in sig.collect()
    }
    k, pct = cfg.verify_sketch_k, cfg.verify_jaccard_pct
    exp = []
    for r in cand.collect():
        siga, a = sets[r["id_a"]]
        sigb, b = sets[r["id_b"]]
        n_eq = int(np.sum(siga == sigb))
        ab = np.intersect1d(a, b, assume_unique=True)
        u = np.union1d(a, b)[:k]
        hi = int(u[-1]) if u.size else 0
        inter = int(np.searchsorted(ab, hi, side="right"))
        un = int(u.size)
        if inter * 100 >= un * pct:
            exp.append((r["id_a"], r["id_b"], r["n_matching_bands"], n_eq, inter, un))
    cand.unpersist(); sig.unpersist()
    assert got == sorted(exp)


def test_verify_kernel_kmv_chunk_boundaries(spark, fixture_corpus):
    """The KMV path vectorizes over 1024-pair chunks of each Arrow batch
    (candidates.py verify_pairs_kernel); this drives >3k pairs through ONE
    batch so the chunk loop crosses several boundaries (including a final
    partial chunk), and checks field-for-field parity with the per-pair
    numpy reference. The oracle/LSH parity tests only produce sub-1024
    batches, which would leave the lo>0 slices untested."""
    import numpy as np

    from imdedup_plus_spark.config import DedupConfig

    cfg = DedupConfig(verify_sketch_k=16)
    docs = fixture_corpus.select("url", "text")
    sig = S.signature_kernel_arrow(docs, cfg, "url").persist()
    ids = sorted(r["url"] for r in sig.select("url").collect())
    n = len(ids)
    # ring pairing: every doc with its next 14 successors -> ~14n pairs.
    # The kernel's internal shuffle_hash joins re-partition by the session
    # shuffle-partition count, so pin it to 1 for this call: the joined
    # output is then ONE partition of all ~3.3k pairs = one Arrow batch
    # (< 10k maxRecordsPerBatch), guaranteeing the 1024-chunk loop crosses
    # several boundaries (incl. a final partial chunk). Without the pin,
    # 8 shuffle partitions x ~420 rows would each stay under one chunk
    # and the lo>0 slices would silently go untested.
    pair_rows = [
        (ids[i], ids[(i + d) % n], 1) for i in range(n) for d in range(1, 15)
    ]
    pairs = spark.createDataFrame(
        pair_rows, "id_a string, id_b string, n_matching_bands long"
    )
    assert len(pair_rows) > 3000
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        got = sorted(
            tuple(r) for r in C.verify_pairs_kernel(pairs, sig, cfg, "url").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    sets = {
        r["url"]: (
            np.asarray(r["sig"]),
            np.frombuffer(r["shingle_set"], dtype="<i4").astype(np.int64),
        )
        for r in sig.collect()
    }
    k, pct = cfg.verify_sketch_k, cfg.verify_jaccard_pct
    exp = []
    for id_a, id_b, nmb in pair_rows:
        siga, a = sets[id_a]
        sigb, b = sets[id_b]
        n_eq = int(np.sum(siga == sigb))
        ab = np.intersect1d(a, b, assume_unique=True)
        u = np.union1d(a, b)[:k]
        hi = int(u[-1]) if u.size else 0
        inter = int(np.searchsorted(ab, hi, side="right"))
        un = int(u.size)
        if inter * 100 >= un * pct:
            exp.append((id_a, id_b, nmb, n_eq, inter, un))
    sig.unpersist()
    assert got == sorted(exp)


def test_empty_vs_empty_verify_accepts_in_all_three_forms(spark):
    """VERDICT r03 #4 pinned: a pair whose BOTH shingle sets are empty is
    ACCEPTED by vacuity (inter=0, un=0, 0*100 >= 0*pct). Deliberate and
    unreachable in the pipeline (valid_documents >= min_tokens and a
    signature needs >= shingle_window tokens), but all three forms — SQL,
    exact kernel, KMV chunked kernel — plus the DuckDB oracle predicate
    must agree so parity holds if an upstream filter ever changes."""
    import duckdb

    n_perm = CFG.n_perm
    sig_arr = list(range(n_perm))
    pairs = spark.createDataFrame(
        [(1, 2, 1)], "id_a long, id_b long, n_matching_bands long"
    )
    sig_sql = spark.createDataFrame(
        [(1, sig_arr, []), (2, sig_arr, [])],
        "doc_id long, sig array<bigint>, shingle_set array<bigint>",
    )

    out_sql = C.verify_pairs(pairs, sig_sql, CFG, "doc_id").collect()
    out_kx = C.verify_pairs_kernel(pairs, sig_sql, CFG, "doc_id").collect()

    sig_packed = spark.createDataFrame(
        [(1, sig_arr, bytearray(b"")), (2, sig_arr, bytearray(b""))],
        "doc_id long, sig array<bigint>, shingle_set binary",
    )
    kmv_cfg = replace(CFG, verify_sketch_k=64)
    out_kmv = C.verify_pairs_kernel(pairs, sig_packed, kmv_cfg, "doc_id").collect()

    for out in (out_sql, out_kx, out_kmv):
        assert len(out) == 1, out
        r = out[0]
        assert (r.id_a, r.id_b, r.inter, r.un) == (1, 2, 0, 0)
        assert r.n_eq == n_perm

    # the oracle predicate (oracle.py verify form) on empty lists
    pct = CFG.verify_jaccard_pct
    (dk,) = duckdb.execute(
        "SELECT CAST(len(list_intersect([], [])) AS BIGINT) * 100 >= "
        f"(CAST(len([]) + len([]) AS BIGINT) - "
        f"CAST(len(list_intersect([], [])) AS BIGINT)) * {pct}"
    ).fetchone()
    assert dk is True

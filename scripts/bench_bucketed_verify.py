"""Bucketed vs plain signature store: measured A/B of the verify stage.

Isolates the store layout: both halves run the IDENTICAL
bands -> candidate_pairs -> verify_pairs_kernel code (SCALE_CONFIG) from
a pre-materialized signature store on disk; the only difference is
whether the store is a plain parquet directory (every verify join
reshuffles the wide signature side) or a hash-bucketed catalog table
(the signature side is consumed in place; bucketing.py rationale).

Protocol (BENCH/BASELINE.md discipline): one fresh process per half
(`--half plain|bucketed`), orchestrated by the parent; shuffle on disk,
not tmpfs; the verified-pair count + xxhash64 fold of (id_a, id_b) is
printed from both halves so the layouts are provably result-identical.

The bucketed half re-registers the external table by DDL (CLUSTERED BY
... INTO N BUCKETS LOCATION ...) because the in-memory catalog dies
with the writing session — exactly what a real deployment's persistent
catalog (Hive/Iceberg) does for free.

Usage:
    python scripts/bench_bucketed_verify.py [n_base]        # orchestrate
    python scripts/bench_bucketed_verify.py --half plain --n-base N
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_BUCKETS = 32


def _paths(n_base: int) -> dict:
    root = f"/tmp/bench_bucketed_{n_base}"
    return {
        "root": root,
        "plain": f"{root}/sig_plain",
        "bucketed": f"{root}/sig_bucketed",
        "done": f"{root}/_PREPARED",
    }


def _get_spark():
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local-bucketed")
    from imdedup_plus_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def prepare(n_base: int) -> None:
    """Corpus + kernel signatures -> both store layouts (untimed)."""
    p = _paths(n_base)
    if os.path.exists(p["done"]):
        return
    import bench
    from imdedup_plus_spark import bucketing as BK
    from imdedup_plus_spark import signatures as S
    from imdedup_plus_spark.config import SCALE_CONFIG
    from pyspark.sql import functions as F

    corpus = bench.ensure_corpus(n_base)
    spark = _get_spark()
    docs = spark.read.parquet(corpus).withColumn(
        "doc_id", F.xxhash64(F.col("url"))
    )
    sig = S.signature_kernel_arrow(docs, SCALE_CONFIG, "doc_id").persist()
    sig.write.mode("overwrite").parquet(p["plain"])
    spark.sql("DROP TABLE IF EXISTS bench_sig_bucketed")
    BK.write_bucketed(sig, "bench_sig_bucketed", p["bucketed"], "doc_id", N_BUCKETS)
    sig.unpersist()
    spark.stop()
    with open(p["done"], "w") as fh:
        fh.write("ok")


def _register_bucketed(spark, path: str) -> None:
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    spark.sql("DROP TABLE IF EXISTS bench_sig_bucketed")
    spark.sql(
        f"CREATE TABLE bench_sig_bucketed ({schema_ddl}) USING parquet "
        f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )


def run_half(kind: str, n_base: int) -> None:
    p = _paths(n_base)
    spark = _get_spark()
    from imdedup_plus_spark import candidates as C
    from imdedup_plus_spark import signatures as S
    from imdedup_plus_spark.config import SCALE_CONFIG
    from pyspark.sql import functions as F

    if kind == "plain":
        sig = spark.read.parquet(p["plain"])
    else:
        _register_bucketed(spark, p["bucketed"])
        sig = spark.table("bench_sig_bucketed")

    # warm the DATA PAGES once so both halves start from page cache — a
    # bare count() would scan only footers (empty required schema) and
    # leave the columns cold, so touch the wide column for real
    sig.agg(F.sum(F.length("shingle_set"))).collect()
    t0 = time.time()
    bands = S.explode_bands(sig, SCALE_CONFIG, "doc_id")
    ver = C.verify_pairs_kernel(
        C.candidate_pairs(bands, SCALE_CONFIG, "doc_id"), sig, SCALE_CONFIG, "doc_id"
    )
    agg = ver.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(id_a, id_b))").alias("fold"),
    ).collect()[0]
    wall = time.time() - t0
    print(json.dumps({
        "half": kind,
        "wall_sec": round(wall, 2),
        "n_verified": agg["n"],
        "fold": int(agg["fold"]),
    }))
    spark.stop()


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 60000
    prepare(n_base)
    results = {}
    for kind in ("plain", "bucketed"):
        out = subprocess.run(
            [sys.executable, __file__, "--half", kind, "--n-base", str(n_base)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[kind] = json.loads(line)
        print(line)
    assert results["plain"]["fold"] == results["bucketed"]["fold"], "result mismatch"
    assert results["plain"]["n_verified"] == results["bucketed"]["n_verified"]
    print(json.dumps({
        "n_base": n_base,
        "speedup": round(
            results["plain"]["wall_sec"] / results["bucketed"]["wall_sec"], 3
        ),
        "identical": True,
    }))


if __name__ == "__main__":
    if "--half" in sys.argv:
        kind = sys.argv[sys.argv.index("--half") + 1]
        n_base = int(sys.argv[sys.argv.index("--n-base") + 1])
        run_half(kind, n_base)
    else:
        main()

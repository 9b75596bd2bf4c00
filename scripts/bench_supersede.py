"""Corpus-scale evidence for the recrawl-aware supersede lane.

Feeds the planted corpus through the incremental loop as crawl waves
(one subprocess per wave — the BENCH/BASELINE.md protocol), where every
wave after the bootstrap carries BOTH new pages and identical-content
recrawls of already-stored urls. Identical content makes the evidence
clean: the current corpus after every wave equals the original corpus
slice delivered so far, so planted-pair recall has its usual ground
truth and must match the non-recrawl pipeline — "recrawl churn must not
change what the deduper finds" is the invariant under test.

Per wave: detect wall + the manifest's n_retired. Finalize (fresh
process): structural invariants at scale — exactly one live version per
id, bucket-delta rollup == recount over live bands, current pairs free
of superseded versions — then planted recall through clusters, then
``compact_state_store`` timed with a current-pair fingerprint asserted
identical across the rewrite.

Usage::

    python scripts/bench_supersede.py [n_base]   # default 300000 (1.11M docs)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# corpus-scale shuffle goes to disk, not tmpfs (CLAUDE.md)
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local-supersede")

N_WAVES = 5  # 60% bootstrap + 4 x (10% new + ~10%-of-seen recrawls)


def _state(n_base: int) -> str:
    return f"/tmp/supersede_state_{n_base}"


def _wave_df(spark, corpus: str, k: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(corpus).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    b = F.crc32(F.col("url")) % 20
    new_lo, new_hi = (0, 12) if k == 0 else (12 + 2 * (k - 1), 12 + 2 * k)
    new = docs.where((b >= new_lo) & (b < new_hi))
    if k == 0:
        return new, new, None
    seen = docs.where(b < new_lo)
    recrawl = seen.where(
        F.crc32(F.concat(F.col("url"), F.lit(f"#r{k}"))) % 10 == 0
    ).withColumn("warc_ts", F.expr(f"warc_ts + INTERVAL {k} DAYS"))
    return new.unionByName(recrawl), new, recrawl


def run_wave(n_base: int, k: int) -> int:
    from bench import ensure_corpus
    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import SCALE_CONFIG
    from imdedup_plus_spark.session import get_spark

    corpus = ensure_corpus(n_base)
    spark = get_spark(master="local[16]", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    wave, new, recrawl = _wave_df(spark, corpus, k)

    t0 = time.time()
    ST.incremental_dedup_batch(
        wave, _state(n_base), SCALE_CONFIG, "url", epoch_id=k, supersede=True
    )
    t_detect = time.time() - t0
    with open(ST._epoch_manifest(_state(n_base), k)) as fh:
        man = json.load(fh)
    row = {
        "wave": k,
        "wave_docs": wave.count(),
        "n_new": new.count(),
        "n_recrawled_delivered": recrawl.count() if recrawl is not None else 0,
        "n_retired": man["n_retired"],
        "detect_sec": round(t_detect, 2),
    }
    print("WAVE_RESULT " + json.dumps(row), flush=True)
    spark.stop()
    return 0


def finalize(n_base: int) -> int:
    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from imdedup_plus_spark import clustering as CL
    from imdedup_plus_spark import fixtures as FX
    from imdedup_plus_spark import signatures as S
    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import SCALE_CONFIG
    from imdedup_plus_spark.session import get_spark

    corpus = ensure_corpus(n_base)
    state = _state(n_base)
    spark = get_spark(master="local[16]", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_base": n_base}

    # --- structural invariants at scale -------------------------------
    retired = ST._retired_view(spark, state)
    sigs = spark.read.parquet(f"{state}/signatures")
    live_sigs = ST._exclude_retired(sigs, retired, "url")
    n_live = live_sigs.count()
    out["one_live_version_per_id"] = (
        n_live == live_sigs.select("url").distinct().count()
    )
    # delivered corpus == full fixture corpus (all 20 buckets delivered)
    out["live_ids_match_corpus"] = (
        n_live == spark.read.parquet(corpus).count()
    )

    deltas = (
        spark.read.parquet(f"{state}/bucket_deltas")
        .groupBy("band_id", "band_hash")
        .agg(F.sum("delta").alias("n"))
        .where(F.col("n") != 0)
    )
    live_bands = S.explode_bands(
        live_sigs.select("url", "sig"), SCALE_CONFIG, "url"
    ).groupBy("band_id", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    out["delta_rollup_matches_live_recount"] = (
        deltas.exceptAll(live_bands).count() == 0
        and live_bands.exceptAll(deltas).count() == 0
    )

    pairs = ST.read_pairs(spark, state, current_only=True).localCheckpoint(
        eager=True
    )
    fp0 = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(id_a, id_b))").alias("h"),
    ).collect()[0]
    out["n_current_pairs"] = fp0["n"]

    # --- planted recall through clusters ------------------------------
    gt = FX.generate_documents(spark, n_base=n_base, with_ground_truth=True)
    exp = FX.expected_dup_pairs(gt).localCheckpoint(eager=True)
    n_exp = exp.count()
    clusters = CL.clusters_from_pairs(
        live_sigs.select("url"), pairs, "url"
    ).persist()
    labels = clusters.select(F.col("url").alias("k"), "cluster_id")
    hit = (
        exp.join(labels.withColumnRenamed("k", "url_a").withColumnRenamed("cluster_id", "ca"), "url_a")
        .join(labels.withColumnRenamed("k", "url_b").withColumnRenamed("cluster_id", "cb"), "url_b")
        .where(F.col("ca") == F.col("cb"))
        .count()
    )
    out["n_expected_pairs"] = n_exp
    out["recall"] = round(hit / n_exp, 6)

    # --- compaction ----------------------------------------------------
    t0 = time.time()
    out["compact"] = ST.compact_state_store(spark, state, "url")
    out["compact_sec"] = round(time.time() - t0, 2)
    fp1 = (
        ST.read_pairs(spark, state, current_only=True)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(id_a, id_b))").alias("h"),
        )
        .collect()[0]
    )
    out["pairs_identical_after_compaction"] = (fp0["n"], fp0["h"]) == (
        fp1["n"],
        fp1["h"],
    )
    out["retired_store_gone"] = not os.path.exists(f"{state}/retired")
    print("FINAL_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    shutil.rmtree(_state(n_base), ignore_errors=True)
    results = []
    for k in range(N_WAVES):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_base), "--wave", str(k)],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("WAVE_RESULT ")]
        if p.returncode != 0 or not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            return 1
        results.append(json.loads(line[-1][len("WAVE_RESULT "):]))
        print(json.dumps(results[-1]), flush=True)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(n_base), "--finalize"],
        capture_output=True, text=True,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("FINAL_RESULT ")]
    if p.returncode != 0 or not line:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        return 1
    final = json.loads(line[-1][len("FINAL_RESULT "):])
    print(json.dumps({"waves": results, "final": final}))
    return 0


if __name__ == "__main__":
    if "--wave" in sys.argv:
        sys.exit(run_wave(int(sys.argv[1]), int(sys.argv[sys.argv.index("--wave") + 1])))
    if "--finalize" in sys.argv:
        sys.exit(finalize(int(sys.argv[1])))
    sys.exit(main())

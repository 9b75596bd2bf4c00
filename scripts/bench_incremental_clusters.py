"""Corpus-scale evidence for incremental cluster maintenance.

Feeds the planted corpus through the streaming insert+probe loop as
hash-split crawl waves, ONE SUBPROCESS PER WAVE (each crawl epoch is its
own spark-submit job in deployment; a shared session also accumulates
localCheckpoint blocks across waves, which contaminated the first
measurement — see BENCH/BASELINE.md). Per wave it times

* ``streaming.update_cluster_store`` — the incremental fold (quotient-
  graph CC + broadcast relabel + snapshot composition), vs
* a full-batch ``clusters_from_pairs`` recompute over every doc and
  every pair seen so far — the thing the fold replaces per epoch,

and asserts the two assignments are bit-identical via count +
``bit_xor(xxhash64(url, cluster_id))`` (no driver-side collect of the
1.1M-row assignment). Emits one JSON line per wave plus a summary; wall
numbers land in BENCH/BASELINE.md by hand (append-only notebook).

Wave layout mirrors a real crawl: one large bootstrap wave then small
ongoing epochs (default 60% + 8 x 5%) — incremental maintenance exists
for exactly that regime, where the accumulated pair set dwarfs each
epoch. The equal-thirds control run (see BENCH/BASELINE.md) shows the
expected behavior when that assumption is violated: fold ~ full-CC cost,
because the quotient graph is then as large as the pair graph.

Usage::

    python scripts/bench_incremental_clusters.py [n_base] [layout]

``n_base`` names a ``/tmp/bench_corpus_<n_base>`` fixture (created via
bench.ensure_corpus if missing); default 300000 (the 1.11M-doc corpus).
``layout`` is comma-separated per-wave bucket counts out of their sum
(default ``12,1,1,1,1,1,1,1,1``: 60% bootstrap + 8 waves of 5%); or
``N`` for N equal waves.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# corpus-scale shuffle must go to disk, not tmpfs (CLAUDE.md)
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local-incclust")


def _parse_layout(layout_arg: str):
    if "," in layout_arg:
        weights = [int(w) for w in layout_arg.split(",")]
    else:
        weights = [1] * int(layout_arg)
    offsets = [0]
    for w in weights:
        offsets.append(offsets[-1] + w)
    return weights, offsets


def run_wave(n_base: int, layout_arg: str, k: int) -> int:
    """One wave in a fresh process: detect + fold + full-CC control."""
    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from imdedup_plus_spark import clustering as CL
    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import SCALE_CONFIG
    from imdedup_plus_spark.session import get_spark

    def _fingerprint(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(url, cluster_id))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    weights, offsets = _parse_layout(layout_arg)
    n_buckets = sum(weights)
    corpus = ensure_corpus(n_base)
    state = f"/tmp/incclust_state_{n_base}"

    spark = get_spark(master="local[16]", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    b = F.crc32(F.col("url")) % n_buckets
    wave = docs.where((b >= offsets[k]) & (b < offsets[k + 1]))

    t0 = time.time()
    ST.incremental_dedup_batch(wave, state, SCALE_CONFIG, "url", epoch_id=k)
    t_detect = time.time() - t0

    t0 = time.time()
    folded = ST.update_cluster_store(spark, state, "url")
    t_fold = time.time() - t0
    assert folded == [k], folded

    # the recompute this fold replaces: full CC over every doc + pair
    # seen so far (docs from the accumulated signature store, pairs from
    # the committed epochs)
    seen_ids = spark.read.parquet(f"{state}/signatures").select("url")
    pairs = ST.read_pairs(spark, state)
    t0 = time.time()
    batch_cl = CL.clusters_from_pairs(seen_ids, pairs, "url")
    fp_batch = _fingerprint(batch_cl)
    t_batch = time.time() - t0

    fp_inc = _fingerprint(ST.read_clusters(spark, state, "url"))
    row = {
        "wave": k,
        "wave_docs": wave.count(),
        "detect_sec": round(t_detect, 2),
        "fold_sec": round(t_fold, 2),
        "full_cc_sec": round(t_batch, 2),
        "fold_speedup": round(t_batch / t_fold, 2),
        "n_pairs_total": pairs.count(),
        "assignments_identical": fp_inc == fp_batch,
        "n_assigned": fp_inc[0],
    }
    assert row["assignments_identical"], (fp_inc, fp_batch)
    print("WAVE_RESULT " + json.dumps(row), flush=True)
    spark.stop()
    return 0


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    layout_arg = sys.argv[2] if len(sys.argv) > 2 else "12,1,1,1,1,1,1,1,1"
    weights, _ = _parse_layout(layout_arg)
    state = f"/tmp/incclust_state_{n_base}"
    shutil.rmtree(state, ignore_errors=True)

    results = []
    for k in range(len(weights)):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_base), layout_arg,
             "--wave", str(k)],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("WAVE_RESULT ")]
        if p.returncode != 0 or not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            return 1
        row = json.loads(line[-1][len("WAVE_RESULT "):])
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary": results, "n_base": n_base}))
    return 0


if __name__ == "__main__":
    if "--wave" in sys.argv:
        i = sys.argv.index("--wave")
        sys.exit(run_wave(int(sys.argv[1]), sys.argv[2], int(sys.argv[i + 1])))
    sys.exit(main())

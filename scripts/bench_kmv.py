"""Corpus-scale evidence for the KMV distinct-shingle estimator.

Two fresh processes (BENCH/BASELINE.md protocol), each end-to-end from
raw text (signature kernel included):

* ``--est``   one-pass KMV bottom-k estimate (metrics.
  distinct_shingle_estimate_kernel) — the 100 TB form: per-chunk numpy
  partials, the only exchange is over the <=k-per-chunk partial set;
* ``--exact`` the exact job it replaces: explode every shingle,
  global distinct, count — the universe-sized shuffle;
* ``--hll``   the register-sketch sibling (metrics.
  distinct_shingle_hll_kernel): <=512 (j, max rho) rows per task merged
  by one bounded groupBy max — no distinct, no sort, no limit anywhere.

Prints per-mode JSON lines and a final summary with the relative errors
(theory: ~1/sqrt(k) ~ 3.1% stderr at k=1024 for KMV; ~1.04/sqrt(512)
~ 4.6% for HLL at m=512).

Usage::

    python scripts/bench_kmv.py [n_base]   # default 300000 (1.11M docs)
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local-kmv")


def _sigs(n_base: int):
    from bench import ensure_corpus
    from imdedup_plus_spark import signatures as S
    from imdedup_plus_spark.config import SCALE_CONFIG
    from imdedup_plus_spark.session import get_spark

    corpus = ensure_corpus(n_base)
    spark = get_spark(master="local[16]", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus).select("url", "text", "lang")
    ucfg = dataclasses.replace(SCALE_CONFIG, verify_sketch_k=0)
    return spark, S.signature_kernel_arrow(docs, ucfg, "url")


def run_est(n_base: int) -> int:
    from imdedup_plus_spark import metrics as M

    spark, sigs = _sigs(n_base)
    t0 = time.time()
    row = M.distinct_shingle_estimate_kernel(sigs).collect()[0]
    out = {"mode": "est", "sec": round(time.time() - t0, 2), **row.asDict()}
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def run_hll(n_base: int) -> int:
    from imdedup_plus_spark import metrics as M

    spark, sigs = _sigs(n_base)
    t0 = time.time()
    row = M.distinct_shingle_hll_kernel(sigs).collect()[0]
    out = {"mode": "hll", "sec": round(time.time() - t0, 2), **row.asDict()}
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def run_exact(n_base: int) -> int:
    spark, sigs = _sigs(n_base)

    # unpack the packed-int32 sets and pre-dedup per chunk (the cheapest
    # honest form of the exact job); the global distinct still shuffles
    # the (chunk-deduped) universe — exactly the cost the KMV form avoids
    def unpack(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            col = pdf["shingle_set"]
            for lo in range(0, len(col), 1024):
                arrs = [
                    np.frombuffer(b, dtype="<i4")
                    for b in col.iloc[lo : lo + 1024]
                ]
                arrs = [a for a in arrs if a.size]
                if arrs:
                    u = np.unique(np.concatenate(arrs).astype(np.int64))
                    yield pd.DataFrame({"s": u})

    t0 = time.time()
    n = (
        sigs.select("shingle_set").mapInPandas(unpack, "s long").distinct().count()
    )
    out = {"mode": "exact", "sec": round(time.time() - t0, 2), "n_distinct": n}
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    res = {}
    for mode in ("est", "hll", "exact"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_base), f"--{mode}"],
            capture_output=True, text=True,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not lines:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            return 1
        res[mode] = json.loads(lines[-1][len("RESULT "):])
        print(json.dumps(res[mode]), flush=True)
    exact_n = res["exact"]["n_distinct"]
    # degenerate corpus (no docs pass validity): report null, don't crash
    err = (
        res["est"]["est_distinct"] / exact_n - 1.0 if exact_n else None
    )
    hll_err = (
        res["hll"]["est_distinct"] / exact_n - 1.0 if exact_n else None
    )
    print(json.dumps({
        "n_base": n_base,
        "est_distinct": res["est"]["est_distinct"],
        "hll_distinct": res["hll"]["est_distinct"],
        "exact_distinct": exact_n,
        "rel_error": round(err, 6) if err is not None else None,
        "hll_rel_error": round(hll_err, 6) if hll_err is not None else None,
        "est_sec": res["est"]["sec"],
        "hll_sec": res["hll"]["sec"],
        "exact_sec": res["exact"]["sec"],
    }))
    return 0


if __name__ == "__main__":
    if "--est" in sys.argv:
        sys.exit(run_est(int(sys.argv[1])))
    if "--hll" in sys.argv:
        sys.exit(run_hll(int(sys.argv[1])))
    if "--exact" in sys.argv:
        sys.exit(run_exact(int(sys.argv[1])))
    sys.exit(main())

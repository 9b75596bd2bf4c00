"""Corpus-scale evidence for the product-quantization lane (pq.py).

Reuses the SemDeDup evidence corpus (bench_semdedup.gen_embeddings):
deterministic dim-64 vectors with PLANTED near-duplicate twins
(ids i, i+1 for i % 50 == 0, ~1% perturbation). Two fresh processes:

* ``--encode``   train the codebooks on the smallest-id sample, then
  encode the full corpus with the production kernel
  (pq.pq_encode_kernel): walls for both, vectors/sec, quantization
  error stats, and the compression accounting (256 raw bytes ->
  16 code+id bytes per vector).
* ``--fidelity`` the question that matters for dedup: does the
  32x-compressed domain still SEPARATE near-dups from background?
  Computes the exact integer ADC (query's raw subvectors vs the
  partner's code reconstruction) for every planted twin pair and for a
  deterministic control set (id, id+25 — unrelated vectors), and
  reports the two distributions plus the separation ratio. This is the
  per-pair scoring the `emb_pq_ann_topk` lane ranks by, measured at
  corpus scale without materializing a corpus-sized pair join (bucket
  sizing for the full top-k at n=10^6 is n_planes ~ log2(n/100); the
  sf-scale driver row already certifies the ranked readout).

Usage: python scripts/bench_pq.py [n_vectors] [master]
  n_vectors  default 1_000_000
  master     default local[16]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/tmp/spark-local-pq")


def gen_embeddings_mixed(spark, n: int):
    """Planted-twin corpus with FULL-ENTROPY components: the SemDeDup
    evidence generator is affine in (seed, dim), which puts every
    subspace's vectors on a 1-D manifold (adding seed*A mod 2^31 shifts
    all 8 components of a subvector equally) — measured: 20k vectors
    collapse to ~51 distinct PQ codes, a property of that corpus, not
    of PQ. Here the affine word is passed through the lowbias32
    xorshift-multiply finalizer (the metrics.py HLL rationale) so
    components are independent; the twin structure (ids i, i+1 for
    i % 50 == 0 share a seed, +-1% perturbation) is unchanged."""
    import numpy as np
    import pandas as pd

    from scripts.bench_semdedup import PERTURB, TWIN_MOD

    DIM = 64

    def fn(batches):
        d = np.arange(DIM, dtype=np.int64)
        for pdf in batches:
            ids = pdf["id"].values.astype(np.int64)
            is_twin = (ids % TWIN_MOD) == 1
            seed = np.where(is_twin, ids - 1, ids)
            x = (
                seed[:, None] * 2654435761 + d[None, :] * 40503 + 12345
            ) % (2**31)
            for _ in range(2):
                x = ((x >> 16) ^ x) * 73244475 % 4294967296
            x = ((x >> 16) ^ x) % (2**31)
            V = x.astype(np.float64) / float(2**31) - 0.5
            pat = np.where(d % 2 == 0, 1.0, -1.0)
            V = V + np.where(is_twin, PERTURB, 0.0)[:, None] * pat[None, :]
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    return (
        spark.range(n)
        .repartition(256)
        .mapInPandas(fn, schema="vec_id long, embedding array<double>")
    )


def _setup(n: int, master: str):
    from imdedup_plus_spark.session import get_spark

    spark = get_spark(master=master, shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    emb = gen_embeddings_mixed(spark, n)
    return spark, emb


def run_encode(n: int, master: str) -> int:
    from pyspark.sql import functions as F

    from imdedup_plus_spark import pq as PQ

    spark, emb = _setup(n, master)
    emb = emb.localCheckpoint(eager=True)  # isolate generator cost
    t0 = time.time()
    cents = PQ.train_pq_codebooks(emb)
    t_train = time.time() - t0
    t0 = time.time()
    row = (
        PQ.pq_encode_kernel(emb, cents=cents)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("quant_err_micro").alias("err_min"),
            F.expr("percentile_approx(quant_err_micro, 0.5)").alias("err_med"),
            F.max("quant_err_micro").alias("err_max"),
            F.countDistinct("pq_code").alias("n_distinct_codes"),
        )
        .collect()[0]
    )
    sec = time.time() - t0
    print("RESULT " + json.dumps({
        "mode": "encode",
        "n": int(row["n"]),
        "train_sec": round(t_train, 2),
        "encode_sec": round(sec, 2),
        "vectors_per_sec": round(row["n"] / sec, 1),
        "err_micro_min_med_max": [int(row["err_min"]), int(row["err_med"]), int(row["err_max"])],
        "n_distinct_codes": int(row["n_distinct_codes"]),
        "bytes_raw_per_vec": 4 * 64,
        "bytes_code_per_vec": 8,
    }), flush=True)
    spark.stop()
    return 0


def run_fidelity(n: int, master: str) -> int:
    from pyspark.sql import functions as F

    from imdedup_plus_spark import pq as PQ
    from scripts.bench_semdedup import TWIN_MOD

    spark, emb = _setup(n, master)
    emb = emb.localCheckpoint(eager=True)
    cents = PQ.train_pq_codebooks(emb)
    codes = PQ.pq_encode_kernel(emb, cents=cents)
    cdf = spark.createDataFrame(cents, "m int, c int, cvec array<double>")

    def adc_for(offset: int, mod: int, label: str):
        a = emb.where(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("qa"), F.col("embedding").alias("qv")
        )
        b = codes.select(
            (F.col("vec_id") - offset).alias("qa"), "pq_code"
        )
        pairs = (
            a.join(b, "qa")
            .select(
                "qa",
                "qv",
                F.explode(F.expr(f"sequence(0, {PQ.PQ_M - 1})")).alias("m"),
                "pq_code",
            )
            .withColumn(
                "c",
                F.expr(
                    "CAST((pq_code div shiftleft(CAST(1 AS BIGINT), 4 * m)) % 16 AS INT)"
                ),
            )
            .join(F.broadcast(cdf), ["m", "c"])
            .withColumn(
                "sub", F.expr(f"slice(qv, m * {PQ.PQ_SUB} + 1, {PQ.PQ_SUB})")
            )
            .withColumn("dm", F.expr(PQ._micro(PQ._d2_expr("sub", "cvec"))))
            .groupBy("qa")
            .agg(F.sum("dm").alias("adc_micro"))
        )
        r = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_approx(adc_micro, 0.5)").alias("med"),
            F.expr("percentile_approx(adc_micro, 0.95)").alias("p95"),
            F.min("adc_micro").alias("mn"),
        ).collect()[0]
        return {
            f"{label}_pairs": int(r["n"]),
            f"{label}_adc_med": int(r["med"]),
            f"{label}_adc_p95": int(r["p95"]),
        }

    t0 = time.time()
    twin = adc_for(1, TWIN_MOD, "twin")       # (i, i+1), planted
    ctrl = adc_for(25, TWIN_MOD, "control")   # (i, i+25), unrelated
    out = {
        "mode": "fidelity",
        "sec": round(time.time() - t0, 2),
        **twin,
        **ctrl,
        "separation_med": round(
            ctrl["control_adc_med"] / max(twin["twin_adc_med"], 1), 1
        ),
    }
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    res = {}
    for mode in ("encode", "fidelity"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n), master, f"--{mode}"],
            capture_output=True, text=True,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if p.returncode != 0 or not lines:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            return 1
        res[mode] = json.loads(lines[-1][len("RESULT "):])
        print(json.dumps(res[mode]), flush=True)
    return 0


if __name__ == "__main__":
    if "--encode" in sys.argv:
        sys.exit(run_encode(int(sys.argv[1]), sys.argv[2]))
    if "--fidelity" in sys.argv:
        sys.exit(run_fidelity(int(sys.argv[1]), sys.argv[2]))
    sys.exit(main())

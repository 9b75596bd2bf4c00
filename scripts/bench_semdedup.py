"""Corpus-scale evidence for the SemDeDup lane (ann.semantic_dedup_kernel).

Synthesises a deterministic embedding corpus with PLANTED near-duplicate
twins (no external data, reproducible bit-for-bit), runs the kernel at a
production-shaped cell count (n_cells ~ n/1000), and reports:

  * wall seconds + vectors/sec for the full lane (codebook training +
    assignment + intra-cell pairing + keeper fold);
  * planted-twin recall = fraction of planted pairs whose two members
    landed in the same cell (twin cosine ~0.9999 >> threshold, so
    same-cell == detected; cell-boundary splits are SemDeDup's inherent
    miss mode and are reported, not hidden);
  * keeper-rule invariant: no detected pair retains both members;
  * drop accounting: with threshold 900 permille only the planted twins
    trip the predicate on this corpus, so n_dropped ~= n_planted_pairs.

Corpus: dim-64 vectors, components from a fixed integer LCG over
(seed, dim) — every id has a unique seed except ids i+1 for i % 50 == 0,
which reuse seed i plus a 1% deterministic perturbation (the twin).

Usage: python scripts/bench_semdedup.py [n_vectors] [master] [n_cells]
  n_vectors  default 1_000_000
  master     default local[16]
  n_cells    default n_vectors // 1000 (min 8)

Run on a quiet host (no overlapping Spark work); paste the JSON into
BENCH/BASELINE.md with the host calibration state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from imdedup_plus_spark import ann
from imdedup_plus_spark.session import get_spark

DIM = 64
TWIN_MOD = 50          # ids i, i+1 for i % 50 == 0 are a planted pair
PERTURB = 0.01         # twin perturbation amplitude (cosine ~0.9999)
THRESH_PERMILLE = 900  # only twins clear this on the synthetic corpus


def gen_embeddings(spark, n: int):
    """(vec_id, embedding): deterministic LCG components in [-0.5, 0.5),
    twins perturbed by PERTURB * alternating pattern. Pure numpy inside
    mapInPandas — no rand(), partitioning-invariant (seed = id)."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        d = np.arange(DIM, dtype=np.uint64)
        for pdf in batches:
            ids = pdf["id"].values.astype(np.int64)
            is_twin = (ids % TWIN_MOD) == 1
            seed = np.where(is_twin, ids - 1, ids).astype(np.uint64)
            # LCG over (seed, dim): x = (seed*A + dim*B + C) mod 2^31
            x = (
                seed[:, None] * np.uint64(2654435761)
                + d[None, :] * np.uint64(40503)
                + np.uint64(12345)
            ) % np.uint64(2**31)
            V = x.astype(np.float64) / float(2**31) - 0.5
            pat = np.where(d % 2 == 0, 1.0, -1.0)
            V = V + np.where(is_twin, PERTURB, 0.0)[:, None] * pat[None, :]
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    return (
        spark.range(n)
        .repartition(256)
        .mapInPandas(fn, schema="vec_id long, embedding array<double>")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else max(8, n // 1000)
    spark = get_spark(
        app_name="bench_semdedup", master=master, shuffle_partitions=256
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = gen_embeddings(spark, n).localCheckpoint(eager=True)
    n_vec = emb.count()
    n_planted = n_vec // TWIN_MOD  # pairs (i, i+1), i % 50 == 0

    t0 = time.time()
    out = ann.semantic_dedup_kernel(
        emb,
        threshold_permille=THRESH_PERMILLE,
        n_cells=n_cells,
    ).localCheckpoint(eager=True)
    row = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(keep = 0 AS BIGINT)")).alias("n_dropped"),
        F.sum(F.expr("CAST(n_dup_neighbors > 0 AS BIGINT)")).alias("n_dup_involved"),
    ).collect()[0]
    wall = time.time() - t0

    # planted-pair audit: same-cell == detected; never both kept
    a = out.where(F.col("vec_id") % TWIN_MOD == 0).select(
        F.col("vec_id").alias("base_id"),
        F.col("cell_id").alias("cell_a"),
        F.col("keep").alias("keep_a"),
    )
    b = out.where(F.col("vec_id") % TWIN_MOD == 1).select(
        (F.col("vec_id") - 1).alias("base_id"),
        F.col("cell_id").alias("cell_b"),
        F.col("keep").alias("keep_b"),
    )
    pr = (
        a.join(b, "base_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.expr("CAST(cell_a = cell_b AS BIGINT)")).alias("n_same_cell"),
            F.sum(
                F.expr("CAST(cell_a = cell_b AND keep_a + keep_b = 2 AS BIGINT)")
            ).alias("n_both_kept"),
        )
        .collect()[0]
    )
    recall = pr["n_same_cell"] / pr["n_pairs"] if pr["n_pairs"] else None
    print(
        "RESULT "
        + json.dumps(
            {
                "n_vectors": n_vec,
                "n_cells": n_cells,
                "master": master,
                "threshold_permille": THRESH_PERMILLE,
                "wall_sec": round(wall, 1),
                "vectors_per_sec": round(n_vec / wall, 1),
                "n_rows": row["n_rows"],
                "n_dropped": int(row["n_dropped"]),
                "n_dup_involved": int(row["n_dup_involved"]),
                "n_planted_pairs": int(pr["n_pairs"]),
                "n_same_cell": int(pr["n_same_cell"]),
                "planted_recall": round(recall, 6) if recall is not None else None,
                "n_detected_pairs_both_kept": int(pr["n_both_kept"]),
            }
        ),
        flush=True,
    )
    assert int(pr["n_both_kept"]) == 0, "keeper rule violated"
    assert int(pr["n_pairs"]) == n_planted
    spark.stop()


if __name__ == "__main__":
    main()

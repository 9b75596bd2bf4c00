"""Corpus-scale evidence for the training-data prep lanes (trainprep.py).

Runs the three heavy lanes end-to-end on the planted fixture corpus
(same generator as recall_check.py) and prints one JSON line per lane
plus a summary: wall seconds, docs/sec, and result folds that prove the
lane did real work (spans found, boilerplate lines, contamination hits).

Usage: python scripts/bench_trainprep.py [n_base] [master] [lanes...]
  n_base  variant groups (default 300000 -> 1.11M docs)
  master  spark master (default local[16])
  lanes   optional subset filter (substring match against lane names:
          dup_spans line_clean decontaminate decontaminate_sql repetition)

dup_span_stats runs through the Arrow n-gram kernel (the production
path); the lane's one heavy shuffle is the n-gram frequency aggregation.
Run on a quiet host (no overlapping Spark work) and paste the output
into BENCH/BASELINE.md with the host calibration state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from imdedup_plus_spark import fixtures as FX, trainprep as TP
from imdedup_plus_spark.session import get_spark


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    lanes = sys.argv[3:]

    def want(name: str) -> bool:
        return not lanes or any(p in name for p in lanes)

    spark = get_spark(
        app_name="bench_trainprep",
        master=master,
        shuffle_partitions=256 if n_base <= 300000 else 1024,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        FX.generate_documents(spark, n_base=n_base)
        .select(F.abs(F.hash("url")).cast("long").alias("doc_id"), "text", "lang")
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    out: dict[str, dict] = {}

    # fold inline (no collect of per-doc rows): corpus totals only
    if want("dup_spans"):
        t0 = time.time()
        spans = TP.dup_ngram_spans(docs, "doc_id", use_kernel=True)
        row = spans.agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_tokens").alias("dup_tokens"),
            F.countDistinct("doc_id").alias("docs_with_spans"),
        ).collect()[0]
        dt = time.time() - t0
        out["dup_spans_kernel"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_spans": row["n_spans"],
            "dup_tokens": int(row["dup_tokens"] or 0),
            "docs_with_spans": row["docs_with_spans"],
        }
        print("RESULT " + json.dumps({"lane": "dup_spans_kernel", **out["dup_spans_kernel"]}), flush=True)

    if want("line_clean"):
        t0 = time.time()
        lc = TP.line_clean_stats(docs, "doc_id").agg(
            F.sum("n_lines").alias("n_lines"),
            F.sum("n_dup_lines").alias("n_dup_lines"),
        ).collect()[0]
        dt = time.time() - t0
        out["line_clean"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_lines": int(lc["n_lines"]),
            "n_dup_lines": int(lc["n_dup_lines"]),
        }
        print("RESULT " + json.dumps({"lane": "line_clean", **out["line_clean"]}), flush=True)

    # decontaminate: the Arrow-kernel twin is the production path (the
    # per-row HOF SQL form did not complete one 69k-doc task in 40 min at
    # 1.11M docs — request it explicitly as "decontaminate_sql" if you
    # want to reproduce that box)
    if want("decontaminate"):
        form = (
            TP.decontaminate if lanes and any("decontaminate_sql" in p or p == "sql" for p in lanes)
            else TP.decontaminate_kernel
        )
        t0 = time.time()
        dc = form(docs, "doc_id").agg(
            F.sum("contaminated").alias("n_contaminated"),
            F.sum("n_hit_ngrams").alias("n_hits"),
        ).collect()[0]
        dt = time.time() - t0
        key = "decontaminate_sql" if form is TP.decontaminate else "decontaminate_kernel"
        out[key] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_contaminated": int(dc["n_contaminated"]),
            "n_hits": int(dc["n_hits"]),
        }
        print("RESULT " + json.dumps({"lane": key, **out[key]}), flush=True)

    if not want("repetition"):
        print(json.dumps({"n_base": n_base, "n_docs": n_docs, "master": master, "lanes": out}))
        spark.stop()
        return

    t0 = time.time()
    rep = TP.repetition_stats_kernel(docs, "doc_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("repetition_pass").alias("n_pass"),
        F.sum("dup_line_permille").alias("sum_dup_line"),
    ).collect()[0]
    dt = time.time() - t0
    out["repetition_stats"] = {
        "sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt, 1),
        "n_pass": int(rep["n_pass"]),
        "sum_dup_line_permille": int(rep["sum_dup_line"]),
    }
    print("RESULT " + json.dumps({"lane": "repetition_stats", **out["repetition_stats"]}), flush=True)

    print(json.dumps({"n_base": n_base, "n_docs": n_docs, "master": master, "lanes": out}))
    spark.stop()


if __name__ == "__main__":
    main()

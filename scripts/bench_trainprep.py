"""Corpus-scale evidence for the training-data prep lanes (trainprep.py).

Runs the three heavy lanes end-to-end on the planted fixture corpus
(same generator as recall_check.py) and prints one JSON line per lane
plus a summary: wall seconds, docs/sec, and result folds that prove the
lane did real work (spans found, boilerplate lines, contamination hits).

Usage: python scripts/bench_trainprep.py [n_base] [master] [lanes...]
  n_base  variant groups (default 300000 -> 1.11M docs)
  master  spark master (default local[16])
  lanes   optional subset filter (substring match against lane names:
          dup_spans line_clean decontaminate decontaminate_sql repetition
          bloom pii c4 dsir unimax)

The pii lane embeds deterministic synthetic PII (hygiene.synth_pii_expr_
spark, same fixture the driver oracle uses) so redaction does real work —
the planted corpus itself is PII-free word salad.

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

from imdedup_plus_spark import fixtures as FX, selection as SEL, trainprep as TP
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

    if want("repetition"):
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

    if want("bloom"):
        from imdedup_plus_spark import bloom as BF
        from imdedup_plus_spark.signatures import shingles_expr
        from imdedup_plus_spark.trainprep import DUP_NGRAM, benchmark_snippets

        # production sizing rule (bloom.py docstring): m ~= 20 * |grams|
        # bits, rounded up to a power of two — the benchmark gram set
        # grows with the corpus, so the sf0.01-sized default bitmap
        # would saturate here
        n_grams = (
            benchmark_snippets(docs, "doc_id")
            .select(
                F.explode(F.expr(shingles_expr("wh", DUP_NGRAM))).alias("h")
            )
            .distinct()
            .count()
        )
        m_bits = 1 << max(17, (20 * max(n_grams, 1) - 1).bit_length())
        t0 = time.time()
        bl = BF.bloom_decontaminate_kernel(docs, "doc_id", m_bits=m_bits).agg(
            F.sum("contaminated_bloom").alias("n_contaminated_bloom"),
            F.sum("n_bloom_hits").alias("n_bloom_hits"),
            F.sum("n_exact_hits").alias("n_exact_hits"),
            F.sum("n_false_pos").alias("n_false_pos"),
        ).collect()[0]
        dt = time.time() - t0
        out["bloom_kernel"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "m_bits": m_bits,
            "n_bench_grams": n_grams,
            "n_contaminated_bloom": int(bl["n_contaminated_bloom"]),
            "n_bloom_hits": int(bl["n_bloom_hits"]),
            "n_exact_hits": int(bl["n_exact_hits"]),
            "n_false_pos": int(bl["n_false_pos"]),
        }
        print("RESULT " + json.dumps({"lane": "bloom_kernel", **out["bloom_kernel"]}), flush=True)

    if want("pii"):
        from imdedup_plus_spark import hygiene as HG

        t0 = time.time()
        pii_docs = docs.select(
            "doc_id", F.expr(HG.synth_pii_expr_spark("doc_id")).alias("text")
        )
        pi = HG.pii_scrub(pii_docs, "doc_id").agg(
            F.sum("n_pii").alias("n_pii"),
            F.sum("n_emails").alias("n_emails"),
            F.sum("n_ipv4").alias("n_ipv4"),
            F.sum("n_phones").alias("n_phones"),
        ).collect()[0]
        dt = time.time() - t0
        out["pii_scrub"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_pii": int(pi["n_pii"]),
            "n_emails": int(pi["n_emails"]),
            "n_ipv4": int(pi["n_ipv4"]),
            "n_phones": int(pi["n_phones"]),
        }
        print("RESULT " + json.dumps({"lane": "pii_scrub", **out["pii_scrub"]}), flush=True)

    if want("c4"):
        from imdedup_plus_spark import hygiene as HG

        t0 = time.time()
        c4 = HG.c4_filters(docs, "doc_id").agg(
            F.sum("keep").alias("n_keep"),
            F.sum("flag_word_count").alias("n_flag_wc"),
            F.sum("flag_word_len").alias("n_flag_wl"),
            F.sum("n_words").alias("n_words"),
        ).collect()[0]
        dt = time.time() - t0
        out["c4_filters"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_keep": int(c4["n_keep"]),
            "n_flag_word_count": int(c4["n_flag_wc"]),
            "n_flag_word_len": int(c4["n_flag_wl"]),
            "n_words": int(c4["n_words"]),
        }
        print("RESULT " + json.dumps({"lane": "c4_filters", **out["c4_filters"]}), flush=True)

    if want("dsir"):
        # top-K sized to the corpus-scale question (is the TakeOrdered
        # heap + model fold scale-shaped), not the sf-fixture default
        t0 = time.time()
        top = SEL.dsir_select_kernel(docs, "doc_id", k=10000).agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.min("dsir_llr_bits").alias("min_llr"),
            F.max("dsir_llr_bits").alias("max_llr"),
            F.sum("n_feats").alias("n_feats_selected"),
        ).collect()[0]
        dt = time.time() - t0
        out["dsir_kernel"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_selected": int(top["n_selected"]),
            "min_llr_bits": int(top["min_llr"]),
            "max_llr_bits": int(top["max_llr"]),
            "n_feats_selected": int(top["n_feats_selected"]),
        }
        print("RESULT " + json.dumps({"lane": "dsir_kernel", **out["dsir_kernel"]}), flush=True)

    if want("unimax"):
        t0 = time.time()
        um = SEL.unimax_alloc(docs, "doc_id").agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("alloc_tokens").alias("alloc_tokens"),
            F.sum("capped").alias("n_capped"),
        ).collect()[0]
        dt = time.time() - t0
        out["unimax_alloc"] = {
            "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt, 1),
            "n_langs": int(um["n_langs"]),
            "n_tokens": int(um["n_tokens"]),
            "alloc_tokens": int(um["alloc_tokens"]),
            "n_capped": int(um["n_capped"]),
        }
        print("RESULT " + json.dumps({"lane": "unimax_alloc", **out["unimax_alloc"]}), flush=True)

    print(json.dumps({"n_base": n_base, "n_docs": n_docs, "master": master, "lanes": out}))
    spark.stop()


if __name__ == "__main__":
    main()

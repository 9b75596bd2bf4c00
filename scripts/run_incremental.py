"""spark-submit entry point for the Structured Streaming incremental lane.

Ships like the batch pipeline::

    sh scripts/make_pyfiles.sh
    spark-submit --py-files dist/imdedup_plus_spark.zip \
        --driver-memory 48g \
        scripts/run_incremental.py \
        --input /landing/dir/of/document_parquet_files \
        --state /path/to/state_tables \
        --id-col url

``--driver-memory`` matters in local mode: the driver IS the executor
and the in-code session conf cannot size an already-running JVM — the
1g default OOMs on corpus-scale inputs (size it like an executor).

Each invocation drains all files currently under ``--input`` that the
stream checkpoint has not yet processed (``Trigger.AvailableNow``), probes
them against the accumulated band index under ``--state``, appends verified
pairs, and exits. Run it from cron / an orchestrator as new crawl batches
land; state and progress survive across invocations (and crashes — the
foreachBatch appends are gated by the source checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="landing dir watched by the file source")
    ap.add_argument("--state", required=True, help="dir for band/signature/pair state tables")
    ap.add_argument("--id-col", default="url")
    ap.add_argument(
        "--schema",
        default="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    ap.add_argument("--n-bands", type=int, default=8)
    ap.add_argument("--rows-per-band", type=int, default=1)
    ap.add_argument("--shingle-window", type=int, default=2)
    ap.add_argument("--bucket-cap", type=int, default=32)
    ap.add_argument("--verify-jaccard-pct", type=int, default=30)
    ap.add_argument("--verify-sketch-k", type=int, default=128)
    ap.add_argument(
        "--hot-window", type=int, default=4,
        help="sorted-neighborhood window inside hot buckets (0 = drop-only "
        "capping; default matches SCALE_CONFIG's size-stable-recall tiering)",
    )
    ap.add_argument(
        "--mega-cap", type=int, default=1024,
        help="buckets above this are corpus stop-shingles and are dropped "
        "even with --hot-window > 0",
    )
    ap.add_argument(
        "--clusters", action="store_true",
        help="after draining, fold the new pairs epochs into the "
        "incrementally maintained cluster assignment (clusters_base/ + "
        "cluster_remap/ under --state); read it back with "
        "streaming.read_clusters",
    )
    ap.add_argument(
        "--compact-clusters", action="store_true",
        help="after folding, compact the cluster store (resolved base + "
        "empty remap snapshot) — run periodically to bound snapshot growth",
    )
    ap.add_argument(
        "--supersede", action="store_true",
        help="recrawl-aware mode: an arriving id that already has a live "
        "version retires it (tombstones + negative bucket deltas); batches "
        "must be id-unique — collapse within-batch revisions upstream "
        "(weburl.latest_revision). Current pairs: read_pairs(current_only)",
    )
    ap.add_argument(
        "--compact-state", action="store_true",
        help="after draining, physically remove superseded versions from "
        "bands/signatures/deltas/pairs and drop the tombstones (the "
        "Iceberg rewrite_data_files analog; run with no stream in flight)",
    )
    ap.add_argument(
        "--track-distinct", action="store_true",
        help="persist a per-epoch KMV bottom-k distinct-shingle sketch "
        "(distinct_sketch/ under --state); fold with "
        "streaming.read_distinct_estimate — O(k) per epoch, exact KMV "
        "union merge",
    )
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from imdedup_plus_spark import streaming as ST
    from imdedup_plus_spark.config import DedupConfig
    from imdedup_plus_spark.session import get_spark

    cfg = DedupConfig(
        n_bands=args.n_bands,
        rows_per_band=args.rows_per_band,
        shingle_window=args.shingle_window,
        bucket_cap=args.bucket_cap,
        verify_jaccard_pct=args.verify_jaccard_pct,
        verify_sketch_k=args.verify_sketch_k,
        hot_window=args.hot_window,
        mega_cap=args.mega_cap,
    )
    spark = get_spark(
        app_name="imdedup-plus-spark-incremental",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    ST.run_incremental_stream(
        spark,
        args.input,
        args.state,
        cfg,
        id_col=args.id_col,
        schema=args.schema,
        max_files_per_trigger=args.max_files_per_trigger,
        supersede=args.supersede,
        track_distinct=args.track_distinct,
    )
    try:
        n_pairs = ST.read_pairs(
            spark, args.state, current_only=args.supersede
        ).count()
    except Exception:
        n_pairs = 0
    out = {"state": args.state, "total_verified_pairs": n_pairs}
    if args.track_distinct:
        est = ST.read_distinct_estimate(spark, args.state).collect()[0]
        out["distinct_estimate"] = est.asDict()
    if args.compact_state:
        out["compact_state"] = ST.compact_state_store(
            spark, args.state, args.id_col
        )
    if args.clusters:
        folded = ST.update_cluster_store(spark, args.state, args.id_col)
        out["folded_epochs"] = folded
        out["n_clustered_docs"] = ST.read_clusters(
            spark, args.state, args.id_col
        ).count()
        if args.compact_clusters:
            out["n_compacted"] = ST.compact_cluster_store(
                spark, args.state, args.id_col
            )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

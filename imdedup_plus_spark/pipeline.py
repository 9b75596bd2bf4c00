"""End-to-end orchestration with resumable per-stage checkpoints.

The reference's unit of resumability is the batch (``PATCH_SIZE`` patches,
fresh feature tables per batch — ``/root/reference/idedup.c:308-313,
824-830``). The north rule requires *global* dedup with per-partition
lineage + metrics and resume-from-checkpoint. Design:

* every expensive stage (signatures, verified pairs, clusters, spans)
  materializes to ``<workdir>/<stage>/`` as Parquet (Iceberg when a catalog
  is configured — this sandbox has no Iceberg jar, and SURVEY.md §7 allows
  the Parquet-plus-manifest fallback);
* a stage is complete iff ``<workdir>/<stage>/_LINEAGE.json`` exists — it is
  written *after* the Parquet commit, so a killed run can never leave a
  complete-looking stage behind (write-ahead ordering = idempotent resume);
* the lineage record carries row count, config echo, and wall time — the
  per-partition metrics the north rule asks for come from Spark's own
  per-file Parquet statistics plus this manifest;
* re-running a completed stage is a no-op read (tests/test_resume.py).

At 100 TB each stage boundary is also the natural operational boundary:
signatures are ~40 bytes/doc (8 x 8-byte features + id), pairs and clusters
are tiny relative to the corpus, so checkpoint I/O is negligible next to
the document scan.

Exact Iceberg mapping of this fallback (what a cluster with the
``iceberg-spark-runtime`` jar would configure; every concept below has a
1:1 analog in this module, so swapping the writer is mechanical):

* session conf::

    spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.dedup=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.dedup.type=hadoop           # or hive/rest
    spark.sql.catalog.dedup.warehouse=<workdir>

* ``<workdir>/<stage>/`` parquet dir  ->  table ``dedup.db.<stage>``,
  written with ``df.writeTo("dedup.db.<stage>").createOrReplace()``;
  the bands/state tables partitioned by ``(band_id, bucket(band_hash))``
  so streaming probes prune to the touched buckets (streaming.py does
  this today via parquet partition dirs).
* ``_LINEAGE.json`` written-after-data  ->  Iceberg's snapshot commit:
  atomicity comes from the catalog swap instead of manifest ordering,
  and the row-count/config echo land in snapshot ``summary`` properties
  (``df.writeTo(...).option("snapshot-property.cfg", ...)``).
* resume no-op read  ->  time-travel to the last committed snapshot;
  a partially-written attempt is invisible (uncommitted snapshot).
* the streaming epoch manifest (streaming.py) -> MERGE INTO keyed on
  ``epoch`` with ``WHEN NOT MATCHED THEN INSERT`` — replayed epochs
  become no-ops server-side instead of via the manifest check.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import candidates as C
from . import clustering as CL
from . import signatures as S
from . import spans as SP
from .config import DedupConfig

STAGES = (
    "recrawls",
    "exact_groups",
    "signatures",
    "verified_pairs",
    "clusters",
    "spans",
    "span_summary",
)


class CheckpointedPipeline:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: DedupConfig | None = None,
        id_col: str = "doc_id",
        cc_algorithm: str = "minlabel",
        collapse_recrawls: bool = False,
    ) -> None:
        self.spark = spark
        self.workdir = workdir
        self.cfg = cfg or DedupConfig()
        self.id_col = id_col
        #: opt-in Common-Crawl pre-stage (weburl.py): canonicalize URLs and
        #: keep only the newest warc_ts revision per canonical URL, so exact
        #: recrawl volume never reaches shingling. Requires url + warc_ts
        #: columns on the input (the input_hint shape).
        self.collapse_recrawls = collapse_recrawls
        #: "minlabel" (default; O(diameter) rounds, fine for shallow web
        #: fan-outs) or "star" (large-star/small-star, O(log^2 n) rounds
        #: for adversarial long-chain pair graphs) — see clustering.py
        self.cc_algorithm = cc_algorithm
        os.makedirs(workdir, exist_ok=True)

    # -- lineage -----------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_LINEAGE.json")

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self._lineage_path(stage))

    def _commit(self, stage: str, df: DataFrame, started: float) -> DataFrame:
        path = self._stage_dir(stage)
        tmp = path + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        out = self.spark.read.parquet(path)
        lineage = {
            "stage": stage,
            "rows": out.count(),
            "n_files": len([f for f in os.listdir(path) if f.endswith(".parquet")]),
            "config": asdict(self.cfg),
            "wall_sec": round(time.time() - started, 3),
            "completed_at_epoch": int(time.time()),
        }
        with open(self._lineage_path(stage), "w") as fh:
            json.dump(lineage, fh, indent=2)
        return out

    def _load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    def _stage(self, stage: str, build) -> DataFrame:
        if self.is_complete(stage):
            return self._load(stage)
        t0 = time.time()
        return self._commit(stage, build(), t0)

    def lineage(self) -> list[dict]:
        out = []
        for st in STAGES:
            if self.is_complete(st):
                with open(self._lineage_path(st)) as fh:
                    out.append(json.load(fh))
        return out

    # -- stages --------------------------------------------------------------
    def run(self, docs: DataFrame) -> dict[str, DataFrame]:
        cfg, idc = self.cfg, self.id_col

        if self.collapse_recrawls:
            from . import weburl as WU

            missing = {"url", "warc_ts"} - set(docs.columns)
            if missing:
                raise ValueError(
                    f"collapse_recrawls needs url+warc_ts columns; missing {missing}"
                )
            keep = list(docs.columns)
            src = docs
            docs = self._stage(
                "recrawls", lambda: WU.latest_revision(src, keep_cols=keep)
            )

        valid = S.valid_documents(docs, cfg)

        exact_groups = None
        lsh_input = valid
        if cfg.exact_prepass:
            # FIX_OPTI analog: collapse identical texts to one representative
            # before the quadratic stages (2df.c:477-494 / index.c:254-264)
            from . import textfns as T

            exact_groups = self._stage(
                "exact_groups",
                lambda: T.exact_dup_groups(valid, idc).select(idc, "exact_rep"),
            )
            lsh_input = valid.join(
                exact_groups.where(F.col(idc) == F.col("exact_rep")).select(idc),
                idc,
            )

        # scale path: Arrow/numpy kernels, bit-identical to the SQL forms
        # (tests/test_signatures.py, tests/test_candidates.py) but immune to
        # the JVM interpreted-HOF / array_intersect allocation walls
        # measured in BENCH/BASELINE.md
        sig = self._stage(
            "signatures",
            lambda: S.signature_kernel_arrow(lsh_input, cfg, idc),
        )

        def _build_verified() -> DataFrame:
            pairs = C.candidate_pairs(S.explode_bands(sig, cfg, idc), cfg, idc)
            if cfg.short_doc_tokens > 0:
                pairs = (
                    pairs.unionByName(C.short_doc_pairs(lsh_input, cfg, idc))
                    .groupBy("id_a", "id_b")
                    .agg(F.max("n_matching_bands").alias("n_matching_bands"))
                )
            return C.verify_pairs_kernel(pairs, sig, cfg, idc)

        verified = self._stage("verified_pairs", _build_verified)

        def _build_clusters() -> DataFrame:
            rep_clusters = CL.clusters_from_pairs(
                sig, verified, idc, algorithm=self.cc_algorithm
            )
            if exact_groups is None:
                return rep_clusters
            # expand: every member inherits its representative's cluster id
            return (
                exact_groups.join(
                    rep_clusters.withColumnRenamed(idc, "exact_rep"), "exact_rep"
                )
                .select(idc, "cluster_id")
            )

        clusters = self._stage("clusters", _build_clusters)
        spans = self._stage(
            "spans",
            lambda: SP.extract_spans(
                SP.pair_texts_from_clusters(clusters, docs, idc),
                cfg,
                string_ids=dict(docs.dtypes)[idc] == "string",
            ),
        )
        summary = self._stage("span_summary", lambda: SP.span_summary(spans))
        uniques = C.unique_documents(valid, verified, idc)
        return {
            "valid": valid,
            "signatures": sig,
            "verified_pairs": verified,
            "clusters": clusters,
            "spans": spans,
            "span_summary": summary,
            "uniques": uniques,
        }

"""End-to-end training-data prep pipeline: composition invariants,
resume idempotency, shard artifact layout.

trainpipe.TrainingPrepPipeline chains the dedup tier and the round-4
prep tier (keepers -> verdict -> PII-scrubbed selection -> shuffle +
packing) through the same checkpoint/lineage protocol as the dedup
pipeline; every stage is an operator that holds its own oracle row.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark.config import REFERENCE_CONFIG
from imdedup_plus_spark.trainpipe import TrainingPrepPipeline


@pytest.fixture(scope="module")
def pipe_out(spark, sf001_docs, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("trainpipe"))
    pipe = TrainingPrepPipeline(
        spark, wd, REFERENCE_CONFIG, id_col="doc_id"
    )
    out = pipe.run_prep(sf001_docs)
    return pipe, out


def test_verdict_covers_every_valid_doc(pipe_out):
    pipe, out = pipe_out
    assert out["verdict"].count() == out["valid"].count()
    # selected == the kept slice, exactly
    kept = out["verdict"].where(F.col("kept") == 1).select("doc_id")
    sel = out["selected"].select("doc_id")
    assert kept.subtract(sel).count() == 0
    assert sel.subtract(kept).count() == 0


def test_no_dropped_doc_survives(pipe_out):
    pipe, out = pipe_out
    # no near-dup non-keeper, contaminated or c4-failed doc is selected
    bad = (
        out["verdict"]
        .where(
            (F.col("neardup_keep") == 0)
            | (F.col("contaminated") == 1)
            | (F.col("c4_keep") == 0)
        )
        .select("doc_id")
    )
    assert out["selected"].join(bad, "doc_id").count() == 0


def test_shards_dense_and_complete(pipe_out):
    pipe, out = pipe_out
    n = out["selected"].count()
    sh = out["shards"]
    assert sh.count() == n
    assert sh.select("shard", "pos").distinct().count() == n
    per = sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("sz"), F.max("pos").alias("hi")
    )
    assert per.where(F.col("hi") != F.col("sz") - 1).count() == 0
    # packing columns present and sane
    assert sh.where(F.col("chunk_last") < F.col("chunk_first")).count() == 0


def test_resume_is_noop(spark, sf001_docs, pipe_out):
    pipe, out = pipe_out
    marks = {
        st: os.path.getmtime(pipe._lineage_path(st))
        for st in ("signatures", "verdict", "selected", "shards")
    }
    out2 = pipe.run_prep(sf001_docs)
    for st, m in marks.items():
        assert os.path.getmtime(pipe._lineage_path(st)) == m
    assert out2["selected"].count() == out["selected"].count()
    # a fresh pipeline object over the same workdir also resumes
    pipe3 = TrainingPrepPipeline(
        spark, pipe.workdir, REFERENCE_CONFIG, id_col="doc_id"
    )
    out3 = pipe3.run_prep(sf001_docs)
    assert out3["shards"].count() == out["shards"].count()
    stages = {r["stage"] for r in pipe3.lineage()}
    assert {"keepers", "verdict", "selected", "shards"} <= stages


def test_write_shards_layout(spark, pipe_out, tmp_path):
    pipe, out = pipe_out
    outdir = str(tmp_path / "shards_out")
    manifest = pipe.write_shards(outdir)
    assert manifest["rows"] == out["selected"].count()
    dirs = sorted(glob.glob(outdir + "/shard=*"))
    assert len(dirs) == pipe.n_shards
    # one file per shard, rows ordered by pos inside it (the on-disk
    # row order IS the training order)
    for d in dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1
        pdf = spark.read.parquet(d).select("pos").toPandas()
        assert list(pdf.pos) == sorted(pdf.pos)
    back = spark.read.parquet(outdir)
    assert back.count() == manifest["rows"]
    # every selected doc present exactly once with its scrubbed text
    assert (
        back.select("doc_id").distinct().count() == manifest["rows"]
    )


def test_string_id_refused(spark, sf001_docs):
    p = TrainingPrepPipeline(
        spark, "/tmp/never-used-wd", REFERENCE_CONFIG, id_col="url"
    )
    docs = sf001_docs.withColumn("url", F.col("doc_id").cast("string"))
    with pytest.raises(ValueError, match="numeric id_col"):
        p.run_prep(docs)

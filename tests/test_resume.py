"""T4: determinism + resume — kill-and-resume yields identical clusters;
re-running a completed stage is a no-op."""

from __future__ import annotations

import json
import os
import shutil

from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG
from imdedup_plus_spark.pipeline import CheckpointedPipeline


def _clusters_of(res):
    return sorted((r.url, r.cluster_id) for r in res["clusters"].collect())


def test_resume_is_noop_and_deterministic(spark, fixture_corpus, tmp_path):
    docs = fixture_corpus.drop("base_id", "variant")
    wd = str(tmp_path / "wd")

    p1 = CheckpointedPipeline(spark, wd, CFG, id_col="url")
    r1 = p1.run(docs)
    c1 = _clusters_of(r1)
    lineage1 = {l["stage"]: l["completed_at_epoch"] for l in p1.lineage()}
    assert set(lineage1) == {"signatures", "verified_pairs", "clusters", "spans", "span_summary"}

    # full re-run: every stage must be skipped (identical lineage timestamps)
    p2 = CheckpointedPipeline(spark, wd, CFG, id_col="url")
    r2 = p2.run(docs)
    lineage2 = {l["stage"]: l["completed_at_epoch"] for l in p2.lineage()}
    assert lineage1 == lineage2
    assert _clusters_of(r2) == c1

    # simulate a crash after verified_pairs: clusters onward lost
    for stage in ("clusters", "spans", "span_summary"):
        shutil.rmtree(os.path.join(wd, stage))
    p3 = CheckpointedPipeline(spark, wd, CFG, id_col="url")
    r3 = p3.run(docs)
    lineage3 = {l["stage"]: l["completed_at_epoch"] for l in p3.lineage()}
    # untouched stages kept their manifests; rebuilt stages have fresh ones
    assert lineage3["signatures"] == lineage1["signatures"]
    assert lineage3["verified_pairs"] == lineage1["verified_pairs"]
    assert _clusters_of(r3) == c1


def test_lineage_written_after_data(spark, fixture_corpus, tmp_path):
    """The manifest is the commit marker: an in-progress dir must never be
    visible as a completed stage."""
    docs = fixture_corpus.drop("base_id", "variant")
    wd = str(tmp_path / "wd2")
    p = CheckpointedPipeline(spark, wd, CFG, id_col="url")
    r = p.run(docs)
    for stage in ("signatures", "verified_pairs", "clusters"):
        d = os.path.join(wd, stage)
        assert os.path.exists(os.path.join(d, "_LINEAGE.json"))
        with open(os.path.join(d, "_LINEAGE.json")) as fh:
            rec = json.load(fh)
        assert rec["rows"] > 0
        assert not os.path.exists(d + ".inprogress")

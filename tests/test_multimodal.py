"""Multimodal plumbing: extraction invariant, binary metadata, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import multimodal as MM


def test_extract_text_invariant(spark, fixture_corpus):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    docs = fixture_corpus.drop("base_id", "variant")
    ext = MM.extract_text_df(docs)
    chk = ext.join(docs.select("url", "text"), "url")
    assert chk.where("extracted_text != text").count() == 0


def test_binary_metadata(spark, fixture_corpus):
    docs = fixture_corpus.drop("base_id", "variant")
    md = MM.binary_metadata(docs, "html", "url")
    rows = md.limit(5).collect()
    assert all(r.n_bytes > 0 for r in rows)
    # html starts with '<html'
    assert all(r.magic_hex == "3C68746D" for r in rows)


def test_decode_image_stub_raises(spark, fixture_corpus):
    docs = fixture_corpus.drop("base_id", "variant").limit(2)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        MM.decode_image(docs, "html", "url").collect()


def test_decode_image_fake_plumbing(spark, fixture_corpus):
    docs = fixture_corpus.drop("base_id", "variant").limit(8)
    out = MM.decode_image(docs, "html", "url", deterministic_fake=True)
    rows = out.collect()
    assert len(rows) == 8
    assert all(len(r.features) == 8 for r in rows)
    assert all(r.width >= 64 and r.height >= 64 for r in rows)
    # deterministic: re-run yields identical rows
    rows2 = MM.decode_image(docs, "html", "url", deterministic_fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_frame_sample_fake_explodes(spark, fixture_corpus):
    docs = fixture_corpus.drop("base_id", "variant").limit(3)
    out = MM.sample_frames(docs, "html", "url", deterministic_fake=True).collect()
    assert len(out) >= 3
    assert all(len(bytes(r.frame)) <= 16 for r in out)

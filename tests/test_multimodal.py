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


def test_decode_image_rejects_non_png(spark, fixture_corpus):
    docs = fixture_corpus.drop("base_id", "variant").limit(2)
    with pytest.raises(Exception):  # ValueError surfaces as PythonException
        MM.decode_image(docs, "html", "url").collect()


def test_decode_image_real_codec(spark, sf001_docs):
    """decode_image over real PNG bytes must reproduce the source pixels'
    statistics exactly (cross-checked in-driver against synth_image)."""
    import numpy as np

    docs = sf001_docs.limit(8)
    rows = MM.decode_image(MM.synth_png_df(docs, "doc_id"), "png", "doc_id").collect()
    assert len(rows) == 8
    for r in rows:
        img = MM.synth_image(int(r["doc_id"]))
        assert (r.height, r.width) == img.shape
        assert r.pixel_sum == int(img.astype(np.int64).sum())
        hist = [r[f"hist_{b}"] for b in range(8)]
        assert hist == [int(x) for x in np.bincount(img.reshape(-1) >> 5, minlength=8)]


def test_resize_image_real(spark, sf001_docs):
    """resize -> decode equals in-driver resize_nearest of the source."""
    import numpy as np

    from imdedup_plus_spark.png import resize_nearest

    docs = sf001_docs.limit(5)
    resized = MM.resize_image(MM.synth_png_df(docs, "doc_id"), "png", "doc_id", size=(6, 10))
    rows = MM.decode_image(resized, "resized", "doc_id").collect()
    for r in rows:
        exp = resize_nearest(MM.synth_image(int(r["doc_id"])), 6, 10)
        assert (r.height, r.width) == (6, 10)
        assert r.pixel_sum == int(exp.astype(np.int64).sum())


def test_frame_sample_real_container(spark, sf001_docs):
    """Container parse keeps exactly frames 0, 2, ... and each kept frame
    decodes to the right per-frame pixels."""
    import numpy as np

    docs = sf001_docs.limit(6)
    sampled = MM.sample_frames(MM.synth_video_df(docs, "doc_id"), "video", "doc_id", every_n=2)
    rows = MM.decode_image(sampled, "frame", "doc_id", carry=("frame_idx",)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        exp = MM.synth_image(int(r["doc_id"]), int(r["frame_idx"]))
        assert r.pixel_sum == int(exp.astype(np.int64).sum())
    for did, rs in by_doc.items():
        n_frames = 1 + did % 4
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, n_frames, 2))


def test_html_to_text_messy_cases():
    """Real-parser invariants on messier planted html (no Spark needed)."""
    from imdedup_plus_spark.multimodal import html_to_text_py

    assert html_to_text_py(
        '<html><head><title>T</title><meta x="y"></head>'
        '<body><script>if (a < b) { alert("<hi>"); }</script>'
        "<style>p > a { color: red }</style>"
        "<!-- note: <div> inside comment -->"
        '<h1 class="big">Hello</h1>\n\n<p data-k="v">world &amp; &lt;friends&gt;</p>'
        "</body></html>"
    ) == 'Hello world & <friends>'
    # entity decode is single-pass: &amp;lt; -> literal &lt;
    assert html_to_text_py("<p>&amp;lt;</p>") == "&lt;"
    # unterminated tag / plain text passes through
    assert html_to_text_py("no markup at all") == "no markup at all"
    assert html_to_text_py("  a\t b\n\nc ") == "a b c"


def test_html_extract_roundtrip_query(spark, sf001_docs):
    from imdedup_plus_spark.multimodal import html_extract_roundtrip

    out = html_extract_roundtrip(sf001_docs, "doc_id")
    rows = out.collect()
    assert rows and all(r["roundtrip_ok"] for r in rows)


def test_decode_image_injected_decoder_seam(spark, sf001_docs):
    """VERDICT r03 #6: the native-codec injection seam. A stub decoder
    (stand-in for Pillow/libjpeg-turbo on a real cluster) slots into the
    same mapInPandas plumbing: identical schema, deterministic stats from
    the fake pixels — and the default path is bit-unchanged."""
    import numpy as np

    docs = sf001_docs.limit(8)
    pngs = MM.synth_png_df(docs, "doc_id")

    def fake_decoder(b: bytes) -> np.ndarray:
        # deterministic 4x4 gray ramp seeded by payload length
        v = len(b) % 251
        return (np.arange(16, dtype=np.int64).reshape(4, 4) + v).astype(
            np.uint8
        )

    injected = MM.decode_image(pngs, "png", "doc_id", decoder=fake_decoder)
    default = MM.decode_image(pngs, "png", "doc_id")
    assert injected.schema == default.schema
    rows = {r.doc_id: r for r in injected.collect()}
    lens = {
        r.doc_id: len(bytes(r.png))
        for r in pngs.select("doc_id", "png").collect()
    }
    assert len(rows) == 8
    for did, r in rows.items():
        v = lens[did] % 251
        assert (r.width, r.height, r.channels, r.n_pixels) == (4, 4, 1, 16)
        assert r.pixel_sum == sum(range(16)) + 16 * v
        assert r.pixel_min == v and r.pixel_max == v + 15
    # default path: same rows as before the seam existed (real codec)
    d0 = {r.doc_id: r.pixel_sum for r in default.collect()}
    assert set(d0) == set(rows) and any(
        d0[k] != rows[k].pixel_sum for k in d0
    )

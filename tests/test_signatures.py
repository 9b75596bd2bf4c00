"""Signature arithmetic: HOF path == pure-python reference == Arrow kernel."""

from __future__ import annotations

from pyspark.sql import functions as F

from imdedup_plus_spark import signatures as S
from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG, DedupConfig, perm_constants


def test_python_reference_matches_spark_hof(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a b"),
        (4, "x " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: list(r.sig)
        for r in S.with_signature(S.valid_documents(df, CFG), CFG).collect()
    }
    for doc_id, text in rows:
        exp = S._sig_of_text_py(text, CFG)
        assert got[doc_id] == exp, doc_id


def test_arrow_kernel_matches_hof(spark, sf001_docs):
    hof = S.with_signature(S.valid_documents(sf001_docs, CFG), CFG).select(
        "doc_id", "sig", "shingle_set"
    )
    arrow = S.signature_kernel_arrow(sf001_docs, CFG, "doc_id")
    import numpy as np

    a = {r.doc_id: (list(r.sig), list(r.shingle_set)) for r in hof.collect()}
    # kernel emits the set as packed little-endian int32 binary
    b = {
        r.doc_id: (list(r.sig), np.frombuffer(r.shingle_set, dtype="<i4").tolist())
        for r in arrow.collect()
    }
    assert a == b


def test_arrow_kernel_adversarial_text(spark):
    """The chunked-flat kernel's codepoint-array tokenizer must match the
    per-token reference on every edge: Unicode whitespace that is NOT in
    WS_CLASS (nbsp, ideographic space stay word chars), astral codepoints,
    multi-char lower() expansions, runs of separators, doc lengths around
    the chunk boundaries, and dropped (too-short / empty) docs interleaved
    with kept ones."""
    import numpy as np

    texts = [
        "",                                     # dropped
        " \t\n\x0b\f\r ",                       # separators only — dropped
        "one-token",                            # dropped (min_tokens=2)
        "a\tb\x0bc\fd\re f",
        "\xa0nbsp\xa0is one token here",        # nbsp is NOT a separator
        "　ideographic　space tokens",
        "\U0001F600 emoji \U0001F600 emoji",    # astral plane
        "İstanbul LOWER dotted I",         # lower() expands to 2 chars
        "tab\t\t\tmulti   space",
        ("ab " * 500).strip(),                  # long repetitive doc
        "x y " * 70,                            # crosses the 64-doc chunk? no
    ] + [f"doc {i} filler words alpha beta {i}" for i in range(80)]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (list(r.sig),
                   np.frombuffer(r.shingle_set, dtype="<i4").tolist(),
                   r.n_set_true)
        for r in S.signature_kernel_arrow(df, CFG, "doc_id").collect()
    }
    for doc_id, text in rows:
        exp_sig = S._sig_of_text_py(text, CFG)  # lowers internally
        if exp_sig is None:
            assert doc_id not in got, doc_id
            continue
        assert got[doc_id][0] == exp_sig, doc_id
        # shingle set: sorted distinct of the reference shingles
        toks = S.ascii_tokens(text.lower())
        whs = [S._word_hash_py(t) for t in toks]
        win = CFG.shingle_window
        sh = []
        for i in range(len(whs) - win + 1):
            acc = 0
            for h in whs[i : i + win]:
                acc = (acc * S.SHINGLE_MULT + h) % S.HASH_MOD
            sh.append(acc)
        exp_set = sorted(set(sh))
        assert got[doc_id][1] == exp_set, doc_id
        assert got[doc_id][2] == len(exp_set), doc_id


def test_validity_filter_drops_short_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two tokens")], "doc_id long, text string"
    )
    kept = [r.doc_id for r in S.valid_documents(df, CFG).select("doc_id").collect()]
    assert kept == [3]


def test_band_explode_shape(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sig = S.with_signature(S.valid_documents(df, CFG), CFG)
    bands = S.explode_bands(sig, CFG, "doc_id").collect()
    assert len(bands) == CFG.n_bands
    assert sorted(b.band_id for b in bands) == list(range(CFG.n_bands))
    # rows_per_band=1 -> band_hash == sig[band_id]
    s = sig.collect()[0].sig
    for b in bands:
        assert b.band_hash == s[b.band_id]


def test_rows_per_band_sum_digest(spark):
    cfg = DedupConfig(n_bands=4, rows_per_band=2)
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    sig = S.with_signature(S.valid_documents(df, cfg), cfg)
    s = sig.collect()[0].sig
    bands = {b.band_id: b.band_hash for b in S.explode_bands(sig, cfg, "doc_id").collect()}
    for i in range(4):
        assert bands[i] == s[2 * i] + s[2 * i + 1]


def test_perm_constants_derivation():
    ks, bs = perm_constants(8)
    assert len(ks) == len(bs) == 8
    assert all(0 < k < 2**31 - 1 for k in ks)
    assert all(0 <= b < 2**31 - 1 for b in bs)


def test_ascii_tokens_matches_regex_class():
    """The C-speed translate+split tokenizer == re.split on the canonical
    ASCII whitespace class: Unicode whitespace must NOT split, runs of
    class members collapse, edge empties drop."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from imdedup_plus_spark.signatures import WS_CLASS, ascii_tokens

    rx = re.compile(WS_CLASS + "+")

    def ref(s):
        return [t for t in rx.split(s) if t]

    for s in [
        "", " ", "\t\n\x0b\f\r", "a b", " a\tb\nc\x0bd\fe\rf ",
        "uni\xa0code spaces must stay glued",
        "a  b\t\tc", "\r\na", "tail ",
    ]:
        assert ascii_tokens(s) == ref(s), repr(s)

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="ab \t\n\x0b\f\r\xa0 é", max_size=40))
    def prop(s):
        assert ascii_tokens(s) == ref(s)

    prop()

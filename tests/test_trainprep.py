"""trainprep.py — training-data prep lanes: adversarial semantics + DuckDB
parity on hand-built corpora (the sf0.01 parity runs live in
scripts/driver_check.py; these tests pin the EDGE behavior)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from imdedup_plus_spark import trainprep as TP


def _mk_docs(spark, rows):
    """rows: list of (doc_id, text, lang)."""
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _words(n, tag=""):
    return " ".join(f"w{tag}{i}" for i in range(n))


# ---------------------------------------------------------------------------
# duplicated-span removal
# ---------------------------------------------------------------------------


def test_dup_spans_exact_dup_covers_whole_doc(spark):
    """Two identical 20-token docs: every 13-gram is duplicated, the
    merged span covers [0, 20) in both, dup_permille == 1000."""
    rows = [(1, _words(20), "en"), (2, _words(20), "en")]
    spans = _collect(TP.dup_ngram_spans(_mk_docs(spark, rows), "doc_id"))
    assert spans == [(1, 0, 20, 20), (2, 0, 20, 20)]
    stats = {r[0]: r for r in _collect(TP.dup_span_stats(_mk_docs(spark, rows), "doc_id"))}
    assert stats[1] == (1, 20, 1, 20, 1000)
    assert stats[2] == (2, 20, 1, 20, 1000)


def test_dup_spans_touching_windows_merge_gap_splits(spark):
    """Doc 3 shares tokens 0-12 and 20-32 of doc 1's vocabulary via two
    separate 13-token runs with a unique 7-token gap: two spans, not one
    merged — while a doc repeating a 14-token run internally merges the
    two overlapping windows into ONE maximal span."""
    run_a = _words(13, "a")
    run_b = _words(13, "b")
    rows = [
        (1, f"{run_a} {_words(7, 'x')} {run_b}", "en"),
        (2, f"{run_a} {_words(7, 'y')} {run_b}", "en"),
        # 14-token run repeated back-to-back inside one doc: positions
        # 0..15 of 28 tokens are all duplicated 14-gram-wise at w=13 —
        # windows overlap, must merge to one span
        (3, f"{_words(14, 'z')} {_words(14, 'z')}", "en"),
    ]
    spans = _collect(TP.dup_ngram_spans(_mk_docs(spark, rows), "doc_id"))
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r[0], []).append(r)
    # docs 1/2: two disjoint spans each ([0,13) and [20,33))
    for d in (1, 2):
        assert [(s[1], s[2]) for s in sorted(by_doc[d])] == [(0, 13), (20, 33)]
    # doc 3: ONE merged span — the repeated 14-run means shingle i ==
    # shingle i+14 for i in 0..1, plus cross-matches; merged maximal span
    assert len(by_doc[3]) == 1


def test_dup_spans_short_and_empty_docs_zero_rows(spark):
    rows = [(1, _words(5), "en"), (2, "", "en"), (3, _words(40), "en")]
    spans = _collect(TP.dup_ngram_spans(_mk_docs(spark, rows), "doc_id"))
    assert spans == []  # nothing duplicated, nothing >= window in 1/2
    stats = {r[0]: r for r in _collect(TP.dup_span_stats(_mk_docs(spark, rows), "doc_id"))}
    assert stats[1] == (1, 5, 0, 0, 0)
    assert stats[2] == (2, 0, 0, 0, 0)
    assert stats[3] == (3, 40, 0, 0, 0)


def test_ngram_kernel_bit_identical_to_expr_path(spark, fixture_corpus):
    """The Arrow n-gram-positions kernel must equal the HOF expression
    path row-for-row on the fixture corpus AND on adversarial texts
    (unicode whitespace, short docs, empty docs)."""
    docs = fixture_corpus.select(
        F.col("url").alias("doc_id_s"), "text"
    ).withColumn("doc_id", F.abs(F.hash("doc_id_s")).cast("long")).drop(
        "doc_id_s"
    )
    a = sorted(
        tuple(r) for r in TP._pos_ngrams(docs, "doc_id", 13).collect()
    )
    b = sorted(
        tuple(r)
        for r in TP.ngram_positions_kernel(docs, "doc_id", 13).collect()
    )
    assert a == b and len(a) > 0

    rows = [
        (1, "a\x0bb\tc\rd\ne f \xa0unicodews " + _words(15), "en"),
        (2, "", "en"),
        (3, _words(12), "en"),
        (4, _words(13), "en"),
    ]
    df = _mk_docs(spark, rows)
    a = sorted(tuple(r) for r in TP._pos_ngrams(df, "doc_id", 13).collect())
    b = sorted(
        tuple(r) for r in TP.ngram_positions_kernel(df, "doc_id", 13).collect()
    )
    assert a == b
    # and the full span lane through the kernel equals the SQL lane
    s1 = sorted(tuple(r) for r in TP.dup_ngram_spans(df, "doc_id").collect())
    s2 = sorted(
        tuple(r)
        for r in TP.dup_ngram_spans(df, "doc_id", use_kernel=True).collect()
    )
    assert s1 == s2


def test_dup_spans_duckdb_parity_adversarial(spark):
    rows = [
        (1, _words(20), "en"),
        (2, _words(20), "en"),
        (3, f"{_words(13, 'a')} gap1 gap2 {_words(13, 'a')}", "en"),
        (4, "", "en"),
        (5, "one two three", "en"),
        (6, "tab\tand\nnewline " + _words(15), "en"),
        (7, "tab\tand\nnewline " + _words(15), "de"),
    ]
    df = _mk_docs(spark, rows)
    for fn, sql in (
        (TP.dup_ngram_spans, TP.dup_ngram_spans_sql("doc_id")),
        (TP.dup_span_stats, TP.dup_span_stats_sql("doc_id")),
    ):
        assert _collect(fn(df, "doc_id")) == _duck(rows, sql)


def test_span_clean_text_semantics(spark):
    """Exact-dup pair -> both fully removed (empty clean text); a doc
    with a duplicated prefix keeps exactly its unique suffix; a doc with
    no duplicated spans passes through (whitespace-normalized)."""
    run = _words(20)
    rows = [
        (1, run, "en"),
        (2, run, "en"),
        (3, f"{run} {_words(6, 'u')}", "en"),
        (4, "solo  doc\twith   messy whitespace", "en"),
    ]
    out = {r[0]: r for r in _collect(TP.span_clean_text(_mk_docs(spark, rows), "doc_id"))}
    assert out[1] == (1, 20, 0, "")
    assert out[2] == (2, 20, 0, "")
    assert out[3] == (3, 26, 6, _words(6, "u"))
    assert out[4] == (4, 5, 5, "solo doc with messy whitespace")


def test_span_clean_text_duckdb_parity(spark):
    rows = [
        (1, _words(20), "en"),
        (2, _words(20), "en"),
        (3, f"{_words(20)} {_words(6, 'u')}", "en"),
        (4, "", "en"),
        (5, _words(5), "en"),
    ]
    df = _mk_docs(spark, rows)
    assert _collect(TP.span_clean_text(df, "doc_id")) == _duck(
        rows, TP.span_clean_text_sql("doc_id")
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_snippet_sharers(spark):
    """doc 0 (id % 41 == 0) donates tokens 6..35 as the benchmark snippet;
    doc 1 copies that exact region -> contaminated; doc 2 disjoint."""
    donor = _words(60)
    donor_tokens = donor.split()
    snippet = " ".join(donor_tokens[6:36])
    rows = [
        (0, donor, "en"),
        (1, f"{_words(4, 'p')} {snippet} {_words(4, 'q')}", "en"),
        (2, _words(50, "z"), "en"),
    ]
    out = {r[0]: r for r in _collect(TP.decontaminate(_mk_docs(spark, rows), "doc_id"))}
    assert out[0][3] == 1  # the donor contains its own snippet
    assert out[1][3] == 1 and out[1][2] >= 1
    assert out[2] == (2, 50 - 13 + 1, 0, 0)


def test_decontaminate_duckdb_parity(spark):
    rows = [
        (0, _words(60), "en"),
        (41, _words(10), "en"),  # benchmark doc too short for a 13-gram
        (1, _words(60), "en"),   # exact copy of donor -> contaminated
        (2, _words(30, "q"), "en"),
        (3, "", "en"),
    ]
    df = _mk_docs(spark, rows)
    assert _collect(TP.decontaminate(df, "doc_id")) == _duck(
        rows, TP.decontaminate_sql("doc_id")
    )


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------


def test_line_lanes_partial_trailing_line_and_boilerplate(spark):
    """Docs of 20 tokens = lines [0:8],[8:16],[16:20] (partial trailing
    line hashed too). Two docs share ALL lines (exact dup); a third
    shares none -> boilerplate = the 3 shared hashes; clean stats count
    positions."""
    rows = [
        (1, _words(20), "en"),
        (2, _words(20), "en"),
        (3, _words(20, "u"), "en"),
    ]
    df = _mk_docs(spark, rows)
    ls = _collect(TP.line_stats(df, "doc_id"))
    assert len(ls) == 3 and all(r[1] == 2 and r[2] == 2 for r in ls)
    cs = {r[0]: r for r in _collect(TP.line_clean_stats(df, "doc_id"))}
    assert cs[1] == (1, 3, 3, 0)
    assert cs[2] == (2, 3, 3, 0)
    assert cs[3] == (3, 3, 0, 1000)


def test_line_clean_empty_doc_retains_1000(spark):
    rows = [(1, "", "en"), (2, _words(9), "en"), (3, _words(9), "en")]
    cs = {r[0]: r for r in _collect(TP.line_clean_stats(_mk_docs(spark, rows), "doc_id"))}
    assert cs[1] == (1, 0, 0, 1000)
    # 9 tokens = full line + 1-token partial line, both duplicated
    assert cs[2] == (2, 2, 2, 0)


def test_line_lanes_duckdb_parity(spark):
    rows = [
        (1, _words(20), "en"),
        (2, _words(20), "en"),
        (3, _words(17, "u"), "en"),  # 17 = 2 lines + 1-token partial
        (4, "", "en"),
        (5, _words(8), "en"),
        (6, " ".join((_words(8), _words(8))), "en"),  # line repeated intra-doc
    ]
    df = _mk_docs(spark, rows)
    for fn, sql in (
        (TP.line_stats, TP.line_stats_sql("doc_id")),
        (TP.line_clean_stats, TP.line_clean_stats_sql("doc_id")),
    ):
        assert _collect(fn(df, "doc_id")) == _duck(rows, sql)


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_sample_deterministic_and_stratified(spark):
    rows = [(i, f"t{i}", lang) for i, lang in enumerate(
        ["en", "de", "fr", "es", "xx"] * 40
    )]
    df = _mk_docs(spark, rows)
    out1 = _collect(TP.sample_stratified(df, "doc_id"))
    out2 = _collect(TP.sample_stratified(df.repartition(7), "doc_id"))
    assert out1 == out2  # partitioning-invariant determinism
    langs = {r[1] for r in out1}
    assert "xx" not in langs  # unknown language -> rate 0
    # full-rate language keeps everything
    full = _collect(TP.sample_stratified(df, "doc_id", rates={"xx": 1000}))
    assert len(full) == 40 and all(r[1] == "xx" for r in full)
    # rates order en > de > fr > es holds approximately on 40 ids each
    by_lang = {}
    for r in out1:
        by_lang[r[1]] = by_lang.get(r[1], 0) + 1
    assert by_lang.get("en", 0) > by_lang.get("es", 0)


def test_sample_duckdb_parity(spark):
    rows = [(i * 7 + 3, f"t{i}", l) for i, l in enumerate(["en", "de", "fr", "es", "it"] * 20)]
    df = _mk_docs(spark, rows)
    assert _collect(TP.sample_stratified(df, "doc_id")) == _duck(
        rows, TP.sample_stratified_sql("doc_id")
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_chunks_offsets_contiguous_and_boundary(spark):
    """Single bucket (n_buckets=1): offsets are the running sum in id
    order; a doc straddling the ctx boundary spans two chunks."""
    rows = [(1, _words(500), "en"), (2, _words(30), "en"), (3, _words(600), "en")]
    out = {r[0]: r for r in _collect(
        TP.pack_chunks(_mk_docs(spark, rows), "doc_id", ctx=512, n_buckets=1)
    )}
    assert out[1] == (1, 0, 500, 0, 0, 0)
    assert out[2] == (2, 0, 30, 500, 0, 1)      # straddles 512
    assert out[3] == (3, 0, 600, 530, 1, 2)
    # zero-token doc dropped
    rows2 = rows + [(4, "", "en")]
    out2 = _collect(TP.pack_chunks(_mk_docs(spark, rows2), "doc_id", ctx=512, n_buckets=1))
    assert {r[0] for r in out2} == {1, 2, 3}


def test_pack_chunks_buckets_independent(spark):
    rows = [(i, _words(100 + i), "en") for i in range(16)]
    out = _collect(TP.pack_chunks(_mk_docs(spark, rows), "doc_id", ctx=256, n_buckets=4))
    # per bucket: offsets start at 0 and are contiguous in id order
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r[1], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for rows_b in by_bucket.values():
        rows_b.sort()
        off = 0
        for r in rows_b:
            assert r[3] == off
            off += r[2]


def test_pack_chunks_duckdb_parity(spark):
    rows = [(i * 3 + 1, _words(40 + (i * 37) % 200), "en") for i in range(25)]
    rows.append((100, "", "en"))
    df = _mk_docs(spark, rows)
    assert _collect(TP.pack_chunks(df, "doc_id")) == _duck(
        rows, TP.pack_chunks_sql("doc_id")
    )


# ---------------------------------------------------------------------------
# whitespace-class parity (the WS_CLASS discipline applies here too)
# ---------------------------------------------------------------------------


def test_trainprep_exotic_whitespace_parity(spark):
    rows = [
        (1, "a\x0bb\tc\rd\ne f " + _words(15), "en"),
        (2, "a\x0bb\tc\rd\ne f " + _words(15), "en"),
    ]
    df = _mk_docs(spark, rows)
    for fn, sql in (
        (TP.dup_span_stats, TP.dup_span_stats_sql("doc_id")),
        (TP.line_clean_stats, TP.line_clean_stats_sql("doc_id")),
        (TP.pack_chunks, TP.pack_chunks_sql("doc_id")),
    ):
        assert _collect(fn(df, "doc_id")) == _duck(rows, sql)


# ---------------------------------------------------------------------------
# intra-document repetition stats (Gopher rules)
# ---------------------------------------------------------------------------


def test_repetition_stats_known_values(spark):
    # doc 1: one token repeated 64x -> 8 identical lines (7/8 dup = 875),
    # 2 identical paras (1/2 = 500), top-2gram count 63 covering
    # min(126, 64) = all 64 tokens -> 1000 permille; FAILS the gate.
    # doc 2: 64 distinct tokens -> zero dup lines/paras, top2 count 1
    # covering 2/64 -> floor(31.25) = 31; PASSES.
    # doc 3: empty -> all zeros, vacuously passes.
    rows = [
        (1, " ".join(["spam"] * 64), "en"),
        (2, _words(64), "en"),
        (3, "", "en"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in TP.repetition_stats(_mk_docs(spark, rows), "doc_id").collect()
    }
    assert out[1] == {
        "doc_id": 1, "n_tokens": 64, "n_lines": 8,
        "dup_line_permille": 875, "dup_para_permille": 500,
        "top2_permille": 1000, "top3_permille": 1000,
        "top4_permille": 1000, "repetition_pass": 0,
    }
    assert out[2]["dup_line_permille"] == 0
    assert out[2]["dup_para_permille"] == 0
    assert out[2]["top2_permille"] == 31  # floor(1000*2/64)
    assert out[2]["top3_permille"] == 46  # floor(1000*3/64)
    assert out[2]["repetition_pass"] == 1
    assert out[3] == {
        "doc_id": 3, "n_tokens": 0, "n_lines": 0,
        "dup_line_permille": 0, "dup_para_permille": 0,
        "top2_permille": 0, "top3_permille": 0, "top4_permille": 0,
        "repetition_pass": 1,
    }


def test_repetition_stats_duckdb_parity(spark):
    rows = [
        (1, " ".join(["spam"] * 64), "en"),
        (2, _words(64), "en"),
        (3, "", "en"),
        (4, "one", "en"),                        # 1 token: no grams at all
        (5, ("a b " * 40).strip(), "en"),        # alternating bigram storm
        (6, _words(7) + " " + _words(7), "en"),  # doc shorter than one line x2
        (7, "x \t x\nx  x " + _words(30), "en"), # whitespace zoo + repeats
    ]
    df = _mk_docs(spark, rows)
    assert _collect(TP.repetition_stats(df, "doc_id")) == _duck(
        rows, TP.repetition_stats_sql("doc_id")
    )


def test_repetition_kernel_bit_identical_to_expr_path(spark, fixture_corpus):
    rows = [
        (1, " ".join(["spam"] * 64), "en"),
        (2, _words(64), "en"),
        (3, "", "en"),
        (4, "one", "en"),
        (5, ("a b " * 40).strip(), "en"),
        (6, _words(7) + " " + _words(7), "en"),
        (7, "x \t x\nx  x " + _words(30), "en"),
        (8, _words(3), "en"),                      # shorter than any gram>3
    ]
    df = _mk_docs(spark, rows)
    assert _collect(TP.repetition_stats_kernel(df, "doc_id")) == _collect(
        TP.repetition_stats(df, "doc_id")
    )
    corp = fixture_corpus.select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text", "lang"
    )
    assert _collect(TP.repetition_stats_kernel(corp, "doc_id")) == _collect(
        TP.repetition_stats(corp, "doc_id")
    )

def test_decontaminate_kernel_matches_sql_form(spark, fixture_corpus):
    from pyspark.sql import functions as F

    from imdedup_plus_spark import trainprep as TP

    docs = fixture_corpus.select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    a = sorted(
        tuple(r[c] for c in sorted(r.asDict()))
        for r in TP.decontaminate(docs, "doc_id").collect()
    )
    b = sorted(
        tuple(r[c] for c in sorted(r.asDict()))
        for r in TP.decontaminate_kernel(docs, "doc_id").collect()
    )
    assert a == b
    assert len(a) > 0


def test_decontaminate_kernel_short_and_empty_docs(spark):
    from imdedup_plus_spark import trainprep as TP

    docs = spark.createDataFrame(
        [
            (0, "only five tokens right here"),  # < window -> 0 grams
            (41, ""),  # empty, and a snippet-donor id (mod 41)
            (82, " ".join(f"w{i}" for i in range(40))),  # donor with grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TP.decontaminate_kernel(docs, "doc_id").collect()}
    assert len(out) == 3
    assert out[0]["n_doc_ngrams"] == 0 and out[0]["contaminated"] == 0
    assert out[41]["n_doc_ngrams"] == 0 and out[41]["contaminated"] == 0
    # id 82 donated its tokens 7..36 to the benchmark -> self-flags
    assert out[82]["n_doc_ngrams"] == 40 - 13 + 1
    assert out[82]["contaminated"] == 1
    assert out[82]["n_hit_ngrams"] > 0


# ---------------------------------------------------------------------------
# line_split="newline" — the real-text splitter knob (VERDICT r04 #6)
# ---------------------------------------------------------------------------

_NL_ROWS = [
    # boilerplate line "cookie banner accept" in 3 docs; blank lines and
    # trailing newlines; one doc with no newlines at all
    (1, "welcome page one\ncookie banner accept\nunique alpha beta\n", "en"),
    (2, "another page here\ncookie banner accept\n\nunique gamma delta", "en"),
    (3, "cookie banner accept\nthird page text\n", "en"),
    (4, "no newlines just one single line of words", "en"),
    (5, "", "en"),
    (6, "\n\n  \n", "en"),                      # whitespace-only lines
    (7, "dup line\ndup line\ndup line\nfresh tail", "en"),  # intra-doc dups
    (8, "para one words here\n\npara one words here\n\npara two", "en"),
]


def test_line_clean_stats_newline_parity_and_semantics(spark):
    df = _mk_docs(spark, _NL_ROWS)
    got = _collect(TP.line_clean_stats(df, "doc_id", line_split="newline"))
    assert got == _duck(
        _NL_ROWS, TP.line_clean_stats_sql("doc_id", line_split="newline")
    )
    by_id = {r[0]: r for r in got}
    # docs 1-3 share exactly one boilerplate line
    for i in (1, 2, 3):
        assert by_id[i][2] == 1, by_id[i]
    # doc 4: one line, nothing shared; doc 5/6: zero token-bearing lines
    assert by_id[4] == (4, 1, 0, 1000)
    assert by_id[5] == (5, 0, 0, 1000)
    assert by_id[6] == (6, 0, 0, 1000)
    # doc 7: intra-doc repeats are NOT cross-doc boilerplate
    assert by_id[7] == (7, 4, 0, 1000)


def test_line_stats_newline_parity(spark):
    df = _mk_docs(spark, _NL_ROWS)
    got = _collect(TP.line_stats(df, "doc_id", line_split="newline"))
    assert got == _duck(
        _NL_ROWS, TP.line_stats_sql("doc_id", line_split="newline")
    )
    # exactly one boilerplate hash (the cookie banner), in 3 docs
    assert len(got) == 1 and got[0][1] == 3 and got[0][2] == 3


def test_line_lanes_tokens_mode_unchanged_by_knob(spark):
    """Default mode must be byte-identical to the pre-knob behavior on
    newline-free text (the synthetic-corpus contract)."""
    rows = [(1, " ".join(f"w{i}" for i in range(30)), "en"),
            (2, " ".join(f"w{i}" for i in range(30)), "en")]
    df = _mk_docs(spark, rows)
    a = _collect(TP.line_clean_stats(df, "doc_id"))
    b = _collect(TP.line_clean_stats(df, "doc_id", line_split="tokens"))
    assert a == b
    assert a == _duck(rows, TP.line_clean_stats_sql("doc_id"))


def test_repetition_stats_newline_parity_all_three_forms(spark):
    """Column form == DuckDB twin == kernel under the newline splitter,
    on embedded-newline fixtures with blank-line paragraphs."""
    rows = _NL_ROWS + [
        # heavy line repetition -> dup_line > 300 permille
        (9, "\n".join(["same line again"] * 8 + ["tail"]), "en"),
        # paragraph repetition (blank-line separated)
        (10, "\n\n".join(["para body words here"] * 5 + ["other"]), "en"),
    ]
    df = _mk_docs(spark, rows)
    col = _collect(TP.repetition_stats(df, "doc_id", line_split="newline"))
    duck = _duck(
        rows, TP.repetition_stats_sql("doc_id", line_split="newline")
    )
    ker = _collect(
        TP.repetition_stats_kernel(df, "doc_id", line_split="newline")
    )
    assert col == duck
    assert col == ker
    by_id = {r[0]: r for r in col}
    # (doc_id, n_tokens, n_lines, dup_line, dup_para, top2, top3, top4, pass)
    assert by_id[9][3] > 300 and by_id[9][8] == 0     # line-repeat fails
    assert by_id[10][4] > 300 and by_id[10][8] == 0   # para-repeat fails
    assert by_id[5][2] == 0 and by_id[5][8] == 1      # empty doc passes
    assert by_id[7][3] == 500                         # 2 of 4 lines dup


def test_line_split_rejects_unknown_mode(spark):
    df = _mk_docs(spark, _NL_ROWS[:1])
    with pytest.raises(ValueError, match="line_split"):
        TP.line_clean_stats(df, "doc_id", line_split="sentence")
    with pytest.raises(ValueError, match="line_split"):
        TP.repetition_stats_sql("doc_id", line_split="para")


def test_newline_splitter_crlf_and_exotic_ws_parity(spark):
    """Windows line endings: splitting on \\n leaves the \\r inside the
    segment, where the WS_CLASS tokenizer strips it — so CRLF text hashes
    identically to LF text, in both engines."""
    rows = [
        (1, "alpha beta\r\ngamma delta\r\n\r\nepsilon", "en"),
        (2, "alpha beta\ngamma delta\n\nepsilon", "en"),
        (3, "tab\tsep\x0bvt\r\nform\ffeed", "en"),
    ]
    df = _mk_docs(spark, rows)
    got = _collect(TP.line_clean_stats(df, "doc_id", line_split="newline"))
    assert got == _duck(
        rows, TP.line_clean_stats_sql("doc_id", line_split="newline")
    )
    rep = _collect(TP.repetition_stats(df, "doc_id", line_split="newline"))
    assert rep == _duck(
        rows, TP.repetition_stats_sql("doc_id", line_split="newline")
    )
    assert rep == _collect(
        TP.repetition_stats_kernel(df, "doc_id", line_split="newline")
    )
    # CRLF doc 1 and LF doc 2 produce identical per-doc metrics
    by_id = {r[0]: r[1:] for r in rep}
    assert by_id[1] == by_id[2]

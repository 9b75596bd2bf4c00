"""hygiene.py — PII scrub + C4 gate: planted-PII semantics, regex parity
across the two engines (Java vs RE2), gate boundary cases."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from imdedup_plus_spark import hygiene as H
from imdedup_plus_spark import textfns as T


def _mk_docs(spark, rows):
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
# PII scrub
# ---------------------------------------------------------------------------

_PII_ROWS = [
    (1, "contact alice.b-1%x@mail.example.org for details", "en"),
    (2, "server at 192.168.0.1 and 10.0.0.255 rebooted", "en"),
    (3, "call +1 555 0142 or +442071838750 now", "en"),
    (4, "mixed a@b.co 1.2.3.4 +12345678 end", "en"),
    (5, "clean text with no personal data at all", "en"),
    (6, "", "en"),
    # adversarial: '@' without a TLD, dotted digits too short for ipv4,
    # '+' followed by letters — none may match
    (7, "not-pii me@localhost 1.2.3 +abc 12 34", "en"),
]


def test_pii_counts_and_oracle_parity(spark):
    got = _collect(H.pii_scrub(_mk_docs(spark, _PII_ROWS), "doc_id"))
    want = _duck(_PII_ROWS, H.pii_scrub_sql("doc_id"))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][1:5] == (1, 0, 0, 1)  # one email
    assert by_id[2][1:5] == (0, 2, 0, 2)  # two ipv4
    assert by_id[3][1:5] == (0, 0, 2, 2)  # two phones
    assert by_id[4][1:5] == (1, 1, 1, 3)
    assert by_id[5][1:5] == (0, 0, 0, 0)
    assert by_id[6][1:5] == (0, 0, 0, 0) and by_id[6][5] == 0
    assert by_id[7][1:5] == (0, 0, 0, 0)


def test_pii_scrub_fingerprint_semantics(spark):
    """A clean doc's scrub_fp equals its plain fingerprint; a PII doc's
    does not (the redaction token changed the token stream)."""
    rows = [(1, "hello plain world", "en"),
            (2, "hello a@b.co world", "en")]
    docs = _mk_docs(spark, rows)
    fp = {r[0]: r[1] for r in T.fingerprint(docs, "doc_id").collect()}
    scrub = {r[0]: r[5] for r in H.pii_scrub(docs, "doc_id").collect()}
    assert scrub[1] == fp[1]
    assert scrub[2] != fp[2]
    # and the scrubbed fingerprint is exactly the fingerprint of the
    # redacted text
    red = _mk_docs(spark, [(2, "hello  xemailx  world", "en")])
    assert scrub[2] == T.fingerprint(red, "doc_id").collect()[0][1]


def test_synth_pii_fixture_non_vacuous(spark):
    """The driver fixture must embed exactly one of each PII class into
    every doc (identical expression both engines)."""
    rows = [(0, _words(30), "en"), (123, _words(80), "en")]
    docs = _mk_docs(spark, rows).select(
        "doc_id", F.expr(H.synth_pii_expr_spark("doc_id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    got = _collect(H.pii_scrub(docs, "doc_id"))
    sql = (
        "WITH piidocs AS (SELECT doc_id, "
        + H.synth_pii_expr_duck("doc_id")
        + " AS text FROM documents) "
        + H.pii_scrub_sql("doc_id", "piidocs")
    )
    assert got == _duck(rows, sql)
    for r in got:
        assert r[1:5] == (1, 1, 1, 3), r


# ---------------------------------------------------------------------------
# C4 gate
# ---------------------------------------------------------------------------


def test_c4_word_count_boundary(spark):
    rows = [
        (1, _words(H.C4_MIN_WORDS - 1), "en"),   # one short -> flagged
        (2, _words(H.C4_MIN_WORDS), "en"),        # exactly at bound -> keep
        (3, "", "en"),                             # empty -> flagged, mwl 0
    ]
    got = {r[0]: r for r in _collect(H.c4_filters(_mk_docs(spark, rows), "doc_id"))}
    assert got == {r[0]: r for r in _duck(rows, H.c4_filters_sql("doc_id"))}
    assert got[1][3] == 1 and got[1][8] == 0
    assert got[2][3] == 0
    assert got[3] == (3, 0, 0, 1, 1, 0, 0, 0, 0)


def test_c4_substring_flags_and_word_len(spark):
    # 5-7 char words: mean length within [3, 10] so only the injected
    # defect trips each row (_words() makes 2-3 char words, which trips
    # the word-length gate itself)
    long_enough = " ".join(f"word{i}" for i in range(60))
    rows = [
        (1, long_enough + " var f = {x} template", "en"),
        (2, long_enough + " Lorem Ipsum dolor sit", "en"),
        (3, long_enough + " enable JavaScript to continue", "en"),
        # 60 single-char words: mean length 1000 permille < 3000 -> flagged
        (4, " ".join("a" for _ in range(60)), "en"),
        # 60 twelve-char words: mean 12000 permille > 10000 -> flagged
        (5, " ".join("abcdefghijkl" for _ in range(60)), "en"),
        (6, long_enough, "en"),
    ]
    got = {r[0]: r for r in _collect(H.c4_filters(_mk_docs(spark, rows), "doc_id"))}
    assert got == {r[0]: r for r in _duck(rows, H.c4_filters_sql("doc_id"))}
    assert got[1][5] == 1 and got[1][8] == 0   # curly
    assert got[2][6] == 1 and got[2][8] == 0   # lorem (case-folded)
    assert got[3][7] == 1 and got[3][8] == 0   # javascript (case-folded)
    assert got[4][4] == 1 and got[4][2] == 1000
    assert got[5][4] == 1 and got[5][2] == 12000
    assert got[6][8] == 1 and all(got[6][i] == 0 for i in range(3, 8))


def test_n_pii_counts_replacements_not_matches(spark):
    """ADVICE r04: an IPv4-shaped substring INSIDE an email (or a phone
    digit-run inside either) must count once — per-class counts are taken
    on the text that class's replacement actually ran on, so n_pii equals
    the number of replaced spans in scrubbed_text. Parity with DuckDB."""
    rows = [
        # host part of the email looks like an IPv4: pre-fix this counted
        # n_emails=1 AND n_ipv4=1 (2 replacements never happened)
        (1, "mail bob@10.0.0.1.example.com now", "en"),
        # a plain ipv4 NOT inside an email still counts
        (2, "server 10.0.0.1 down", "en"),
        # both: one email (with ipv4-ish host) and one standalone ipv4
        (3, "x bob@10.0.0.1.example.com y 192.168.0.7 z", "en"),
    ]
    got = {r[0]: r for r in _collect(H.pii_scrub(_mk_docs(spark, rows), "doc_id"))}
    duck = {r[0]: r for r in _duck(rows, H.pii_scrub_sql("doc_id"))}
    assert got == duck
    # (doc_id, n_emails, n_ipv4, n_phones, n_pii, scrub_fp)
    assert got[1][1] == 1 and got[1][2] == 0 and got[1][4] == 1
    assert got[2][2] == 1 and got[2][4] == 1
    assert got[3][1] == 1 and got[3][2] == 1 and got[3][4] == 2
    # n_pii == number of replacement tokens in the scrubbed text
    txt = {r[0]: r for r in _collect(
        H.pii_scrub_text(_mk_docs(spark, rows), "doc_id"))}
    for i in (1, 2, 3):
        scrubbed = txt[i][1]
        n_spans = scrubbed.count("xemailx") + scrubbed.count("xipx") + \
            scrubbed.count("xphonex")
        assert txt[i][2] == n_spans == got[i][4]

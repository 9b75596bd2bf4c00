"""cms.py — Count-Min sketch heavy hitters: one-sided error law, forced
collisions at tiny width, Column/SQL/kernel parity, edge corpora."""

from __future__ import annotations

import duckdb

from imdedup_plus_spark import cms as CMS


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


def _corpus():
    """A 13-token boilerplate run planted in docs 0, 3, 7, 20 — doc 0
    and doc 20 are in the candidate sample (id % CMS_CAND_MOD == 0), so
    the repeated grams are probe-able; docs 9/11 carry disjoint vocab;
    doc 5 is shorter than the gram window (contributes nothing)."""
    boiler = _words(13, "boil")
    return [
        (0, f"{boiler} {_words(10, 'a')}", "en"),
        (3, f"{_words(5, 'b')} {boiler}", "en"),
        (7, f"{boiler} {_words(3, 'c')}", "en"),
        (20, f"{_words(4, 'd')} {boiler} {_words(4, 'e')}", "en"),
        (9, _words(30, "z"), "en"),
        (11, _words(25, "q"), "en"),
        (5, _words(6, "tiny"), "en"),
    ]


def test_cms_matches_oracle_and_detects_planted_hh(spark):
    rows = _corpus()
    got = _collect(CMS.cms_heavy_hitters(_mk_docs(spark, rows), "doc_id"))
    want = _duck(rows, CMS.cms_heavy_hitters_sql("doc_id"))
    assert got == want
    # the planted boilerplate 13-gram occurs in 4 docs: it must be
    # emitted (estimate >= exact = 4 >= hh_min) and labeled a true HH
    assert any(r[1] == 4 and r[4] == 1 for r in got)
    # every emitted row obeys the one-sided law
    assert all(r[3] >= 0 and r[2] == r[1] + r[3] for r in got)


def test_cms_kernel_bit_identical(spark):
    rows = _corpus()
    docs = _mk_docs(spark, rows)
    for w in (CMS.CMS_W, 64):
        col_form = _collect(CMS.cms_heavy_hitters(docs, "doc_id", w=w))
        kern = _collect(CMS.cms_heavy_hitters_kernel(docs, "doc_id", w=w))
        assert col_form == kern, f"w={w}"


def test_tiny_width_forces_overestimates_never_under(spark):
    """At w = 64 nearly every gram collides: estimates must still bound
    the exact count from ABOVE on every candidate (one-sided error is
    the CMS contract), and both engines must agree on each overestimate."""
    rows = _corpus()
    got = _collect(CMS.cms_heavy_hitters(_mk_docs(spark, rows), "doc_id", w=64))
    want = _duck(rows, CMS.cms_heavy_hitters_sql("doc_id", w=64))
    assert got == want
    assert all(r[2] >= r[1] and r[3] >= 0 for r in got)
    # collisions at w=64 must actually produce at least one overestimate
    # on this corpus (27 distinct grams into 64 columns x 4 rows)
    assert any(r[3] > 0 for r in got)
    # and singleton grams of sampled docs ride over hh_min on collided
    # estimates only as false positives — never labeled true HHs
    assert all(r[4] == 0 for r in got if r[1] < CMS.CMS_HH_MIN)


def test_cms_no_sampled_candidates_empty_output(spark):
    """Every doc id coprime with CMS_CAND_MOD: the candidate probe set is
    empty, so the readout is empty in all three forms (the sketch still
    builds; readout needs candidates by design)."""
    rows = [(1, _words(20), "en"), (3, _words(20), "en")]
    docs = _mk_docs(spark, rows)
    assert _collect(CMS.cms_heavy_hitters(docs, "doc_id")) == []
    assert _collect(CMS.cms_heavy_hitters_kernel(docs, "doc_id")) == []
    assert _duck(rows, CMS.cms_heavy_hitters_sql("doc_id")) == []


def test_cms_affine_constants_int64_safe():
    from imdedup_plus_spark.config import HASH_MOD

    for k, b in CMS.CMS_KB:
        assert k * (HASH_MOD - 1) + b < 2**63
    # distinct rows for h = 0 (B_i pairwise distinct)
    assert len({b for _, b in CMS.CMS_KB}) == CMS.CMS_D

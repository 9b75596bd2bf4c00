"""Fixture generator determinism (pure-python parts, no Spark needed)."""

from __future__ import annotations

from imdedup_plus_spark import fixtures as FX


def test_rows_deterministic_and_partition_independent():
    a = FX._rows_for_unit(7, n_base=64)
    b = FX._rows_for_unit(7, n_base=64)
    assert a == b
    # neighboring units don't influence each other
    FX._rows_for_unit(6, n_base=64)
    c = FX._rows_for_unit(7, n_base=64)
    assert a == c


def test_base_unit_shape():
    rows = FX._rows_for_unit(3, n_base=64)
    assert len(rows) in (3, 4)  # 3 variants + optional exact dup
    urls = [r[0] for r in rows]
    assert len(set(urls)) == len(urls)
    texts = [r[3] for r in rows]
    assert texts[0] != texts[1] != texts[2]
    if len(rows) == 4:
        assert texts[3] == texts[0]  # variant 3 is the exact duplicate
    # same base_id on all rows
    assert {r[5] for r in rows} == {3}


def test_distractor_unit_is_singleton():
    rows = FX._rows_for_unit(64 + 5, n_base=64)
    assert len(rows) == 1
    assert rows[0][5] == -1


def test_extraction_invariant_pure():
    for unit in (0, 1, 64 + 2):
        for r in FX._rows_for_unit(unit, n_base=64):
            assert FX.extract_text(r[2]) == r[3]


def test_site_boilerplate_shared():
    n_base = 64
    r3 = FX._rows_for_unit(3, n_base)[0][3].split()
    # find another base on the same site (site = base_id % (n_base//50+1))
    n_sites = n_base // 50 + 1
    other = 3 + n_sites
    r_other = FX._rows_for_unit(other, n_base)[0][3].split()
    assert r3[:12] == r_other[:12]      # shared header
    assert r3[-12:] == r_other[-12:]    # shared footer

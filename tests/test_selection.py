"""selection.py — DSIR importance resampling, UniMax waterfill, verdict
CASE: Spark/DuckDB parity, ranking sanity, waterfill laws (hypothesis),
empty-target and zero-token edges."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from imdedup_plus_spark import selection as SEL


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _dsir_corpus():
    """Target slice = id % 23 == 0 (ids 0, 23, 46) with a distinctive
    vocabulary; docs 1-2 repeat target vocab (should float up), docs 3-4
    are OOV junk (should sink), doc 5 mixes, doc 6 is empty."""
    tgt = "quantum entangle qubit decohere superpose measure collapse basis"
    junk = "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7 zzq8"
    return [
        (0, f"{tgt} {tgt}", "en"),
        (23, f"{tgt} amplitude phase", "en"),
        (46, f"{tgt}", "en"),
        (1, f"{tgt} {tgt} {tgt}", "en"),
        (2, f"quantum qubit measure {tgt}", "en"),
        (3, f"{junk} {junk}", "en"),
        (4, f"{junk} zzq9 zzq10", "en"),
        (5, f"quantum {junk}", "en"),
        (6, "", "en"),
    ]


def test_dsir_matches_oracle(spark):
    rows = _dsir_corpus()
    got = _collect(SEL.dsir_select(_mk_docs(spark, rows), "doc_id", k=9))
    want = _duck(rows, SEL.dsir_select_sql("doc_id", k=9))
    assert got == want
    assert len(got) == 9  # k >= corpus -> every doc emitted
    # target-vocabulary docs outweigh OOV docs in raw LLR bits
    by_id = {r[0]: r for r in got}
    assert by_id[1][2] > by_id[3][2]
    assert by_id[2][2] > by_id[4][2]
    # the empty doc scores exactly 0 (no features)
    assert by_id[6][1] == 0 and by_id[6][2] == 0


def test_dsir_topk_is_deterministic_prefix(spark):
    """top-k output == the k highest (dsir_key, -id) rows of the full
    scoring — the resample is a deterministic prefix, rerun-identical."""
    rows = _dsir_corpus()
    df_all = SEL.dsir_select(_mk_docs(spark, rows), "doc_id", k=9)
    df_top = SEL.dsir_select(_mk_docs(spark, rows), "doc_id", k=3)
    full = sorted(df_all.collect(), key=lambda r: (-r[3], r[0]))
    top = sorted(df_top.collect(), key=lambda r: (-r[3], r[0]))
    assert [tuple(r) for r in top] == [tuple(r) for r in full[:3]]


def test_dsir_kernel_bit_identical(spark):
    """kernel == SQL form == DuckDB on the mixed corpus (incl. the empty
    doc and single-token docs where the bigram lane masks out)."""
    rows = _dsir_corpus() + [(7, "solo", "en"), (8, "a b", "en")]
    df = _mk_docs(spark, rows)
    got_k = _collect(SEL.dsir_select_kernel(df, "doc_id", k=11))
    got_sql = _collect(SEL.dsir_select(df, "doc_id", k=11))
    want = _duck(rows, SEL.dsir_select_sql("doc_id", k=11))
    assert got_k == got_sql == want


def test_dsir_empty_target_slice(spark):
    """No id % 23 == 0 docs: the target model is pure smoothing — the
    lane still runs and both compilers agree."""
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2} alpha beta", "en") for i in (1, 2, 3, 24)]
    got = _collect(SEL.dsir_select(_mk_docs(spark, rows), "doc_id", k=4))
    want = _duck(rows, SEL.dsir_select_sql("doc_id", k=4))
    assert got == want and len(got) == 4


# ---------------------------------------------------------------------------
# UniMax
# ---------------------------------------------------------------------------


def _lang_rows(counts: dict[str, int]):
    return [
        (i, " ".join(["w"] * n), lang)
        for i, (lang, n) in enumerate(sorted(counts.items()))
    ]


def test_unimax_matches_oracle(spark):
    rows = _lang_rows({"en": 120, "de": 30, "fr": 25, "zh": 10})
    got = _collect(SEL.unimax_alloc(_mk_docs(spark, rows), "doc_id"))
    want = _duck(rows, SEL.unimax_alloc_sql("doc_id"))
    assert got == want
    by_lang = {r[0]: r for r in got}
    # defaults (budget 800 permille, 1 epoch): low-resource langs cap at
    # a full epoch, the head language takes the uncapped share
    assert by_lang["zh"][4] == 1 and by_lang["zh"][3] == by_lang["zh"][2]
    assert by_lang["en"][4] == 0 and by_lang["en"][3] < by_lang["en"][2]


def _py_waterfill(caps: list[int], budget: int) -> list[int]:
    """Independent reference: largest integer theta with
    sum(min(cap, theta)) <= budget, allocation = min(cap, theta) except
    that caps below theta are granted in full."""
    lo, hi = 0, max(caps) if caps else 0
    while lo < hi:  # binary-search theta
        mid = (lo + hi + 1) // 2
        if sum(min(c, mid) for c in caps) <= budget:
            lo = mid
        else:
            hi = mid - 1
    theta = lo
    if sum(caps) <= budget:
        return caps[:]
    return [min(c, theta) for c in caps]


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["en", "de", "fr", "es", "zh", "ru", "ja", "ko"]),
        st.integers(min_value=0, max_value=400),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=1500),
    st.integers(min_value=1, max_value=3),
)
def test_unimax_waterfill_laws(counts, budget_permille, epochs):
    """DuckDB form (same arithmetic as the Spark form, by the parity test
    above) obeys the waterfill laws against an independent binary-search
    reference on arbitrary language inventories."""
    rows = _lang_rows(counts)
    out = _duck(
        rows,
        SEL.unimax_alloc_sql(
            "doc_id", budget_permille=budget_permille, epochs=epochs
        ),
    )
    total = sum(n for n in counts.values())
    budget = total * budget_permille // 1000
    by_lang = {r[0]: r for r in out}
    assert set(by_lang) == set(counts)
    caps = {l: epochs * n for l, n in counts.items()}
    allocs = {l: by_lang[l][3] for l in counts}
    # (a) never exceed the per-language cap, (b) never exceed the budget
    assert all(allocs[l] <= caps[l] for l in counts)
    assert sum(allocs.values()) <= budget
    # (c) capped rows get their full cap; uncapped rows share one theta
    thetas = {allocs[l] for l in counts if by_lang[l][4] == 0}
    assert all(allocs[l] == caps[l] for l in counts if by_lang[l][4] == 1)
    assert len(thetas) <= 1
    # (d) allocation monotone in cap (fairness)
    ordered = sorted(counts, key=lambda l: (caps[l], l))
    assert all(
        allocs[a] <= allocs[b] for a, b in zip(ordered, ordered[1:])
    )
    # (e) matches the independent reference exactly
    ref = _py_waterfill([caps[l] for l in ordered], budget)
    assert [allocs[l] for l in ordered] == ref


def test_unimax_all_capped_consumes_caps(spark):
    """Budget above the cap sum: every language gets exactly its cap."""
    rows = _lang_rows({"en": 50, "de": 20})
    got = _collect(
        SEL.unimax_alloc(_mk_docs(spark, rows), "doc_id", budget_permille=3000, epochs=2)
    )
    want = _duck(rows, SEL.unimax_alloc_sql("doc_id", budget_permille=3000, epochs=2))
    assert got == want
    assert all(r[3] == r[2] and r[4] == 1 for r in got)


def test_unimax_zero_token_language(spark):
    rows = _lang_rows({"en": 40, "xx": 0})
    got = _collect(SEL.unimax_alloc(_mk_docs(spark, rows), "doc_id"))
    want = _duck(rows, SEL.unimax_alloc_sql("doc_id"))
    assert got == want
    by_lang = {r[0]: r for r in got}
    assert by_lang["xx"][3] == 0 and by_lang["xx"][5] == 0


# ---------------------------------------------------------------------------
# leakage-safe split
# ---------------------------------------------------------------------------


def test_cluster_split_no_leakage(spark):
    """Every member of a cluster lands on the same side; the split is a
    pure function of cluster_id (partitioning/run invariant) and both
    compilers compute the identical hash."""
    members = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "doc_id long, cluster_id long"
    )
    out = SEL.cluster_split(members, "doc_id").collect()
    sides = {}
    for r in out:
        sides.setdefault(r.cluster_id, set()).add(r.is_test)
    assert all(len(s) == 1 for s in sides.values())
    con = duckdb.connect()
    want = {
        c: t
        for c, t in con.execute(
            f"SELECT c, CAST({SEL.split_term('c')} < {SEL.SPLIT_TEST_PERMILLE} AS INT) "
            "FROM (SELECT unnest(range(7)) AS c)"
        ).fetchall()
    }
    assert {c: s.pop() for c, s in sides.items()} == want


def test_cluster_split_rate_approaches_permille(spark):
    """Over many clusters the test fraction approaches the requested
    permille (the LCG is equidistributed mod 1000)."""
    members = spark.createDataFrame(
        [(i, i) for i in range(5000)], "doc_id long, cluster_id long"
    )
    out = SEL.cluster_split(members, "doc_id", test_permille=250).collect()
    frac = sum(r.is_test for r in out) / len(out)
    assert 0.22 < frac < 0.28


# ---------------------------------------------------------------------------
# verdict CASE
# ---------------------------------------------------------------------------


def test_verdict_case_priority(spark):
    """First-failing-reason priority over every single-gate failure plus
    the all-pass row, identical in both compilers."""
    cols = "is_exact_dup int, neardup_keep int, contaminated int, c4_keep int, repetition_pass int"
    rows = [
        (1, 0, 1, 0, 0),  # everything fails -> exact_dup wins
        (0, 0, 1, 0, 0),  # near_dup outranks contamination
        (0, 1, 1, 0, 0),  # contaminated outranks quality
        (0, 1, 0, 0, 0),  # quality_c4 outranks repetition
        (0, 1, 0, 1, 0),  # repetition
        (0, 1, 0, 1, 1),  # kept
    ]
    want = ["exact_dup", "near_dup", "contaminated", "quality_c4", "repetition", "kept"]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, cols)
    got = [
        r[0]
        for r in df.select(F.expr(SEL.verdict_case_sql()).alias("v")).collect()
    ]
    assert sorted(got) == sorted(want)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE flags (is_exact_dup INT, neardup_keep INT, "
        "contaminated INT, c4_keep INT, repetition_pass INT)"
    )
    con.executemany("INSERT INTO flags VALUES (?, ?, ?, ?, ?)", rows)
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {SEL.verdict_case_sql()} FROM flags"
        ).fetchall()
    ]
    assert sorted(duck) == sorted(want)


def test_dsir_constants_int64_safe():
    from imdedup_plus_spark.config import HASH_MOD, PERM_P

    assert SEL.DSIR_A * (HASH_MOD - 1) + SEL.DSIR_B < 2**63
    # worst-case noise product inside the LCG term
    assert (PERM_P - 1) * SEL.SAMPLE_MULT + SEL.SAMPLE_INC < 2**63

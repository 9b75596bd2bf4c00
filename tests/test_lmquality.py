"""lmquality.py — CCNet-style LM perplexity bucketing: Column/SQL/kernel
parity, tertile-cutoff law, empty-seed and token-free edges, exact
floor(log2) at magnitudes no corpus reaches."""

from __future__ import annotations

import duckdb
import numpy as np

from imdedup_plus_spark import lmquality as LQ


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus():
    """Seed docs (id % 17 == 0): ids 0 and 17 share the 'seed' vocab.
    Doc 1 repeats seed vocabulary (fluent -> low bits), doc 2 mixes,
    doc 3 is fully out-of-vocabulary (tail), doc 4 is empty (excluded),
    doc 5 is whitespace-only (token-free, excluded)."""
    seed = "alpha beta gamma delta epsilon zeta eta theta"
    return [
        (0, f"{seed} {seed}", "en"),
        (17, f"{seed} iota kappa", "en"),
        (1, f"{seed}", "en"),
        (2, "alpha beta nova1 nova2", "en"),
        (3, "xerg1 xerg2 xerg3 xerg4 xerg5", "en"),
        (4, "", "en"),
        (5, "   ", "en"),
    ]


def test_lm_quality_matches_oracle(spark):
    rows = _corpus()
    got = _collect(LQ.lm_quality(_mk_docs(spark, rows), "doc_id"))
    want = _duck(rows, LQ.lm_quality_sql("doc_id"))
    assert got == want
    by_id = {r[0]: r for r in got}
    # token-free docs excluded
    assert 4 not in by_id and 5 not in by_id
    # in-vocab doc scores strictly fewer milli-bits than the OOV doc
    assert by_id[1][2] < by_id[3][2]
    # bucket is monotone in score across the whole output
    ordered = sorted(got, key=lambda r: r[2])
    buckets = [r[3] for r in ordered]
    assert buckets == sorted(buckets)
    assert set(buckets) <= {0, 1, 2}
    # head bucket holds the fluent doc, tail holds the OOV doc
    assert by_id[1][3] == 0 and by_id[3][3] == 2


def test_lm_kernel_bit_identical(spark):
    rows = _corpus()
    docs = _mk_docs(spark, rows)
    assert _collect(LQ.lm_quality(docs, "doc_id")) == _collect(
        LQ.lm_quality_kernel(docs, "doc_id")
    )


def test_lm_quality_no_seed_docs(spark):
    """No id divisible by LM_SEED_MOD: the model is all-zeros (t_total=0)
    and every token costs the same uniform bits — all three forms agree
    and every doc lands in bucket 0 (equal scores => c1 covers all)."""
    rows = [(1, "foo bar baz", "en"), (2, "qux quux corge grault", "en")]
    docs = _mk_docs(spark, rows)
    got = _collect(LQ.lm_quality(docs, "doc_id"))
    assert got == _duck(rows, LQ.lm_quality_sql("doc_id"))
    assert got == _collect(LQ.lm_quality_kernel(docs, "doc_id"))
    scores = {r[2] for r in got}
    assert len(scores) == 1 and all(r[3] == 0 for r in got)


def test_floor_log2_exact_all_magnitudes():
    """_floor_log2_int64 == bit_length - 1 for every int64 magnitude,
    including the float53 danger zone the >=2**36 pre-shift exists for."""
    qs = [1, 2, 3, 1023, 1024, (1 << 36) - 1, 1 << 36, (1 << 36) + 1,
          (1 << 53) - 1, 1 << 53, (1 << 53) + 1, (1 << 62) - 1,
          1 << 62, (1 << 63) - 1]
    got = LQ._floor_log2_int64(np.asarray(qs, dtype=np.int64))
    want = [q.bit_length() - 1 for q in qs]
    assert got.tolist() == want
    # dense sweep around every power of two up to 2**62
    for e in range(1, 63):
        around = np.asarray(
            [(1 << e) - 1, 1 << e, (1 << e) + 1], dtype=np.int64
        )
        assert LQ._floor_log2_int64(around).tolist() == [e - 1, e, e]


def test_lm_constants_int64_safe():
    from imdedup_plus_spark.config import HASH_MOD

    assert LQ.LM_A * (HASH_MOD - 1) + LQ.LM_B < 2**63

"""URL canonicalization + recrawl collapse: Spark/DuckDB parity on the
shared rule table, collapse semantics, determinism."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from imdedup_plus_spark import weburl as W

# messy -> expected canonical form (hand-derived from the rule table)
CASES = [
    ("https://Site01.Example/Page/7", "site01.example/page/7"),
    ("http://www.site01.example/page/7/", "site01.example/page/7"),
    ("https://site01.example:443/page/7", "site01.example/page/7"),
    ("http://site01.example:80/page/7#frag", "site01.example/page/7"),
    ("https://site01.example/page/7?utm_source=feed", "site01.example/page/7"),
    (
        "https://site01.example/page/7?utm_a=1&utm_b=2&c=3",
        "site01.example/page/7?c=3",
    ),
    (
        "https://site01.example/page/7?a=1&utm_x=2&b=3",
        "site01.example/page/7?a=1&b=3",
    ),
    ("https://site01.example/p?utm_a=1&utm_b=2", "site01.example/p"),
    # 'ref' must not match inside 'pref' (delimiter-consuming patterns)
    ("https://s.example/p?pref=1", "s.example/p?pref=1"),
    ("https://s.example/p?a=1&pref=2&ref=3", "s.example/p?a=1&pref=2"),
    ("https://s.example/p?ref=x&a=1", "s.example/p?a=1"),
    ("https://s.example/p?fbclid=abc#x", "s.example/p"),
    ("https://s.example///", "s.example"),
    ("https://s.example:8080/p", "s.example:8080/p"),  # non-default kept
]


def test_canonicalize_parity_spark_duckdb(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(W.canonicalize_url("url").alias("c"))
        .orderBy("url")  # deterministic row order isn't guaranteed otherwise
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in CASES])
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {W.canonicalize_sql('url')} FROM t ORDER BY url"
        ).fetchall()
    ]
    want = [c for _, c in sorted(CASES)]
    assert got == want
    assert duck == want


def test_canonicalize_expected_forms(spark):
    df = spark.createDataFrame(CASES, "url string, want string")
    bad = df.where(W.canonicalize_url("url") != F.col("want")).collect()
    assert bad == []


def test_canonicalize_parity_property(spark):
    """Property: the two compilers of the rule table agree on arbitrary
    ASCII URL soup — one batched Spark/DuckDB comparison over a
    hypothesis-grown corpus of delimiter-heavy strings (the regex chain
    must behave identically in Java regex and RE2 on every input, not
    just well-formed URLs)."""
    from hypothesis import given, settings, strategies as st

    frag = st.sampled_from(
        ["http://", "https://", "www.", ":80", ":443", ":8080", "/", "//",
         "?", "&", "#", "=", "utm_source", "utm_", "ref", "pref", "fbclid",
         "gclid", "a", "B", "x1", ".example", "page", "%20", "~", "_"]
    )
    url = st.lists(frag, min_size=0, max_size=12).map("".join)

    corpus: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(url)
    def grow(u):
        corpus.append(u)

    grow()
    uniq = sorted(set(corpus))
    df = spark.createDataFrame([(u,) for u in uniq], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", W.canonicalize_url("url").alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in uniq])
    duck = dict(
        con.execute(f"SELECT url, {W.canonicalize_sql('url')} FROM t").fetchall()
    )
    assert got == duck


def test_latest_revision_collapse(spark):
    rows = [
        # three recrawls of one page under cosmetic variations
        ("https://a.example/p/1?utm_source=x", 100, "v1"),
        ("http://www.a.example/p/1/", 300, "v3"),
        ("https://a.example/p/1", 200, "v2"),
        # a singleton
        ("https://b.example/q", 50, "only"),
        # a timestamp tie -> url-ascending breaks it deterministically
        ("https://c.example/r?a=1", 70, "tie_a"),
        ("https://c.example/r?a=1#frag", 70, "tie_b"),
    ]
    docs = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    out = W.latest_revision(
        docs, keep_cols=["url", "warc_ts", "text"]
    ).orderBy("canonical_url")
    got = [tuple(r) for r in out.collect()]
    assert got == [
        # newest warc_ts wins; revision span + count carried along
        ("a.example/p/1", 3, 100, 300, "http://www.a.example/p/1/", 300, "v3"),
        ("b.example/q", 1, 50, 50, "https://b.example/q", 50, "only"),
        # tie at 70: lexicographically smaller ORIGINAL url wins
        ("c.example/r?a=1", 2, 70, 70, "https://c.example/r?a=1", 70, "tie_a"),
    ]


def test_pipeline_recrawl_collapse(spark, fixture_corpus, tmp_path):
    """Pipeline pre-stage: a corpus polluted with stale decorated recrawls
    yields the SAME clusters as the clean corpus once collapse_recrawls
    is on — and the stage checkpoints/resumes like every other."""
    from imdedup_plus_spark.config import REFERENCE_CONFIG as CFG
    from imdedup_plus_spark.pipeline import CheckpointedPipeline

    docs = fixture_corpus.drop("base_id", "variant")
    stale = (
        docs.withColumn("url", F.concat("url", F.lit("?utm_source=feed")))
        .withColumn("warc_ts", F.expr("warc_ts - INTERVAL 1 HOUR"))
        .withColumn("text", F.lit("stale placeholder while crawling"))
    )
    messy = docs.unionByName(stale)

    base = CheckpointedPipeline(
        spark, str(tmp_path / "clean"), CFG, id_col="url"
    ).run(docs)
    want = sorted((r.url, r.cluster_id) for r in base["clusters"].collect())

    p = CheckpointedPipeline(
        spark, str(tmp_path / "messy"), CFG, id_col="url",
        collapse_recrawls=True,
    )
    got_res = p.run(messy)
    got = sorted((r.url, r.cluster_id) for r in got_res["clusters"].collect())
    assert got == want
    assert any(l["stage"] == "recrawls" for l in p.lineage())
    # resume: the recrawls stage is a no-op read on re-run
    t1 = {l["stage"]: l["completed_at_epoch"] for l in p.lineage()}
    p2 = CheckpointedPipeline(
        spark, str(tmp_path / "messy"), CFG, id_col="url",
        collapse_recrawls=True,
    )
    p2.run(messy)
    t2 = {l["stage"]: l["completed_at_epoch"] for l in p2.lineage()}
    assert t1 == t2

    # without url/warc_ts the flag fails loudly
    with pytest.raises(ValueError, match="url"):
        CheckpointedPipeline(
            spark, str(tmp_path / "bad"), CFG, id_col="doc_id",
            collapse_recrawls=True,
        ).run(docs.drop("url").withColumn("doc_id", F.xxhash64("text")))


def test_latest_revision_partitioning_invariant(spark):
    """Result is identical under different input partitionings (the
    window's explicit ordering, not arrival order, decides winners)."""
    rows = [
        (f"https://s{i % 5}.example/p/{i % 7}?utm_c={i}", i, f"t{i}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    a = W.latest_revision(docs.repartition(1), keep_cols=["text"])
    b = W.latest_revision(docs.repartition(16, "text"), keep_cols=["text"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # 5*7 = 35 canonical pages, each crawled ~6x
    assert a.count() == 35


# url -> expected host token (through the canonical form)
DOMAIN_CASES = [
    ("https://Site01.Example/Page/7", "site01.example"),
    ("http://www.site01.example/page/7/", "site01.example"),
    ("https://site01.example:443/page/7", "site01.example"),
    ("https://s.example:8080/p", "s.example:8080"),  # non-default port kept
    ("https://s.example", "s.example"),              # no path at all
    ("https://s.example/?utm_a=1", "s.example"),
    ("http://www.s.example#frag", "s.example"),
]


def test_domain_parity_spark_duckdb(spark):
    df = spark.createDataFrame([(u,) for u, _ in DOMAIN_CASES], "url string")
    got = [
        r["d"] for r in df.select(W.domain_of("url").alias("d")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in DOMAIN_CASES])
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {W.domain_sql('url')} FROM t"
        ).fetchall()
    ]
    exp = [e for _, e in DOMAIN_CASES]
    assert got == exp
    assert duck == exp


# url -> expected registrable domain (public-suffix aware, port stripped)
REG_DOMAIN_CASES = [
    ("https://a.foo.co.uk/x", "foo.co.uk"),
    ("http://www.b.foo.co.uk/y/", "foo.co.uk"),       # same mirror bucket
    ("https://shop.example.com.au/p?utm_source=x", "example.com.au"),
    ("https://deep.sub.tree.example.co.jp/", "example.co.jp"),
    ("https://news.example.com/a", "example.com"),
    ("https://www.example.com", "example.com"),
    ("https://s.example?q=1", "s.example"),            # ADVICE: kept query, no path
    ("https://s.example:8080/p", "s.example"),         # port stripped here
    ("http://192.168.10.1:8080/admin", "192.168.10.1"),# IPv4 passthrough
    ("https://localhost/x", "localhost"),              # single label
    ("https://co.uk/", "co.uk"),                       # bare suffix: SLD fallback
]


def test_registrable_domain_parity_spark_duckdb(spark):
    """VERDICT r03 #7: PSL-subset registrable domains, identical in both
    compilers, co.uk/com.au/co.jp battery + IPv4/single-label edges."""
    df = spark.createDataFrame(
        [(u,) for u, _ in REG_DOMAIN_CASES], "url string"
    )
    got = [
        r["d"]
        for r in df.select(
            W.registrable_domain_of("url").alias("d")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t2 (url VARCHAR)")
    con.executemany(
        "INSERT INTO t2 VALUES (?)", [(u,) for u, _ in REG_DOMAIN_CASES]
    )
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {W.registrable_domain_sql('url')} FROM t2"
        ).fetchall()
    ]
    exp = [e for _, e in REG_DOMAIN_CASES]
    assert got == exp, list(zip(got, exp))
    assert duck == exp, list(zip(duck, exp))


def test_domain_of_query_no_path(spark):
    """ADVICE r03: 'https://s.example?q=1' must not fold '?q=1' into the
    host token (split on '?' as well as '/'), in BOTH compilers."""
    cases = [
        ("https://s.example?q=1", "s.example"),
        ("https://s.example:8080?q=1", "s.example:8080"),
        ("https://s.example/p?q=1", "s.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["d"] for r in df.select(W.domain_of("url").alias("d")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t3 (url VARCHAR)")
    con.executemany("INSERT INTO t3 VALUES (?)", [(u,) for u, _ in cases])
    duck = [
        r[0]
        for r in con.execute(f"SELECT {W.domain_sql('url')} FROM t3").fetchall()
    ]
    exp = [e for _, e in cases]
    assert got == exp and duck == exp

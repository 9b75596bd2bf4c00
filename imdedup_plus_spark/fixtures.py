"""Deterministic synthetic web-text corpus with planted duplicate structure.

Analog of the reference's test-data generator ``script/wm.py:124-211``: for
each base image it emits two watermarked variants (``wm.py:132``) with K
random 80x80 logos at non-overlapping positions (``wm.py:156-202``). Here:
for each base *page* we emit two near-dup variants with K planted 8-word
watermark phrases, plus an exact duplicate for 20% of bases, singleton
distractors, and per-site shared boilerplate (the hot-band stressor).

Everything derives from (seed, unit_id) so generation is distributed
(``spark.range -> mapInPandas``) yet independent of partitioning — the same
corpus at any parallelism. Schema matches BASELINE.json input_hint:
``url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING``.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 5000
N_PHRASES = 16
PHRASE_LEN = 8
K_EDITS = 4
EXACT_DUP_FRACTION = 0.2
SITE_SIZE = 50  # pages per site
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

DOC_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_GT_SCHEMA = DOC_SCHEMA + ", base_id long, variant int"


def _phrase(j: int) -> list[str]:
    return [f"wm{j}_{chr(ord('a') + i)}" for i in range(PHRASE_LEN)]


def _site_of(base_id: int, n_base: int) -> int:
    return base_id % max(1, n_base // SITE_SIZE + 1)


def _boiler(site: int) -> tuple[list[str], list[str]]:
    rng = random.Random(f"{SEED}:site:{site}")
    header = [f"hdr{site}_{rng.randrange(VOCAB_SIZE)}" for _ in range(12)]
    footer = [f"ftr{site}_{rng.randrange(VOCAB_SIZE)}" for _ in range(12)]
    return header, footer


def _base_body(base_id: int) -> list[str]:
    rng = random.Random(f"{SEED}:base:{base_id}")
    n_words = rng.randint(50, 400)
    # Zipf-ish: quadratic skew toward small word ids
    return [f"w{int(VOCAB_SIZE * rng.random() ** 2)}" for _ in range(n_words)]


def _variant_body(body: list[str], base_id: int, variant: int) -> list[str]:
    rng = random.Random(f"{SEED}:var:{base_id}:{variant}")
    out = list(body)
    offs = sorted(rng.sample(range(len(body) + 1), min(K_EDITS, len(body) + 1)), reverse=True)
    for off in offs:
        out[off:off] = _phrase(rng.randrange(N_PHRASES))
    return out


def _lang_of(base_id: int) -> str:
    rng = random.Random(f"{SEED}:lang:{base_id}")
    return "en" if rng.random() < 0.95 else ("de" if base_id % 2 == 0 else "fr")


def _mk_html(site: int, text: str) -> bytes:
    return (
        f"<html><head><title>site{site:04d}</title></head>"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """The text-extraction invariant: ``extract_text(html) == text`` per row
    (BASELINE.json input_hint; analog of the reference's lossless decode)."""
    s = html.decode("utf-8")
    return s.split("<p>", 1)[1].split("</p>", 1)[0]


def _rows_for_unit(unit: int, n_base: int) -> list[tuple]:
    """All document rows for one generation unit (base page or distractor)."""
    rows = []
    if unit < n_base:
        base_id = unit
        site = _site_of(base_id, n_base)
        header, footer = _boiler(site)
        body = _base_body(base_id)
        lang = _lang_of(base_id)
        has_exact = random.Random(f"{SEED}:exact:{base_id}").random() < EXACT_DUP_FRACTION
        variants = [0, 1, 2] + ([3] if has_exact else [])
        for v in variants:
            words = body if v in (0, 3) else _variant_body(body, base_id, v)
            text = " ".join(header + words + footer)
            p = base_id * 4 + v
            url = f"https://site{site:04d}.example/page/{p:06d}"
            ts = EPOCH + timedelta(seconds=37 * p)
            rows.append((url, ts, _mk_html(site, text), text, lang, base_id, v))
    else:
        d = unit - n_base
        site = _site_of(unit, n_base)
        header, footer = _boiler(site)
        rng = random.Random(f"{SEED}:distract:{d}")
        words = [f"d{d}_w{rng.randrange(VOCAB_SIZE)}" for _ in range(rng.randint(50, 200))]
        text = " ".join(header + words + footer)
        p = n_base * 4 + d
        url = f"https://site{site:04d}.example/page/{p:06d}"
        ts = EPOCH + timedelta(seconds=37 * p)
        rows.append((url, ts, _mk_html(site, text), text, _lang_of(unit), -1, 0))
    return rows


def generate_documents(
    spark: SparkSession, n_base: int, with_ground_truth: bool = False
) -> DataFrame:
    """Distributed deterministic corpus: ``n_base`` variant groups +
    ``n_base // 2`` singleton distractors."""
    n_units = n_base + n_base // 2

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang", "base_id", "variant"]
        for pdf in batches:
            rows = []
            for unit in pdf["id"].values:
                rows.extend(_rows_for_unit(int(unit), n_base))
            yield pd.DataFrame(rows, columns=cols)

    df = spark.range(n_units).mapInPandas(fn, schema=_GT_SCHEMA)
    return df if with_ground_truth else df.drop("base_id", "variant")


def expected_dup_pairs(docs_gt: DataFrame) -> DataFrame:
    """Ground truth: every unordered url pair sharing a base page
    (FIXTURES.md table 2)."""
    d = docs_gt.where(F.col("base_id") >= 0).select("url", "base_id", "variant")
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, "base_id")
        .where(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.when(
                (F.col("a.variant").isin(0, 3)) & (F.col("b.variant").isin(0, 3)),
                F.lit("exact"),
            ).otherwise(F.lit("near")).alias("kind"),
        )
    )


def expected_clusters(docs_gt: DataFrame) -> DataFrame:
    """Ground truth cluster id = min(url) over the variant group;
    singletons own url (FIXTURES.md table 3)."""
    grouped = docs_gt.where(F.col("base_id") >= 0)
    reps = grouped.groupBy("base_id").agg(F.min("url").alias("cluster_id"))
    g = grouped.join(reps, "base_id").select("url", "cluster_id")
    singles = docs_gt.where(F.col("base_id") < 0).select(
        "url", F.col("url").alias("cluster_id")
    )
    return g.union(singles)

"""Corpus-hygiene lanes: PII scrubbing and C4-style heuristic quality
gates.

A web-scale training pipeline runs these between extraction and dedup:

* **PII scrub** — redact emails / IPv4 addresses / international-format
  phone numbers (the three regex classes every public data card scrubs;
  cf. the BigCode/StarCoder PII pipeline and the C4 "clean" variant)
  and account for what was removed. Counting and redaction are pure
  regex column expressions — JVM-side in Spark, RE2-side in DuckDB —
  over patterns restricted to the common syntax subset of both engines
  (no backreferences, no lookaround, greedy classes whose leftmost-first
  and leftmost-longest matches coincide), so the two compilers stay
  bit-identical (parity-tested).
* **C4 heuristic gate** (Raffel et al. 2020, "Exploring the Limits of
  Transfer Learning...", appendix; public) — per-document keep/drop
  flags from cheap structural signals: word-count bounds, mean word
  length bounds, curly braces (code/templating leakage), "lorem ipsum"
  placeholder text, and "javascript" boilerplate warnings. Each flag is
  emitted separately so downstream can re-weight rather than hard-drop.

Two-compilers discipline (``signatures.py``): integer/ordered arithmetic
identical in both engines — counts are BIGINTs, the mean word length is
a floor()-permille, the scrub result is pinned by the engine's rolling
fingerprint (``textfns.fingerprint`` arithmetic) rather than shipping
whole scrubbed texts through the compare.

Scale notes (100 TB): both lanes are narrow per-row projections over the
(id, text) scan — no shuffle, no join, no Python. Regex evaluation is
JVM-side (whole-stage codegen keeps the scan+project fused); the only
interpreted HOF is the word-length fold, bounded by tokens-per-doc. The
scrubbed text itself would be written back as a column in a real
pipeline (here the fingerprint stands in so query outputs stay scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import HASH_MOD, SHINGLE_MULT
from .oracle import tokens_sql, word_hashes_sql
from .signatures import tokens_expr, word_hashes_expr

#: portable regex subset (Java + RE2 identical match semantics for these)
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE = r"\+[0-9][0-9 ]{6,14}[0-9]"
#: redaction tokens — lowercase-letter-only so they flow through the
#: engine's whitespace tokenizer as ordinary words
PII_REPL = {"email": " xemailx ", "ipv4": " xipx ", "phone": " xphonex "}

#: C4 gate bounds (Raffel et al. 2020 use >= 5 sentences / 3+ words per
#: line; the corpus here is token-stream-shaped, so the public word-count
#: analog is used): keep docs with 50..100000 words and mean word length
#: in [3, 10] characters
C4_MIN_WORDS = 50
C4_MAX_WORDS = 100_000
C4_MIN_MEAN_LEN_PERMILLE = 3_000
C4_MAX_MEAN_LEN_PERMILLE = 10_000
#: substring triggers (lowercased match)
C4_LOREM = "lorem ipsum"
C4_JS = "javascript"


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def _sq(pat: str) -> str:
    """Escape a regex for embedding in a SPARK SQL string literal: Spark
    (unlike standard SQL / DuckDB) treats backslash as an escape inside
    '...', so every regex backslash must be doubled."""
    return pat.replace("\\", "\\\\")


def _scrub_stages_spark(text_col: str) -> tuple[str, str, str]:
    """The three progressive scrub stages, email -> ipv4 -> phone
    (emails may contain digit runs, so they must leave the stream
    first). Exposed per stage so the COUNTS can be taken on the text
    each replacement actually ran on (ADVICE r04: counting all three
    classes on the ORIGINAL text double-counts a digit run inside an
    email relative to the replacements performed)."""
    e = f"regexp_replace({text_col}, '{_sq(PII_EMAIL)}', '{PII_REPL['email']}')"
    i = f"regexp_replace({e}, '{_sq(PII_IPV4)}', '{PII_REPL['ipv4']}')"
    p = f"regexp_replace({i}, '{_sq(PII_PHONE)}', '{PII_REPL['phone']}')"
    return e, i, p


def _scrub_expr_spark(text_col: str) -> str:
    return _scrub_stages_spark(text_col)[2]


def _scrub_stages_duck(text_col: str) -> tuple[str, str, str]:
    e = f"regexp_replace({text_col}, '{PII_EMAIL}', '{PII_REPL['email']}', 'g')"
    i = f"regexp_replace({e}, '{PII_IPV4}', '{PII_REPL['ipv4']}', 'g')"
    p = f"regexp_replace({i}, '{PII_PHONE}', '{PII_REPL['phone']}', 'g')"
    return e, i, p


def _scrub_expr_duck(text_col: str) -> str:
    return _scrub_stages_duck(text_col)[2]


def _fp_lambda(whs: str) -> str:
    """Rolling fingerprint over a word-hash array (textfns.fingerprint
    arithmetic — Spark form)."""
    return f"aggregate({whs}, 0L, (a, h) -> (a * {SHINGLE_MULT} + h) % {HASH_MOD})"


def _fp_sql(whs: str) -> str:
    return (
        f"CASE WHEN len({whs}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE list_reduce({whs}, (a, h) -> (a * {SHINGLE_MULT} + h) % {HASH_MOD}) END"
    )


def pii_scrub(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_pii, scrub_fp): per-class
    redaction counts plus the rolling fingerprint of the scrubbed text
    (proves the replacement text, not just the counts, matches the
    oracle bit for bit).

    Each class is counted on the text its replacement actually ran on
    (emails on the original, IPv4 on the email-scrubbed text, phones on
    the email+IPv4-scrubbed text), so ``n_pii`` is the EXACT number of
    replaced spans in ``scrubbed_text`` — a digit run inside an email is
    not double-counted (ADVICE r04). Identical staging in the DuckDB
    twin."""
    e_stage, i_stage, _ = _scrub_stages_spark(text_col)
    n_em = f"CAST(size(regexp_extract_all({text_col}, '{_sq(PII_EMAIL)}', 0)) AS BIGINT)"
    n_ip = f"CAST(size(regexp_extract_all({e_stage}, '{_sq(PII_IPV4)}', 0)) AS BIGINT)"
    n_ph = f"CAST(size(regexp_extract_all({i_stage}, '{_sq(PII_PHONE)}', 0)) AS BIGINT)"
    scrub = _scrub_expr_spark(text_col)
    fp = _fp_lambda(word_hashes_expr(tokens_expr(f"({scrub})")))
    return docs.select(
        F.col(id_col),
        F.expr(n_em).alias("n_emails"),
        F.expr(n_ip).alias("n_ipv4"),
        F.expr(n_ph).alias("n_phones"),
        F.expr(f"{n_em} + {n_ip} + {n_ph}").alias("n_pii"),
        F.expr(fp).alias("scrub_fp"),
    )


def pii_scrub_text(
    docs: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Materialization form of :func:`pii_scrub`: ``(id_col,
    scrubbed_text, n_pii)`` — the same replacement chain whose output
    the driver row pins by fingerprint, emitted as the text itself (the
    column a downstream pipeline stores). Kept separate from
    ``pii_scrub`` so the oracle-checked observability row stays narrow.
    ``n_pii`` uses the same stage-by-stage counting as ``pii_scrub`` —
    it equals the number of replaced spans in ``scrubbed_text``."""
    e_stage, i_stage, _ = _scrub_stages_spark(text_col)
    n_em = f"CAST(size(regexp_extract_all({text_col}, '{_sq(PII_EMAIL)}', 0)) AS BIGINT)"
    n_ip = f"CAST(size(regexp_extract_all({e_stage}, '{_sq(PII_IPV4)}', 0)) AS BIGINT)"
    n_ph = f"CAST(size(regexp_extract_all({i_stage}, '{_sq(PII_PHONE)}', 0)) AS BIGINT)"
    return docs.select(
        F.col(id_col),
        F.expr(_scrub_expr_spark(text_col)).alias("scrubbed_text"),
        F.expr(f"{n_em} + {n_ip} + {n_ph}").alias("n_pii"),
    )


def pii_scrub_sql(id_col: str, table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of ``pii_scrub`` (RE2 'g' flag = Java replace-all;
    same stage-by-stage counting)."""
    e_stage, i_stage, _ = _scrub_stages_duck(text_col)
    n_em = f"CAST(len(regexp_extract_all({text_col}, '{PII_EMAIL}')) AS BIGINT)"
    n_ip = f"CAST(len(regexp_extract_all({e_stage}, '{PII_IPV4}')) AS BIGINT)"
    n_ph = f"CAST(len(regexp_extract_all({i_stage}, '{PII_PHONE}')) AS BIGINT)"
    scrub = _scrub_expr_duck(text_col)
    fp = _fp_sql(word_hashes_sql(tokens_sql(f"({scrub})")))
    return f"""
SELECT {id_col},
       {n_em} AS n_emails,
       {n_ip} AS n_ipv4,
       {n_ph} AS n_phones,
       {n_em} + {n_ip} + {n_ph} AS n_pii,
       {fp} AS scrub_fp
FROM {table}"""


# ---------------------------------------------------------------------------
# C4 heuristic quality gate
# ---------------------------------------------------------------------------


def c4_filters(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len_permille, flag_word_count,
    flag_word_len, flag_curly, flag_lorem, flag_js, keep): every C4-style
    gate as its own 0/1 column, ``keep`` = all gates pass."""
    toks = tokens_expr(text_col)
    nw = f"CAST(size({toks}) AS BIGINT)"
    nc = f"aggregate({toks}, 0L, (a, t) -> a + length(t))"
    mwl = f"CASE WHEN {nw} = 0 THEN 0L ELSE CAST(floor((1000 * ({nc})) / {nw}) AS BIGINT) END"
    low = f"lower({text_col})"
    return (
        docs.select(
            F.col(id_col),
            F.expr(nw).alias("n_words"),
            F.expr(mwl).alias("mean_word_len_permille"),
            F.expr(f"CAST(instr({low}, '{{') > 0 OR instr({low}, '}}') > 0 AS INT)").alias("flag_curly"),
            F.expr(f"CAST(instr({low}, '{C4_LOREM}') > 0 AS INT)").alias("flag_lorem"),
            F.expr(f"CAST(instr({low}, '{C4_JS}') > 0 AS INT)").alias("flag_js"),
        )
        .withColumn(
            "flag_word_count",
            F.expr(
                f"CAST(n_words < {C4_MIN_WORDS} OR n_words > {C4_MAX_WORDS} AS INT)"
            ),
        )
        .withColumn(
            "flag_word_len",
            F.expr(
                f"CAST(mean_word_len_permille < {C4_MIN_MEAN_LEN_PERMILLE} "
                f"OR mean_word_len_permille > {C4_MAX_MEAN_LEN_PERMILLE} AS INT)"
            ),
        )
        .withColumn(
            "keep",
            F.expr(
                "CAST(flag_word_count = 0 AND flag_word_len = 0 AND "
                "flag_curly = 0 AND flag_lorem = 0 AND flag_js = 0 AS INT)"
            ),
        )
        .select(
            id_col, "n_words", "mean_word_len_permille", "flag_word_count",
            "flag_word_len", "flag_curly", "flag_lorem", "flag_js", "keep",
        )
    )


def c4_filters_sql(id_col: str, table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of ``c4_filters`` (same floor-permille arithmetic)."""
    toks = tokens_sql(text_col)
    nw = f"CAST(len({toks}) AS BIGINT)"
    nc = (
        f"coalesce(list_aggregate(list_transform({toks}, t -> len(t)), 'sum'), 0)"
    )
    mwl = (
        f"CASE WHEN {nw} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(floor((1000 * ({nc})) / {nw}) AS BIGINT) END"
    )
    low = f"lower({text_col})"
    return f"""
WITH base AS (
  SELECT {id_col},
         {nw} AS n_words,
         {mwl} AS mean_word_len_permille,
         CAST(strpos({low}, '{{') > 0 OR strpos({low}, '}}') > 0 AS INT) AS flag_curly,
         CAST(strpos({low}, '{C4_LOREM}') > 0 AS INT) AS flag_lorem,
         CAST(strpos({low}, '{C4_JS}') > 0 AS INT) AS flag_js
  FROM {table}
)
SELECT {id_col}, n_words, mean_word_len_permille,
       CAST(n_words < {C4_MIN_WORDS} OR n_words > {C4_MAX_WORDS} AS INT) AS flag_word_count,
       CAST(mean_word_len_permille < {C4_MIN_MEAN_LEN_PERMILLE}
            OR mean_word_len_permille > {C4_MAX_MEAN_LEN_PERMILLE} AS INT) AS flag_word_len,
       flag_curly, flag_lorem, flag_js,
       CAST((n_words >= {C4_MIN_WORDS} AND n_words <= {C4_MAX_WORDS})
            AND (mean_word_len_permille >= {C4_MIN_MEAN_LEN_PERMILLE}
                 AND mean_word_len_permille <= {C4_MAX_MEAN_LEN_PERMILLE})
            AND flag_curly = 0 AND flag_lorem = 0 AND flag_js = 0 AS INT) AS keep
FROM base"""


# ---------------------------------------------------------------------------
# deterministic synthetic-PII embedding (driver fixture)
# ---------------------------------------------------------------------------


def synth_pii_expr_spark(id_col: str, text_col: str = "text") -> str:
    """The driver corpus is PII-free word salad, so the official oracle
    row would be vacuously all-zero. This expression deterministically
    embeds one email, one IPv4 and one phone number derived from the
    doc id into every document — IDENTICAL arithmetic in both engines —
    so the driver compare exercises real match/redact behavior. The lane
    functions themselves take any (id, text) frame; this is fixture
    scaffolding only."""
    d = id_col
    return (
        f"concat(substr({text_col}, 1, 64), "
        f"' mail u', CAST({d} % 97 AS STRING), '@ex', CAST({d} % 7 AS STRING), '.org', "
        f"' ip 10.', CAST({d} % 256 AS STRING), '.0.', CAST({d} % 100 AS STRING), "
        f"' tel +1 555 01', CAST({d} % 10 AS STRING), CAST({d} % 9 AS STRING), ' ', "
        f"substr({text_col}, 65, 100000))"
    )


def synth_pii_expr_duck(id_col: str, text_col: str = "text") -> str:
    d = id_col
    return (
        f"concat(substr({text_col}, 1, 64), "
        f"' mail u', CAST({d} % 97 AS VARCHAR), '@ex', CAST({d} % 7 AS VARCHAR), '.org', "
        f"' ip 10.', CAST({d} % 256 AS VARCHAR), '.0.', CAST({d} % 100 AS VARCHAR), "
        f"' tel +1 555 01', CAST({d} % 10 AS VARCHAR), CAST({d} % 9 AS VARCHAR), ' ', "
        f"substr({text_col}, 65, 100000))"
    )

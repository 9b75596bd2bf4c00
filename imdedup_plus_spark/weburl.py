"""URL canonicalization + recrawl collapse — the Common-Crawl pre-pass.

A web corpus carries the same page many times: the crawler re-fetches a
URL across snapshots (``warc_ts`` revisions), and the "same" URL appears
under cosmetic variations (scheme, ``www.``, default port, tracking query
params, trailing slash, fragment). Collapsing those BEFORE near-dup
detection is the cheapest dedup stage there is — a pure-JVM expression
chain plus one window function — and at 10^12 documents it removes the
bulk of exact recrawl volume before a single shingle is hashed. The
reference has no URL notion (its corpus is files); this lane is part of
the web-pipeline surface the engine adds on top (README §beyond-reference),
same spirit as the reference's FIX_OPTI exact pre-pass
(``/root/reference/idedup.c``: cheap exact check before expensive delta).

Design for identical Spark/DuckDB semantics: the canonicalization is a
single ordered rule table (``_CANON_RULES``) of ``(regex, replacement)``
pairs applied with replace-all semantics; ``canonicalize_url`` folds it
into a Spark Column (``F.regexp_replace`` replaces all matches) and
``canonicalize_sql`` folds the SAME table into a DuckDB expression
(``regexp_replace(..., 'g')``). One source of truth, two compilers — the
same discipline as ``oracle.py``. Patterns stay inside the common
Java-regex/RE2 subset: no backreferences, no lookaround, no capture-group
substitution (divergent syntax: Java ``$1`` vs RE2 ``\\1``).

Scale shape: canonicalization is a narrow per-row projection (no shuffle,
whole-stage codegen). The revision collapse is one hash-partitioned
window over ``canonical_url`` — the natural key is near-uniform (one
group per page), so no salting is needed; a pathological single-URL
hot key would surface in the group-size metrics and is bounded by
crawler politeness in practice. Everything downstream (signatures,
LSH, clustering) sees one row per canonical URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Ordered (pattern, replacement) rules; replace-ALL semantics in both
#: engines. Applied after lowercasing the whole URL (aggressive canonical
#: form — standard in web dedup, where case-variant paths are noise).
_CANON_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),                       # drop fragment
    (r"^https?://", ""),                 # drop scheme
    (r"^www\.", ""),                     # drop www.
    (r":80/", "/"),                      # default ports, mid-URL ...
    (r":443/", "/"),
    (r":80$", ""),                       # ... and trailing
    (r":443$", ""),
    # tracking params. Each pattern CONSUMES its own delimiter (so 'ref'
    # cannot match inside 'pref'), and the order makes one replace-all
    # pass per rule sufficient: rule 1 strips every '&'-delimited
    # tracking param (adjacent runs fall to consecutive non-overlapping
    # matches), leaving at most one in first position for rules 2/3.
    (r"&(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&]*", ""),
    (r"\?(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&]*&", "?"),
    (r"\?(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&]*$", ""),
    (r"/+$", ""),                        # trailing slash(es)
    (r"\?$", ""),                        # now-empty query
]


def canonicalize_url(col: Column | str) -> Column:
    """Spark compiler for the rule table: lower() then the ordered
    replace-all chain. Pure JVM expressions — no Python in the row path."""
    out = F.lower(F.col(col) if isinstance(col, str) else col)
    for pat, rep in _CANON_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def canonicalize_sql(expr: str) -> str:
    """DuckDB compiler for the SAME rule table ('g' = replace all)."""
    out = f"lower({expr})"
    for pat, rep in _CANON_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def latest_revision(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse recrawls: one row per canonical URL, the newest
    ``ts_col`` wins; ties broken by ``url_col`` ascending (deterministic
    regardless of partitioning). Output: ``canonical_url``,
    ``n_revisions`` (how many rows collapsed), ``first_ts``/``last_ts``
    (revision span), plus the winner's ``keep_cols``.

    One shuffle on ``canonical_url``; rank and the group aggregates share
    the same window frame, so Spark computes them in a single Window
    operator after that one exchange."""
    keep = keep_cols if keep_cols is not None else [url_col, ts_col]
    d = docs.withColumn("canonical_url", canonicalize_url(url_col))
    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts_col).desc(), F.col(url_col).asc())
    ranked = (
        d.withColumn("rn", F.row_number().over(wo))
        .withColumn("n_revisions", F.count(F.lit(1)).over(w))
        .withColumn("first_ts", F.min(ts_col).over(w))
        .withColumn("last_ts", F.max(ts_col).over(w))
    )
    return ranked.where(F.col("rn") == 1).select(
        "canonical_url", "n_revisions", "first_ts", "last_ts", *keep
    )


def domain_of(col: Column | str) -> Column:
    """Host extraction over the CANONICAL form: ``canonicalize_url``
    already stripped scheme/``www.``/default ports/fragments, so the
    host is the prefix before the first ``/`` (non-default ports remain
    part of the token — deliberate, they address distinct origins). An
    approximation of the registrable domain without a public-suffix
    list; the rule-table discipline applies (``domain_sql`` compiles the
    identical expression for DuckDB)."""
    return F.split_part(canonicalize_url(col), F.lit("/"), F.lit(1))


def domain_sql(expr: str) -> str:
    """DuckDB compiler for the SAME host extraction."""
    return f"split_part({canonicalize_sql(expr)}, '/', 1)"

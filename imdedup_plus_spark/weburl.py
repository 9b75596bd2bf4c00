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
    host is the prefix before the first ``/``, then before the first
    ``?`` (a RETAINED query string with no path — ``s.example?q=1`` —
    must not fold into the host; ADVICE r03). Non-default ports remain
    part of the token — deliberate, they address distinct origins. For
    the registrable domain (public-suffix aware) use
    ``registrable_domain_of``. The rule-table discipline applies
    (``domain_sql`` compiles the identical expression for DuckDB)."""
    c = canonicalize_url(col)
    return F.split_part(
        F.split_part(c, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1)
    )


def domain_sql(expr: str) -> str:
    """DuckDB compiler for the SAME host extraction."""
    return f"split_part(split_part({canonicalize_sql(expr)}, '/', 1), '?', 1)"


#: Multi-label public suffixes under which registrable domains sit one
#: label deeper (``foo.co.uk`` -> registrable ``foo.co.uk``, not
#: ``co.uk``). A deliberately small embedded subset of the well-known
#: two-label entries of the Public Suffix List (the full PSL is a
#: runtime data file on a real deployment; this table keeps mirror
#: detection from fragmenting across the most common ccTLD registries).
#: One tuple, two regex compilers — same discipline as _CANON_RULES.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    # UK / IE
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    # Japan / Korea
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr",
    # Brazil / Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "com.co", "com.pe", "com.ve", "com.ec", "com.uy",
    # China / HK / TW / SE Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.hk", "com.tw", "com.sg", "com.my", "com.ph", "com.vn",
    # India / South Asia
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "res.in", "gov.in",
    "com.pk", "com.bd",
    # Africa / Middle East
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.ng", "com.eg", "com.sa", "com.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    # Europe (multi-label registries)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    "com.ru", "net.ru", "org.ru",
    # Thailand / Indonesia
    "co.th", "ac.th", "go.th", "or.th", "in.th", "net.th",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
)

#: label (no dot, no port/query/path chars)
_LBL = "[^./:?]+"
#: regex: registrable domain under a multi-label public suffix
_PSL_RE = (
    f"({_LBL}\\.(?:" + "|".join(s.replace(".", "\\.") for s in PUBLIC_SUFFIXES) + "))$"
)
#: regex: plain second-level fallback (last two labels)
_SLD_RE = f"({_LBL}\\.{_LBL})$"


def registrable_domain_of(col: Column | str) -> Column:
    """Registrable domain (public-suffix aware) of the canonical URL:
    host token (ports stripped — a registrable domain is a NAME, unlike
    ``domain_of``'s origin token), then the last two labels, or the last
    THREE when the final two are a known multi-label public suffix
    (``PUBLIC_SUFFIXES``), so ``a.foo.co.uk`` and ``b.foo.co.uk`` both
    map to ``foo.co.uk`` instead of fragmenting mirror detection.
    Literal IPv4 hosts and single-label hosts pass through unchanged.
    Pure JVM regexp chain; ``registrable_domain_sql`` is the identical
    DuckDB compile (both engines' ``regexp_extract`` return '' on no
    match)."""
    c = canonicalize_url(col)
    host = F.split_part(
        F.split_part(
            F.split_part(c, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1)
        ),
        F.lit(":"),
        F.lit(1),
    )
    psl = F.regexp_extract(host, _PSL_RE, 1)
    sld = F.regexp_extract(host, _SLD_RE, 1)
    return (
        F.when(host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$"), host)
        .when(psl != "", psl)
        .when(sld != "", sld)
        .otherwise(host)
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB compiler for the SAME registrable-domain extraction."""
    host = (
        f"split_part(split_part(split_part({canonicalize_sql(expr)}, "
        "'/', 1), '?', 1), ':', 1)"
    )
    psl_re = _PSL_RE.replace("'", "''")
    sld_re = _SLD_RE.replace("'", "''")
    return (
        f"CASE WHEN regexp_matches({host}, '^(\\d{{1,3}}\\.){{3}}\\d{{1,3}}$') THEN {host} "
        f"WHEN regexp_extract({host}, '{psl_re}', 1) != '' "
        f"THEN regexp_extract({host}, '{psl_re}', 1) "
        f"WHEN regexp_extract({host}, '{sld_re}', 1) != '' "
        f"THEN regexp_extract({host}, '{sld_re}', 1) "
        f"ELSE {host} END"
    )

"""DuckDB oracle SQL for every relational stage of the pipeline.

Each builder returns ANSI SQL (DuckDB dialect) that replays the *identical*
modular arithmetic as the Spark expressions in ``signatures.py`` /
``candidates.py`` / ``clustering.py``, so the driver's side-by-side
value-hash comparison is bit-exact. Single source of truth for the
constants: ``config.py``.

Equivalences relied on (each covered by tests/test_oracle_parity.py):

* ``list_reduce(xs, f)`` == fold with init 0 for our f's, because
  ``f(0, x0) == x0`` for both the word hash and the shingle combiner;
* ``list_aggregate(xs, 'max')`` == Spark ``aggregate(xs, 0L, greatest)``
  for non-empty, non-negative xs;
* DuckDB ``ord`` == Spark ``ascii`` (unicode code point of 1st char).
"""

from __future__ import annotations

from .config import HASH_MOD, PERM_P, SHINGLE_MULT, WORD_MULT, DedupConfig


def tokens_sql(text_col: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t != '')"
    )


def word_hashes_sql(tokens: str) -> str:
    return (
        f"list_transform({tokens}, w -> list_reduce("
        f"list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT)), "
        f"(a, b) -> (a * {WORD_MULT} + b) % {HASH_MOD}))"
    )


def shingles_sql(wh: str, window: int) -> str:
    return (
        f"CASE WHEN len({wh}) < {window} THEN [] "
        f"ELSE list_transform(generate_series(1, len({wh}) - {window} + 1), "
        f"i -> list_reduce({wh}[i : i + {window} - 1], "
        f"(a, b) -> (a * {SHINGLE_MULT} + b) % {HASH_MOD})) END"
    )


def signature_sql(shingles: str, cfg: DedupConfig) -> str:
    ks, bs = cfg.perms
    feats = ", ".join(
        f"list_aggregate(list_transform({shingles}, "
        f"s -> ({ks[m]} * s + {bs[m]}) % {PERM_P}), 'max')"
        for m in range(cfg.n_perm)
    )
    return f"[{feats}]"


def band_hash_sql(sig: str, band_id: str, rows_per_band: int) -> str:
    if rows_per_band == 1:
        return f"{sig}[{band_id} + 1]"
    lo = f"{band_id} * {rows_per_band} + 1"
    hi = f"{band_id} * {rows_per_band} + {rows_per_band}"
    return f"list_aggregate({sig}[{lo} : {hi}], 'sum')"


def pipeline_ctes(cfg: DedupConfig, id_col: str = "doc_id", table: str = "documents") -> str:
    """The full CTE chain: docs -> valid -> sig -> bands -> pairs ->
    verified -> clusters.  Prepend ``WITH RECURSIVE`` and select from any
    stage. Mirrors, stage for stage, the Spark pipeline."""
    min_toks = max(cfg.min_tokens, cfg.shingle_window)
    lang_filter = (
        "" if cfg.langs is None else
        " AND lang IN (" + ", ".join(f"'{l}'" for l in cfg.langs) + ")"
    )
    n_eq = (
        f"CAST(len(list_filter(generate_series(1, {cfg.n_perm}), "
        f"i -> sa.sig[i] = sb.sig[i])) AS BIGINT)"
    )
    early_ratio = (
        f"WHERE least(a.n_set, b.n_set) * 100 >= "
        f"greatest(a.n_set, b.n_set) * {cfg.verify_jaccard_pct}"
        if cfg.verify_mode == "jaccard"
        else ""
    )
    inter = "CAST(len(list_intersect(sa.shingle_set, sb.shingle_set)) AS BIGINT)"
    un = f"CAST(len(sa.shingle_set) + len(sb.shingle_set) AS BIGINT) - ({inter})"
    if cfg.verify_mode == "jaccard":
        # same provable size-ratio prune as the Spark side (no semantic change)
        verify_filter = (
            f"least(len(sa.shingle_set), len(sb.shingle_set)) * 100 >= "
            f"greatest(len(sa.shingle_set), len(sb.shingle_set)) * {cfg.verify_jaccard_pct} "
            f"AND ({inter}) * 100 >= ({un}) * {cfg.verify_jaccard_pct}"
        )
    else:
        verify_filter = f"({n_eq}) >= {cfg.verify_threshold_num}"
    return f"""
docs AS (
  SELECT {id_col} AS id, text, {tokens_sql('text')} AS tokens FROM {table}
),
valid AS (
  SELECT * FROM docs WHERE len(tokens) >= {min_toks}{lang_filter}
),
wh AS (
  SELECT id, {word_hashes_sql('tokens')} AS whs FROM valid
),
sh AS (
  SELECT id, {shingles_sql('whs', cfg.shingle_window)} AS shingles FROM wh
),
sig AS (
  SELECT id, {signature_sql('shingles', cfg)} AS sig,
         list_transform(list_sort(list_distinct(shingles)),
                        x -> CAST(x AS INTEGER)) AS shingle_set
  FROM sh WHERE len(shingles) > 0
),
bands AS (
  SELECT id, CAST(t.band_id AS INT) AS band_id,
         {band_hash_sql('sig', 't.band_id', cfg.rows_per_band)} AS band_hash,
         CAST(len(shingle_set) AS INT) AS n_set
  FROM sig CROSS JOIN (SELECT range AS band_id FROM range(0, {cfg.n_bands})) t
),
bucket_sizes AS (
  SELECT band_id, band_hash, CAST(count(*) AS BIGINT) AS bucket_size
  FROM bands GROUP BY 1, 2
),
kept_bands AS (
  SELECT b.id, b.band_id, b.band_hash, b.n_set
  FROM bands b JOIN bucket_sizes s
    ON s.band_id = b.band_id AND s.band_hash = b.band_hash
  WHERE s.bucket_size >= 2 AND s.bucket_size <= {cfg.bucket_cap}
),
{_cand_pairs_ctes(cfg, early_ratio)}
verified AS (
  SELECT p.id_a, p.id_b, p.n_matching_bands, {n_eq} AS n_eq,
         {inter} AS inter, {un} AS un
  FROM cand_pairs p
  JOIN sig sa ON sa.id = p.id_a
  JOIN sig sb ON sb.id = p.id_b
  WHERE {verify_filter}
),
edges_sym AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach(node, lbl) AS (
  SELECT id, id FROM sig
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges_sym e ON e.src = r.node
),
clusters AS (
  SELECT node AS id, min(lbl) AS cluster_id FROM reach GROUP BY 1
)"""


def _cand_pairs_ctes(cfg: DedupConfig, early_ratio: str) -> str:
    """``cand_pairs`` CTE(s). With ``hot_window > 0``, hot buckets
    contribute sorted-neighborhood pairs instead of being dropped
    (mirrors ``candidates.candidate_pairs_hotwindow``): a band bucket is
    either quiet (<= cap, full pairing) or hot (> cap, window pairing),
    so ``count(DISTINCT band_id)`` over the union of per-band emissions
    equals the Spark side's quiet-sum + hot-distinct-count."""
    quiet_emit = f"""
  SELECT a.id AS id_a, b.id AS id_b, a.band_id
  FROM kept_bands a
  JOIN kept_bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id
  {early_ratio}"""
    if cfg.hot_window <= 0:
        return f"""cand_pairs AS (
  SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_matching_bands
  FROM ({quiet_emit})
  GROUP BY 1, 2
  HAVING count(*) >= {cfg.band_match_threshold}
),"""
    hot_ratio = (
        f"AND least(a.n_set, b.n_set) * 100 >= "
        f"greatest(a.n_set, b.n_set) * {cfg.verify_jaccard_pct}"
        if cfg.verify_mode == "jaccard"
        else ""
    )
    return f"""hot_ranked AS (
  SELECT b.id, b.band_id, b.band_hash, b.n_set,
         CAST(row_number() OVER (PARTITION BY b.band_id, b.band_hash
              ORDER BY b.n_set ASC, b.id ASC) AS BIGINT) AS r
  FROM bands b JOIN bucket_sizes s
    ON s.band_id = b.band_id AND s.band_hash = b.band_hash
  WHERE s.bucket_size > {cfg.bucket_cap} AND s.bucket_size <= {cfg.mega_cap}
),
cand_emissions AS (
  {quiet_emit}
  UNION ALL
  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b, a.band_id
  FROM hot_ranked a JOIN hot_ranked b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND b.r > a.r AND b.r <= a.r + {cfg.hot_window}
  {hot_ratio}
),
cand_pairs AS (
  SELECT id_a, id_b, CAST(count(DISTINCT band_id) AS BIGINT) AS n_matching_bands
  FROM cand_emissions
  GROUP BY 1, 2
  HAVING count(DISTINCT band_id) >= {cfg.band_match_threshold}
),"""


def stage_query(cfg: DedupConfig, select: str, id_col: str = "doc_id",
                table: str = "documents") -> str:
    return f"WITH RECURSIVE {pipeline_ctes(cfg, id_col, table)}\n{select}"

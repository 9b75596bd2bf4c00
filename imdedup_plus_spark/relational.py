"""Relational operators Spark lacks as built-ins, composed scalably.

The reference implements only hand-rolled hash joins (SURVEY §2.2); this
module adds the time-series join a training-data pipeline needs on event
tables: a distributed **as-of join** (for each left row, the most recent
right row at-or-before its timestamp, per key).

The naive formulation — a range join ``l JOIN r ON key AND r.ts <= l.ts``
followed by an arg-max — explodes at scale: every left row joins *all*
earlier right rows of its key (O(|l| x |r|) per key for active keys).
``asof_join`` instead uses the union-interleave pattern: tag both sides,
union, single shuffle on ``key``, sort by ``(ts, side)`` within the key,
and carry the last-seen right row forward with ``last(..., ignorenulls)``
over an unbounded-preceding running window. Cost is one shuffle + one sort
— the same plan shape Spark uses for any window aggregate, no pair
explosion, skewed keys handled by AQE like any other window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each ``left`` row: the ``value_cols`` of the ``right`` row with
    the greatest ``right_ts <= left_ts`` for the same ``on`` key (NULLs if
    none). Ties on ``right_ts`` are broken by ``tiebreak`` ascending
    (greatest wins), making the result deterministic.

    Semantics are inclusive (``right_ts == left_ts`` matches), mirroring
    ANSI ``ASOF JOIN ... ON r.ts <= l.ts``.
    """
    order = [F.col("__ts__").asc(), F.col("__side__").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())

    l_tag = left.withColumn("__side__", F.lit(1)).withColumn(
        "__ts__", F.col(left_ts)
    )
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__r_{c}__", F.lit(None).cast(dict(right.dtypes)[c]))
    if tiebreak is not None and tiebreak not in l_tag.columns:
        l_tag = l_tag.withColumn(tiebreak, F.lit(None).cast(dict(right.dtypes)[tiebreak]))

    r_cols = [F.col(on), F.col(right_ts).alias("__ts__"), F.lit(0).alias("__side__")]
    r_cols += [F.col(c).alias(f"__r_{c}__") for c in value_cols]
    if tiebreak is not None:
        r_cols.append(F.col(tiebreak))
    r_tag = right.select(*r_cols)

    union_cols = [on, "__ts__", "__side__"] + [f"__r_{c}__" for c in value_cols]
    if tiebreak is not None:
        union_cols.append(tiebreak)
    extra = [c for c in l_tag.columns if c not in union_cols]
    for c in extra:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))

    u = l_tag.select(*union_cols, *extra).unionByName(r_tag.select(*union_cols, *extra))

    w = Window.partitionBy(on).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in value_cols:
        u = u.withColumn(f"{prefix}{c}", F.last(f"__r_{c}__", ignorenulls=True).over(w))

    drop = ["__ts__", "__side__"] + [f"__r_{c}__" for c in value_cols]
    if tiebreak is not None:
        drop.append(tiebreak)
    return u.where(F.col("__side__") == 1).drop(*drop)

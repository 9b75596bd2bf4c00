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

    The matched right row is carried as ONE struct (all ``value_cols``
    together), so the result always mixes columns from a single right row —
    taking ``last(..., ignorenulls)`` per value column independently would
    splice fields from different rows whenever the latest right row has a
    NULL in one of them. Right rows with NULL ``right_ts`` are excluded up
    front (a NULL timestamp satisfies no ``<=`` bound), matching the
    row_number-based SQL oracle.
    """
    right = right.where(F.col(right_ts).isNotNull())
    rtypes = dict(right.dtypes)
    struct_type = "struct<" + ", ".join(f"{c}:{rtypes[c]}" for c in value_cols) + ">"

    l_tag = (
        left.withColumn("__side__", F.lit(1))
        .withColumn("__ts__", F.col(left_ts))
        .withColumn("__rv__", F.lit(None).cast(struct_type))
        .withColumn(
            "__tb__",
            F.lit(None).cast(rtypes[tiebreak] if tiebreak is not None else "int"),
        )
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv__"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(None).cast("int")).alias(
            "__tb__"
        ),
    )

    union_cols = [on, "__ts__", "__side__", "__rv__", "__tb__"]
    extra = [c for c in l_tag.columns if c not in union_cols]
    for c in extra:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))

    u = l_tag.select(*union_cols, *extra).unionByName(r_tag.select(*union_cols, *extra))

    # right rows sort before left rows at equal ts (inclusive match); ties
    # among right rows at equal ts resolve by tiebreak asc, so last() = the
    # greatest tiebreak — one struct, one winning row, all fields together
    w = Window.partitionBy(on).orderBy(
        F.col("__ts__").asc(), F.col("__side__").asc(), F.col("__tb__").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = u.withColumn("__last__", F.last("__rv__", ignorenulls=True).over(w))

    out = u.where(F.col("__side__") == 1)
    for c in value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("__last__").getField(c))
    return out.drop("__ts__", "__side__", "__rv__", "__tb__", "__last__")

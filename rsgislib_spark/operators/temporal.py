"""Temporal join operators: as-of join and bucketed interval/range join.

Spark lacks both as built-ins; naive formulations are scale-killers
(an as-of join as a theta-join explodes, an interval join plans as
BroadcastNestedLoopJoin). These are the compositions that survive 100 TB:

 - ``asof_join``: union both sides and run ONE window pass per key with
   ``last(..., ignorenulls=True)`` — a single sort-shuffle on
   (keys, time); no range predicate ever reaches the planner. Same shape
   as the reference's nearest-in-time composite fill
   (gen_timeseries_fill_composite_img, imageutils.cpp:2706-2721).
 - ``range_join_bucketed``: intervals explode to the coarse time buckets
   they cover, points equi-join on (keys, bucket), then the exact
   containment filter prunes. Exact by construction: an interval
   containing t also covers t's bucket. The join is a plain equi-join
   Catalyst can hash/sort-merge and AQE can skew-split — never a BNLJ.
   Bucket sizing: ~the max interval span keeps the explode factor ≤ 2
   rows per interval while keeping buckets selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains, for each of
    ``value_cols``, the value from the latest ``right`` row with
    ``right.time <= left.time`` within the same ``by`` keys (null when
    no predecessor exists). At equal timestamps the right row counts
    (<=, not <).

    Plan: tag-union the two inputs, one window
    ``last(value, ignorenulls=True)`` ordered by (time, side[, tiebreak])
    per key — right rows sort before left rows at equal time so <= ties
    resolve correctly. One sort-shuffle on ``by``; both inputs stream
    through it once.
    """
    lcols = left.columns
    tag_r = right.select(
        *by,
        F.col(time_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in by and c != time_col],
    )
    tag_l = left.select(
        *by,
        F.col(time_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in by and c != time_col],
    )
    order = [F.col(time_col).asc(), F.col("_side").asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    win = (
        W.partitionBy(*[F.col(k) for k in by])
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = tag_r.unionByName(tag_l)
    for c in value_cols:
        filled = filled.withColumn(
            f"_v_{c}", F.last(F.col(f"_v_{c}"), ignorenulls=True).over(win)
        )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_v_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket: int = 1,
) -> DataFrame:
    """Inner join of ``points`` to every ``intervals`` row with
    ``start <= t <= end`` (and equal ``by`` keys), via time-bucket
    blocking. ``t_col``/``start_col``/``end_col`` are integer-like
    (e.g. epoch micros); ``bucket`` is the bucket width in the same
    unit — size it near the MAX interval span so each interval explodes
    into ~2 bucket rows.

    Columns from both sides are kept; name collisions beyond ``by`` are
    the caller's to resolve (select/alias first).
    """
    by = by or []
    bkt = int(bucket)
    # integer `div`, not `/`: epoch-microsecond magnitudes sit close to
    # the double mantissa limit, and a float quotient that rounds across
    # a bucket boundary would silently drop matches
    iv = intervals.withColumn(
        "_rjb",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) div {bkt}"),
                F.expr(f"CAST({end_col} AS BIGINT) div {bkt}"),
            )
        ),
    )
    pt = points.withColumn("_rjb", F.expr(f"CAST({t_col} AS BIGINT) div {bkt}"))
    return (
        pt.join(iv, by + ["_rjb"])
        .filter(
            (F.col(t_col) >= F.col(start_col)) & (F.col(t_col) <= F.col(end_col))
        )
        .drop("_rjb")
    )

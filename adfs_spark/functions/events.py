"""Event-sequence analytics: ordered funnels and retention cohorts.

The reference's event handling stops at threshold scans (T1/T2) and
report reconciliation loops; these are the standard product-analytics
queries an events table invites once an engine has windows and joins.
Both are pure DataFrame compositions — no UDFs, no state.

Scale shapes:
- ``funnel_counts``: one groupBy per funnel step plus a step-count of
  user-keyed joins (each carries one row per surviving user, shrinking
  monotonically down the funnel).  Steps are a handful, so this is
  k small user-keyed shuffles, AQE-broadcastable as survivors shrink.
- ``retention_cohorts``: two groupBys (first-seen per user, then
  cohort × offset distinct counts) — the tf·idf shuffle budget.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step i when an event of
    ``steps[i]`` occurs *after* their earliest qualifying step i-1
    event.  Returns (step, step_index, n_users) with step 0 = everyone
    who did ``steps[0]``.
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    out_rows = [reached]
    for s in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .join(out_rows[-1].select(user_col, "_t"), user_col)
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        out_rows.append(nxt)
    counts = None
    for i, (s, df) in enumerate(zip(steps, out_rows)):
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(s).alias("step"),
            F.lit(i).cast("long").alias("step_index"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    return counts


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their
    first event; for each (cohort_week, week_offset) the count of
    cohort members active that week.  Offsets are whole weeks of
    *days* since first event (date arithmetic — identical across
    engines, no epoch-fraction edge cases)."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    joined = events.join(first, user_col).select(
        F.col(user_col),
        F.date_format(
            F.date_trunc("week", F.col("_first")), "yyyy-MM-dd"
        ).alias("cohort_week"),
        F.floor(
            F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.col("_first"))) / 7
        ).alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(user_col).alias("n_active")
    )

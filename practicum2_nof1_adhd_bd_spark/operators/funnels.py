"""Event-sequence analytics: ordered funnels and cohort retention.

The two classic product/behavior-analytics shapes over an event stream
(the MATCH_RECOGNIZE-lite tier): a funnel asks "how many users performed
step A, then B after A, then C after B", retention asks "of the users
who first appeared in week W, how many were active W+k".

Both are pure relational algebra designed around ONE user-keyed shuffle:
the funnel is a chain of conditional-min aggregations on the same
user_id key (Spark reuses the exchange — each later stage consumes the
previous stage's partitioning), and retention is two aggregations (first
seen, then (cohort, offset) distinct counts). No sequential per-user
state, no UDFs, so both scan-scale to firehose event volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_horizon: str | None = None,
) -> DataFrame:
    """Ordered funnel: one row per step with the count of users whose
    FIRST qualifying event for step i occurs at-or-after their first
    qualifying event for step i-1 (the standard strictly-ordered,
    earliest-completion funnel semantics — re-orderings don't count,
    repeat events before the previous step don't count).

    ``step_horizon`` (a SQL interval string, e.g. "INTERVAL 6 HOURS")
    additionally requires each step within that horizon of the PREVIOUS
    step's anchor — the conversion-window form every funnel product
    uses; None means unbounded.

    Plan shape: stage i is a conditional min over the user key joined to
    stage i-1's anchor — every stage shuffles on the SAME key, so after
    the first exchange the rest are co-partitioned. All stage anchors
    are then left-joined into one per-user wide frame and every step
    count comes out of a SINGLE aggregation — one lazy plan, one action,
    no per-stage ``.count()`` (which would re-execute every earlier
    stage's lineage, O(steps^2) scans) and no driver-side
    ``createDataFrame``. Repeated stage subplans inside the wide frame
    dedupe via ReusedExchange (every join keys on ``u``). Output is
    steps-cardinality rows: (step, step_name, n_users, conv_from_prev,
    conv_from_first); ratios via F.round — HALF_UP, the engine-wide
    half-away-from-zero rule DuckDB's round() shares (Python's round()
    is banker's and flips the value hash on exact 7-decimal ties).
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t"),
        F.col(type_col).alias("k"),
    )
    # stage 1: first occurrence of the entry step
    anchors = (
        ev.filter(F.col("k") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
    )
    frames = [anchors]
    prev, prev_col = anchors, "t1"
    for i, step in enumerate(steps[1:], start=2):
        win = (
            (F.col("t") >= F.col(prev_col))
            if step_horizon is None
            else (F.col("t") >= F.col(prev_col))
            & (F.col("t") <= F.col(prev_col) + F.expr(step_horizon))
        )
        nxt = (
            ev.filter(F.col("k") == step)
            .join(prev.select("u", prev_col), "u")
            .filter(win)
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        frames.append(nxt)
        prev, prev_col = nxt, f"t{i}"
    wide = frames[0]
    for f in frames[1:]:
        wide = wide.join(f, "u", "left")
    counts = wide.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in range(1, len(steps) + 1)]
    )
    structs = [
        F.struct(
            F.lit(i).alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"c{i}").alias("n_users"),
            (
                F.lit(None).cast("long") if i == 1 else F.col(f"c{i-1}")
            ).alias("n_prev"),
            F.col("c1").alias("n_first"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    per_step = (
        counts.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    )
    return per_step.select(
        "step",
        "step_name",
        "n_users",
        F.when(
            F.col("n_prev").isNull() | (F.col("n_prev") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(F.col("n_users") / F.col("n_prev"), 6))
        .alias("conv_from_prev"),
        F.when(F.col("n_first") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n_users") / F.col("n_first"), 6))
        .alias("conv_from_first"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday of the user's first
    event week; week_offset = whole weeks between the event and the
    user's first event; one row per (cohort_week, week_offset) with the
    distinct active users and the retention ratio against the cohort
    size (offset 0 is the cohort size itself, ratio 1.0 by
    construction).

    Two aggregations: first-seen per user (one user-keyed shuffle),
    then distinct users per (cohort, offset) — the event stream never
    shuffles more than once at user grain, and the output is bounded by
    weeks^2, not users.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    )
    first = ev.groupBy("u").agg(F.min("d").alias("first_d"))
    joined = ev.join(first, "u").select(
        "u",
        F.date_trunc("week", "first_d").cast("date").alias("cohort_week"),
        # explicit floor: Spark's double->int cast truncates but
        # DuckDB's CAST rounds-to-nearest — floor() is the one form
        # both engines agree on
        F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7).cast("int").alias(
            "week_offset"
        ),
    ).filter(F.col("week_offset") <= max_weeks)
    active = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("u").alias("n_active")
    )
    size = active.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return active.join(size, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event-type transition matrix: for each ordered pair
    (from_type, to_type), the count of consecutive-event transitions
    across all users and the row-normalized probability — the Markov
    view of behavior that funnels sample one path of.

    Each user's stream is ordered by (ts, event_id) — the id tiebreak
    makes same-timestamp ordering deterministic in both engines. One
    user-keyed window (lead) + one (from, to) count; the transition
    matrix is |types|^2 rows regardless of corpus size, and the window
    partitions by user so no single task ever holds more than one
    user's stream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("t", "eid")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("k"),
    )
    pairs = (
        ev.withColumn("nxt", F.lead("k").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("k").alias("from_type"), F.col("nxt").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("row_total"), 6).alias("p"),
    )

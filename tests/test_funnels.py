"""Ordered funnels and cohort retention — hand-checkable semantics."""

import datetime as dt

from practicum2_nof1_adhd_bd_spark.operators import funnels


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), k) for u, t, k in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_order_and_horizon_semantics(spark):
    """User 1 completes in order; user 2 clicks BEFORE signing up
    (excluded — order matters); user 3 clicks 7h after signup
    (excluded by the 6h horizon); user 4 signs up only."""
    ev = _ev(spark, [
        (1, "2024-01-01 10:00:00", "signup"),
        (1, "2024-01-01 11:00:00", "click"),
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "signup"),
        (3, "2024-01-01 10:00:00", "signup"),
        (3, "2024-01-01 17:00:01", "click"),
        (4, "2024-01-01 10:00:00", "signup"),
    ])
    out = {r["step_name"]: r for r in funnels.funnel_steps(
        ev, ["signup", "click"], step_horizon="INTERVAL 6 HOURS"
    ).collect()}
    assert out["signup"]["n_users"] == 4
    assert out["click"]["n_users"] == 1
    assert out["click"]["conv_from_first"] == 0.25
    assert out["signup"]["conv_from_prev"] is None


def test_funnel_anchor_is_first_qualifying_event(spark):
    """Earliest-completion: the SECOND signup would make the click
    qualify, but the anchor is the FIRST signup — the click at +10h
    is outside its horizon and must not count."""
    ev = _ev(spark, [
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 08:00:00", "signup"),
        (1, "2024-01-01 10:00:00", "click"),
    ])
    out = {r["step_name"]: r["n_users"] for r in funnels.funnel_steps(
        ev, ["signup", "click"], step_horizon="INTERVAL 6 HOURS"
    ).collect()}
    assert out == {"signup": 1, "click": 0}


def test_retention_cohorts_hand_case(spark):
    """Two cohorts: users 1-2 start week of Jan 1 (Monday), user 3
    starts week of Jan 8. User 1 returns in weeks 1 and 2, user 2
    never returns, user 3 returns in its week 1."""
    ev = _ev(spark, [
        (1, "2024-01-02 10:00:00", "view"),
        (1, "2024-01-09 10:00:00", "view"),   # +7d -> offset 1
        (1, "2024-01-16 10:00:00", "view"),   # +14d -> offset 2
        (2, "2024-01-03 10:00:00", "view"),
        (3, "2024-01-10 10:00:00", "view"),
        (3, "2024-01-17 10:00:00", "view"),   # offset 1
    ])
    out = {(str(r["cohort_week"]), r["week_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
           for r in funnels.retention_cohorts(ev).collect()}
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 2)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_retention_offset_floors_partial_weeks(spark):
    """A return 6 days later is still week offset 0; 8 days later is
    offset 1 — the floor() semantics both engines share."""
    ev = _ev(spark, [
        (1, "2024-01-02 10:00:00", "view"),
        (1, "2024-01-08 10:00:00", "view"),   # +6d -> offset 0
        (2, "2024-01-02 10:00:00", "view"),
        (2, "2024-01-10 10:00:00", "view"),   # +8d -> offset 1
    ])
    out = {(r["week_offset"]): r["n_active"]
           for r in funnels.retention_cohorts(ev).collect()}
    assert out[0] == 2 and out[1] == 1


def test_event_transitions_hand_stream(spark):
    """User 1: a->b->b; user 2: b->a. Transitions: (a,b)=1, (b,b)=1,
    (b,a)=1; row-normalized p: a->b 1.0; b->a 0.5, b->b 0.5. Streams
    never cross users."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a"),
        (1, "2024-01-01 11:00:00", 2, "b"),
        (1, "2024-01-01 12:00:00", 3, "b"),
        (2, "2024-01-01 10:30:00", 4, "b"),
        (2, "2024-01-01 10:45:00", 5, "a"),
    ]
    ev = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), e, k) for u, t, e, k in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in funnels.event_transitions(ev).collect()}
    assert out == {("a", "b"): (1, 1.0), ("b", "b"): (1, 0.5), ("b", "a"): (1, 0.5)}


def test_event_transitions_same_ts_orders_by_event_id(spark):
    """Two same-timestamp events order by event_id — the deterministic
    tiebreak the oracle relies on."""
    rows = [
        (1, "2024-01-01 10:00:00", 2, "b"),
        (1, "2024-01-01 10:00:00", 1, "a"),
    ]
    ev = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(t), e, k) for u, t, e, k in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = [(r["from_type"], r["to_type"])
           for r in funnels.event_transitions(ev).collect()]
    assert out == [("a", "b")]


def test_funnel_steps_is_one_lazy_plan_no_driver_actions(spark):
    """The r12 ADVICE fix pinned: building the funnel frame must run
    ZERO Spark jobs (the old implementation ran a .count() per stage,
    re-executing every earlier stage's lineage O(steps^2)), and the
    whole result must come from ONE action."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import funnels

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "signup"),
            (1, "2024-01-01 01:00:00", "click"),
            (2, "2024-01-01 00:00:00", "signup"),
        ],
        "user_id int, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = funnels.funnel_steps(
        ev, ["signup", "click", "purchase"], step_horizon="INTERVAL 6 HOURS"
    )
    after_build = len(tracker.getJobIdsForGroup(None) or [])
    assert after_build == before, "funnel construction ran Spark jobs"
    rows = {r["step_name"]: r for r in out.collect()}
    assert rows["signup"]["n_users"] == 2
    assert rows["click"]["n_users"] == 1
    assert rows["click"]["conv_from_prev"] == 0.5
    assert rows["purchase"]["n_users"] == 0
    # prev stage converted 1 user, this stage 0 -> 0.0 (a real ratio,
    # not the step-1 NULL)
    assert rows["purchase"]["conv_from_prev"] == 0.0
    assert rows["signup"]["conv_from_prev"] is None

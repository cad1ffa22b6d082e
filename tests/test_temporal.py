"""Unit tests for as-of and range joins (temporal operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_self_join_pairs,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds(F.col("sec"))
    )


def test_asof_join_basic_ties_and_missing(spark):
    left = _ts(
        spark,
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c"), (3, 99, "d")],
        "k INT, sec INT, tag STRING",
    ).withColumnRenamed("ts", "lts")
    right = _ts(
        spark,
        [(1, 100, 10.0), (1, 60, 20.0), (1, 40, 30.0), (2, 11, 40.0)],
        "k INT, sec INT, v DOUBLE",
    ).withColumnRenamed("ts", "rts")

    out = asof_join(
        left.select("k", "lts", "tag"),
        right.select("k", "rts", "v"),
        on="k", left_time="lts", right_time="rts", right_values=["v"],
    )
    got = {r["tag"]: r["v"] for r in out.collect()}
    # a@100: right@100 attaches on tie; b@50: right@40; c@10: none; d: no rights
    assert got == {"a": 10.0, "b": 30.0, "c": None, "d": None}


def test_asof_join_strict_excludes_ties(spark):
    left = _ts(spark, [(1, 100, "a")], "k INT, sec INT, tag STRING").withColumnRenamed("ts", "lts")
    right = _ts(spark, [(1, 100, 1.0), (1, 90, 2.0)], "k INT, sec INT, v DOUBLE").withColumnRenamed("ts", "rts")
    out = asof_join(
        left.select("k", "lts", "tag"), right.select("k", "rts", "v"),
        on="k", left_time="lts", right_time="rts", right_values=["v"], strict=True,
    )
    assert out.collect()[0]["v"] == 2.0  # tie at 100 excluded under strict <


def test_range_self_join_bucket_boundaries(spark):
    # deltas: exactly max_delta (kept), just over (dropped), cross-bucket
    # adjacency (2@300 and 3@301 are in different buckets but pair up),
    # different key never pairs
    df = _ts(
        spark,
        [(1, 0, 1), (1, 300, 2), (1, 301, 3), (1, 650, 4), (2, 5, 5)],
        "k INT, sec INT, event_id INT",
    )
    out = range_self_join_pairs(df, ["k"], "ts", "event_id", 300)
    got = {(r["id_a"], r["id_b"]): r["delta_sec"] for r in out.collect()}
    assert got == {(1, 2): 300, (2, 3): 1}


def test_range_self_join_excludes_over_limit(spark):
    df = _ts(spark, [(1, 0, 1), (1, 301, 2)], "k INT, sec INT, event_id INT")
    out = range_self_join_pairs(df, ["k"], "ts", "event_id", 300)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# ordered funnel (relational min-chain)
# ---------------------------------------------------------------------------


def _funnel_events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (u, base + dt.timedelta(seconds=s), et) for (u, s, et) in rows
    ]
    return spark.createDataFrame(
        data, "user_id BIGINT, ts TIMESTAMP, event_type STRING"
    )


def test_funnel_orders_and_excludes_out_of_order(spark):
    from dog_data_pipeline_spark.operators.temporal import funnel_steps

    ev = _funnel_events(
        spark,
        [
            # user 1: full funnel in order
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # user 2: click BEFORE view -> stops after view
            (2, 50, "click"), (2, 60, "view"),
            # user 3: purchase before click -> counts view+click only
            (3, 0, "view"), (3, 5, "purchase"), (3, 10, "click"),
            # user 4: never views -> not even step 1
            (4, 0, "click"), (4, 1, "purchase"),
        ],
    )
    out = {
        r["step"]: (r["n_users"], r["conversion_rate"])
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert out["1_view"] == (3, 1.0)
    assert out["2_click"] == (2, round(2 / 3, 4))
    assert out["3_purchase"] == (1, round(1 / 3, 4))


def test_funnel_within_window_cuts_late_conversions(spark):
    from dog_data_pipeline_spark.operators.temporal import funnel_steps

    ev = _funnel_events(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"),          # in window
            (2, 0, "view"), (2, 2000, "click"),        # too late
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_steps(ev, ["view", "click"], within_sec=100).collect()
    }
    assert out == {"1_view": 2, "2_click": 1}


def test_funnel_strictly_after_ties_do_not_count(spark):
    from dog_data_pipeline_spark.operators.temporal import funnel_steps

    # click at the SAME second as the first view: t > t_prev is strict
    ev = _funnel_events(spark, [(1, 0, "view"), (1, 0, "click")])
    out = {
        r["step"]: r["n_users"]
        for r in funnel_steps(ev, ["view", "click"]).collect()
    }
    assert out == {"1_view": 1, "2_click": 0}


def test_cohort_retention_counts_and_rates(spark):
    from dog_data_pipeline_spark.operators.temporal import cohort_retention

    # bucket_sec=100 for readable buckets: users 1,2 start in bucket 0;
    # user 1 returns in bucket 1; user 3 starts in bucket 1
    ev = _funnel_events(
        spark,
        [
            (1, 10, "view"), (1, 150, "click"),
            (2, 20, "view"),
            (3, 110, "view"),
        ],
    )
    out = {
        (r["cohort_wk"], r["week_offset"]): (r["n_active"], r["retention_rate"])
        for r in cohort_retention(ev, bucket_sec=100).collect()
    }
    base = min(k[0] for k in out)
    assert out[(base, 0)] == (2, 1.0)       # cohort of 2, both active at 0
    assert out[(base, 1)] == (1, 0.5)       # user 1 retained
    assert out[(base + 1, 0)] == (1, 1.0)   # user 3's own cohort
    assert len(out) == 3


def test_event_transitions_orders_and_counts(spark):
    from dog_data_pipeline_spark.operators.temporal import event_transitions

    ev = _funnel_events(
        spark,
        [
            (1, 0, "view"), (1, 1, "click"), (1, 2, "view"), (1, 3, "click"),
            (2, 0, "view"), (2, 1, "click"),
            # user 3's events never chain into user 1/2's
            (3, 0, "purchase"),
        ],
    )
    ev = ev.withColumn("event_id", F.monotonically_increasing_id())
    rows = event_transitions(ev).collect()
    got = {(r["from_type"], r["to_type"]): r["n_transitions"] for r in rows}
    assert got == {("view", "click"): 3, ("click", "view"): 1}
    # top-1 is the most frequent pair
    assert (rows[0]["from_type"], rows[0]["to_type"]) == ("view", "click")


def test_funnel_empty_first_step_reports_zero_not_crash(spark):
    from dog_data_pipeline_spark.operators.temporal import funnel_steps

    ev = _funnel_events(spark, [(1, 0, "click")])
    out = {
        r["step"]: (r["n_users"], r["conversion_rate"])
        for r in funnel_steps(ev, ["view", "click"]).collect()
    }
    assert out["1_view"] == (0, None)
    assert out["2_click"] == (0, None)


def test_decayed_engagement_exact_halving_per_halflife(spark):
    from dog_data_pipeline_spark.operators.temporal import decayed_engagement

    # user 1: 100.00 now + 100.00 one halflife ago -> 10000 + 5000
    # user 2: 100.00 two halflives ago -> 2500; odd centi-value floors
    ev = _funnel_events(
        spark,
        [(1, 200, "e"), (1, 100, "e"), (2, 0, "e")],
    ).withColumn("value", F.lit(100.0))
    out = {
        r["user_id"]: (r["n_events"], r["engagement_c"])
        for r in decayed_engagement(ev, halflife_sec=100).collect()
    }
    assert out[1] == (2, 10000 + 5000)
    assert out[2] == (1, 2500)


def test_decayed_engagement_floor_division_and_cap(spark):
    import datetime as dt

    from dog_data_pipeline_spark.operators.temporal import decayed_engagement

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0.05),                                   # 5c >> 1 = 2
        (2, base + dt.timedelta(seconds=100), 0.05),       # fresh: 5c
        # ancient event: age floor-capped at 62 halflives -> 0
        (3, base - dt.timedelta(seconds=100 * 10**6), 490.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r["user_id"]: r["engagement_c"]
        for r in decayed_engagement(ev, halflife_sec=100).collect()
    }
    assert out[2] == 5
    assert out[1] == 2   # floor(5 / 2)
    assert out[3] == 0   # shifted to nothing, no overflow/crash


def test_time_weighted_avg_hand_checked(spark):
    import math
    from datetime import datetime

    from dog_data_pipeline_spark.operators.temporal import time_weighted_avg

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: v=10 for 60s, v=30 for 180s -> twap = (600+5400)/240 = 25
        (1, t(0), 10.0, 1),
        (1, t(1), 30.0, 2),
        (1, t(4), 99.0, 3),   # last reading carries no duration
        # user 2: single event -> dropped (no interval)
        (2, t(0), 7.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE, event_id BIGINT"
    )
    out = time_weighted_avg(df, "user_id", "ts", "value", ("event_id",))
    got = {r["user_id"]: r for r in out.collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_events"] == 3 and r["span_seconds"] == 240
    assert math.isclose(r["twap"], 25.0)
    assert math.isclose(r["plain_avg"], 20.0)  # naive mean of the held values
    # burstiness: naive mean underweights the long-held 30
    assert r["twap"] > r["plain_avg"]


def test_last_touch_attribution_hand_checked(spark):
    import math
    from datetime import datetime

    from dog_data_pipeline_spark.operators.temporal import last_touch_attribution

    t = lambda m: datetime(2024, 3, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: click -> buy(100), view -> buy(50)
        (1, t(0), "click", 0.0, 1),
        (1, t(1), "buy", 100.0, 2),
        (1, t(2), "view", 0.0, 3),
        (1, t(3), "buy", 50.0, 4),
        # user 2: buy with no touchpoint -> direct
        (2, t(0), "buy", 25.0, 5),
        # user 2's later click must NOT attribute the earlier buy
        (2, t(1), "click", 0.0, 6),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE, "
        "event_id BIGINT",
    )
    out = last_touch_attribution(
        df, "user_id", "ts", "event_type", "value", "buy", ("event_id",)
    )
    got = {r["channel"]: r for r in out.collect()}
    assert set(got) == {"click", "view", "direct"}
    assert got["click"]["attributed_value"] == 100.0
    assert got["view"]["attributed_value"] == 50.0
    assert got["direct"]["attributed_value"] == 25.0
    assert math.isclose(got["click"]["conversion_share"], 1 / 3)
    # a buy between two touchpoints credits the LAST one only
    assert got["view"]["n_conversions"] == 1


def test_interval_overlap_join_hand_checked(spark):
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 500, 600)], "lid BIGINT, s_a BIGINT, e_a BIGINT"
    )
    right = spark.createDataFrame(
        [
            (10, 50, 150),    # overlaps lid 1 by 50s
            (11, 100, 200),   # touches lid 1 end exactly -> NO overlap (half-open)
            (12, 590, 9999),  # overlaps lid 2 by 10s, spans many buckets
        ],
        "rid BIGINT, s_b BIGINT, e_b BIGINT",
    )
    out = interval_overlap_join(
        left, right, "s_a", "e_a", "s_b", "e_b", bucket_seconds=100
    )
    got = {(r["lid"], r["rid"]): r["overlap_seconds"] for r in out.collect()}
    assert got == {(1, 10): 50, (2, 12): 10}


def test_interval_overlap_join_multi_bucket_pair_counted_once(spark):
    from dog_data_pipeline_spark.operators.temporal import interval_overlap_join

    # both intervals span the same 5 buckets -> the bucket join matches
    # 5 times; the first-shared-bucket filter must keep exactly one
    left = spark.createDataFrame([(1, 0, 500)], "lid BIGINT, s_a BIGINT, e_a BIGINT")
    right = spark.createDataFrame([(2, 0, 500)], "rid BIGINT, s_b BIGINT, e_b BIGINT")
    out = interval_overlap_join(
        left, right, "s_a", "e_a", "s_b", "e_b", bucket_seconds=100
    ).collect()
    assert len(out) == 1 and out[0]["overlap_seconds"] == 500


def test_interval_overlap_join_degenerate_interval_no_crash(spark):
    from dog_data_pipeline_spark.operators.temporal import interval_overlap_join

    # zero-length interval: sequence() must not descend/fabricate rows
    left = spark.createDataFrame([(1, 100, 100)], "lid BIGINT, s_a BIGINT, e_a BIGINT")
    right = spark.createDataFrame([(2, 0, 1000)], "rid BIGINT, s_b BIGINT, e_b BIGINT")
    out = interval_overlap_join(
        left, right, "s_a", "e_a", "s_b", "e_b", bucket_seconds=100
    ).collect()
    assert out == []  # empty interval overlaps nothing under half-open


def test_funnel_step_latency_hand_checked(spark):
    from datetime import datetime

    from dog_data_pipeline_spark.operators.temporal import funnel_step_latency

    t = lambda m: datetime(2024, 5, 1, 0, 0, m)  # noqa: E731
    rows = [
        # user 1: A@0 -> B@10 (delta 10)
        (1, "A", t(0)), (1, "B", t(10)),
        # user 2: A@0 -> B@30 (delta 30); B@5 BEFORE A must not count...
        (2, "B", t(5)),  # wait: B@5 is before A@0? no, A is at t(0)
        (2, "A", t(0)), (2, "B", t(30)),
        # user 3: A@0 -> B@20 (delta 20)
        (3, "A", t(0)), (3, "B", t(20)),
        # user 4: only A -> no transition row
        (4, "A", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, event_type STRING, ts TIMESTAMP")
    out = {r["transition"]: r for r in funnel_step_latency(df, ["A", "B"]).collect()}
    r = out["1_A->2_B"]
    # user 2's first B after A@0 is B@5 -> delta 5; deltas = [5, 10, 20]
    assert r["n_users"] == 3
    assert (r["min_sec"], r["max_sec"]) == (5, 20)
    # n=3: median pos (3+1)//2 = 2 -> 10; p90 pos (27+9)//10 = 3 -> 20
    assert r["median_sec"] == 10
    assert r["p90_sec"] == 20


def test_funnel_step_latency_strictly_after_previous_step(spark):
    from datetime import datetime

    from dog_data_pipeline_spark.operators.temporal import funnel_step_latency

    t = lambda s: datetime(2024, 6, 1, 0, 0, s)  # noqa: E731
    # B fires only BEFORE A: no conversion; B at the same second as A
    # is not "after" (strict)
    rows = [(1, "B", t(0)), (1, "A", t(5)), (1, "B", t(5)),
            (2, "A", t(0)), (2, "B", t(1))]
    df = spark.createDataFrame(rows, "user_id BIGINT, event_type STRING, ts TIMESTAMP")
    out = {r["transition"]: r for r in funnel_step_latency(df, ["A", "B"]).collect()}
    r = out["1_A->2_B"]
    assert r["n_users"] == 1 and r["min_sec"] == 1  # only user 2

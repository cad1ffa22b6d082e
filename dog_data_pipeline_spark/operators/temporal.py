"""Temporal join operators Spark lacks natively: as-of join and bounded
range self-join (SURVEY §2.3 'not present' extensions; cf. PAPERS.md
"A Scalable and Generic Approach to Range Joins").

Both avoid the naive theta-join blow-up:
- as-of join: union the two sides, one sort per key, carry the last
  right-side row forward — a single shuffle+sort, no range explosion,
  no per-key driver loop. This is the classic sort-merge as-of.
- range self-join: bucketize the time axis at the range width; matching
  pairs can only live in the same or adjacent buckets, so the equi-join
  on (key, bucket) bounds the candidate set, then the exact predicate
  filters. Candidate cost ~ bucket occupancy², not N².
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < when `strict`) per key. Right columns
    arrive null when no prior right row exists (left join semantics).

    Implementation: tag + union both sides, sort within key by (time,
    tag) — right rows sort BEFORE left rows at equal time unless
    `strict`, so ties attach — then last(ignorenulls) over an unbounded
    preceding frame carries right values forward; finally keep left rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lt, rt = F.col(left_time), F.col(right_time)

    r = right.select(
        *keys,
        rt.alias("__t"),
        F.lit(0 if not strict else 2).alias("__side"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_values],
    )
    l = left.select(
        "*",
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r.schema[f"__rv_{c}"].dataType).alias(f"__rv_{c}") for c in right_values],
    )
    unioned = l.unionByName(r.select(*keys, "__t", "__side", *[f"__rv_{c}" for c in right_values]), allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_values
        ],
    )
    drop = ["__t", "__side"] + [f"__rv_{c}" for c in right_values]
    return carried.filter(F.col("__side") == 1).drop(*drop)


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_sec: int | None = None,
    checkpoint_states: bool = True,
) -> DataFrame:
    """Ordered-funnel analysis: for each user, did the event types in
    ``steps`` occur in sequence (each step strictly after the previous
    one, optionally all within ``within_sec`` of the first step)?
    Returns one row per step: (step_idx, step_name, n_users,
    conversion_rate) where conversion_rate is users-at-step /
    users-at-step-1, rounded to 4 decimals.

    Implementation is the RELATIONAL min-chain, not a per-user ordered
    collect: step 1 state is min(ts) over the step-1 events (one
    partial-aggregated shuffle keyed on user); each later step k joins
    the step-k events against the |users|-row state on user and takes
    min(ts) with ts strictly after t_{k-1} (and inside the window).
    len(steps)-1 user-keyed hash joins of event-subset vs |users|-row
    state — no unbounded collect_list, no single-task per-user sort, so
    a power user with 10^8 events costs the same as anyone else at
    100 TB. (The classic window-function funnel needs the full per-user
    event sequence in one sorted partition; the min-chain needs only
    the running timestamp.)
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    ts = F.unix_timestamp(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), ts.alias("t")
    )
    # step-1 state: first occurrence per user
    state = (
        base.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_prev"))
        .withColumn("t_first", F.col("t_prev"))
    )
    counts = [("1_" + steps[0], state)]
    for k, step in enumerate(steps[1:], start=2):
        # both sides derive from `base` — rename the state columns so the
        # self-join is unambiguous
        st = state.select(
            F.col("u").alias("__su"),
            F.col("t_prev").alias("__tp"),
            F.col("t_first").alias("__tf"),
        )
        ev_k = base.filter(F.col("et") == step)
        cond = (F.col("u") == F.col("__su")) & (F.col("t") > F.col("__tp"))
        if within_sec is not None:
            cond = cond & (F.col("t") <= F.col("__tf") + within_sec)
        state = (
            ev_k.join(st, cond)
            .groupBy(F.col("__su").alias("u"))
            .agg(
                F.min("t").alias("t_prev"),
                F.min("__tf").alias("t_first"),
            )
        )
        if checkpoint_states:
            # checkpoint each step's |users|-row state lazily: the
            # per-step count branches below otherwise re-execute the
            # whole join-chain prefix (step k re-runs all k-1 upstream
            # joins — O(K^2) subplan executions in one action); the
            # first action materializes each state once for all its
            # consumers. checkpoint_states=False keeps the full lineage
            # visible for plan-shape inspection (tests/test_plans.py).
            state = state.localCheckpoint(eager=False)
        counts.append((f"{k}_{step}", state))
    per_step = None
    for name, st in counts:
        row = st.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("step"), "n_users"
        )
        per_step = row if per_step is None else per_step.unionByName(row)
    # denominator rides a 1-row broadcast, not a global window (a
    # partitionless window would drag the — tiny — step table through a
    # single-partition WindowExec and warn on every run)
    base = per_step.filter(F.col("step").startswith("1_")).select(
        F.col("n_users").alias("__base")
    )
    return per_step.crossJoin(F.broadcast(base)).select(
        "step",
        "n_users",
        # try_divide: an empty step 1 (no user fired the first event)
        # must report (0, null) rows, not crash — ANSI mode makes a
        # plain 0/0 raise DIVIDE_BY_ZERO
        F.round(F.try_divide(F.col("n_users"), F.col("__base")), 4).alias(
            "conversion_rate"
        ),
    )


def range_self_join_pairs(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    id_col: str,
    max_delta_sec: int,
) -> DataFrame:
    """All pairs (a, b) within the same key group with
    0 < t_b - t_a <= max_delta_sec and id_a < id_b ordering by time.

    Bucketize at max_delta_sec: a qualifying pair's buckets differ by at
    most 1, so the left side probes buckets {b, b+1} (explode) and an
    equi-join on (keys, bucket) bounds candidates before the exact
    range predicate.
    """
    t = F.unix_timestamp(F.col(time_col))
    bucket = F.floor(t / max_delta_sec)
    base = df.select(
        *keys, F.col(id_col).alias("id"), t.alias("t"), bucket.alias("b")
    )
    a = base.select(
        *keys,
        F.col("id").alias("id_a"),
        F.col("t").alias("t_a"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("b"),
    )
    bb = base.select(
        *keys, F.col("id").alias("id_b"), F.col("t").alias("t_b"), "b"
    )
    return (
        a.join(bb, [*keys, "b"])
        .filter(
            (F.col("t_b") > F.col("t_a"))
            & (F.col("t_b") - F.col("t_a") <= max_delta_sec)
        )
        .select(*keys, "id_a", "id_b", (F.col("t_b") - F.col("t_a")).alias("delta_sec"))
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_sec: int = 604800,
) -> DataFrame:
    """Cohort retention analysis: group users by first-activity bucket
    (epoch weeks by default — integer bucket arithmetic, no calendar
    week-start disagreements between engines), then measure what
    fraction of each cohort is active k buckets later.

    Returns (cohort_wk, week_offset, n_active, retention_rate[4dp]).

    Scale shape: cohorts = one partial-aggregated min per user
    (|users| rows); activity = distinct (user, bucket) pairs (bounded
    by |users| x active-buckets, partial-aggregated); one user-keyed
    hash join between the two + a final (cohort, offset) fold. No
    windows, no per-user sequence materialization.
    """
    t = F.unix_timestamp(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("u"), F.floor(t / bucket_sec).alias("wk")
    )
    cohorts = base.groupBy("u").agg(F.min("wk").alias("cohort_wk"))
    activity = base.distinct()
    joined = activity.join(cohorts, "u").select(
        "u", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
    )
    per_cell = joined.groupBy("cohort_wk", "week_offset").agg(
        F.countDistinct("u").alias("n_active")
    )
    sizes = cohorts.groupBy("cohort_wk").agg(
        F.countDistinct("u").alias("__size")
    )
    return per_cell.join(F.broadcast(sizes), "cohort_wk").select(
        "cohort_wk",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("__size"), 4).alias("retention_rate"),
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    top_k: int = 20,
) -> DataFrame:
    """Top event-to-event transition pairs (the first-order Markov view
    of user journeys): per user, consecutive events ordered by
    (ts, id) — the id tiebreak makes the sequence fully deterministic —
    counted per (from, to) pair, top-k by (count desc, pair asc).

    Scale shape: ONE window pass partitioned by user (each user's
    history sorts within its own partition — no global or
    single-partition sort), a partial-aggregated pair count, and a
    TakeOrdered top-k. A power user costs one fat partition at worst;
    salt the window key by session if that ever binds.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.col("n_transitions").desc(), "from_type", "to_type")
        .limit(top_k)
    )


def decayed_engagement(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_sec: int = 604800,
    top_k: int | None = None,
) -> DataFrame:
    """Recency-weighted engagement score per user: each event
    contributes value halved once per whole half-life of age. The score
    is computed ENTIRELY in integer centi-units — value snapped to
    centi-units, then arithmetic-right-shifted by the age in half-lives
    (floor division by 2^n) — so every per-event weight and the final
    sum are exact integers, bit-identical cross-engine (a float decay
    sum's last-ulp ordering differences flip the 4th decimal and break
    the value-hash oracle; measured, not hypothetical). The shift is
    capped at 62 half-lives (beyond that the contribution is 0 anyway,
    and 2^n stays a finite double); dividing an integer by 2^n in IEEE
    doubles is EXACT (only the exponent changes), so the floor is never
    off-by-one. Nonnegative values only (floor division semantics).

    Returns (user_col, n_events, engagement_c) — engagement in
    centi-units; top_k keeps the top users by (engagement desc, user
    asc) via TakeOrdered.

    Scale shape: t_max is a 1-row broadcast; the decay weight is a
    map-only expression; one partial-aggregated per-user fold.
    """
    t = F.unix_timestamp(F.col(ts_col))
    tmax = events.agg(F.max(t).alias("__tmax"))
    age = F.least(
        F.floor((F.col("__tmax") - t) / halflife_sec), F.lit(62)
    ).cast("int")
    micro = F.round(F.col(value_col) * 100).cast("long")
    weighted = events.crossJoin(F.broadcast(tmax)).select(
        F.col(user_col),
        F.floor(micro / F.pow(F.lit(2.0), age)).cast("long").alias("__w"),
    )
    out = weighted.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__w").cast("long").alias("engagement_c"),
    )
    if top_k is not None:
        out = out.orderBy(F.col("engagement_c").desc(), user_col).limit(top_k)
    return out


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Duration-weighted mean of a step-function metric per key — the
    TWAP shape (a reading holds its value until the next reading, so a
    plain avg over-weights bursts of closely-spaced events):

        twap(k) = sum_i v_i * (t_{i+1} - t_i) / (t_last - t_first)

    The last event of each key carries no duration and drops out;
    keys with fewer than 2 events (zero total span) are omitted —
    there is no interval to average over.

    Returns (key, n_events, span_seconds, twap, plain_avg) so the
    caller sees both the duration-weighted and naive means (their gap
    is the burstiness signal).

    Scale shape: one shuffle (window partition on the key), then the
    groupBy on the same key rides the existing HashPartitioning —
    Catalyst inserts no second exchange. Durations are integer epoch
    seconds; the weighted sum is double and carries the usual ulp-
    order noise, which sits far below any reporting precision.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    dur = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col(ts_col))).alias(
        "__dur"
    )
    steps = df.select(
        F.col(key_col),
        F.col(value_col).alias("__v"),
        dur,
    ).filter(F.col("__dur").isNotNull())
    agg = steps.groupBy(key_col).agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("n_events"),
        F.sum("__dur").alias("span_seconds"),
        F.sum(F.col("__v") * F.col("__dur")).alias("__wsum"),
        F.avg("__v").alias("__pavg"),
    )
    return agg.filter(F.col("span_seconds") > 0).select(
        key_col,
        "n_events",
        "span_seconds",
        F.try_divide(F.col("__wsum"), F.col("span_seconds").cast("double")).alias(
            "twap"
        ),
        F.col("__pavg").alias("plain_avg"),
    )


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    tiebreak_cols: Sequence[str] = (),
    direct_label: str = "direct",
) -> DataFrame:
    """Last-touch conversion attribution: credit each conversion's value
    to the nearest PRECEDING non-conversion event of the same user
    (the touchpoint "channel"); conversions with no preceding
    touchpoint fall to ``direct_label``.

    Returns one row per channel: n_conversions, attributed_value and
    conversion_share — the standard marketing/product-analytics
    rollup, and the same carry-forward window shape as gap-filling
    (last_value IGNORE NULLS over an unbounded-preceding frame).

    Scale shape: one shuffle on the user key for the carry-forward
    window; the channel rollup then shuffles |channels| partial rows
    per task (channel cardinality is the event-type vocabulary, tiny);
    the share denominator rides as a 1-row broadcast.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col) != F.lit(conversion_type), F.col(type_col)
    )
    channel = F.last(touch, ignorenulls=True).over(w)
    conv = (
        df.withColumn("__ch", channel)
        .filter(F.col(type_col) == F.lit(conversion_type))
        .select(
            F.coalesce(F.col("__ch"), F.lit(direct_label)).alias("channel"),
            F.col(value_col).alias("__v"),
        )
    )
    total = conv.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    agg = conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("__v").alias("attributed_value"),
    )
    return agg.crossJoin(F.broadcast(total)).select(
        "channel",
        "n_conversions",
        "attributed_value",
        (F.col("n_conversions") / F.col("__n")).alias("conversion_share"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
    extra_condition=None,
) -> DataFrame:
    """Overlap join between two interval tables WITHOUT a cartesian
    product: pair every (left, right) row whose half-open intervals
    intersect (``l_start < r_end AND r_start < l_end``), start/end
    given as integer epoch seconds.

    A naive inequality join is O(|L|·|R|); the scale path is the
    standard coarse-bucket decomposition: each interval explodes into
    the fixed-width time buckets it covers, candidates equi-join on
    the bucket id (a plain hash shuffle), and the exact overlap
    predicate filters the survivors. A pair that shares several
    buckets would match several times, so the join keeps only the
    FIRST shared bucket — ``bucket == greatest(floor(l_start/B),
    floor(r_start/B))`` — which makes every overlapping pair appear
    exactly once with NO distinct/dedup shuffle afterwards.

    ``bucket_seconds`` trades fan-out for candidate precision: size it
    near the typical interval length (an interval explodes into
    ~len/B + 1 rows). ``extra_condition`` (a Column) is applied after
    the bucket join — e.g. ``F.col("user_a") < F.col("user_b")``.

    Returns all left columns + all right columns plus
    ``overlap_seconds`` (integer, exact).
    """
    B = int(bucket_seconds)

    def buckets(s: str, e: str):
        lo = F.floor(F.col(s) / B)
        # half-open end: an interval ending exactly on a boundary does
        # not reach into the next bucket (guard degenerate s >= e too —
        # sequence() would DESCEND and fabricate buckets)
        hi = F.greatest(F.floor((F.col(e) - 1) / B), lo)
        return F.explode(F.sequence(lo, hi))

    lb = left.withColumn("__bucket", buckets(l_start, l_end))
    rb = right.withColumn("__bucket", buckets(r_start, r_end))
    joined = lb.join(rb, "__bucket")
    first_shared = F.greatest(
        F.floor(F.col(l_start) / B), F.floor(F.col(r_start) / B)
    )
    out = joined.filter(
        (F.col("__bucket") == first_shared)
        & (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end))
        # a zero-length interval is the empty set: it intersects
        # nothing, even when its point lies inside the other interval
        & (F.col(l_start) < F.col(l_end))
        & (F.col(r_start) < F.col(r_end))
    )
    if extra_condition is not None:
        out = out.filter(extra_condition)
    overlap = F.least(F.col(l_end), F.col(r_end)) - F.greatest(
        F.col(l_start), F.col(r_start)
    )
    return out.drop("__bucket").withColumn("overlap_seconds", overlap)


def funnel_step_latency(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    checkpoint_states: bool = True,
) -> DataFrame:
    """Step-to-step conversion latency for an ordered funnel: for every
    adjacent step pair (k-1 -> k), the distribution of seconds users
    took to advance — the "where does the funnel stall" companion to
    funnel_steps' "where does it leak".

    Returns one row per transition: (transition, n_users, min_sec,
    median_sec, p90_sec, max_sec). Percentiles are EXACT discrete
    order statistics (median = element at ceil(n/2), p90 at
    ceil(0.9n), computed with integer-only rank positions — never
    float-scaled, so ceil(0.9*10) can't round to 10 via 9.000000...2),
    deterministic under ties (secondary order: user id).

    Scale shape: the same relational min-chain as funnel_steps (each
    step joins its event subset against the |users|-row running state
    — no per-user collect, no power-user hot key). The rank selection
    sorts each transition's latencies in that transition's window
    partition: bounded by CONVERTED users of that step, a set that is
    usually orders of magnitude smaller than the event table. For
    funnels converting 10^9+ users swap the exact selection for a
    quantile sketch (quantile_sketch_bounds family).
    """
    if len(steps) < 2:
        raise ValueError("step latency needs at least two steps")
    ts = F.unix_timestamp(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), ts.alias("t")
    )
    state = (
        base.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_cur"))
    )
    lat = None
    for k, step in enumerate(steps[1:], start=2):
        st = state.select(
            F.col("u").alias("__su"), F.col("t_cur").alias("__tp")
        )
        ev_k = base.filter(F.col("et") == step)
        state = (
            ev_k.join(
                st,
                (F.col("u") == F.col("__su")) & (F.col("t") > F.col("__tp")),
            )
            .groupBy("u")
            .agg(F.min("t").alias("t_cur"), F.min("__tp").alias("t_prev"))
        )
        if checkpoint_states:
            # each state feeds the next join AND its latency branch —
            # same O(K^2) re-execution hazard as funnel_steps
            state = state.localCheckpoint(eager=False)
        name = f"{k - 1}_{steps[k - 2]}->{k}_{step}"
        deltas = state.select(
            F.lit(name).alias("transition"),
            F.col("u"),
            (F.col("t_cur") - F.col("t_prev")).alias("delta"),
        )
        lat = deltas if lat is None else lat.unionByName(deltas)
        state = state.drop("t_prev")
    w = Window.partitionBy("transition").orderBy("delta", "u")
    wn = Window.partitionBy("transition")
    ranked = lat.select(
        "transition",
        "delta",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    median_pos = F.floor((F.col("__n") + 1) / 2)
    p90_pos = F.floor((F.col("__n") * 9 + 9) / 10)
    return ranked.groupBy("transition").agg(
        F.max("__n").alias("n_users"),
        F.min("delta").alias("min_sec"),
        F.max(F.when(F.col("__r") == median_pos, F.col("delta"))).alias(
            "median_sec"
        ),
        F.max(F.when(F.col("__r") == p90_pos, F.col("delta"))).alias(
            "p90_sec"
        ),
        F.max("delta").alias("max_sec"),
    )

"""Deterministic, engine-portable sampling and dataset splitting.

A training-data pipeline needs samples and train/val/test splits that
are (a) reproducible run-to-run, (b) independent of partitioning and
cluster size, and (c) recomputable by OTHER engines (the labeling team
runs DuckDB, the trainer reads the split manifest in pandas). Spark's
``df.sample``/``sampleBy`` fail (b) and (c): they seed per-partition
RNGs, so the selected set changes with the partition layout.

The scheme here hashes a stable key per row and compares the first 8
hex digits of its md5 against a threshold string:

    keep  ⇔  substr(md5(key || ':' || salt), 1, 8) < hex(fraction·16⁸)

Everything is pure column expressions on functions every SQL engine
spells identically (md5 → lowercase hex, substring, string ``<``), so
the exact same rows are selected by Spark, DuckDB, pandas, or a bash
one-liner — and the decision is per-row, embarrassingly parallel, no
shuffle, no RNG state. Changing ``salt`` draws an independent sample;
the split assignment is a total function of (key, salt), so late-
arriving rows land in stable splits (critical for dedup-then-split
pipelines: re-runs must not migrate documents between train and test).

Accuracy: md5's first 32 bits are uniform, so realized fractions
concentrate within O(1/√n) of the target — exact-count sampling at
scale would need a global sort; this trades ±√n rows for zero shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # buckets addressed by the first 8 md5 hex digits


def _bucket_hex(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — stable across
    runs, partitionings, and engines (see module docstring)."""
    return df.filter(_bucket_hex(F.col(key_col), salt) < _threshold_hex(fraction))


def with_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by cumulative hash thresholds.

    ``weights`` must sum to 1 (±1e-9); the last split absorbs the hex
    rounding remainder so no row is unassigned.
    """
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    bucket = _bucket_hex(F.col(key_col), salt)
    cumulative = 0.0
    expr: Column | None = None
    for name, w in weights[:-1]:
        cumulative += w
        cond = bucket < _threshold_hex(cumulative)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` shape, made
    partition-invariant and engine-portable): each stratum gets its own
    hash threshold, strata absent from ``fractions`` keep ``default``.

    The canonical training-data use is rebalancing a corpus — e.g.
    downsample the dominant language to a target mix — while keeping
    the selection reproducible for audits and incremental re-runs.
    Still a single per-row expression: no shuffle, no per-stratum scan.
    """
    bucket = _bucket_hex(F.col(key_col), salt)
    threshold: Column = F.lit(_threshold_hex(default))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budget: float,
    salt: str = "",
) -> DataFrame:
    """Keep ≈``budget`` tokens per stratum ("1B tokens per domain", the
    mixture-building step of a pretraining run).

    The naive form — per-stratum cumulative-sum window, cut at the
    budget — sorts each stratum in ONE task (the low-cardinality-
    partition straggler/OOM shape). Instead, two cheap passes:

    1. aggregate per-stratum token totals (tiny: |strata| rows);
    2. per-stratum keep fraction = min(1, budget/total), converted to
       an md5 threshold IN the plan (hex/lpad column expressions, no
       driver round-trip) and broadcast-joined back; the filter is then
       the usual per-row deterministic-sampling predicate.

    Realized token mass concentrates within O(√total) of the budget —
    the zero-shuffle trade the module docstring describes, applied
    per stratum. Selection stays stable under re-runs and engine
    changes because the threshold is a pure function of the aggregate.
    """
    totals = df.groupBy(strata_col).agg(F.sum(tokens_col).alias("__total"))
    frac = F.least(F.lit(1.0), F.lit(float(budget)) / F.col("__total"))
    thr = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(frac * F.lit(float(_HEX_SPACE))).cast("bigint"),
                    F.lit(_HEX_SPACE - 1),
                )
            ),
            8,
            "0",
        )
    )
    thresholds = totals.select(F.col(strata_col), thr.alias("__thr"))
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(_bucket_hex(F.col(key_col), salt) < F.col("__thr"))
        .drop("__thr")
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: probability-
    proportional-to-size via sequential Poisson sampling (Ohlsson 1998,
    the order-sampling scheme Statistics Sweden runs in production) —
    rank every row by priority = u / w and keep the k smallest.

    u is the usual md5-derived uniform, made NUMERIC: the first 8 hex
    digits as an integer i, u = (i + 0.5) / 16^8. Unlike exponential-
    key reservoir schemes (Efraimidis-Spirakis needs ln(u)), the
    priority uses ONLY +, /, < — IEEE-exact operations that libm cannot
    perturb — so Spark, DuckDB, and pandas select the IDENTICAL k rows
    (same engine-portability contract as the module's threshold
    sampling; ln/exp are not bit-reproducible across engines).

    Plan shape: one map-only projection + TakeOrdered(k) (per-partition
    heap + driver merge — no global sort, no shuffle of the corpus).
    Ties are broken by key for full determinism. Weights must be > 0.

    Returns the sampled rows with ``priority_col`` attached.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hx = _bucket_hex(F.col(key_col), salt)
    u = (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(_HEX_SPACE))
    w = F.col(weight_col).cast("double")
    # Fail fast on zero/negative/NULL weights instead of letting inf/NaN/
    # NULL priorities silently distort the top-k (NaN sorts last in both
    # engines, masking the bad rows). raise_error rides inside the same
    # map-only projection — no extra pass.
    w_checked = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_priority_sample: non-positive/NULL {weight_col}="),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
                F.lit(f" at {key_col}="),
                F.col(key_col).cast("string"),
            )
        ).cast("double")
    )
    pri = u / w_checked
    return (
        df.withColumn(priority_col, pri)
        .orderBy(F.col(priority_col), F.col(key_col))
        .limit(k)
    )


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: the split hash is computed on each document's
    DUPLICATE-CLUSTER representative, not on the document itself, so
    every member of a near-dup cluster lands in the same split. Docs
    with no duplicate keep their own key (identical to with_split).

    ``dup_pairs``: (id_a, id_b) edges from any pair detector
    (jaccard/minhash/simhash/embedding/semantic). Cluster resolution
    reuses connected_components; the label join is the only extra
    shuffle over plain with_split.
    """
    from dog_data_pipeline_spark.operators.clustering import connected_components

    labels = connected_components(dup_pairs).withColumnRenamed("id", key_col)
    joined = docs.join(labels, key_col, "left")
    keyed = joined.withColumn(
        "__split_key", F.coalesce(F.col("cluster"), F.col(key_col))
    )
    out = with_split(keyed, "__split_key", weights, salt, split_col)
    return out.drop("__split_key", "cluster")


def split_leakage_report(
    docs: DataFrame,
    dup_pairs: DataFrame,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> DataFrame:
    """One-row audit quantifying near-duplicate LEAKAGE across a
    train/val/test boundary — the check every split should ship with: a
    near-dup pair straddling train and val inflates eval scores exactly
    like benchmark contamination does, from inside the corpus.

    Measures the same ``dup_pairs`` edge set against BOTH assignments:
    the naive per-document ``with_split`` (whose leak count is the
    finding) and ``leakage_safe_split`` (whose leak count the report
    certifies is zero — cluster-keyed hashing cannot separate a dup
    pair). Returns (n_dup_pairs, plain_leaked_pairs, plain_leak_rate,
    safe_split_zero_leaks).

    Scale shape: two |pairs|-row joins against |docs|-row assignment
    projections, each reduced by partial aggregation to one row before
    the final 1x1 broadcast combine. No corpus-vs-corpus work beyond
    what produced ``dup_pairs``.
    """
    plain = with_split(docs.select(key_col), key_col, weights, salt)
    safe = leakage_safe_split(
        docs.select(key_col), dup_pairs, key_col, weights, salt
    )

    def _leak_counts(assign: DataFrame, out: str) -> DataFrame:
        a = assign.select(
            F.col(key_col).alias("id_a"), F.col("split").alias("__sa")
        )
        b = assign.select(
            F.col(key_col).alias("id_b"), F.col("split").alias("__sb")
        )
        return (
            dup_pairs.select("id_a", "id_b")
            .join(a, "id_a")
            .join(b, "id_b")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum((F.col("__sa") != F.col("__sb")).cast("long")).alias(out),
            )
        )

    pl = _leak_counts(plain, "plain_leaked_pairs")
    sf = _leak_counts(safe, "__safe_leaked").select("__safe_leaked")
    # coalesce + try_divide: a duplicate-FREE corpus (the healthy case
    # this audit certifies) aggregates zero pair rows — sum() is NULL
    # and a plain divide is 0/0; the report must read (0, 0, null,
    # TRUE), not a row of NULLs a downstream assert silently passes over
    return (
        pl.crossJoin(F.broadcast(sf))
        .select(
            F.col("__n").alias("n_dup_pairs"),
            F.coalesce("plain_leaked_pairs", F.lit(0)).alias(
                "plain_leaked_pairs"
            ),
            F.round(
                F.try_divide(F.coalesce("plain_leaked_pairs", F.lit(0)), F.col("__n")),
                4,
            ).alias("plain_leak_rate"),
            (F.coalesce("__safe_leaked", F.lit(0)) == 0).alias(
                "safe_split_zero_leaks"
            ),
        )
    )


def split_sql_case(
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> str:
    """The same split assignment as ANSI SQL (usable verbatim in DuckDB
    /Postgres/Trino) — the portability contract, used by the oracle."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = f"substring(md5(CAST({key_col} AS VARCHAR) || ':{salt}'), 1, 8)"
    arms = []
    cumulative = 0.0
    for name, w in list(weights)[:-1]:
        cumulative += w
        arms.append(f"WHEN {bucket} < '{_threshold_hex(cumulative)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{weights[-1][0]}' END"


def source_cap_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    cap: int,
    salt: str = "",
    keep_col: str = "kept",
) -> DataFrame:
    """Cap every source (domain) at ``cap`` documents, the RefinedWeb /
    Common-Crawl curation move against SEO farms and mirror sites: one
    domain must not dominate the corpus no matter how many pages it has.

    Which ``cap`` docs survive is decided by md5-bucket rank (tie-break
    on the key), so the selection is uniform-at-random yet reproducible
    across runs, partitionings, and engines — late-arriving pages from
    an already-capped domain displace nothing (their hash rank decides,
    not arrival order). Adds ``keep_col``; filtering is the caller's
    one-liner so the drop report stays writable from the same frame.

    Scale shape: one row_number window partitioned by source. Web corpora
    have millions of domains, so the window parallelizes wide; the
    straggler bound is the hottest domain's page count (tens of millions
    of rows through one task's sort — heavy but feasible). For a corpus
    whose hottest domain outweighs an executor, pre-thin with the
    zero-shuffle fraction threshold (``stratified_sample`` with
    fraction ~= k*cap/est_count) and rank only survivors.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(source_col)
        .orderBy(_bucket_hex(F.col(key_col), salt), F.col(key_col))
    )
    return df.withColumn(keep_col, F.row_number().over(w) <= cap)


def quality_quota_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    score_col: str,
    cap: int,
    keep_col: str = "kept",
) -> DataFrame:
    """Per-source QUALITY quota: keep each source's ``cap``
    BEST-scoring documents — the curation complement of
    ``source_cap_sample`` (which selects uniformly). This is the
    per-domain shape real pipelines run after classifier scoring
    (FineWeb/DCLM-style: score everything, then take each domain's
    best k so no domain dominates AND what survives is its best
    material, not a uniform draw).

    Deterministic: rank orders by (score desc, key asc) so equal
    scores resolve identically across runs/partitionings/engines.
    Adds ``keep_col``; filtering stays the caller's one-liner so the
    drop report is writable from the same frame.

    Scale shape: identical to ``source_cap_sample`` — one row_number
    window partitioned by source; millions of domains parallelize
    wide, the straggler bound is the hottest domain. Pre-thin a
    pathological domain with a score-threshold filter (scores are
    map-only) before ranking if one source outweighs an executor.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.col(score_col).desc(), F.col(key_col)
    )
    return df.withColumn(keep_col, F.row_number().over(w) <= cap)


def mixture_weights(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    alpha: float = 0.5,
    budget_tokens: float | None = None,
) -> DataFrame:
    """Temperature-based data-mixing plan: per-source sampling weights
    w_s proportional to (token mass)^alpha — the multilingual/multi-source
    rebalancing rule (alpha=1 is proportional/no rebalance, alpha=0 is
    uniform across sources, alpha~0.3-0.7 up-weights the tail the way
    multilingual pretraining runs do).

    Returns one row per source: n_docs, n_tokens, weight (normalized to
    sum 1), and — when ``budget_tokens`` is given — the token allocation
    and the implied epochs over that source (allocation / n_tokens;
    epochs > 1 means up-sampling / repetition, the quantity the
    repetition-penalty literature says to watch).

    Scale shape: one partial-aggregated groupBy to |sources| rows, then
    a broadcast of the 1-row total back over them — nothing corpus-sized
    moves, and the output is the tiny control table a mixture sampler
    (``stratified_sample`` / ``token_budget_sample``) consumes.
    """
    per_src = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("double").alias("n_tokens"),
    )
    # alpha = 0.5 routes through sqrt: IEEE-754 requires sqrt correctly
    # rounded (bit-identical across engines), libm pow is not — this is
    # what lets the registry oracle hash-match the weights
    if alpha == 0.5:
        raw = F.sqrt(F.col("n_tokens"))
    else:
        raw = F.pow(F.col("n_tokens"), F.lit(float(alpha)))
    with_raw = per_src.withColumn("__raw", raw)
    total = with_raw.agg(F.sum("__raw").alias("__total"))
    out = with_raw.crossJoin(F.broadcast(total)).withColumn(
        "weight", F.col("__raw") / F.col("__total")
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "alloc_tokens", F.col("weight") * F.lit(float(budget_tokens))
        ).withColumn("epochs", F.col("alloc_tokens") / F.col("n_tokens"))
    return out.drop("__raw", "__total")


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    tokens_col: str,
    alpha: float = 0.5,
    budget_tokens: float = 1e6,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture SELECTION, entirely in-plan: keep each
    source's share of a token budget with probability derived from
    w_s ∝ (token mass)^alpha — ``mixture_weights``' plan, applied as a
    deterministic sample in the same job, no driver round-trip.

    frac_s = min(1, alpha_weighted_alloc_s / tokens_s); rows keep via
    the module's md5-threshold predicate, so selection is reproducible
    across runs, engines, and partitionings. Down-sampling only:
    sources whose allocation EXCEEDS their token mass (epochs > 1)
    keep everything here — up-sampling is repetition, which belongs to
    the training data loader; ``mixture_weights`` reports the epochs to
    configure it.

    Scale shape: one |sources|-row partial agg, a broadcast 1-row
    total, a broadcast threshold join back — the corpus itself never
    shuffles (same contract as ``token_budget_sample``, with the
    temperature reweighting composed in).
    """
    totals = df.groupBy(source_col).agg(
        F.sum(tokens_col).cast("double").alias("__tok")
    )
    # sqrt for alpha=0.5: IEEE-correctly-rounded, engine-exact (pow is not)
    w = (
        F.sqrt(F.col("__tok"))
        if alpha == 0.5
        else F.pow(F.col("__tok"), F.lit(float(alpha)))
    )
    with_w = totals.withColumn("__w", w)
    tot = with_w.agg(F.sum("__w").alias("__tot"))
    frac = F.least(
        F.lit(1.0),
        F.col("__w") / F.col("__tot") * F.lit(float(budget_tokens)) / F.col("__tok"),
    )
    thr = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(frac * F.lit(float(_HEX_SPACE))).cast("bigint"),
                    F.lit(_HEX_SPACE - 1),
                )
            ),
            8,
            "0",
        )
    )
    thresholds = with_w.crossJoin(F.broadcast(tot)).select(
        F.col(source_col), thr.alias("__thr")
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(_bucket_hex(F.col(key_col), salt) < F.col("__thr"))
        .drop("__thr")
    )


def mixture_upsample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    tokens_col: str,
    alpha: float = 0.5,
    budget_tokens: float = 1e6,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """The temperature mixture applied WITH repetition — the epochs>1
    half that ``mixture_sample`` delegates to the trainer, materialized
    deterministically when the pipeline (not the data loader) must own
    the final layout.

    Per source s with allocation alloc_s = w_s/W * budget and token
    mass tok_s, epochs_s = alloc_s / tok_s: every row is emitted
    floor(epochs_s) times, plus ONE more copy iff its md5 bucket falls
    under the fractional remainder — so each source's expected emitted
    token mass equals its allocation exactly, and the layout is
    reproducible across runs, engines, and partitionings (no RNG
    state). Rows carry a 0-based ``epoch`` index so the trainer can
    de-interleave repetitions.

    Scale shape: one |sources|-row partial agg, a broadcast 1-row
    total, broadcast (full_epochs, fractional threshold) joined back,
    then an in-plan sequence explode — per-row fan-out is bounded by
    ceil(epochs_s), the corpus never shuffles, and output volume IS the
    allocation (there is no cheaper way to materialize repetition).
    """
    totals = df.groupBy(source_col).agg(
        F.sum(tokens_col).cast("double").alias("__tok")
    )
    w = (
        F.sqrt(F.col("__tok"))
        if alpha == 0.5
        else F.pow(F.col("__tok"), F.lit(float(alpha)))
    )
    with_w = totals.withColumn("__w", w)
    tot = with_w.agg(F.sum("__w").alias("__tot"))
    epochs = F.col("__w") / F.col("__tot") * F.lit(float(budget_tokens)) / F.col("__tok")
    full = F.floor(epochs).cast("int")
    frac = epochs - F.floor(epochs)
    thr = F.lower(
        F.lpad(
            F.hex(
                F.least(
                    F.floor(frac * F.lit(float(_HEX_SPACE))).cast("bigint"),
                    F.lit(_HEX_SPACE - 1),
                )
            ),
            8,
            "0",
        )
    )
    thresholds = with_w.crossJoin(F.broadcast(tot)).select(
        F.col(source_col), full.alias("__full"), thr.alias("__thr")
    )
    n_copies = F.col("__full") + F.when(
        _bucket_hex(F.col(key_col), salt) < F.col("__thr"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(thresholds), source_col)
        .withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__full", "__thr", "__n")
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every doc by
    how much likelier its hashed n-gram features are under the TARGET
    distribution than under the RAW corpus distribution —
    log w(doc) = sum over gram occurrences of ln p_target(b) / p_raw(b).

    Features are word unigrams + bigrams hashed into ``n_buckets`` via
    md5 (engine-portable: the oracle replays the identical hash and
    bucket arithmetic). Both feature distributions are Laplace-smoothed
    bucket unigram models learned in ONE partial-aggregated pass over
    the exploded grams — the target counts ride beside the raw counts
    as a conditional sum, so adding the target model is free. The
    n_buckets-row log-ratio table gets its two totals from a 1-row
    broadcast and is itself BROADCAST back onto the (doc, bucket)
    occurrences; the per-doc sum is another partial aggregate keyed on
    the doc id. Scale shape: two passes over the corpus text (count,
    score), shuffles carry only (bucket) and (id) keyed partials —
    never document text; at 100 TB the bucket model is KB-sized
    regardless of corpus size. ``target_col`` is a boolean column
    marking rows of the target domain (the paper's formulation with
    target == a held-out corpus is the same math with is_target=false
    everywhere in df and the target corpus unioned in).

    Returns (id_col, n_grams, log_w); docs whose text yields zero grams
    drop out (whitespace-only text is the only way there under the
    ASCII tokenizer).
    """
    from dog_data_pipeline_spark.operators.dedup import _spread
    from dog_data_pipeline_spark.operators.text import tokens, word_ngrams

    toks = tokens(F.col(text_col))
    grams = F.concat(toks, word_ngrams(toks, 2))
    # _spread before the explode (the window_fingerprints convention):
    # one small parquet file = one scan task, and the gram explode +
    # bucket hash multiply the scan's work 10-20x — profiled at sf0.1
    # as four 1.3-1.7 s SINGLE-task jobs on a 32-core session.
    occ = _spread(
        df.select(F.col(id_col), F.col(target_col), F.col(text_col))
    ).select(
        F.col(id_col).alias("__id"),
        F.col(target_col).cast("boolean").alias("__is_target"),
        F.explode(grams).alias("__g"),
    ).select(
        "__id",
        "__is_target",
        (
            F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("__bucket"),
    )
    # The n_buckets-row bucket model is EAGERLY materialized
    # (localCheckpoint): `tot` and `lr` both consume `bc`, and the two
    # broadcast subqueries plan independently under AQE, so without the
    # checkpoint the corpus-sized gram explode under `bc` executes once
    # PER consumer (profiled: the count pass ran 2x per scoring, 3
    # corpus text passes total where the docstring promises two). The
    # checkpointed frame is KB-sized at any corpus size; eager (not
    # lazy) per the triangle_stats lesson — concurrent broadcast stages
    # race a lazy checkpoint and each recompute the un-materialized RDD.
    bc = occ.groupBy("__bucket").agg(
        F.sum(F.col("__is_target").cast("long")).alias("__t_cnt"),
        F.count(F.lit(1)).alias("__r_cnt"),
    ).localCheckpoint()
    tot = bc.agg(
        F.sum("__t_cnt").alias("__t_total"), F.sum("__r_cnt").alias("__r_total")
    )
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha * n_buckets))
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "__bucket",
        (
            F.log((F.col("__t_cnt") + a) / (F.col("__t_total") + ab))
            - F.log((F.col("__r_cnt") + a) / (F.col("__r_total") + ab))
        ).alias("__log_ratio"),
    )
    return (
        occ.join(F.broadcast(lr), "__bucket")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__log_ratio").alias("log_w"),
        )
        .select(F.col("__id").alias(id_col), "n_grams", "log_w")
    )


def dsir_resample(
    scored: DataFrame,
    id_col: str,
    k: int,
    log_w_col: str = "log_w",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel-free importance resample of ``k`` rows from DSIR-scored
    docs: exponential order sampling (Efraimidis-Espirakis without-
    replacement PPS) carried out ENTIRELY in log space so the weight
    never has to exp() out of it — priority = ln(u) - log_w, keep the k
    smallest. ln(u) spans ~[-22, 0] for the md5-derived 32-bit uniform,
    so selection is weight-dominated for docs more than a few nats
    apart and noise-tiebroken within that band — exactly the paper's
    "sample, don't argmax" guidance (argmax overselects near-duplicate
    target-looking docs; the noise spreads the draw).

    Plan shape: one map-only projection + TakeOrdered(k) — per-
    partition heaps, driver merge, no global sort. Deterministic for a
    fixed salt (u comes from md5(id:salt), ties break on id).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hx = _bucket_hex(F.col(id_col), salt)
    u = (F.conv(hx, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(_HEX_SPACE))
    pri = F.log(u) - F.col(log_w_col)
    return (
        scored.withColumn("priority", pri)
        .orderBy(F.col("priority"), F.col(id_col))
        .limit(k)
    )

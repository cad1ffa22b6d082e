"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark corpus by shared word n-grams — the standard
train/test-contamination check run before every pretraining job (the
GPT-3 paper's 13-gram filter, PaLM's 8-gram variant; n is a knob here
because the synthetic corpus is short).

Scale shape: the benchmark side is always tiny relative to the corpus
(benchmarks are MBs, the corpus is TBs), so the distinct benchmark
n-gram set is **broadcast** — the corpus side is a map-only explode +
broadcast-hash semi-match + per-doc re-aggregate keyed on doc_id. No
corpus-vs-corpus shuffle, no inverted-index self-join; the only wide
exchange is the per-doc count aggregate, which partial-aggregates
map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.text import tokens, word_ngrams


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document overlap with the benchmark n-gram set.

    Returns one row per corpus document having at least one matching
    n-gram: (id_col, n_ngrams, n_matched, contamination) where
    contamination = matched distinct n-grams / distinct n-grams.

    ``broadcast_benchmark`` should stay True whenever the benchmark fits
    an executor (the normal case); set False only for benchmark sets so
    large the build side would OOM, falling back to a shuffle join.
    """
    from dog_data_pipeline_spark.operators.dedup import _spread

    grams = F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
    # The per-doc total is COUNTED from the exploded rows rather than
    # carried as a size(grams) column: a computed pass-through column
    # cannot live inside the Generate node, so Catalyst would place it
    # in the Project above the explode and re-derive the whole n-gram
    # expression from raw text once per exploded row — measured 16x
    # slower on this query (56s -> 3.5s at sf0.1).
    # Both explodes run behind _spread (the window_fingerprints
    # convention): one small parquet file = one scan task, so without
    # the round-robin repartition the gram explode + broadcast probe —
    # 10-20x the scan's work — runs single-task (profiled at sf0.1:
    # a 1.3 s one-task job on a 32-core session).
    doc_grams = _spread(corpus.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    bench_grams = (
        _spread(benchmark.select(F.col(text_col)))
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams.withColumn("__hit", F.lit(1)), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .withColumn(
            "contamination", F.round(F.col("n_matched") / F.col("n_ngrams"), 4)
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    max_contamination: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents whose contamination exceeds the threshold
    (0.0 = drop on any shared n-gram). Anti-join against the flagged id
    set — the corpus never shuffles; only flagged ids move.

    The filter uses the UNROUNDED ratio (n_matched / n_ngrams), not the
    4-decimal report column: a long document (>~20k distinct n-grams)
    with a handful of benchmark hits rounds to 0.0000 and would slip
    past a rounded comparison — exactly the long-document case a
    13-gram-style filter must catch. The rounded column stays
    report-only."""
    flagged = (
        contamination_report(corpus, benchmark, n=n, id_col=id_col, text_col=text_col)
        .filter(F.col("n_matched") / F.col("n_ngrams") > max_contamination)
        .select(id_col)
    )
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    window_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "md5",
) -> DataFrame:
    """SPAN-level contamination: the exact token ranges of each corpus
    document that reproduce any ``window_tokens``-token run from the
    benchmark, at ARBITRARY offsets — the duplicate-span machinery (Lee
    et al. 2022) pointed across corpora instead of within one. Where
    ``contamination_report`` answers "does this document overlap the
    eval set" (n-gram set overlap), this answers "WHERE, exactly" — the
    prerequisite for surgical scrubbing instead of whole-document drops
    (long documents quoting one eval question should lose the quote,
    not the document).

    Returns (id, span_start, span_end): 1-based inclusive token
    positions in the corpus document; overlapping contaminated windows
    merge into maximal spans.

    Scale shape: the benchmark's distinct window-fingerprint set is
    broadcast (benchmarks are MBs, the corpus TBs); the corpus side is
    the map-only sliding-window fingerprint explode + broadcast
    semi-join + the per-doc gaps-and-islands merge. No corpus-vs-corpus
    shuffle. ``fingerprint`` picks md5 or the Rabin-Karp rolling engine
    exactly as in ``duplicate_spans``.
    """
    from dog_data_pipeline_spark.operators.dedup import (
        merge_positions_to_spans,
        window_fingerprints,
    )

    corpus_wins = window_fingerprints(
        corpus, id_col, text_col, window_tokens, fingerprint
    )
    bench_wins = (
        window_fingerprints(benchmark, id_col, text_col, window_tokens, fingerprint)
        .select("h")
        .distinct()
    )
    hits = corpus_wins.join(F.broadcast(bench_wins), "h", "left_semi").select(
        "id", "pos"
    )
    return merge_positions_to_spans(hits, window_tokens)


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING-level contamination: flag corpus items whose vector
    sits within cosine ``threshold`` of any benchmark vector — the
    semantic complement to the n-gram checks above. N-gram overlap
    misses paraphrased eval questions (reworded MMLU items share few
    13-grams with the original); embedding cosine catches them, the
    same shift SemDeDup made for dedup. This is the decontamination
    protocol of e.g. Phi/LLaMA-style reports ("semantic dedup against
    benchmarks").

    Returns one row per corpus vector: (id_col, n_contaminating,
    max_benchmark_cos, is_contaminated). Cosines are rounded to 4
    decimals BEFORE thresholding/maxing — the engine's cross-engine
    determinism contract for float comparisons (see tfidf/bm25).

    Scale shape: benchmark suites are tiny (thousands of rows) next to
    a 100 TB corpus, so the benchmark side is **broadcast** and the
    corpus side is ONE map-only scan — broadcast nested-loop against
    |benchmark| vectors, then a per-id partial aggregate that reduces
    map-side to one row per corpus vector before any exchange. No
    corpus shuffle, no index build. The dot product is the engine's
    sequential double fold (zip_with + aggregate), bit-identical to the
    oracle's list_sum fold. For benchmark sets too big for a broadcast
    nested loop, route through ``similarity.cosine_topk_ivf`` instead
    (probe the corpus index with benchmark vectors).
    """
    from dog_data_pipeline_spark.operators.similarity import _with_norm

    c = _with_norm(corpus, id_col, vec_col, "c")
    b = _with_norm(benchmark, id_col, vec_col, "b")
    dot = F.aggregate(
        F.zip_with("c_v", "b_v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # self-matches (benchmark vectors that are themselves corpus rows)
    # are MASKED to null rather than filtered out: a filter would drop a
    # corpus row whose only benchmark pair is itself from the output
    # entirely, while the contract is one row per corpus vector. Nulls
    # vanish inside count/max, so the aggregate sees only real pairs.
    # A self-match means the SAME RECORD — id equality alone is not
    # enough when corpus and benchmark are distinct datasets that both
    # use 0-based integer ids (bare-id masking would silently null real
    # corpus-vs-benchmark pairs and under-report contamination), so the
    # mask requires id AND vector equality.
    # try_divide: a zero-norm (all-zero) embedding — failed or padded
    # encode rows are common in real vector tables — must yield a null
    # cosine (not contaminating), not an ANSI DIVIDE_BY_ZERO crash
    scored = c.crossJoin(F.broadcast(b)).withColumn(
        "cos",
        F.when(
            (F.col("c_id") != F.col("b_id"))
            | (F.col("c_v") != F.col("b_v")),
            F.round(
                F.try_divide(dot, F.col("c_norm") * F.col("b_norm")), 4
            ),
        ),
    )
    per = scored.groupBy("c_id").agg(
        F.coalesce(
            F.sum((F.col("cos") >= threshold).cast("long")), F.lit(0)
        ).alias("n_contaminating"),
        F.max("cos").alias("max_benchmark_cos"),
    )
    return per.select(
        F.col("c_id").alias(id_col),
        "n_contaminating",
        "max_benchmark_cos",
        (F.col("n_contaminating") > 0).alias("is_contaminated"),
    )


def scrub_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    window_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "clean_text",
    fingerprint: str = "md5",
) -> DataFrame:
    """Surgical benchmark decontamination: rewrite each corpus document
    with every token inside a ``contamination_spans`` span removed —
    keep the document, drop the quoted benchmark material. Adds ``out``
    plus ``n_removed_tokens``; untouched docs pass through verbatim.
    The complement of ``decontaminate`` (which drops whole documents):
    use this when the corpus is precious and contamination is quotation,
    that one when any overlap disqualifies the document."""
    from dog_data_pipeline_spark.operators.dedup import remove_spans

    spans = contamination_spans(
        corpus,
        benchmark,
        window_tokens=window_tokens,
        id_col=id_col,
        text_col=text_col,
        fingerprint=fingerprint,
    )
    return remove_spans(corpus, spans, id_col, text_col, out)

"""End-to-end LLM-corpus curation pipeline: the composed path a user
runs to turn a raw document table into training-ready shards.

    raw docs
      → quality gate        (heuristic score + Gopher repetition,
                             optional classifier score)
      → source caps         (optional: RefinedWeb-style per-domain cap)
      → exact dedup         (normalized-fingerprint, min-id keeps)
      → segment dedup       (optional: C4-style sub-document dedup —
                             survivors' text is rewritten)
      → span dedup          (optional: substring-level duplicate-span
                             removal at arbitrary offsets, Lee et al.)
      → decontamination     (benchmark n-gram overlap, broadcast)
      → mixture selection   (optional: temperature token-budget
                             sample over the surviving sources)
      → chunk               (overlapping context windows)
      → pack                (shard-parallel ~budget-token sequences)
      → sharded export      (deterministic shards + manifest)

Every stage is one of the package's tested operators; this module only
composes them and reports. Stage costs at 100 TB: two map-only passes
(quality, chunking — the classifier gate fuses into the first), one
per-source rank window (caps), one fingerprint aggregate, the segment
winner agg + semi-join when enabled, one broadcast semi-join
(decontamination), one bounded per-shard window (packing), one write.
Nothing quadratic, nothing driver-bound except the benchmark gram set
(MBs by construction). Stage ORDER is deliberate: cheap map-only gates
first (shrink before any shuffle), caps before dedup (a capped-out
page should not win a dedup group against a kept one), segment dedup
after exact dedup (identical docs would otherwise pairwise-race for
segment ownership; the standard exact-first ordering).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    kept: DataFrame       # curated documents
    chunks: DataFrame     # packed chunk rows (shard, bin, position)
    manifest: DataFrame   # export manifest (None if no output path)
    stats: dict           # per-stage row counts


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    max_dup_token_frac: float = 0.7,
    min_classifier_score: float | None = None,
    source_col: str | None = None,
    source_cap: int | None = None,
    segment_dedup_tokens: int | None = None,
    span_dedup_window_tokens: int | None = None,
    contamination_n: int = 5,
    mixture_budget_tokens: float | None = None,
    mixture_alpha: float = 0.5,
    chunk_tokens: int = 32,
    chunk_overlap: int = 8,
    pack_budget: int = 256,
    num_shards: int = 16,
    output_path: str | None = None,
) -> CurationResult:
    """Run the full curation pipeline; see module docstring.

    ``benchmark=None`` skips decontamination. ``output_path=None`` skips
    the export (chunks are still computed lazily — callers can write
    them elsewhere). ``min_classifier_score`` adds the hashed-linear
    classifier to the quality gate (fused into the same map pass);
    ``source_cap`` (with ``source_col``) caps documents per source;
    ``segment_dedup_tokens`` enables C4-style sub-document dedup, which
    REWRITES surviving documents' text to their kept segments;
    ``span_dedup_window_tokens`` additionally removes duplicated
    substrings at ARBITRARY offsets (Lee et al.) — run it after segment
    dedup for passages that straddle segment boundaries. Row counts in
    ``stats`` each materialize one aggregate; they are the pipeline's
    audit trail, not a side effect.
    """
    from dog_data_pipeline_spark.operators.contamination import decontaminate
    from dog_data_pipeline_spark.operators.dedup import exact_dup_groups, segment_dedup
    from dog_data_pipeline_spark.operators.packing import pack_chunks
    from dog_data_pipeline_spark.operators.sampling import source_cap_sample
    from dog_data_pipeline_spark.operators.text import (
        with_chunks,
        with_classifier_score,
        with_quality_score,
        with_repetition_profile,
    )
    from dog_data_pipeline_spark.sources.sharding import write_sharded

    stats: dict = {"input": docs.count()}

    scored = with_repetition_profile(with_quality_score(docs, text_col), text_col)
    gate = (F.col("quality") >= min_quality) & (
        F.col("dup_token_frac") <= max_dup_token_frac
    )
    if min_classifier_score is not None:
        scored = with_classifier_score(scored, text_col)
        gate = gate & (F.col("clf_score") >= min_classifier_score)
    quality_ok = scored.filter(gate).select(*docs.columns)
    stats["after_quality"] = quality_ok.count()

    if source_cap is not None:
        if source_col is None:
            raise ValueError("source_cap requires source_col")
        quality_ok = (
            source_cap_sample(quality_ok, id_col, source_col, source_cap)
            .filter(F.col("kept"))
            .drop("kept")
        )
        stats["after_source_cap"] = quality_ok.count()

    from dog_data_pipeline_spark.operators.text import normalized_text

    groups = exact_dup_groups(quality_ok, id_col, text_col)
    with_fp = quality_ok.withColumn("__fp", F.md5(normalized_text(F.col(text_col))))
    deduped = (
        with_fp.join(groups, with_fp["__fp"] == groups["fingerprint"], "left")
        .filter(F.col("keep_id").isNull() | (F.col(id_col) == F.col("keep_id")))
        .select(*docs.columns)
    )
    stats["after_exact_dedup"] = deduped.count()

    if segment_dedup_tokens is not None:
        seg = segment_dedup(deduped, id_col, text_col, seg_tokens=segment_dedup_tokens)
        other_cols = [c for c in docs.columns if c not in (id_col, text_col)]
        deduped = (
            deduped.drop(text_col)
            .join(
                seg.select(
                    F.col("id").alias(id_col),
                    F.col("kept_text").alias(text_col),
                    "n_kept",
                ),
                id_col,
            )
            .filter(F.col("n_kept") > 0)  # fully-duplicated docs drop out
            .select(id_col, text_col, *other_cols)
        )
        stats["after_segment_dedup"] = deduped.count()

    if span_dedup_window_tokens is not None:
        from dog_data_pipeline_spark.operators.dedup import remove_duplicate_spans

        other_cols = [c for c in docs.columns if c not in (id_col, text_col)]
        deduped = (
            remove_duplicate_spans(
                deduped, id_col, text_col,
                window_tokens=span_dedup_window_tokens,
            )
            .filter(F.length("clean_text") > 0)  # fully-duplicated docs drop
            .drop(text_col)
            .withColumnRenamed("clean_text", text_col)
            .select(id_col, text_col, *other_cols)
        )
        stats["after_span_dedup"] = deduped.count()

    if benchmark is not None:
        cleaned = decontaminate(
            deduped, benchmark, n=contamination_n, id_col=id_col, text_col=text_col
        )
    else:
        cleaned = deduped
    stats["after_decontamination"] = cleaned.count()

    if mixture_budget_tokens is not None:
        # temperature-based mixture selection as the final gate: by now
        # the per-source token masses reflect every upstream drop, so
        # the budget is allocated over what will actually be trained on
        if source_col is None:
            raise ValueError("mixture_budget_tokens requires source_col")
        from dog_data_pipeline_spark.operators.sampling import mixture_sample
        from dog_data_pipeline_spark.operators.text import tokens as _tokens

        cleaned = mixture_sample(
            cleaned.withColumn("__n_toks", F.size(_tokens(F.col(text_col)))),
            id_col,
            source_col,
            "__n_toks",
            alpha=mixture_alpha,
            budget_tokens=mixture_budget_tokens,
            salt="curate-mix",
        ).drop("__n_toks")
        stats["after_mixture"] = cleaned.count()

    chunks = with_chunks(
        cleaned, id_col, text_col, chunk_tokens=chunk_tokens, overlap=chunk_overlap
    )
    packed = pack_chunks(
        chunks, budget=pack_budget, num_shards=num_shards, id_cols=(id_col, "chunk_idx")
    )
    stats["chunks"] = packed.count()

    manifest = None
    if output_path is not None:
        # preserve the PACKING shard: a training sequence's chunks must
        # land in the same shard file
        manifest = write_sharded(
            packed,
            output_path,
            id_col,
            num_shards=num_shards,
            size_col="n_chunk_tokens",
            use_existing_shard=True,
        )
        stats["shards"] = manifest.count()
    return CurationResult(kept=cleaned, chunks=packed, manifest=manifest, stats=stats)

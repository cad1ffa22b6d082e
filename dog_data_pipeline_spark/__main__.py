"""CLI dispatch for the named pipelines, mirroring the reference's
argparse + registry-dispatch operation model (``preprocess_dataset.py:
136-144``, ``raw_to_samples.py:404-409``) — but over Spark jobs:

    python -m dog_data_pipeline_spark preprocess --input-dir D --manifest M
    python -m dog_data_pipeline_spark merge-raw --manifest M --dataset NAME \\
        --catalog C
    python -m dog_data_pipeline_spark track-samples --detections P \\
        --metadata P --catalog C --samples OUT --errors OUT
    python -m dog_data_pipeline_spark query NAME [--sf-dir D] [--limit N]

Each subcommand builds a declarative plan from the package's pipeline
functions and writes through the transactional sinks; none of the
reference's read-modify-overwrite hazards.
"""

from __future__ import annotations

import argparse
import sys


def _spark(app: str):
    from dog_data_pipeline_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_preprocess(args: argparse.Namespace) -> int:
    """Stage 1: directory listing → (file_path, action) manifest CSV."""
    from dog_data_pipeline_spark.pipelines.preprocess import derive_action_manifest
    from dog_data_pipeline_spark.sources.catalog import write_catalog_atomic
    from dog_data_pipeline_spark.sources.files import list_binary_files

    spark = _spark("cli-preprocess")
    listing = list_binary_files(spark, args.input_dir, glob=args.glob)
    done = None
    if args.already_done:
        done = spark.read.csv(args.already_done, header=True, schema="file_path STRING")
    manifest = derive_action_manifest(listing, already_done=done)
    n = manifest.count()
    write_catalog_atomic(manifest.select("file_path", "action"), args.manifest)
    print(f"preprocess: wrote {n} manifest rows -> {args.manifest}")
    return 0


def cmd_merge_raw(args: argparse.Namespace) -> int:
    """Stage 2: manifest + existing catalog → extended catalog (atomic swap)."""
    import os

    from dog_data_pipeline_spark.pipelines.merge_raw import merge_to_raw
    from dog_data_pipeline_spark.sources.catalog import (
        read_catalog_csv,
        write_catalog_atomic,
    )

    spark = _spark("cli-merge-raw")
    manifest = spark.read.csv(
        args.manifest, header=True, schema="file_path STRING, action STRING"
    )
    catalog = (
        read_catalog_csv(spark, args.catalog) if os.path.exists(args.catalog) else None
    )
    merged = merge_to_raw(catalog, manifest, args.dataset)
    n = merged.count()
    write_catalog_atomic(merged, args.catalog)
    print(f"merge-raw: catalog now {n} rows -> {args.catalog}")
    return 0


def cmd_track_samples(args: argparse.Namespace) -> int:
    """Stage 3: detections + metadata + catalog → samples/errors ledgers."""
    from dog_data_pipeline_spark.pipelines.tracking import track_samples_pipeline
    from dog_data_pipeline_spark.sources.catalog import (
        read_catalog_csv,
        write_catalog_atomic,
    )

    spark = _spark("cli-track-samples")
    detections = spark.read.parquet(args.detections)
    metadata = spark.read.parquet(args.metadata)
    catalog = read_catalog_csv(spark, args.catalog).withColumnRenamed(
        "file_path", "video_id"
    )
    samples, errors = track_samples_pipeline(
        detections,
        metadata,
        catalog,
        label=args.label,
        threshold=args.threshold,
        segment_length_sec=args.segment_sec,
    )
    ns, ne = samples.count(), errors.count()
    write_catalog_atomic(samples, args.samples)
    write_catalog_atomic(errors, args.errors)
    print(f"track-samples: {ns} samples -> {args.samples}; {ne} errors -> {args.errors}")
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Full corpus curation: quality gate -> exact dedup ->
    decontamination -> chunk -> pack -> sharded export."""
    from dog_data_pipeline_spark.pipelines.curate import curate_corpus

    spark = _spark("cli-curate")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    result = curate_corpus(
        docs,
        bench,
        min_quality=args.min_quality,
        min_classifier_score=args.min_classifier_score,
        source_col=args.source_col,
        source_cap=args.source_cap,
        segment_dedup_tokens=args.segment_dedup_tokens,
        span_dedup_window_tokens=args.span_dedup_tokens,
        mixture_budget_tokens=args.mixture_budget_tokens,
        chunk_tokens=args.chunk_tokens,
        chunk_overlap=args.chunk_overlap,
        pack_budget=args.pack_budget,
        num_shards=args.num_shards,
        output_path=args.output,
    )
    for stage, n in result.stats.items():
        print(f"curate: {stage} = {n}")
    return 0


def cmd_ivf_build(args: argparse.Namespace) -> int:
    """Train + persist an IVF ANN index (train-once/query-many)."""
    from dog_data_pipeline_spark.operators.similarity import build_ivf_index

    spark = _spark("cli-ivf-build")
    corpus = spark.read.parquet(args.input)
    meta = build_ivf_index(
        corpus,
        args.index,
        id_col=args.id_col,
        vec_col=args.vec_col,
        n_lists=args.n_lists,
        seed=args.seed,
        balance_bound=args.balance_bound if args.balance_bound > 0 else None,
        pq_m_sub=args.pq_m_sub,
        pq_ksub=args.pq_ksub,
        enable_upsert=args.enable_upsert,
        attr_cols=args.attr_cols or None,
    )
    counts = meta["cell_counts"]
    pq = " + pq codes" if meta.get("pq") else ""
    print(
        f"ivf-build: {sum(counts.values())} vectors in {len(counts)} cells"
        f"{pq} -> {args.index}"
    )
    return 0


def cmd_ivf_append(args: argparse.Namespace) -> int:
    """Append a new vector batch to a persisted IVF index (no retrain);
    exits 3 when the drift guard recommends a rebuild so schedulers can
    branch on it. Holds the index's exclusive appender lock for the
    duration — one appender at a time per index (readers unaffected);
    a second appender waits up to --lock-timeout-s then fails."""
    from dog_data_pipeline_spark.operators.similarity import ivf_append

    spark = _spark("cli-ivf-append")
    batch = spark.read.parquet(args.input)
    stats = ivf_append(
        batch,
        args.index,
        skew_bound=args.skew_bound,
        lock_timeout_s=args.lock_timeout_s,
    )
    msg = (
        f"ivf-append: +{stats['appended']} vectors -> {args.index}; "
        f"max/mean cell skew {stats['max_mean_skew']}"
    )
    if stats["rebuild_recommended"]:
        print(
            msg
            + " — REBUILD RECOMMENDED (run ivf-build on the full corpus "
            "with --balance-bound; a plain retrain cannot split a dense "
            "drift blob)"
        )
        return 3
    print(msg)
    return 0


def _coerce_inline_ids(tokens: list[str], index_path: str, id_type: str | None):
    """Coerce ``--ids`` tokens UNIFORMLY to the index's id type.

    Per-token int-if-digit-like mapping (the old behavior) breaks two
    ways (reviewer r12): a mixed list like ``7 abc`` produces a
    mixed-type column Spark schema inference rejects, and a
    numeric-LOOKING string id (``007``) is silently coerced to an int
    that matches nothing in a string id column. The authority is the
    index sidecar's recorded ``row_schema`` (the id column's actual
    type); ``--id-type`` overrides it; a legacy sidecar without the
    field falls back to all-int iff EVERY token is digit-like, else
    all-str — uniform either way, never mixed."""
    import json
    import os

    if id_type is None:
        try:
            with open(os.path.join(index_path, "ivf_meta.json")) as fh:
                meta = json.load(fh)
            schema = json.loads(meta.get("row_schema") or "{}")
            id_field = next(
                f for f in schema.get("fields", [])
                if f["name"] == meta["id_col"]
            )
            id_type = "int" if id_field["type"] in (
                "byte", "short", "integer", "long",
            ) else "str"
        except (OSError, KeyError, ValueError, StopIteration):
            id_type = (
                "int"
                if tokens and all(t.lstrip("-").isdigit() for t in tokens)
                else "str"
            )
    return [int(t) for t in tokens] if id_type == "int" else list(tokens)


def cmd_ivf_delete(args: argparse.Namespace) -> int:
    """Tombstone ids out of an upsert-enabled index (merge-on-read:
    no data file is rewritten; compaction materializes later). Exits 3
    when tombstones have accumulated past --fold-bound of the indexed
    rows (fold_recommended) so schedulers can branch into
    ivf-compact --fold-all, mirroring ivf-append's rebuild exit."""
    from dog_data_pipeline_spark.operators.similarity import ivf_delete

    spark = _spark("cli-ivf-delete")
    if args.input:
        ids = spark.read.parquet(args.input)
    else:
        ids = _coerce_inline_ids(args.ids, args.index, args.id_type)
    stats = ivf_delete(
        spark,
        args.index,
        ids,
        lock_timeout_s=args.lock_timeout_s,
        fold_bound=args.fold_bound,
    )
    msg = (
        f"ivf-delete: {stats['deleted_ids']} id(s) tombstoned at seq "
        f"{stats['write_seq']} -> {args.index} "
        f"({stats['n_tombstones']} total; run ivf-compact --fold-all to "
        "materialize)"
    )
    if stats["fold_recommended"]:
        print(
            msg
            + f" — FOLD RECOMMENDED (tombstones at "
            f"{stats['tombstone_ratio']:.1%} of indexed rows; run "
            "ivf-compact --fold-all)"
        )
        return 3
    print(msg)
    return 0


def cmd_ivf_upsert(args: argparse.Namespace) -> int:
    """Replace-by-id (latest-wins): tombstone the batch's ids, then
    append the batch — no data file rewritten."""
    from dog_data_pipeline_spark.operators.similarity import ivf_upsert

    spark = _spark("cli-ivf-upsert")
    batch = spark.read.parquet(args.input)
    stats = ivf_upsert(
        batch,
        args.index,
        skew_bound=args.skew_bound,
        lock_timeout_s=args.lock_timeout_s,
    )
    notes = []
    if stats.get("rebuild_recommended"):
        notes.append("REBUILD RECOMMENDED (drift)")
    if stats.get("fold_recommended"):
        notes.append(
            f"FOLD RECOMMENDED (tombstones at "
            f"{stats['tombstone_ratio']:.1%} of indexed rows; run "
            "ivf-compact --fold-all)"
        )
    print(
        f"ivf-upsert: {stats['tombstoned_ids']} id(s) superseded, "
        f"+{stats['appended']} vectors -> {args.index}"
        + ("".join(" — " + n for n in notes))
    )
    return 3 if notes else 0


def cmd_ivf_compact(args: argparse.Namespace) -> int:
    """Recluster an appended-to index's file layout (no retrain, no
    re-assignment; results bit-identical). Takes the appender lock."""
    from dog_data_pipeline_spark.operators.similarity import ivf_compact

    spark = _spark("cli-ivf-compact")
    stats = ivf_compact(
        spark,
        args.index,
        max_files_per_cell=args.max_files_per_cell,
        rows_per_file=args.rows_per_file,
        fold_all=args.fold_all,
    )
    if stats.get("tombstones_gcd") or stats.get("tombstones_remaining"):
        print(
            f"ivf-compact: tombstones folded+gc'd {stats['tombstones_gcd']}"
            f", remaining {stats['tombstones_remaining']}"
        )
    if stats["compacted"]:
        print(
            f"ivf-compact: {stats['cells_over_threshold']} cell(s) over "
            f"threshold; {stats['files_before']} -> {stats['files_after']} "
            f"files in {args.index}"
        )
    else:
        print(
            f"ivf-compact: layout already within "
            f"{args.max_files_per_cell} files/cell — no-op"
        )
    return 0


def cmd_ivf_verify(args: argparse.Namespace) -> int:
    """Audit a persisted index's sidecar counts against the index;
    --repair rewrites the sidecar from the index. Exit 4 = inconsistent
    (and not repaired)."""
    import json
    import os
    import re

    from dog_data_pipeline_spark.operators.similarity import ivf_verify

    spark = _spark("cli-ivf-verify")
    audit = ivf_verify(spark, args.index, repair=args.repair)
    if audit["lock_held"] is not None:
        print(
            f"ivf-verify: append lock held by pid {audit['lock_held']} "
            "(in-flight or crashed appender)"
        )
    try:
        with open(os.path.join(args.index, "ivf_meta.json")) as fh:
            sid = json.load(fh).get("last_stream_id") or ""
    except OSError:
        sid = ""
    if re.search(r"/[A-Za-z][A-Za-z0-9+.-]*:/", sid):
        # an absolute path with an embedded `scheme:/` segment is the
        # signature of the pre-r11 cwd-joined URI identity
        # (os.path.abspath("s3://bucket/ck") -> "/cwd/s3:/bucket/ck");
        # the current code records URIs verbatim, so the NEXT append
        # from the upgraded stream presents a new identity — one
        # flagged duplicate batch unless the guard is cleared first
        print(
            f"ivf-verify: stream identity {sid!r} looks CWD-JOINED "
            "(recorded by pre-upgrade code from a URI checkpoint). To "
            "upgrade losslessly, stop the stream and clear "
            "last_stream_batch/last_stream_id in ivf_meta.json before "
            "the first post-upgrade append; otherwise the guard accepts "
            "one duplicate batch and takes over (see README: 'URI "
            "checkpoint identity migration')."
        )
    if audit["consistent"]:
        print(f"ivf-verify: {args.index} sidecar consistent")
        return 0
    print(
        f"ivf-verify: {len(audit['diff'])} cell(s) diverge "
        f"(sidecar, actual): {audit['diff']}"
    )
    if audit["consistent_after"]:
        print("ivf-verify: sidecar repaired from index")
        return 0
    return 4


def cmd_ivf_snapshot(args: argparse.Namespace) -> int:
    """Consistent hard-linked export of the live index generation."""
    from dog_data_pipeline_spark.operators.similarity import ivf_snapshot

    spark = _spark("cli-ivf-snapshot")
    stats = ivf_snapshot(
        spark, args.index, args.dest, compact_first=args.compact_first
    )
    print(
        f"ivf-snapshot: {stats['files_linked']} data file(s) + "
        f"{stats['tombstone_files']} tombstone file(s) -> {stats['dest']}"
        f" ({stats['n_tombstones']} tombstones ride along)"
    )
    return 0


def cmd_ivf_query(args: argparse.Namespace) -> int:
    """Top-k cosine neighbors from a persisted IVF index."""
    from dog_data_pipeline_spark.operators.similarity import query_ivf_index

    spark = _spark("cli-ivf-query")
    queries = spark.read.parquet(args.queries)
    out = query_ivf_index(
        spark,
        args.index,
        queries,
        k=args.k,
        n_probe=args.n_probe,
        use_pq=False if args.no_pq else None,
        rerank=args.rerank,
        where=args.where,
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        # Count the WRITTEN parquet (footer metadata only) rather than
        # out.count(), which would re-execute the whole query — probed-
        # cells collect and index scan included — a second time.
        n = spark.read.parquet(args.output).count()
        print(f"ivf-query: {n} result rows -> {args.output}")
    else:
        out.show(args.limit, truncate=False)
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run a registry query by name and show the head of the result."""
    from dog_data_pipeline_spark.queries import REGISTRY

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; known: {', '.join(sorted(REGISTRY))}")
        return 2
    spark = _spark(f"cli-query-{args.name}")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    print(f"query {args.name}: {df.count()} rows")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dog_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("preprocess", help="listing dir -> action manifest CSV")
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--manifest", required=True, help="output manifest CSV dir")
    sp.add_argument("--glob", default="*")
    sp.add_argument("--already-done", default=None, help="CSV of processed file_paths")
    sp.set_defaults(fn=cmd_preprocess)

    sm = sub.add_parser("merge-raw", help="manifest + catalog -> new catalog")
    sm.add_argument("--manifest", required=True)
    sm.add_argument("--catalog", required=True)
    sm.add_argument("--dataset", required=True)
    sm.set_defaults(fn=cmd_merge_raw)

    st = sub.add_parser("track-samples", help="detections -> samples/errors ledgers")
    st.add_argument("--detections", required=True, help="parquet of detections")
    st.add_argument("--metadata", required=True, help="parquet of video metadata")
    st.add_argument("--catalog", required=True, help="catalog CSV")
    st.add_argument("--samples", required=True, help="output samples CSV dir")
    st.add_argument("--errors", required=True, help="output errors CSV dir")
    st.add_argument("--label", type=int, default=16)
    st.add_argument("--threshold", type=float, default=0.3)
    st.add_argument("--segment-sec", type=int, default=2)
    st.set_defaults(fn=cmd_track_samples)

    sc = sub.add_parser("curate", help="corpus -> curated training shards")
    sc.add_argument("--input", required=True, help="documents parquet")
    sc.add_argument("--output", required=True, help="sharded export dir")
    sc.add_argument("--benchmark", default=None, help="benchmark docs parquet")
    sc.add_argument("--min-quality", type=float, default=0.5)
    sc.add_argument("--min-classifier-score", type=float, default=None,
                    help="enable the hashed-linear classifier gate")
    sc.add_argument("--source-col", default=None)
    sc.add_argument("--source-cap", type=int, default=None,
                    help="cap documents per --source-col value")
    sc.add_argument("--segment-dedup-tokens", type=int, default=None,
                    help="enable C4-style sub-document dedup at this segment size")
    sc.add_argument("--span-dedup-tokens", type=int, default=None,
                    help="enable substring-level duplicate-span removal at this window size")
    sc.add_argument("--mixture-budget-tokens", type=float, default=None,
                    help="enable temperature mixture selection at this "
                         "token budget (requires --source-col)")
    sc.add_argument("--chunk-tokens", type=int, default=32)
    sc.add_argument("--chunk-overlap", type=int, default=8)
    sc.add_argument("--pack-budget", type=int, default=256)
    sc.add_argument("--num-shards", type=int, default=16)
    sc.set_defaults(fn=cmd_curate)

    sb = sub.add_parser("ivf-build", help="train + persist an IVF ANN index")
    sb.add_argument("--input", required=True, help="corpus parquet (id + vector)")
    sb.add_argument("--index", required=True, help="index output dir")
    sb.add_argument("--id-col", default="vec_id")
    sb.add_argument("--vec-col", default="embedding")
    sb.add_argument("--n-lists", type=int, default=16)
    sb.add_argument("--seed", type=int, default=42)
    sb.add_argument(
        "--balance-bound",
        type=float,
        default=4.0,
        help="mass-balance the quantizer: split training cells heavier "
        "than BOUND x mean (default 4.0 = ivf-append's --skew-bound, so "
        "fresh builds on naturally skewed data don't trip the drift "
        "guard; may grow cells past --n-lists, cap 4x; pass 0 to "
        "disable and train plain Lloyd's)",
    )
    sb.add_argument(
        "--pq-m-sub",
        type=int,
        default=None,
        help="also persist product-quantized codes (M uint8 subspace "
        "codes per vector) so ivf-query probes compressed codes instead "
        "of raw vectors (exact rerank from raw vectors on survivors)",
    )
    sb.add_argument("--pq-ksub", type=int, default=256)
    sb.add_argument(
        "--enable-upsert",
        action="store_true",
        help="make the index deletable/upsertable via merge-on-read "
        "tombstones (rows carry a writer-sequence column; see "
        "ivf-delete / ivf-upsert); off by default — pure overhead for "
        "append-only corpora",
    )
    sb.add_argument(
        "--attr-cols",
        nargs="*",
        default=[],
        help="store these corpus columns beside each vector for "
        "FILTERED ANN (ivf-query --where pushes predicates on them "
        "into the probed-cell scan); appends must carry them",
    )
    sb.set_defaults(fn=cmd_ivf_build)

    sa = sub.add_parser(
        "ivf-append",
        help="append a vector batch to a persisted index (no retrain); "
        "exit 3 = drift guard recommends rebuild; takes the index's "
        "exclusive appender lock — ONE appender at a time per index "
        "(concurrent readers are unaffected)",
    )
    sa.add_argument("--input", required=True, help="new-batch parquet")
    sa.add_argument("--index", required=True, help="existing index dir")
    sa.add_argument("--skew-bound", type=float, default=4.0)
    sa.add_argument(
        "--lock-timeout-s",
        type=float,
        default=600.0,
        help="seconds to wait for another appender's lock before failing",
    )
    sa.set_defaults(fn=cmd_ivf_append)

    sk = sub.add_parser(
        "ivf-compact",
        help="recluster an appended-to index's files (stage-then-swap; "
        "results bit-identical, no retrain); takes the appender lock",
    )
    sk.add_argument("--index", required=True)
    sk.add_argument("--max-files-per-cell", type=int, default=8)
    sk.add_argument("--rows-per-file", type=int, default=250_000)
    sk.add_argument(
        "--fold-all",
        action="store_true",
        help="MAJOR compaction: rewrite every cell (not just fragmented "
        "ones) so all tombstones materialize and garbage-collect",
    )
    sk.set_defaults(fn=cmd_ivf_compact)

    sd = sub.add_parser(
        "ivf-delete",
        help="tombstone ids out of an upsert-enabled index (merge-on-"
        "read — no data file rewritten; ivf-compact materializes); "
        "exit 3 = tombstone fold recommended",
    )
    sd.add_argument("--index", required=True)
    sd.add_argument("--input", help="parquet whose id column names the ids")
    sd.add_argument("--ids", nargs="*", default=[], help="ids inline")
    sd.add_argument(
        "--id-type",
        choices=("int", "str"),
        help="coerce inline --ids to this type (default: the id "
        "column's type from the index sidecar; legacy sidecars fall "
        "back to all-int iff every token is digit-like)",
    )
    sd.add_argument(
        "--fold-bound",
        type=float,
        default=0.10,
        help="exit 3 (fold recommended) when tombstones exceed this "
        "fraction of indexed rows",
    )
    sd.add_argument("--lock-timeout-s", type=float, default=600.0)
    sd.set_defaults(fn=cmd_ivf_delete)

    su = sub.add_parser(
        "ivf-upsert",
        help="replace-by-id (latest-wins): tombstone the batch's ids "
        "then append the batch; exit 3 = maintenance recommended "
        "(drift rebuild or tombstone fold)",
    )
    su.add_argument("--input", required=True, help="replacement-batch parquet")
    su.add_argument("--index", required=True)
    su.add_argument("--skew-bound", type=float, default=4.0)
    su.add_argument("--lock-timeout-s", type=float, default=600.0)
    su.set_defaults(fn=cmd_ivf_upsert)

    sw = sub.add_parser(
        "ivf-verify",
        help="audit sidecar counts vs the index; exit 4 = inconsistent",
    )
    sw.add_argument("--index", required=True)
    sw.add_argument("--repair", action="store_true")
    sw.set_defaults(fn=cmd_ivf_verify)

    sn = sub.add_parser(
        "ivf-snapshot",
        help="export a consistent hard-linked snapshot of the live "
        "index generation (+ tombstones) to a fresh directory — new "
        "lineage: the streaming replay guard is dropped",
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--dest", required=True)
    sn.add_argument(
        "--compact-first",
        action="store_true",
        help="run a major fold-compact on the SOURCE first so the "
        "snapshot ships tombstone-free",
    )
    sn.set_defaults(fn=cmd_ivf_snapshot)

    sv = sub.add_parser("ivf-query", help="top-k cosine from a persisted index")
    sv.add_argument("--index", required=True)
    sv.add_argument("--queries", required=True, help="query-vectors parquet")
    sv.add_argument("--k", type=int, default=10)
    sv.add_argument("--n-probe", type=int, default=3)
    sv.add_argument(
        "--no-pq",
        action="store_true",
        help="force the raw-vector probe even if the index carries pq codes",
    )
    sv.add_argument(
        "--rerank",
        type=int,
        default=4,
        help="pq probe shortlist size multiplier (top rerank*k ADC "
        "survivors get the exact raw-vector rerank)",
    )
    sv.add_argument(
        "--where",
        default=None,
        help="FILTERED ANN: SQL predicate over the index's columns "
        "(id, cell, and the attr_cols stored at build) — a pre-filter "
        "pushed into the probed-cell scan, never a post-filter",
    )
    sv.add_argument("--output", default=None, help="write results parquet here")
    sv.add_argument("--limit", type=int, default=20)
    sv.set_defaults(fn=cmd_ivf_query)

    sq = sub.add_parser("query", help="run a registry query")
    sq.add_argument("name")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sq.add_argument("--limit", type=int, default=20)
    sq.set_defaults(fn=cmd_query)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

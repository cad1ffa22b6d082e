"""Round-13 scale soak: parallel scaling of the heavy TEXT paths.

The r12 verdict (item 7) notes the sf0.1 suite is fixed-overhead-bound,
so the driver's 8-vs-32-core scaling block reads ~1.0 even when the
operators scale. This measures the top heavy NON-IVF paths on a corpus
big enough for data-bound behaviour (sf0.1 documents replicated 32x
with per-token replica salting -> ~160k docs, ~32x the shingle mass)
at 8 and 32 cores, one FRESH JVM per (path, cores) leg, noop-sink
timed (guide §1.4), min-of-2 per leg, legs interleaved per the box
convention.

Paths: minhash LSH candidates, duplicate_spans (rolling window
fingerprints), contamination_report, dsir_log_weights, and the Gopher
repetition profile + bigram cover (the repetition_quality_filter
shape). These are exactly the families this round parallelized behind
_spread, so the 8->32 ratio is the direct evidence the fan-out fix
scales instead of just moving fixed cost around.

Usage: python tools/soak_r13.py
Merges ``text_scaling_soak_r13`` into BENCH_LOCAL_r13.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ARTIFACT = os.path.join(HERE, "BENCH_LOCAL_r13.json")
# 32 replicas with per-TOKEN salting: ~32x the shingle mass of sf0.1
# (160k docs) with zero cross-replica shingle sharing, so pair joins
# grow linearly, not with replicas^2 per family
REPLICAS = 32

_GEN = r"""
import sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]").appName("soak13-gen")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dog_data_pipeline_spark.tables import load
docs = load(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "source", "text")
reps = spark.range({reps}).select(F.col("id").alias("rep"))
# per-TOKEN replica salt: every token carries its replica marker, so
# replicas share NO shingles — shingle mass scales with replicas while
# every pair join stays within one replica (no quadratic family
# blow-up), i.e. the corpus grows like independent data, not dups
salted = F.concat_ws(
    " ",
    F.transform(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda t: F.concat(F.lit("r"), F.col("rep").cast("string"),
                           F.lit("_"), t),
    ),
)
big = docs.crossJoin(reps).select(
    (F.col("doc_id") + F.col("rep") * 1000000).alias("doc_id"),
    "source",
    salted.alias("text"),
)
big.repartition(32).write.mode("overwrite").parquet({corpus!r})
print("ROWS", spark.read.parquet({corpus!r}).count())
spark.stop()
"""

_LEG = r"""
import sys, time, json
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]").appName("soak13-{name}")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "{cpus}")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.driver.maxResultSize", "4g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})
docs.count()  # warm the scan

from dog_data_pipeline_spark.operators.contamination import contamination_report
from dog_data_pipeline_spark.operators.dedup import (
    duplicate_spans, minhash_lsh_pairs,
)
from dog_data_pipeline_spark.operators.sampling import dsir_log_weights
from dog_data_pipeline_spark.operators.text import (
    tokens, with_repetition_profile, word_ngrams,
)


def path_df(name):
    if name == "minhash_lsh":
        return minhash_lsh_pairs(docs, "doc_id", "text", n=3,
                                 num_hashes=64, bands=16, est_threshold=0.35)
    if name == "duplicate_spans_rolling":
        return duplicate_spans(docs, "doc_id", "text", window_tokens=16,
                               fingerprint="rolling")
    if name == "contamination_report":
        corpus = docs.filter(F.col("source") != "src1")
        bench = docs.filter((F.col("source") == "src1") & (F.col("doc_id") < 1000000))
        return contamination_report(corpus, bench, n=5)
    if name == "dsir_log_weights":
        return dsir_log_weights(
            docs.withColumn("is_target", F.col("source") == "src0"),
            "doc_id", "text", "is_target", n_buckets=1024)
    if name == "repetition_profile":
        prof = with_repetition_profile(docs, "text")
        bigrams = docs.select(
            "doc_id",
            F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("bigram"))
        cov = (bigrams.groupBy("doc_id", "bigram")
               .agg(F.count(F.lit(1)).alias("cnt"))
               .groupBy("doc_id")
               .agg(F.max(F.col("cnt") * F.length("bigram")).alias("cov")))
        return prof.select("doc_id", "dup_token_frac", "dup_trigram_frac").join(
            cov, "doc_id", "left")
    raise ValueError(name)


walls = []
for _ in range(2):
    t0 = time.time()
    path_df({name!r}).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 2))
print("RESULT " + json.dumps({{"name": {name!r}, "cpus": {cpus}, "walls": walls}}))
spark.stop()
"""

PATHS = [
    "minhash_lsh",
    "duplicate_spans_rolling",
    "contamination_report",
    "dsir_log_weights",
    "repetition_profile",
]


def run_leg(name: str, cpus: int, corpus: str) -> list[float]:
    child = _LEG.format(root=HERE, cpus=cpus, name=name, corpus=corpus)
    proc = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True, cwd="/tmp"
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])["walls"]
    sys.stderr.write(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:] + "\n")
    raise RuntimeError(f"leg failed: {name} cpus={cpus}")


def main() -> None:
    corpus = os.path.join(tempfile.mkdtemp(prefix="ddps_soak13_"), "docs")
    gen = subprocess.run(
        [sys.executable, "-c", _GEN.format(root=HERE, reps=REPLICAS, corpus=corpus)],
        capture_output=True, text=True, cwd="/tmp",
    )
    rows = next(
        (ln.split()[1] for ln in gen.stdout.splitlines() if ln.startswith("ROWS")),
        None,
    )
    if rows is None:
        sys.stderr.write(gen.stdout[-1500:] + "\n" + gen.stderr[-3000:] + "\n")
        raise RuntimeError("corpus generation failed")
    print(f"corpus: {rows} rows at {corpus}")

    results: dict[str, dict] = {}
    # interleave core counts per path (box convention: alternate legs)
    for rnd in range(2):
        order = (32, 8) if rnd % 2 == 0 else (8, 32)
        for name in PATHS:
            for cpus in order:
                walls = run_leg(name, cpus, corpus)
                slot = results.setdefault(name, {})
                key = f"c{cpus}_walls"
                slot.setdefault(key, []).extend(walls)
                print(f"round {rnd} {name} c{cpus}: {walls}")
    for name, slot in results.items():
        lo32 = min(slot["c32_walls"])
        lo8 = min(slot["c8_walls"])
        slot["c32_floor"] = lo32
        slot["c8_floor"] = lo8
        slot["speedup_8_to_32"] = round(lo8 / lo32, 2) if lo32 else None
        print(f"{name}: c8 {lo8}s c32 {lo32}s speedup {slot['speedup_8_to_32']}x")

    payload = {
        "note": (
            f"parallel-scaling soak over sf0.1 documents x{REPLICAS} "
            "(~160k docs, per-token replica salt), fresh JVM per leg, "
            "noop sink, min-of-4 walls per (path, cores), interleaved "
            "leg order; speedup = c8_floor / c32_floor"
        ),
        "paths": results,
    }
    with open(ARTIFACT) as fh:
        art = json.load(fh)
    art["text_scaling_soak_r13"] = payload
    with open(ARTIFACT, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(f"merged text_scaling_soak_r13 into {ARTIFACT}")


if __name__ == "__main__":
    main()

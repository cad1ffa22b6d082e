"""Sequence-packing properties: determinism, budget bounds, identity
preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.packing import pack_chunks, packed_sequences
from dog_data_pipeline_spark.operators.text import with_chunks
from dog_data_pipeline_spark.tables import load
from tests.conftest import SF_DIR


def _chunks(spark):
    docs = load(spark, SF_DIR, "documents")
    return with_chunks(docs, "doc_id", "text", chunk_tokens=32, overlap=8)


def test_packing_is_partition_invariant(spark):
    c = _chunks(spark)
    a = {
        (r["doc_id"], r["chunk_idx"]): (r["shard"], r["bin"], r["position"])
        for r in pack_chunks(c, budget=256, num_shards=8).collect()
    }
    b = {
        (r["doc_id"], r["chunk_idx"]): (r["shard"], r["bin"], r["position"])
        for r in pack_chunks(c.repartition(11), budget=256, num_shards=8).collect()
    }
    assert a == b


def test_packing_budget_overrun_bounded_by_one_chunk(spark):
    seqs = packed_sequences(_chunks(spark), budget=256, num_shards=8).collect()
    max_chunk = 32
    for r in seqs:
        assert r["seq_tokens"] < 256 + max_chunk
    # all but each shard's (possibly short) last bin are near-full
    by_shard = {}
    for r in seqs:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        last = max(x["bin"] for x in rows)
        for r in rows:
            if r["bin"] != last:
                assert r["seq_tokens"] >= 256 - max_chunk


def test_packing_preserves_every_chunk_once(spark):
    c = _chunks(spark)
    packed = pack_chunks(c, budget=256, num_shards=8)
    assert packed.count() == c.count()
    assert packed.select("doc_id", "chunk_idx").distinct().count() == c.count()
    # positions are dense within each bin
    dense = (
        packed.groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.max("position").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert dense == 0


def test_packing_matches_python_md5_replay(spark):
    """The layout contract: an auditor can reproduce (shard, bin,
    position) for every chunk with nothing but hashlib — replay it in
    python and diff."""
    import hashlib

    rows = [(d, i, 5 + (d * 7 + i) % 9) for d in range(40) for i in range(d % 4 + 1)]
    df = spark.createDataFrame(rows, "doc_id LONG, chunk_idx INT, n_chunk_tokens INT")
    budget, shards = 64, 4
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["shard"], r["bin"], r["position"])
        for r in pack_chunks(df, budget=budget, num_shards=shards).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    keyed = []
    for d, i, n in rows:
        key = f"{d}:{i}"
        keyed.append(
            (int(md5(key)[:6], 16) % shards, md5("pack-order:" + key), d, i, n)
        )
    expect = {}
    for shard in range(shards):
        members = sorted(
            [k for k in keyed if k[0] == shard], key=lambda k: (k[1], k[2], k[3])
        )
        prefix, bins = 0, {}
        for _, _, d, i, n in members:
            b = prefix // budget
            pos = bins.get(b, 0)
            bins[b] = pos + 1
            expect[(d, i)] = (shard, b, pos)
            prefix += n
    assert got == expect


# ---------------------------------------------------------------------------
# length-bucketed batching + padding-waste report
# ---------------------------------------------------------------------------


def test_length_buckets_batches_bounded_and_deterministic(spark):
    from dog_data_pipeline_spark.operators.packing import length_bucketed_batches

    df = spark.range(0, 200).selectExpr(
        "id AS doc_id", "CAST(10 + id % 90 AS BIGINT) AS n_tokens"
    )
    out = length_bucketed_batches(df, "n_tokens", batch_size=8, num_shards=4)
    rows = out.collect()
    # bucket is floor(log2(tokens)); batch sizes never exceed batch_size
    import collections, math

    sizes = collections.Counter(
        (r["len_bucket"], r["shard"], r["batch"]) for r in rows
    )
    assert max(sizes.values()) <= 8
    for r in rows:
        assert r["len_bucket"] == math.floor(math.log2(r["n_tokens"]))
    # deterministic: a second run assigns identical batches
    again = {
        r["doc_id"]: (r["len_bucket"], r["shard"], r["batch"])
        for r in length_bucketed_batches(
            df, "n_tokens", batch_size=8, num_shards=4
        ).collect()
    }
    first = {r["doc_id"]: (r["len_bucket"], r["shard"], r["batch"]) for r in rows}
    assert first == again


def test_padding_waste_bucketing_beats_unbucketed_baseline(spark):
    from dog_data_pipeline_spark.operators.packing import padding_waste_report

    # bimodal lengths: global batches mix 10s with 1000s -> huge waste;
    # log2 buckets separate them almost perfectly
    df = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "CAST(CASE WHEN id % 2 = 0 THEN 10 + id % 5 ELSE 1000 + id % 7 END AS BIGINT) AS n_tokens",
    )
    rep = {
        r["len_bucket"]: r
        for r in padding_waste_report(df, "n_tokens", batch_size=8).collect()
    }
    baseline = rep[-1]
    bucketed_rates = [
        r["pad_waste_rate"] for b, r in rep.items() if b != -1
    ]
    assert baseline["n_items"] == 400
    assert sum(r["n_items"] for b, r in rep.items() if b != -1) == 400
    assert baseline["pad_waste_rate"] > 0.3
    assert max(bucketed_rates) < baseline["pad_waste_rate"]


def test_padding_waste_zero_for_uniform_lengths(spark):
    from dog_data_pipeline_spark.operators.packing import padding_waste_report

    df = spark.range(0, 64).selectExpr("id AS doc_id", "CAST(32 AS BIGINT) AS n_tokens")
    for r in padding_waste_report(df, "n_tokens", batch_size=8).collect():
        assert r["pad_waste_rate"] == 0.0

"""Deduplication operators for LLM-training-data pipelines (north-star
ops): exact, n-gram Jaccard (exact, inverted-index), MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale design (the point of this module — see each docstring):
- exact dedup = hash-groupBy, one shuffle on the fingerprint;
- n-gram Jaccard = inverted-index self-join on shingles — EXACT for any
  threshold > 0 (pairs sharing no shingle have jaccard 0) and avoids the
  quadratic all-pairs join; hot shingles are the skew hazard → a
  document-frequency cap drops shingles appearing in more than
  `max_shingle_df` docs (standard trick; such shingles contribute little
  discrimination but dominate the join fan-out);
- MinHash+LSH = signature → bands → bucket join; candidate pairs are
  verified with the signature-estimate so downstream exact verification
  touches only candidates;
- SimHash = 64-bit signature, near-dups = small hamming distance;
- embedding near-dup = blocked pairwise cosine (blocking key caps the
  pair blow-up; the unblocked scale path is the LSH variant in
  similarity.py).

Pipeline ordering matters at scale: pair-enumeration inside a group of k
IDENTICAL documents is O(k²) — no candidate scheme avoids it, because
every pair genuinely qualifies. Run ``exact_dup_groups`` FIRST and
near-dup only the surviving representatives (the standard web-corpus
ordering); the near-dup operators assume an exact-deduped input.

Everything is DataFrame-native column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.text import normalized_text, tokens


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint.

    Returns one row per duplicated fingerprint: (fingerprint, keep_id =
    min id, n_dups). One hash-groupBy shuffle; partial aggregation means
    only (fingerprint, partial-min, partial-count) rows move.
    """
    fp = F.md5(normalized_text(F.col(text_col)))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    tokens -> sliding n-grams (word_ngrams' zip_with-over-slices form:
    the transform(sequence(i), slice) alternative re-slices per index —
    measured ~10x slower per row; the empty-array guard for short docs
    is built into the clamped slice width) -> explode -> distinct. Pure
    column expressions; the distinct is a local+shuffle agg on
    (id, shingle).
    """
    from dog_data_pipeline_spark.operators.text import word_ngrams

    toks = tokens(F.col(text_col))
    grams = word_ngrams(toks, n)
    return (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct xxhash64'd word n-gram shingles per document:
    (id, shingle BIGINT).

    The canonical inverted-index input shared by jaccard_pairs (all
    variants), minhash_signatures, and every certification replay that
    pairs a detector with its exact verifier. Two properties matter:

    - the gram is hashed BEFORE the distinct, so the dedup shuffle
      moves (id, long) rows — ~3x narrower than the string form;
    - every consumer builds the IDENTICAL plan subtree, so when a
      query composes two of them (LSH candidates + exact verify — the
      self-certifying pattern), Spark plans ONE exchange and a
      ReusedExchange for the second consumer instead of re-scanning
      and re-exploding the corpus.

    Collision risk of keying on the 64-bit hash: P ≈ d²/2⁶⁵ for d
    distinct shingles (~1e-9 at d=1e5) — acceptable for near-dup
    detection, as jaccard_pairs documents.
    """
    from dog_data_pipeline_spark.operators.text import word_ngrams

    toks = tokens(F.col(text_col))
    grams = F.transform(word_ngrams(toks, n), lambda g: F.xxhash64(g))
    # _spread before the explode (the window_fingerprints convention,
    # extended here r13): one small parquet file = one scan task, so
    # the shingle explode + hash — 10-20x the scan's work — ran as a
    # SINGLE 1.0-1.8 s task on a 32-core session in every consumer
    # (profiled: minhash_lsh_dedup, incremental_dedup_newbatch,
    # ngram_jaccard_dedup_prefix, dedup_best_keeper). Consumers still
    # build the identical subtree, so composed candidate+verify plans
    # keep their ReusedExchange.
    return (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document n-gram NOVELTY: what fraction of a document's
    distinct n-grams appear here for the first time (corpus-wide first
    owner = min id). The corpus-growth diagnostic behind data-scaling
    decisions: as a crawl saturates, marginal documents' novelty decays
    toward zero — plotted cumulatively this is the "new n-grams per
    shard" curve used to decide when more of the same source stops
    buying model quality (the diminishing-returns analysis in dedup
    papers, e.g. Lee et al. 2022 §5).

    Returns (id_col, n_distinct_ngrams, n_novel, novelty_frac) — one
    row per document that has at least one n-gram.

    Scale shape: ONE wide shuffle keyed on the shingle (window min
    instead of a groupBy+self-join — halves the exchanges), then a
    per-id partial aggregate. Per-doc dedupe happens MAP-SIDE
    (array_distinct on the gram array before the explode) rather than
    via ``shingles()``'s global distinct, which would add a second
    full shuffle of the exploded corpus on (id, shingle) — verified in
    the physical plan: exactly two exchanges (shingle window, id agg).
    The shuffle moves distinct (id, shingle) pairs — the same
    O(corpus tokens) volume every inverted-index dedup op here moves;
    for 100 TB swap the string shingle for the md5 fingerprint (same
    trick as ``window_fingerprints``) to narrow the rows. First-owner
    choice is min(id): deterministic under any partitioning, and
    stable as the corpus grows append-only with increasing ids —
    yesterday's novelty scores never change.
    """
    from dog_data_pipeline_spark.operators.text import word_ngrams

    grams = F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
    sh = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), F.explode(grams).alias("shingle")
    )
    first = F.min("id").over(Window.partitionBy("shingle"))
    per = (
        sh.withColumn("first_id", first)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_ngrams"),
            F.sum((F.col("id") == F.col("first_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return per.select(
        F.col("id").alias(id_col),
        "n_distinct_ngrams",
        "n_novel",
        F.round(
            F.col("n_novel") / F.col("n_distinct_ngrams"), 4
        ).alias("novelty_frac"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via inverted-index self-join.

    jaccard(A,B) = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingle sets.
    Join on shingle → count common shingles per pair → filter. Exact for
    threshold > 0. `max_shingle_df` (optional) drops shingles present in
    more than that many documents before the join — the skew/fan-out
    guard for web-scale corpora (makes the result a lower bound on
    |A∩B|; leave None for exact parity with the oracle).

    The join key is xxhash64(shingle), not the string: the self-join
    shuffle then moves 8-byte longs instead of ~n-word strings. A hash
    collision would merge two shingles (P ≈ d²/2⁶⁵ for d distinct
    shingles — ~1e-9 at d=1e5, still < 1e-4 at a billion); acceptable
    for near-dup DETECTION where the downstream exact verifier re-checks
    candidates.
    """
    sh = hashed_shingles(df, id_col, text_col, n)
    # NOTE: the inverted index feeds three plan subtrees (sizes + both
    # join sides); Spark reuses the shuffle stage across them, so an
    # explicit persist() only adds cache-write overhead on one-shot runs
    # (measured) — callers looping over thresholds should persist.
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    # merge hint: `common` is an agg output whose size Spark misestimates —
    # on a 50k-doc stress corpus the planner tried to BROADCAST it and
    # OOM'd. Neither side is broadcastable at corpus scale (sizes is
    # |docs| rows); sort-merge is the only strategy that never falls over.
    return (
        common.hint("merge").join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") > threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via PREFIX-FILTERED
    set-similarity join (the PPJoin family's prefix principle).

    Same result as ``jaccard_pairs``, different candidate generation:
    order every doc's shingles by GLOBAL rarity (ascending document
    frequency, shingle hash as tie-break) and index only the first
    ``|A| - ceil(t*|A|) + 1`` of them. Two sets with jaccard >= t must
    overlap inside each other's prefixes under any shared total order —
    so joining prefixes loses no true pair, and the hot head of the
    shingle distribution (boilerplate shared by everything, the skew
    hazard) lands OUTSIDE most prefixes instead of fanning out the join.
    Candidates are then verified EXACTLY against full sorted shingle-set
    arrays (array_intersect at candidate — not corpus — cardinality).

    vs the inverted-index join: same exactness, but the join index is
    the prefix (≈ (1-t)·corpus shingle mass) and hot-shingle fan-out is
    structurally suppressed rather than capped. Shuffles: shingle-df
    count, per-doc rank window, prefix self-join, set-collect, two
    candidate joins — all on hashed longs / bounded arrays.

    Regime guidance (measured): on an UNSKEWED corpus the extra
    rank/collect shuffles make this ~40% slower than ``jaccard_pairs``
    (7.9s vs 5.7s at sf0.1) — the win appears when document frequency
    has a boilerplate hot head. On a WHOLE-CORPUS-DUPLICATED corpus
    (every doc 10x) NEITHER variant's candidate join is sub-quadratic —
    every shingle is hot, prefixes are identical across copies — so run
    exact dedup first and near-dup only the representatives (the
    standard ordering, stress-validated in round 1).
    """
    sh = hashed_shingles(df, id_col, text_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy("id").orderBy("df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "id")
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).select("id", "shingle")
    a = prefix.select(F.col("id").alias("id_a"), "shingle")
    b = prefix.select(F.col("id").alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sh.groupBy("id").agg(F.sort_array(F.collect_set("shingle")).alias("set"))
    set_a = sets.select(F.col("id").alias("id_a"), F.col("set").alias("set_a"))
    set_b = sets.select(F.col("id").alias("id_b"), F.col("set").alias("set_b"))
    # merge hints: cand/sets are corpus-sized aggregate outputs the
    # planner misestimates — same broadcast-OOM hazard as jaccard_pairs
    verified = (
        cand.hint("merge").join(set_a, "id_a")
        .hint("merge").join(set_b, "id_b")
        .withColumn(
            # cast to long: F.size is INT, but every sibling variant's
            # n_common is a COUNT (bigint) — the driver-strict oracle
            # mirror flags the width drift (round-5 catch)
            "n_common",
            F.size(F.array_intersect("set_a", "set_b")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.size("set_a") + F.size("set_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") > threshold)
    )
    return verified.select("id_a", "id_b", "n_common", "jaccard")


def jaccard_pairs_auto(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hot_df_factor: float = 50.0,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs with the candidate-generation REGIME
    PICKED FROM MEASURED CORPUS STATS (round-2 verdict item: the regime
    guidance in ``jaccard_pairs_prefix``'s docstring, automated).

    One cheap pre-flight pass computes the shingle document-frequency
    skew — max(df) / mean(df), the same statistic quality.skew_report
    exposes for join keys (a 1-row aggregate over the inverted index;
    its shuffle is reused by whichever regime runs next):

    - skew > ``hot_df_factor`` (a boilerplate hot head: one shingle in
      orders of magnitude more docs than average): the PREFIX-FILTERED
      join (PPJoin) — hot shingles land outside most prefixes, so the
      fan-out the plain inverted index would suffer on the hot key is
      structurally suppressed;
    - otherwise: the plain inverted-index join — measured ~40% cheaper
      on unskewed corpora (no rank/collect shuffles).

    Both regimes produce the identical exact result; only the cost
    profile differs, so the pick is safe at any threshold. The decision
    scalar is one collected row — nothing corpus-sized touches the
    driver.
    """
    sh = hashed_shingles(df, id_col, text_col, n)
    stats = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"), F.avg("df").alias("mean_df"))
        .collect()[0]
    )
    skew = float(stats["max_df"] or 0) / max(float(stats["mean_df"] or 1.0), 1.0)
    if skew > hot_df_factor:
        return jaccard_pairs_prefix(df, id_col, text_col, n, threshold)
    return jaccard_pairs(df, id_col, text_col, n, threshold)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signatures: (id, sig ARRAY<BIGINT>[num_hashes]).

    Hash family: the shingle STRING is hashed once to a long, then
    h_i = xxhash64(i, base) re-hashes the cheap fixed-width long per
    family member — 64 string hashes per row would dominate the cost,
    and a linear family (h1 + i*h2) is NOT admissible for MinHash: its
    argmin shingle is correlated across i, which inflates the agreement
    estimate (observed: ~50x false-pair blow-up). One groupBy(id) with
    num_hashes min() partial aggregates: the shuffle carries only
    (id, 64 longs) per doc regardless of doc size.
    """
    # hashed_shingles is the shared inverted-index subtree (hash before
    # distinct: narrower shuffle; identical subtree to jaccard_pairs so
    # a candidate+verify composition plans a ReusedExchange)
    sh = hashed_shingles(df, id_col, text_col, n).withColumnRenamed(
        "shingle", "__h"
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    # the signature feeds three subtrees downstream (banding + both
    # rerank sides); the shuffle-stage reuse makes an operator-level
    # persist() a wash on one-shot runs — persist at the call site when
    # reusing signatures across multiple queries
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate near-dup pairs with signature-estimated
    jaccard.

    Signature → `bands` band-hashes (xxhash64 of each signature slice) →
    explode → self-join on (band_idx, band_hash) → distinct candidate
    pairs → estimate jaccard as the fraction of agreeing signature
    positions → filter. Probability a pair with true jaccard j becomes a
    candidate: 1-(1-j^r)^b with r = num_hashes/bands.

    The bucket join shuffles only (band_hash, id) rows — never documents
    — and is the standard sub-quadratic path for web-scale near-dedup.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    # xxhash64 hashes the long-array slice directly — no string casting
    band_arr = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)
        ]
    )
    # the bucket join and pair-dedup move ONLY (band, id) rows; the
    # 64-long signatures join back afterwards at candidate cardinality
    # (orders of magnitude smaller than the banded index)
    banded = sig.select("id", F.posexplode(band_arr).alias("band_idx", "band_hash"))
    a = banded.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    # merge hint: same misestimation hazard as jaccard_pairs — cand and
    # sig are both corpus-sized; never let the planner broadcast either
    return (
        cand.hint("merge").join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str = "text", out: str = "simhash"
) -> DataFrame:
    """64-bit SimHash per document.

    bit_i(doc) = sign of sum over tokens of (+1 if bit_i(xxhash64(token))
    else -1). Implemented as one explode + 64 conditional-sum partial
    aggregates (shuffle carries (id, 64 ints)); the signature is
    reassembled with bit-shifts. Near-dups = pairs with small hamming
    distance (see ``simhash_pairs``).
    """
    # _spread: the token explode fans out ~doc_len rows each paying 64
    # conditional sums — single-task on a one-file scan otherwise
    tok = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    one = F.lit(1).cast("long")
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("id").agg(*aggs)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return sums.select("id", sig.alias(out))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 8,
    block_bits: int = 16,
    sig: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Scale path: block on the top `block_bits` bits of the signature
    (near-identical docs almost always agree on them) so the self-join is
    per-block, then compute exact hamming distance via bit_count(xor)
    within blocks. For a guaranteed-recall variant, block on each of
    ceil(64/(max_hamming+1)) disjoint bit-chunks instead (pigeonhole);
    this single-block version is the cheap high-precision screen.

    ``sig`` optionally supplies precomputed (id, simhash) signatures —
    callers that also need the signatures elsewhere (e.g. the registry's
    brute-force certification) pass them in so the 64-aggregate
    signature job runs once.
    """
    if sig is None:
        sig = simhash64(df, id_col, text_col)
    sig = sig.withColumn("block", F.shiftright("simhash", 64 - block_bits))
    a = sig.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = sig.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_pigeonhole(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with GUARANTEED recall at hamming <= h
    (the pigeonhole variant ``simhash_pairs`` documents).

    The 64-bit signature is split into h+1 disjoint chunks; h differing
    bits cannot touch all h+1 chunks, so every true pair agrees on at
    least one (chunk_idx, chunk_value) bucket — candidate generation by
    bucket join has recall 1.0, then exact bit_count(xor) filters.

    Scale shape: the exploded index is (h+1)×|docs| rows of
    (chunk, value, id, sig) — narrow longs; the join is per-bucket, so
    the fan-out is bounded by the bucket-size distribution (chunk width
    = 64/(h+1) bits; h=3 → 16-bit chunks → 65k buckets). Larger h
    widens buckets exponentially — use the cheap single-block screen
    (``simhash_pairs``) when recall can be approximate.
    """
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    if sig is None:
        sig = simhash64(df, id_col, text_col)
    chunks = []
    off = 0
    for i in range(n_chunks):
        width = base + (1 if i < extra else 0)
        mask = (1 << width) - 1
        # arithmetic shiftright sign-extends; the mask clears the high bits
        chunks.append(
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright("simhash", off).bitwiseAND(F.lit(mask)).alias("cv"),
            )
        )
        off += width
    exploded = sig.select(
        "id", "simhash", F.explode(F.array(*chunks)).alias("c")
    ).select("id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv"
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv"
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Blocked pairwise cosine: self-join on `block_col` (caps the pair
    count at sum of block^2 instead of N^2), dot/norms via
    zip_with+aggregate fold — JVM-side higher-order functions, summation
    in index order (bitwise-reproducible, matches the SQL oracle's
    double-precision fold). For unblocked corpora use the
    random-hyperplane LSH in similarity.py as the candidate generator.
    """
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("norm").alias("n_a"), "blk"
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("norm").alias("n_b"), "blk"
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cosine") > threshold)
        .select("id_a", "id_b", "cosine")
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seg_tokens: int = 16,
) -> DataFrame:
    """C4-style sub-document exact dedup at fixed token-segment
    granularity: every document is cut into non-overlapping
    ``seg_tokens``-token segments, each segment is kept only at its
    GLOBAL first occurrence (min (doc_id, seg_idx) over the whole
    corpus), and the document is reassembled from its surviving
    segments.

    C4 removes duplicate LINES corpus-wide (one three-sentence
    boilerplate footer repeated on a million pages survives document-
    level dedup untouched); the unit here is a fixed token window so the
    operator works on newline-free text too. Returns one row per input
    document: (id, n_segments, n_kept, n_dropped, kept_text).

    Scale shape: explode to (id, seg_idx, segment) — corpus token mass /
    seg_tokens rows; the winner per segment is ONE hash-groupBy on the
    segment fingerprint (min(struct(id, seg_idx)) — partial aggregation
    means only per-partition minima shuffle), then a semi-join of the
    exploded table against the winners and a groupBy(id) reassembly.
    Three shuffles total, all keyed on segment-fingerprint or id — no
    windows, no skew beyond genuinely viral segments (a segment repeated
    in M docs contributes M rows to one reduce key; the winner agg is a
    min, so the reducer is O(1) memory — unlike pair-enumeration there
    is no M^2 blow-up).

    The fingerprint is md5 (not xxhash64) so the keep/drop decision is
    bit-identically replayable in any SQL engine — the registry query's
    DuckDB oracle replays the whole operator.
    """
    toks = tokens(F.col(text_col))
    n_seg = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    # guard: sequence(0, -1) DESCENDS in Spark, so an empty token array
    # would fabricate two bogus segments — map it to an empty list
    segs = F.when(n_seg <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(
                F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
            ),
        )
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(segs).alias("seg_idx", "seg")
    ).withColumn("fp", F.md5("seg"))
    winners = exploded.groupBy("fp").agg(
        F.min(F.struct("id", "seg_idx")).alias("w")
    )
    kept = exploded.join(
        winners.select("fp", F.col("w.id").alias("id"), F.col("w.seg_idx").alias("seg_idx")),
        ["fp", "id", "seg_idx"],
        "left_semi",
    )
    per_doc_kept = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("kept_text"),
    )
    totals = df.select(
        F.col(id_col).alias("id"), n_seg.alias("n_segments")
    )
    return (
        totals.join(per_doc_kept, "id", "left")
        .select(
            "id",
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_segments") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    prefix_len: int = 80,
    max_edits: int = 8,
    q: int = 2,  # retained for API compatibility; unused (see below)
) -> DataFrame:
    """Edit-distance similarity join: pairs whose ``prefix_len``-char
    prefixes are within ``max_edits`` Levenshtein edits — the classic
    entity-resolution / fuzzy-match join (near-identical titles, names,
    boilerplate headers), complementing the token-set (Jaccard) and
    weighted (TF-IDF) families with character-level tolerance.

    Candidate generation is PASSJOIN partition blocking (Li, Deng &
    Feng, "PASS-JOIN: a partition-based method for similarity joins",
    VLDB 2011): split every string into ``k+1`` even segments — if
    ed(x, y) <= k then by pigeonhole SOME segment of the shorter
    string appears EXACTLY (same characters, position shifted by at
    most the edits around it) as a substring of the longer — so
    candidates come from an EQUALITY join between indexed segments
    and probe substrings, and the multi-match-aware substring
    selection (paper Lemma 3) bounds the probe window for segment i
    (0-based) of an l-length index string against an m-length probe,
    delta = m - l, to start positions
    ``[p_i - i, p_i + i] ∩ [p_i + delta - (k-i), p_i + delta + (k-i)]``
    — O(k^2) probe substrings per string, independent of corpus size.
    Exact Levenshtein verifies candidate-cardinality rows only.

    Why not a q-gram prefix filter (Ed-Join, Xiao et al. VLDB'08):
    on a low-alphabet / templated corpus even the globally RAREST
    q-grams have document frequency in the hundreds, so the gram
    self-join degenerates toward all-pairs (measured 553s at sf0.1 vs
    ~2s for this plan; segment keys are ~l/(k+1) chars long and carry
    position, so their df stays near 1). Strings too short for
    meaningful segments (len <= 2*(k+1), where even partition gives
    < 2 chars per segment and, below k+1, empty segments with vacuous
    pigeonhole — the recall hole flagged for the old gram bound)
    route through an exact small-block broadcast all-pairs path, so
    recall holds for EVERY length. The oracle replays the unfiltered
    ALL-PAIRS join, so hash equality CERTIFIES recall rather than
    trusting the theorem.

    Scale shape: segment index and probe-substring generation are
    map-only explodes (k+1 index rows, O(k^2) probe rows per doc);
    the candidate join shuffles on (l, segment_idx, segment_text) —
    near-unique keys, no hot-gram skew; Levenshtein runs on candidate
    pairs only, inside whole-stage codegen. Driver traffic: zero
    collects. Returns (id_a, id_b, edit_distance).
    """
    k = int(max_edits)
    nseg = k + 1
    short_max = 2 * nseg  # below this, segments are too short to index
    s = F.substring(F.col(text_col), 1, prefix_len)
    # Only (id, prefix) survives past this point — ~100 bytes/doc — so the
    # spread-out repartition below shuffles a sliver of the corpus, not the
    # documents themselves.  It exists because the O(k^2)-per-doc probe
    # explode otherwise inherits the scan's partitioning (one small file =
    # one task on the bench; a handful of fat splits at 100 TB).
    sc = df.sparkSession.sparkContext
    base = (
        df.select(F.col(id_col).alias("id"), s.alias("s"))
        .withColumn("len", F.length("s"))
        .filter(F.col("len").isNotNull())
        .repartition(sc.defaultParallelism)
    )

    # Even partition of an l-length string into nseg segments: the first
    # nseg - (l % nseg) segments have floor(l/nseg) chars, the rest one
    # more.  start/length are pure column arithmetic shared by both sides.
    def _seg_len(l, i):
        return (l / nseg).cast("int") + F.when(
            i >= nseg - (l % nseg), F.lit(1)
        ).otherwise(F.lit(0))

    def _seg_start(l, i):  # 1-based
        return (
            i * (l / nseg).cast("int")
            + F.greatest(F.lit(0), i - (nseg - (l % nseg)))
            + 1
        )

    # ---- main path: index strings with len > short_max -----------------
    idx = (
        base.filter(F.col("len") > short_max)
        .select(
            "id", "len", "s", F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i")
        )
        .withColumn("st", _seg_start(F.col("len"), F.col("i")))
        .withColumn("sl", _seg_len(F.col("len"), F.col("i")))
        .select(
            F.col("id").alias("id_x"),
            F.col("len").alias("l"),
            "i",
            F.expr("substring(s, st, sl)").alias("g"),
        )
    )
    # Probe side: for every candidate index length l in [m-k, m] (only
    # l > short_max) and segment i, emit the substrings in the
    # multi-match-aware window.  Empty windows produce empty arrays and
    # explode() drops them; sequence() is guarded against lo > hi
    # (Spark's sequence DESCENDS there, which would fabricate probes).
    probe = (
        base.select(F.col("id").alias("id_y"), F.col("s").alias("r"),
                    F.col("len").alias("m"))
        .filter(F.col("m") + k > short_max)
        .withColumn(
            "l",
            F.explode(
                F.sequence(
                    F.greatest(F.col("m") - k, F.lit(short_max + 1)),
                    F.greatest(F.col("m"), F.lit(short_max + 1)),
                )
            ),
        )
        .filter(F.col("l") <= F.col("m"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .withColumn("p", _seg_start(F.col("l"), F.col("i")))
        .withColumn("sl", _seg_len(F.col("l"), F.col("i")))
        .withColumn("delta", F.col("m") - F.col("l"))
        .withColumn(
            "lo",
            F.greatest(
                F.lit(1),
                F.col("p") - F.col("i"),
                F.col("p") + F.col("delta") - (k - F.col("i")),
            ),
        )
        .withColumn(
            "hi",
            F.least(
                F.col("m") - F.col("sl") + 1,
                F.col("p") + F.col("i"),
                F.col("p") + F.col("delta") + (k - F.col("i")),
            ),
        )
        .filter(F.col("hi") >= F.col("lo"))
        .withColumn("j", F.explode(F.sequence(F.col("lo"), F.col("hi"))))
        .select("id_y", "l", "i", F.expr("substring(r, j, sl)").alias("g"))
    )
    # shuffle_hash hint: both sides are corpus-sized (k+1 vs O(k^2) rows
    # per doc) so a broadcast is wrong at scale — and on the bench Spark's
    # post-explode size estimate otherwise picks BuildRight on the FAT
    # probe side (measured 8.0s vs 4.6s).  Shuffling on the near-unique
    # (l, i, g) key has no skew; the hash build lands on the slim side.
    cand_main = (
        idx.hint("shuffle_hash").join(probe, ["l", "i", "g"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
    )
    # ---- short path: exact all-pairs over the (rare) short strings -----
    # A pair (x, y) with min len <= short_max has max len <= short_max+k,
    # so both sides live in this bounded bucket; broadcast it.
    shorts = base.filter(F.col("len") <= short_max + k)
    cand_short = (
        F.broadcast(
            shorts.filter(F.col("len") <= short_max).select(
                F.col("id").alias("id_x"), F.col("len").alias("len_x")
            )
        )
        .join(
            shorts.select(F.col("id").alias("id_y"), F.col("len").alias("len_y")),
            F.abs(F.col("len_x") - F.col("len_y")) <= k,
        )
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
    )
    # Candidate pairs are bytes-light but COMPUTE-dense (a Levenshtein DP
    # each), so AQE's size-targeted coalescing would funnel them into 1-2
    # tasks; spread them explicitly before the verify stage.
    cand = (
        cand_main.unionByName(cand_short)
        .dropDuplicates(["id_a", "id_b"])
        .repartition(sc.defaultParallelism)
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    # Threshold-banded Levenshtein (Spark >= 3.5): O(len*k) per pair with
    # early abandon instead of the full O(len^2) DP; returns -1 past the
    # threshold, which the filter drops.
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("edit_distance", F.levenshtein("s_a", "s_b", int(max_edits)))
        .filter((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_edits))
        .select(
            "id_a",
            "id_b",
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
    )


def minhash_lsh_pairs_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
) -> DataFrame:
    """INCREMENTAL MinHash+LSH near-dedup: candidate pairs for a NEW
    batch against an already-indexed corpus, plus batch-internal pairs —
    but never corpus x corpus pairs (those were resolved when the corpus
    was ingested).

    The operation every continuously-ingesting training-data pipeline
    needs: re-minhashing 100 TB per daily batch is a non-starter, so the
    corpus side is a persisted SIGNATURE TABLE (id, sig) — append-only,
    written by previous runs of this same operator via
    ``minhash_signatures`` — and the per-batch cost is
    O(batch signatures) + one bucket join against the banded index.
    Banding the corpus is a map-only projection of the signature table
    (in production the banded form itself is what you persist,
    partitioned by band_hash range, so the bucket join partition-prunes).

    Pair polarity: id_b is ALWAYS a batch doc; id_a may be corpus or an
    earlier batch doc (corpus-vs-batch keeps the corpus id on the left;
    batch-internal pairs are ordered id_a < id_b as usual). The
    (new_a OR new_b) predicate is applied BEFORE pair-dedup so the
    corpus self-join fan-out never materializes.
    """
    c_sig = minhash_signatures(corpus, id_col, text_col, n, num_hashes)
    b_sig = minhash_signatures(batch, id_col, text_col, n, num_hashes)
    sig = c_sig.withColumn("is_new", F.lit(False)).unionByName(
        b_sig.withColumn("is_new", F.lit(True))
    )
    return incremental_lsh_pairs_from_tagged_sigs(
        sig, num_hashes, bands, est_threshold
    )


def incremental_lsh_pairs_from_tagged_sigs(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
) -> DataFrame:
    """The banding/bucket-join core of ``minhash_lsh_pairs_incremental``,
    taking pre-computed TAGGED signatures (id, sig, is_new).

    Exists as its own entry point because at scale the corpus signatures
    come from a PERSISTED table, not a recompute — and when corpus and
    batch are partitions of one frame, computing signatures once over
    the union and tagging is one signature pass instead of two.
    """
    rows_per_band = num_hashes // bands
    band_arr = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "id", "is_new", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("is_new").alias("new_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("is_new").alias("new_b"), "band_idx", "band_hash"
    )
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        # drop corpus x corpus INSIDE the join, before the pair-dedup
        # shuffle; id order only among pairs of like kind — cross pairs
        # keep corpus left / batch right regardless of id order
        .filter(
            (F.col("new_a") | F.col("new_b"))
            & (
                (F.col("new_a") != F.col("new_b")) & ~F.col("new_a")
                | (F.col("new_a") == F.col("new_b")) & (F.col("id_a") < F.col("id_b"))
            )
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return (
        cand.hint("merge").join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Unconditional round-robin repartition before a compute-dense
    per-document stage (window fingerprints, probe explodes).  The
    inherited partitioning undercounts such a stage's real cost two
    ways: one small parquet file = one scan task, and AQE coalesces a
    bytes-light shuffle output to 1-2 partitions before the explode
    multiplies the work 10-20x.  An explicit REPARTITION_BY_NUM is
    exempt from AQE coalescing, so it pins the fan-out.

    Why not probe the partition count and skip when already spread:
    under AQE, ``df.rdd.getNumPartitions()`` finalizes the adaptive
    plan, which EXECUTES every upstream shuffle stage — the probe would
    run a composed pipeline's whole subtree twice (measured on
    corpus_curation_v2, whose span stage sits above a dedup join).
    The unconditional shuffle moves one pass of (id, text) rows —
    bounded by the input, ~10% of the downstream explode's work — and
    its width follows the session's shuffle tuning, so on a real
    cluster it lands at the parallelism the cluster is sized for."""
    spark = df.sparkSession
    # shuffle.partitions may be non-numeric on managed platforms
    # (e.g. "auto" under auto-optimized shuffle) — fall back to
    # defaultParallelism rather than crashing every caller
    try:
        conf_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        conf_n = 0
    n = max(spark.sparkContext.defaultParallelism, conf_n)
    return df.repartition(n)


# Rolling-fingerprint constants: two CRT-independent 31-bit prime moduli
# (collision odds ~ n^2 / 2^62 — negligible at any real corpus size) and a
# prime base.  Token hashes are 28-bit md5-hex slices, so every fold step
# stays below 2^52 — safe in ANSI-mode long arithmetic (no overflow throw).
_RFP_BASE = 1000003
_RFP_P1 = 2147483629
_RFP_P2 = 2147483587


def window_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window_tokens: int = 16,
    fingerprint: str = "md5",
) -> DataFrame:
    """Every ``window_tokens``-token sliding-window fingerprint of every
    document: (id, pos, h) with 1-based token position — the shared
    candidate-generation front end of ``duplicate_spans`` (within-corpus
    dedup) and ``contamination_spans`` (cross-corpus benchmark scrub).
    Engines as in ``duplicate_spans``: "md5" re-hashes the w-token slice
    per position, "rolling" is the Rabin-Karp double-modulus fold over
    once-hashed tokens. Map-only; docs shorter than the window emit
    nothing."""
    df = _spread(df)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    w = window_tokens
    pos_arr = F.when(n < w, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), n - w + 1)
    )
    if fingerprint == "md5":
        win_of = lambda i: F.md5(  # noqa: E731
            F.concat_ws(" ", F.slice(toks, i, w))
        ).alias("h")
        wins_src = df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    pos_arr, lambda i: F.struct(i.alias("pos"), win_of(i))
                )
            ).alias("wc"),
        )
    elif fingerprint == "rolling":
        B, P1, P2 = _RFP_BASE, _RFP_P1, _RFP_P2

        def tok_h(start: int) -> "F.Column":
            return F.transform(
                toks,
                lambda t: F.conv(F.substring(F.md5(t), start, 7), 16, 10).cast(
                    "long"
                ),
            )

        def roll(harr_name: str, p: int):
            return lambda i: F.aggregate(
                F.slice(F.col(harr_name), i, w),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * B + h) % F.lit(p),
            )

        # Token hashes materialize as real columns BEFORE the per-position
        # transform: a direct lambda capture would clone the whole
        # md5-per-token subtree into every window position, re-hashing
        # each token n times and erasing the rolling win.
        hashed = df.select(
            F.col(id_col).alias("id"),
            pos_arr.alias("__pos"),
            tok_h(1).alias("__h1"),
            tok_h(8).alias("__h2"),
        )
        wins_src = hashed.select(
            "id",
            F.explode(
                F.transform(
                    F.col("__pos"),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            "-",
                            roll("__h1", P1)(i).cast("string"),
                            roll("__h2", P2)(i).cast("string"),
                        ).alias("h"),
                    ),
                )
            ).alias("wc"),
        )
    else:
        raise ValueError(f"unknown fingerprint engine: {fingerprint!r}")
    return wins_src.select("id", "wc.pos", "wc.h")


def merge_positions_to_spans(dup: DataFrame, window_tokens: int) -> DataFrame:
    """Merge flagged window start positions (id, pos) into maximal
    non-overlapping spans (id, span_start, span_end) — gaps-and-islands
    over each document's positions, window partitioned by doc (parallel
    across docs, bounded by doc length within)."""
    w = window_tokens
    doc_w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (w - 1)).over(
        doc_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            doc_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (w - 1)).alias("span_end"),
        )
        .select("id", "span_start", "span_end")
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str = "text",
    out: str = "clean_text",
) -> DataFrame:
    """Rewrite each document with every token inside a span removed.
    ``spans`` is (id, span_start, span_end) as produced by
    ``merge_positions_to_spans``. Adds ``out`` plus ``n_removed_tokens``;
    docs with no span pass through verbatim. The span list joins back
    per doc (bounded: spans per doc <= tokens/2), then one filter
    expression drops the covered positions — map-side after the join,
    no extra shuffle."""
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = df.join(
        per_doc.withColumnRenamed("id", id_col), id_col, "left"
    )
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(toks))
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.filter(
        F.zip_with(idx, toks, lambda i, t: F.struct(i.alias("i"), t.alias("t"))),
        lambda s: ~covered(s["i"]),
    )
    clean = F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    n_removed = F.size(toks) - F.size(kept)
    return (
        joined.withColumn(
            out, F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(clean)
        )
        .withColumn(
            "n_removed_tokens",
            F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(n_removed),
        )
        .drop("__spans")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window_tokens: int = 16,
    fingerprint: str = "md5",
) -> DataFrame:
    """EXACT substring-level duplicate spans at ARBITRARY offsets (the
    Lee et al. 2022 "Deduplicating Training Data" operation): any
    ``window_tokens``-token run that appears anywhere else in the corpus
    (or earlier in the same document) is a duplicate window; overlapping
    duplicate windows merge into maximal spans.

    This is strictly stronger than ``segment_dedup``: fixed segment
    boundaries miss a duplicated passage that straddles them, while a
    sliding window at every token offset cannot. The cost is the
    standard one: O(tokens x window) fingerprint work (each of the
    n-w+1 positions hashes a w-token slice) — map-only, embarrassingly
    parallel, the deliberate compute-for-recall trade the paper makes
    (their suffix-array variant trades memory instead; a sliding
    fingerprint is the shuffle-friendly distributed form).

    First occurrence wins, globally: the window's earliest (id, pos)
    keeps its tokens; every LATER occurrence is flagged. Winner
    selection is a groupBy-min on the window fingerprint + semi-join —
    NOT a row_number window over the fingerprint partition, which would
    single-task-sort the hottest fingerprint (a million-fold repeated
    boilerplate line). Span merging is gaps-and-islands over each
    document's flagged positions (window partitioned by doc — parallel
    across docs, bounded by doc length within).

    Returns one row per merged span: (id, span_start, span_end),
    1-based inclusive token positions.

    ``fingerprint`` picks the window-hash engine, both replayable in a
    SQL oracle:

    - ``"md5"``: md5 over the re-concatenated w-token slice at every
      position — n*w token bytes hashed per doc (the straightforward
      form; hash work scales with the window).
    - ``"rolling"``: Rabin-Karp polynomial. Each token is hashed ONCE
      (two 28-bit md5-hex slices), then every window fingerprint is a
      w-step modular fold of the precomputed longs under two
      independent 31-bit primes — the per-position cost drops from
      hashing ~window*token_len bytes to w multiply-adds, cutting the
      hash work by ~window_len. Double-modulus keys make cross-window
      collisions ~n^2/2^62 (vanishing); the md5 path doubles as the
      exactness cross-check in the property suite.
    """
    wins = window_fingerprints(df, id_col, text_col, window_tokens, fingerprint)
    firsts = wins.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("w0"),
        F.count(F.lit(1)).alias("cnt"),
    )
    dup = (
        wins.join(firsts.filter(F.col("cnt") > 1), "h")
        .filter(
            (F.col("id") != F.col("w0.id")) | (F.col("pos") != F.col("w0.pos"))
        )
        .select("id", "pos")
    )
    return merge_positions_to_spans(dup, window_tokens)


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window_tokens: int = 16,
    out: str = "clean_text",
    fingerprint: str = "md5",
) -> DataFrame:
    """Surgical removal of duplicated substrings: rewrite each document
    with every token inside a ``duplicate_spans`` span removed (the Lee
    et al. remediation — drop the repeated PASSAGE, keep the document).

    Adds ``out`` plus ``n_removed_tokens``. Docs with no flagged span
    pass through verbatim. See ``remove_spans`` for the rewrite shape.
    """
    spans = duplicate_spans(df, id_col, text_col, window_tokens, fingerprint)
    return remove_spans(df, spans, id_col, text_col, out)

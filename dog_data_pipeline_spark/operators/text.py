"""Text-analysis operators for LLM-training-data pipelines (north-star
ops, SURVEY §7.2 step 5): tokenization, quality scoring, language ID,
document fingerprinting, Gopher-style repetition signals, and
CCNet-style unigram-LM perplexity scoring.

All hot-path logic is pure column expressions (JVM-side, whole-stage
codegen) — no Python UDFs, with one documented exception:
``bpe_encode``'s per-word merge loop is data-dependent control flow no
Catalyst expression covers, so it rides an Arrow-batched pandas_udf
(the pyspark-guide-sanctioned slow path). Each column-expression
operator has an exact ANSI-SQL counterpart used by the DuckDB oracles
in queries.py; the BPE pair is certified by a differential pytest suite
against an independent reference implementation instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deterministic and SQL-replicable; order of LANGS is the tie-break.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para"],
}
LANGS = list(LANG_STOPWORDS)

TOKEN_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), TOKEN_SPLIT)


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(F.col(text_col))))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals + a combined score.

    Components (each SQL-replicable):
    - n_tokens: whitespace token count
    - avg_token_len: n_chars-without-spaces / n_tokens
    - stopword_ratio: fraction of tokens in the english stopword list
    - alpha_ratio: fraction of characters that are a-z/space
    quality = stopword_ratio * 0.3 + least(n_tokens,100)/100 * 0.4 + alpha_ratio * 0.3
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    no_space = F.regexp_replace(F.col(text_col), r"\s", "")
    avg_len = F.length(no_space) / n_tokens
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n_tokens
    alpha = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z ]", "")
    alpha_ratio = F.length(alpha) / F.length(F.col(text_col))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", avg_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn(
            "quality",
            stop_ratio * 0.3
            + F.least(n_tokens, F.lit(100)) / 100.0 * 0.4
            + alpha_ratio * 0.3,
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Language ID via stopword-hit-rate heuristic.

    Per language: fraction of tokens found in that language's stopword
    list; predict the argmax (ties broken by LANGS order; all-zero →
    'und'). Pure column expressions — a greatest()/CASE cascade.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    scores = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        scores[lang] = (F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n)
    best = F.greatest(*[scores[lang] for lang in LANGS])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in LANGS:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.withColumn(out, pred)


def normalized_text(text: Column) -> Column:
    """Normalization used by exact-dedup fingerprints: lowercase +
    collapse whitespace runs + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of normalized text (exact-dup key)."""
    return df.withColumn(out, F.md5(normalized_text(F.col(text_col))))


def with_rolling_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "rfp"
) -> DataFrame:
    """Order-sensitive document fingerprint via a chained-hash fold
    (two docs with the same tokens in different order get different
    fingerprints, unlike a token-set hash).

    rfp = fold(tokens, acc -> md5(acc || ':' || token)), acc0 = ''.
    Chaining through a hash instead of the classic ``acc*base +
    h(token)`` polynomial keeps the fold free of long arithmetic:
    Spark 4 defaults to ANSI mode, where 64-bit overflow THROWS instead
    of wrapping, so a polynomial fold over full-range token hashes
    aborts on any document with enough tokens to overflow. The chain
    hash is md5 (not xxhash64) deliberately: md5 is the one keyed hash
    both Spark and DuckDB implement bit-identically, so the fold is
    cross-engine reproducible and the registry query carries a full
    value-hash oracle (``list_reduce(list_prepend('', toks), (acc, t)
    -> md5(acc || ':' || t))``) instead of a rows-only check.
    """
    toks = tokens(F.col(text_col))
    return df.withColumn(
        out,
        F.aggregate(
            toks,
            F.lit(""),
            lambda acc, t: F.md5(F.concat(acc, F.lit(":"), t)),
        ),
    )


# GPT-2-style pre-tokenizer segments, simplified to the subset shared by
# Java regex (Spark) and RE2 (DuckDB) — no lookahead: a token is an
# optionally-space-prefixed letter run, digit run, or punctuation run.
BPE_TOKEN_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token count: the number of pre-tokenizer segments under a
    GPT-2-style regex — the standard cheap estimator for LLM token cost
    (real BPE merges only split WITHIN these segments, so this counts a
    lower bound with the same growth shape). Pure regexp_count column
    expression; no Python."""
    return df.withColumn(out, F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN)))


def with_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step before tokenization/packing (chunk
    size and overlap in TOKENS; stride = chunk_tokens - overlap).

    One row per (doc, chunk): (id_col, chunk_idx, chunk, n_chunk_tokens).
    The chunk array is built inside ONE generator expression
    (inline of transform(sequence(chunks))) — per-doc cost is
    O(tokens), the sequence is over chunk COUNTS (a handful per doc,
    unlike per-token sequences), and no computed column rides outside
    the Generate (the recompute-per-exploded-row trap). Map-only:
    chunking shuffles nothing at any scale.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk count: stop once a chunk reaches the end of the doc —
    # floor((n-1)/stride)+1 would emit a redundant trailing chunk that
    # is pure overlap whenever the last stride window is already covered
    # (found by the hypothesis differential: 4 tokens, size 4, stride 3)
    k = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens - 1) / stride).cast("int") + 2
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                "chunk"
            ),
            F.least(F.lit(chunk_tokens), n - i * stride).alias("n_chunk_tokens"),
        ),
    )
    return df.select(F.col(id_col), F.inline(chunks))


def token_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token unigram counts: (tok, cnt). One explode + one
    partial-aggregated groupBy(tok) shuffle — the training pass of the
    unigram LM below."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_cross_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    freq: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2020):
    per-document cross-entropy under an add-alpha-smoothed unigram LM,
    plus its exp (perplexity). Low perplexity = typical fluent text;
    the classic keep/head-middle-tail split filters on this.

    ``freq`` lets the LM be TRAINED on one corpus and APPLIED to
    another (the CCNet pattern: train on Wikipedia, score CommonCrawl);
    default trains on ``docs`` itself. Unseen tokens get the smoothing
    floor alpha / (total + alpha*vocab) via the left join, so scoring a
    disjoint corpus is well-defined.

    Scale shape: vocab follows Heaps' law (sub-linear in corpus size) —
    a few hundred MB at 100 TB — so the prob table is broadcast by
    default and the scoring pass is explode + broadcast-join +
    partial-aggregated groupBy(doc_id); set broadcast_vocab=False to
    fall back to a shuffle join on tok for pathological vocabularies.
    """
    if freq is None:
        freq = token_frequency_table(docs, text_col)
    stats = freq.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    counts = freq.select("tok", "cnt")
    if broadcast_vocab:
        counts = F.broadcast(counts)
    doc_toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # the 1-row stats broadcast attaches total/vocab everywhere, so seen
    # and unseen tokens share one smoothed formula (unseen: cnt -> 0)
    p = (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha)) / (
        F.col("__total") + F.lit(alpha) * F.col("__vocab")
    )
    return (
        doc_toks.join(counts, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.avg(-F.log(p)).alias("avg_nll"))
        .withColumn("ppl", F.exp(F.col("avg_nll")))
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram array (space-joined) from a token array, as a pure
    column expression: zip_with over n shifted slices. Empty array when
    the document has fewer than n tokens (slice length clamps to 0), so
    the expression never throws under ANSI mode."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, width)
    for i in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, i + 1, width), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def with_repetition_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 'repetitious text'), as pure column expressions:

    - dup_token_frac: 1 - distinct tokens / tokens (type-token ratio
      complement) — boilerplate and keyword-stuffed docs score high.
    - dup_trigram_frac: 1 - distinct trigrams / trigrams; 0.0 for docs
      with fewer than 3 tokens (matching the SQL oracle's CASE arm).

    Both are per-row expressions — no shuffle, whole-stage codegen; at
    100 TB this is a map-only pass. The most-covering-bigram fraction
    needs a per-doc mode and lives in the registry query (explode +
    two-level aggregate) rather than here.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    tri = word_ngrams(toks, 3)
    n_tri = F.size(tri)
    return df.withColumn(
        "dup_token_frac", F.lit(1.0) - F.size(F.array_distinct(toks)) / n
    ).withColumn(
        "dup_trigram_frac",
        F.when(
            n_tri > 0, F.lit(1.0) - F.size(F.array_distinct(tri)) / n_tri
        ).otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style scoring, reduced to
# its distributed essentials)
# ---------------------------------------------------------------------------

_QC_SALT = ":qc1"


def _hex_digit_value(c: Column) -> Column:
    """Value of one lowercase hex digit via ascii arithmetic — the one
    spelling ('0'-'9' -> 0-9, 'a'-'f' -> 10-15) that Spark and every SQL
    engine compute bit-identically (no locale, no conv())."""
    a = F.ascii(c)
    return F.when(a <= 57, a - 48).otherwise(a - 87)


def hashed_token_weight(t: Column, salt: str = _QC_SALT) -> Column:
    """Deterministic per-token weight in [-0.5, 0.5): the first 16 bits
    of md5(token||salt) scaled. Stands in for a learned embedding-hash
    weight table: the FEATURE-HASHING trick (hash token -> bucket ->
    weight) with the bucket-to-weight map itself a hash. Engine-portable
    by construction, so the classifier's every score is replayable in
    SQL — swap this for a broadcast learned table in production
    (``with_classifier_score_table``), the plan shape is unchanged.
    """
    h = F.md5(F.concat(t, F.lit(salt)))
    v = (
        (
            (_hex_digit_value(F.substring(h, 1, 1)) * 16
             + _hex_digit_value(F.substring(h, 2, 1))) * 16
            + _hex_digit_value(F.substring(h, 3, 1))
        ) * 16
        + _hex_digit_value(F.substring(h, 4, 1))
    )
    return v / F.lit(65536.0) - F.lit(0.5)


def with_classifier_score(
    df: DataFrame, text_col: str = "text", out: str = "clf_score"
) -> DataFrame:
    """Quality-classifier scoring pass: a linear model over hashed token
    features plus a stopword-density feature, calibrated with a
    HARD sigmoid (piecewise-linear, clamp(0.5 + logit/4)) instead of
    exp() — libm exp differs in the last ulp across engines, and a
    classifier whose keep/drop boundary is not bit-reproducible cannot
    be audited; the hard sigmoid is exact everywhere.

    logit = 4*mean(hashed weight) + 2*stopword_ratio; score in [0,1];
    ``out`` plus boolean ``{out}_keep`` (score > 0.5).

    Scale shape: pure per-row column expressions (fold over the token
    array) — map-only, whole-stage codegen, zero shuffle; scoring 100 TB
    is embarrassingly parallel. This is the standard second-stage filter
    after heuristic gates (the CCNet/fastText slot in curation DAGs).
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    sum_w = F.aggregate(
        F.transform(toks, lambda t: hashed_token_weight(t)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
    # score = clamp(0.5 + mean_w + stop_ratio/2) = hard_sigmoid(logit),
    # logit = 4*mean_w + 2*stop_ratio — computed in integer MICRO-UNITS:
    # floor(x*1e6 + 0.5) is a pure binary-double operation, so two
    # engines holding the same double get the same integer with no
    # decimal-string round() in the path (round(DOUBLE, n) is where
    # Spark — which rounds the shortest decimal repr HALF_UP — and
    # engines that round the raw binary value disagree on ties).
    mean_w_u = F.floor(sum_w / n * 1e6 + F.lit(0.5))
    half_sr_u = F.floor(stop_ratio / 2 * 1e6 + F.lit(0.5))
    score = (
        F.greatest(
            F.lit(0), F.least(F.lit(1000000), F.lit(500000) + mean_w_u + half_sr_u)
        )
        / F.lit(1000000.0)
    )
    return df.withColumn(out, score).withColumn(f"{out}_keep", F.col(out) > 0.5)


def with_classifier_score_table(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    token_col: str = "token",
    weight_col: str = "weight",
    out: str = "clf_score",
) -> DataFrame:
    """The production variant of ``with_classifier_score``: weights come
    from a LEARNED table (token, weight) — fastText/logreg export —
    broadcast to every executor; unseen tokens weigh 0.

    Explode tokens -> broadcast-hash join against the weight table ->
    groupBy(doc) mean. One shuffle keyed on the doc id (partial agg
    combines map-side); the weight table rides the broadcast, so no
    shuffle scales with vocabulary. Vocabularies beyond broadcast size
    (rare — 10M tokens x 12B fits) fall back to a shuffle join by
    dropping the hint.
    """
    keyed = df.select(F.col("*"), F.monotonically_increasing_id().alias("__rid"))
    tok = keyed.select(
        "__rid", F.explode(tokens(F.col(text_col))).alias(token_col)
    )
    scored = (
        tok.join(F.broadcast(weights), token_col, "left")
        .groupBy("__rid")
        .agg(F.avg(F.coalesce(F.col(weight_col), F.lit(0.0))).alias(out))
    )
    return keyed.join(scored, "__rid", "left").drop("__rid")


def with_blocklist_profile(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    max_hit_frac: float = 0.0,
) -> DataFrame:
    """C4-style word-blocklist screening: per-document blocklist hit
    count and fraction, plus a ``blocked`` flag (C4 drops a page on ANY
    hit — ``max_hit_frac=0.0``; raise it for a tolerance policy).

    The blocklist rides the plan as an array literal (these lists are
    hundreds to low-thousands of words — plan-literal size is fine; a
    100k-term list would switch to the broadcast-join form of
    ``with_classifier_score_table``). Matching is exact-token, the
    standard C4 criterion; substring matching over-blocks (the classic
    'Scunthorpe' failure) and belongs to a regex pass instead.

    Map-only column expressions — zero shuffle at any scale.
    """
    toks = tokens(F.lower(F.col(text_col)))
    bl = F.array(*[F.lit(w.lower()) for w in blocklist])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(bl, t)))
    out = df.withColumn("n_blocklist_hits", hits).withColumn(
        "blocklist_hit_frac_u",
        F.floor(hits / n * 1e6 + F.lit(0.5)).cast("long"),
    )
    if max_hit_frac > 0.0:
        blocked = F.col("blocklist_hit_frac_u") > int(max_hit_frac * 1e6)
    else:
        blocked = F.col("n_blocklist_hits") > 0
    return out.withColumn("blocked", blocked)


def char_entropy_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (in
    nats) — the cheap gibberish/repetition gauge: natural prose sits
    around 2.7-3.2 nats, single-character spam near 0, uniform random
    bytes near ln(alphabet). Complements the token-level Gopher
    signals with a sub-token one.

    Shape: explode to (doc, char) → one partially-aggregated
    groupBy((doc, char)) → one groupBy(doc) fold — shuffle volume is
    distinct (doc, char) pairs (bounded by |doc| × alphabet), and the
    entropy sum runs over each doc's small char histogram. Returns
    (id_col, n_chars, entropy).
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__c")
    ).filter(F.length("__c") > 0)
    hist = chars.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("__n"))
    return (
        hist.groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_chars"),
            F.sum(F.col("__n") * F.log("__n")).alias("__nlogn"),
        )
        .select(
            id_col,
            F.col("n_chars").cast("long").alias("n_chars"),
            # H = ln(N) - (1/N) sum n_c ln n_c  — one fold, no division
            # inside the aggregate (keeps the float op count minimal)
            (F.log("n_chars") - F.col("__nlogn") / F.col("n_chars")).alias("entropy"),
        )
    )


def build_vocab(df: DataFrame, text_col: str = "text", size: int = 512) -> DataFrame:
    """Reference vocabulary: the corpus's top-``size`` tokens by
    frequency, tie-broken lexicographically — fully deterministic, so
    an oracle (or a later run) rebuilds the identical vocab. One
    partial-aggregated token-count shuffle + TakeOrdered(size): the
    full token histogram never sits on the driver, only the top slice.
    Returns a single-column (tok) DataFrame, small enough to broadcast.
    """
    tok = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")).filter(
        F.length("tok") > 0
    )
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(size).select("tok")
    )


def vocab_coverage_report(
    df: DataFrame,
    vocab: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group OOV (out-of-vocabulary) rate against a reference
    vocabulary — the tokenizer-fit report run before committing a vocab
    to a training run (a source whose OOV rate spikes will fragment
    into byte-fallback tokens and blow up its effective token budget).

    Returns (group_col, n_tokens, n_oov, oov_rate[4dp]).

    Scale shape: the vocab side is |vocab| rows (even a 256k BPE vocab
    is MBs) — **broadcast** left join onto the exploded corpus token
    stream, then one partial-aggregated per-group fold. The corpus
    never shuffles tokens by value; the only exchange is |groups| rows.
    """
    tok = df.select(
        F.col(group_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).filter(F.length("tok") > 0)
    v = F.broadcast(vocab.select("tok").withColumn("__v", F.lit(1)))
    return (
        tok.join(v, "tok", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__v").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            group_col,
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    end_of_word: str = "</w>",
    max_words: int | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Byte-pair-encoding tokenizer induction (Sennrich et al. 2016,
    'Neural Machine Translation of Rare Words with Subword Units') as
    distributed aggregation: learn ``num_merges`` merge rules from the
    corpus and return (merges, final symbolized word-frequency table).

    The scale trick is the one from the paper itself: BPE statistics
    depend only on the WORD-FREQUENCY table, not the raw corpus — so the
    corpus is touched exactly once (token explode + groupBy word), and
    every merge iteration runs over |distinct words| rows (a 100 TB
    corpus has a bounded word table; Heaps' law puts it in the tens of
    millions — still distributed here, never driver-side). Per
    iteration:

    1. adjacent symbol pairs via zip_with over two slices of the symbol
       array (map-only), weighted by word count;
    2. one partial-aggregated groupBy(pair) + TakeOrdered(1) — the
       argmax pair, tie-broken (freq desc, left asc, right asc) for
       full determinism; ONE row reaches the driver per iteration;
    3. greedy left-to-right merge application as a higher-order
       aggregate fold over each symbol array (map-only, no UDF);
       the state is localCheckpoint'ed each round so the lazy plan
       doesn't nest ``num_merges`` folds.

    Driver traffic: num_merges rows total. Returns the merge list
    [(left, right, freq)] in learned order plus the final (word, n,
    symbols) DataFrame for downstream vocab extraction.

    **Real tokenizer training (32k+ merges) must set ``max_words``.**
    Each merge is one Spark job over the word table — honest and cheap
    at ``num_merges=8``, but 32k merges schedule 32k sequential jobs.
    The standard fix (what SentencePiece/HF trainers do) is learning
    from a TRUNCATED word-frequency table: ``max_words`` keeps only the
    most frequent words (deterministic tie-break on the word itself),
    which bounds every iteration's input to a constant-size table that
    fits a handful of partitions, while the head of the frequency
    distribution — which is all BPE statistics ever see at real corpus
    sizes — is preserved exactly. ``None`` (default) keeps every word:
    identical behavior to previous rounds.
    """
    toks = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.length("w") > 0)
    )
    words = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    if max_words is not None:
        # TakeOrdered plan (orderBy+limit): never a full sort at scale
        words = words.orderBy(F.col("n").desc(), F.col("w")).limit(max_words)
    # initial symbol state: characters + end-of-word marker
    state = words.select(
        "w",
        "n",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(end_of_word))
        ).alias("symbols"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        sz = F.size("symbols")
        pairs = state.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice("symbols", 1, sz - 1),
                    F.slice("symbols", 2, sz - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["freq"]
        merges.append((left, right, int(freq)))
        merged = F.lit(left + right)
        # greedy left-to-right application: fold each symbol array,
        # merging the current element into the accumulator's tail when
        # (tail, current) == (left, right). Equivalent to the reference
        # scan because a just-created merge token never re-matches
        # ``left`` unless it lexically equals it — in which case greedy
        # rescanning is exactly what BPE specifies.
        state = state.withColumn(
            "symbols",
            F.aggregate(
                "symbols",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
                    & (x == F.lit(right)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        ).localCheckpoint(eager=True)
    return merges, state


def bpe_vocab(state: DataFrame) -> DataFrame:
    """Final subword vocabulary from a ``bpe_learn_merges`` state:
    (symbol, n_words, total_occurrences), one partial-aggregated
    explode — the artifact a tokenizer ships."""
    return (
        state.select("n", F.explode("symbols").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("total_occurrences"),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[str, str, int]]",
    text_col: str = "text",
    out: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Apply a learned BPE merge list (from ``bpe_learn_merges``) to
    text — the ENCODE half of the tokenizer: returns ``out`` as
    array<string> of subword tokens.

    Standard rank-based encoding (the algorithm every BPE runtime
    ships): per word, repeatedly merge the lowest-rank adjacent pair
    until none applies. The merge table is tiny (the vocab) and rides
    the UDF closure to every executor; the corpus pass is map-only —
    this is the documented Pandas-UDF exception (pyspark guide): a
    data-dependent while-loop per word has no Catalyst expression, and
    Arrow batching keeps it off the row-at-a-time path. Words repeat
    heavily in natural corpora, so encoded word shapes are memoized per
    batch (the hot-path trick of real tokenizers).
    """

    ranks = {(l, r): i for i, (l, r, _f) in enumerate(merges)}

    def _encode_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w) + [end_of_word]
        while len(syms) > 1:
            best = None
            best_rank = len(ranks)
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and rk < best_rank:
                    best, best_rank = i, rk
            if best is None:
                break
            # merge ALL occurrences of the best pair left-to-right (the
            # learner's greedy application), then rescan for next rank
            l, r = syms[best], syms[best + 1]
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        cache[w] = syms
        return syms

    import re

    # MUST match the learner's word split exactly: tokens() splits on
    # Java \s+, which is ASCII whitespace only — Python str.split()
    # splits on all Unicode whitespace and would break encode/learn
    # consistency on e.g. NBSP-joined words (learned as one word,
    # encoded as two)
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out_rows = []
        for t in texts:
            # no str.strip(): it eats Unicode whitespace (NBSP) that the
            # JVM trim/split keeps inside words; the split+filter pair
            # already discards ASCII edge whitespace
            toks_ = [w for w in _ws.split((t or "").lower()) if w]
            row: list[str] = []
            for w in toks_:
                row.extend(_encode_word(w, cache))
            out_rows.append(row)
        return pd.Series(out_rows)

    return df.withColumn(out, _enc(F.col(text_col)))


def bigram_lm_cross_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document cross-entropy under an add-alpha-smoothed BIGRAM
    LM: P(w2|w1) = (C(w1 w2) + alpha) / (C(w1) + alpha*V). The
    conditional-context upgrade over ``lm_cross_entropy`` — fluent
    word ORDER now scores better than a bag of frequent words, which
    is what separates natural prose from keyword soup at equal
    unigram mass (the KenLM-filtering idea at n=2).

    Returns (id_col, n_bigrams, avg_nll, ppl); documents with fewer
    than two tokens have no bigrams and drop out.

    Scale shape: this is the engine's JOIN-path LM — bigram tables
    grow ~quadratically in vocab and outgrow a broadcast long before
    unigram vocabs do, so the scoring stream shuffle-joins against the
    count tables on (bigram) and (w1) with partial aggregation on both
    training passes and the final per-doc fold. No broadcast of
    unbounded state anywhere; AQE may still choose broadcast when a
    table is actually small. ``train`` scores one corpus under a model
    counted on another (the CCNet pattern).
    """
    scored = _bigram_nll_stream(docs, id_col, text_col, alpha, train)
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("nll").alias("avg_nll"),
        )
        .withColumn("ppl", F.exp(F.col("avg_nll")))
    )


def _bigram_nll_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float,
    train: DataFrame | None,
) -> DataFrame:
    """Shared bigram-LM scoring stream: (id_col, pos, nll) with pos the
    1-based bigram position — the per-document fold consumes it for
    perplexity, the windowed span detector for localization."""
    if train is None:
        train = docs
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat(a, F.lit(" "), b).alias("bg")
        ),
    )
    uni = token_frequency_table(train, text_col).withColumnRenamed(
        "tok", "w1"
    )
    big = (
        train.select(F.explode(pair).alias("p"))
        .select(F.col("p.bg").alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("bcnt"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("__vocab"))
    stream = docs.select(
        F.col(id_col), F.posexplode(pair).alias("__p0", "p")
    ).select(
        id_col,
        (F.col("__p0") + 1).alias("pos"),
        F.col("p.w1").alias("w1"),
        F.col("p.bg").alias("bg"),
    )
    p = F.try_divide(
        F.coalesce(F.col("bcnt"), F.lit(0)) + F.lit(alpha),
        F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha) * F.col("__vocab"),
    )
    return (
        stream.join(big, "bg", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, "pos", (-F.log(p)).alias("nll"))
    )


def incoherent_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 8,
    threshold: float = 3.6,
    alpha: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """Localize INCOHERENT token runs inside otherwise-keepable
    documents: windows of ``window`` consecutive bigrams whose mean
    bigram-LM cross-entropy reaches ``threshold`` are flagged and
    merged into maximal spans — the span-surgery idea of
    ``duplicate_spans``/``contamination_spans`` pointed at LM quality
    (drop the garbled paste-damage segment, keep the document; the
    line-level filtering of RefinedWeb generalized to model-scored
    spans).

    Returns (id, span_start, span_end): 1-based inclusive TOKEN
    positions (a window starting at bigram pos covers tokens
    pos..pos+window). Only full windows score (the incomplete-window
    drop rule, T2). The window mean is rounded to 4 decimals BEFORE
    thresholding — the cross-engine determinism contract.

    Scale shape: the scoring stream is the shared shuffle-join LM; the
    windowed mean partitions BY DOCUMENT (parallel across docs, bounded
    within); the islands merge is the existing spans engine.
    """
    from dog_data_pipeline_spark.operators.dedup import (
        merge_positions_to_spans,
    )

    scored = _bigram_nll_stream(docs, id_col, text_col, alpha, train)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    flagged = (
        scored.select(
            F.col(id_col).alias("id"),
            "pos",
            F.round(F.avg("nll").over(w), 4).alias("__m"),
            F.count(F.lit(1)).over(w).alias("__c"),
        )
        .filter((F.col("__c") == window) & (F.col("__m") >= threshold))
        .select("id", "pos")
    )
    return merge_positions_to_spans(flagged, window + 1)


def zipf_spectrum(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group token rank-frequency (Zipf) audit: natural language
    sits near slope -1 on the log-log rank/frequency line (Zipf 1949;
    Piantadosi 2014 review); machine-generated filler, keyword spam,
    and template boilerplate bend it — a cheap corpus-health screen
    per source/lang before any model-based scoring.

    Emits (group, n_types, n_tokens, zipf_slope, top10_coverage, ttr):
    the least-squares slope of ln(freq) on ln(rank) over ALL types
    (regr_slope — a streaming covariance aggregate, JVM-side), the
    token-mass share of the 10 most frequent types, and the type-token
    ratio.

    Scale shape: one partial-aggregated groupBy((group, token)) — the
    only corpus-sized shuffle, carrying (group, token, count) partials;
    the rank window partitions by group over the VOCABULARY (Heaps-law
    sublinear in corpus size), not the corpus; the final per-group agg
    is another partial. Rank ties break (count desc, token asc) so the
    ranking — and therefore the slope — is deterministic across
    engines and partitionings.
    """
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    freq = toks.groupBy("__g", "__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy("__g").orderBy(F.desc("__cnt"), F.col("__tok"))
    ranked = freq.withColumn("__rank", F.row_number().over(w))
    top10 = F.when(F.col("__rank") <= 10, F.col("__cnt")).otherwise(F.lit(0))
    return ranked.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("__cnt").alias("n_tokens"),
        F.round(
            F.regr_slope(F.log("__cnt"), F.log("__rank")), 4
        ).alias("zipf_slope"),
        F.round(
            F.sum(top10).cast("double") / F.sum("__cnt"), 4
        ).alias("top10_coverage"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("__cnt"), 4
        ).alias("ttr"),
    ).withColumnRenamed("__g", group_col)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
    top_k: int = 25,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information: adjacent
    word pairs whose joint frequency beats the independence prediction
    of their unigram frequencies (Church & Hanks 1990).

        p(a,b) = n_ab / B      p(w) = n_w / T
        ratio  = p(a,b) / (p(a) * p(b))        PMI = ln(ratio)

    with B = total bigram tokens and T = total unigram tokens. High-
    ratio pairs are multi-word units ("ipsum lorem"-style boilerplate,
    named entities, idioms) — the units a tokenizer or a dedup
    shingler should treat atomically.

    Scale shape: two corpus passes, each one partial-aggregated groupBy
    (unigram counts, bigram counts); both totals ride along as 1-row
    broadcast joins, and the unigram table (vocabulary-sized, Heaps-law
    sublinear) broadcasts onto the bigram counts. min_pair_count prunes
    the singleton-bigram tail before any join; the top-k is a
    TakeOrdered, never a full sort. The ratio is pure mul/div (IEEE
    exact-rounded, bit-identical on any engine); the log is computed
    last and only for display.
    """
    toks = tokens_alpha(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    t_total = uni.agg(F.sum("n_w").cast("double").alias("t_tokens"))
    big = (
        df.select(F.explode(word_ngrams(toks, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(int(min_pair_count)))
    )
    b_total = (
        df.select(
            F.greatest(F.size(toks) - 1, F.lit(0)).alias("__nb")
        ).agg(F.sum("__nb").cast("double").alias("b_bigrams"))
    )
    split = big.select(
        "bigram",
        "n_ab",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    ua = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a")))
    ub = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b")))
    joined = (
        split.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(b_total))
    )
    ratio = (F.col("n_ab") / F.col("b_bigrams")) / (
        (F.col("n_a") / F.col("t_tokens")) * (F.col("n_b") / F.col("t_tokens"))
    )
    out = joined.select(
        "w1",
        "w2",
        "n_a",
        "n_b",
        "n_ab",
        ratio.alias("assoc_ratio"),
        F.log(ratio).alias("pmi"),
    )
    return out.orderBy(F.col("assoc_ratio").desc(), "w1", "w2").limit(top_k)


def tokens_alpha(text: Column) -> Column:
    """Lowercase alphabetic-run tokens (the top_bigrams idiom): split
    on non-[a-z] and drop empties. ASCII letter runs are engine-
    portable — both Java and RE2-style regex agree on [^a-z]+."""
    return F.filter(F.split(F.lower(text), "[^a-z]+"), lambda x: x != "")

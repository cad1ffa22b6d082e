"""Text-analysis operator tests that MATERIALIZE the computed columns.

The round-1 rolling-fingerprint defect (ANSI ARITHMETIC_OVERFLOW in the
fold) slipped through because nothing collected the ``rfp`` column —
``count()`` pruned it. These tests collect every computed column.
"""

from __future__ import annotations

from dog_data_pipeline_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_rolling_fingerprint,
    with_token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id STRING, text STRING")


def test_rolling_fingerprint_collects_without_overflow(spark):
    # 40-token doc: the old polynomial fold overflowed (and ANSI-threw)
    # by token ~2; the chained-hash fold must materialize fine.
    long_doc = " ".join(f"tok{i}" for i in range(40))
    df = _docs(spark, [("a", long_doc), ("b", "one two three")])
    out = {r["doc_id"]: r["rfp"] for r in with_rolling_fingerprint(df).collect()}
    assert set(out) == {"a", "b"}
    # md5-chain fold: 32-hex-char fingerprints
    assert all(isinstance(v, str) and len(v) == 32 for v in out.values())


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = _docs(spark, [("fwd", "alpha beta gamma"), ("rev", "gamma beta alpha")])
    out = {r["doc_id"]: r["rfp"] for r in with_rolling_fingerprint(df).collect()}
    assert out["fwd"] != out["rev"]


def test_rolling_fingerprint_is_deterministic(spark):
    df = _docs(spark, [("x", "the quick brown fox"), ("y", "the quick brown fox")])
    out = {r["doc_id"]: r["rfp"] for r in with_rolling_fingerprint(df).collect()}
    assert out["x"] == out["y"]


def test_registry_rolling_fingerprint_materializes(spark):
    from dog_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["rolling_fingerprint"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r["rfp"] is not None for r in rows)


def test_quality_and_lang_and_fingerprint_materialize(spark):
    df = _docs(
        spark,
        [
            ("en1", "the cat sat of the mat and it is for real"),
            ("de1", "der hund und die katze ist ein tier mit fell"),
            ("und1", "zzz qqq xxx"),
        ],
    )
    out = with_fingerprint(with_lang_id(with_quality_score(with_token_count(df))))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["en1"]["pred_lang"] == "en"
    assert rows["de1"]["pred_lang"] == "de"
    assert rows["und1"]["pred_lang"] == "und"
    for r in rows.values():
        assert r["n_tokens"] > 0
        assert 0.0 <= r["quality"] <= 1.5
        assert len(r["fingerprint"]) == 32


def test_repetition_profile_scores_repetitive_doc_high(spark):
    from dog_data_pipeline_spark.operators.text import with_repetition_profile

    df = _docs(
        spark,
        [
            ("rep", "spam spam spam spam spam spam spam spam"),
            ("uniq", "eight distinct tokens appear exactly once here today"),
            ("tiny", "ab"),  # < 3 tokens: trigram frac must be 0.0, not an error
        ],
    )
    rows = {r["doc_id"]: r for r in with_repetition_profile(df).collect()}
    assert rows["rep"]["dup_token_frac"] > 0.8
    assert rows["rep"]["dup_trigram_frac"] > 0.8
    assert rows["uniq"]["dup_token_frac"] == 0.0
    assert rows["uniq"]["dup_trigram_frac"] == 0.0
    assert rows["tiny"]["dup_trigram_frac"] == 0.0


def test_word_ngrams_window_shapes(spark):
    from dog_data_pipeline_spark.operators.text import tokens, word_ngrams
    from pyspark.sql import functions as F

    df = _docs(spark, [("a", "one two three four")])
    row = df.select(
        word_ngrams(tokens(F.col("text")), 2).alias("bi"),
        word_ngrams(tokens(F.col("text")), 5).alias("five"),
    ).collect()[0]
    assert row["bi"] == ["one two", "two three", "three four"]
    assert row["five"] == []  # shorter than n -> empty, ANSI-safe


def test_lm_cross_entropy_rare_tokens_score_higher(spark):
    from dog_data_pipeline_spark.operators.text import lm_cross_entropy

    df = _docs(
        spark,
        [
            ("common", "the the the the the the"),
            ("rare", "xylophone quixotic zephyr"),
        ],
    )
    rows = {r["doc_id"]: r for r in lm_cross_entropy(df, "doc_id").collect()}
    assert rows["rare"]["avg_nll"] > rows["common"]["avg_nll"]
    for r in rows.values():
        assert abs(r["ppl"] - __import__("math").exp(r["avg_nll"])) < 1e-9


def test_lm_cross_entropy_pretrained_freq_handles_unseen(spark):
    from dog_data_pipeline_spark.operators.text import (
        lm_cross_entropy,
        token_frequency_table,
    )

    train = _docs(spark, [("t1", "alpha beta gamma alpha")])
    freq = token_frequency_table(train)
    score = _docs(spark, [("s1", "alpha neverseen")])
    rows = lm_cross_entropy(score, "doc_id", freq=freq).collect()
    assert len(rows) == 1  # unseen token floors, doesn't drop the doc
    import math

    # alpha: (2+.5)/(4+.5*3)=2.5/5.5; neverseen: .5/5.5
    expect = -(math.log(2.5 / 5.5) + math.log(0.5 / 5.5)) / 2
    assert abs(rows[0]["avg_nll"] - expect) < 1e-9


def test_repetition_fracs_bounded_on_corpus(spark):
    from dog_data_pipeline_spark.operators.text import with_repetition_profile
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    out = with_repetition_profile(load(spark, SF_DIR, "documents"))
    bad = out.filter(
        (F.col("dup_token_frac") < 0) | (F.col("dup_token_frac") >= 1)
        | (F.col("dup_trigram_frac") < 0) | (F.col("dup_trigram_frac") >= 1)
    ).count()
    assert bad == 0


def test_chunking_covers_and_overlaps(spark):
    from dog_data_pipeline_spark.operators.text import with_chunks

    text = " ".join(f"t{i}" for i in range(50))
    df = _docs(spark, [("d", text)])
    rows = sorted(
        with_chunks(df, "doc_id", chunk_tokens=20, overlap=5).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 15 over 50 tokens -> starts 0,15,30; the start-45 window is
    # already fully covered by chunk 2 (reaches token 50), so no 4th
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["chunk"].split()[:1] == ["t0"]
    # overlap: chunk 1 starts 5 tokens before chunk 0 ends
    assert rows[0]["chunk"].split()[-5:] == rows[1]["chunk"].split()[:5]
    assert rows[-1]["n_chunk_tokens"] == 20  # tokens 30..49
    # every token appears in some chunk
    seen = {t for r in rows for t in r["chunk"].split()}
    assert seen == {f"t{i}" for i in range(50)}


def test_chunking_short_doc_single_chunk(spark):
    from dog_data_pipeline_spark.operators.text import with_chunks

    df = _docs(spark, [("s", "just three tokens")])
    rows = with_chunks(df, "doc_id", chunk_tokens=32, overlap=8).collect()
    assert len(rows) == 1
    assert rows[0]["chunk"] == "just three tokens"
    assert rows[0]["n_chunk_tokens"] == 3


# ---------------------------------------------------------------------------
# blocklist screening
# ---------------------------------------------------------------------------

def test_blocklist_any_hit_blocks(spark):
    from dog_data_pipeline_spark.operators.text import with_blocklist_profile

    df = spark.createDataFrame(
        [(1, "clean text here"), (2, "one BAD token"), (3, "bad bad bad")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in with_blocklist_profile(df, ["bad"], "text").collect()
    }
    assert not out[1]["blocked"] and out[1]["n_blocklist_hits"] == 0
    assert out[2]["blocked"] and out[2]["n_blocklist_hits"] == 1  # case-folded
    assert out[3]["blocked"] and out[3]["n_blocklist_hits"] == 3
    assert out[3]["blocklist_hit_frac_u"] == 1_000_000


def test_blocklist_tolerance_policy(spark):
    from dog_data_pipeline_spark.operators.text import with_blocklist_profile

    df = spark.createDataFrame(
        [(1, "bad a b c d e f g h i")],  # 1/10 hits
        ["doc_id", "text"],
    )
    lax = with_blocklist_profile(df, ["bad"], "text", max_hit_frac=0.2).collect()[0]
    assert not lax["blocked"]
    strict = with_blocklist_profile(df, ["bad"], "text", max_hit_frac=0.05).collect()[0]
    assert strict["blocked"]


def test_blocklist_exact_token_not_substring(spark):
    from dog_data_pipeline_spark.operators.text import with_blocklist_profile

    df = spark.createDataFrame([(1, "scunthorpe is fine")], ["doc_id", "text"])
    row = with_blocklist_profile(df, ["thor"], "text").collect()[0]
    assert not row["blocked"]


def test_char_entropy_extremes(spark):
    import math

    from dog_data_pipeline_spark.operators.text import char_entropy_profile

    df = _docs(spark, [("mono", "aaaaaaaa"), ("uni", "abcd")])
    out = {r["doc_id"]: r for r in char_entropy_profile(df, "doc_id").collect()}
    assert out["mono"]["entropy"] == 0.0  # single symbol: zero entropy
    assert abs(out["uni"]["entropy"] - math.log(4)) < 1e-12  # uniform: ln(k)
    assert out["mono"]["n_chars"] == 8 and out["uni"]["n_chars"] == 4


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV
# ---------------------------------------------------------------------------


def test_build_vocab_deterministic_topk_with_ties(spark):
    from dog_data_pipeline_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        [("b b a a c",), ("d d b a",)], "text STRING"
    )
    # counts: a=3, b=3, d=2, c=1 -> top3 by (cnt desc, tok asc) = a, b, d
    got = {r["tok"] for r in build_vocab(df, size=3).collect()}
    assert got == {"a", "b", "d"}


def test_vocab_coverage_counts_oov_occurrences(spark):
    from dog_data_pipeline_spark.operators.text import (
        build_vocab,
        vocab_coverage_report,
    )

    df = spark.createDataFrame(
        [("s1", "a a b zzz"), ("s2", "QQQ qqq a")],
        "source STRING, text STRING",
    )
    vocab = build_vocab(df, size=2)  # a (4: incl lowered QQQ->qqq? no: a=3,qqq=2,b=1,zzz=1) -> {a, qqq}
    out = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_coverage_report(df, vocab, "source", "text").collect()
    }
    # vocab = top2 = a(3), qqq(2); s1: tokens a,a,b,zzz -> 2 oov
    assert out["s1"] == (4, 2, 0.5)
    # s2: QQQ lowers to qqq (in vocab), qqq, a -> 0 oov
    assert out["s2"] == (3, 0, 0.0)


# ---------------------------------------------------------------------------
# BPE tokenizer induction
# ---------------------------------------------------------------------------


def _ref_bpe(word_counts, num_merges, eow="</w>"):
    """Reference BPE (Sennrich et al.) on a word-frequency dict."""
    state = {w: list(w) + [eow] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in state.items():
            n = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # argmax, tie-break (freq desc, left asc, right asc)
        (l, r), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, f))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            state[w] = out
    return merges, state


def test_bpe_matches_reference_on_classic_corpus(spark):
    from dog_data_pipeline_spark.operators.text import bpe_learn_merges

    # the corpus from the BPE paper's worked example (word level)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(" ".join([w] * n),) for w, n in wc.items()]
    df = spark.createDataFrame(rows, "text STRING")
    merges, state = bpe_learn_merges(df, num_merges=6)
    ref_merges, ref_state = _ref_bpe(wc, 6)
    assert merges == ref_merges
    got = {r["w"]: r["symbols"] for r in state.collect()}
    assert got == ref_state


def test_bpe_max_words_truncates_word_table(spark):
    """The real-vocab-size knob: max_words keeps only the head of the
    word-frequency table (deterministic tie-break), so statistics come
    from the frequent words only. With max_words covering all words the
    result is identical to the default."""
    from dog_data_pipeline_spark.operators.text import bpe_learn_merges

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(" ".join([w] * n),) for w, n in wc.items()]
    df = spark.createDataFrame(rows, "text STRING")

    # covering cap == default behavior
    m_all, _ = bpe_learn_merges(df, num_merges=4)
    m_cap, _ = bpe_learn_merges(df, num_merges=4, max_words=10)
    assert m_all == m_cap

    # truncating cap learns from the top-2 words only (newest=6, low=5)
    m2, state2 = bpe_learn_merges(df, num_merges=4, max_words=2)
    ref_merges, _ = _ref_bpe({"newest": 6, "low": 5}, 4)
    assert m2 == ref_merges
    assert state2.count() == 2


def test_bpe_greedy_overlap_semantics(spark):
    from dog_data_pipeline_spark.operators.text import bpe_learn_merges

    # "aaa": merge (a,a) applies left-to-right -> [aa, a], never [a, aa]
    df = spark.createDataFrame([("aaa aaa",)], "text STRING")
    merges, state = bpe_learn_merges(df, num_merges=1)
    assert merges[0][:2] == ("a", "a")
    syms = state.collect()[0]["symbols"]
    assert syms == ["aa", "a", "</w>"]


def test_bpe_property_matches_reference(spark):
    """Randomized differential: small random corpora, full merge run."""
    import random

    from dog_data_pipeline_spark.operators.text import bpe_learn_merges

    rng = random.Random(42)
    for trial in range(3):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(2, 8))
        ]
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + rng.randint(1, 4)
        text = " ".join(w for w, n in wc.items() for _ in range(n))
        df = spark.createDataFrame([(text,)], "text STRING")
        merges, state = bpe_learn_merges(df, num_merges=4)
        ref_merges, ref_state = _ref_bpe(wc, 4)
        assert merges == ref_merges, (trial, wc)
        got = {r["w"]: r["symbols"] for r in state.collect()}
        assert got == ref_state, (trial, wc)


def test_bpe_vocab_totals(spark):
    from dog_data_pipeline_spark.operators.text import bpe_learn_merges, bpe_vocab

    df = spark.createDataFrame([("ab ab ba",)], "text STRING")
    merges, state = bpe_learn_merges(df, num_merges=1)
    v = {r["symbol"]: (r["n_words"], r["total_occurrences"]) for r in bpe_vocab(state).collect()}
    # merge (a,b) freq 2 -> words: ab=[ab,</w>] x2, ba=[b,a,</w>] x1
    assert merges == [("a", "b", 2)]
    assert v["ab"] == (1, 2)
    assert v["b"] == (1, 1) and v["a"] == (1, 1)
    assert v["</w>"] == (2, 3)


def _ref_encode(w, merges, eow="</w>"):
    ranks = {(l, r): i for i, (l, r, _f) in enumerate(merges)}
    syms = list(w) + [eow]
    while len(syms) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        rk, _ = min(cand)
        l, r = merges[rk][0], merges[rk][1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_reproduces_learner_state_on_training_corpus(spark):
    from dog_data_pipeline_spark.operators.text import bpe_encode, bpe_learn_merges

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(" ".join([w] * n),) for w, n in wc.items()]
    df = spark.createDataFrame(rows, "text STRING")
    merges, state = bpe_learn_merges(df, num_merges=6)
    learned = {r["w"]: r["symbols"] for r in state.collect()}
    enc = bpe_encode(
        spark.createDataFrame([(w,) for w in wc], "text STRING"), merges
    )
    got = {r["text"]: r["bpe_tokens"] for r in enc.collect()}
    # rank-order encoding of each training word == the learner's final
    # symbolization (the classic BPE encode/learn consistency property)
    assert got == learned


def test_bpe_encode_matches_reference_on_unseen_words(spark):
    import random

    from dog_data_pipeline_spark.operators.text import bpe_encode, bpe_learn_merges

    rng = random.Random(7)
    train = " ".join(
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
        for _ in range(30)
    )
    merges, _ = bpe_learn_merges(
        spark.createDataFrame([(train,)], "text STRING"), num_merges=5
    )
    unseen = ["abcddd", "dcba", "aaaa", "xyz", "a"]
    enc = bpe_encode(
        spark.createDataFrame([(w,) for w in unseen], "text STRING"), merges
    )
    got = {r["text"]: r["bpe_tokens"] for r in enc.collect()}
    for w in unseen:
        assert got[w] == _ref_encode(w, merges), w


def test_bpe_encode_multiword_and_case_normalization(spark):
    from dog_data_pipeline_spark.operators.text import bpe_encode

    merges = [("a", "b", 99)]
    enc = bpe_encode(
        spark.createDataFrame([("AB  ab\tAb",)], "text STRING"), merges
    )
    assert enc.collect()[0]["bpe_tokens"] == [
        "ab", "</w>", "ab", "</w>", "ab", "</w>"
    ]


def test_bpe_encode_nbsp_word_matches_learner_split(spark):
    from dog_data_pipeline_spark.operators.text import bpe_encode, bpe_learn_merges

    # NBSP is NOT whitespace to the JVM \s+ learner split: the learner
    # sees ONE word 'a b'; the encoder must agree, not split it
    text = "a b a b"
    df = spark.createDataFrame([(text,)], "text STRING")
    merges, state = bpe_learn_merges(df, num_merges=2)
    learned = {r["w"]: r["symbols"] for r in state.collect()}
    assert list(learned) == ["a b"]
    got = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    assert got == learned["a b"] * 2


def test_bigram_lm_prefers_fluent_order_over_shuffled(spark):
    """Same unigram mass, different order: the bigram LM must score the
    corpus-typical order lower-perplexity than the shuffled one."""
    from dog_data_pipeline_spark.operators.text import bigram_lm_cross_entropy

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id BIGINT, text STRING",
    )
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r["ppl"]
        for r in bigram_lm_cross_entropy(probe, train=train).collect()
    }
    assert out[100] < out[101]


def test_bigram_lm_exact_probabilities_tiny_case(spark):
    import math

    from dog_data_pipeline_spark.operators.text import bigram_lm_cross_entropy

    # corpus: one doc "a b a b"; V=2; C(a)=2, C(b)=2
    # bigrams: "a b" x2, "b a" x1
    df = spark.createDataFrame([(1, "a b a b")], "doc_id BIGINT, text STRING")
    r = bigram_lm_cross_entropy(df, alpha=0.5).collect()[0]
    p_ab = (2 + 0.5) / (2 + 0.5 * 2)  # P(b|a)
    p_ba = (1 + 0.5) / (2 + 0.5 * 2)  # P(a|b)
    expected = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert r["n_bigrams"] == 3
    assert abs(r["avg_nll"] - expected) < 1e-9


def test_bigram_lm_single_token_docs_drop_out(spark):
    from dog_data_pipeline_spark.operators.text import bigram_lm_cross_entropy

    df = spark.createDataFrame(
        [(1, "word"), (2, "two words")], "doc_id BIGINT, text STRING"
    )
    got = {r["doc_id"] for r in bigram_lm_cross_entropy(df).collect()}
    assert got == {2}


def test_incoherent_spans_flags_planted_garble_not_fluent_text(spark):
    from dog_data_pipeline_spark.operators.text import incoherent_spans

    fluent = "the cat sat on the mat and then " * 6  # 48 tokens
    # train corpus: many fluent docs; probe: fluent doc + doc with a
    # garbled (never-seen-bigram) run spliced into the middle
    train_rows = [(i, fluent.strip()) for i in range(30)]
    garbled = (
        "the cat sat on the mat and then "
        + "zq xv qj vz jx qx zv xj jq vq zx qz "  # 12 unseen tokens
        + "the cat sat on the mat and then the cat"
    )
    probe = spark.createDataFrame(
        train_rows + [(100, garbled)], "doc_id BIGINT, text STRING"
    )
    train = spark.createDataFrame(train_rows, "doc_id BIGINT, text STRING")
    # with V=8 the smoothing floor puts unseen-after-unseen bigrams at
    # ln(8) ~ 2.08 nats while fluent bigrams sit near 0.7 — threshold
    # between the two bands
    spans = incoherent_spans(
        probe, window=4, threshold=1.5, train=train
    ).collect()
    flagged_docs = {r["id"] for r in spans}
    assert flagged_docs == {100}
    (s,) = [(r["span_start"], r["span_end"]) for r in spans]
    # the garbled run occupies tokens 9..20; the span must cover it and
    # stay inside the splice's bigram neighborhood
    assert s[0] <= 9 and s[1] >= 20
    assert s[0] >= 5 and s[1] <= 25


def test_incoherent_spans_merges_adjacent_windows(spark):
    from dog_data_pipeline_spark.operators.text import incoherent_spans

    # every bigram unseen under a disjoint train corpus -> all windows
    # flagged -> exactly ONE maximal span per doc
    train = spark.createDataFrame([(0, "a b c d e f g h")], "doc_id BIGINT, text STRING")
    probe = spark.createDataFrame([(1, "q r s t u v w x y z")], "doc_id BIGINT, text STRING")
    spans = incoherent_spans(probe, window=3, threshold=0.1, train=train).collect()
    assert len(spans) == 1
    r = spans[0]
    # 10 tokens -> 9 bigrams -> full windows start at 1..7, span 1..10
    assert (r["span_start"], r["span_end"]) == (1, 10)


def test_zipf_spectrum_planted_slope_and_coverage(spark):
    """Frequencies 4/2/1 for tokens a/b/c: slope of ln(freq) on
    ln(rank) is computable in closed form; coverage and ttr exact."""
    import numpy as np

    from dog_data_pipeline_spark.operators.text import zipf_spectrum

    df = spark.createDataFrame(
        [(1, "g1", "a a a a b b c")], "doc_id INT, lang STRING, text STRING"
    )
    row = zipf_spectrum(df, "lang").collect()[0]
    x = np.log([1.0, 2.0, 3.0])
    y = np.log([4.0, 2.0, 1.0])
    expected = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    assert row["n_types"] == 3 and row["n_tokens"] == 7
    assert abs(row["zipf_slope"] - round(expected, 4)) <= 1e-4
    assert row["top10_coverage"] == 1.0
    assert row["ttr"] == round(3 / 7, 4)


def test_zipf_spectrum_rank_ties_break_on_token(spark):
    """Equal-frequency tokens must rank deterministically (token asc)
    regardless of partitioning — the slope depends on it."""
    from dog_data_pipeline_spark.operators.text import zipf_spectrum

    rows = [(i, "g", "alpha beta gamma delta") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id INT, lang STRING, text STRING")
    a = zipf_spectrum(df, "lang").collect()[0]
    b = zipf_spectrum(df.repartition(5), "lang").collect()[0]
    assert a == b
    # all-equal frequencies: regression on a flat line -> slope 0
    assert a["zipf_slope"] == 0.0


def test_pmi_collocations_hand_checked(spark):
    import math

    from dog_data_pipeline_spark.operators.text import pmi_collocations

    # "x y" always adjacent (perfect collocation); "a b" sometimes
    rows = [(1, "x y a b"), (2, "x y b a"), (3, "x y a b"), (4, "x y")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, "text", min_pair_count=2, top_k=10).collect()
    }
    xy = got[("x", "y")]
    # T = 14 unigrams, B = 10 bigram slots, n_xy = 4, n_x = n_y = 4
    assert (xy["n_a"], xy["n_b"], xy["n_ab"]) == (4, 4, 4)
    expected = (4 / 10) / ((4 / 14) * (4 / 14))
    assert math.isclose(xy["assoc_ratio"], expected)
    assert math.isclose(xy["pmi"], math.log(expected))
    ab = got[("a", "b")]
    assert ab["n_ab"] == 2
    # the perfect collocation must outrank the sometimes-pair
    assert xy["assoc_ratio"] > ab["assoc_ratio"]


def test_pmi_collocations_min_count_and_topk(spark):
    from dog_data_pipeline_spark.operators.text import pmi_collocations

    rows = [(1, "p q"), (2, "p q"), (3, "r s")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = pmi_collocations(df, "text", min_pair_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("p", "q")]

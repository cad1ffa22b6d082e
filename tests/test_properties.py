"""Hypothesis property tests (SURVEY §5.4): geometry clamp vs an
independent oracle over generated boxes; ordered-collect determinism
under arbitrary row order."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dog_data_pipeline_spark.functions.geometry import recenter_clamp
from dog_data_pipeline_spark.operators.aggregates import ordered_collect


def _oracle_clamp(bbox, w, h, mw, mh):
    mw, mh = int(mw), int(mh)
    cx, cy = (bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2
    x1, y1 = math.ceil(cx - w / 2), math.ceil(cy - h / 2)
    x2, y2 = math.ceil(cx + w / 2), math.ceil(cy + h / 2)
    if x1 < 0:
        x1, x2 = 0, w
    if y1 < 0:
        y1, y2 = 0, h
    if x2 > mw:
        x2, x1 = mw, mw - w
    if y2 > mh:
        y2, y1 = mh, mh - h
    return [x1, y1, x2, y2]


coord = st.floats(min_value=-50, max_value=750, allow_nan=False)
dim = st.integers(min_value=1, max_value=800)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.tuples(coord, coord, st.floats(0.1, 400), st.floats(0.1, 300), dim, dim),
        min_size=1,
        max_size=20,
    )
)
def test_recenter_clamp_property(spark_prop, data):
    rows = [
        (i, [x1, y1, x1 + bw, y1 + bh], w, h)
        for i, (x1, y1, bw, bh, w, h) in enumerate(data)
    ]
    df = spark_prop.createDataFrame(rows, "i INT, bbox ARRAY<DOUBLE>, w INT, h INT")
    out = df.withColumn(
        "nb",
        recenter_clamp(F.col("bbox"), F.col("w"), F.col("h"), F.lit(640), F.lit(480)),
    )
    for r in out.collect():
        i = r["i"]
        bbox = rows[i][1]
        expected = _oracle_clamp(bbox, rows[i][2], rows[i][3], 640, 480)
        assert list(r["nb"]) == expected, (bbox, rows[i][2], rows[i][3])
        # invariant: extent is always preserved
        assert r["nb"][2] - r["nb"][0] == rows[i][2]
        assert r["nb"][3] - r["nb"][1] == rows[i][3]


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.text("ab", min_size=1, max_size=3)),
        min_size=1,
        max_size=30,
    ),
    parts=st.integers(1, 6),
)
def test_ordered_collect_partition_invariant(spark_prop, vals, parts):
    df = spark_prop.createDataFrame(vals, "k INT, o INT, v STRING").repartition(parts)
    out = {
        r["k"]: r["seq"]
        for r in ordered_collect(df, ["k"], ["o", "v"], "v").collect()
    }
    expected: dict[int, list[str]] = {}
    for k, o, v in sorted(vals, key=lambda t: (t[0], t[1], t[2])):
        expected.setdefault(k, []).append(v)
    assert out == expected


# session-scoped spark fixture adapted for hypothesis (function-scoped
# fixtures interact badly with @given)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_prop():
    from dog_data_pipeline_spark.session import get_spark

    return get_spark(app_name="prop-tests", shuffle_partitions=4)


@settings(max_examples=4, deadline=None)  # ~30s/example: each runs the
# operator's checkpoint+counts+final jobs — 4 randomized examples on top
# of the two deterministic tests in test_operators is the right spend
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(2, 5),
    parts=st.integers(1, 5),
)
def test_ntile_ranged_matches_builtin_property(spark_prop, vals, k, parts):
    """Distributed ntile == builtin ntile for arbitrary data, bucket
    counts, and partition counts (ids de-duplicate the order)."""
    from pyspark.sql import Window

    from dog_data_pipeline_spark.operators.windows import ntile_ranged

    rows = [(f"g{g}", v, i) for i, (g, v) in enumerate(vals)]
    df = spark_prop.createDataFrame(rows, "key STRING, v INT, id INT")
    got = {
        (r["key"], r["id"]): r["b"]
        for r in ntile_ranged(
            df, k, ["key"], ["v", "id"], out="b", num_partitions=parts
        ).collect()
    }
    w = Window.partitionBy("key").orderBy("v", "id")
    want = {
        (r["key"], r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert got == want


# --- word n-grams / chunking vs a python reference model ---------------

_word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
_texts = st.lists(
    st.lists(_word, min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=8,
)


def _py_tokens(text: str) -> list[str]:
    t = text.strip()
    return t.split() if t else [""]


@settings(max_examples=25, deadline=None)
@given(texts=_texts, n=st.integers(min_value=2, max_value=6))
def test_word_ngrams_matches_python_model(spark_prop, texts, n):
    from dog_data_pipeline_spark.operators.text import tokens, word_ngrams

    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i INT, text STRING"
    )
    got = {
        r["i"]: r["g"]
        for r in df.select("i", word_ngrams(tokens(F.col("text")), n).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        expect = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        assert got[i] == expect, (t, n)


@settings(max_examples=25, deadline=None)
@given(
    texts=_texts,
    size=st.integers(min_value=4, max_value=20),
    overlap=st.integers(min_value=0, max_value=3),
)
def test_chunking_matches_python_model(spark_prop, texts, size, overlap):
    from dog_data_pipeline_spark.operators.text import with_chunks

    df = spark_prop.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id STRING, text STRING"
    )
    rows = with_chunks(df, "doc_id", chunk_tokens=size, overlap=overlap).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk"], r["n_chunk_tokens"])
        )
    stride = size - overlap
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        expect = []
        idx = 0
        for start in range(0, len(toks), stride):
            piece = toks[start : start + size]
            expect.append((idx, " ".join(piece), len(piece)))
            idx += 1
            if start + size >= len(toks):
                break
        assert sorted(got[str(i)]) == sorted(expect), (t, size, overlap)


# ---------------------------------------------------------------------------
# segment_dedup properties: vs an independent Python model
# ---------------------------------------------------------------------------

_words = st.sampled_from(["a", "b", "c", "dd", "ee"])
_seg_texts = st.lists(
    st.lists(_words, min_size=1, max_size=40).map(" ".join),
    min_size=1,
    max_size=12,
)


def _segment_model(texts, k):
    """Reference implementation: global first-occurrence-wins."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        segs = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (len(segs), kept)
    return out


@settings(max_examples=15, deadline=None)
@given(texts=_seg_texts, k=st.integers(min_value=2, max_value=8), parts=st.integers(1, 4))
def test_segment_dedup_matches_python_model(spark_prop, texts, k, parts):
    from dog_data_pipeline_spark.operators.dedup import segment_dedup

    df = spark_prop.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    ).repartition(parts)
    got = {
        r["id"]: r for r in segment_dedup(df, "doc_id", "text", seg_tokens=k).collect()
    }
    model = _segment_model(texts, k)
    assert set(got) == set(model)
    for doc_id, (n_segs, kept) in model.items():
        r = got[doc_id]
        assert r["n_segments"] == n_segs, (doc_id, texts)
        assert r["n_kept"] == len(kept)
        assert r["kept_text"] == " ".join(kept)


# ---------------------------------------------------------------------------
# classifier properties: bounds + table-mode average
# ---------------------------------------------------------------------------

@settings(max_examples=10, deadline=None)
@given(texts=_seg_texts)
def test_classifier_score_always_bounded(spark_prop, texts):
    from dog_data_pipeline_spark.operators.text import with_classifier_score

    df = spark_prop.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    for r in with_classifier_score(df).collect():
        assert 0.0 <= r["clf_score"] <= 1.0
        assert r["clf_score_keep"] == (r["clf_score"] > 0.5)


# ---------------------------------------------------------------------------
# duplicate_spans properties: vs an independent Python model
# ---------------------------------------------------------------------------

def _spans_model(texts, w):
    """Reference: flag every window whose (doc,pos) is not the global
    first occurrence of its content; merge overlapping/adjacent windows."""
    first = {}
    for doc_id, text in sorted(enumerate(texts)):
        toks = text.split()
        for p in range(len(toks) - w + 1):
            key = tuple(toks[p : p + w])
            first.setdefault(key, (doc_id, p))
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        flagged = [
            p for p in range(len(toks) - w + 1)
            if first[tuple(toks[p : p + w])] != (doc_id, p)
        ]
        spans = []
        for p in flagged:  # ascending
            s, e = p + 1, p + w  # 1-based inclusive
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        if spans:
            out[doc_id] = spans
    return out


_span_words = st.sampled_from(["x", "y", "z"])
_span_texts = st.lists(
    st.lists(_span_words, min_size=1, max_size=25).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(texts=_span_texts, w=st.integers(min_value=2, max_value=5), parts=st.integers(1, 3))
def test_duplicate_spans_matches_python_model(spark_prop, texts, w, parts):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    df = spark_prop.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    ).repartition(parts)
    got: dict = {}
    for r in duplicate_spans(df, "doc_id", "text", window_tokens=w).collect():
        got.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    for v in got.values():
        v.sort()
    assert got == _spans_model(texts, w), (texts, w)


# ---------------------------------------------------------------------------
# PassJoin edit-distance join vs brute-force DP (SURVEY §5.4 pattern)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None)  # each example runs a Spark job
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=50),
        min_size=2,
        max_size=25,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_edit_distance_pairs_equals_bruteforce(spark_prop, texts, k):
    """PassJoin recall/precision against all-pairs DP on adversarially
    low-alphabet strings spanning the short/main path boundary and every
    length delta — the multi-match-aware window lemma, machine-checked."""
    from dog_data_pipeline_spark.operators.dedup import edit_distance_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(rows, ["id", "text"])
    got = {
        (r.id_a, r.id_b, r.edit_distance)
        for r in edit_distance_pairs(
            df, "id", "text", prefix_len=40, max_edits=k
        ).collect()
    }
    expect = set()
    # empty prefixes INCLUDED: ('','') is a distance-0 pair and
    # ''-vs-short-string qualifies whenever len <= k — the short-path
    # broadcast block must find both (recall holds for EVERY length)
    trimmed = [(i, t[:40]) for i, t in rows]
    for x in range(len(trimmed)):
        for y in range(x + 1, len(trimmed)):
            ia, sa = trimmed[x]
            ib, sb = trimmed[y]
            d = _lev(sa, sb)
            if d <= k:
                expect.add((ia, ib, d))
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120).map(
            lambda s: " ".join(s.split())
        ),
        min_size=1,
        max_size=15,
    ),
    w=st.integers(min_value=2, max_value=5),
)
def test_rolling_span_engine_equals_md5_engine(spark_prop, texts, w):
    """The Rabin-Karp rolling window fingerprint must produce EXACTLY the
    md5 engine's spans on arbitrary corpora (double-modulus collision
    odds are ~n^2/2^62; any systematic fold bug shows up immediately)."""
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(rows, ["id", "text"])
    a = {
        (r.id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "id", "text", window_tokens=w).collect()
    }
    b = {
        (r.id, r.span_start, r.span_end)
        for r in duplicate_spans(
            df, "id", "text", window_tokens=w, fingerprint="rolling"
        ).collect()
    }
    assert a == b

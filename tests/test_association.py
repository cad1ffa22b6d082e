"""Association-rule (market-basket) operator tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.association import (
    association_rules,
    basket_items,
)


def _rows(df):
    return {(r["item_a"], r["item_b"]): r for r in df.collect()}


def test_rules_hand_checked(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    data = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(data, "basket BIGINT, item STRING")
    got = _rows(association_rules(df, "basket", "item", min_pair_count=1))
    ab = got[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_ab"]) == (3, 3, 2)
    assert math.isclose(ab["support"], 2 / 4)
    assert math.isclose(ab["conf_a_to_b"], 2 / 3)
    assert math.isclose(ab["conf_b_to_a"], 2 / 3)
    assert math.isclose(ab["lift"], 2 * 4 / (3 * 3))
    ac = got[("a", "c")]
    assert (ac["n_ab"], ac["n_b"]) == (1, 1)
    assert math.isclose(ac["lift"], 1 * 4 / (3 * 1))
    # b,c never co-occur → no row at all (pair table, not cross table)
    assert ("b", "c") not in got


def test_duplicate_lines_collapse_before_pairing(spark):
    # the same (basket, item) twice must count once everywhere
    data = [(1, "a"), (1, "a"), (1, "b"), (2, "a")]
    df = spark.createDataFrame(data, "basket BIGINT, item STRING")
    b = basket_items(df, "basket", "item")
    assert b.count() == 3
    got = _rows(association_rules(df, "basket", "item", min_pair_count=1))
    assert got[("a", "b")]["n_ab"] == 1
    assert got[("a", "b")]["n_a"] == 2


def test_min_pair_count_prunes(spark):
    data = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(data, "basket BIGINT, item STRING")
    got = _rows(association_rules(df, "basket", "item", min_pair_count=2))
    assert set(got) == {("a", "b")}


def test_cap_items_drops_mega_baskets(spark):
    # basket 9 has 4 distinct items; cap at 3 removes all its pairs
    data = [(1, "a"), (1, "b")] + [(9, x) for x in "abcd"]
    df = spark.createDataFrame(data, "basket BIGINT, item STRING")
    got = _rows(
        association_rules(df, "basket", "item", min_pair_count=1, cap_items=3)
    )
    assert set(got) == {("a", "b")}
    # N must also shrink to the surviving baskets (1 basket)
    assert math.isclose(got[("a", "b")]["support"], 1.0)

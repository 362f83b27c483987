"""As-of join operator: union-window implementation semantics."""

from __future__ import annotations

import datetime

from kingsfoil_seed_data_ingestor_spark.operators.asof import asof_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_latest_preceding(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-10 12:00:00"), "e1"),
            (1, ts("2024-01-20 12:00:00"), "e2"),
            (2, ts("2024-01-05 00:00:00"), "e3"),  # before any right row
            (3, ts("2024-01-15 00:00:00"), "e4"),  # key with no right rows
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), 100.0),
            (1, ts("2024-01-15 00:00:00"), 200.0),
            (2, ts("2024-01-08 00:00:00"), 300.0),
        ],
        "k long, t timestamp, price double",
    )
    out = {
        r.tag: r.price
        for r in asof_join(
            left, right, left_on="t", right_on="t", left_by="k", right_by="k",
            value_cols=["price"],
        ).collect()
    }
    assert out == {"e1": 100.0, "e2": 200.0, "e3": None, "e4": None}


def test_asof_join_payload_from_single_matched_row(spark):
    # The matched (latest preceding) right row holds a NULL value col
    # and a different qty than the older row: ASOF semantics demand the
    # WHOLE payload from that one row — price stays NULL, qty comes
    # from the same row (never stitched from the older non-null row).
    left = spark.createDataFrame(
        [(1, ts("2024-01-20 00:00:00"), "e1")], "k long, t timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), 100.0, 7),
            (1, ts("2024-01-15 00:00:00"), None, 9),
        ],
        "k long, t timestamp, price double, qty int",
    )
    row = asof_join(
        left, right, left_on="t", right_on="t", left_by="k", right_by="k",
        value_cols=["price", "qty"],
    ).first()
    assert row.price is None and row.qty == 9


def test_asof_join_tie_matches_equal_timestamp(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-15 00:00:00"), "at_tie")], "k long, t timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-15 00:00:00"), 42.0)], "k long, t timestamp, price double"
    )
    row = asof_join(
        left, right, left_on="t", right_on="t", left_by="k", right_by="k",
        value_cols=["price"],
    ).first()
    assert row.price == 42.0  # right.t == left.t counts as preceding

"""Expression-level tests for the typed transform library.

Ports the reference's unit-test matrix (reference
``tests/test_transformers.py``, 273 lines) to Column expressions: each
case feeds a raw string through a 1-row DataFrame and asserts the typed
result.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.functions import transforms as X


def run(spark, expr_builder, values):
    """Apply an expression builder to a single string column; return list."""
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r[0] for r in df.select(expr_builder(F.col("raw")).alias("out")).collect()]


class TestParseDate:
    def test_formats(self, spark):
        vals = ["20240115", "01/15/2024", "2024-01-15", "2024/01/15", "01-15-2024"]
        assert run(spark, X.parse_date, vals) == [datetime.date(2024, 1, 15)] * 5

    def test_single_digit_components(self, spark):
        assert run(spark, X.parse_date, ["1/5/2024"]) == [datetime.date(2024, 1, 5)]

    def test_sentinels_and_invalid(self, spark):
        vals = ["*", "", "NULL", "N/A", "nan", "NaN", "not a date", "20241315", None]
        assert run(spark, X.parse_date, vals) == [None] * 9

    def test_whitespace(self, spark):
        assert run(spark, X.parse_date, ["  20240115  "]) == [datetime.date(2024, 1, 15)]


class TestParseNumeric:
    def test_basic_and_commas(self, spark):
        assert run(spark, X.parse_numeric, ["12.34", "1,234.56", "-5", "0"]) == [
            12.34,
            1234.56,
            -5.0,
            0.0,
        ]

    def test_sentinels_and_invalid(self, spark):
        vals = ["", "NULL", "N/A", "*", "nan", "NaN", "abc", "12.34.56", None]
        assert run(spark, X.parse_numeric, vals) == [None] * 9


class TestParseInteger:
    def test_truncation_toward_zero(self, spark):
        assert run(spark, X.parse_integer, ["123.7", "-123.7", "42", "0"]) == [
            123,
            -123,
            42,
            0,
        ]

    def test_invalid(self, spark):
        assert run(spark, X.parse_integer, ["abc", "", "*", None]) == [None] * 4


class TestParseBoolean:
    def test_truthy(self, spark):
        vals = ["1", "true", "YES", "y", "*", "True"]
        assert run(spark, X.parse_boolean, vals) == [True] * 6

    def test_falsy(self, spark):
        vals = ["0", "false", "NO", "n", ""]
        assert run(spark, X.parse_boolean, vals) == [False] * 5

    def test_unknown(self, spark):
        assert run(spark, X.parse_boolean, ["maybe", "2", None]) == [None] * 3


class TestCleanCode:
    def test_upper_and_leading_zeros(self, spark):
        assert run(spark, X.clean_code, ["a1234", "00100", " g0008 "]) == [
            "A1234",
            "00100",
            "G0008",
        ]

    def test_sentinels(self, spark):
        # upper-cased before the check: "null" → NULL; "nan" → "NAN" (kept,
        # matching the reference's post-upper sentinel list)
        assert run(spark, X.clean_code, ["", "null", "N/a", "nan", None]) == [
            None,
            None,
            None,
            "NAN",
            None,
        ]


class TestParseText:
    def test_trim_and_sentinels(self, spark):
        assert run(spark, X.parse_text, ["  hi  ", "NULL", "N/A", "", "*", None]) == [
            "hi",
            None,
            None,
            None,
            "*",  # '*' is preserved for TEXT
            None,
        ]


class TestTransformValueDispatch:
    def test_each_type(self, spark):
        df = spark.createDataFrame([("1,000.5", "7.9", "20240102", "*", " x ")],
                                   "n string, i string, d string, b string, t string")
        row = df.select(
            X.transform_value(F.col("n"), "NUMERIC").alias("n"),
            X.transform_value(F.col("i"), "INTEGER").alias("i"),
            X.transform_value(F.col("d"), "DATE").alias("d"),
            X.transform_value(F.col("b"), "BOOLEAN").alias("b"),
            X.transform_value(F.col("t"), "TEXT").alias("t"),
        ).collect()[0]
        assert row["n"] == 1000.5
        assert row["i"] == 7
        assert row["d"] == datetime.date(2024, 1, 2)
        assert row["b"] is True
        assert row["t"] == "x"


class TestMaiId:
    def test_extraction(self, spark):
        vals = ["1 Line Edit", "2 Date of Service Edit: Policy",
                "3 Date of Service Edit: Clinical", "4 Bogus", "", None, "Edit 3"]
        assert run(spark, X.parse_mai_id, vals) == [1, 2, 3, None, None, None, None]


class TestMueValue:
    def test_zero_preserved(self, spark):
        assert run(spark, X.parse_mue_value, ["0", "5", "3.0"]) == [0, 5, 3]

    def test_sentinels(self, spark):
        assert run(spark, X.parse_mue_value, ["", "NULL", "N/A", "nan", None]) == [None] * 5


class TestDeletionDate:
    def test_star_means_active(self, spark):
        assert run(spark, X.parse_deletion_date, ["*", "20230401", ""]) == [
            None,
            datetime.date(2023, 4, 1),
            None,
        ]


class TestModifierIndicator:
    def test_values_and_header_bleed(self, spark):
        vals = ["0", "1", "9", "0=not allowed 1=allowed 9=N/A", "1=allowed", "5", None]
        assert run(spark, X.parse_modifier_indicator, vals) == [0, 1, 9, 0, 1, 5, None]
        # "5": first char digit but not in {0,1,9} → falls back to parse_integer


class TestPrior1996Flag:
    def test_star_true(self, spark):
        assert run(spark, X.parse_prior_1996_flag, ["*", "", "x", None]) == [
            True,
            False,
            False,
            None,
        ]


class TestDerived:
    def test_mac_locality(self, spark):
        df = spark.createDataFrame([("01112", "00",)], "carrier string, loc string")
        out = df.select(X.mac_locality(F.col("carrier"), F.col("loc")).alias("m")).collect()
        assert out[0]["m"] == "0111200"

    def test_fee_formula(self, spark):
        # 99213-ish: (0.97*1.0)+(1.0*1.1)+(0.07*0.5)*CF — reference SCHEMA.md:248-264
        df = spark.createDataFrame([(0.97, 1.0, 1.0, 1.1, 0.07, 0.5, 33.29)],
                                   "wr double, wg double, pr double, pg double, mr double, mg double, cf double")
        out = df.select(
            X.fee_formula(F.col("wr"), F.col("wg"), F.col("pr"), F.col("pg"),
                          F.col("mr"), F.col("mg"), F.col("cf")).alias("fee")
        ).collect()[0]["fee"]
        assert out == round(((0.97 * 1.0) + (1.0 * 1.1) + (0.07 * 0.5)) * 33.29, 2)

"""Typed transform expressions with CMS sentinel semantics.

Column-expression equivalents of the reference's per-cell Python
transforms (reference: ``app/services/transformers.py:11-306``). The
reference applies these row-at-a-time in an interpreted loop; here every
function builds a **native Spark Column expression** so the whole
transform layer runs inside whole-stage codegen on the JVM — no Python
in the hot path, vectorized, and distributable to any number of
executors.

All expressions are *total*: unparsable input becomes NULL, never an
exception (the reference's per-row try/except becomes unnecessary).
They are also ANSI-mode safe (``try_cast`` / ``try_to_timestamp``), so
they behave identically whether the session runs Spark 4's default ANSI
dialect or legacy mode.

Sentinel semantics (reference ``transformers.py:28,66,137,158`` and
``SCHEMA.md:309-314``):

* ``"" * NULL N/A nan NaN`` mean NULL for dates and numerics;
* TEXT keeps ``"*"`` but nulls ``NULL/N/A/nan/NaN`` and empty;
* code columns upper-case first, so only ``NULL``/``N/A`` survive the
  sentinel check (``nan`` upper-cases to ``NAN`` which the reference
  does *not* null — preserved bit-for-bit here);
* ``"*"`` means TRUE for ``prior_1996_flag`` and "still active" (NULL)
  for ``deletion_date``;
* ``0`` is a valid, preserved value for ``mue_value``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.strip() removes more than Spark's space-only trim();
# btrim with an explicit whitespace set is the cheap JVM-side match.
_WHITESPACE = " \t\r\n\x0b\x0c"

#: sentinels for date parsing (reference transformers.py:28)
DATE_SENTINELS = ["*", "", "NULL", "N/A", "nan", "NaN"]
#: sentinels for numeric parsing (reference transformers.py:66)
NUMERIC_SENTINELS = ["", "NULL", "N/A", "*", "nan", "NaN"]
#: sentinels for TEXT values (reference transformers.py:158 — no "*")
TEXT_SENTINELS = ["NULL", "N/A", "nan", "NaN"]

#: date formats tried in order (reference transformers.py:36); the
#: single-digit variants at the tail mirror Python strptime's leniency
#: ("1/5/2023" parses under %m/%d/%Y).
DATE_FORMATS = [
    "yyyyMMdd",
    "MM/dd/yyyy",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM-dd-yyyy",
    "M/d/yyyy",
    "yyyy-M-d",
    "yyyy/M/d",
    "M-d-yyyy",
]


def strip_ws(col: Column) -> Column:
    """Whitespace-strip matching Python ``str.strip()`` semantics."""
    return F.btrim(col, F.lit(_WHITESPACE))


def parse_date(col: Column) -> Column:
    """F1 — multi-format date parse with sentinel handling.

    Reference ``transformers.py:11-43``: try formats in priority order,
    sentinels and unparsable values yield NULL.
    """
    t = strip_ws(col)
    parsed = F.coalesce(
        *[F.try_to_timestamp(t, F.lit(fmt)).cast("date") for fmt in DATE_FORMATS]
    )
    return F.when(col.isNull() | t.isin(DATE_SENTINELS), F.lit(None).cast("date")).otherwise(
        parsed
    )


def parse_numeric(col: Column) -> Column:
    """F2 — numeric parse: strip commas, sentinels/invalid → NULL.

    Reference ``transformers.py:46-75`` (``"1,234.56"`` → 1234.56,
    ``"12.34.56"`` → NULL).
    """
    t = strip_ws(col)
    cleaned = F.replace(t, F.lit(","), F.lit(""))
    return F.when(
        col.isNull() | t.isin(NUMERIC_SENTINELS), F.lit(None).cast("double")
    ).otherwise(cleaned.try_cast("double"))


def parse_integer(col: Column) -> Column:
    """F3 — integer via float with truncation toward zero.

    Reference ``transformers.py:78-91``: ``int(float("123.7"))`` → 123.
    double→int cast truncates toward zero in Spark, matching Python;
    NaN/Infinity (which raise in Python → None) null out via try_cast.
    """
    d = parse_numeric(col)
    return F.when(F.isnan(d), F.lit(None).cast("int")).otherwise(d.try_cast("int"))


def parse_boolean(col: Column) -> Column:
    """F4 — boolean: 1/true/yes/y/* → TRUE; 0/false/no/n/"" → FALSE; else NULL.

    Reference ``transformers.py:94-118``.
    """
    v = F.lower(strip_ws(col))
    return (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(v.isin("1", "true", "yes", "y", "*"), F.lit(True))
        .when(v.isin("0", "false", "no", "n", ""), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def clean_code(col: Column) -> Column:
    """F5 — code cleanup: trim + UPPER, preserve leading zeros.

    Reference ``transformers.py:121-140``. The sentinel check happens
    *after* upper-casing, so ``"null"`` → NULL but ``"nan"`` → ``"NAN"``
    (the reference's list is checked against the upper-cased value and
    only ``""/NULL/N/A`` can match) — preserved exactly.
    """
    cleaned = F.upper(strip_ws(col))
    return F.when(
        col.isNull() | cleaned.isin("", "NULL", "N/A"), F.lit(None).cast("string")
    ).otherwise(cleaned)


def parse_text(col: Column) -> Column:
    """TEXT branch of F6 — trim; empty and NULL/N/A/nan/NaN → NULL.

    Reference ``transformers.py:153-158``. Note ``"*"`` is preserved
    for TEXT (unlike numerics/dates).
    """
    t = strip_ws(col)
    return F.when(
        col.isNull() | (t == "") | t.isin(TEXT_SENTINELS), F.lit(None).cast("string")
    ).otherwise(t)


def transform_value(col: Column, data_type: str) -> Column:
    """F6 — dispatch on the declared logical type.

    Reference ``transformers.py:143-172``; types declared per canonical
    column in the registry (TEXT, NUMERIC, INTEGER, DATE, BOOLEAN).
    """
    dt = data_type.upper()
    if dt == "NUMERIC":
        return parse_numeric(col)
    if dt == "INTEGER":
        return parse_integer(col)
    if dt == "DATE":
        return parse_date(col)
    if dt == "BOOLEAN":
        return parse_boolean(col)
    return parse_text(col)


# ============================================================
# Source-specific transforms (NCCI MUE / PTP special semantics)
# ============================================================


def parse_mai_id(mai_description_col: Column) -> Column:
    """F7 — extract MAI id from the *description* column; valid ∈ {1,2,3}.

    Cross-column derivation (reference ``transformers.py:180-207``,
    consumed at ``ingestor.py:326-333``): ``"3 Date of Service Edit:
    Clinical"`` → 3; ``"4 ..."`` → NULL.
    """
    d = F.regexp_extract(strip_ws(mai_description_col), r"^(\d+)", 1).try_cast("int")
    return F.when(d.isin(1, 2, 3), d).otherwise(F.lit(None).cast("int"))


def parse_mue_value(col: Column) -> Column:
    """F8 — integer parse where 0 is a valid, preserved value.

    Reference ``transformers.py:210-233``: 0 means "not payable", never
    nulled. Same machinery as :func:`parse_integer` (the cast keeps 0);
    the guard only nulls true sentinels.
    """
    return parse_integer(col)


def parse_deletion_date(col: Column) -> Column:
    """F9 — ``"*"`` → NULL (edit still active), else :func:`parse_date`.

    Reference ``transformers.py:241-256``. ``"*"`` is already a date
    sentinel, so this is an alias kept for surface parity/clarity.
    """
    return parse_date(col)


def parse_modifier_indicator(col: Column) -> Column:
    """F10 — first char if digit, valid ∈ {0,1,9}; else integer parse.

    Reference ``transformers.py:259-286`` — robust to header-text bleed
    such as ``"0=not allowed 1=allowed 9=N/A"``.
    """
    t = strip_ws(col)
    first = F.substring(t, 1, 1)
    first_digit = first.try_cast("int")
    return F.when(
        first_digit.isNotNull() & first_digit.isin(0, 1, 9), first_digit
    ).otherwise(parse_integer(col))


def parse_prior_1996_flag(col: Column) -> Column:
    """F11 — ``"*"`` → TRUE, anything else → FALSE, NULL input → NULL.

    Reference ``transformers.py:289-306``.
    """
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
        strip_ws(col) == "*"
    )


# ============================================================
# Derived-field / formula expressions
# ============================================================


def mac_locality(carrier_number: Column, locality_code: Column) -> Column:
    """F14 — derived key: ``carrier_number || locality_code``.

    Reference ``seed_data.py:232-235`` / ``SCHEMA.md:95``.
    """
    return F.concat(carrier_number, locality_code)


def fee_formula(
    work_rvu: Column,
    work_gpci: Column,
    pe_rvu: Column,
    pe_gpci: Column,
    mp_rvu: Column,
    mp_gpci: Column,
    conversion_factor: Column,
) -> Column:
    """F15 — the Medicare fee formula (reference ``SCHEMA.md:248-264``).

    ``ROUND(((work_rvu*work_gpci)+(pe_rvu*pe_gpci)+(mp_rvu*mp_gpci))*cf, 2)``
    """
    total = (work_rvu * work_gpci) + (pe_rvu * pe_gpci) + (mp_rvu * mp_gpci)
    return F.round(total * conversion_factor, 2)

"""Pre-ingest validation gates (reference ``app/services/validator.py``).

Driver-cheap checks run between header detection and the ingest job:

* extension whitelist + file-size cap (pure driver logic);
* data-rows-exist;
* row-count sanity vs the previous completed upload (warn outside
  0.5×–1.5×, reference ``validator.py:49-79``);
* sampled type validation — first 100 data rows, first offending value
  per NUMERIC/INTEGER/DATE column (reference ``validator.py:90-175``).

The type scan is the one piece that touches data; instead of the
reference's nested Python loops it is **one aggregate** over a
``limit(sample)`` slice: per column, ``min_by(row, unparsable)`` finds
the first bad value, so the job stays a single cheap pass regardless of
column count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.functions import transforms as X
from kingsfoil_seed_data_ingestor_spark.registry import Source
from kingsfoil_seed_data_ingestor_spark.sources.headers import HeaderDetection

#: reference ``app/config.py:25-26``
ALLOWED_EXTENSIONS = ("csv", "xlsx", "xls", "txt")
MAX_UPLOAD_MB = 100
#: reference ``validator.py:96``
TYPE_SAMPLE_ROWS = 100
#: values the sampled type check ignores (reference ``validator.py:152``)
_SKIP = ("*", "", "NULL", "N/A")


def extension_error(filename: str, allowed=ALLOWED_EXTENSIONS) -> str | None:
    """P8 — whitelist check; returns an error message or None."""
    if not filename:
        return "No filename provided"
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if not ext:
        return "File has no extension"
    if ext not in allowed:
        return f"File type '.{ext}' not supported. Allowed: {', '.join(allowed)}"
    return None


@dataclass
class ValidationReport:
    passed: bool
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    record_count: int = 0  # data rows after the header (upload.py:363)


def validate_grid(
    raw: DataFrame,
    source: Source,
    detection: HeaderDetection,
    previous_record_count: int | None = None,
    sample_rows: int = TYPE_SAMPLE_ROWS,
) -> ValidationReport:
    """Run the post-header-detection validation pass."""
    report = ValidationReport(passed=True)

    region = raw.filter(F.col("row_idx") > detection.header_row_index)
    data_rows = region.count()
    report.record_count = data_rows
    if data_rows <= 0:
        report.errors.append("No data rows found after header row")
        report.passed = False
        return report

    if previous_record_count:
        if data_rows < previous_record_count * 0.5:
            report.warnings.append(
                f"Row count ({data_rows:,}) is much lower than previous upload "
                f"({previous_record_count:,}). Please verify this is the correct file."
            )
        elif data_rows > previous_record_count * 1.5:
            report.warnings.append(
                f"Row count ({data_rows:,}) is much higher than previous upload "
                f"({previous_record_count:,}). This may be expected for a new version."
            )

    report.warnings.extend(_sample_type_warnings(region, source, detection, sample_rows))
    return report


def _sample_type_warnings(
    region: DataFrame, source: Source, detection: HeaderDetection, sample_rows: int
) -> list[str]:
    """First offending raw value per numeric/date column in the sample.

    One aggregate over the head slice: for each checked column an
    ``unparsable`` flag expression, then ``min_by((row, value), row
    when unparsable)`` — the earliest failure, matching the reference's
    first-hit-then-stop loop.
    """
    checks: list[tuple[str, str]] = []  # (internal_name, kind)
    for name, idx in detection.column_index.items():
        dtype = source.column(name).data_type
        if dtype in ("NUMERIC", "INTEGER"):
            checks.append((name, "numeric", idx))
        elif dtype == "DATE":
            checks.append((name, "date", idx))
    if not checks:
        return []

    sample = region.orderBy("row_idx").limit(sample_rows)
    aggs = []
    for name, kind, idx in checks:
        raw = F.col(f"_c{idx}")
        trimmed = X.strip_ws(raw)
        parsed = X.parse_numeric(raw) if kind == "numeric" else X.parse_date(raw)
        bad = trimmed.isNotNull() & ~trimmed.isin(*_SKIP) & parsed.isNull()
        probe = F.when(bad, F.struct(F.col("row_idx"), trimmed.alias("val")))
        aggs.append(F.min(probe).alias(name))
    firsts = sample.agg(*aggs).first()

    warnings = []
    for name, kind, _ in checks:
        hit = firsts[name]
        if hit is not None:
            noun = "non-numeric value" if kind == "numeric" else "unparseable date"
            warnings.append(
                f"Column '{name}' contains {noun} '{hit['val']}' at row {hit['row_idx'] + 1}"
            )
    return warnings

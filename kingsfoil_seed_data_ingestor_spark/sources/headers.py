"""Header-row detection over a driver-side head sample.

Re-expresses the reference's dynamic header scan
(``app/services/header_detector.py:10-167``; behavior pinned by
``tests/test_header_detector.py``): the header row may sit anywhere in
the first 15 rows, file spellings are matched against per-column
synonym lists case-insensitively with a bidirectional prefix rule for
verbose headers, unmatched file columns are tolerated and reported.

This never touches the cluster — it runs on the ≤15-row head sample the
reader already collected, then compiles into a positional ``select``
list for the distributed frame (SURVEY.md §1.3: a driver-side
schema-on-read resolver, not an engine feature).
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: scan bound (reference ``app/config.py:23``)
MAX_HEADER_SCAN_ROWS = 15
#: minimum length for an abbreviated file header to prefix-match a
#: longer synonym (reference ``header_detector.py:118-141``)
MIN_ABBREV_LEN = 3


@dataclass(frozen=True)
class HeaderDetection:
    found: bool
    header_row_index: int | None
    #: internal_name -> original (stripped) file header text
    column_map: dict[str, str] = field(default_factory=dict)
    #: internal_name -> 0-based positional column index
    column_index: dict[str, int] = field(default_factory=dict)
    #: non-empty header cells that matched nothing (reported, tolerated)
    unmapped_columns: list[str] = field(default_factory=list)
    error: str | None = None


def _prefix_match(cell_upper: str, synonym_upper: str) -> bool:
    """Bidirectional prefix rule: a verbose file header may extend a
    synonym ("MODIFIER 0=NOT ALLOWED…" ⊃ "MODIFIER"), or abbreviate one
    if it keeps ≥3 characters ("DESC" ⊂ "DESCRIPTION")."""
    if cell_upper.startswith(synonym_upper):
        return True
    return len(cell_upper) >= MIN_ABBREV_LEN and synonym_upper.startswith(cell_upper)


def _match_row(
    cells: list[str], mappings: dict[str, dict]
) -> tuple[dict[str, str], dict[str, int]]:
    """Match one candidate row's cells against all synonym lists.

    First-wins in registry order; a file column can satisfy at most one
    canonical column. Exact match is preferred over prefix match within
    each cell before moving to the next cell (same net behavior as the
    reference's per-cell exact-then-partial loop).
    """
    upper = [c.upper() for c in cells]
    by_name: dict[str, str] = {}
    by_index: dict[str, int] = {}
    claimed: set[int] = set()
    for internal_name, info in mappings.items():
        synonyms = [h.upper() for h in info["headers"]]
        for idx, cell in enumerate(upper):
            if idx in claimed or not cell:
                continue
            if cell in synonyms or any(_prefix_match(cell, s) for s in synonyms):
                by_name[internal_name] = cells[idx]
                by_index[internal_name] = idx
                claimed.add(idx)
                break
    return by_name, by_index


def detect_header(
    head_rows: list[list[str]],
    column_mappings: dict[str, dict],
    max_scan_rows: int = MAX_HEADER_SCAN_ROWS,
) -> HeaderDetection:
    """Find the header row: the first scanned row where every
    ``is_required`` canonical column matched some cell.

    ``column_mappings`` is ``{internal_name: {"headers": [...],
    "is_required": bool}}`` — the shape produced by
    ``Source.header_mappings`` (registry) and, in the reference, by the
    ``canonical_columns ⋈ column_mappings`` join (``upload.py:68-86``).
    """
    required = [n for n, info in column_mappings.items() if info["is_required"]]
    for row_idx, cells in enumerate(head_rows[:max_scan_rows]):
        stripped = [c.strip() for c in cells]
        by_name, by_index = _match_row(stripped, column_mappings)
        if by_name and all(name in by_name for name in required):
            matched_positions = set(by_index.values())
            unmapped = [
                cell
                for i, cell in enumerate(stripped)
                if cell and i not in matched_positions
            ]
            return HeaderDetection(
                found=True,
                header_row_index=row_idx,
                column_map=by_name,
                column_index=by_index,
                unmapped_columns=unmapped,
            )
    scanned = min(max_scan_rows, len(head_rows))
    return HeaderDetection(
        found=False,
        header_row_index=None,
        error=(
            f"Could not find header row in first {scanned} rows. "
            f"Missing required columns: {', '.join(required)}"
        ),
    )

"""Raw-file sources: untyped grid readers + header resolution.

The reference ingests CSV/XLSX/XLS/TXT uploads as untyped all-string
pandas grids (``app/services/file_parser.py``) and locates the header
row by scanning the first 15 rows against synonym lists
(``app/services/header_detector.py``). Here the grid is a distributed
Spark DataFrame and the header scan runs driver-side on a small head
sample read directly from the file — the only part of the job that is
inherently sequential.
"""

from kingsfoil_seed_data_ingestor_spark.sources.grid import with_row_idx
from kingsfoil_seed_data_ingestor_spark.sources.headers import detect_header
from kingsfoil_seed_data_ingestor_spark.sources.readers import (
    Grid,
    file_extension,
    read_grid,
)

__all__ = ["Grid", "read_grid", "file_extension", "with_row_idx", "detect_header"]

"""Engine operators: dedup, typed ingest pipeline, versioning, orchestration."""

from kingsfoil_seed_data_ingestor_spark.operators.caching import CacheScope
from kingsfoil_seed_data_ingestor_spark.operators.components import (
    component_stats,
    connected_components,
    connected_components_minlabel,
)
from kingsfoil_seed_data_ingestor_spark.operators.dedup import keep_first
from kingsfoil_seed_data_ingestor_spark.operators.skew import salted_top_k, with_salt
from kingsfoil_seed_data_ingestor_spark.operators.ingest import (
    IngestPlan,
    build_ingest_plan,
    empty_row_predicate,
    typed_projection,
)
from kingsfoil_seed_data_ingestor_spark.operators.versioning import VersionStore
from kingsfoil_seed_data_ingestor_spark.operators.pipeline import (
    build_version_label,
    ingest_file,
    quarter_effective_date,
    validate_upload,
)

__all__ = [
    "CacheScope",
    "connected_components",
    "connected_components_minlabel",
    "component_stats",
    "salted_top_k",
    "with_salt",
    "keep_first",
    "IngestPlan",
    "build_ingest_plan",
    "empty_row_predicate",
    "typed_projection",
    "VersionStore",
    "ingest_file",
    "validate_upload",
    "build_version_label",
    "quarter_effective_date",
]

"""Query layer: named analytical queries + their DuckDB oracle SQL.

Importing this package populates ``plans.core.QUERIES`` — every
submodule registers its queries via the ``@register`` decorator.
"""

from kingsfoil_seed_data_ingestor_spark.plans import (  # noqa: F401
    cdc,
    corpus,
    coverage,
    events,
    llm,
    relational,
)
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES  # noqa: F401

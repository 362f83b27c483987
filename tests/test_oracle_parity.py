"""Every registered oracle is a pytest gate, not just a driver gate.

The external driver's correctness window is capped (r4 checked 50 of
56 registered queries), so queries in the overflow priority band are
driver-unchecked. This module closes that hole: each registered query
runs against its DuckDB oracle at sf0.001 INSIDE the suite, with the
exact canonicalization the driver uses (plans/verify.py). A query
without an oracle (iterative / trained paths) asserts the rows-only
contract instead: the plan executes and returns a stable schema.
"""

from __future__ import annotations

import pytest

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401 — populates registry
from kingsfoil_seed_data_ingestor_spark.plans.core import ordered_queries
from kingsfoil_seed_data_ingestor_spark.plans.verify import (
    compare_frames,
    duck_connection,
)
from kingsfoil_seed_data_ingestor_spark.session import pin_comparable_conf

from tests.conftest import SF_DIR

_QUERIES = ordered_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("q", _QUERIES, ids=[q.name for q in _QUERIES])
def test_oracle_parity(spark, duck, q):
    pin_comparable_conf(spark)
    sdf = q.spark(spark, SF_DIR).toPandas()
    if q.oracle is None:
        # rows-only contract, same as the driver's weaker check
        assert sdf.shape[1] > 0
        return
    odf = duck.execute(q.oracle).fetchdf()
    problems = compare_frames(sdf, odf)
    assert not problems, f"{q.name}: {problems}"

"""The t2 matrix: every declared query vs its DuckDB oracle at sf0.001.

This is the same compare the driver runs at sf0.01 (selfcheck.py is
the sf0.01 replica) — exact values, not hashes, so it is strictly
stronger than the driver's check.
"""

from __future__ import annotations

import pytest

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from selfcheck import check_query
from tests.conftest import SF_DIR

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    status, detail, _ = check_query(spark, oracle, name, spec, SF_DIR)
    assert status in ("OK", "ROWS-ONLY"), f"{name}: {status} — {detail}"

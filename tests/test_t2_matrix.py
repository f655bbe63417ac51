"""The t2 matrix: every declared query vs its DuckDB oracle at sf0.001.

Runs the DRIVER-PARITY compare (pandas canonicalization — dtype-
sensitive, crashes on unserialized complex columns exactly like the
driver's harness) so that every declared query is gated on the same
check the driver grades with at sf0.01.
"""

from __future__ import annotations

import pytest

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from selfcheck import check_query_parity
from tests.conftest import SF_DIR

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    status, detail, _ = check_query_parity(spark, oracle, name, spec, SF_DIR)
    assert status in ("OK", "ROWS-ONLY"), f"{name}: {status} — {detail}"


def test_grading_priority_names_resolve():
    """_ordered_items silently skips priority entries missing from the
    registry (`if k in REGISTRY`), so a typo'd key would quietly lose
    its front-of-sample slot — catch that here. Duplicates would
    double-sample a key; forbid them too."""
    from etl_builder_spark.registry import _GRADING_PRIORITY, _ensure_loaded

    _ensure_loaded()
    missing = [k for k in _GRADING_PRIORITY if k not in REGISTRY]
    assert not missing, f"priority entries not in registry: {missing}"
    assert len(set(_GRADING_PRIORITY)) == len(_GRADING_PRIORITY)
